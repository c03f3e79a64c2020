package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis4

class TextAnalysis4Spec extends AnyFunSuite with SparkTestBase {

  test("text_html_extract: exact round-trip of title and body text") {
    val docs = Tables.documents(spark, sf001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = TextAnalysis4.textHtmlExtract(spark, sf001).collect()
    assert(out.length === docs.size)
    out.foreach { r =>
      val text = docs(r.getLong(0))
      val title = text.split(" ", -1).take(3).mkString(" ")
      // title recovered from <title>, body reconstructed exactly:
      // h1-title + the two <p> halves reassemble to title + ' ' + text
      assert(r.getString(1) === title)
      assert(r.getString(2) === s"$title $text",
        s"doc ${r.getLong(0)}: main_text does not round-trip")
      // the wrapper has a fixed tag skeleton: 28 tags per page
      assert(r.getLong(3) === 28L, s"n_tags=${r.getLong(3)}")
      // extraction keeps strictly less than the raw page (markup
      // overhead exists) but is never empty
      assert(r.getDouble(5) > 0.0 && r.getDouble(5) < 1.0)
    }
  }

  test("text_bm25: brute-force top-10 parity and a driver score recompute") {
    val out = TextAnalysis4.textBm25(spark, sf001).collect()
    assert(out.nonEmpty)
    val byQuery = out.groupBy(_.getLong(0))
    val docs = Tables.documents(spark, sf001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)
        .split(" ", -1).filter(_.nonEmpty).toSeq).toMap
    // brute-force the whole retrieval by the exact integer rank keys:
    // for every query, score ALL docs sharing a term and take the same
    // top-10 — the distributed inverted-index form must agree exactly
    byQuery.foreach { case (qid, rows) =>
      val qws = docs(qid).distinct.take(3)
      val expect = docs.toSeq.flatMap { case (did, toks) =>
        val matched = qws.filter(toks.contains)
        if (matched.isEmpty) None
        else Some((did, matched.size.toLong,
          matched.map(w => toks.count(_ == w).toLong).sum,
          toks.length.toLong))
      }.sortBy { case (did, nm, tt, dlv) => (-nm, -tt, dlv, did) }
        .take(10)
      val got = rows.sortBy(_.getLong(1))
        .map(r => (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      assert(got.toSeq === expect, s"query $qid top-10 mismatch")
    }
    val n = docs.size.toLong
    val sumdl = docs.values.map(_.length.toLong).sum
    val avgdl = sumdl.toDouble / n.toDouble
    val dfm = docs.values.flatMap(_.distinct).groupBy(identity)
      .map { case (w, ws) => w -> ws.size.toLong }
    val probe = out.head
    val (qid, did) = (probe.getLong(0), probe.getLong(2))
    val qws = docs(qid).distinct.take(3)
    val dtoks = docs(did)
    val dlD = dtoks.length.toDouble
    val scoreNano = qws.filter(dtoks.contains).map { w =>
      val tf = dtoks.count(_ == w).toDouble
      val idf = math.log(1.0 + (n - dfm(w) + 0.5) / (dfm(w) + 0.5))
      val c = idf * ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dlD / avgdl))))
      math.floor(c * 1e9 + 0.5).toLong
    }.sum
    assert(probe.getDouble(6) ===
      math.floor(scoreNano.toDouble / 1e9 * 10000 + 0.5) / 10000,
      s"query $qid doc $did score recompute")
  }
}
