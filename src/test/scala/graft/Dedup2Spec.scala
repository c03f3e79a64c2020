package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup2

class Dedup2Spec extends AnyFunSuite with SparkTestBase {

  test("dedup_url: every 4-variant group collapses to one canonical URL") {
    val out = Dedup2.dedupUrl(spark, sf001)
    val rows = out.collect()
    val nDocs = Tables.documents(spark, sf001).count()
    // the fixture makes groups of exactly 4 consecutive doc_ids (one per
    // decoration variant); a partial last group is allowed
    assert(rows.map(_.getLong(2)).sum === nDocs)
    assert(rows.length === ((nDocs + 3) / 4))
    assert(rows.forall(r => r.getLong(2) == 4 || r.getLong(2) == nDocs % 4))
    // all 4 raw variants are distinct strings
    assert(rows.filter(_.getLong(2) == 4).forall(_.getLong(3) == 4))
    // survivor is the v=0 member (smallest doc_id of the group)
    assert(rows.forall(_.getLong(1) % 4 == 0))
    // canonical form: host + path only — no scheme, www, port, query,
    // fragment, trailing slash, or uppercase residue survives
    assert(rows.forall { r =>
      val c = r.getString(0)
      c.matches("site\\d+\\.example\\.com/articles/item-\\d+")
    })
  }

  test("dedup_url: canonicalization handles each normalization axis") {
    import spark.implicits._
    val cases = Seq(
      // scheme + host case + trailing slash
      "HTTP://A.Example.COM/x/" -> "a.example.com/x",
      // www + default https port + fragment
      "https://www.a.example.com:443/x#frag" -> "a.example.com/x",
      // tracking params dropped, real params sorted
      "http://a.example.com:80/x?b=2&utm_source=s&a=1" ->
        "a.example.com/x?a=1&b=2",
      // all params tracking -> no query at all
      "https://a.example.com/x/?fbclid=1&gclid=2&utm_medium=m" ->
        "a.example.com/x",
      // root path collapses to bare host
      "https://www.a.example.com/" -> "a.example.com",
      // non-default port survives (it addresses a different server)
      "https://a.example.com:8443/x" -> "a.example.com:8443/x")
    val got = cases.map(_._1).toDF("u")
      .select(Dedup2.canonicalUrl(col("u"))).as[String].collect()
    assert(got.toSeq === cases.map(_._2))
  }

  test("pipeline_line_dedup: conservation, determinism, and real drops") {
    val out = Dedup2.pipelineLineDedup(spark, sf001).collect()
    val docs = Tables.documents(spark, sf001)
    assert(out.length === docs.count())
    // the sf0.01 fixture has genuinely repeated aligned 12-token lines
    // (near-dup docs share runs) — the operator must drop some
    val dropped = out.map(_.getLong(2)).sum
    assert(dropped > 0, "fixture carries no cross-doc repeated lines?")
    // conservation: kept lines' token count == new_text token count
    out.foreach { r =>
      val kept = r.getLong(1) - r.getLong(2)
      val txt = r.getString(3)
      if (kept == 0) assert(txt.isEmpty)
      else assert(txt.split(" ").length >= (kept - 1) * 12 + 1)
    }
    // a doc with no dropped lines reassembles to its EXACT original text
    val untouchedId = out.filter(_.getLong(2) == 0).head.getLong(0)
    val orig = docs.filter(col("doc_id") === untouchedId)
      .select(col("text")).head.getString(0)
    val rebuilt = out.find(_.getLong(0) == untouchedId).get.getString(3)
    assert(rebuilt === orig)
  }
}
