package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis3

/** Invariant specs for the third text-analysis batch (beyond the DuckDB
  * hash oracle): RAKE structural laws and exact reconstruction laws for
  * span corruption.
  */
class TextAnalysis3Spec extends AnyFunSuite with SparkTestBase {

  test("rake: phrases are stopword-free, bounded, scored positive") {
    val rows = TextAnalysis3.rake(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 40)
    rows.foreach { r =>
      val words = r.getString(0).split(" ")
      assert(words.nonEmpty && words.length <= TextAnalysis3.MaxPhraseLen)
      assert(words.forall(w => !TextAnalysis3.StopWords.contains(w)))
      assert(r.getLong(1) >= 1)
      assert(r.getLong(2) > 0)
    }
    // descending by score with phrase tiebreak — already materialized
    val scores = rows.map(r => (-r.getLong(2), r.getString(0))).toSeq
    assert(scores === scores.sorted)
  }

  test("span corruption: masked + kept tokens reconstruct the document") {
    val out = TextAnalysis3.spanCorruption(spark, sf0001).collect()
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.length === docs.size)
    out.foreach { r =>
      val (id, nSpans, nMasked) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val (corrupted, target) = (r.getString(3), r.getString(4))
      val orig = docs(id).split(" ").filter(_.nonEmpty)
        .take(TextAnalysis3.MaxToks)
      // sentinel counts agree between the pair and the span count
      val sentC = "<extra_id_\\d+>".r.findAllIn(corrupted).toSeq
      val sentT = "<extra_id_\\d+>".r.findAllIn(target).toSeq
      assert(sentC.length.toLong === nSpans)
      assert(sentT === sentC, s"doc $id: sentinel sequences differ")
      // splicing each target span back over its sentinel restores the doc
      val spans = target.split("<extra_id_\\d+> ?").filter(_.nonEmpty)
        .map(_.trim).toList
      assert(spans.length.toLong === nSpans)
      val restored = sentC.zip(spans).foldLeft(corrupted) {
        case (acc, (s, span)) => acc.replace(s, span)
      }
      assert(restored.split(" ").filter(_.nonEmpty).toSeq === orig.toSeq,
        s"doc $id does not reconstruct")
      assert(nMasked === spans.map(_.split(" ").length).sum.toLong)
    }
  }
}
