package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Pipeline

class PipelineSpec extends AnyFunSuite with SparkTestBase {

  test("train split is ~90/10 and hash-deterministic") {
    val rows = Pipeline.pipelineTrainSplit(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val n = rows.length.toDouble
    val train = rows.count(_._2 == "train") / n
    assert(train > 0.8 && train < 0.95, s"train fraction $train")
    val again = Pipeline.pipelineTrainSplit(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(rows.toSeq === again.toSeq)
  }

  test("stratified sample respects per-language fractions (±0.15) and is partition-invariant") {
    val base = Tables.documents(spark, sf001)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sample = Pipeline.pipelineSampleStratified(spark, sf001).collect()
      .map(_.getLong(0))
    val sampleLangs = Tables.documents(spark, sf001)
      .filter(org.apache.spark.sql.functions.col("doc_id").isin(sample: _*))
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = Map("en" -> 0.5, "de" -> 0.3, "fr" -> 0.3, "es" -> 0.1, "zh" -> 0.1)
    want.foreach { case (lang, f) =>
      val got = sampleLangs.getOrElse(lang, 0L).toDouble / base(lang)
      assert(math.abs(got - f) < 0.15, s"$lang: got $got want $f")
    }
    val again = Pipeline.pipelineSampleStratified(spark, sf001).collect()
      .map(_.getLong(0))
    assert(sample.toSeq === again.toSeq, "hash keep rule must be deterministic")
    // the property stat.sampleBy could NOT give: the sampled set is a
    // pure function of (doc_id, lang), so any physical layout agrees
    val reshuffled = Pipeline.stratKeep(
        Tables.documents(spark, sf001).repartition(7))
      .collect().map(_.getLong(0))
    assert(sample.toSeq === reshuffled.toSeq,
      "sampled set must not depend on partitioning")
  }

  test("pretrain corpus accounting conserves documents") {
    val out = Pipeline.pipelinePretrainCorpus(spark, sf0001).collect()
    val total = out.map(_.getLong(2)).sum
    val expected = Tables.documents(spark, sf0001)
      .filter(org.apache.spark.sql.functions.col("lang").isin("en", "de", "fr"))
      .count() // no exact dups in the corpus ⇒ survivors == filtered docs
    assert(total === expected)
  }
}
