package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Composite training-data pipelines — the north-star use case, each as
  * ONE oracle-verified query chaining the operator families end to end.
  * These are what a user of the engine actually runs: filter → score →
  * dedup → select → account.
  */
object Pipeline {

  private def toks(c: org.apache.spark.sql.Column) = split(lower(c), " ", -1)
  private def r4(c: org.apache.spark.sql.Column) = Tables.r4(c)

  /** Quality-filter pipeline: score every document (token count,
    * stopword ratio), rank within source, keep the top 10 per source.
    * Plan: one scan → scoring projection (codegen) → one window shuffle
    * on source → filter. No joins; at 100 TB the window partitions by
    * source and only top-k survive per partition.
    */
  def pipelineQualityFilter(spark: SparkSession, dir: String): DataFrame = {
    val t = toks(col("text"))
    val nToks = size(t)
    val stopRatio = size(filter(t, s => s.isInCollection(
      Seq("the", "a", "of", "and", "to", "in", "is", "it", "for", "on"))))
      .cast("double") / nToks.cast("double")
    val score = least(nToks.cast("double") / 100.0, lit(1.0)) * 0.5 +
      least(stopRatio * 5.0, lit(1.0)) * 0.5
    val w = Window.partitionBy(col("source"))
      .orderBy(col("q").desc, col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("lang"), r4(score).as("q"))
      .withColumn("rank_in_source", row_number().over(w).cast("long"))
      .filter(col("rank_in_source") <= 10)
      .orderBy(col("source"), col("rank_in_source"))
  }

  /** Pretraining-corpus pipeline: language allowlist → exact dedup
    * survivors (min doc_id per normalized-text digest) → per-(lang,
    * source) accounting of documents and token budget. The shape of a
    * real corpus build: every stage is one declarative step, the only
    * shuffles are the dedup groupBy and the final accounting groupBy.
    */
  def pipelinePretrainCorpus(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .filter(col("lang").isin("en", "de", "fr"))
    val survivors = docs
      .groupBy(md5(lower(trim(col("text")))).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    docs.join(survivors, Seq("doc_id"), "left_semi")
      .select(col("lang"), col("source"),
        size(filter(toks(col("text")), s => s =!= "")).cast("long").as("n_toks"),
        col("n_chars"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("token_budget"),
        sum(col("n_chars")).as("char_budget"))
      .orderBy(col("lang"), col("source"))
  }

  /** Deterministic train/validation split — hash-based, NOT random:
    * the same document lands in the same split on any cluster, any
    * partitioning, any day (reproducible corpus builds). First md5
    * byte of the doc id < 230/256 ⇒ train (~90%).
    */
  def pipelineTrainSplit(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        conv(substring(md5(col("doc_id").cast("string")), 1, 2), 16, 10)
          .cast("int").as("h"))
      .withColumn("split", when(col("h") < 230, "train").otherwise("valid"))
      .select(col("doc_id"), col("split"))
      .orderBy(col("doc_id"))

  /** Stratified sampling per language (sampleBy, fixed seed) — the
    * corpus-rebalancing primitive. Sampling is partitioning-dependent,
    * so rows-only; the spec pins per-language fractions and in-session
    * determinism.
    */
  def pipelineSampleStratified(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .stat.sampleBy("lang",
        Map("en" -> 0.5, "de" -> 0.3, "fr" -> 0.3, "es" -> 0.1, "zh" -> 0.1),
        42L)
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))

  val registry: Seq[QueryDef] = Seq(
    QueryDef("pipeline_train_split", pipelineTrainSplit _,
      """SELECT doc_id,
        |  CASE WHEN ('0x' || substring(md5(cast(doc_id AS VARCHAR)), 1, 2))::int < 230
        |    THEN 'train' ELSE 'valid' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin),
    QueryDef.noOracle("pipeline_sample_stratified", pipelineSampleStratified _),
    QueryDef("pipeline_quality_filter", pipelineQualityFilter _,
      """WITH scored AS (
        |  SELECT doc_id, source, lang,
        |    floor((least(cast(len(t) AS DOUBLE) / 100.0, 1.0) * 0.5
        |      + least(cast(len(list_filter(t, s -> s IN
        |          ('the','a','of','and','to','in','is','it','for','on'))) AS DOUBLE)
        |        / len(t) * 5.0, 1.0) * 0.5) * 10000 + 0.5) / 10000 AS q
        |  FROM (SELECT doc_id, source, lang,
        |      string_split(lower(text), ' ') AS t FROM documents))
        |SELECT doc_id, source, lang, q,
        |  cast(rn AS BIGINT) AS rank_in_source FROM (
        |  SELECT *, row_number() OVER (PARTITION BY source
        |    ORDER BY q DESC, doc_id) AS rn FROM scored)
        |WHERE rn <= 10 ORDER BY source, rank_in_source""".stripMargin),
    QueryDef("pipeline_pretrain_corpus", pipelinePretrainCorpus _,
      """WITH docs AS (
        |  SELECT * FROM documents WHERE lang IN ('en','de','fr')),
        |survivors AS (
        |  SELECT min(doc_id) AS doc_id FROM docs
        |  GROUP BY md5(lower(trim(text))))
        |SELECT lang, source, count(*) AS n_docs,
        |  cast(sum(len(list_filter(string_split(lower(text), ' '),
        |    s -> s <> ''))) AS BIGINT) AS token_budget,
        |  cast(sum(n_chars) AS BIGINT) AS char_budget
        |FROM docs WHERE doc_id IN (SELECT doc_id FROM survivors)
        |GROUP BY lang, source ORDER BY lang, source""".stripMargin)
  )
}
