package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reference-exact word count — the single job the reference ships
  * (reference: `user/UserDefinedFunctions.scala:5-30` driven by
  * `worker/services/WorkerServiceImpl.scala:58-154`).
  *
  * Semantics replicated deliberately (SURVEY.md §4):
  *   - whole-file read, then split on a SINGLE SPACE `" "` — not a
  *     whitespace regex. Newlines/tabs stay inside tokens, so words
  *     adjacent across a line break merge after normalization (118 such
  *     merged tokens in the reference corpus).
  *   - normalize = `toLowerCase` + delete `[^\w]` (keeps `[A-Za-z0-9_]`).
  *   - empty tokens are dropped (the reference would CRASH on `"".head` in
  *     `partitionBy`; we guard instead — quirk 5).
  *   - partition key = first character of the word, uppercased.
  *
  * Scale: one narrow tokenize stage (whole-stage codegen: Project +
  * Generate(explode)) feeding one hash-aggregate shuffle keyed on `word`.
  * Map-side partial aggregation replaces the reference's combiner-less
  * shuffle of raw `(word,"1")` pairs — shuffle volume is
  * O(distinct words × partitions), not O(tokens). At 100 TB the same plan
  * holds; only `spark.sql.shuffle.partitions` changes.
  */
object WordCount {

  /** op #2 — single-space split of a whole document string. */
  def tokenize(doc: Column): Column = explode(split(doc, " ", -1))

  /** op #3 — `lower` + delete all non-word chars (Java `\w` = ASCII). */
  def normalize(tok: Column): Column =
    lower(regexp_replace(tok, "[^\\w]", ""))

  /** op #4 — reference `partitionBy`: first char, uppercased. */
  def partitionKey(word: Column): Column = upper(substring(word, 1, 1))

  /** Core pipeline over any corpus exposed as a one-string-per-document
    * column. Returns `(word, cnt)` sorted by word for deterministic output.
    */
  def wordCount(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(tokenize(col(textCol)).as("tok"))
      .select(normalize(col("tok")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("word")

  /** Word count with the reference's partition label as a column; the
    * reference materialized one output file per key — expressed here as
    * `.write.partitionBy("pkey")` at the sink (see [[writePartitioned]]).
    */
  def wordCountPartitioned(docs: DataFrame, textCol: String): DataFrame =
    wordCount(docs, textCol)
      .withColumn("pkey", partitionKey(col("word")))
      .orderBy("word")

  /** op #1 — whole-file text scan of a directory (one row per file), the
    * reference's input contract (1 file = 1 map split).
    */
  def readCorpus(spark: SparkSession, inputDir: String): DataFrame =
    spark.read.option("wholetext", "true").text(inputDir)

  /** End-to-end reference-parity job: corpus dir → `(word, cnt, pkey)`. */
  def referenceJob(spark: SparkSession, inputDir: String): DataFrame =
    wordCountPartitioned(readCorpus(spark, inputDir), "value")

  /** op #8 — partitioned sink, the reference's one-file-per-partition-key
    * output layout (without its leading-newline quirk).
    */
  def writePartitioned(result: DataFrame, outDir: String): Unit =
    result.write.mode("overwrite").partitionBy("pkey").csv(outDir)
}
