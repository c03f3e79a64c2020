package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Pipeline tier 10: corpus VERSIONING — the diff between two corpus
  * snapshots (what a dataset release audit publishes: which documents
  * were added, removed, or modified since the last cut). The fixture
  * derives v2 from v1 by formula (deletes, in-place edits, additions);
  * Spark earns every status by comparing CONTENT DIGESTS across a
  * full-outer join, while the oracle replays the synthesis formulas.
  *
  * Scale: this is the one lane where a SORT-MERGE join is the honest
  * plan and is ASSERTED PRESENT — both sides are corpus-sized, keyed
  * by the primary key, so the sorted merge on doc_id is exactly what a
  * 100 TB snapshot diff costs (with bucketed snapshot storage the
  * exchanges vanish and the merge is zip-like; broadcast is impossible
  * by definition). Output is churn-sized, not corpus-sized: unchanged
  * rows — the overwhelming majority — never leave the join.
  */
object Pipeline10 {

  /** Added docs get ids beyond any fixture id (documents stay far
    * below this at every tested SF).
    */
  val AddOffset = 1000000000L

  def pipelineSnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val v1 = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    // v2 by formula: delete %31, edit %13 (append ' rev2'), add for %17
    val v2 = v1.filter(col("doc_id") % 31 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 13 === 0, concat(col("text"), lit(" rev2")))
          .otherwise(col("text")).as("text"))
      .unionAll(v1.filter(col("doc_id") % 17 === 0)
        .select((col("doc_id") + AddOffset).as("doc_id"),
          concat(col("text"), lit(" new")).as("text")))
    v1.select(col("doc_id"), md5(col("text")).as("d1"),
        length(col("text")).cast("long").as("v1_len"))
      .join(v2.select(col("doc_id"), md5(col("text")).as("d2"),
        length(col("text")).cast("long").as("v2_len")),
        Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("d2").isNull, "removed")
          .when(col("d1").isNull, "added")
          .when(col("d1") =!= col("d2"), "modified")
          .otherwise("unchanged"))
      .filter(col("status") =!= "unchanged")
      .select(col("doc_id"), col("status"),
        coalesce(col("v1_len"), lit(-1L)).as("v1_len"),
        coalesce(col("v2_len"), lit(-1L)).as("v2_len"))
      .orderBy(col("doc_id"))
  }

  /** Replays the v2 synthesis: delete wins over edit (the v2 filter
    * applies before the edit), edits append 5 bytes, adds append 4 and
    * shift by [[AddOffset]]. Spark's digest comparison must land on
    * exactly these rows.
    */
  private val SnapshotDiffOracle: String =
    s"""WITH stat AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 31 = 0 THEN 'removed'
      |         WHEN doc_id % 13 = 0 THEN 'modified' END AS status,
      |    length(text) AS l1,
      |    CASE WHEN doc_id % 31 = 0 THEN -1
      |         WHEN doc_id % 13 = 0 THEN length(text) + 5
      |         ELSE length(text) END AS l2
      |  FROM documents),
      |changed AS (
      |  SELECT doc_id, status, l1 AS v1_len, l2 AS v2_len
      |  FROM stat WHERE status IS NOT NULL
      |  UNION ALL
      |  SELECT doc_id + $AddOffset, 'added', -1, length(text) + 4
      |  FROM documents WHERE doc_id % 17 = 0)
      |SELECT doc_id, status, cast(v1_len AS BIGINT) AS v1_len,
      |  cast(v2_len AS BIGINT) AS v2_len
      |FROM changed ORDER BY doc_id""".stripMargin

  val registry: Seq[QueryDef] = Seq(
    QueryDef("pipeline_snapshot_diff", pipelineSnapshotDiff _,
      SnapshotDiffOracle))
}
