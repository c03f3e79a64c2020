package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Round-8 training-corpus operators: leakage-safe splitting and
  * deterministic exact-k sampling.
  *
  * Both extend the repo's deterministic-hash discipline (see
  * [[Pipeline.pipelineTrainSplit]]): no RNG anywhere, so the same
  * document lands in the same split/sample on any cluster, any
  * partitioning, any rerun — and both are therefore fully
  * DuckDB-oracled instead of rows-only.
  */
object Pipeline6 {

  /** Split thresholds over the first md5 byte of the GROUP key:
    * < 205 train (~80%), < 230 valid (~10%), else test (~10%).
    * Shared with the oracle via interpolation.
    */
  private[graft] val TrainThr = 205
  private[graft] val ValidThr = 230

  /** LEAKAGE-SAFE train/valid/test split — the eval-integrity version
    * of [[Pipeline.pipelineTrainSplit]]: near-duplicate documents must
    * never straddle a split boundary (a test doc whose near-copy sits
    * in train silently inflates eval scores — the classic benchmark-
    * contamination failure). The unit of assignment is therefore the
    * near-dup CLUSTER, not the document: every doc adopts its cluster
    * representative (from the verified MinHash-LSH substrate,
    * [[Dedup.dedupClusters]]) as its `group_key` — singletons use their
    * own id — and the split is a pure hash of that key, so an entire
    * cluster moves together by construction.
    *
    * Scale shape: the cluster labels are the banded-LSH pipeline the
    * dedup tier already runs (no new quadratic term); this operator
    * adds ONE left join against those labels (broadcast at realistic
    * cluster-member counts — near-dup clusters are a small fraction of
    * a deduped corpus) plus a stateless hash per row. Fully replayed by
    * the oracle: the recursive-CTE closure over the same verified pairs
    * plus the identical md5-byte rule.
    */
  def pipelineLeakageSplit(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val clusters = Dedup.dedupClusters(spark, dir)
    val h = conv(substring(md5(concat(lit("leak:"),
      col("group_key").cast("string"))), 1, 2), 16, 10).cast("int")
    docs.select(col("doc_id"))
      .join(clusters, Seq("doc_id"), "left")
      .withColumn("group_key", coalesce(col("cluster_rep"), col("doc_id")))
      .withColumn("split",
        when(h < TrainThr, "train")
          .when(h < ValidThr, "valid")
          .otherwise("test"))
      .select(col("doc_id"), col("group_key"), col("split"))
      .orderBy(col("doc_id"))
  }

  private val LeakageSplitOracle: String =
    s"""WITH RECURSIVE ${Dedup.MinhashPipelineCtes},
      |e AS (SELECT id_a, id_b FROM vp
      |      UNION ALL SELECT id_b, id_a FROM vp),
      |reach(src, node) AS (
      |  SELECT id_a, id_a FROM e
      |  UNION
      |  SELECT r.src, e.id_b FROM reach r JOIN e ON e.id_a = r.node),
      |clusters AS (
      |  SELECT src AS doc_id, min(node) AS rep FROM reach GROUP BY src),
      |keyed AS (
      |  SELECT d.doc_id, coalesce(c.rep, d.doc_id) AS group_key
      |  FROM documents d LEFT JOIN clusters c ON c.doc_id = d.doc_id)
      |SELECT doc_id, group_key,
      |  CASE
      |    WHEN ('0x' || substring(md5('leak:' || cast(group_key AS VARCHAR)), 1, 2))::int < $TrainThr THEN 'train'
      |    WHEN ('0x' || substring(md5('leak:' || cast(group_key AS VARCHAR)), 1, 2))::int < $ValidThr THEN 'valid'
      |    ELSE 'test' END AS split
      |FROM keyed ORDER BY doc_id""".stripMargin

  /** Sample size for [[pipelineReservoirSample]]. */
  private[graft] val ReservoirK = 200

  /** Deterministic exact-k uniform sample — the distributed answer to
    * reservoir sampling. A sequential reservoir (Vitter's algorithm R)
    * is a single-pass RNG loop that CANNOT parallelize (its state is
    * order-dependent) and resamples differently every run; the
    * equivalent distributed primitive ranks every row by a salted hash
    * and keeps the k smallest. Same guarantee (every row equally
    * likely under the hash's uniformity), plus three properties the
    * RNG form lacks at 100 TB: partition-mergeable (each partition
    * ships only its k best through TakeOrderedAndProject — k rows per
    * partition, never a global sort), rerun-stable (audit two corpus
    * builds and the sample is identical), and incrementally mergeable
    * (the k smallest of a union = k smallest of the per-shard k
    * smallest — the same min-k algebra as the KMV sketch). Re-salt the
    * hash to draw an independent sample.
    */
  def pipelineReservoirSample(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"),
        conv(substring(md5(concat(lit("res:"),
          col("doc_id").cast("string"))), 1, 8), 16, 10)
          .cast("long").as("rk"))
      .orderBy(col("rk"), col("doc_id"))
      .limit(ReservoirK)

  private val ReservoirOracle: String =
    s"""SELECT doc_id, lang, source,
      |  ('0x' || substring(md5('res:' || cast(doc_id AS VARCHAR)), 1, 8))::bigint AS rk
      |FROM documents
      |ORDER BY rk, doc_id LIMIT $ReservoirK""".stripMargin

  val registry: Seq[QueryDef] = Seq(
    QueryDef("pipeline_leakage_split", pipelineLeakageSplit _,
      LeakageSplitOracle),
    QueryDef("pipeline_reservoir_sample", pipelineReservoirSample _,
      ReservoirOracle)
  )
}
