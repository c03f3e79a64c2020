package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.VectorExpressions

/** Deduplication family over `documents` — the training-data-pipeline
  * core. Four tiers:
  *
  *   - exact: hash-groupBy on a normalized-text digest. ONE shuffle on
  *     the digest; survivors = min(doc_id) per group.
  *   - MinHash + LSH: shingle → 32 minhashes → 8 bands; candidate pairs
  *     only within equal band buckets (bucket-keyed shuffle, never
  *     all-pairs), then exact Jaccard verification on candidates.
  *   - SimHash: 64-bit signature via the custom codegen expression;
  *     banded blocking (4 × 16 bits) + Hamming-distance verification.
  *   - exact n-gram Jaccard: the ground-truth verifier, bounded to a
  *     small slice here so DuckDB can oracle it; at scale it runs only
  *     on LSH candidates.
  *
  * All hashing is engine-independent (xxhash64 is Spark-builtin and
  * pinned; FNV-1a is hand-rolled) so results are stable across runs,
  * partitionings, and cluster sizes.
  */
object Dedup {

  /** Word 3-gram shingle set of the lowercased text. Guarded for <3
    * tokens: ANSI mode (Spark 4 default) makes out-of-bounds element_at
    * an error, and sequence(1, 0) would DESCEND, not return empty.
    */
  private def shingles(text: Column): Column = {
    val toks = split(lower(text), " ", -1)
    val n = size(toks)
    array_distinct(when(n >= 3,
      transform(sequence(lit(1), n - 2),
        i => concat_ws(" ", element_at(toks, i),
          element_at(toks, i + 1), element_at(toks, i + 2))))
      .otherwise(array().cast("array<string>")))
  }

  private def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** Exact dedup: survivors + multiplicity per normalized-text digest. */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(lower(trim(col("text")))).as("h"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy(col("keep_id"))

  /** 32 seeded universal-hash parameters (a·x + b mod p, p > 2^32). */
  private val MinhashP = 4294967311L
  private lazy val minhashAB: Array[(Long, Long)] = {
    val rnd = new scala.util.Random(7)
    Array.fill(32)((rnd.nextInt(1 << 30).toLong + 1, math.abs(rnd.nextLong()) % MinhashP))
  }

  /** doc_id, band_idx (0..7), band_hash — the LSH blocking key stream.
    * minhash_i = min over shingles of (a_i · low32(xxhash64(s)) + b_i) mod p;
    * a band hashes 4 consecutive minhashes together.
    */
  private def bandedMinhash(docs: DataFrame): DataFrame = {
    val hashed = docs
      .withColumn("sh", shingles(col("text")))
      .filter(size(col("sh")) > 0)
      .withColumn("h32", transform(col("sh"),
        s => xxhash64(s).bitwiseAND(lit(0xffffffffL))))
    val mh = (0 until 32).map { i =>
      val (a, b) = minhashAB(i)
      array_min(transform(col("h32"),
        x => (lit(a) * x + lit(b)) % lit(MinhashP))).as(s"mh$i")
    }
    val withMh = hashed.select(col("doc_id") +: mh: _*)
    val bands = (0 until 8).map { b =>
      struct(lit(b).as("band_idx"),
        xxhash64(col(s"mh${4 * b}"), col(s"mh${4 * b + 1}"),
          col(s"mh${4 * b + 2}"), col(s"mh${4 * b + 3}")).as("band_hash"))
    }
    withMh.select(col("doc_id"), explode(array(bands: _*)).as("band"))
      .select(col("doc_id"), col("band.band_idx"), col("band.band_hash"))
  }

  /** MinHash-LSH near-dup pairs, exact-Jaccard-verified (≥ 0.2). */
  def dedupMinhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val banded = bandedMinhash(docs)
    val candidates = banded.as("x")
      .join(banded.as("y"),
        col("x.band_idx") === col("y.band_idx")
          && col("x.band_hash") === col("y.band_hash")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .distinct()
    val sh = docs.select(col("doc_id"), shingles(col("text")).as("sh"))
    candidates
      .join(sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jac", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jac") >= 0.2)
      .select(col("id_a"), col("id_b"), round(col("jac"), 4).as("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** SimHash near-dup pairs: banded blocking + Hamming ≤ 6. */
  def dedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    val sigs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        VectorExpressions.simhash64(split(lower(col("text")), " ", -1)).as("sig"))
    val banded = sigs.select(col("doc_id"), col("sig"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band_idx"),
          shiftrightunsigned(col("sig"), 16 * b).bitwiseAND(lit(0xffffL))
            .as("band_key"))): _*)).as("band"))
      .select(col("doc_id"), col("sig"), col("band.band_idx"), col("band.band_key"))
    banded.as("x")
      .join(banded.as("y"),
        col("x.band_idx") === col("y.band_idx")
          && col("x.band_key") === col("y.band_key")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
        call_function("bit_count", col("x.sig").bitwiseXOR(col("y.sig"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= 6)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Exact word-3-gram Jaccard on a bounded slice (doc_id < 60) — DuckDB-
    * verifiable ground truth for the approximate tiers above.
    */
  def dedupNgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).filter(col("doc_id") < 60)
      .select(col("doc_id"), shingles(col("text")).as("sh"))
    d.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
      .join(d.select(col("doc_id").as("id_b"), col("sh").as("sh_b")),
        col("id_a") < col("id_b"))
      .withColumn("jac", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jac") > 0)
      .select(col("id_a"), col("id_b"), round(col("jac"), 4).as("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }

  val registry: Seq[QueryDef] = Seq(
    QueryDef("dedup_exact", dedupExact _,
      """SELECT md5(lower(trim(text))) AS h, min(doc_id) AS keep_id,
        |  count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin),
    QueryDef.noOracle("dedup_minhash_lsh", dedupMinhashLsh _),
    QueryDef.noOracle("dedup_simhash", dedupSimhash _),
    QueryDef("dedup_ngram_jaccard", dedupNgramJaccard _,
      """WITH sh AS (
        |  SELECT doc_id, list_distinct(
        |    list_transform(generate_series(1, len(t) - 2),
        |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
        |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents)
        |  WHERE doc_id < 60)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  round(cast(len(list_intersect(a.g, b.g)) AS DOUBLE)
        |    / len(list_distinct(list_concat(a.g, b.g))), 4) AS jaccard
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE len(list_intersect(a.g, b.g)) > 0
        |ORDER BY id_a, id_b""".stripMargin)
  )
}
