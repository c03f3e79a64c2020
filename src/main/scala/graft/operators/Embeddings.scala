package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Embedding-preparation operators over `embeddings` — the vector-side
  * half of a training/serving pipeline (the similarity/ANN tiers query
  * vectors; these CONDITION them). Everything is built-in-function
  * composition, so it stays a narrow codegen'd map over the corpus with
  * no shuffle before the output sort.
  *
  * Float discipline: embeddings are float32 on disk; both engines cast
  * to double before arithmetic, and array folds are LEFT folds in both
  * (Spark `aggregate`, DuckDB `list_reduce`-style sums), so the IEEE op
  * sequences match; results are pinned with the engine-stable floor
  * rounding (Tables.r4).
  */
object Embeddings {

  private def vecD(c: Column): Column = transform(c, x => x.cast("double"))

  /** L2 normalization summary: the vector norm, the first normalized
    * component (NULL for a zero vector — ANSI mode would otherwise
    * throw DIVIDE_BY_ZERO, while the oracle's x/0 is NULL in DuckDB),
    * and the dimension.
    */
  def embNormalize(spark: SparkSession, dir: String): DataFrame = {
    val v = vecD(col("embedding"))
    val norm = sqrt(aggregate(v, lit(0.0), (a, x) => a + x * x))
    Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        Tables.r4(norm).as("l2_norm"),
        Tables.r4(try_divide(element_at(v, 1), norm)).as("first_component"),
        size(col("embedding")).cast("long").as("dim"))
      .orderBy(col("vec_id"))
  }

  /** Symmetric int8 quantization: scale = 127 / max|x|, q_i =
    * floor(x_i·scale + 0.5) — the storage/serving compression step.
    * Output is the per-vector scale plus exact integer checksums
    * (sum and count-at-saturation), which pin every quantized value
    * without shipping the array through the comparator.
    */
  def embQuantize(spark: SparkSession, dir: String): DataFrame = {
    // one codegen pass per vector (functions/Int8QuantUtil). The
    // built-in higher-order formulation this replaced re-derived
    // max|x| inside every per-element lambda (interpreted, outside
    // whole-stage CSE) — measured 4.9 s warm at sf0.1 vs <1 s here.
    // Zero-vector guard lives in the kernel: (NULL, NULL, 0).
    val st = graft.functions.VectorExpressions.int8QuantStats(col("embedding"))
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), st.as("st"))
      .select(col("vec_id"),
        Tables.r4(col("st.scale")).as("scale"),
        col("st.q_sum").as("q_sum"),
        col("st.n_saturated").as("n_saturated"))
      .orderBy(col("vec_id"))
  }

  val registry: Seq[QueryDef] = Seq(
    QueryDef("emb_normalize", embNormalize _,
      """SELECT vec_id,
        |  floor(sqrt(list_sum(list_transform(embedding,
        |    x -> cast(x AS DOUBLE) * cast(x AS DOUBLE)))) * 10000 + 0.5)
        |    / 10000 AS l2_norm,
        |  floor(cast(embedding[1] AS DOUBLE)
        |    / sqrt(list_sum(list_transform(embedding,
        |      x -> cast(x AS DOUBLE) * cast(x AS DOUBLE)))) * 10000 + 0.5)
        |    / 10000 AS first_component,
        |  len(embedding) AS dim
        |FROM embeddings ORDER BY vec_id""".stripMargin),
    QueryDef("emb_quantize", embQuantize _,
      // `f` mirrors the kernel's NULL/NaN skip (Int8QuantUtil.usable):
      // DuckDB orders NaN as the GREATEST float, so without the filter a
      // NaN element would make list_max return NaN (scale = NaN) where
      // the Spark kernel skips it — the filter keeps the two engines in
      // lockstep on dirty vectors, not just the clean embeddings table.
      """WITH f AS (
        |  SELECT vec_id, list_filter(embedding,
        |    x -> x IS NOT NULL AND NOT isnan(x)) AS e
        |  FROM embeddings),
        |s AS (
        |  SELECT vec_id, e,
        |    127.0 / list_max(list_transform(e,
        |      x -> abs(cast(x AS DOUBLE)))) AS scale
        |  FROM f)
        |SELECT vec_id,
        |  floor(scale * 10000 + 0.5) / 10000 AS scale,
        |  CASE WHEN scale IS NULL THEN NULL
        |    ELSE cast(list_sum(list_transform(e,
        |      x -> cast(floor(cast(x AS DOUBLE) * scale + 0.5) AS BIGINT)))
        |      AS BIGINT) END AS q_sum,
        |  CASE WHEN scale IS NULL THEN 0
        |    ELSE cast(len(list_filter(e,
        |      x -> abs(floor(cast(x AS DOUBLE) * scale + 0.5)) = 127))
        |      AS BIGINT) END AS n_saturated
        |FROM s ORDER BY vec_id""".stripMargin)
  )
}
