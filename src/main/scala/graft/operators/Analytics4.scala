package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.{QueryDef, Tables}

/** Fourth analytics batch: multi-objective preference (skyline),
  * experiment readouts (two-proportion z) and series memory
  * (autocorrelation) — three decision-support shapes none of the earlier
  * batches cover (q21/q64 rank by ONE key; q30/q66 aggregate moments of
  * one column; q82/q97 smooth a series but never measure its
  * self-similarity). All three keep the repo's exact-arithmetic
  * discipline: dominance and conversion counts are integer comparisons,
  * and the only floats are terminal statistics rounded through
  * [[Tables.r4]].
  */
object Analytics4 {

  /** Pareto skyline of `part` under (minimize price, maximize size) —
    * the classic multi-objective operator (Börzsönyi et al., "The
    * Skyline Operator", ICDE'01) that relational engines lack: a part is
    * kept iff NO other part is at least as large AND at least as cheap
    * with one of the two strict.
    *
    * The textbook form is a quadratic self-anti-join (the oracle keeps
    * it — NOT EXISTS dominance — as the semantic assertion). This plan
    * is the 2-D REWRITE that makes the operator linear: a part survives
    * iff (a) its price equals the min price OF ITS SIZE and (b) no
    * STRICTLY LARGER size has min price ≤ it. Both facts come from one
    * tiny per-size aggregate: groupBy(p_size) → ≤ |sizes| rows, a
    * running-min window over that aggregate ordered by size DESC (the
    * deliberate single-partition window is over ≤ 50 post-aggregate
    * rows, not the table — same pattern as q48's spine), then a
    * broadcast join back. The part table itself never shuffles: one
    * partial-agg exchange of |sizes| groups + one broadcast hash join.
    * At 100 TB the same plan holds as long as the dominance attribute
    * count stays at 2; for d ≥ 3 the rewrite no longer exists and the
    * scale path is the distributive one — per-partition local skyline
    * (a superset of the global one) first, quadratic refinement only on
    * the pruned union.
    */
  def skyline(spark: SparkSession, dir: String): DataFrame = {
    val cents = col("p_retailprice").cast(DecimalType(12, 2)).*(100)
      .cast("long")
    val parts = Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_size"), cents.as("price_cents"))
    val perSize = parts.groupBy(col("p_size"))
      .agg(min(col("price_cents")).as("mp"))
    // min price over all STRICTLY larger sizes (rows are distinct sizes)
    val w = Window.orderBy(col("p_size").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = perSize.withColumn("mp_gt", min(col("mp")).over(w))
    parts.join(broadcast(frontier), Seq("p_size"))
      .filter(col("price_cents") === col("mp") &&
        (col("mp_gt").isNull || col("mp_gt") > col("price_cents")))
      .select(col("p_partkey"), col("p_size"), col("price_cents"))
      .orderBy(col("p_partkey"))
  }

  private val SkylineOracle: String =
    """WITH pts AS (
      |  SELECT p_partkey, p_size,
      |    cast(cast(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT)
      |      AS price_cents
      |  FROM part)
      |SELECT p_partkey, p_size, price_cents
      |FROM pts p
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM pts q
      |  WHERE q.p_size >= p.p_size AND q.price_cents <= p.price_cents
      |    AND (q.p_size > p.p_size OR q.price_cents < p.price_cents))
      |ORDER BY p_partkey""".stripMargin

  /** Conversion threshold in cents: an event converts iff value ≥ 50.00
    * (≈ 37% of the synthetic stream — keeps both arms far from the
    * degenerate p ∈ {0, 1} where the z-score is undefined).
    */
  val ConvCents = 5000L

  /** Two-proportion z-test per event type — the A/B-experiment readout:
    * users split into arms by id parity (the deterministic stand-in for
    * a hashed assignment), conversion = event value ≥ [[ConvCents]],
    * z = (p_a − p_b) / sqrt(p̂(1−p̂)(1/n_a + 1/n_b)) with p̂ pooled.
    *
    * Scale: ONE pass — a single groupBy(event_type) with four
    * conditional counts (no pivot, no self-join), then pure scalar
    * arithmetic on the 5-row aggregate. Counts are exact integers; the
    * z formula is the identical IEEE op sequence in both engines
    * (divisions and sqrt are correctly rounded) but carries enough
    * chained roundings that the result is guarded with [[Tables.r4]]
    * per NOTES.md #14.
    */
  def abTest(spark: SparkSession, dir: String): DataFrame = {
    val cents = col("value").cast(DecimalType(12, 2)).*(100).cast("long")
    val agg = Tables.events(spark, dir)
      .select(col("event_type"), pmod(col("user_id"), lit(2L)).as("arm"),
        cents.as("cents"))
      .groupBy(col("event_type"))
      .agg(
        count(when(col("arm") === 0, 1)).as("n_a"),
        count(when(col("arm") === 0 && col("cents") >= ConvCents, 1))
          .as("conv_a"),
        count(when(col("arm") === 1, 1)).as("n_b"),
        count(when(col("arm") === 1 && col("cents") >= ConvCents, 1))
          .as("conv_b"))
    val pa = col("conv_a").cast("double") / col("n_a")
    val pb = col("conv_b").cast("double") / col("n_b")
    val pooled = (col("conv_a") + col("conv_b")).cast("double") /
      (col("n_a") + col("n_b"))
    val se = sqrt(pooled * (lit(1.0) - pooled) *
      (lit(1.0) / col("n_a") + lit(1.0) / col("n_b")))
    agg.select(col("event_type"), col("n_a"), col("conv_a"), col("n_b"),
        col("conv_b"),
        Tables.r4(when(se > 0, (pa - pb) / se).otherwise(lit(0.0))).as("z"))
      .orderBy(col("event_type"))
  }

  private val AbTestOracle: String =
    s"""WITH e AS (
       |  SELECT event_type, user_id % 2 AS arm,
       |    cast(cast(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
       |  FROM events),
       |c AS (
       |  SELECT event_type,
       |    cast(count(CASE WHEN arm = 0 THEN 1 END) AS BIGINT) AS n_a,
       |    cast(count(CASE WHEN arm = 0 AND cents >= $ConvCents THEN 1 END)
       |      AS BIGINT) AS conv_a,
       |    cast(count(CASE WHEN arm = 1 THEN 1 END) AS BIGINT) AS n_b,
       |    cast(count(CASE WHEN arm = 1 AND cents >= $ConvCents THEN 1 END)
       |      AS BIGINT) AS conv_b
       |  FROM e GROUP BY event_type),
       |z AS (
       |  SELECT *,
       |    sqrt((conv_a + conv_b) * 1.0 / (n_a + n_b)
       |      * (1.0 - (conv_a + conv_b) * 1.0 / (n_a + n_b))
       |      * (1.0 / n_a + 1.0 / n_b)) AS se
       |  FROM c)
       |SELECT event_type, n_a, conv_a, n_b, conv_b,
       |  floor((CASE WHEN se > 0
       |    THEN (conv_a * 1.0 / n_a - conv_b * 1.0 / n_b) / se
       |    ELSE 0.0 END) * 10000 + 0.5) / 10000 AS z
       |FROM z ORDER BY event_type""".stripMargin

  /** Lag-1 / lag-7 autocorrelation of each priority's daily revenue
    * series — the "does yesterday predict today / is there a weekly
    * rhythm" readout, and the standard pre-check before fitting any
    * forecaster to the q82/q97 smoothed series. Lags are ROW lags on
    * the day-ordered series (days with no orders simply don't exist as
    * rows — same series definition both engines).
    *
    * Scale: groupBy(priority, day) collapses the table to calendar
    * cardinality, the lag window runs partitioned BY THE SAME priority
    * key (one shuffle, reused by both the window and the final
    * aggregate — AQE sees matching partitioning), and corr() is a
    * single-pass co-moment aggregate. Pearson co-moments carry ~1e-12
    * cross-engine drift (NOTES.md #14), so both correlations are
    * rounded through [[Tables.r4]].
    */
  def autocorr(spark: SparkSession, dir: String): DataFrame = {
    val cents = col("o_totalprice").cast(DecimalType(12, 2)).*(100)
      .cast("long")
    val daily = Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"),
        date_trunc("DAY", col("o_orderdate")).as("day"))
      .agg(sum(cents).as("c"))
    val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("day"))
    daily
      .select(col("o_orderpriority"), col("c"),
        lag(col("c"), 1).over(w).as("l1"),
        lag(col("c"), 7).over(w).as("l7"))
      .groupBy(col("o_orderpriority"))
      .agg(count(col("c")).as("n_days"),
        Tables.r4(corr(col("c"), col("l1"))).as("ac1"),
        Tables.r4(corr(col("c"), col("l7"))).as("ac7"))
      .orderBy(col("o_orderpriority"))
  }

  private val AutocorrOracle: String =
    """WITH daily AS (
      |  SELECT o_orderpriority, date_trunc('day', o_orderdate) AS day,
      |    sum(cast(cast(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
      |      AS c
      |  FROM orders GROUP BY 1, 2),
      |lagged AS (
      |  SELECT o_orderpriority, c,
      |    lag(c, 1) OVER (PARTITION BY o_orderpriority ORDER BY day) AS l1,
      |    lag(c, 7) OVER (PARTITION BY o_orderpriority ORDER BY day) AS l7
      |  FROM daily)
      |SELECT o_orderpriority, cast(count(c) AS BIGINT) AS n_days,
      |  floor(corr(c, l1) * 10000 + 0.5) / 10000 AS ac1,
      |  floor(corr(c, l7) * 10000 + 0.5) / 10000 AS ac7
      |FROM lagged GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  val registry: Seq[QueryDef] = Seq(
    QueryDef("q98_skyline", skyline _, SkylineOracle),
    QueryDef("q99_ab_test", abTest _, AbTestOracle),
    QueryDef("q100_autocorr", autocorr _, AutocorrOracle)
  )
}
