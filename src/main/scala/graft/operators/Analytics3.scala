package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.{QueryDef, Tables}
import graft.functions.KllSketch

/** Third analytics batch: sparse-series repair and robust anomaly
  * detection — the two standard treatments of a metric stream the
  * earlier batches don't cover (q48 builds a dense spine, q82 smooths,
  * q72 flags by moments; nothing yet IMPUTES missing points or flags by
  * rank statistics). Both stay exact-arithmetic: the interpolation is
  * one correctly-rounded division of exact-integer-valued doubles and
  * the MAD cascade never leaves the dyadic grid (medians of integer
  * cents are at worst .5-grained, their absolute deviations .25-grained
  * — all exactly representable), so both queries hash-verify.
  */
object Analytics3 {

  /** Imputation horizon (months): gaps longer than this are left alone
    * — the standard guard that stops a cold, churned customer from
    * being "repaired" across a year of genuine absence, and the bound
    * that caps the explode fan-out at H−1 rows per gap.
    */
  val GapH = 7

  /** Linear gap-fill of each customer's monthly spend series: for every
    * pair of CONSECUTIVE active months (m, c) → (nm, nc) with a gap of
    * 2..[[GapH]] months, emit the missing months m+1..nm−1 with the
    * linearly interpolated value c + ⌊(nc−c)·d/(nm−m)⌋ — the sensor
    * gap-repair pattern, run between actual observations only (no dense
    * spine is ever materialized, unlike q48's calendar build).
    *
    * Scale: one (custkey, month)-keyed aggregate, one lead() window
    * pass partitioned by the same custkey (per-partition state = one
    * row), then a pure explode — the event table shuffles twice on the
    * same key and the fan-out is ≤ GapH−1 rows per consecutive pair.
    * Float discipline: the only division has an exact-integer-valued
    * numerator ≤ 1e10 and a denominator ≤ GapH, so the double quotient
    * is correctly rounded and ⌊·⌋ cannot mis-floor (the true quotient
    * is ≥ 1/GapH away from any integer it doesn't equal; a quotient
    * that IS an integer is exactly representable).
    */
  def gapfillInterp(spark: SparkSession, dir: String): DataFrame = {
    val cents = col("o_totalprice").cast(DecimalType(12, 2)).*(100)
      .cast("long")
    val monthly = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"),
        ((year(col("o_orderdate")) - 1995) * 12 + month(col("o_orderdate"))
          - 1).cast("long").as("m"))
      .agg(sum(cents).as("c"))
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("m"))
    monthly
      .select(col("o_custkey"), col("m"), col("c"),
        lead(col("m"), 1).over(w).as("nm"),
        lead(col("c"), 1).over(w).as("nc"))
      .filter((col("nm") - col("m")).between(2, GapH))
      .select(col("o_custkey"), col("m"), col("c"), col("nm"), col("nc"),
        explode(sequence(lit(1L), col("nm") - col("m") - 1)).as("d"))
      .select(col("o_custkey"), (col("m") + col("d")).as("m"),
        (col("c") + floor(
          ((col("nc") - col("c")) * col("d")).cast("double")
            / (col("nm") - col("m")).cast("double")))
          .as("interp_cents"))
      .orderBy(col("o_custkey"), col("m"))
  }

  // range(1, GapH) is the constant-bound series NOTES.md #8 requires;
  // d < nm − m re-imposes the per-gap bound
  private val GapfillOracle: String =
    s"""WITH monthly AS (
       |  SELECT o_custkey,
       |    (year(o_orderdate) - 1995) * 12 + (month(o_orderdate) - 1) AS m,
       |    sum(cast(cast(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS c
       |  FROM orders GROUP BY 1, 2),
       |nx AS (
       |  SELECT o_custkey, m, c,
       |    lead(m) OVER (PARTITION BY o_custkey ORDER BY m) AS nm,
       |    lead(c) OVER (PARTITION BY o_custkey ORDER BY m) AS nc
       |  FROM monthly)
       |SELECT o_custkey, m + d AS m,
       |  cast(c + floor((nc - c) * d * 1.0 / (nm - m)) AS BIGINT)
       |    AS interp_cents
       |FROM nx, generate_series(1, ${GapH - 1}) AS g(d)
       |WHERE nm - m BETWEEN 2 AND $GapH AND d < nm - m
       |ORDER BY o_custkey, m""".stripMargin

  /** Robust anomaly counts per event type — the rank-statistic twin of
    * q72's moment z-score (median/MAD instead of mean/stddev, so a few
    * extreme rows cannot drag the threshold toward themselves): a value
    * is anomalous iff |cents − median| > 3·MAD, MAD = median absolute
    * deviation.
    *
    * Scale: THREE narrow passes over the event table (med, then mad,
    * then the outlier count — PLANS.md pins scans=3), each a 2-column
    * pushdown scan with the 5-row intermediates broadcast back; the
    * table is never shuffle-joined. Three passes is the FLOOR for exact
    * MAD: the statistic is holistic, so each stage needs a full pass
    * after the previous scalar exists — and re-scanning a pruned
    * columnar source beats localCheckpoint'ing an events-sized `dev`
    * intermediate (that trade is for small frames like Dedup's edges,
    * not full-table projections). At 100 TB the med/mad passes would
    * swap to approx_percentile partials merged in ONE pass (the sketch
    * twin), which is why the threshold comparison is kept exact-dyadic
    * (see the object doc) rather than leaning on float luck.
    */
  def madOutliers(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.events(spark, dir)
      .select(col("event_type"),
        col("value").cast(DecimalType(12, 2)).*(100).cast("long")
          .as("cents"))
    val med = base.groupBy(col("event_type"))
      .agg(median(col("cents")).as("med"))
    val dev = base.join(broadcast(med), Seq("event_type"))
      .withColumn("d", abs(col("cents") - col("med")))
    val mad = dev.groupBy(col("event_type"))
      .agg(median(col("d")).as("mad"))
    dev.join(broadcast(mad), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(max(col("med")).as("med_cents"), max(col("mad")).as("mad_cents"),
        count(when(col("d") > col("mad") * 3, 1)).as("n_outliers"),
        coalesce(max(when(col("d") > col("mad") * 3, col("d"))), lit(0.0))
          .as("max_dev"))
      .orderBy(col("event_type"))
  }

  private val MadOracle: String =
    """WITH base AS (
      |  SELECT event_type,
      |    cast(cast(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
      |  FROM events),
      |med AS (SELECT event_type, median(cents) AS med
      |  FROM base GROUP BY event_type),
      |dev AS (
      |  SELECT b.event_type, abs(b.cents - m.med) AS d, m.med
      |  FROM base b JOIN med m USING (event_type)),
      |mad AS (SELECT event_type, median(d) AS mad
      |  FROM dev GROUP BY event_type)
      |SELECT dev.event_type, max(dev.med) AS med_cents,
      |  max(mad.mad) AS mad_cents,
      |  cast(count(CASE WHEN dev.d > 3 * mad.mad THEN 1 END) AS BIGINT)
      |    AS n_outliers,
      |  coalesce(max(CASE WHEN dev.d > 3 * mad.mad THEN dev.d END), 0.0)
      |    AS max_dev
      |FROM dev JOIN mad USING (event_type)
      |GROUP BY dev.event_type ORDER BY dev.event_type""".stripMargin

  /** Rolling 30-day median order value per priority — an ORDERED-SET
    * aggregate inside a sliding RANGE frame, the shape q29/q65 (global
    * percentiles) and q46 (sum over a time frame) each cover half of.
    * RANGE peers make same-day rows share one frame, so the windowed
    * median is a pure function of (priority, day) and the output is one
    * row per day with orders.
    *
    * Spark's builtin `median`/`percentile` REJECT bounded window frames
    * ([INVALID_WINDOW_SPEC_FOR_AGGREGATION_FUNC] — only unbounded
    * frames are supported for TypedImperativeAggregates), so the frame
    * median runs as the TWO-LEVEL exact algorithm: pre-aggregate each
    * (priority, day) into its value list, slide the RANGE window over
    * the ≤ 31 DAILY lists (not the raw rows), flatten + array_sort +
    * exact middle pick. Same multiset, same interpolation rule as
    * DuckDB's native row-level windowed median (the oracle keeps that
    * form — the assertion that the rewrite IS the ordered-set
    * semantics). The naive row-level collect_list form is O(rows ×
    * frame-rows) and measured 20.5 s warm at sf0.1; this one does
    * O(days × frame-values) work — 3.6 s on the same lane, and the gap
    * widens linearly with rows-per-day.
    *
    * Scale: per-day lists bound the window state by the calendar, not
    * the row count; the 100 TB swap keeps the same two-level plan and
    * replaces the daily lists with t-digest partials (the q61
    * mergeable-sketch pattern) when single days get too hot — kept
    * exact here because the oracle compares values. Median of integer
    * cents is at worst .5-grained — dyadic-exact on both engines, no
    * rounding needed.
    *
    * r15: `sort_array`, not `array_sort` — array_sort routes through an
    * interpreted comparator lambda (~38M lambda evaluations per lane at
    * sf0.1, measured 1.4 s per evaluation site), sort_array is the
    * native primitive-array sort. Identical ascending order on
    * non-null bigint arrays. Lane: 3.9 s → 1.5 s.
    */
  def rollingMedian(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("v_orders_rm")
    spark.sql(
      """WITH daily AS (
        |  SELECT o_orderpriority, date_trunc('DAY', o_orderdate) AS day,
        |    collect_list(
        |      cast(cast(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
        |      AS vals
        |  FROM v_orders_rm GROUP BY 1, 2),
        |framed AS (
        |  SELECT o_orderpriority, day,
        |    sort_array(flatten(collect_list(vals) OVER (
        |      PARTITION BY o_orderpriority ORDER BY day
        |      RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)))
        |      AS s
        |  FROM daily)
        |SELECT o_orderpriority, date_format(day, 'yyyy-MM-dd') AS d,
        |  CASE WHEN size(s) % 2 = 1
        |    THEN cast(element_at(s, cast(size(s) div 2 AS INT) + 1) AS DOUBLE)
        |    ELSE (element_at(s, cast(size(s) div 2 AS INT))
        |          + element_at(s, cast(size(s) div 2 AS INT) + 1)) / 2.0
        |    END AS med_30d
        |FROM framed
        |ORDER BY o_orderpriority, d""".stripMargin)
  }

  private val RollingMedianOracle: String =
    """SELECT DISTINCT o_orderpriority,
      |  strftime(o_orderdate, '%Y-%m-%d') AS d,
      |  median(cast(cast(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
      |    OVER (PARTITION BY o_orderpriority ORDER BY o_orderdate
      |      RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW)
      |    AS med_30d
      |FROM orders
      |ORDER BY o_orderpriority, d""".stripMargin

  /** Rank-bracket half-width for [[rollingMedianKll]] in percent of the
    * frame size: the estimate's exact rank must land in
    * [45 %, 55 %] · n. Measured sketch error ≤0.6 % (KllSketch
    * scaladoc) — ~8× margin; at the gate SFs frames are smaller than
    * K=512, so the sketch is EXACT and the bracket binds only at scale
    * (the sketch_approx_topk posture).
    */
  private val MedianBracketPct = 5

  /** Shared substrate of the registered and lean sketch forms: the UDF
    * registrations (one source of truth for the flat-encoding merge —
    * a divergence here would silently invalidate the head-to-head
    * probe) and the per-(priority, day) sketch partial CTE.
    */
  private[graft] def registerKllUdfsPublic(spark: SparkSession): Unit =
    registerKllUdfs(spark)

  private def registerKllUdfs(spark: SparkSession): Unit = {
    spark.udf.register("kll_day", org.apache.spark.sql.functions.udaf(
      new KllSketch.KllLongsAgg(), org.apache.spark.sql.Encoders.scalaLong))
    // r15: merge the flat encodings directly (mergeLongs) instead of
    // decoding each sketch into K-capacity Levels first — identical
    // merge law (spec-pinned), no per-sketch 512-long zeroed allocs;
    // this UDF runs once per OUTPUT ROW with ≤31 sketches each
    spark.udf.register("kll_med", (sks: Seq[Seq[Long]]) => {
      val it = sks.iterator
      if (!it.hasNext) KllSketch.quantiles(KllSketch.empty, Array(0.5))(0)
      else {
        val acc = KllSketch.fromLongs(it.next().toArray)
        while (it.hasNext) KllSketch.mergeLongs(acc, it.next().toArray)
        KllSketch.quantiles(acc, Array(0.5))(0)
      }
    })
  }

  /** The per-day sketch-partial CTE over `view` (with or without the
    * gate-scale exact-value substrate).
    */
  private def dailySketchCte(view: String, withVals: Boolean): String = {
    val vals = if (withVals)
      """
        |    collect_list(
        |      cast(cast(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
        |      AS vals,""".stripMargin
    else ""
    s"""WITH daily AS (
      |  SELECT o_orderpriority, date_trunc('DAY', o_orderdate) AS day,
      |    kll_day(cast(cast(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
      |      AS sk,$vals
      |    count(*) AS n
      |  FROM $view GROUP BY 1, 2)""".stripMargin
  }

  /** The 100 TB FLIP of [[rollingMedian]] (the q74b discipline): same
    * two-level rolling-median shape, but the per-day partial is a
    * MERGEABLE KLL SKETCH (`array<bigint>`-encoded, K·log(n/K) longs)
    * instead of the day's full value list — per-output-row window
    * state becomes O(31·K·log) regardless of rows-per-day, which is
    * the knob the r12 probe priced as the exact form's only
    * growth axis. The window merges the ≤31 daily sketches per row
    * and takes the p50 estimate; because KLL estimates are
    * merge-order-dependent (NOTES #17), the estimate itself NEVER
    * reaches the hash oracle — the emitted row is exact integers
    * (frame count, rank bracket) plus `in_bracket`, verified here
    * against an exact rank computed from the daily value lists (a
    * GATE-SCALE verification substrate the 100 TB deployment drops;
    * the oracle replays the bracket arithmetic and a literal TRUE).
    */
  def rollingMedianKll(spark: SparkSession, dir: String): DataFrame = {
    registerKllUdfs(spark)
    Tables.orders(spark, dir).createOrReplaceTempView("v_orders_rmk")
    spark.sql(
      s"""${dailySketchCte("v_orders_rmk", withVals = true)},
        |framed AS (
        |  SELECT o_orderpriority, day,
        |    kll_med(collect_list(sk) OVER w) AS est,
        |    flatten(collect_list(vals) OVER w) AS fvals,
        |    sum(n) OVER w AS n_frame
        |  FROM daily
        |  WINDOW w AS (PARTITION BY o_orderpriority ORDER BY day
        |    RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW))
        |SELECT o_orderpriority, date_format(day, 'yyyy-MM-dd') AS d,
        |  n_frame,
        |  n_frame * ${50 - MedianBracketPct} div 100 AS lo_rank,
        |  (n_frame * ${50 + MedianBracketPct} + 99) div 100 AS hi_rank,
        |  -- the filter() lambda is deliberately spelled TWICE: the double
        |  -- reference to est/fvals is what stops CollapseProject from
        |  -- inlining their window-output definitions into the lambda
        |  -- body — a single-use est inlines the kll_med UDF inside the
        |  -- lambda and re-runs the 31-sketch merge PER ARRAY ELEMENT
        |  -- (measured 272 s vs 6 s, r15). The second frame scan costs
        |  -- ~0.2 s; the barrier it buys is 40×.
        |  (size(filter(fvals, x -> x <= est))
        |     >= n_frame * ${50 - MedianBracketPct} div 100 AND
        |   size(filter(fvals, x -> x <= est))
        |     <= (n_frame * ${50 + MedianBracketPct} + 99) div 100)
        |    AS in_bracket
        |FROM framed
        |ORDER BY o_orderpriority, d""".stripMargin)
  }

  /** PROBE-ONLY deployment form of [[rollingMedianKll]]: sketch
    * partials only — no exact-value window substrate, which is the
    * part a 100 TB run drops (the registered q97b keeps it because the
    * GATE needs the exact rank). Not registered: the median estimate
    * is merge-order-dependent (NOTES #17), so this form has no honest
    * hash oracle — its purpose is the ScaleProbe head-to-head against
    * the exact q97 at 10×/100×, pricing exactly what the flip buys.
    */
  private[graft] def rollingMedianKllLean(spark: SparkSession,
      dir: String): DataFrame = {
    registerKllUdfs(spark)
    Tables.orders(spark, dir).createOrReplaceTempView("v_orders_rml")
    spark.sql(
      s"""${dailySketchCte("v_orders_rml", withVals = false)}
        |SELECT o_orderpriority, date_format(day, 'yyyy-MM-dd') AS d,
        |  sum(n) OVER w AS n_frame,
        |  kll_med(collect_list(sk) OVER w) AS est_med
        |FROM daily
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY day
        |  RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderpriority, d""".stripMargin)
  }

  private val RollingMedianKllOracle: String =
    s"""WITH daily AS (
      |  SELECT o_orderpriority, date_trunc('day', o_orderdate) AS day,
      |    count(*) AS n
      |  FROM orders GROUP BY 1, 2),
      |framed AS (
      |  SELECT o_orderpriority, day,
      |    sum(n) OVER (PARTITION BY o_orderpriority ORDER BY day
      |      RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW)
      |      AS n_frame
      |  FROM daily)
      |SELECT o_orderpriority, strftime(day, '%Y-%m-%d') AS d,
      |  CAST(n_frame AS BIGINT) AS n_frame,
      |  CAST(n_frame * ${50 - MedianBracketPct} // 100 AS BIGINT) AS lo_rank,
      |  CAST((n_frame * ${50 + MedianBracketPct} + 99) // 100 AS BIGINT)
      |    AS hi_rank,
      |  TRUE AS in_bracket
      |FROM framed ORDER BY o_orderpriority, d""".stripMargin

  val registry: Seq[QueryDef] = Seq(
    QueryDef("q95_gapfill", gapfillInterp _, GapfillOracle),
    QueryDef("q96_mad_outliers", madOutliers _, MadOracle),
    QueryDef("q97_rolling_median", rollingMedian _, RollingMedianOracle),
    QueryDef("q97b_rolling_median_kll", rollingMedianKll _,
      RollingMedianKllOracle)
  )
}
