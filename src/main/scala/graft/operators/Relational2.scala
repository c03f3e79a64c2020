package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Second relational wave: outer/cross joins, grouping sets, analytic
  * window functions, exact percentiles, statistical aggregates,
  * collect_set, approx-distinct sketches, and a salted-aggregation skew
  * demonstration.
  */
object Relational2 {

  /** Two-phase salted aggregation — the skew idiom: shuffle 1 spreads a
    * hot key over (key, salt) buckets, shuffle 2 merges the ≤8
    * partials per key. Results are identical to a plain groupBy
    * (decimal partials keep the sums exact), which is what the oracle
    * checks. At 100 TB this is the standing answer to a hot event_type;
    * AQE skew handling covers joins, salting covers aggregations.
    */
  def q23SaltedAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("salt", pmod(col("event_id"), lit(8)))
      .groupBy(col("event_type"), col("salt"))
      .agg(count(lit(1)).as("pn"), sum(Tables.money(col("value"))).as("ps"))
      .groupBy(col("event_type"))
      .agg(sum(col("pn")).as("n"), sum(col("ps")).cast("double").as("sum_value"))
      .orderBy(col("event_type"))

  /** GROUPING SETS + grouping() marker through the SQL surface. */
  def q24GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("v_orders_gs")
    spark.sql(
      """SELECT o_orderstatus, o_orderpriority,
        |  cast(grouping(o_orderstatus) AS BIGINT) AS g_status,
        |  cast(grouping(o_orderpriority) AS BIGINT) AS g_prio,
        |  count(*) AS n
        |FROM v_orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)
  }

  /** Full outer join (aggregated to per-custkey order counts). */
  def q25OuterJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"), "full_outer")
      .groupBy(coalesce(col("c_custkey"), col("o_custkey")).as("custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"),
        max(col("c_name")).as("name"))
      .orderBy(col("custkey"))

  /** Cross join (bounded dims — the only legitimate cartesian). */
  def q26CrossJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.nation(spark, dir).select(col("n_name"))
      .crossJoin(Tables.region(spark, dir).select(col("r_name")))
      .orderBy(col("n_name"), col("r_name"))

  /** Analytic window battery: lag/lead/first/last over each customer's
    * order history (unique total order ⇒ deterministic).
    */
  def q28WindowAnalytic(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        round(lag(col("o_totalprice"), 1).over(w), 2).as("prev_price"),
        round(lead(col("o_totalprice"), 1).over(w), 2).as("next_price"),
        round(first(col("o_totalprice")).over(wAll), 2).as("first_price"),
        round(last(col("o_totalprice")).over(wAll), 2).as("last_price"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Exact percentiles: median + quartiles per order priority.
    * Interpolated values of 2-decimal inputs have ≤4 decimals, so
    * round(…,4) is identity on the true value and snaps both engines'
    * ±1-ulp results together.
    */
  def q29Percentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(round(median(col("o_totalprice")), 4).as("med_price"),
        round(percentile(col("o_totalprice"), lit(0.25)), 4).as("p25"),
        round(percentile(col("o_totalprice"), lit(0.75)), 4).as("p75"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))

  /** Statistical aggregates (rounded past the single-pass fp noise). */
  def q30StatsAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(round(stddev_samp(col("o_totalprice")), 2).as("sd_price"),
        round(corr(col("o_totalprice"), col("o_custkey")), 4).as("corr_pc"),
        round(covar_samp(col("o_totalprice"), col("o_custkey")), 2).as("covar_pc"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))

  /** collect_set made deterministic via sort_array; the array is
    * serialized with array_join so the driver's pandas comparator can
    * hash the cell (raw array cells are unhashable there).
    */
  def q31Collect(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(array_join(sort_array(collect_set(col("l_linestatus"))), ",").as("statuses"),
        countDistinct(col("l_linestatus")).as("n_statuses"))
      .orderBy(col("l_returnflag"))

  /** HLL estimate vs exact. The raw sketch value is impl-specific, so
    * (same exact-bracket idiom as [[q37ApproxPercentile]]) the oracled
    * output is the exact distinct count plus a boolean pinning the
    * estimate within 5 % relative error — deterministic for fixed data
    * (HLL hashing has no run-to-run randomness), replayed by DuckDB as
    * a literal TRUE, so a sketch regression breaks the hash loudly.
    * [[q32Frame]] keeps both raw values for the error-bound spec.
    */
  private[graft] def q32Frame(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"))

  def q32ApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    q32Frame(spark, dir)
      .select(col("l_returnflag"), col("exact_parts"),
        (abs(col("approx_parts") - col("exact_parts"))
          <= col("exact_parts") * 0.05).as("in_bracket"))
      .orderBy(col("l_returnflag"))

  /** linestatus→qty map per returnflag, map_from_entries over a sorted
    * entry list for determinism — shared by q33 and q40.
    */
  private def statusQtyMap(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("q"))
      .groupBy(col("l_returnflag"))
      .agg(map_from_entries(sort_array(collect_list(
        struct(col("l_linestatus"), col("q"))))).as("m"))

  /** MapType functions: build, then extract scalars — the map stays
    * internal so the output schema is oracle-comparable. try_element_at:
    * ANSI mode (Spark 4 default) makes a missing map key a runtime
    * ERROR, while the oracle's CASE-sum yields NULL — on any corpus
    * where some returnflag lacks an 'F' or 'O' row, element_at would
    * crash where the oracle returns NULL.
    */
  def q33MapFns(spark: SparkSession, dir: String): DataFrame =
    statusQtyMap(spark, dir)
      .select(col("l_returnflag"),
        try_element_at(col("m"), lit("F")).as("f_qty"),
        try_element_at(col("m"), lit("O")).as("o_qty"),
        size(map_keys(col("m"))).cast("long").as("n_keys"))
      .orderBy(col("l_returnflag"))

  /** posexplode (UDTF-style lateral view) with 1-based positions. */
  def q34Posexplode(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .filter(col("vec_id") < 5)
      .select(col("vec_id"), posexplode(col("embedding")))
      .select(col("vec_id"), (col("pos") + 1).cast("long").as("pos"),
        round(col("col").cast("double"), 6).as("val"))
      .orderBy(col("vec_id"), col("pos"))

  /** Array slice/reverse battery over embeddings. */
  def q35ArraySlice(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        round(aggregate(transform(slice(col("embedding"), 1, 8),
          x => x.cast("double")), lit(0.0), (a, x) => a + x), 6).as("head8_sum"),
        round(element_at(reverse(col("embedding")), 1).cast("double"), 6).as("last_elem"))
      .orderBy(col("vec_id"))

  /** regexp_extract_all battery: all letter-runs and all capital-runs of
    * each part name/type. Match arrays are serialized with array_join
    * (preserving match order) so the comparator can hash the cells.
    */
  def q36RegexpAll(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(col("p_partkey"),
        array_join(regexp_extract_all(col("p_name"), lit("[a-z]+"), lit(0)), ",").as("words"),
        array_join(regexp_extract_all(col("p_type"), lit("[A-Z]+"), lit(0)), ",").as("caps"),
        size(regexp_extract_all(col("p_name"), lit("[aeiou]"), lit(0)))
          .cast("long").as("n_vowels"))
      .orderBy(col("p_partkey"))

  /** Approximate percentile sketch beside its exact twin. The sketch's
    * RAW output is impl-specific (KLL-style rank interpolation), so it
    * can't be value-matched across engines; instead the oracled output
    * is the exact median plus a BRACKET CHECK: approx-p50 must land
    * between the exact 45th and 55th percentiles. At accuracy=1000 the
    * sketch's rank error is ~n/1000 — two orders of magnitude inside the
    * ±5 % rank bracket — so the boolean is stably TRUE, DuckDB replays
    * it as a literal, and a sketch regression breaks the hash loudly.
    * NOTE: the exact percentiles here are VERIFICATION cost, not the
    * production shape — a deployment runs the percentile_approx
    * aggregate alone (one mergeable sketch per group, no sort-agg),
    * which is the documented scale path beside q65's exact twins.
    */
  def q37ApproxPercentile(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        percentile_approx(col("o_totalprice"), lit(0.5), lit(1000)).as("am"),
        percentile(col("o_totalprice"), lit(0.45)).as("p45"),
        percentile(col("o_totalprice"), lit(0.55)).as("p55"),
        round(median(col("o_totalprice")), 4).as("exact_med"))
      .select(col("o_orderpriority"), col("exact_med"),
        (col("am") >= col("p45") && col("am") <= col("p55")).as("in_bracket"))
      .orderBy(col("o_orderpriority"))

  /** Rank-family window functions: percent_rank / cume_dist / ntile. */
  def q38RankFns(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .filter(col("o_orderkey") <= 2000)
      .select(col("o_orderpriority"), col("o_orderkey"),
        (floor(percent_rank().over(w) * 10000 + 0.5) / 10000).as("pr"),
        (floor(cume_dist().over(w) * 10000 + 0.5) / 10000).as("cd"),
        ntile(4).over(w).cast("long").as("quartile"))
      .orderBy(col("o_orderpriority"), col("o_orderkey"))
  }

  /** Subquery battery through the SQL surface: IN, NOT IN (null-safe),
    * and a scalar subquery — Catalyst rewrites these to semi/anti joins.
    */
  def q39Subqueries(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("v_orders_sq")
    Tables.customer(spark, dir).createOrReplaceTempView("v_customer_sq")
    spark.sql(
      """SELECT c_custkey, c_name,
        |  c_custkey IN (SELECT o_custkey FROM v_orders_sq
        |    WHERE o_totalprice > 400000) AS is_big_spender,
        |  cast(round((SELECT max(o_totalprice) FROM v_orders_sq), 2) AS DOUBLE) AS global_max
        |FROM v_customer_sq
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM v_orders_sq
        |  WHERE o_orderstatus = 'P' AND o_custkey IS NOT NULL)
        |ORDER BY c_custkey""".stripMargin)
  }

  /** Map transform functions: transform_values/transform_keys over the
    * shared built map, scalars extracted for oracle comparability.
    */
  def q40MapTransform(spark: SparkSession, dir: String): DataFrame =
    statusQtyMap(spark, dir)
      .select(col("l_returnflag"),
        try_element_at(transform_values(col("m"), (_, v) => v * 2),
          lit("F")).as("f_doubled"),
        try_element_at(transform_keys(col("m"), (k, _) => concat(lit("s_"), k)),
          lit("s_O")).as("o_via_key"))
      .orderBy(col("l_returnflag"))

  /** Datetime interval arithmetic: +interval, date_add, add_months,
    * last_day — all output as strings for timezone-free comparison.
    * 45 days, NOT 90: DuckDB normalizes intervals at 30 days/month, so
    * `+ INTERVAL 90 DAY` and `+ INTERVAL 3 MONTH` hash as the same
    * expression and its CSE folds them into one — a real engine bug this
    * oracle must sidestep.
    */
  def q41IntervalArith(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_orderkey") <= 500)
      .select(col("o_orderkey"),
        date_format(col("o_orderdate") + expr("INTERVAL 45 DAYS"),
          "yyyy-MM-dd HH:mm:ss").as("plus_45d"),
        date_format(add_months(col("o_orderdate"), 3), "yyyy-MM-dd").as("plus_3mo"),
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"),
        date_format(date_add(col("o_orderdate").cast("date"), 7), "yyyy-MM-dd").as("plus_7d"))
      .orderBy(col("o_orderkey"))

  /** Null-handling battery: coalesce chains, nullif, null-aware
    * aggregation, and explicit null ordering.
    */
  def q42NullHandling(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(col("c_custkey"),
        // synthesize nulls deterministically: every 3rd customer's
        // balance is "unknown"
        when(col("c_custkey") % 3 === 0, lit(null)).otherwise(col("c_acctbal")).as("bal"))
      .groupBy((col("c_custkey") % 10).cast("long").as("bucket"))
      .agg(count(col("bal")).as("n_known"),
        count(lit(1)).as("n_total"),
        round(coalesce(sum(Tables.money(col("bal"))).cast("double")
          / nullif(count(col("bal")), lit(0)), lit(-1.0)), 4).as("avg_known"),
        sum(when(col("bal").isNull, 1).otherwise(0)).cast("long").as("n_null"))
      .orderBy(col("bucket"))

  /** ANSI-mode-safe arithmetic: Spark 4 runs ANSI by default, so
    * division by zero and bad casts THROW unless the try_* family is
    * used — this query exercises exactly those (l_discount is 0.0 on
    * real rows).
    */
  def q43TryArith(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") <= 200)
      .select(col("l_orderkey"), col("l_linenumber"),
        round(try_divide(col("l_extendedprice"), col("l_discount")), 4).as("price_per_disc"),
        try_to_number(col("l_returnflag"), lit("999")).cast("int").as("flag_as_int"),
        col("l_linenumber").cast("string").cast("int").cast("long").as("roundtrip"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  val registry: Seq[QueryDef] = Seq(
    QueryDef("q43_try_arith", q43TryArith _,
      """SELECT l_orderkey, l_linenumber,
        |  CASE WHEN l_discount = 0 THEN NULL
        |    ELSE round(l_extendedprice / l_discount, 4) END AS price_per_disc,
        |  try_cast(l_returnflag AS INT) AS flag_as_int,
        |  cast(l_linenumber AS BIGINT) AS roundtrip
        |FROM lineitem WHERE l_orderkey <= 200
        |ORDER BY l_orderkey, l_linenumber""".stripMargin),
    QueryDef("q41_interval_arith", q41IntervalArith _,
      """SELECT o_orderkey,
        |  strftime(o_orderdate + INTERVAL 45 DAY, '%Y-%m-%d %H:%M:%S') AS plus_45d,
        |  strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus_3mo,
        |  strftime(last_day(cast(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
        |  strftime(cast(o_orderdate AS DATE) + 7, '%Y-%m-%d') AS plus_7d
        |FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey""".stripMargin),
    QueryDef("q42_null_handling", q42NullHandling _,
      """SELECT cast(c_custkey % 10 AS BIGINT) AS bucket,
        |  count(bal) AS n_known, count(*) AS n_total,
        |  round(coalesce(cast(sum(cast(bal AS DECIMAL(12,2))) AS DOUBLE)
        |    / nullif(count(bal), 0), -1.0), 4) AS avg_known,
        |  cast(sum(CASE WHEN bal IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null
        |FROM (SELECT c_custkey,
        |    CASE WHEN c_custkey % 3 = 0 THEN NULL ELSE c_acctbal END AS bal
        |  FROM customer)
        |GROUP BY 1 ORDER BY bucket""".stripMargin),
    QueryDef("q38_rank_fns", q38RankFns _,
      """SELECT o_orderpriority, o_orderkey,
        |  floor(percent_rank() OVER w * 10000 + 0.5) / 10000 AS pr,
        |  floor(cume_dist() OVER w * 10000 + 0.5) / 10000 AS cd,
        |  cast(ntile(4) OVER w AS BIGINT) AS quartile
        |FROM orders WHERE o_orderkey <= 2000
        |WINDOW w AS (PARTITION BY o_orderpriority
        |  ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin),
    QueryDef("q39_subqueries", q39Subqueries _,
      """SELECT c_custkey, c_name,
        |  c_custkey IN (SELECT o_custkey FROM orders
        |    WHERE o_totalprice > 400000) AS is_big_spender,
        |  cast(round((SELECT max(o_totalprice) FROM orders), 2) AS DOUBLE) AS global_max
        |FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
        |  WHERE o_orderstatus = 'P' AND o_custkey IS NOT NULL)
        |ORDER BY c_custkey""".stripMargin),
    QueryDef("q40_map_transform", q40MapTransform _,
      """SELECT l_returnflag,
        |  round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) * 2 AS f_doubled,
        |  round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS o_via_key
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
    QueryDef("q36_regexp_all", q36RegexpAll _,
      """SELECT p_partkey,
        |  array_to_string(regexp_extract_all(p_name, '[a-z]+'), ',') AS words,
        |  array_to_string(regexp_extract_all(p_type, '[A-Z]+'), ',') AS caps,
        |  len(regexp_extract_all(p_name, '[aeiou]')) AS n_vowels
        |FROM part ORDER BY p_partkey""".stripMargin),
    QueryDef("q37_approx_percentile", q37ApproxPercentile _,
      """SELECT o_orderpriority,
        |  round(median(o_totalprice), 4) AS exact_med,
        |  true AS in_bracket
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
    QueryDef("q33_map_fns", q33MapFns _,
      """SELECT l_returnflag,
        |  round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS f_qty,
        |  round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS o_qty,
        |  count(DISTINCT l_linestatus) AS n_keys
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
    QueryDef("q34_posexplode", q34Posexplode _,
      """SELECT vec_id, cast(pos AS BIGINT) AS pos,
        |  round(cast(embedding[pos] AS DOUBLE), 6) AS val
        |FROM embeddings, generate_series(1, 64) AS t(pos)
        |WHERE vec_id < 5 AND pos <= len(embedding)
        |ORDER BY vec_id, pos""".stripMargin),
    QueryDef("q35_array_slice", q35ArraySlice _,
      """SELECT vec_id,
        |  round(list_sum(list_transform(list_slice(embedding, 1, 8),
        |    x -> cast(x AS DOUBLE))), 6) AS head8_sum,
        |  round(cast(list_reverse(embedding)[1] AS DOUBLE), 6) AS last_elem
        |FROM embeddings ORDER BY vec_id""".stripMargin),
    QueryDef("q23_salted_agg", q23SaltedAgg _,
      """SELECT event_type, count(*) AS n,
        |  cast(sum(cast(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
    QueryDef("q24_grouping_sets", q24GroupingSets _,
      """SELECT o_orderstatus, o_orderpriority,
        |  cast(grouping(o_orderstatus) AS BIGINT) AS g_status,
        |  cast(grouping(o_orderpriority) AS BIGINT) AS g_prio,
        |  count(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin),
    QueryDef("q25_outer_join", q25OuterJoin _,
      """SELECT coalesce(c_custkey, o_custkey) AS custkey,
        |  count(o_orderkey) AS n_orders, max(c_name) AS name
        |FROM customer FULL JOIN orders ON c_custkey = o_custkey
        |GROUP BY 1 ORDER BY custkey""".stripMargin),
    QueryDef("q26_cross_join", q26CrossJoin _,
      """SELECT n_name, r_name FROM nation CROSS JOIN region
        |ORDER BY n_name, r_name""".stripMargin),
    QueryDef("q28_window_analytic", q28WindowAnalytic _,
      """SELECT o_custkey, o_orderkey,
        |  round(lag(o_totalprice, 1) OVER w, 2) AS prev_price,
        |  round(lead(o_totalprice, 1) OVER w, 2) AS next_price,
        |  round(first_value(o_totalprice) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2) AS first_price,
        |  round(last_value(o_totalprice) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2) AS last_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin),
    QueryDef("q29_percentiles", q29Percentiles _,
      """SELECT o_orderpriority,
        |  round(median(o_totalprice), 4) AS med_price,
        |  round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
        |  round(quantile_cont(o_totalprice, 0.75), 4) AS p75,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
    QueryDef("q30_stats_agg", q30StatsAgg _,
      """SELECT o_orderstatus,
        |  round(stddev_samp(o_totalprice), 2) AS sd_price,
        |  round(corr(o_totalprice, o_custkey), 4) AS corr_pc,
        |  round(covar_samp(o_totalprice, o_custkey), 2) AS covar_pc,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),
    QueryDef("q31_collect", q31Collect _,
      """SELECT l_returnflag,
        |  array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses,
        |  count(DISTINCT l_linestatus) AS n_statuses
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
    QueryDef("q32_approx_distinct", q32ApproxDistinct _,
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS exact_parts,
        |  true AS in_bracket
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
  )
}
