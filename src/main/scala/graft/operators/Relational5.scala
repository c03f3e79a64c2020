package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.{QueryDef, Tables}

/** Fifth relational batch — warehouse/product-analytics composites the
  * earlier batches didn't cover as first-class operators: SCD-2 interval
  * construction, funnel conversion, exact-integer anomaly flagging, and
  * Spark 4's pipe-syntax SQL surface.
  */
object Relational5 {

  /** Slowly-changing-dimension (type 2) build from an event history:
    * collapse each customer's order-status history to its CHANGE points,
    * then stamp version numbers and [valid_from, valid_to) intervals
    * (valid_to NULL = current). Change detection is lag(); interval
    * closing is lead() over the surviving change rows — two window
    * passes over the SAME (custkey, date, orderkey) ordering, so
    * Catalyst plans ONE shuffle and one sort for both.
    *
    * Scale: this is the standard dimension-table rebuild; partitioning
    * is by the dimension key, state per key is the row itself — no
    * driver-side state, no iteration.
    */
  def q70Scd2(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val changes = Tables.orders(spark, dir)
      .withColumn("prev", lag(col("o_orderstatus"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("o_orderstatus"))
    changes
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_to_ts", lead(col("o_orderdate"), 1).over(w))
      .select(col("o_custkey"), col("version"), col("o_orderstatus"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("valid_from"),
        date_format(col("valid_to_ts"), "yyyy-MM-dd").as("valid_to"))
      .orderBy(col("o_custkey"), col("version"))
  }

  /** Funnel conversion: users who signed up, and of those, users whose
    * FIRST post-signup purchase came within 7 days. Two stages, each a
    * (stage, n_users, conv_bps) row; conversion is integer basis points
    * (exact on both engines — no float percentage drift). The
    * signup-side frame is 150 users, so the purchase probe is a
    * broadcast join against the event scan — stage-2 never shuffles the
    * event table.
    */
  def q71Funnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val signups = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("s_ts"))
    val converted = ev.filter(col("event_type") === "purchase")
      .join(broadcast(signups), Seq("user_id"))
      .filter(col("ts") > col("s_ts")
        && col("ts") <= col("s_ts") + expr("INTERVAL 7 DAYS"))
      .select(col("user_id")).distinct()
    val n1 = signups.agg(count(lit(1)).as("n1"))
    val n2 = converted.agg(count(lit(1)).as("n2"))
    val stage1 = n1.select(lit("1_signup").as("stage"),
      col("n1").as("n_users"), lit(10000L).as("conv_bps"))
    val stage2 = n2.crossJoin(broadcast(n1))
      .select(lit("2_purchase_7d").as("stage"), col("n2").as("n_users"),
        expr("n2 * 10000 div n1").as("conv_bps"))
    stage1.unionAll(stage2).orderBy(col("stage"))
  }

  /** Population 3σ anomaly counts per event_type with an EXACT integer
    * verdict: x is an outlier iff (n·x − Σ)² > 9·(n·Σx² − Σ²) — the
    * z-score test cleared of denominators, evaluated over integer cents
    * in DECIMAL(38,0) (HUGEINT on the oracle side). No float mean, no
    * float stddev, no epsilon: the flag can never flip on cross-engine
    * rounding, and DECIMAL(38,0) keeps the squared terms exact far past
    * 100 TB row counts (values here ≈ 10¹⁸ vs 10³⁸ headroom).
    *
    * Scale: one map-side-combinable aggregate builds the 5-row moments
    * frame; it broadcasts back onto the scan — the event table is
    * never shuffled.
    */
  def q72Anomaly(spark: SparkSession, dir: String): DataFrame = {
    val d38 = DecimalType(38, 0)
    val ev = Tables.events(spark, dir)
      .select(col("event_type"),
        col("value").cast(DecimalType(12, 2)).*(100).cast("long").as("cents"))
    val moments = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"),
        // second moment accumulated in decimal so it stays exact past
        // long range (the oracle's BIGINT sum is fine at oracle SF)
        sum(col("cents").cast(d38) * col("cents").cast(d38)).as("s2"))
    val lhs = (col("n").cast(d38) * col("cents").cast(d38)
      - col("s").cast(d38))
    val rhs = (col("n").cast(d38) * col("s2").cast(d38)
      - col("s").cast(d38) * col("s").cast(d38)) * 9
    ev.join(broadcast(moments), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n"),
        sum(when(lhs * lhs > rhs, 1L).otherwise(0L)).as("n_anomalies"))
      .orderBy(col("event_type"))
  }

  /** The same filter→aggregate→sort expressed in Spark 4's SQL pipe
    * syntax (`|>` — SQL that reads in execution order, per the
    * SQL-has-problems-we-can-fix-them line of work). Pipe operators
    * lower to exactly the plan the nested form produces; the oracle is
    * the classic formulation, so the query proves the surface parses
    * AND agrees.
    */
  def q73PipeSql(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem")
    spark.sql(
      """FROM lineitem
        ||> WHERE l_quantity > 10
        ||> AGGREGATE count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        |   GROUP BY l_returnflag
        ||> ORDER BY l_returnflag""".stripMargin)
  }

  val registry: Seq[QueryDef] = Seq(
    QueryDef("q70_scd2", q70Scd2 _,
      """WITH ordered AS (
        |  SELECT o_custkey, o_orderkey, o_orderstatus, o_orderdate,
        |    lag(o_orderstatus) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey) AS prev
        |  FROM orders),
        |chg AS (
        |  SELECT * FROM ordered WHERE prev IS NULL OR prev <> o_orderstatus)
        |SELECT o_custkey, cast(row_number() OVER w AS BIGINT) AS version,
        |  o_orderstatus,
        |  strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
        |  strftime(lead(o_orderdate) OVER w, '%Y-%m-%d') AS valid_to
        |FROM chg
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, version""".stripMargin),
    QueryDef("q71_funnel", q71Funnel _,
      """WITH s AS (
        |  SELECT user_id, min(ts) AS s_ts FROM events
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |conv AS (
        |  SELECT DISTINCT e.user_id FROM events e JOIN s USING (user_id)
        |  WHERE e.event_type = 'purchase'
        |    AND e.ts > s.s_ts AND e.ts <= s.s_ts + INTERVAL 7 DAY),
        |n1 AS (SELECT count(*) AS n1 FROM s),
        |n2 AS (SELECT count(*) AS n2 FROM conv)
        |SELECT stage, n_users, conv_bps FROM (
        |  SELECT '1_signup' AS stage, n1 AS n_users,
        |    cast(10000 AS BIGINT) AS conv_bps FROM n1
        |  UNION ALL
        |  SELECT '2_purchase_7d', n2, n2 * 10000 // n1 FROM n2, n1)
        |ORDER BY stage""".stripMargin),
    QueryDef("q72_anomaly", q72Anomaly _,
      """WITH c AS (
        |  SELECT event_type,
        |    cast(cast(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        |  FROM events),
        |m AS (
        |  SELECT event_type, count(*) AS n, sum(cents) AS s,
        |    sum(cents * cents) AS s2
        |  FROM c GROUP BY event_type)
        |SELECT event_type, max(n) AS n,
        |  cast(sum(CASE WHEN (cast(n AS HUGEINT) * cents - s)
        |             * (cast(n AS HUGEINT) * cents - s)
        |           > 9 * (cast(n AS HUGEINT) * s2 - cast(s AS HUGEINT) * s)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
        |FROM c JOIN m USING (event_type)
        |GROUP BY event_type ORDER BY event_type""".stripMargin),
    QueryDef("q73_pipe_sql", q73PipeSql _,
      """SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem WHERE l_quantity > 10
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
  )
}
