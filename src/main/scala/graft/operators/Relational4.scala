package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{QueryDef, Tables}

/** Fourth relational batch: the aggregate families a warehouse migration
  * would hit next — ordered-set aggregates (WITHIN GROUP), linear-
  * regression aggregates, bitwise aggregates + the FILTER clause, and
  * LISTAGG. All SQL-surface (exercising the parser alongside the
  * DataFrame API) and all single-shuffle hash aggregates at scale.
  *
  * Rounding idioms follow NOTES.md: corr (≈1e-14 cross-engine drift on a
  * ~1-magnitude value) takes the shared r4; slope/intercept/covariance
  * (1e4-magnitude values whose co-moment summation order differs between
  * engines) round at 2 decimals so the larger absolute drift stays far
  * from a knife-edge.
  */
object Relational4 {

  /** Ordered-set aggregates: mode + PERCENTILE_CONT ... WITHIN GROUP.
    * mode() ties are engine-nondeterministic, so the argument is capped
    * at 3: the 3-bin absorbs lines 3..7 and dominates STRICTLY under
    * both plausible l_linenumber distributions — 5/7 of the mass if
    * uniform 1..7 (this synthetic data), 15/28 vs 7/28 if TPC-H
    * triangular (freq ∝ 8−k). Dominance by construction, not data luck.
    */
  def q65OrderedSet(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("v_lineitem_os")
    spark.sql("""
      SELECT l_returnflag,
        cast(mode(least(l_linenumber, 3)) AS BIGINT) AS mode_line,
        floor(percentile_cont(0.5) WITHIN GROUP (ORDER BY cast(l_quantity AS DOUBLE))
          * 10000 + 0.5) / 10000 AS med_qty,
        floor(percentile_cont(0.9) WITHIN GROUP (ORDER BY cast(l_extendedprice AS DOUBLE))
          * 100 + 0.5) / 100 AS p90_price,
        count(*) AS n
      FROM v_lineitem_os GROUP BY l_returnflag ORDER BY l_returnflag""")
  }

  /** Linear-regression aggregate family over (quantity, price) pairs:
    * corr / regr_slope / regr_intercept / regr_count / covar_samp. One
    * partial+final hash-agg shuffle; the co-moments are mergeable, so
    * the plan is the same map-side-combine shape as a plain sum at any
    * scale.
    */
  def q66RegrAggs(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("v_lineitem_rg")
    spark.sql("""
      WITH t AS (SELECT l_returnflag, cast(l_quantity AS DOUBLE) AS x,
                        cast(l_extendedprice AS DOUBLE) AS y
                 FROM v_lineitem_rg)
      SELECT l_returnflag,
        floor(corr(x, y) * 10000 + 0.5) / 10000 AS corr_xy,
        floor(regr_slope(y, x) * 100 + 0.5) / 100 AS slope,
        floor(regr_intercept(y, x) * 100 + 0.5) / 100 AS intercept,
        cast(regr_count(y, x) AS BIGINT) AS n,
        floor(covar_samp(x, y) * 100 + 0.5) / 100 AS cov_xy
      FROM t GROUP BY l_returnflag ORDER BY l_returnflag""")
  }

  /** Bitwise aggregates + the standard FILTER clause + boolean
    * aggregates — exact-integer/boolean semantics, no rounding needed.
    */
  def q67BitAggs(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("v_orders_ba")
    spark.sql("""
      SELECT o_orderpriority,
        cast(bit_and(o_custkey) AS BIGINT) AS band,
        cast(bit_or(o_custkey) AS BIGINT) AS bor,
        cast(bit_xor(o_custkey) AS BIGINT) AS bxor,
        count(*) FILTER (WHERE o_totalprice > 100000) AS n_big,
        bool_and(o_totalprice > 0) AS all_pos,
        bool_or(o_orderstatus = 'F') AS any_f
      FROM v_orders_ba GROUP BY o_orderpriority ORDER BY o_orderpriority""")
  }

  /** LISTAGG ... WITHIN GROUP (new in Spark 4) over the nation/region
    * star — ordered string concatenation per group, broadcast join.
    */
  def q68Listagg(spark: SparkSession, dir: String): DataFrame = {
    Tables.nation(spark, dir).createOrReplaceTempView("v_nation_la")
    Tables.region(spark, dir).createOrReplaceTempView("v_region_la")
    spark.sql("""
      SELECT r_name,
        listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS nations,
        count(*) AS n_nations
      FROM v_nation_la JOIN v_region_la ON n_regionkey = r_regionkey
      GROUP BY r_name ORDER BY r_name""")
  }

  /** GROUP BY ALL / ORDER BY ALL (DuckDB-originated sugar, in Spark
    * since 3.4/4.0): grouping keys inferred from the non-aggregate
    * select items, ordering over the full select list. Same physical
    * plan as the explicit form — this query pins the parser surface.
    */
  def q69GroupByAll(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("v_orders_gba")
    spark.sql("""
      SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        cast(sum(cast(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      FROM v_orders_gba GROUP BY ALL ORDER BY ALL""")
  }

  val registry: Seq[QueryDef] = Seq(
    QueryDef("q65_ordered_set", q65OrderedSet _,
      """SELECT l_returnflag,
        |  cast(mode(least(l_linenumber, 3)) AS BIGINT) AS mode_line,
        |  floor(quantile_cont(cast(l_quantity AS DOUBLE), 0.5) * 10000 + 0.5)
        |    / 10000 AS med_qty,
        |  floor(quantile_cont(cast(l_extendedprice AS DOUBLE), 0.9) * 100 + 0.5)
        |    / 100 AS p90_price,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
    QueryDef("q66_regr_aggs", q66RegrAggs _,
      """WITH t AS (SELECT l_returnflag, cast(l_quantity AS DOUBLE) AS x,
        |                  cast(l_extendedprice AS DOUBLE) AS y
        |           FROM lineitem)
        |SELECT l_returnflag,
        |  floor(corr(x, y) * 10000 + 0.5) / 10000 AS corr_xy,
        |  floor(regr_slope(y, x) * 100 + 0.5) / 100 AS slope,
        |  floor(regr_intercept(y, x) * 100 + 0.5) / 100 AS intercept,
        |  cast(regr_count(y, x) AS BIGINT) AS n,
        |  floor(covar_samp(x, y) * 100 + 0.5) / 100 AS cov_xy
        |FROM t GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
    QueryDef("q67_bit_aggs", q67BitAggs _,
      """SELECT o_orderpriority,
        |  cast(bit_and(o_custkey) AS BIGINT) AS band,
        |  cast(bit_or(o_custkey) AS BIGINT) AS bor,
        |  cast(bit_xor(o_custkey) AS BIGINT) AS bxor,
        |  count(*) FILTER (WHERE o_totalprice > 100000) AS n_big,
        |  bool_and(o_totalprice > 0) AS all_pos,
        |  bool_or(o_orderstatus = 'F') AS any_f
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
    QueryDef("q69_group_by_all", q69GroupByAll _,
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  cast(sum(cast(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY ALL ORDER BY ALL""".stripMargin),
    QueryDef("q68_listagg", q68Listagg _,
      """SELECT r_name,
        |  string_agg(n_name, ',' ORDER BY n_name) AS nations,
        |  count(*) AS n_nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin)
  )
}
