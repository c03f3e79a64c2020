package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{QueryDef, Tables}

/** Spark 4 SQL-defined functions (`CREATE FUNCTION … RETURN expr`) —
  * the declarative UDF tier: the body is SQL, so Catalyst INLINES it
  * into the calling plan (constant-folds, pushes predicates through,
  * keeps whole-stage codegen) — nothing the JVM-closure `udf()` tier
  * can offer. This is the extension surface a SQL-only user gets
  * without any Scala; the reference's only extension point is the
  * compiled-in map/reduce triple (reference:
  * `user/UserDefinedFunctions.scala:5-30`).
  */
object Relational6 {

  /** Revenue per order priority computed through TWO SQL UDFs: a scalar
    * `graft_disc_price(price, disc)` (exact decimal money math — the
    * q1 idiom as a reusable function) and a predicate
    * `graft_in_window(date, lo_year, n_years)`. Both are declared with
    * CREATE OR REPLACE TEMPORARY FUNCTION and called from ordinary SQL;
    * the executed plan is identical to writing the expressions inline
    * (the oracle does exactly that), proving the inlining: filters
    * still push to the scan, the aggregate still runs partial+final.
    */
  def sqlUdf(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem_v")
    Tables.orders(spark, dir).createOrReplaceTempView("orders_v")
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_disc_price(
        |  price DOUBLE, disc DOUBLE) RETURNS DECIMAL(18,4)
        |RETURN cast(price AS DECIMAL(12,2)) * (1 - cast(disc AS DECIMAL(4,2)))
        |""".stripMargin)
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_in_window(
        |  d TIMESTAMP, lo_year INT, n_years INT) RETURNS BOOLEAN
        |RETURN year(d) >= lo_year AND year(d) < lo_year + n_years
        |""".stripMargin)
    spark.sql(
      """SELECT o.o_orderpriority,
        |  count(*) AS n_items,
        |  cast(sum(graft_disc_price(l.l_extendedprice, l.l_discount))
        |    AS DOUBLE) AS revenue
        |FROM lineitem_v l JOIN orders_v o ON l.l_orderkey = o.o_orderkey
        |WHERE graft_in_window(l.l_shipdate, 1994, 2)
        |GROUP BY o.o_orderpriority
        |ORDER BY o.o_orderpriority""".stripMargin)
  }

  private val SqlUdfOracle: String =
    """SELECT o.o_orderpriority,
      |  count(*) AS n_items,
      |  cast(sum(cast(l.l_extendedprice AS DECIMAL(12,2))
      |    * (1 - cast(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
      |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |WHERE year(l.l_shipdate) >= 1994 AND year(l.l_shipdate) < 1996
      |GROUP BY o.o_orderpriority
      |ORDER BY o.o_orderpriority""".stripMargin

  /** The TABLE half of the SQL-function surface: a parameterized SQL
    * table function (`RETURNS TABLE`) applied via LATERAL to a row of
    * price buckets — the declarative UDTF. Catalyst inlines the body as
    * a correlated lateral subquery (no closure, no serialization), so
    * the rewritten plan is an ordinary aggregate under a lateral join —
    * the oracle states the same computation with the function inlined
    * as a CTE joined on the bucket bounds.
    */
  def sqlTableUdf(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders_v")
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION order_bucket_stats(
        |  lo DOUBLE, hi DOUBLE)
        |RETURNS TABLE(o_orderpriority STRING, n BIGINT, total DOUBLE)
        |RETURN SELECT o_orderpriority, count(*) AS n,
        |  cast(sum(cast(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM orders_v
        |WHERE o_totalprice >= lo AND o_totalprice < hi
        |GROUP BY o_orderpriority
        |""".stripMargin)
    spark.sql(
      """SELECT b.lo, s.o_orderpriority, s.n, s.total
        |FROM VALUES (0.0D, 100000.0D), (100000.0D, 200000.0D),
        |  (200000.0D, 600000.0D) AS b(lo, hi),
        |  LATERAL order_bucket_stats(b.lo, b.hi) AS s
        |ORDER BY b.lo, s.o_orderpriority""".stripMargin)
  }

  private val SqlTableUdfOracle: String =
    """WITH buckets(lo, hi) AS (VALUES (0.0, 100000.0), (100000.0, 200000.0),
      |  (200000.0, 600000.0))
      |SELECT cast(b.lo AS DOUBLE) AS lo, o.o_orderpriority, count(*) AS n,
      |  cast(sum(cast(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      |FROM buckets b JOIN orders o
      |  ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
      |GROUP BY cast(b.lo AS DOUBLE), o.o_orderpriority
      |ORDER BY lo, o_orderpriority""".stripMargin

  val registry: Seq[QueryDef] = Seq(
    QueryDef("q89_sql_udf", sqlUdf _, SqlUdfOracle),
    QueryDef("q91_sql_table_udf", sqlTableUdf _, SqlTableUdfOracle)
  )
}
