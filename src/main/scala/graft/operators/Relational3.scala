package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Third relational wave (round 2): queries that close remaining harness
  * gaps — starting with the supplier table, the one test table round 1
  * never scanned.
  */
object Relational3 {

  /** Supplier-side revenue rollup: lineitem ⋈ supplier ⋈ nation ⋈ region,
    * revenue and supplier counts per (region, nation). The supplier-side
    * twin of the customer star join (q3): all three dimensions broadcast,
    * so the only real exchange is the final 2-key aggregation — the plan
    * you want when lineitem is 100 TB and supplier is GBs.
    */
  def q44SupplierRevenue(spark: SparkSession, dir: String): DataFrame = {
    import Tables.{money, rate}
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.supplier(spark, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        sum(money(col("l_extendedprice")) * (lit(1) - rate(col("l_discount"))))
          .cast("double").as("revenue"),
        countDistinct(col("s_suppkey")).as("n_suppliers"),
        count(lit(1)).as("n_lineitems"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** Supplier health margin: per-nation supplier account-balance stats
    * with a negative-balance share — a broadcast-dim aggregate touching
    * only the supplier table (bounded output, no fact scan).
    */
  def q45SupplierBalance(spark: SparkSession, dir: String): DataFrame =
    Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        count(lit(1)).as("n_suppliers"),
        sum(Tables.money(col("s_acctbal"))).cast("double").as("total_bal"),
        round(avg(col("s_acctbal")), 2).as("avg_bal"),
        sum(when(col("s_acctbal") < 0, 1).otherwise(0)).cast("long").as("n_negative"))
      .orderBy(col("n_name"))

  val registry: Seq[QueryDef] = Seq(
    QueryDef("q44_supplier_revenue", q44SupplierRevenue _,
      """SELECT r_name, n_name,
        |  cast(sum(cast(l_extendedprice AS DECIMAL(12,2))
        |    * (1 - cast(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
        |  count(DISTINCT s_suppkey) AS n_suppliers,
        |  count(*) AS n_lineitems
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin),
    QueryDef("q45_supplier_balance", q45SupplierBalance _,
      """SELECT n_name, count(*) AS n_suppliers,
        |  cast(sum(cast(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal,
        |  round(avg(s_acctbal), 2) AS avg_bal,
        |  cast(sum(CASE WHEN s_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_negative
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin)
  )
}
