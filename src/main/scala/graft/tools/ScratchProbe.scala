package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway sub-stage timing probe for the r15 optimization round —
  * NOT part of the shipped surface; used to attribute lane cost to
  * sub-plans before rewriting them. Deleted/ignored once drilling is
  * done.
  */
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "8192")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(tag: String)(df: => DataFrame): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once()
      val s = Seq.fill(3)(once()).sorted
      println(f"PROBE $tag%-28s median ${s(1)}%.3f s (min ${s(0)}%.3f max ${s(2)}%.3f)")
    }

    graft.Tables.orders(spark, dir).createOrReplaceTempView("v_orders_rm")

    time("q97_daily") { spark.sql(
      """SELECT o_orderpriority, date_trunc('DAY', o_orderdate) AS day,
        |  collect_list(cast(cast(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS vals
        |FROM v_orders_rm GROUP BY 1, 2""".stripMargin) }

    time("q97_framed_nosort") { spark.sql(
      """WITH daily AS (
        |  SELECT o_orderpriority, date_trunc('DAY', o_orderdate) AS day,
        |    collect_list(cast(cast(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS vals
        |  FROM v_orders_rm GROUP BY 1, 2)
        |SELECT o_orderpriority, day,
        |  size(flatten(collect_list(vals) OVER (
        |    PARTITION BY o_orderpriority ORDER BY day
        |    RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW))) AS n
        |FROM daily""".stripMargin) }

    time("q97_sort_single_ref") { spark.sql(
      """WITH daily AS (
        |  SELECT o_orderpriority, date_trunc('DAY', o_orderdate) AS day,
        |    collect_list(cast(cast(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS vals
        |  FROM v_orders_rm GROUP BY 1, 2)
        |SELECT o_orderpriority, day,
        |  size(array_sort(flatten(collect_list(vals) OVER (
        |    PARTITION BY o_orderpriority ORDER BY day
        |    RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)))) AS n
        |FROM daily""".stripMargin) }

    time("q97_sortarray_single_ref") { spark.sql(
      """WITH daily AS (
        |  SELECT o_orderpriority, date_trunc('DAY', o_orderdate) AS day,
        |    collect_list(cast(cast(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS vals
        |  FROM v_orders_rm GROUP BY 1, 2)
        |SELECT o_orderpriority, day,
        |  size(sort_array(flatten(collect_list(vals) OVER (
        |    PARTITION BY o_orderpriority ORDER BY day
        |    RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)))) AS n
        |FROM daily""".stripMargin) }

    time("q97_sortarray_full") { spark.sql(
      """WITH daily AS (
        |  SELECT o_orderpriority, date_trunc('DAY', o_orderdate) AS day,
        |    collect_list(cast(cast(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS vals
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
        |ORDER BY o_orderpriority, d""".stripMargin) }

    time("q97_two_elem_case") { spark.sql(
      """WITH daily AS (
        |  SELECT o_orderpriority, date_trunc('DAY', o_orderdate) AS day,
        |    collect_list(cast(cast(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS vals
        |  FROM v_orders_rm GROUP BY 1, 2),
        |framed AS (
        |  SELECT o_orderpriority, day,
        |    array_sort(flatten(collect_list(vals) OVER (
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
        |ORDER BY o_orderpriority, d""".stripMargin) }

    time("q97_full") {
      graft.operators.Analytics3.registry
        .find(_.name == "q97_rolling_median").get.fn(spark, dir) }

    graft.operators.Analytics3.registerKllUdfsPublic(spark)
    time("q97b_daily_sketch") { spark.sql(
      """SELECT o_orderpriority, date_trunc('DAY', o_orderdate) AS day,
        |  kll_day(cast(cast(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS sk,
        |  count(*) AS n
        |FROM v_orders_rm GROUP BY 1, 2""".stripMargin) }

    time("q97b_est_only") { spark.sql(
      """WITH daily AS (
        |  SELECT o_orderpriority, date_trunc('DAY', o_orderdate) AS day,
        |    kll_day(cast(cast(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS sk,
        |    count(*) AS n
        |  FROM v_orders_rm GROUP BY 1, 2)
        |SELECT o_orderpriority, day,
        |  kll_med(collect_list(sk) OVER w) AS est,
        |  sum(n) OVER w AS n_frame
        |FROM daily
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY day
        |  RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)""".stripMargin) }

    time("q97b_fvals_only") { spark.sql(
      """WITH daily AS (
        |  SELECT o_orderpriority, date_trunc('DAY', o_orderdate) AS day,
        |    collect_list(cast(cast(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS vals,
        |    count(*) AS n
        |  FROM v_orders_rm GROUP BY 1, 2)
        |SELECT o_orderpriority, day,
        |  size(filter(flatten(collect_list(vals) OVER w), x -> x <= 500000)) AS c,
        |  sum(n) OVER w AS n_frame
        |FROM daily
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY day
        |  RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)""".stripMargin) }

    time("q97b_full") {
      graft.operators.Analytics3.registry
        .find(_.name == "q97b_rolling_median_kll").get.fn(spark, dir) }
  }
}
