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

    val mode = sys.env.getOrElse("SCRATCH_MODE", "q97")
    if (mode == "q77") { probeQ77(spark, dir, (t, f) => time(t)(f())); return }

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

  private def probeQ77(spark: SparkSession, dir: String,
      time0: (String, () => DataFrame) => Unit): Unit = {
    def time(tag: String)(df: => DataFrame): Unit = time0(tag, () => df)
    def li = graft.Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    def edges = li.as("a").join(li.as("b"), col("a.ok") === col("b.ok")
        && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("u"), col("b.pk").as("v"))
      .distinct()

    time("q77_edges")(edges)

    time("q77_edges_grouped") {
      li.groupBy(col("ok")).agg(collect_set(col("pk")).as("pks"))
        .select(explode(col("pks")).as("u"), col("pks"))
        .select(col("u"), explode(col("pks")).as("v"))
        .filter(col("u") < col("v"))
        .distinct()
    }

    time("q77_adj") {
      edges.groupBy(col("u").as("p"))
        .agg(collect_list(col("v")).as("nbrs"))
    }

    time("q77_tri") {
      val adj = edges.groupBy(col("u").as("p"))
        .agg(collect_list(col("v")).as("nbrs"))
      edges
        .join(broadcast(adj.select(col("p").as("u"), col("nbrs").as("nu"))), Seq("u"))
        .join(broadcast(adj.select(col("p").as("v"), col("nbrs").as("nv"))), Seq("v"))
        .select(size(array_intersect(col("nu"), col("nv"))).cast("long").as("c"))
        .groupBy().agg(coalesce(sum(col("c")), lit(0L)).as("n_triangles"))
    }

    time("q77_full") {
      graft.operators.Quality.registry
        .find(_.name == "q77_triangle_count").get.fn(spark, dir) }
  }
}
