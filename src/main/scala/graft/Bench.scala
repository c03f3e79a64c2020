package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line with per-query wall seconds at
  * SPARK_GRAFT_SF_DIR (default sf0.1).
  *
  * Methodology:
  *   - a warmup pass (flagship aggregate + one custom-expression query)
  *     pays JVM/classloading/codegen costs before any timer starts, so
  *     the first timed query isn't billed ~10 s of session warmup;
  *   - each query is forced through the `noop` sink, which evaluates
  *     every output row and column — `.count()` would let Catalyst prune
  *     projection-only queries down to a row count.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warmup: flagship agg + custom-expression path (not timed)
    try {
      force(Queries.q1PricingSummary(spark, sfDir))
      force(SparkEntry.queries("sim_topk_bruteforce")(spark, sfDir))
    } catch { case _: Throwable => () }

    // per-lane error lists: a timing is only trustworthy in the lane
    // where the query succeeded — a failed query must not masquerade as
    // a fast one, and a lane-2-only failure must not poison lane 1
    def pass(errors: scala.collection.mutable.ListBuffer[String])
        : Map[String, Double] = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { force(fn(spark, sfDir)) } catch { case e: Throwable =>
        errors += name
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val errCold = scala.collection.mutable.ListBuffer.empty[String]
    val errWarm = scala.collection.mutable.ListBuffer.empty[String]
    // lane 1: first run after session warmup (comparable to round 1)
    val results = pass(errCold)
    // lane 2: steady state — a second run of every query. At these scale
    // factors per-query noop-job overhead dominates lane 1; the warm lane
    // is what makes round-over-round perf deltas meaningful.
    val warm = pass(errWarm)
    def fmt(m: Map[String, Double]) =
      m.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    def fmtE(e: Seq[String]) = e.map("\"" + _ + "\"").mkString("[", ",", "]")
    val errs = fmtE((errCold ++ errWarm).distinct.toSeq)
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val totalWarm = if (warm.nonEmpty) warm.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":${fmt(results)},"total_warm":$totalWarm,"queries_warm":${fmt(warm)},"errors":$errs,"errors_cold":${fmtE(errCold.toSeq)},"errors_warm":${fmtE(errWarm.toSeq)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
