package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints the executed-plan audit for representative queries: scan
  * pushdown, join strategies, aggregation phases, codegen coverage.
  * Run: sbt "runMain graft.tools.PlanAudit [sfDir]"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val interesting = Seq(
      "q1_agg", "q2_filter_project", "q3_star_join", "q6_topk_per_group",
      "q17_range_join", "q21_global_topk", "wordcount_documents",
      "sim_topk_bruteforce", "dedup_minhash_lsh", "q39_subqueries",
      "q29_percentiles", "q25_outer_join", "q23_salted_agg",
      "sim_ann_ivf", "mm_scene_cuts",
      "q44_supplier_revenue", "q46_range_frame", "q47_salted_join",
      "pipeline_contamination", "pipeline_pack_sequences",
      "pipeline_redact", "text_repetition",
      "emb_quantize", "dedup_survivors", "q55_lateral_topk",
      "q56_recursive_cte", "q57_width_bucket")

    interesting.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      def count(s: String) = s.r.findAllIn(plan).length
      println(s"== $name")
      println(s"   scans=${count("Scan parquet")} " +
        s"pushedFilters=${plan.contains("PushedFilters: [") && !plan.contains("PushedFilters: []")} " +
        s"bhj=${count("BroadcastHashJoin")} smj=${count("SortMergeJoin")} " +
        s"bnlj=${count("BroadcastNestedLoopJoin")} cart=${count("CartesianProduct")} " +
        s"shuffles=${count("Exchange")} wholeStage=${count("WholeStageCodegen")} " +
        s"takeOrdered=${count("TakeOrderedAndProject")}")
      if (args.contains("--full")) println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    }
    spark.stop()
  }
}
