package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Prints the EXECUTED-plan audit for representative queries: scan
  * pushdown, join strategies, aggregation phases, codegen coverage.
  *
  * Each query is executed through its own QueryExecution
  * (`executedPlan.executeCollect()`), so the audited string is the
  * FINAL adaptive plan — after AQE re-planning, exchange reuse, and
  * codegen — not the pre-execution guess (round-2 audits printed
  * initial plans, which double-counted shared window subtrees and
  * showed wholeStage=0). The `== Initial Plan ==` section AQE appends
  * is stripped before counting.
  *
  * Run: sbt "runMain graft.tools.PlanAudit [sfDir] [--full]"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.filterNot(_.startsWith("--")).headOption
      .getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
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
      "q56_recursive_cte", "q57_width_bucket", "q64_topk_custom_op",
      "dedup_substring", "pipeline_shuffle", "pipeline_mixture",
      "pipeline_dedup_incremental", "text_entropy", "q66_regr_aggs",
      "q68_listagg")

    interesting.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val qe = df.queryExecution
      // execute through THIS QueryExecution so AQE finalizes in place;
      // df.write would build a separate QueryExecution and leave this
      // one at its initial plan
      qe.executedPlan.executeCollect()
      val isFinal = qe.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.isFinalPlan
        case _ => true // non-adaptive plans are what they are
      }
      val plan = qe.executedPlan.toString.split("== Initial Plan ==")(0)
      def count(s: String) = s.r.findAllIn(plan).length
      // codegen spans print as "*(n)" operator prefixes in toString
      // (the literal WholeStageCodegen node only appears in formatted
      // explain); distinct span ids = number of fused pipelines
      val codegenSpans = """\*\((\d+)\)""".r.findAllMatchIn(plan)
        .map(_.group(1)).toSet.size
      println(s"== $name")
      println(s"   final=$isFinal scans=${count("Scan parquet")} " +
        s"pushedFilters=${plan.contains("PushedFilters: [") && !plan.contains("PushedFilters: []")} " +
        s"bhj=${count("BroadcastHashJoin")} smj=${count("SortMergeJoin")} " +
        s"bnlj=${count("BroadcastNestedLoopJoin")} cart=${count("CartesianProduct")} " +
        s"shuffles=${count("(?<!Reused)Exchange")} reused=${count("ReusedExchange")} " +
        s"aqeRead=${count("AQEShuffleRead")} wholeStage=$codegenSpans " +
        s"takeOrdered=${count("TakeOrderedAndProject")} " +
        s"wgl=${count("WindowGroupLimit")}")
      if (args.contains("--full")) println(plan)
    }
    spark.stop()
  }
}
