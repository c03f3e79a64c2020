package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime scale behaviors that only show up in executed plans: dynamic
  * partition pruning and AQE skew-join splitting. These are the
  * mechanisms that keep the 100 TB versions of our joins from reading
  * dead partitions or stalling on one hot shuffle partition — worth
  * pinning so a config or plan regression is caught here, not on a
  * cluster.
  */
class ScaleBehaviorSpec extends AnyFunSuite with SparkTestBase {

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("dynamic partition pruning: selective dim filter prunes fact partitions") {
    val base = java.nio.file.Files.createTempDirectory("dpp").toString
    try {
      Tables.events(spark, sf0001)
        .write.partitionBy("event_type").parquet(s"$base/fact")
      // a dim with a selective predicate on the partition-key domain
      val dim = Tables.events(spark, sf0001)
        .select(col("event_type")).distinct()
        .withColumn("category", upper(col("event_type")))
      dim.write.parquet(s"$base/dim")
      withConf(
        "spark.sql.optimizer.dynamicPartitionPruning.useStats" -> "false",
        // force DPP to consider the filter worthwhile regardless of size
        "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio" -> "10.0") {
        val fact = spark.read.parquet(s"$base/fact")
        // the predicate must be a comparison — Catalyst's
        // "likely selective" check ignores bare boolean columns
        val dimF = spark.read.parquet(s"$base/dim")
          .filter(col("category") === "PURCHASE")
        val joined = fact.join(dimF, Seq("event_type"))
          .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        val rows = joined.collect()
        assert(rows.length === 1 && rows.head.getString(0) === "purchase")
        val plan = joined.queryExecution.executedPlan.toString
        assert(plan.contains("dynamicpruning"), s"no DPP in plan:\n$plan")
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    }
  }

  test("AQE splits a skewed shuffle partition (skew=true in final SMJ)") {
    import spark.implicits._
    // 95% of rows share one key — the classic straggler shape
    val big = (0 until 60000).map { i =>
      (if (i % 20 == 0) i.toLong % 97 else 7L, s"payload_$i" * 8)
    }.toDF("k", "payload")
    val other = (0 until 60000).map { i => (i.toLong % 97, i) }.toDF("k", "v")
    withConf(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      // without this AQE declines the split: the downstream groupBy(k)
      // would lose the join's hash partitioning and need a new shuffle
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      // keep the payload column through the join: shuffle sizes are
      // COMPRESSED, and a pruned-to-one-repeated-long partition would
      // compress under any realistic skew threshold
      val joined = big.hint("merge").join(other, Seq("k"))
        .agg(sum(length(col("payload"))).as("bytes"), count(lit(1)).as("n"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"no skew split in plan:\n$plan")
    }
  }
}
