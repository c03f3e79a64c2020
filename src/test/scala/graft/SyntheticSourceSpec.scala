package graft

import org.apache.spark.sql.execution.FilterExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SyntheticEvents

/** The DataSourceV2 connector contract: split planning, filter pushdown
  * absorbed into the generation range, column pruning, statistics.
  */
class SyntheticSourceSpec extends AnyFunSuite with SparkTestBase {

  private val Types = Array("view", "click", "purchase", "signup", "error")

  private def src = spark.read.format("graft-events")
    .option("rows", "100000").option("splits", "8").load()

  private def scanDesc(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.collectLeaves().mkString("\n")

  test("full scan: row count, split count, deterministic formula") {
    assert(src.count() === 100000L)
    assert(src.rdd.getNumPartitions === 8)
    val r1 = src.filter(col("id") === 1).collect().head
    val mix = 2654435761L % 4294967296L
    assert(r1.getLong(1) === mix % 997L)
    assert(r1.getString(2) === Types((mix % 5L).toInt))
    assert(r1.getLong(3) === (1103515245L + 12345L) % 100000L)
  }

  test("id-range filters are absorbed: narrowed scan, no FilterExec") {
    val df = src.filter(col("id") >= 25000 && col("id") < 75000)
    assert(scanDesc(df).contains("lo=25000,hi=74999"), scanDesc(df))
    val filters = df.queryExecution.executedPlan.collect {
      case f: FilterExec => f
    }
    assert(filters.isEmpty, "range filter was re-evaluated post-scan")
    assert(df.count() === 50000L)
  }

  test("non-id filters stay post-scan; range still narrowed") {
    val df = src.filter(col("id") <= 10 && col("event_type") === "view")
    assert(scanDesc(df).contains("hi=10"))
    val filters = df.queryExecution.executedPlan.collect {
      case f: FilterExec => f
    }
    assert(filters.nonEmpty, "event_type filter must remain")
  }

  test("column pruning reaches the reader") {
    val df = src.select(col("event_type")).distinct()
    val desc = scanDesc(df)
    assert(desc.contains("cols=event_type"), desc)
    assert(!desc.contains("user_id"))
  }

  test("empty range plans zero partitions") {
    val df = src.filter(col("id") > 100000)
    assert(df.count() === 0L)
    assert(df.rdd.getNumPartitions === 0)
  }

  test("statistics reach Catalyst (numRows visible to the optimizer)") {
    val stats = src.queryExecution.optimizedPlan.stats
    assert(stats.sizeInBytes === BigInt(100000L * 40))
  }

  test("registered query agrees with a driver-side replay of the formula") {
    val expected = (25000L to 74999L).map { id =>
      val mix = (id * 2654435761L) % 4294967296L
      (Types((mix % 5).toInt),
        (id * 1103515245L + 12345L) % 100000L, mix % 997L)
    }
    val byType = expected.groupBy(_._1)
    val got = SyntheticEvents.customSourceAgg(spark, sf0001).collect()
    assert(got.map(_.getString(0)).toSeq === byType.keys.toSeq.sorted)
    got.foreach { r =>
      val g = byType(r.getString(0))
      assert(r.getLong(1) === g.length.toLong)
      assert(r.getLong(2) === g.map(_._2).sum)
      assert(r.getLong(3) === g.map(_._3).distinct.length.toLong)
    }
  }

  test("reader options are case-insensitive; bad splits fail loudly") {
    val n = spark.read.format("graft-events")
      .option("ROWS", "500").option("SPLITS", "2").load().count()
    assert(n === 500L, "upper-cased options must not fall back to defaults")
    val err = intercept[IllegalArgumentException] {
      spark.read.format("graft-events")
        .option("rows", "100").option("splits", "0").load().count()
    }
    assert(err.getMessage.contains("splits"),
      "splits=0 must error, not plan an empty table")
  }

  test("generator kernels are overflow-safe at huge ids") {
    import graft.sources.SyntheticEvents.generators
    // past the id where id * 2654435761 wraps int64 — mix must stay a
    // true mod-2^32 remainder (non-negative, < 2^32), event_type a
    // valid index, value_cents in [0, 100000)
    val hugeIds = Seq(3474169948L, 4294967296L, 8400000000L, Long.MaxValue)
    hugeIds.foreach { id =>
      val uid = generators("user_id")(id).asInstanceOf[Long]
      assert(uid >= 0 && uid < 997, s"user_id out of range for id=$id")
      val et = generators("event_type")(id)
      assert(et != null, s"event_type must index validly for id=$id")
      val vc = generators("value_cents")(id).asInstanceOf[Long]
      assert(vc >= 0 && vc < 100000, s"value_cents out of range for id=$id")
    }
    // exact-math check at the first wrap point: BigInt replay agrees
    hugeIds.foreach { id =>
      val expect = ((BigInt(id) * BigInt(2654435761L)) mod BigInt(4294967296L)).toLong
      val uid = generators("user_id")(id).asInstanceOf[Long]
      assert(uid === expect % 997, s"mix diverged from exact math at id=$id")
    }
  }
}
