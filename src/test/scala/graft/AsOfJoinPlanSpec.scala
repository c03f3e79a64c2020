package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Relational, Relational3}

/** The custom LogicalPlan + injected analyzer rule (plans/AsOfJoin). */
class AsOfJoinPlanSpec extends AnyFunSuite with SparkTestBase {

  test("custom as-of operator matches the hand-written union+window query") {
    val viaCustomOp = Relational3.q49AsofCustomOp(spark, sf0001).collect()
    val handWritten = Relational.q18AsofJoin(spark, sf0001).collect()
    assert(viaCustomOp.toSeq === handWritten.toSeq)
  }

  test("the rule lowers the node to one union, one window, no join") {
    val df = Relational3.q49AsofCustomOp(spark, sf0001)
    val analyzed = df.queryExecution.analyzed.toString
    assert(!analyzed.contains("AsOfJoin"), "node survived analysis")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("Union"))
    assert(optimized.contains("Window"))
    assert(!optimized.contains("Join"), s"unexpected join:\n$optimized")
  }

  test("as-of semantics on a hand-checkable frame: <= ties, no-match null") {
    import spark.implicits._
    val probes = Seq((1L, 10L, 100L), (1L, 20L, 101L), (2L, 5L, 102L))
      .toDF("k", "t", "probe_id")
      .select(col("k"), timestamp_micros(col("t")).as("t"), col("probe_id"))
    val refs = Seq((1L, 10L), (1L, 15L), (3L, 1L))
      .toDF("k", "t")
      .select(col("k"), timestamp_micros(col("t")).as("t"))
    val out = plans.AsOf.join(probes, refs, "k", "t", "t", "matched")
      .select(col("probe_id"), unix_micros(col("matched")).as("m"))
      .orderBy(col("probe_id"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
    // probe@10 sees ref@10 (<= tie), probe@20 sees ref@15, key 2 → null
    assert(out.toSeq === Seq(100L -> 10L, 101L -> 15L, 102L -> -1L))
  }

  test("reserved __asof_ columns are rejected at the API boundary") {
    import spark.implicits._
    val clean = Seq((1L, 2L)).toDF("k", "t")
    val dirty = clean.withColumn("__asof_t", col("t"))
    val e1 = intercept[IllegalArgumentException] {
      plans.AsOf.join(dirty, clean, "k", "t", "t", "m")
    }
    assert(e1.getMessage.contains("__asof_"), "message must name the reserved prefix")
    val e2 = intercept[IllegalArgumentException] {
      plans.AsOf.join(clean, dirty, "k", "t", "t", "m")
    }
    assert(e2.getMessage.contains("__asof_t"))
    val e3 = intercept[IllegalArgumentException] {
      plans.AsOf.join(clean, clean, "k", "t", "t", "__asof_out")
    }
    assert(e3.getMessage.contains("reserved"))
    // an output name that duplicates a left column would only surface as
    // AMBIGUOUS_REFERENCE at first downstream use — reject at the boundary
    val e4 = intercept[IllegalArgumentException] {
      plans.AsOf.join(clean, clean, "k", "t", "t", "t")
    }
    assert(e4.getMessage.contains("collides"))
    val e5 = intercept[IllegalArgumentException] {
      plans.AsOf.join(clean, clean, "k", "t", "t", "T")
    }
    assert(e5.getMessage.contains("collides"))
  }
}
