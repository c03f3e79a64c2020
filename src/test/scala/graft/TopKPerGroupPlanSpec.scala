package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational3

/** The custom TopKPerGroup LogicalPlan + injected analyzer rule
  * (plans/TopKPerGroup): lowering, WindowGroupLimit physical pushdown,
  * semantics, and API-boundary validation.
  */
class TopKPerGroupPlanSpec extends AnyFunSuite with SparkTestBase {

  test("the rule lowers the node and WindowGroupLimit fires in the physical plan") {
    val df = Relational3.q64TopkCustomOp(spark, sf0001)
    assert(!df.queryExecution.analyzed.toString.contains("TopKPerGroup"),
      "node survived analysis")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("Window"))
    // the whole point of the blessed lowering shape: the physical plan
    // must carry the per-map-task group limit, so the window shuffle
    // moves O(k × groups) rows, not the full table
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("WindowGroupLimit"),
      s"WindowGroupLimit missing:\n$physical")
  }

  test("custom top-k matches a hand-written window query") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val hand = Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .orderBy(col("o_orderpriority"), col("rn"))
      .collect()
    val viaNode = Relational3.q64TopkCustomOp(spark, sf0001).collect()
    assert(viaNode.toSeq === hand.toSeq)
    // exactly k rows per group, ranks 1..k, descending order values
    viaNode.groupBy(_.getString(1)).foreach { case (_, rows) =>
      assert(rows.length <= 3)
      assert(rows.map(_.getInt(3)).toSeq === (1 to rows.length))
      val prices = rows.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
    }
  }

  test("API boundary: bad k, empty partitions, rank-name collision rejected") {
    import spark.implicits._
    val df = Seq((1L, "a", 2.0)).toDF("id", "g", "x")
    val e1 = intercept[IllegalArgumentException](
      plans.TopK.perGroup(df, Seq("g"), "x", 0))
    assert(e1.getMessage.contains("positive"))
    val e2 = intercept[IllegalArgumentException](
      plans.TopK.perGroup(df, Seq.empty, "x", 3))
    assert(e2.getMessage.contains("non-empty"))
    val e3 = intercept[IllegalArgumentException](
      plans.TopK.perGroup(df, Seq("g"), "x", 3, rankName = "id"))
    assert(e3.getMessage.contains("already exists"))
    // withColumn resolves case-insensitively by default: a case-differing
    // clash would silently overwrite the user's column, so it must be
    // rejected the same way the resolver would match it
    val e4 = intercept[IllegalArgumentException](
      plans.TopK.perGroup(df, Seq("g"), "x", 3, rankName = "ID"))
    assert(e4.getMessage.contains("already exists"))
  }
}
