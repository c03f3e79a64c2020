package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Analytics5

/** Invariant specs for the fifth analytics batch (beyond the DuckDB
  * hash oracle): blocking/threshold laws for the fuzzy join, source
  * and bound laws for SSSP, the edge-consistency law for components,
  * and exact credit conservation for multi-touch attribution.
  */
class Analytics5Spec extends AnyFunSuite with SparkTestBase {

  test("q107: pairs are intra-block, ordered, above threshold") {
    val rows = Analytics5.fuzzyJoin(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      assert(a < b)
      assert(a.split(" ").head === b.split(" ").head) // same block
      assert(r.getLong(2) >= 8000L) // floor(jw*1e4) with jw >= 0.8
      assert(r.getLong(2) <= 10000L)
    }
  }

  test("q108: seed at distance 0, all distances within the hop bound") {
    val rows = Analytics5.shortestPath(spark, sf0001).collect()
    val seed = rows.map(_.getLong(0)).min
    val byNode = rows.map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(byNode(seed) === 0)
    // 3 hops at max edge cost 4
    assert(rows.forall(r => r.getInt(1) >= 0 && r.getInt(1) <= 12))
  }

  test("q109: both endpoints of every thresholded edge share a component") {
    val comp = Analytics5.components(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // recompute the thresholded edge set independently
    val li = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val edges = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.ok").as("ok"), col("a.pk").as("u"), col("b.pk").as("v"))
      .distinct()
      .groupBy("u", "v").agg(count(lit(1)).as("n"))
      .filter(col("n") >= 3)
      .select("u", "v").collect()
    assert(edges.nonEmpty)
    edges.foreach { e =>
      assert(comp(e.getLong(0)) === comp(e.getLong(1)), s"edge $e split")
    }
    // labels are component minima: label <= node, and every label is a node
    comp.foreach { case (n, c) => assert(c <= n && comp(c) === c) }
  }

  test("q110: credit conserves total purchase cents exactly (x10000)") {
    val out = Analytics5.multiTouch(spark, sf0001).collect()
    val totalCredit = out.map(_.getLong(2)).sum
    val purchaseCents = Tables.events(spark, sf0001)
      .filter(col("event_type") === "purchase")
      .select(sum(col("value").cast("decimal(12,2)").*(100).cast("long")))
      .head().getLong(0)
    assert(totalCredit === purchaseCents * 10000L)
  }

  test("q111: clusters partition the name space, mass conserved") {
    val rows = graft.operators.Analytics5.entityResolution(spark, sf0001)
      .collect()
    val nNames = Tables.part(spark, sf0001).select("p_name").distinct().count()
    val nParts = Tables.part(spark, sf0001).count()
    assert(rows.map(_.getLong(1)).sum === nNames) // every name in one cluster
    assert(rows.map(_.getLong(2)).sum === nParts) // occurrence mass conserved
    assert(rows.length < nNames)                  // some genuine merging happened
  }
}
