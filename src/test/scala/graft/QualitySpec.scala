package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Quality

/** Independent (non-oracle) verification of the data-quality / CDC /
  * graph operators: brute-force recomputation in plain Scala where
  * feasible, cross-operator conservation laws otherwise.
  */
class QualitySpec extends AnyFunSuite with SparkTestBase {

  test("dq_profile matches direct per-column recomputation") {
    val rows = Quality.dqProfile(spark, sf0001).collect()
      .map(r => r.getString(0) -> r).toMap
    val li = Tables.lineitem(spark, sf0001)
    val n = li.count()
    rows.values.foreach(r => assert(r.getLong(1) === n))
    val flag = rows("l_returnflag")
    assert(flag.getLong(2) === 0L, "no nulls in l_returnflag")
    val distinctFlags = li.select("l_returnflag").distinct().count()
    assert(flag.getLong(3) === distinctFlags)
    assert(flag.getString(4) === li.agg(min("l_returnflag")).head.getString(0))
    val qty = rows("l_quantity")
    assert(qty.getLong(3) ===
      li.select("l_quantity").distinct().count())
  }

  test("dq_profile_approx: exact columns equal the exact twin, brackets hold") {
    val approx = Quality.dqProfileApprox(spark, sf0001).collect()
      .map(r => r.getString(0) -> r).toMap
    val exact = Quality.dqProfile(spark, sf0001).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (c, e) =>
      val a = approx(c)
      // the non-sketch columns are the exact twin's, verbatim
      assert(a.getLong(1) === e.getLong(1), s"$c n_rows")
      assert(a.getLong(2) === e.getLong(2), s"$c n_nulls")
      assert(a.getLong(3) === e.getLong(3), s"$c n_distinct")
      assert(a.getString(4) === e.getString(4), s"$c min_value")
      assert(a.getString(5) === e.getString(5), s"$c max_value")
      // the oracle replays in_bracket as literal TRUE — it must BE true
      assert(a.getBoolean(6), s"$c HLL estimate outside the 5% bracket")
    }
  }

  test("dq_checks: clean generated data passes PK/FK; counts recompute") {
    val checks = Quality.dqChecks(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(checks.size === 8)
    checks.foreach { case (name, (v, pass)) =>
      assert(pass === (v == 0L), s"$name pass flag must mirror count")
    }
    // orders PK is unique in the generated data; lineitem's
    // (l_orderkey, l_linenumber) is NOT (the generator draws line
    // numbers with replacement) — the check must report the real
    // duplicate count, recomputed here independently
    assert(checks("orders_pk_unique")._1 === 0L)
    val li = Tables.lineitem(spark, sf0001)
    val liDupes = li.count() -
      li.select("l_orderkey", "l_linenumber").distinct().count()
    assert(liDupes > 0, "fixture must actually contain PK violations")
    assert(checks("lineitem_pk_unique")._1 === liDupes)
    // FK violation counts equal an independent anti-join
    val fkOrders = Tables.orders(spark, sf0001).join(
      Tables.customer(spark, sf0001),
      col("o_custkey") === col("c_custkey"), "left_anti").count()
    assert(checks("orders_custkey_fk")._1 === fkOrders)
  }

  test("state_diff: append-only log means no removals, and labels recompute") {
    val out = Quality.stateDiff(spark, sf0001).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)),
        Option(r.getString(2)), r.getString(3)))
    // new_state is never null (T2 superset of T1) and labels are consistent
    out.foreach { case (uid, old, neu, ct) =>
      assert(neu.isDefined, s"user $uid lost state — impossible on append-only log")
      ct match {
        case "added" => assert(old.isEmpty)
        case "changed" => assert(old.isDefined && old != neu)
        case "unchanged" => assert(old.isDefined && old == neu)
        case other => fail(s"unknown change_type $other")
      }
    }
    // every user with an event before T2 appears exactly once
    val expected = Tables.events(spark, sf0001)
      .filter(col("ts") <= lit("2024-01-20 00:00:00").cast("timestamp"))
      .select("user_id").distinct().count()
    assert(out.length.toLong === expected)
    assert(out.map(_._1).distinct.length === out.length)
  }

  test("triangle_count matches brute-force recount on sf0.001") {
    val row = Quality.triangleCount(spark, sf0001).head
    val li = Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges: Set[(Long, Long)] = li.groupBy(_._1).values.flatMap { grp =>
      val ps = grp.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2))
    val adj = edges.groupBy(_._1).map { case (u, es) => u -> es.map(_._2) }
    val triangles = edges.toSeq.map { case (u, v) =>
      adj.getOrElse(v, Set.empty).count(w => edges.contains((u, w)))
    }.sum
    assert(row.getLong(0) === nodes.size.toLong, "n_nodes")
    assert(row.getLong(1) === edges.size.toLong, "n_edges")
    assert(row.getLong(2) === triangles.toLong, "n_triangles")
    assert(row.getLong(2) > 0, "fixture must actually contain triangles")
  }
}
