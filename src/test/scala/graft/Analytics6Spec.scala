package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Analytics6

/** Invariant specs for the sixth analytics batch (beyond the DuckDB hash
  * oracle): conservation laws for the k-anonymity ladder, an exhaustive
  * brute-force twin for the cell-blocked radius join, merge-equals-
  * recompute for the materialized view, and the floor-share law for the
  * seasonality profile.
  */
class Analytics6Spec extends AnyFunSuite with SparkTestBase {

  test("q112: ladder levels are complete and monotone in risk mass") {
    val rows = Analytics6.kAnonymity(spark, sf0001).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows.keySet === Set(0, 1, 2, 3))
    val nCustomers = Tables.customer(spark, sf0001).count()
    // level 3 is the grand total: exactly one group holding every row
    assert(rows(3)._1 === 1L)
    // generalizing can only shrink the group count
    assert(rows(0)._1 >= rows(1)._1 && rows(1)._1 >= rows(2)._1 &&
      rows(2)._1 >= rows(3)._1)
    rows.foreach { case (_, (groups, risky, riskyRows)) =>
      assert(risky <= groups)
      assert(riskyRows <= nCustomers)
      // risky groups have < K members each
      assert(riskyRows < risky * 5 || (risky === 0L && riskyRows === 0L))
    }
  }

  test("q113: cell blocking finds EXACTLY the brute-force all-pairs set") {
    // sf0.01: the sf0.001 key lattice is too sparse for any in-radius
    // pair (min lattice distance > the 800-unit radius); 1500 points
    // give ~400 pairs and the O(N²) brute twin is still trivial here
    val blocked = Analytics6.geoCellJoin(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val pts = Tables.customer(spark, sf001).select("c_custkey").collect()
      .map(_.getLong(0))
      .map { k => val (x, y) = Analytics6.geoCoords(k); (k, x, y) }
    val brute = (for {
      (ia, xa, ya) <- pts; (ib, xb, yb) <- pts
      if ia < ib
      d2 = (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)
      if d2 <= Analytics6.Radius2
    } yield (ia, ib, d2)).toSet
    assert(blocked === brute)
    assert(brute.nonEmpty, "fixture regression: no in-radius pairs at sf0.01")
    // the 3×3 neighborhood sweep is sufficient ONLY while the radius
    // fits inside one cell — pin the constants' relationship so a
    // future radius bump cannot silently drop cross-cell pairs
    assert(Analytics6.Radius2 <=
      Analytics6.CellSize.toLong * Analytics6.CellSize,
      "radius exceeds cell size: 3×3 cell blocking would miss pairs")
  }

  test("q114: merged partials equal the direct recompute, avg derived post-merge") {
    val out = Analytics6.viewMaintenance(spark, sf0001).collect()
    val direct = Tables.orders(spark, sf0001)
      .groupBy(col("o_orderpriority").as("priority"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("o_totalprice").cast("decimal(12,2)").*(100).cast("long")).as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.length === direct.size)
    out.foreach { r =>
      val (cnt, s) = direct(r.getString(0))
      assert(r.getLong(1) === cnt)
      assert(r.getLong(2) === s)
      assert(r.getLong(3) === s / cnt) // derived AFTER the merge
    }
  }

  test("q116: snapshot is one row per user, inside both horizons, argmax by (ts, id)") {
    val out = Analytics6.pointInTime(spark, sf0001).collect()
    assert(out.map(_.getLong(0)).distinct.length === out.length)
    val maxId = Tables.events(spark, sf0001)
      .agg(max(col("event_id"))).head().getLong(0)
    val txHorizon = maxId * 3 / 4
    val vt = java.sql.Timestamp.valueOf("2024-01-20 00:00:00")
    // brute-force the winner per user from the raw events
    // compare at MICROsecond precision — Timestamp.getTime truncates to
    // millis and would mis-pick winners on sub-millisecond ties
    val known = Tables.events(spark, sf0001)
      .filter(col("event_id") <= txHorizon && col("ts") <= lit(vt))
      .select(col("user_id"), unix_micros(col("ts")), col("event_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expect = known.groupBy(_._1).map { case (u, rs) =>
      u -> rs.maxBy(r => (r._2, r._3))._3
    }
    assert(out.length === expect.size)
    out.foreach(r => assert(r.getLong(1) === expect(r.getLong(0)),
      s"user ${r.getLong(0)} picked the wrong version"))
  }

  test("q117: bounded sum is within the sensitivity budget per user") {
    val out = Analytics6.dpContribution(spark, sf0001).collect()
    assert(out.nonEmpty)
    val nUsersTotal = Tables.events(spark, sf0001)
      .select(countDistinct(col("user_id"))).head().getLong(0)
    // each user contributes <= 3 rows of <= 5000 cents ACROSS ALL TYPES
    assert(out.map(_.getLong(2)).sum <= nUsersTotal * 3)
    assert(out.map(_.getLong(3)).sum <= nUsersTotal * 3 * 5000)
    out.foreach { r =>
      assert(r.getLong(1) <= r.getLong(2)) // n_users <= n_rows
      assert(r.getLong(3) <= r.getLong(2) * 5000)
      assert(r.getLong(3) >= 0)
    }
  }

  test("q115: per-type floor-shares sum to just under one week's 70000 bps") {
    val rows = Analytics6.seasonality(spark, sf0001).collect()
    val byType = rows.groupBy(_.getString(0))
    assert(byType.nonEmpty)
    byType.foreach { case (_, rs) =>
      assert(rs.map(_.getInt(1)).toSet.subsetOf((0 to 6).toSet))
      val total = rs.map(_.getLong(2)).sum
      // idx_bps = floor(cnt*70000/total): the floors sum into
      // (70000 - ndays, 70000]
      val bpsSum = rs.map(_.getLong(3)).sum
      assert(bpsSum <= 70000L && bpsSum > 70000L - rs.length)
      // and each share replays exactly
      rs.foreach(r => assert(r.getLong(3) === r.getLong(2) * 70000L / total))
    }
  }
}
