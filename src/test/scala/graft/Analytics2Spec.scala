package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Analytics2

/** Independent verification of the second analytics batch at sf0.001:
  * driver-side brute-force recomputes (attribution, TWAP, skew profile)
  * and BFS invariants (k-hop). Exact value parity vs DuckDB is enforced
  * by tools/local_verify.py on q84–q87.
  */
class Analytics2Spec extends AnyFunSuite with SparkTestBase {

  test("attribution: brute-force per-user replay agrees") {
    val got = Analytics2.attribution(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        col("value").cast(org.apache.spark.sql.types.DecimalType(12, 2))
          .*(100).cast("long").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime * 1000 +
        r.getTimestamp(1).getNanos / 1000 % 1000,
        r.getLong(2), r.getString(3), r.getLong(4)))

    val expect = scala.collection.mutable.Map.empty[String, (Long, Long)]
    ev.groupBy(_._1).values.foreach { rows =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      var lastTouch: String = null
      sorted.foreach { case (_, _, _, typ, cents) =>
        if (typ == "purchase") {
          val k = Option(lastTouch).getOrElse("none")
          val (n, c) = expect.getOrElse(k, (0L, 0L))
          expect(k) = (n + 1, c + cents)
        } else lastTouch = typ
      }
    }
    assert(got === expect.toMap)
  }

  test("khop: hop labels are a partition and BFS minimality holds") {
    val out = Analytics2.kHopReach(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out.nonEmpty)

    // recompute the undirected co-purchase edge set driver-side
    val li = Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = scala.collection.mutable.Map
      .empty[Long, scala.collection.mutable.Set[Long]]
    li.groupBy(_._1).values.foreach { rows =>
      val parts = rows.map(_._2).distinct
      for (a <- parts; b <- parts if a != b)
        adj.getOrElseUpdate(a, scala.collection.mutable.Set.empty) += b
    }
    val seeds = adj.keySet.filter(_ % 97 == 0)
    assert(seeds.nonEmpty, "fixture must contain seed nodes")
    var frontier = Set.empty[Long] ++ seeds
    var visited = Set.empty[Long] ++ seeds
    val expect = scala.collection.mutable.Map.empty[Long, Int]
    seeds.foreach(expect(_) = 0)
    for (h <- 1 to 3) {
      frontier = frontier.flatMap(n => adj.getOrElse(n, Set.empty)) -- visited
      frontier.foreach(expect(_) = h)
      visited ++= frontier
    }
    assert(out === expect.toMap)
  }

  test("skew_profile: top-10 counts, share, and ratio recompute") {
    val rows = Analytics2.skewProfile(spark, sf0001).collect()
    assert(rows.length === 10)
    val counts = Tables.lineitem(spark, sf0001)
      .select("l_partkey").collect().map(_.getLong(0))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val total = counts.values.sum
    val nKeys = counts.size.toLong
    val top = counts.toSeq.sortBy { case (k, c) => (-c, k) }.take(10)
    rows.zip(top).foreach { case (r, (k, c)) =>
      assert(r.getLong(0) === k)
      assert(r.getLong(1) === c)
      assert(r.getLong(2) === nKeys)
      assert(r.getLong(3) === counts.values.max)
      assert(r.getDouble(4) === c.toDouble / total.toDouble)
      assert(r.getDouble(5) === (c * nKeys).toDouble / total.toDouble)
    }
  }

  test("twap: per-supplier day weighting recomputes exactly") {
    val got = Analytics2.twapRevenue(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

    val daily = Tables.lineitem(spark, sf0001)
      .groupBy(col("l_suppkey"), to_date(col("l_shipdate")).as("d"))
      .agg(sum(Tables.money(col("l_extendedprice"))).as("v"))
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getDecimal(2)))

    daily.groupBy(_._1).foreach { case (supp, rows) =>
      val sorted = rows.sortBy(_._2.toEpochDay)
      var num = java.math.BigDecimal.ZERO
      var den = 0L
      sorted.zipWithIndex.foreach { case ((_, d, v), i) =>
        val wt = if (i + 1 < sorted.length)
          sorted(i + 1)._2.toEpochDay - d.toEpochDay else 1L
        num = num.add(v.multiply(java.math.BigDecimal.valueOf(wt)))
        den += wt
      }
      val (nDays, twap) = got(supp)
      assert(nDays === sorted.length.toLong)
      assert(twap === num.doubleValue() / den.toDouble,
        s"supplier $supp twap mismatch")
    }
  }
}
