package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Analytics3, Similarity}

/** Independent verification of the third analytics batch and the batch
  * retrieval query at sf0.001: driver-side brute-force recomputes
  * (gap-fill, MAD) and cross-query agreement (batch top-k vs the
  * single-needle brute force). Exact value parity vs DuckDB is enforced
  * by tools/local_verify.py on q95/q96/sim_topk_batch.
  */
class Analytics3Spec extends AnyFunSuite with SparkTestBase {

  test("gapfill: fills exactly the missing months, linearly, inside the horizon") {
    val monthly = Tables.orders(spark, sf0001)
      .groupBy(col("o_custkey"),
        ((year(col("o_orderdate")) - 1995) * 12 + month(col("o_orderdate"))
          - 1).cast("long").as("m"))
      .agg(sum(col("o_totalprice").cast(DecimalType(12, 2)).*(100)
        .cast("long")).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

    val got = Analytics3.gapfillInterp(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.nonEmpty)

    // brute-force replay: per customer, walk consecutive active months
    val expect = scala.collection.mutable.Map.empty[(Long, Long), Long]
    monthly.keys.groupBy(_._1).foreach { case (cust, ks) =>
      val ms = ks.map(_._2).toSeq.sorted
      ms.zip(ms.drop(1)).foreach { case (m, nm) =>
        val gap = nm - m
        if (gap >= 2 && gap <= Analytics3.GapH) {
          val (c, nc) = (monthly((cust, m)), monthly((cust, nm)))
          (1L until gap).foreach { d =>
            expect((cust, m + d)) =
              c + math.floor((nc - c) * d.toDouble / gap).toLong
          }
        }
      }
    }
    assert(got === expect.toMap)
    // imputed months never collide with actual observations
    assert(got.keys.forall(k => !monthly.contains(k)))
  }

  test("mad outliers: brute-force median/MAD replay agrees") {
    val vals = Tables.events(spark, sf0001)
      .select(col("event_type"),
        col("value").cast(DecimalType(12, 2)).*(100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))

    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    val expect = vals.groupBy(_._1).map { case (t, rows) =>
      val cents = rows.map(_._2.toDouble).toSeq
      val med = median(cents)
      val devs = cents.map(c => math.abs(c - med))
      val mad = median(devs)
      val out = devs.filter(_ > 3 * mad)
      t -> (med, mad, out.length.toLong,
        if (out.isEmpty) 0.0 else out.max)
    }

    val got = Analytics3.madOutliers(spark, sf0001).collect()
      .map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getLong(3), r.getDouble(4)))
      .toMap
    assert(got === expect)
    // the robust rule actually fires on this data
    assert(got.values.exists(_._3 > 0))
  }

  test("rolling median: brute-force 30-day replay agrees") {
    val rows = Tables.orders(spark, sf0001)
      // orders dates read as TIMESTAMP_NTZ; session TZ is UTC, so the
      // cast pins the same instant the query's date_format renders
      .select(col("o_orderpriority"),
        unix_millis(col("o_orderdate").cast("timestamp")),
        col("o_totalprice").cast(DecimalType(12, 2)).*(100).cast("long"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

    def median(xs: Seq[Long]): Double = {
      val s = xs.sorted
      val n = s.length
      if (n % 2 == 1) s(n / 2).toDouble else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    val dayMs = 86400000L
    val expect = rows.groupBy(_._1).toSeq.flatMap { case (prio, rs) =>
      rs.map(_._2).distinct.toSeq.map { t =>
        val frame = rs.filter(r => r._2 <= t && r._2 >= t - 30 * dayMs)
        (prio, java.time.Instant.ofEpochMilli(t)
          .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString,
          median(frame.map(_._3).toSeq))
      }
    }.toSet

    val got = Analytics3.rollingMedian(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(got === expect)
  }

  test("batch top-k agrees with the single-needle brute force per needle") {
    val got = Similarity.simTopkBatch(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got.map(_._1).distinct.length === Similarity.BatchQ)
    // rank 1 of every needle is the needle itself at sim 1.0
    got.filter(_._2 == 1).foreach { case (qid, _, id, sim) =>
      assert(id === qid.toLong && sim === 1.0)
    }
    // needle 0's five rows equal the registered brute-force head
    val brute = Similarity.simTopkBruteforce(spark, sf0001).collect()
      .take(5).map(r => (r.getLong(0), r.getDouble(1)))
    val batch0 = got.filter(_._1 == 0).sortBy(_._2)
      .map(t => (t._3, t._4)).toSeq
    assert(batch0 === brute.toSeq)
  }
}
