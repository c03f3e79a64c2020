package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Analytics4, Sketches2}
import graft.functions.SketchUtil

/** Independent verification of the fourth analytics batch and the
  * membership/frequency sketches at sf0.001: driver-side brute-force
  * replays (dominance scan, z formula, Pearson), plus the probabilistic
  * guarantees the oracles can't express — Bloom's no-false-negatives /
  * FP-rate / OR-mergeability and count-min's one-sided error. Exact
  * value parity vs DuckDB is enforced by tools/local_verify.py on
  * q98/q99/q100/sketch_bloom_join.
  */
class Analytics4Sketches2Spec extends AnyFunSuite with SparkTestBase {

  test("skyline: quadratic dominance replay agrees") {
    val pts = Tables.part(spark, sf0001)
      .select(col("p_partkey"), col("p_size"),
        col("p_retailprice").cast(DecimalType(12, 2)).*(100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val expect = pts.filter { case (_, s, v) =>
      !pts.exists { case (_, qs, qv) =>
        qs >= s && qv <= v && (qs > s || qv < v)
      }
    }.map(_._1).toSet
    val got = Analytics4.skyline(spark, sf0001).collect()
      .map(_.getLong(0)).toSet
    assert(got === expect)
    assert(got.nonEmpty)
  }

  test("ab_test: driver-side z formula replay agrees") {
    val rows = Analytics4.abTest(spark, sf0001).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (na, ca, nb, cb) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val (pa, pb) = (ca.toDouble / na, cb.toDouble / nb)
      val p = (ca + cb).toDouble / (na + nb)
      val se = math.sqrt(p * (1 - p) * (1.0 / na + 1.0 / nb))
      val z = if (se > 0) (pa - pb) / se else 0.0
      assert(r.getDouble(5) === math.floor(z * 10000 + 0.5) / 10000)
      // arms partition the type's events: conversions can't exceed trials
      assert(ca <= na && cb <= nb)
    }
  }

  test("autocorr: driver-side Pearson on the collected series agrees") {
    val daily = Tables.orders(spark, sf0001)
      .groupBy(col("o_orderpriority"),
        date_trunc("DAY", col("o_orderdate")).as("day"))
      .agg(sum(col("o_totalprice").cast(DecimalType(12, 2)).*(100)
        .cast("long")).as("c"))
      .orderBy(col("o_orderpriority"), col("day"))
      .collect().map(r => (r.getString(0), r.getLong(2)))

    def pearson(xy: Seq[(Long, Long)]): Double = {
      val n = xy.length.toDouble
      val (mx, my) = (xy.map(_._1).sum / n, xy.map(_._2).sum / n)
      val cov = xy.map { case (x, y) => (x - mx) * (y - my) }.sum
      val (vx, vy) = (xy.map(p => math.pow(p._1 - mx, 2)).sum,
        xy.map(p => math.pow(p._2 - my, 2)).sum)
      cov / math.sqrt(vx * vy)
    }
    val got = Analytics4.autocorr(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    daily.groupBy(_._1).foreach { case (prio, rows) =>
      val series = rows.map(_._2).toSeq
      val (n, ac1) = got(prio)
      assert(n == series.length)
      val expect = pearson(series.drop(1).zip(series.dropRight(1)))
      // r4 both sides; allow the last-bit drift r4 exists to absorb
      assert(math.abs(ac1 - expect) < 2e-4, s"$prio ac1=$ac1 vs $expect")
    }
  }

  test("bloom: no false negatives, FP rate bounded, merge is OR") {
    val keys = Tables.orders(spark, sf0001)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey")).collect().map(_.getLong(0))
    val whole = new Array[Long](SketchUtil.BloomWords)
    keys.foreach(SketchUtil.bloomAdd(whole, _))
    // membership: every inserted key answers true
    assert(keys.forall(SketchUtil.bloomMightContain(whole, _)))
    // false positives: probe keys far outside the build key space
    val fp = (1L to 10000L).map(_ + 1000000000L)
      .count(SketchUtil.bloomMightContain(whole, _))
    assert(fp < 10, s"fp=$fp of 10000") // expected ~0 at 35+ bits/key
    // mergeability: OR of half-sketches == whole sketch
    val (h1, h2) = keys.splitAt(keys.length / 2)
    val (a, b) = (new Array[Long](SketchUtil.BloomWords),
      new Array[Long](SketchUtil.BloomWords))
    h1.foreach(SketchUtil.bloomAdd(a, _))
    h2.foreach(SketchUtil.bloomAdd(b, _))
    val merged = a.zip(b).map { case (x, y) => x | y }
    assert(merged.toSeq === whole.toSeq)
  }

  test("bloom join: the prefilter passes every true match (subset check)") {
    val plain = Tables.lineitem(spark, sf0001)
      .join(Tables.orders(spark, sf0001)
        .filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = Sketches2.bloomJoin(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === plain)
  }

  test("countmin: estimates one-sided, bounded, and partition-independent") {
    val events = Tables.events(spark, sf0001)
    val exact = events.groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    def sketchOf(parts: Int): Array[Long] =
      events.select(col("user_id")).repartition(parts)
        .as[Long](Encoders.scalaLong)
        .select(new Sketches2.CountMinAgg().toColumn).head()
    val sk = sketchOf(4)
    exact.foreach { case (u, c) =>
      val est = SketchUtil.cmEstimate(sk, u)
      assert(est >= c, s"user $u: est $est < exact $c")
      // CM bound: err ≤ e/Width · N w.p. 1−e^−Depth; deterministic data,
      // assert the bound itself (generous: the observed err here is 0)
      assert(est - c <= math.E / SketchUtil.CmWidth * n + 1)
    }
    // merge-order / partitioning independence: integer sums commute
    assert(sketchOf(7).toSeq === sk.toSeq)

    // the registered bracket shape must agree with the raw-value bounds
    val rows = Sketches2.countMin(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getBoolean(2),
      s"user ${r.getLong(0)}: within_bounds false"))
  }
}
