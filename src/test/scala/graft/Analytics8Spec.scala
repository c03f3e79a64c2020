package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Analytics8

/** Invariant specs for the round-9 model-evaluation batch, beyond the
  * DuckDB hash oracles: the histogram-form AUC must equal the naive
  * per-row average-rank computation, calibration must conserve users
  * and weight, and the Kaplan-Meier curve must be a valid monotone
  * survival function that matches the naive per-step product.
  */
class Analytics8Spec extends AnyFunSuite with SparkTestBase {

  test("auc: histogram rank-sum == naive per-row average-rank AUC") {
    for (dir <- Seq(sf0001, sf001)) {
      val row = Analytics8.aucRoc(spark, dir).collect().head
      val (p, n, auc) = (row.getLong(0), row.getLong(1), row.getLong(2))
      // gini divides at full precision rather than doubling the rounded
      // auc, so truncation can leave it one bp above 2*auc-10000
      val giniGap = row.getLong(3) - (2 * auc - 10000)
      assert(giniGap === 0 || giniGap === 1, s"gini drift dir=$dir")
      assert(auc >= 0 && auc <= 10000)
      // naive: average rank per row via rank/count windows, exact in
      // doubled-integer arithmetic (2*avg_rank = 2*rank_min + cnt - 1)
      val scored = Tables.events(spark, dir)
        .groupBy(col("user_id"))
        .agg(
          sum(when(col("event_type").isin("view", "click"), 1L)
            .otherwise(0L)).as("score"),
          sum(when(col("event_type") === "purchase",
            col("value").cast("decimal(12,2)") * 100).otherwise(0))
            .cast("long").as("cents"))
        .select(col("score"),
          when(col("cents") > 60000L, 1L).otherwise(0L).as("pos"))
      val w = Window.orderBy(col("score"))
      val r2 = scored
        .withColumn("rk", rank().over(w))
        .withColumn("cnt", count(lit(1)).over(
          Window.partitionBy(col("score"))))
        .filter(col("pos") === 1)
        .agg(sum(col("rk") * 2 + col("cnt") - 1)).collect().head.getLong(0)
      val expected = (r2 - p * (p + 1)) * 10000 / (2 * p * n)
      assert(auc === expected, s"dir=$dir")
      assert(p > 0 && n > 0, s"degenerate one-class fixture dir=$dir")
    }
  }

  test("auc: DECIMAL(38,0) container survives counts past 2^31 users") {
    import spark.implicits._
    // BigInt replay of the exact histogram rank-sum formula — the spec's
    // own oracle, free of any integer-width ceiling
    def expect(hist: Seq[(Long, Long, Long)]): (Long, Long) = {
      var cum = BigInt(0); var r2 = BigInt(0)
      var p = BigInt(0); var n = BigInt(0)
      hist.sortBy(_._1).foreach { case (_, cnt, np) =>
        r2 += BigInt(np) * (cum * 2 + cnt + 1)
        cum += cnt; p += np; n += cnt
      }
      val num = (r2 - p * (p + 1)) * 10000
      (((num / (2 * p * (n - p))).toLong),
        (num / (p * (n - p)) - 10000).toLong)
    }
    // 6e9 users in one tied group: the old long form overflowed at the
    // np*(cnt+1) product (1.8e19 > 2^63); all-tied AUC is exactly 1/2
    val tied = Seq((1L, 6000000000L, 3000000000L))
    // perfect separation at 3e9 per class: AUC = 1
    val sep = Seq((1L, 3000000000L, 0L), (2L, 3000000000L, 3000000000L))
    // messy 3-group mixture, expectation from the BigInt replay only
    val mix = Seq((1L, 2500000000L, 400000000L),
      (2L, 3100000000L, 1700000000L), (3L, 2200000000L, 1900000000L))
    for ((hist, label) <- Seq((tied, "tied"), (sep, "sep"), (mix, "mix"))) {
      val row = Analytics8.aucFromHistogram(
        hist.toDF("score", "cnt", "np")).collect().head
      val (eAuc, eGini) = expect(hist)
      assert(row.getLong(2) === eAuc, s"auc $label")
      assert(row.getLong(3) === eGini, s"gini $label")
      assert(row.getLong(0) === hist.map(_._3).sum, s"n_pos $label")
      assert(!row.isNullAt(2), s"overflow->null $label")
    }
    assert(expect(tied)._1 === 5000L)
    assert(expect(sep)._1 === 10000L)
  }

  test("calibration: bins conserve users and weighted gap == ece") {
    val out = Analytics8.calibration(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val users = Tables.events(spark, sf001)
      .select(countDistinct(col("user_id"))).collect().head.getLong(0)
    assert(out.map(_._2).sum === users)
    assert(out.map(_._1).distinct.length === out.length)
    out.foreach { case (bin, nUsers, conf, obs, gap, ece) =>
      assert(bin >= 0 && bin <= 9)
      assert(conf >= bin * 1000 && conf < (bin + 1) * 1000 || conf === 9500,
        s"conf_bps $conf outside bin $bin")
      assert(obs >= 0 && obs <= 10000)
      assert(gap === math.abs(conf - obs))
      // the constant column replays the weighted-mean definition
      assert(ece === out.map(r => r._2 * r._5).sum / out.map(_._2).sum)
      assert(nUsers > 0)
    }
  }

  test("survival: valid monotone KM curve matching the naive product") {
    val out = Analytics8.survivalKm(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty)
    // t strictly increasing, n_risk strictly decreasing over event times,
    // surv in (0,1] and non-increasing
    assert(out.map(_._1).sliding(2).forall(p => p.length < 2 || p(0) < p(1)))
    assert(out.map(_._2).sliding(2).forall(p => p.length < 2 || p(0) > p(1)))
    // surv may reach exactly 0.0 if the final risk set is consumed
    assert(out.map(_._4).forall(s => s >= 0.0 && s <= 1.0))
    assert(out.map(_._4).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    // every step loses at least its events from the risk set
    out.sliding(2).foreach {
      case Array((_, n1, d1, _), (_, n2, _, _)) => assert(n2 <= n1 - d1)
      case _ =>
    }
    // naive left-fold product replay
    var acc = 1.0
    out.foreach { case (_, n, d, s) =>
      acc = acc * (1.0 - d.toDouble / n.toDouble)
      assert(acc === s)
    }
    // the initial risk set is every signed-up user
    val signups = Tables.events(spark, sf001)
      .filter(col("event_type") === "signup")
      .select(countDistinct(col("user_id"))).collect().head.getLong(0)
    assert(out.head._2 <= signups)
  }
}
