package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Analytics7

/** Invariant specs for the round-8 analytics batch, beyond the DuckDB
  * hash oracles: conservation laws (the datasheet's totals must re-add
  * to the corpus; attribution must conserve revenue to the cent) and
  * the ordinal-median contract.
  */
class Analytics7Spec extends AnyFunSuite with SparkTestBase {

  test("dataset card: strata partition the corpus, medians are ordinal") {
    val out = Analytics7.datasetCard(spark, sf001).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7))))
    val docs = Tables.documents(spark, sf001)
    // strata partition the corpus exactly
    assert(out.map(_._2._1).sum === docs.count())
    val expected = docs.groupBy(col("lang"), col("source")).count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    out.foreach { case (k, (nDocs, nToks, nChars, dupBps, p50, shortBps)) =>
      assert(nDocs === expected(k))
      assert(nChars > 0 && nToks > 0)
      assert(dupBps >= 0 && dupBps <= 10000)
      assert(shortBps >= 0 && shortBps <= 10000)
      assert(p50 > 0)
      // the ordinal median is an actual document's token count in the
      // stratum, between its min and max
      val toks = docs.filter(col("lang") === k._1 && col("source") === k._2)
        .select(size(filter(split(lower(col("text")), " ", -1),
          w => w =!= "")).cast("long")).collect().map(_.getLong(0))
      assert(toks.contains(p50))
      assert(toks.count(_ <= p50) * 2 >= toks.length)
      assert(toks.count(_ >= p50) * 2 >= toks.length)
    }
  }

  test("attribution: revenue conserved to the cent, channels complete") {
    val out = Analytics7.attributionLinear(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val channels = out.map(_._1).toSet
    assert(channels.subsetOf(Set("view", "click", "direct")))
    // conservation: linear split with remainder-to-last credits EVERY
    // cent of purchase revenue exactly once
    val totalCents = Tables.events(spark, sf0001)
      .filter(col("event_type") === "purchase")
      .agg(sum(col("value").cast("decimal(12,2)") * 100).cast("long"))
      .collect().head.getLong(0)
    assert(out.map(_._3).sum === totalCents)
    // fixture sanity: both engaged channels and the direct bucket carry
    // mass at this SF (30-minute lookback over a dense event stream)
    assert(out.map(_._2).sum > 0)
  }

  test("decile lift: equal tiles, conservation, monotone concentration") {
    val out = Analytics7.decileLift(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.map(_._1).toSeq === (1L to 10L))
    // equal-population tiles (ntile: sizes differ by at most 1)
    val sizes = out.map(_._2)
    assert(sizes.max - sizes.min <= 1)
    // conservation: decile revenue re-adds to the purchase total
    val total = Tables.events(spark, sf001)
      .filter(col("event_type") === "purchase")
      .agg(sum(col("value").cast("decimal(12,2)") * 100).cast("long"))
      .collect().head.getLong(0)
    assert(out.map(_._3).sum === total)
    // ranked-desc deciles: per-decile revenue non-increasing, cum share
    // monotone to 10000 bps
    assert(out.map(_._3).sliding(2).forall(p => p(0) >= p(1)))
    assert(out.map(_._5).sliding(2).forall(p => p(0) <= p(1)))
    assert(out.last._5 === 10000L)
    // top decile must actually concentrate (lift > 1 ⇔ > 1000 bps)
    assert(out.head._4 > 1000L)
  }

  test("decile lift: distributed rank assignment == single-window ntile") {
    import org.apache.spark.sql.expressions.Window
    // the scale-safe path (range buckets + prefix-sum rank + exact
    // ntile arithmetic) must reproduce ntile(10) OVER (ORDER BY cents
    // DESC, user_id) bit-for-bit. sf0.001 has 15 purchase users
    // (10 ∤ n — exercises the remainder tiles, first n mod 10 one row
    // larger); sf0.01 has 150 (the even path).
    val uneven = (for (dir <- Seq(sf0001, sf001)) yield {
      val perUser = Tables.events(spark, dir)
        .filter(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(sum(col("value").cast("decimal(12,2)") * 100).cast("long")
          .as("cents"))
      val naive = perUser.withColumn("decile",
          ntile(10).over(Window.orderBy(col("cents").desc, col("user_id")))
            .cast("long"))
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n_users"), sum(col("cents")).as("cents"))
        .orderBy(col("decile")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val dist = Analytics7.decileLift(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(dist.toSeq === naive.toSeq, s"dir=$dir")
      perUser.count() % 10 != 0
    }).exists(identity)
    assert(uneven, "no fixture exercised the uneven-tile branch")
  }

  test("dataset card: two-pass median == per-stratum rank-window median") {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sf001)
    val perDoc = docs.select(col("lang"), col("source"), col("doc_id"),
      size(filter(split(lower(col("text")), " ", -1), w => w =!= ""))
        .cast("long").as("n_toks"))
    val stratum = Window.partitionBy(col("lang"), col("source"))
    val naive = perDoc
      .withColumn("rk", row_number().over(
        stratum.orderBy(col("n_toks"), col("doc_id"))))
      .withColumn("n_in", count(lit(1)).over(stratum))
      .filter(col("rk") * 2 === col("n_in") ||
        col("rk") * 2 === col("n_in") + 1)
      .select(col("lang"), col("source"), col("n_toks"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val card = Analytics7.datasetCard(spark, sf001).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(6)).toMap
    assert(card === naive)
  }
}
