package graft

import java.util.Locale

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Analytics, TextAnalysis2}

/** Analytics batch (PageRank, islands, merge, basket, EWMA) and the
  * co-occurrence text ops — properties plus Scala golden recomputes.
  */
class AnalyticsSpec extends AnyFunSuite with SparkTestBase {

  test("pagerank: probability mass conserved, all ranks positive") {
    val rows = Analytics.pagerank(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getDouble(1)).sum
    // each iteration maps a unit distribution to a unit distribution
    // (every node has outdegree >= 1 on the undirected edge set)
    assert(math.abs(total - 1.0) < 1e-3, s"rank mass drifted: $total")
    assert(rows.forall(_.getDouble(1) > 0))
  }

  test("pagerank converges: epsilon-stop under the pinned ceiling, deterministic") {
    val (ranks, rounds) = Analytics.pagerankConverged(spark, sf0001)
    info(s"converged in $rounds rounds (eps=1e-9, ceiling 20)")
    // the data-driven stop fires strictly before the determinism ceiling
    // (a run that exhausts the ceiling hasn't converged, it was cut off)
    assert(rounds > 0 && rounds < 20, s"no convergence inside the ceiling: $rounds")
    val rows = ranks.collect()
    assert(rows.nonEmpty)
    // converged ranks are still a probability distribution
    val total = rows.map(_.getDouble(1)).sum
    assert(math.abs(total - 1.0) < 1e-3, s"rank mass drifted: $total")
    // determinism: the round count is a pure function of the data, so a
    // second run takes the identical number of rounds
    val (_, rounds2) = Analytics.pagerankConverged(spark, sf0001)
    assert(rounds2 === rounds)
  }

  test("q78b registered form stops at the pinned round count") {
    // the oracle unrolls EXACTLY ConvergedRounds CTEs and the query
    // emits the data-driven count as a column — this pins the two at
    // the spec level too, on the fixture the oracle gate replays
    val out = Analytics.pagerankConvergedQuery(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getLong(2) === Analytics.ConvergedRounds.toLong))
    // and the eps=1e-6 stop fires at the same count on the next SF up,
    // the corpus the driver's correctness gate runs at
    val (_, roundsSf001) = Analytics.pagerankConverged(
      spark, "/root/testdata/sf0.01", Analytics.ConvergedEps, 16)
    assert(roundsSf001 === Analytics.ConvergedRounds)
  }

  test("islands: span arithmetic holds and streaks don't touch") {
    val byUser = Analytics.activityIslands(spark, sf0001).collect()
      .map(r => (r.getLong(0), java.time.LocalDate.parse(r.getString(1)),
        java.time.LocalDate.parse(r.getString(2)), r.getLong(3)))
      .groupBy(_._1)
    assert(byUser.nonEmpty)
    byUser.values.foreach { streaks =>
      streaks.foreach { case (_, s, e, n) =>
        assert(java.time.temporal.ChronoUnit.DAYS.between(s, e) + 1 === n)
      }
      // consecutive streaks of one user must be separated by a real gap
      streaks.sortBy(_._2).sliding(2).foreach {
        case Array((_, _, e1, _), (_, s2, _, _)) =>
          assert(java.time.temporal.ChronoUnit.DAYS.between(e1, s2) >= 2)
        case _ =>
      }
    }
  }

  test("merge upsert: branch counts and update arithmetic") {
    val cust = Tables.customer(spark, sf0001)
      .select(col("c_custkey"), col("c_acctbal")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val out = Analytics.mergeUpsert(spark, sf0001).collect()
    val byAction = out.groupBy(_.getString(4)).view.mapValues(_.length).toMap
    assert(byAction("insert") === cust.keys.count(_ % 7 == 0))
    assert(byAction("update") === cust.keys.count(_ % 5 == 0))
    assert(byAction("keep") === cust.size - byAction("update"))
    out.filter(_.getString(4) == "update").foreach { r =>
      assert(r.getDouble(3) === cust(r.getLong(0)) + 100.0)
    }
    out.filter(_.getString(4) == "insert").foreach { r =>
      assert(r.getLong(0) < 0L && r.getDouble(3) === 0.0)
    }
  }

  test("market basket: oriented pairs, support floor, lift recompute") {
    val li = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nBaskets = li.map(_._1).distinct.length.toLong
    val cnt = li.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val co = li.groupBy(_._1).values.flatMap { basket =>
      val parts = basket.map(_._2).sorted
      for (i <- parts.indices; j <- i + 1 until parts.length)
        yield (parts(i), parts(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).filter(_._2 >= 2).toMap
    val out = Analytics.marketBasket(spark, sf0001).collect()
    assert(out.length === co.size)
    out.foreach { r =>
      val (u, v, c) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(u < v && c >= 2 && co((u, v)) === c)
      assert(r.getDouble(3) ===
        (c * nBaskets).toDouble / (cnt(u) * cnt(v)).toDouble)
    }
  }

  test("ewma: bit-exact against a driver-side fold of the same order") {
    val out = Analytics.ewma(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val user = out.keys.min
    val vals = Tables.events(spark, sf0001)
      .filter(col("user_id") === user)
      .orderBy(col("ts"), col("event_id"))
      .select(col("value")).collect().map(_.getDouble(0))
    val expected = vals.tail.foldLeft(vals.head)((s, x) => 0.3 * x + 0.7 * s)
    assert(out(user)._1 === vals.length.toLong)
    assert(out(user)._2 === expected) // identical IEEE sequence -> bit-equal
  }

  /** The Spark-side tokenization (slice 64 -> normalize -> drop empties)
    * replayed with driver-side JVM ops (Locale.ROOT per NOTES.md #13).
    */
  private def tokenize(text: String): Array[String] =
    text.toLowerCase(Locale.ROOT).split(" ", -1).take(TextAnalysis2.MaxToks)
      .map(_.replaceAll("[^\\w]", "")).filter(_.nonEmpty)

  test("skipgram: golden recompute of the full pair table") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("text")).collect().map(_.getString(0))
    val expected = docs.flatMap { t =>
      val lst = tokenize(t)
      for (i <- lst.indices; d <- 1 to 2 if i + d < lst.length)
        yield (lst(i), lst(i + d))
    }.groupBy(identity).view.mapValues(_.length.toLong)
      .filter(_._2 >= 3).toMap
    val got = TextAnalysis2.skipgram(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === expected)
  }

  test("pmi: formula recompute on every emitted bigram") {
    val lists = Tables.documents(spark, sf0001)
      .select(col("text")).collect().map(r => tokenize(r.getString(0)))
    val uni = lists.flatten.groupBy(identity).view.mapValues(_.length.toLong)
    val tToks = lists.map(_.length.toLong).sum
    val tBi = lists.map(l => math.max(l.length - 1, 0).toLong).sum
    val rows = TextAnalysis2.pmiBigrams(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w1, w2, cUv) = (r.getString(0), r.getString(1), r.getLong(2))
      val ratio = cUv.toDouble * tToks.toDouble * tToks.toDouble /
        (tBi.toDouble * uni(w1).toDouble * uni(w2).toDouble)
      assert(r.getDouble(3) === math.floor(math.log(ratio) * 1e4 + 0.5) / 1e4)
      assert(cUv >= 5)
    }
  }
}
