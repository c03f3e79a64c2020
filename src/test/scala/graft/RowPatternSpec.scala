package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.RowPattern
import graft.operators.RowPattern.Match

/** Matcher semantics pinned on hand-computed fixtures, the compile-time
  * restriction checks, and the distributed operator against a
  * driver-side replay of the same matcher on real data.
  */
class RowPatternSpec extends AnyFunSuite with SparkTestBase {

  private def m(p: String, s: String*): Seq[(Long, Long, Int)] =
    RowPattern.matchSeq(p, s).map(x => (x.startUs, x.endUs, x.nRows))

  test("literal sequence, greedy star, non-overlap, skip past last row") {
    // plain literal chain
    assert(m("a b", "a", "b", "a", "b") === Seq((0, 1, 2), (2, 3, 2)))
    // greedy star consumes the full run; ends on the literal
    assert(m("a b* c", "a", "b", "b", "c") === Seq((0, 3, 4)))
    // star consuming zero rows
    assert(m("a b* c", "a", "c") === Seq((0, 1, 2)))
    // failed attempt (star broken by a non-c, non-b row) then a later match
    assert(m("a b* c", "a", "b", "x", "a", "c") === Seq((3, 4, 2)))
    // the failing row itself restarts an attempt: a a c → match at rows 1-2
    assert(m("a c", "a", "a", "c") === Seq((1, 2, 2)))
    // plus requires at least one; optional at most one
    assert(m("a b+ c", "a", "c") === Seq.empty)
    assert(m("a b+ c", "a", "b", "c") === Seq((0, 2, 3)))
    assert(m("a b? c", "a", "b", "c") === Seq((0, 2, 3)))
    assert(m("a b? c", "a", "c") === Seq((0, 1, 2)))
    // single-token pattern: every occurrence is a match
    assert(m("a", "a", "x", "a") === Seq((0, 0, 1), (2, 2, 1)))
    // class alternatives
    assert(m("a (b|d)* c", "a", "b", "d", "b", "c") === Seq((0, 4, 5)))
  }

  test("flush completes a trailing zero-consumable tail") {
    // star tail still open at end of stream → completes at last consumed
    assert(m("a b*", "a", "b", "b") === Seq((0, 2, 3)))
    // plus tail satisfied → completes; unsatisfied → discarded
    assert(m("a b+", "a", "b") === Seq((0, 1, 2)))
    assert(m("a b+", "a") === Seq.empty)
    // literal tail missing → discarded
    assert(m("a b* c", "a", "b") === Seq.empty)
  }

  test("compile rejects patterns the single-pass matcher cannot honor") {
    intercept[IllegalArgumentException](RowPattern.compile("a* b"))
    // later token overlapping the start class → missed-match hazard
    intercept[IllegalArgumentException](RowPattern.compile("a a c"))
    // quantified token overlapping its successor → greedy would eat it
    intercept[IllegalArgumentException](RowPattern.compile("a (b|c)* c"))
    intercept[IllegalArgumentException](RowPattern.compile(""))
  }

  test("distributed operator equals a driver-side replay on real events") {
    val got = RowPattern
      .matchPattern(Tables.events(spark, sf0001), "signup (view|click)* purchase")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .sortBy(x => (x._1, x._2))

    val rows = Tables.events(spark, sf0001)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(x => (x._1, x._2, x._3))
    val expect = rows.groupBy(_._1).toSeq.flatMap { case (u, evs) =>
      val matcher = new RowPattern.Matcher(
        RowPattern.compile("signup (view|click)* purchase"))
      val out = scala.collection.mutable.ArrayBuffer.empty[Match]
      evs.foreach { case (_, us, _, tp) => matcher.feed(tp, us).foreach(out += _) }
      matcher.flush().foreach(out += _)
      out.map(mm => (u, mm.startUs, mm.endUs, mm.nRows))
    }.sortBy(x => (x._1, x._2))
    assert(got.toSeq === expect)
    assert(got.nonEmpty, "fixture must produce at least one match")
  }

  test("plan: one shuffle on the key, no global sort") {
    val df = RowPattern
      .matchPattern(Tables.events(spark, sf0001), "signup (view|click)* purchase")
    val plan = df.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected exactly one hash exchange:\n$plan")
    assert(!plan.contains("Exchange rangepartitioning"),
      s"global sort leaked into the plan:\n$plan")
  }
}
