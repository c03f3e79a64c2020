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

  test("reluctant quantifiers: successor priority, shortest match") {
    // with classes disjoint from the successor, reluctant ≡ greedy
    assert(m("a b*? c", "a", "b", "b", "c") === Seq((0, 3, 4)))
    assert(m("a b*? c", "a", "c") === Seq((0, 1, 2)))
    // the reluctant star's class CONTAINS the terminator (greedy
    // rejects this shape): the successor wins every overlapping row,
    // so the match ends at the FIRST c and the star never eats one
    assert(m("a (b|c)*? c", "a", "b", "c", "c") === Seq((0, 2, 3)))
    assert(m("a (b|c)*? c", "a", "c") === Seq((0, 1, 2)))
    assert(m("a (b|c)*? c", "a", "c", "c") === Seq((0, 1, 2)))
    // +? must consume at least one row before it may defer
    assert(m("a (b|c)+? c", "a", "c", "c") === Seq((0, 2, 3)))
    assert(m("a (b|c)+? c", "a", "c") === Seq.empty)
    // ?? prefers zero rows when the successor can take the row — over
    // [a b b] the SHORTEST match (a, first b) completes immediately and
    // the second b cannot start a new one
    assert(m("a b?? b", "a", "b") === Seq((0, 1, 2)))
    assert(m("a b?? b", "a", "b", "b") === Seq((0, 1, 2)))
    // ...whereas the greedy-legal disjoint form consumes the optional:
    assert(m("a c? b", "a", "c", "b") === Seq((0, 2, 3)))
    // four-token chain: deferral only helps if the REST of the chain
    // accepts; a One token failing after the handoff resets the attempt
    assert(m("a b*? c d", "a", "b", "c", "d") === Seq((0, 3, 4)))
    assert(m("a b*? c d", "a", "c", "c", "d") === Seq.empty)
    // a row no reachable token consumes still resets the attempt
    assert(m("a (b|c)*? c", "a", "x", "c") === Seq.empty)
    // trailing reluctant star behaves like greedy at end of stream
    assert(m("a b*?", "a", "b", "b") === Seq((0, 2, 3)))
    // reluctant plus tail: satisfied completes on flush
    assert(m("a b+?", "a", "b") === Seq((0, 1, 2)))
    assert(m("a b+?", "a") === Seq.empty)
  }

  test("reluctant compile rules: restriction 3 lifted, the rest kept") {
    // the shape greedy rejects is the reluctant grammar's point
    RowPattern.compile("a (b|c)*? c")
    RowPattern.compile("a (b|c)+? c")
    RowPattern.compile("a b?? b")
    // start-class disjointness (restriction 2) still binds
    intercept[IllegalArgumentException](RowPattern.compile("a (a|b)*? c"))
    // leading reluctant quantifiers stay rejected
    intercept[IllegalArgumentException](RowPattern.compile("a*? b"))
    intercept[IllegalArgumentException](RowPattern.compile("a+? b"))
    intercept[IllegalArgumentException](RowPattern.compile("a?? b"))
  }

  test("compile rejects patterns the single-pass matcher cannot honor") {
    intercept[IllegalArgumentException](RowPattern.compile("a* b"))
    intercept[IllegalArgumentException](RowPattern.compile("a? b"))
    // later token overlapping the start class → missed-match hazard
    intercept[IllegalArgumentException](RowPattern.compile("a a c"))
    // quantified token overlapping its successor → greedy would eat it
    intercept[IllegalArgumentException](RowPattern.compile("a (b|c)* c"))
    intercept[IllegalArgumentException](RowPattern.compile(""))
  }

  test("leading + desugars to an anchored maximal run") {
    // a+ b ≡ a a* b: greedy takes the whole run, anchored at its first row
    assert(m("a+ b", "a", "a", "a", "b") === Seq((0, 3, 4)))
    assert(m("a+ b", "a", "b", "a", "a", "b") === Seq((0, 1, 2), (2, 4, 3)))
    // broken run: the x kills the left attempt; the right run still matches
    assert(m("a+ b", "a", "x", "a", "b") === Seq((2, 3, 2)))
    // run with no terminator never matches (flush discards: b is literal)
    assert(m("a+ b", "a", "a") === Seq.empty)
    // leading-run exemption is narrow: a mid-pattern start-class token
    // still rejects
    intercept[IllegalArgumentException](RowPattern.compile("a b* a"))
  }

  private def mNext(p: String, s: String*): Seq[(Long, Long, Int)] =
    RowPattern.matchSeq(p, s, RowPattern.SkipToNextRow)
      .map(x => (x.startUs, x.endUs, x.nRows))

  test("AFTER MATCH SKIP TO NEXT ROW emits every converting run suffix") {
    // k-click run before the terminator → k overlapping matches, all
    // ending at the terminator, ordered by start
    assert(mNext("a+ b", "a", "a", "a", "b")
      === Seq((0, 3, 4), (1, 3, 3), (2, 3, 2)))
    // two separate runs: suffixes within each, none across the break
    assert(mNext("a+ b", "a", "b", "a", "a", "b")
      === Seq((0, 1, 2), (2, 4, 3), (3, 4, 2)))
    // a failed run leaves nothing buffered (x kills rows 0-1's attempt)
    assert(mNext("a+ b", "a", "a", "x", "a", "b") === Seq((3, 4, 2)))
    // flush under the mode: zero-consumable tail completes all suffixes
    assert(mNext("a+", "a", "a", "a")
      === Seq((0, 2, 3), (1, 2, 2), (2, 2, 1)))
    // non-leading-run patterns: restriction 2 forbids start-class rows
    // inside a span, so the two modes agree — pinned on the funnel shape
    assert(mNext("a (b|d)* c", "a", "b", "d", "c", "a", "c")
      === m("a (b|d)* c", "a", "b", "d", "c", "a", "c"))
  }

  test("SkipToNextRow matcher refuses the fixed-width streaming snapshot") {
    val matcher = new RowPattern.Matcher(
      RowPattern.compile("a+ b"), RowPattern.SkipToNextRow)
    intercept[IllegalArgumentException](matcher.snapshot)
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

  test("streaming CEP equals the batch operator over the 4-slice replay") {
    val streamed = graft.streaming.StreamingQueries
      .streamRowPattern(spark, sf0001).collect().map(_.toSeq)
    val batch = graft.operators.RowPattern
      .q101RowPattern(spark, sf0001).collect().map(_.toSeq)
    assert(streamed.toSeq === batch.toSeq)
    assert(streamed.nonEmpty)
  }

  test("a match spanning a micro-batch boundary completes via carried state") {
    import graft.streaming.FileEventSource
    val dir = java.nio.file.Files.createTempDirectory("cep_span").toString
    try {
      // pick a real multi-row match and cut the replay INSIDE its span
      val matches = RowPattern
        .matchPattern(Tables.events(spark, sf0001), "signup (view|click)* purchase")
        .filter(col("n_rows") >= 2).collect()
      assert(matches.nonEmpty, "fixture needs a multi-row match")
      val cutUs = matches.head.getLong(1) // start_us: boundary lands mid-span
      val ev = Tables.events(spark, sf0001)
      def writeOne(df: org.apache.spark.sql.DataFrame, target: String): Unit = {
        val tmp = java.nio.file.Files.createTempDirectory("cep_one").toString
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        java.nio.file.Files.move(part.toPath, java.nio.file.Paths.get(target))
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
      }
      writeOne(ev.filter(unix_micros(col("ts")) <= cutUs), s"$dir/events.parquet")
      Thread.sleep(1100) // later mtime → second batch
      writeOne(ev.filter(unix_micros(col("ts")) > cutUs), s"$dir/events_b.parquet")

      val streamed = graft.streaming.StreamingQueries.streamRowPatternFrom(
        spark, FileEventSource(dir, maxFilesPerTrigger = Some(1)), "cep_span")
        .collect().map(_.toSeq)
      val batch = graft.operators.RowPattern
        .q101RowPattern(spark, sf0001).collect().map(_.toSeq)
      assert(streamed.toSeq === batch.toSeq,
        "split replay must still find every match, incl. the cut one")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("streaming reluctant funnel equals the q121 batch operator") {
    // reluctance adds no matcher state, so the TWS processor's 5-field
    // snapshot carries reluctant attempts across micro-batches unchanged
    val streamed = graft.streaming.StreamingQueries
      .streamReluctantFunnel(spark, sf0001).collect().map(_.toSeq)
    val batch = graft.operators.RowPattern
      .q121ReluctantFunnel(spark, sf0001).collect().map(_.toSeq)
    assert(streamed.toSeq === batch.toSeq)
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
