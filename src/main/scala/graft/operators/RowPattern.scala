package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Row-pattern matching over per-key event sequences — the
  * MATCH_RECOGNIZE capability of Trino/Flink/ISO SQL:2016, which Spark
  * SQL lacks. A pattern is a sequence of tokens, each a set of event
  * types with a quantifier (`one`, `?`, `*`, `+`, and the reluctant
  * `??`, `*?`, `+?`); matching is anchored and greedy (reluctant
  * tokens yield to their successor — see [[Quant]]), with the AFTER
  * MATCH policy a compile-time option
  * ([[SkipMode]]): SKIP PAST LAST ROW (the ISO default —
  * non-overlapping) or SKIP TO NEXT ROW (overlapping run suffixes).
  *
  * Restrictions (validated at [[RowPattern.compile]]) that buy a
  * STREAMING matcher — single forward pass, O(1) state, no backtracking:
  *   1. the first token is un-quantified (a match's first row is pinned);
  *   2. every later token's class is disjoint from the first token's
  *      class — then a row consumed mid-attempt can never have started a
  *      fresh match, so a failed attempt restarts AT the failing row
  *      with nothing missed (without this, `signup signup purchase`
  *      over [s s s p] would silently lose the rows-1..3 match);
  *   3. each quantified token's class is disjoint from its successor's
  *      (greedy consumption can never eat the successor's row).
  *
  * Plan shape (the 100 TB story): ONE hash shuffle on the key, the
  * shuffle's own in-partition sort, and a constant-memory
  * `mapPartitions` pass — the matcher never materializes a key's
  * history (unlike a collect_list-per-user formulation), so per-key
  * event counts are unbounded. The sequential scan IS the semantics;
  * everything before it is ordinary declarative Spark.
  */
object RowPattern {

  sealed trait Quant
  case object One extends Quant
  case object Opt extends Quant
  case object Star extends Quant
  case object Plus extends Quant
  // reluctant (lazy) variants — `??` / `*?` / `+?` (ISO MATCH_RECOGNIZE
  // / Flink CEP surface): consume as FEW rows as possible. Their
  // compile-time meaning is that restriction 3 is LIFTED: a reluctant
  // token's class may overlap its successor's, and on an overlapping
  // row the SUCCESSOR wins — deterministic single-pass resolution via
  // a constant-cost token lookahead, no backtracking. (With disjoint
  // classes reluctant ≡ greedy, which is exactly why the greedy
  // grammar could require disjointness; reluctance is how a pattern
  // like `signup noise*? purchase` gets to put `purchase` in the noise
  // class and still mean "stop at the FIRST purchase".)
  case object OptRel extends Quant
  case object StarRel extends Quant
  case object PlusRel extends Quant

  /** AFTER MATCH SKIP policy (ISO MATCH_RECOGNIZE):
    * [[SkipPastLastRow]] resumes after the matched span (the default,
    * non-overlapping); [[SkipToNextRow]] resumes at the row after the
    * match's START, admitting overlapping matches. Under this module's
    * restriction set the two differ EXACTLY on the leading-run family
    * (`a+ X…` ≡ `a a* X…`): restriction 2 forbids start-class rows
    * anywhere else inside a span, so a non-leading-run pattern yields
    * the same matches in both modes — which is why SkipToNextRow stays
    * single-pass: the only overlap possible is the suffixes of the one
    * contiguous leading run, and those all complete at the same row.
    * State bound: the start times of the CURRENT leading run (cleared on
    * every failed attempt), i.e. O(longest same-class run per key) —
    * bounded by data shape, not history length.
    */
  sealed trait SkipMode
  case object SkipPastLastRow extends SkipMode
  case object SkipToNextRow extends SkipMode

  final case class Tok(types: Set[String], quant: Quant) {
    /** May this token consume zero rows outright? */
    def zeroOk: Boolean =
      quant == Opt || quant == Star || quant == OptRel || quant == StarRel
    /** Reluctant (lazy) quantifier — successor priority on overlap. */
    def reluctant: Boolean =
      quant == OptRel || quant == StarRel || quant == PlusRel
  }

  /** Parse `"signup (view|click)* purchase"` → token list. Grammar per
    * whitespace-separated atom: `name` or `(a|b|c)`, optionally suffixed
    * `?`, `*`, `+` (greedy) or `??`, `*?`, `+?` (reluctant).
    */
  def compile(pattern: String): IndexedSeq[Tok] = {
    require(pattern.trim.nonEmpty, "empty pattern")
    val toks = pattern.trim.split("\\s+").toIndexedSeq.map { atom =>
      // two-char reluctant suffixes first — `b*?` must not parse as
      // an Opt-quantified atom named "b*"
      val (body, quant) =
        if (atom.length > 2 && atom.endsWith("??"))
          (atom.dropRight(2), OptRel: Quant)
        else if (atom.endsWith("*?")) (atom.dropRight(2), StarRel: Quant)
        else if (atom.endsWith("+?")) (atom.dropRight(2), PlusRel: Quant)
        else atom.last match {
          case '?' => (atom.dropRight(1), Opt: Quant)
          case '*' => (atom.dropRight(1), Star: Quant)
          case '+' => (atom.dropRight(1), Plus: Quant)
          case _   => (atom, One: Quant)
        }
      val types =
        if (body.startsWith("(") && body.endsWith(")"))
          body.substring(1, body.length - 1).split("\\|").map(_.trim).toSet
        else Set(body)
      require(types.forall(_.nonEmpty), s"empty type in pattern atom '$atom'")
      Tok(types, quant)
    }
    require(toks.nonEmpty, "empty pattern")
    // leading `a+` desugars to `a a*` — MATCH_RECOGNIZE's one-or-more
    // anchored at the first occurrence; leading `?`/`*` stay rejected
    // (a zero-width start is genuinely unanchored), and so do the
    // leading RELUCTANT forms — `a+?` would need the SkipToNextRow
    // run-buffer machinery to stay sound, deliberately out of scope
    val anchored =
      if (toks.head.quant == Plus)
        Tok(toks.head.types, One) +: Tok(toks.head.types, Star) +: toks.tail
      else toks
    require(anchored.head.quant == One,
      "first pattern token must be un-quantified (anchors the match start)")
    anchored.zipWithIndex.drop(1).foreach { case (t, i) =>
      // a token overlapping the start class would normally let a match
      // begin at an already-consumed row (missed by the single pass) —
      // EXCEPT the leading-run case `a a*`: the star consumes a maximal
      // contiguous run from the anchor, and any later start inside that
      // run reaches the same failing/completing row, so retry-at-current
      // loses nothing (and greedy wants the longest run anyway)
      val leadingRun = i == 1 && t.quant == Star && t.types == anchored.head.types
      require(leadingRun || (t.types & anchored.head.types).isEmpty,
        s"token $i overlaps the start class — the single-pass matcher " +
          "would miss matches beginning at consumed rows")
      // restriction 3 binds GREEDY quantifiers only: a reluctant
      // token resolves an overlapping row in the successor's favor
      // (that determinism is the whole point of `*?`); greedy overlap
      // stays rejected because greedy would eat the successor's rows
      if (t.quant != One && !t.reluctant && i + 1 < anchored.length)
        require((t.types & anchored(i + 1).types).isEmpty,
          s"quantified token $i overlaps its successor — greedy " +
            "consumption would eat the successor's rows")
    }
    anchored
  }

  /** A completed match: event-time micros of the first/last matched row
    * plus the row count.
    */
  final case class Match(startUs: Long, endUs: Long, nRows: Int)

  /** Streaming matcher over ONE key's time-ordered event types. Pure and
    * driver-testable; the operator runs it per key inside
    * `mapPartitions`. Greedy; overlap per [[SkipMode]] (default
    * skip-past-last-row). `feed`/`flush` return a List because
    * [[SkipToNextRow]] emits every suffix of a leading run when its
    * completing row arrives — the list is that suffix set, ordered by
    * start time; under [[SkipPastLastRow]] it has at most one element.
    */
  final class Matcher(toks: IndexedSeq[Tok], skip: SkipMode = SkipPastLastRow) {
    private var ti = -1          // current token index; -1 = no attempt
    private var startUs = 0L
    private var endUs = 0L
    private var n = 0
    private var plusSatisfied = false

    // SkipToNextRow bookkeeping: start times of the current leading run
    // (anchor + its `a*` twin). Only a leading-run pattern can overlap
    // (see SkipMode scaladoc), so this stays empty in every other shape.
    private val isLeadingRun =
      toks.length >= 2 && toks(1).quant == Star && toks(1).types == toks.head.types
    private val trackStarts = skip == SkipToNextRow && isLeadingRun
    private val runStarts = scala.collection.mutable.ArrayBuffer.empty[Long]

    private def reset(): Unit = {
      ti = -1; n = 0; plusSatisfied = false; runStarts.clear()
    }

    private def complete(): List[Match] = {
      // suffix j of the run starts at runStarts(j) and consumed j fewer
      // rows; runStarts(0) == startUs, so j = 0 is the full greedy match
      val ms =
        if (trackStarts && runStarts.nonEmpty)
          runStarts.toList.zipWithIndex.map { case (s, j) => Match(s, endUs, n - j) }
        else List(Match(startUs, endUs, n))
      reset(); ms
    }

    /** Feed one row; returns the matches this row completed (see class
      * scaladoc for when that is more than one). A failed attempt
      * re-tries the SAME row as a fresh start (sound by restriction 2);
      * a skip chain that exhausts the tokens completes the attempt at
      * the previously consumed row, then re-tries.
      */
    /** Can any token from `from` onward consume a `tp` row, walking
      * only through zero-consumable tokens? O(pattern length) — the
      * constant-cost lookahead that keeps reluctant matching
      * backtrack-free: the reluctant token asks this BEFORE consuming,
      * and defers iff the answer is yes.
      */
    private def canConsumeAhead(from: Int, tp: String): Boolean = {
      var j = from
      while (j < toks.length) {
        if (toks(j).types.contains(tp)) return true
        if (!toks(j).zeroOk) return false
        j += 1
      }
      false
    }

    def feed(tp: String, us: Long): List[Match] = {
      var out: List[Match] = Nil
      var again = true
      while (again) {
        again = false
        if (ti < 0) {
          if (toks.head.types.contains(tp)) {
            startUs = us; endUs = us; n = 1; ti = 1; plusSatisfied = false
            if (trackStarts) runStarts += us
            if (ti == toks.length) out = complete() // single-token pattern
          }
        } else if (ti == toks.length) {
          // reachable only via a zero-consume skip chain below
          out = complete()
          again = true // this row may start a fresh match
        } else {
          val t = toks(ti)
          val mayLeave = t.zeroOk ||
            ((t.quant == Plus || t.quant == PlusRel) && plusSatisfied)
          if (t.reluctant && mayLeave && canConsumeAhead(ti + 1, tp)) {
            // successor priority: the reluctant token declines a row
            // some LATER reachable token can consume (shortest match)
            ti += 1; plusSatisfied = false
            again = true
          } else if (t.types.contains(tp)) {
            n += 1; endUs = us
            if (trackStarts && ti == 1) runStarts += us // still in the run
            t.quant match {
              case One | Opt | OptRel => ti += 1; plusSatisfied = false
              case Plus | PlusRel     => plusSatisfied = true
              case Star | StarRel     => ()
            }
            if (ti == toks.length) out = complete()
          } else if (mayLeave) {
            ti += 1; plusSatisfied = false
            again = true // same row against the next token (or completion)
          } else {
            reset()
            again = true // failed attempt: this row may start afresh
          }
        }
      }
      out
    }

    /** Serializable attempt state, for the streaming processor's
      * ValueState: (ti, startUs, endUs, n, plusSatisfied). Fixed-width
      * by design, which is why the streaming surface only supports the
      * default skip mode — SkipToNextRow's run buffer is variable-width
      * state this snapshot deliberately does not carry.
      */
    def snapshot: (Int, Long, Long, Int, Boolean) = {
      require(!trackStarts,
        "snapshot/restore serve the streaming processor, which supports " +
          "only SkipPastLastRow — the SkipToNextRow run buffer is not " +
          "part of the fixed-width state")
      (ti, startUs, endUs, n, plusSatisfied)
    }

    def restore(s: (Int, Long, Long, Int, Boolean)): Unit = {
      require(!trackStarts,
        "snapshot/restore serve the streaming processor, which supports " +
          "only SkipPastLastRow — the SkipToNextRow run buffer is not " +
          "part of the fixed-width state")
      ti = s._1; startUs = s._2; endUs = s._3; n = s._4; plusSatisfied = s._5
    }

    /** End of this key's rows: an in-flight attempt whose remaining
      * tokens are all zero-consumable completes at the last consumed row
      * (all of its run suffixes, under SkipToNextRow).
      */
    def flush(): List[Match] = {
      if (ti < 0) Nil
      else {
        val from =
          if (ti < toks.length && plusSatisfied &&
            (toks(ti).quant == Plus || toks(ti).quant == PlusRel)) ti + 1
          else ti
        val ok = (from until toks.length).forall(toks(_).zeroOk)
        if (ok) complete() else { reset(); Nil }
      }
    }
  }

  /** Driver-testable reference entry point: all matches over one
    * type-sequence (timestamps = indices). Used by the spec to pin the
    * matcher against hand-computed fixtures.
    */
  private[graft] def matchSeq(pattern: String, types: Seq[String],
      skip: SkipMode = SkipPastLastRow): Seq[Match] = {
    val m = new Matcher(compile(pattern), skip)
    val out = scala.collection.mutable.ArrayBuffer.empty[Match]
    types.zipWithIndex.foreach { case (tp, i) => m.feed(tp, i.toLong).foreach(out += _) }
    m.flush().foreach(out += _)
    out.toSeq
  }

  /** The generic operator: matches of `pattern` over an `events`-shaped
    * frame, per `user_id`, ordered by (ts, event_id).
    */
  def matchPattern(events: DataFrame, pattern: String,
      skip: SkipMode = SkipPastLastRow): DataFrame = {
    val toks = compile(pattern)
    val spark = events.sparkSession
    import spark.implicits._
    val sorted = events
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
      .repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("us"), col("event_id"))
      .as[(Long, Long, Long, String)]
    sorted.mapPartitions { it =>
      new Iterator[(Long, Long, Long, Int)] {
        private var curUser = Long.MinValue
        private var started = false
        private var matcher: Matcher = null
        private val pending =
          scala.collection.mutable.Queue.empty[(Long, Long, Long, Int)]
        private def emit(u: Long, m: Match): Unit =
          pending.enqueue((u, m.startUs, m.endUs, m.nRows))
        private def advance(): Unit = {
          while (pending.isEmpty && it.hasNext) {
            val (u, us, _, tp) = it.next()
            if (!started || u != curUser) {
              if (started) matcher.flush().foreach(emit(curUser, _))
              curUser = u
              matcher = new Matcher(toks, skip)
              started = true
            }
            matcher.feed(tp, us).foreach(emit(u, _))
          }
          if (pending.isEmpty && !it.hasNext && started) {
            matcher.flush().foreach(emit(curUser, _))
            started = false
          }
        }
        override def hasNext: Boolean = { advance(); pending.nonEmpty }
        override def next(): (Long, Long, Long, Int) = {
          advance(); pending.dequeue()
        }
      }
    }.toDF("user_id", "start_us", "end_us", "n_rows")
  }

  /** Registered query: the signup → (view|click)* → purchase conversion
    * funnel as a row pattern. The oracle replays it relationally: a
    * signup matches iff the FIRST later row outside the star class is a
    * purchase; such spans contain exactly one signup and one purchase,
    * so they are disjoint and skip-past-last changes nothing — which is
    * what makes this particular pattern exactly SQL-expressible (the
    * general operator is not).
    */
  def q101RowPattern(spark: SparkSession, dir: String): DataFrame =
    matchPattern(Tables.events(spark, dir), "signup (view|click)* purchase")
      .select(col("user_id"),
        date_format(timestamp_micros(col("start_us")),
          "yyyy-MM-dd HH:mm:ss.SSSSSS").as("start_ts"),
        date_format(timestamp_micros(col("end_us")),
          "yyyy-MM-dd HH:mm:ss.SSSSSS").as("end_ts"),
        col("n_rows").cast("long").as("n_rows"))
      .orderBy(col("user_id"), col("start_ts"))

  /** Shared with the streaming twin (`stream_row_pattern`): the match
    * set is identical because matches are emitted exactly once, when
    * completed, regardless of micro-batch boundaries.
    */
  private[graft] val RowPatternOracle: String =
    """WITH ev AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM events),
      |sig AS (SELECT user_id, rn AS srn, ts AS start_raw FROM ev
      |  WHERE event_type = 'signup'),
      |stopr AS (
      |  SELECT s.user_id, s.srn, s.start_raw, min(e.rn) AS stop_rn
      |  FROM sig s JOIN ev e ON e.user_id = s.user_id AND e.rn > s.srn
      |    AND e.event_type NOT IN ('view', 'click')
      |  GROUP BY 1, 2, 3)
      |SELECT n.user_id,
      |  strftime(n.start_raw, '%Y-%m-%d %H:%M:%S.%f') AS start_ts,
      |  strftime(e.ts, '%Y-%m-%d %H:%M:%S.%f') AS end_ts,
      |  cast(e.rn - n.srn + 1 AS BIGINT) AS n_rows
      |FROM stopr n JOIN ev e ON e.user_id = n.user_id AND e.rn = n.stop_rn
      |WHERE e.event_type = 'purchase'
      |ORDER BY n.user_id, start_ts""".stripMargin

  /** Second registered pattern, exercising the leading-run form the
    * compiler desugars (`click+ purchase` → `click click* purchase`):
    * maximal bursts of consecutive clicks converting directly into a
    * purchase. The oracle replays it as gaps-and-islands: each MAXIMAL
    * consecutive click run whose next row is a purchase — equal to the
    * greedy matcher's output because greedy takes the whole run and
    * spans (clicks + one purchase) cannot overlap.
    */
  def q105ClickBurst(spark: SparkSession, dir: String): DataFrame =
    matchPattern(Tables.events(spark, dir), "click+ purchase")
      .select(col("user_id"),
        date_format(timestamp_micros(col("start_us")),
          "yyyy-MM-dd HH:mm:ss.SSSSSS").as("start_ts"),
        date_format(timestamp_micros(col("end_us")),
          "yyyy-MM-dd HH:mm:ss.SSSSSS").as("end_ts"),
        col("n_rows").cast("long").as("n_rows"))
      .orderBy(col("user_id"), col("start_ts"))

  private val ClickBurstOracle: String =
    """WITH ev AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM events),
      |runs AS (
      |  SELECT user_id, min(ts) AS start_raw, max(rn) AS ern,
      |    cast(count(*) AS BIGINT) AS len
      |  FROM (SELECT user_id, ts, rn,
      |          rn - row_number() OVER (PARTITION BY user_id, event_type
      |            ORDER BY rn) AS grp, event_type
      |        FROM ev) x
      |  WHERE event_type = 'click'
      |  GROUP BY user_id, grp)
      |SELECT r.user_id,
      |  strftime(r.start_raw, '%Y-%m-%d %H:%M:%S.%f') AS start_ts,
      |  strftime(e.ts, '%Y-%m-%d %H:%M:%S.%f') AS end_ts,
      |  r.len + 1 AS n_rows
      |FROM runs r JOIN ev e ON e.user_id = r.user_id AND e.rn = r.ern + 1
      |WHERE e.event_type = 'purchase'
      |ORDER BY r.user_id, start_ts""".stripMargin

  /** Third registered pattern: `click+ purchase` under AFTER MATCH SKIP
    * TO NEXT ROW — every click TRAIL (suffix of a maximal click run)
    * that converts, not just the maximal burst q105 reports. The oracle
    * replays the mode's defining property relationally: a click row
    * starts a match iff its FIRST following non-click row is a purchase
    * — per-row, so one maximal run of k clicks before a purchase yields
    * k overlapping matches, all ending at that purchase. (A trailing
    * click run with no following row matches neither engine: the
    * matcher's flush finds the un-quantified purchase token pending, and
    * the oracle's min(rn) join finds no stop row.)
    */
  def q106ClickTrails(spark: SparkSession, dir: String): DataFrame =
    matchPattern(Tables.events(spark, dir), "click+ purchase", SkipToNextRow)
      .select(col("user_id"),
        date_format(timestamp_micros(col("start_us")),
          "yyyy-MM-dd HH:mm:ss.SSSSSS").as("start_ts"),
        date_format(timestamp_micros(col("end_us")),
          "yyyy-MM-dd HH:mm:ss.SSSSSS").as("end_ts"),
        col("n_rows").cast("long").as("n_rows"))
      .orderBy(col("user_id"), col("start_ts"), col("end_ts"))

  private val ClickTrailsOracle: String =
    """WITH ev AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM events),
      |clk AS (SELECT user_id, rn AS crn, ts AS start_raw FROM ev
      |  WHERE event_type = 'click'),
      |stopr AS (
      |  SELECT c.user_id, c.crn, c.start_raw, min(e.rn) AS stop_rn
      |  FROM clk c JOIN ev e ON e.user_id = c.user_id AND e.rn > c.crn
      |    AND e.event_type <> 'click'
      |  GROUP BY 1, 2, 3)
      |SELECT s.user_id,
      |  strftime(s.start_raw, '%Y-%m-%d %H:%M:%S.%f') AS start_ts,
      |  strftime(e.ts, '%Y-%m-%d %H:%M:%S.%f') AS end_ts,
      |  cast(e.rn - s.crn + 1 AS BIGINT) AS n_rows
      |FROM stopr s JOIN ev e ON e.user_id = s.user_id AND e.rn = s.stop_rn
      |WHERE e.event_type = 'purchase'
      |ORDER BY s.user_id, start_ts, end_ts""".stripMargin

  /** Fourth registered pattern, exercising the RELUCTANT star:
    * `signup (view|click|error|purchase)*? purchase` — signup to the
    * FIRST subsequent purchase, tolerating any non-signup noise
    * between (q101's greedy form resets on an intervening `error`;
    * this one rides through it). The star class deliberately CONTAINS
    * the terminator: under greedy rules that pattern is rejected
    * (restriction 3), under reluctance the successor wins every
    * overlapping row, so the star never actually consumes a purchase
    * and the match ends at the first one. The oracle replays the
    * resulting relational semantics: a signup matches iff its first
    * following row outside the consumable noise classes — i.e. the
    * first later `signup`-or-`purchase` row — is a purchase
    * (an intervening signup resets the attempt and starts its own,
    * exactly the single-pass restart rule).
    */
  def q121ReluctantFunnel(spark: SparkSession, dir: String): DataFrame =
    matchPattern(Tables.events(spark, dir),
      "signup (view|click|error|purchase)*? purchase")
      .select(col("user_id"),
        date_format(timestamp_micros(col("start_us")),
          "yyyy-MM-dd HH:mm:ss.SSSSSS").as("start_ts"),
        date_format(timestamp_micros(col("end_us")),
          "yyyy-MM-dd HH:mm:ss.SSSSSS").as("end_ts"),
        col("n_rows").cast("long").as("n_rows"))
      .orderBy(col("user_id"), col("start_ts"))

  /** Shared with the streaming twin (`stream_reluctant_funnel`), same
    * emitted-exactly-once argument as [[RowPatternOracle]].
    */
  private[graft] val ReluctantFunnelOracle: String =
    """WITH ev AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM events),
      |sig AS (SELECT user_id, rn AS srn, ts AS start_raw FROM ev
      |  WHERE event_type = 'signup'),
      |stopr AS (
      |  SELECT s.user_id, s.srn, s.start_raw, min(e.rn) AS stop_rn
      |  FROM sig s JOIN ev e ON e.user_id = s.user_id AND e.rn > s.srn
      |    AND e.event_type IN ('signup', 'purchase')
      |  GROUP BY 1, 2, 3)
      |SELECT n.user_id,
      |  strftime(n.start_raw, '%Y-%m-%d %H:%M:%S.%f') AS start_ts,
      |  strftime(e.ts, '%Y-%m-%d %H:%M:%S.%f') AS end_ts,
      |  cast(e.rn - n.srn + 1 AS BIGINT) AS n_rows
      |FROM stopr n JOIN ev e ON e.user_id = n.user_id AND e.rn = n.stop_rn
      |WHERE e.event_type = 'purchase'
      |ORDER BY n.user_id, start_ts""".stripMargin

  val registry: Seq[QueryDef] = Seq(
    QueryDef("q101_row_pattern", q101RowPattern _, RowPatternOracle),
    QueryDef("q105_click_burst", q105ClickBurst _, ClickBurstOracle),
    QueryDef("q106_click_trails", q106ClickTrails _, ClickTrailsOracle),
    QueryDef("q121_reluctant_funnel", q121ReluctantFunnel _,
      ReluctantFunnelOracle)
  )
}
