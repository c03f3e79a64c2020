package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line with per-query wall seconds at
  * SPARK_GRAFT_SF_DIR (default sf0.1).
  *
  * Methodology:
  *   - a warmup pass (flagship aggregate + one custom-expression query)
  *     pays JVM/classloading/codegen costs before any timer starts, so
  *     the first timed query isn't billed ~10 s of session warmup;
  *   - each query is forced through the `noop` sink, which evaluates
  *     every output row and column — `.count()` would let Catalyst prune
  *     projection-only queries down to a row count;
  *   - lane 1 (cold) is a single pass comparable to earlier rounds;
  *   - the warm lane is the MEDIAN of `SPARK_GRAFT_WARM_PASSES`
  *     (default 3) full passes: one warm sample at these scale factors
  *     is noise-prone, and a median cannot be skewed by a single loaded
  *     moment on the machine;
  *   - a failed query contributes NO timing anywhere (an early throw
  *     would masquerade as a fast run and deflate the totals); it is
  *     listed in the errors arrays and counted in n_failed, and totals
  *     are sums over successes only;
  *   - the FULL JSON (every query, both lanes) goes to the file named by
  *     SPARK_GRAFT_BENCH_OUT (default bench_out.json in the cwd);
  *     stdout gets a COMPACT one-line JSON — totals for both lanes plus
  *     a fixed headline-query subset — because the driver captures only
  *     the tail of the sbt log and a 110-query line overflows that
  *     window (BENCH_r03 "parsed": null was exactly this: the line's
  *     head was cut off, so it never parsed);
  *   - regression-gate priors live in bench_baseline.<sf>.json, written
  *     only by FULL-registry runs at that scale factor, so subset runs
  *     (SPARK_GRAFT_ONLY) and other-sf smokes never clobber them.
  */
object Bench {

  private[graft] def r3(v: Double): String = BigDecimal(v)
    .setScale(3, BigDecimal.RoundingMode.HALF_UP).toString

  /** The exact baseline-file shape [[main]] writes — serializer and
    * parser live side by side because the parser is a REGEX over this
    * one shape, not a JSON library ([[parseBaseline]] explains why that
    * is safe and where it must refuse).
    */
  private[graft] def baselineJson(sf: String, warm: Map[String, Double]): String = {
    val body = warm.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + r3(v) }.mkString(",")
    s"""{"sf":"$sf","queries_warm":{$body}}"""
  }

  /** Merge this run's warm medians into the baseline priors, PER-QUERY
    * MINIMA: the baseline means "best clean observation so far", so a
    * run on a loaded machine can never RAISE an entry and silently
    * loosen the next round's regression gate (round 7's driver bench
    * was ~1.26x machine-inflated and a last-run-wins merge rewrote 195
    * of 199 entries upward). A query that failed this run keeps its
    * prior (absence would exempt it from the next gate); queries no
    * longer in the registry drop out. Minima alone would make an
    * INTENTIONAL slowdown (e.g. verification work added by design) flag
    * forever, so `accept` names queries whose new median should be
    * taken as-is this run — set SPARK_GRAFT_BASELINE_ACCEPT to the
    * usual comma/prefix spec after deliberately re-pricing a query.
    * BenchBaselineSpec pins all four behaviors.
    */
  private[graft] def mergeBaseline(
      prevWarm: Map[String, Double],
      warm: Map[String, Double],
      registered: String => Boolean,
      accept: String => Boolean = _ => false): Map[String, Double] =
    (prevWarm ++ warm.map { case (k, v) =>
      k -> (if (accept(k)) v else math.min(prevWarm.getOrElse(k, v), v))
    }).filter { case (k, _) => registered(k) }

  /** Parse a baseline/bench JSON's warm medians. A regex, not a JSON
    * parser (no JSON library on the offline classpath) — sound ONLY
    * because [[baselineJson]] is the writer and emits a flat
    * string→number object. That coupling is the risk: a future nested
    * value would make `[^}]*` truncate at the first inner `}` and the
    * old code returned a silently-wrong/empty map, BLINDING the
    * regression gate (the round-5 failure mode, via the missing-file
    * path). So this parser REFUSES loudly instead: any `{` inside the
    * extracted body, a missing `queries_warm` key, or a body whose
    * entries don't all parse is an error, not an empty map. Absent FILE
    * = legitimately no prior (first run at an SF); absent/denatured
    * STRUCTURE = a bug that must not pass silently.
    * BenchBaselineSpec pins both directions.
    */
  private[graft] def parseBaseline(txt: String, sfDir: String): Map[String, Double] = {
    // only compare like with like: a prior at a different scale factor
    // would flag everything or nothing, both meaningless
    val prevSf = """"sf":"([^"]*)"""".r.findFirstMatchIn(txt).map(_.group(1))
    if (!prevSf.contains(sfDir)) Map.empty
    else {
      val obj = """"queries_warm":\{([^}]*)\}""".r
        .findFirstMatchIn(txt).map(_.group(1)).getOrElse(
          sys.error("baseline JSON has no queries_warm object — " +
            "refusing to run the regression gate blind"))
      if (obj.contains("{"))
        sys.error("baseline queries_warm is not a flat string->number " +
          "object — the regex parser cannot read nested JSON; fix the " +
          "writer/parser pair in graft.Bench together")
      val entries = """"([^"]+)":(-?[0-9][0-9.eE+-]*)""".r.findAllMatchIn(obj)
        .map(m => m.group(1) -> m.group(2).toDouble).toVector
      val segments = if (obj.trim.isEmpty) 0 else obj.split(",", -1).length
      if (entries.length != segments)
        sys.error(s"baseline queries_warm parsed ${entries.length} of " +
          s"$segments entries — malformed baseline; refusing to run the " +
          "regression gate against a partial prior")
      entries.toMap
    }
  }

  /** Machine-calibration probe: a fixed single-threaded integer loop,
    * timed. Recorded as `calib_ms` in every bench JSON so a cross-round
    * delta can be attributed — if calib shifted with the queries, the
    * machine changed, not the code (round 8: an all-lanes 1.5× shift
    * turned out to be a persistent VM-generation change; adjudicating
    * it required re-running old code because no calibration had been
    * recorded). JIT-warmed with one untimed pass; median of 3.
    */
  private[graft] def calibrate(): Double = {
    def pass(): Double = {
      val t0 = System.nanoTime()
      var x = 0L; var i = 0L
      while (i < 200_000_000L) { x += i * i; i += 1 }
      if (x == 42) System.err.println("") // defeat dead-code elimination
      (System.nanoTime() - t0) / 1e6
    }
    pass()
    val s = Seq(pass(), pass(), pass()).sorted
    BigDecimal(s(1)).setScale(1, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  /** Per-query JVM-cost snapshot for cold-lane attribution (see the
    * SPARK_GRAFT_BENCH_DIAG note in [[main]]). The cumulative counters
    * (gc/jit/codegen/classes) are recorded as per-query DELTAS; heap is
    * emitted as `heap_mb_after`, the ABSOLUTE post-query snapshot — a
    * heap delta without a forced GC is allocation noise, while the
    * snapshot sequence shows suite-long heap growth, which is what the
    * diag lane attributes.
    */
  private[graft] final case class JvmCosts(
      gcMs: Long, jitMs: Long, codegenCompiles: Long, classesLoaded: Long,
      heapUsedMb: Long, codeCacheMb: Long)

  private[graft] def jvmCosts(): JvmCosts = {
    import java.lang.management.ManagementFactory
    import scala.jdk.CollectionConverters._
    val gc = ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(b => math.max(0L, b.getCollectionTime)).sum
    val jit = Option(ManagementFactory.getCompilationMXBean)
      .filter(_.isCompilationTimeMonitoringSupported)
      .map(_.getTotalCompilationTime).getOrElse(0L)
    val cg = org.apache.spark.metrics.source.CodegenMetrics
      .METRIC_COMPILATION_TIME.getCount
    val cl = ManagementFactory.getClassLoadingMXBean.getTotalLoadedClassCount
    val heap = ManagementFactory.getMemoryMXBean.getHeapMemoryUsage.getUsed >> 20
    // JIT code cache occupancy ("CodeHeap 'non-profiled/profiled
    // nmethods'" + legacy unsegmented "CodeCache" pools): when this
    // approaches ReservedCodeCacheSize the JVM starts FLUSHING compiled
    // methods and the suite degrades into recompile storms — the r12
    // fingerprint (warm passes slower than cold, streaming hit hardest).
    val cc = ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(p => p.getName.contains("CodeHeap") || p.getName.contains("CodeCache"))
      .map(_.getUsage.getUsed).sum >> 20
    JvmCosts(gc, jit, cg, cl, heap, cc)
  }

  /** Cumulative (user, idle, steal) jiffies from /proc/stat — Linux
    * only, None elsewhere. Sampled at bench start and end: STEAL is the
    * one host-contention signal the in-JVM calibration probe cannot
    * see (calib runs single-threaded at a quiet instant; steal bursts
    * land mid-pass and inflate individual lanes 10-100× — the r13
    * "contention ghost" mechanism, finally measurable in the artifact).
    */
  private[graft] def cpuJiffies(): Option[(Long, Long, Long)] =
    try {
      val l = scala.io.Source.fromFile("/proc/stat").getLines()
        .find(_.startsWith("cpu ")).get.trim.split("\\s+")
      Some((l(1).toLong, l(4).toLong, l(8).toLong))
    } catch { case _: Throwable => None }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // default 1 warm pass since round 13: at 262 lanes the median-of-3
    // methodology (right at 110 lanes) no longer fits the driver's
    // bench timeout — r12's driver run was killed at rc=124 with no
    // number produced, strictly worse than a noisier number. Single-
    // sample noise is handled downstream instead: the baseline merge is
    // per-query minima (a noisy-high sample can never loosen the gate)
    // and the top regression flags are auto-adjudicated with isolated
    // extra passes at the end of the run (below). Pricing runs that
    // want the old median set SPARK_GRAFT_WARM_PASSES=3 explicitly.
    val warmPasses = sys.env.get("SPARK_GRAFT_WARM_PASSES")
      .flatMap(s => scala.util.Try(s.trim.toInt).toOption.orElse {
        System.err.println(
          s"[bench] ignoring unparseable SPARK_GRAFT_WARM_PASSES='$s', using 1")
        None
      }).map(math.max(1, _)).getOrElse(1)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    // optional comma-separated subset (prefix match with a trailing '*'),
    // e.g. SPARK_GRAFT_ONLY='stream_*' to time the streaming family in
    // isolation — used to adjudicate whether a cross-round delta is a
    // plan regression or machine-load noise from the other ~120 lanes
    val onlyFilter = SparkEntry.onlyFilter(sys.env.get("SPARK_GRAFT_ONLY"))
    val benchQueries = SparkEntry.queries.filter { case (n, _) => onlyFilter(n) }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // the default 100-entry codegen class cache thrashes under a
      // 219-query workload: the r10 diag lane measured ~4,050 Janino
      // compiles in EVERY pass, warm included — driver-thread time paid
      // serially inside each query. 8192 holds the whole suite's
      // generated classes (~4k), so warm passes compile ~nothing. The
      // same sizing applies to any long-lived production driver running
      // a wide query mix (static conf — must be set before the session
      // exists; metaspace cost is a few KB per cached class).
      .config("spark.sql.codegen.cache.maxEntries", "8192")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warmup: flagship agg + custom-expression path (not timed)
    try {
      force(Queries.q1PricingSummary(spark, sfDir))
      force(SparkEntry.queries("sim_topk_bruteforce")(spark, sfDir))
    } catch { case _: Throwable => () }

    // SPARK_GRAFT_BENCH_DIAG=1: record per-query JVM-cost deltas (GC ms,
    // JIT ms, codegen compile count, classes loaded, heap) in EVERY lane
    // to bench_diag.json — the attribution instrument for cold-vs-warm
    // deltas that per-query wall time alone cannot explain (round 9's
    // +75% cold-only inflation). Off by default: reading MXBeans per
    // query is cheap but the diag file is ~100 KB of nobody's business
    // on a normal run.
    val diagOn = sys.env.get("SPARK_GRAFT_BENCH_DIAG").exists(_.nonEmpty)
    val diag = scala.collection.mutable.ListBuffer.empty[String]

    // TIME BUDGET (r13): r12's driver bench was killed at its timeout
    // with NO number produced — strictly worse than a partial number.
    // The guard stops a pass when the elapsed wall crosses the pass's
    // share of the budget (cold 45%, warm 90%: the warm lane is the
    // graded one, so it gets the protected tail) and lists the skipped
    // lanes explicitly — a skipped lane keeps its baseline prior and is
    // excluded from totals, and "budget_exceeded":true marks the totals
    // as partial so a cross-round comparison can't misread them as a
    // fast round. Sized so budget + sbt/session overhead stays inside
    // the driver's observed completions (r9 ran 1184 s total, rc=0).
    val budgetS = sys.env.get("SPARK_GRAFT_TIME_BUDGET_S")
      .flatMap(s => scala.util.Try(s.trim.toDouble).toOption)
      .filter(_ > 0).getOrElse(1020.0)
    val tStart = System.nanoTime()
    def elapsedS: Double = (System.nanoTime() - tStart) / 1e9
    val jiffies0 = cpuJiffies()
    val skippedCold = scala.collection.mutable.ListBuffer.empty[String]
    val skippedWarm = scala.collection.mutable.ListBuffer.empty[String]

    // one pass = per-query seconds for SUCCESSFUL queries only; failures
    // go to `errors` (tagged with the pass) and contribute no timing
    def pass(tag: String,
        errors: scala.collection.mutable.ListBuffer[String],
        deadlineS: Double = Double.MaxValue,
        skipped: scala.collection.mutable.ListBuffer[String] = null)
        : Map[String, Double] = benchQueries.flatMap { case (name, fn) =>
      if (elapsedS > deadlineS) {
        if (skipped != null && !skipped.contains(name)) skipped += name
        None
      } else {
      val before = if (diagOn) Some(jvmCosts()) else None
      val t0 = System.nanoTime()
      try {
        force(fn(spark, sfDir))
        val sec = (System.nanoTime() - t0) / 1e9
        before.foreach { b =>
          val a = jvmCosts()
          diag += s"""{"q":"$name","lane":"$tag","sec":${r3(sec)},""" +
            s""""gc_ms":${a.gcMs - b.gcMs},"jit_ms":${a.jitMs - b.jitMs},""" +
            s""""codegen":${a.codegenCompiles - b.codegenCompiles},""" +
            s""""classes":${a.classesLoaded - b.classesLoaded},""" +
            s""""heap_mb_after":${a.heapUsedMb},"codecache_mb_after":${a.codeCacheMb}}"""
        }
        Some(name -> sec)
      } catch { case e: Throwable =>
        errors += name
        System.err.println(s"[bench:$tag] $name failed: ${e.getMessage}")
        None
      }
      }
    }

    val errCold = scala.collection.mutable.ListBuffer.empty[String]
    val errWarm = scala.collection.mutable.ListBuffer.empty[String]
    // lane 1: first run after session warmup (comparable to round 1)
    val results = pass("cold", errCold, 0.45 * budgetS, skippedCold)
    // warm lane: median over warmPasses full passes — steady state with
    // single-sample noise (GC pauses, machine load spikes) removed
    val warmSamples = (1 to warmPasses).map(i =>
      pass(s"warm$i", errWarm, 0.90 * budgetS, skippedWarm))
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    // a query only gets a warm median if it succeeded in EVERY warm pass
    // (partial samples would mix real timings with rethrow latencies)
    val warm: Map[String, Double] = benchQueries.keys.toSeq
      .flatMap { name =>
        val samples = warmSamples.flatMap(_.get(name))
        if (samples.length == warmPasses) Some(name -> median(samples)) else None
      }.toMap

    val calibMs = calibrate()
    // whole-run host-contention summary: steal share of non-idle time
    val stealPct: Double = (for {
      (u0, i0, s0) <- jiffies0; (u1, i1, s1) <- cpuJiffies()
      busy = (u1 - u0) + (s1 - s0) if busy > 0
    } yield 100.0 * (s1 - s0) / busy).getOrElse(-1.0)

    if (diagOn) try {
      java.nio.file.Files.write(java.nio.file.Paths.get("bench_diag.json"),
        (diag.mkString("[\n", ",\n", "\n]") + "\n").getBytes("UTF-8"))
      System.err.println("[bench] wrote bench_diag.json")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write bench_diag.json: ${e.getMessage}")
    }

    // regression gate: read the previous warm medians and flag any query
    // whose warm median grew >1.5x round-over-round. Sub-50ms priors are
    // skipped (pure scheduling noise at that scale). Priors live in a
    // PER-SCALE-FACTOR baseline file that only FULL-registry runs
    // update, so neither a SPARK_GRAFT_ONLY subset run nor a local
    // sf0.01 smoke before the driver's sf0.1 round can clobber the
    // baseline the next full run diffs against (bench_out.json itself
    // is always the LATEST run, whatever its scope).
    val baselinePath = s"bench_baseline.${new java.io.File(sfDir).getName}.json"
    val subsetRun = sys.env.contains("SPARK_GRAFT_ONLY")
    // a missing FILE is a legitimate no-prior (first run at this SF);
    // a file that exists but doesn't parse must FAIL the bench loudly —
    // see parseBaseline
    def readWarm(path: String): Map[String, Double] = {
      val p = java.nio.file.Paths.get(path)
      if (!java.nio.file.Files.exists(p)) Map.empty
      else parseBaseline(
        new String(java.nio.file.Files.readAllBytes(p), "UTF-8"), sfDir)
    }
    val prevWarm: Map[String, Double] = {
      val b = readWarm(baselinePath)
      if (b.nonEmpty) b else readWarm(outPath) // pre-baseline-file migration
    }
    // a query with a prior that FAILED this run is the worst regression
    // of all — round 5's 35 events-schema failures reported
    // "regressions":[] precisely because failures were exempt. Internally
    // ratio = ∞ so they sort first; in the JSON they carry "failed":true
    // with the numeric sentinel ratio -1 (every "ratio" stays a number —
    // a consumer sorting or thresholding ratios must not hit a string).
    val failedWithPrior: Seq[(String, Double, Double, Double)] =
      (errCold ++ errWarm).distinct.toSeq.sorted.flatMap { name =>
        prevWarm.get(name).map(p => (name, p, -1.0, Double.PositiveInfinity))
      }
    val regressions: Seq[(String, Double, Double, Double)] =
      failedWithPrior ++ warm.toSeq.flatMap { case (name, v) =>
        prevWarm.get(name).filter(p => p > 0.05 && v / p > 1.5)
          .map(p => (name, p, v, v / p))
      }.sortBy(-_._4)
    // AUTO-ADJUDICATION (r13): the top non-failed flags get 3 extra
    // ISOLATED passes right here, while the JVM is at its warmest —
    // r12 lost adjudication time to two pure contention ghosts
    // (q112_k_anonymity flagged 18.2×, measured 1.55× in isolation;
    // q97_rolling_median 4.3× → 1.04×) because a one-sample flag on a
    // loaded moment is indistinguishable from a plan regression without
    // a re-run. The drill is bounded: 3 lanes × 3 passes, skipping
    // lanes whose prior already exceeds 10 s (re-running a heavy lane
    // could cost more than the adjudication is worth). `iso_ratio` ≈ 1
    // in the emitted JSON = ghost; `iso_ratio` ≈ `ratio` = real.
    val adjud: Map[String, Double] = (
      if (elapsedS > 0.90 * budgetS) Nil else regressions
        .filter(r => !r._4.isInfinity && r._2 <= 10.0).take(3))
      .flatMap { case (name, p, _, _) =>
        val samples = (1 to 3).flatMap { _ =>
          val t0 = System.nanoTime()
          try { force(benchQueries(name)(spark, sfDir))
            Some((System.nanoTime() - t0) / 1e9)
          } catch { case _: Throwable => None }
        }
        if (samples.isEmpty) None else {
          val m = median(samples)
          System.err.println(
            f"[bench:adjudicate] $name prev=${p}%.2fs iso-median=${m}%.2fs " +
              f"(${m / p}%.2fx isolated)")
          Some(name -> m)
        }
      }.toMap
    def regEntry(n: String, p: Double, v: Double, r: Double): String =
      if (r.isInfinity)
        s"""{"q":"$n","prev":${r3(p)},"now":null,"ratio":-1,"failed":true}"""
      else {
        val iso = adjud.get(n).map(m =>
          s""","iso_now":${r3(m)},"iso_ratio":${r3(m / p)}""").getOrElse("")
        s"""{"q":"$n","prev":${r3(p)},"now":${r3(v)},"ratio":${r3(r)},"failed":false$iso}"""
      }
    val regJson = regressions.map((regEntry _).tupled).mkString("[", ",", "]")
    if (regressions.nonEmpty) regressions.foreach { case (n, p, v, r) =>
      if (r.isInfinity)
        System.err.println(f"[bench:regression] $n warm ${p}%.2fs -> FAILED")
      else
        System.err.println(f"[bench:regression] $n warm ${p}%.2fs -> ${v}%.2fs (${r}%.2fx)")
    }
    def fmt(m: Map[String, Double], keys: Iterable[String]) =
      keys.flatMap(k => m.get(k).map(v => "\"" + k + "\":" + r3(v)))
        .mkString("{", ",", "}")
    def fmtE(e: Seq[String]) = e.map("\"" + _ + "\"").mkString("[", ",", "]")
    val failed = (errCold ++ errWarm).distinct.toSeq
    val skipped = (skippedCold ++ skippedWarm).distinct.toSeq.sorted
    val budgetExceeded = skipped.nonEmpty
    if (budgetExceeded) System.err.println(
      f"[bench:budget] exceeded ${budgetS}%.0f s budget — skipped " +
        s"${skippedCold.size} cold / ${skippedWarm.size} warm lanes " +
        "(totals are PARTIAL; skipped lanes keep their baseline priors)")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val totalWarm = if (warm.nonEmpty) warm.values.sum else 0.0
    // per-tier sub-budget: the stateful-streaming lanes pay seconds of
    // fixed micro-batch cost per pass (state-store commits + per-batch
    // codegen/JIT that no cache can absorb — the watermark literal
    // changes every batch, so generated source never repeats), so this
    // tier dominates timeout risk; surfacing its share at close makes
    // the next r12-style budget overrun visible BEFORE a driver kill
    val streamCold = results.collect {
      case (n, v) if n.startsWith("stream_") => v }.sum
    val streamWarm = warm.collect {
      case (n, v) if n.startsWith("stream_") => v }.sum
    // full detail (every query, both lanes) — file only
    val fullJson =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":${fmt(results, results.keys)},"total_warm":$totalWarm,"queries_warm":${fmt(warm, warm.keys)},"tier_stream_cold":${r3(streamCold)},"tier_stream_warm":${r3(streamWarm)},"warm_passes":$warmPasses,"calib_ms":$calibMs,"steal_pct":${r3(stealPct)},"n_queries":${benchQueries.size},"n_failed":${failed.length},"errors":${fmtE(failed)},"errors_cold":${fmtE(errCold.distinct.toSeq)},"errors_warm":${fmtE(errWarm.distinct.toSeq)},"budget_s":${r3(budgetS)},"budget_exceeded":$budgetExceeded,"n_skipped":${skipped.length},"skipped":${fmtE(skipped)},"regressions":$regJson,"sf":"$sfDir"}"""
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
        (fullJson + "\n").getBytes("UTF-8"))
      System.err.println(s"[bench] wrote $outPath")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }
    // baseline update: full-registry runs only; a query that FAILED this
    // run keeps its prior median (absence would silently exempt it from
    // the next gate); entries for queries no longer registered drop out.
    // The merge is PER-QUERY MINIMA, not last-run-wins: the baseline is
    // "best clean observation so far", so one bench run on a loaded
    // machine cannot loosen the regression gate for the next round
    // (round 7's driver run was ~1.26x inflated across all lanes and a
    // last-run-wins merge rewrote 195 of 199 entries upward).
    if (!subsetRun) try {
      val acceptFn = SparkEntry.onlyFilter(Some(
        sys.env.getOrElse("SPARK_GRAFT_BASELINE_ACCEPT", "")))
      // an ACCEPTED lane re-prices to the min across ALL of this run's
      // samples (cold + every warm pass), not the warm median alone: a
      // host-side VM pause inflates ONE sample by 10-100×, and two
      // consecutive r13 accept attempts shipped 27 s / 53 s "baselines"
      // for lanes that measure 2-10 s because the pause landed on the
      // only warm pass. The min across ≥2 samples survives any single
      // pause; only a lane stalled in EVERY pass can still re-price
      // high, and that is indistinguishable from a real cost.
      val acceptWarm = warm.map { case (k, v) =>
        k -> (if (!acceptFn(k)) v else
          (results.get(k).toSeq ++ warmSamples.flatMap(_.get(k)) :+ v).min)
      }
      val merged = mergeBaseline(prevWarm, acceptWarm, benchQueries.contains,
        acceptFn)
      val bj = baselineJson(sfDir, merged)
      java.nio.file.Files.write(java.nio.file.Paths.get(baselinePath),
        (bj + "\n").getBytes("UTF-8"))
      System.err.println(s"[bench] wrote $baselinePath")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $baselinePath: ${e.getMessage}")
    }
    // compact headline line — the only stdout JSON, sized to survive the
    // driver's log-tail capture (full detail lives in `outPath`)
    val headline = Seq(
      "q1_agg", "q3_star_join", "q18_asof_join", "q28_window_analytic",
      "wordcount_reference", "dedup_exact", "dedup_minhash_lsh",
      "dedup_survivors", "sim_topk_bruteforce", "pipeline_corpus_build",
      "pipeline_pack_sequences", "stream_stream_join",
      "q101_row_pattern", "stream_row_pattern")
    // stdout carries at most the 10 worst regressions (full list in file)
    // so the line stays inside the driver's log-tail window
    val regJsonCompact = regressions.take(10).map((regEntry _).tupled)
      .mkString("[", ",", "]")
    val json =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":${fmt(results, headline)},"total_warm":${r3(totalWarm)},"queries_warm":${fmt(warm, headline)},"tier_stream_cold":${r3(streamCold)},"tier_stream_warm":${r3(streamWarm)},"warm_passes":$warmPasses,"calib_ms":$calibMs,"steal_pct":${r3(stealPct)},"n_queries":${benchQueries.size},"n_failed":${failed.length},"errors":${fmtE(failed)},"budget_exceeded":$budgetExceeded,"n_skipped":${skipped.length},"regressions":$regJsonCompact,"n_regressions":${regressions.length},"detail":"$outPath","sf":"$sfDir"}"""
    println(json)
    spark.stop()
    // re-printed AFTER spark.stop(): the driver keeps only the TAIL of
    // the sbt log, and session shutdown emits enough WARN lines to push
    // a pre-stop println out of that window — BENCH_r11 returned rc=0
    // yet "parsed": null for exactly this reason. Last line wins.
    println(json)
  }
}
