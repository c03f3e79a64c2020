package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the r15 bench watchdog (Bench.underWatchdog): one host pause
  * stranding one lane must not eat the budget 50 other lanes needed
  * (r14 driver run: sim_ann_ivf burned 83.9 s — 8% of the whole
  * budget — on a 0.505 s prior). Three directions matter:
  *   1. cancel: a Spark job running past the cap is killed close to
  *      the cap (not at its natural end) and comes back Left with
  *      fired=true — the caller's "capped, no sample" classification;
  *   2. no false cancel: a fast body completes Right with fired=false
  *      and its elapsed time intact;
  *   3. error attribution: a body that throws on its own (before the
  *      cap) is Left with fired=false — a query error, not a cap.
  */
class BenchWatchdogSpec extends AnyFunSuite with SparkTestBase {

  private def newExec() = java.util.concurrent.Executors
    .newSingleThreadScheduledExecutor(r => {
      val t = new Thread(r, "test-watchdog"); t.setDaemon(true); t
    })

  test("a job running past the cap is cancelled near the cap, fired=true") {
    val exec = newExec()
    try {
      // 4 tasks × 30 s sleep on local[4]: ~30 s natural runtime, cap 2 s.
      // Thread.sleep is interruptible, so interruptOnCancel kills the
      // task threads promptly and force() throws a cancellation error.
      val t0 = System.nanoTime()
      val (res, fired) = Bench.underWatchdog(
        spark.sparkContext, exec, "wd_cancel", 2.0) {
        spark.range(4).repartition(4).foreachPartition {
          (_: Iterator[java.lang.Long]) => Thread.sleep(30000)
        }
      }
      val wallS = (System.nanoTime() - t0) / 1e9
      assert(fired, "watchdog timer must have fired")
      assert(res.isLeft, s"cancelled job must surface as Left, got $res")
      // bound generous enough for a contended epoch (a 90%-steal host
      // measured 18 s wall for the ~2 s cancel path: planning + session
      // init stretch under steal) while still strictly separating from
      // the ≥30 s natural end the sleeps would impose
      assert(wallS < 25.0,
        f"cancel must land near the 2 s cap, not the 30 s natural end " +
          f"(took $wallS%.1f s)")
    } finally exec.shutdownNow()
  }

  test("a fast body completes under the cap: Right(elapsed), fired=false") {
    val exec = newExec()
    try {
      val (res, fired) = Bench.underWatchdog(
        spark.sparkContext, exec, "wd_fast", 30.0) {
        assert(spark.range(1000).count() === 1000L)
      }
      assert(!fired)
      assert(res.isRight && res.toOption.get >= 0.0)
    } finally exec.shutdownNow()
  }

  test("a body throwing on its own is Left with fired=false (query error)") {
    val exec = newExec()
    try {
      val (res, fired) = Bench.underWatchdog(
        spark.sparkContext, exec, "wd_err", 30.0) {
        sys.error("genuine query failure")
      }
      assert(!fired)
      assert(res.isLeft &&
        res.swap.toOption.get.getMessage.contains("genuine query failure"))
    } finally exec.shutdownNow()
  }
}
