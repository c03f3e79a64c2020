package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** KLL-style mergeable quantile sketch over longs — the streaming/
  * distributed quantile summary (Karnin–Lang–Liberty shape): a stack of
  * capacity-[[KllSketch.K]] buffers where level i items carry weight
  * 2^i; a full buffer sorts and promotes every second item one level up
  * ("compaction"). DETERMINISTIC compaction parity (a per-level bit
  * flipped on each compaction, not a coin toss) — successive
  * compactions of a level cancel each other's rank drift, and the
  * whole pipeline stays replayable for a fixed stream order. Merge is
  * level-wise concatenation + compaction cascade, so the sketch runs
  * through Spark's ordinary two-phase aggregation (partials on
  * executors, one final merge) with bounded state:
  * K·levels ≈ K·log₂(n/K) longs ≪ n.
  *
  * Under Spark's nondeterministic partial-merge order the estimates can
  * vary run to run WITHIN the error bound, so (exact-bracket idiom,
  * COVERAGE.md) queries never expose raw estimates to the hash oracle —
  * only exact values plus a boolean pinning the estimate inside its
  * bracket. Measured worst rank error on the real lineitem price column
  * across random 32-partition merge orders: 0.33 % at sf0.01, 0.57 % at
  * sf0.1 (K = 512) — a ±5 % bracket has ~9× margin.
  *
  * The reference has no aggregation surface beyond int-sum
  * (reference: user/UserDefinedFunctions.scala:21-27).
  */
object KllSketch {

  /** Per-level buffer capacity. Error ∝ 1/K; K=512 measured ≤0.6 % rank
    * error at the gate SFs (see scaladoc).
    */
  val K = 512

  /** One level: a growable primitive array (no boxing in the hot path). */
  final case class Level(var a: Array[Long], var n: Int) {
    def add(v: Long): Unit = {
      if (n == a.length) a = java.util.Arrays.copyOf(a, a.length * 2)
      a(n) = v
      n += 1
    }
  }

  /** Sketch state: levels (index = log₂ weight) + the per-level
    * compaction-parity bitmask.
    */
  final case class Buf(var levels: Array[Level], var parity: Int)

  def empty: Buf = Buf(Array(Level(new Array[Long](K), 0)), 0)

  def add(b: Buf, v: Long): Unit = {
    b.levels(0).add(v)
    if (b.levels(0).n >= K) compact(b)
  }

  /** Cascade: any level at/over capacity sorts, promotes alternate items
    * (starting at this level's parity bit) one level up, flips its
    * parity, and empties. A promotion can fill the level above, which
    * the same sweep then compacts.
    */
  private def compact(b: Buf): Unit = {
    var i = 0
    while (i < b.levels.length) {
      val lv = b.levels(i)
      if (lv.n >= K) {
        java.util.Arrays.sort(lv.a, 0, lv.n)
        val off = (b.parity >> i) & 1
        b.parity ^= 1 << i
        if (i + 1 == b.levels.length)
          b.levels = b.levels :+ Level(new Array[Long](K), 0)
        val up = b.levels(i + 1)
        var j = off
        while (j < lv.n) { up.add(lv.a(j)); j += 2 }
        lv.n = 0
      }
      i += 1
    }
  }

  /** Level-wise concatenation, then one compaction cascade. Mutates and
    * returns `a`.
    */
  def merge(a: Buf, b: Buf): Buf = {
    var i = 0
    while (i < b.levels.length) {
      if (i == a.levels.length)
        a.levels = a.levels :+ Level(new Array[Long](K), 0)
      val src = b.levels(i)
      var j = 0
      while (j < src.n) { a.levels(i).add(src.a(j)); j += 1 }
      i += 1
    }
    compact(a)
    a
  }

  /** Weighted-rank quantile estimates: all retained items sorted by
    * value, cumulative weight walked to ⌈p·W⌉ for each p. One
    * driver-side sort of ≤ K·levels items — bounded state by
    * construction. r15: primitive dual-array sort instead of an
    * ArrayBuffer of boxed tuples — the q97b window calls this once per
    * output row, and 4.5M boxed (Long, Long) allocations per lane were
    * measurable GC churn. Ties need no stable order: equal values give
    * the same output wherever the cumulative walk crosses the target.
    */
  def quantiles(b: Buf, ps: Array[Double]): Array[Long] = {
    var total0 = 0
    var i = 0
    while (i < b.levels.length) { total0 += b.levels(i).n; i += 1 }
    if (total0 == 0) return ps.map(_ => 0L)
    val vals = new Array[Long](total0)
    val wts = new Array[Long](total0)
    var k0 = 0
    i = 0
    while (i < b.levels.length) {
      val w = 1L << i
      val lv = b.levels(i)
      var j = 0
      while (j < lv.n) { vals(k0) = lv.a(j); wts(k0) = w; k0 += 1; j += 1 }
      i += 1
    }
    dualSort(vals, wts, 0, total0 - 1)
    var total = 0L
    i = 0
    while (i < total0) { total += wts(i); i += 1 }
    ps.map { p =>
      val tgt = p * total
      var cum = 0L
      var k = 0
      var out = vals(total0 - 1)
      var found = false
      while (k < total0 && !found) {
        cum += wts(k)
        if (cum >= tgt) { out = vals(k); found = true }
        k += 1
      }
      out
    }
  }

  /** In-place quicksort of `vals(lo..hi)` with `wts` permuted alongside
    * (median-of-three pivot, insertion sort under 16). Unstable, which
    * [[quantiles]] tolerates by construction.
    */
  private def dualSort(vals: Array[Long], wts: Array[Long],
      lo0: Int, hi0: Int): Unit = {
    @inline def swap(i: Int, j: Int): Unit = {
      val tv = vals(i); vals(i) = vals(j); vals(j) = tv
      val tw = wts(i); wts(i) = wts(j); wts(j) = tw
    }
    var stack = List((lo0, hi0))
    while (stack.nonEmpty) {
      val (lo, hi) = stack.head
      stack = stack.tail
      if (hi - lo < 16) {
        var i = lo + 1
        while (i <= hi) {
          val v = vals(i); val w = wts(i)
          var j = i - 1
          while (j >= lo && vals(j) > v) {
            vals(j + 1) = vals(j); wts(j + 1) = wts(j); j -= 1
          }
          vals(j + 1) = v; wts(j + 1) = w
          i += 1
        }
      } else {
        val mid = lo + (hi - lo) / 2
        if (vals(mid) < vals(lo)) swap(mid, lo)
        if (vals(hi) < vals(lo)) swap(hi, lo)
        if (vals(hi) < vals(mid)) swap(hi, mid)
        val pivot = vals(mid)
        var i = lo
        var j = hi
        while (i <= j) {
          while (vals(i) < pivot) i += 1
          while (vals(j) > pivot) j -= 1
          if (i <= j) { swap(i, j); i += 1; j -= 1 }
        }
        if (lo < j) stack = (lo, j) :: stack
        if (i < hi) stack = (i, hi) :: stack
      }
    }
  }

  /** The sketch as a typed Aggregator: Long column in, the quantile
    * estimates for [[Ps]] out.
    */
  val Ps: Array[Double] = Array(0.25, 0.5, 0.75, 0.9, 0.99)

  /** The sketch as a PARTIAL-valued Aggregator (finish returns the
    * sketch itself) — what a streaming deployment ships per micro-batch
    * so the cross-batch combine is the real [[merge]] law (the KLL twin
    * of `MisraGriesMapAgg`). Used by `stream_kll_quantiles`.
    */
  class KllBufAgg extends Aggregator[Long, Buf, Buf] {
    override def zero: Buf = empty
    override def reduce(b: Buf, v: Long): Buf = { add(b, v); b }
    override def merge(a: Buf, b: Buf): Buf = KllSketch.merge(a, b)
    override def finish(b: Buf): Buf = b
    override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
    override def outputEncoder: Encoder[Buf] = Encoders.kryo[Buf]
  }

  class KllAgg extends Aggregator[Long, Buf, Array[Long]] {
    override def zero: Buf = empty
    override def reduce(b: Buf, v: Long): Buf = { add(b, v); b }
    override def merge(a: Buf, b: Buf): Buf = KllSketch.merge(a, b)
    override def finish(b: Buf): Array[Long] = quantiles(b, Ps)
    override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
    override def outputEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
  }

  /** Flat long encoding of a sketch — [parity, nLevels, (n_i, items_i…)
    * per level] — so a GROUPED aggregation can emit the partial as a
    * plain `array<bigint>` column that a later window/merge step reads
    * back without kryo (the q97b windowed-median flip needs sketch
    * partials as first-class column values).
    */
  def toLongs(b: Buf): Array[Long] = {
    var sz = 2
    b.levels.foreach(l => sz += 1 + l.n)
    val out = new Array[Long](sz)
    out(0) = b.parity.toLong
    out(1) = b.levels.length.toLong
    var i = 2
    b.levels.foreach { l =>
      out(i) = l.n.toLong
      i += 1
      System.arraycopy(l.a, 0, out, i, l.n)
      i += l.n
    }
    out
  }

  def fromLongs(a: Array[Long]): Buf = {
    val parity = a(0).toInt
    val nl = a(1).toInt
    var i = 2
    // capacity = max(n, 8), not K: Level.add grows by doubling, so a
    // small initial capacity only costs a copy if the level actually
    // fills — while the old flat K=512 allocation per level per sketch
    // made the q97b per-row 31-sketch merge allocate ~127 KB of zeroed
    // longs per OUTPUT ROW (measured 2.3 s of the lane's 6.2 s)
    val levels = Array.fill(nl) {
      val n = a(i).toInt
      i += 1
      val arr = new Array[Long](math.max(n, 8))
      System.arraycopy(a, i, arr, 0, n)
      i += n
      Level(arr, n)
    }
    Buf(levels, parity)
  }

  /** Merge a FLAT-encoded sketch (the [[toLongs]] layout) directly into
    * `a` — byte-for-byte the same level-wise concatenation +
    * single-compaction law as `merge(a, fromLongs(flat))`, with no
    * intermediate Level allocations. The hot path of the q97b windowed
    * merge (≤31 flat sketches per output row).
    */
  def mergeLongs(a: Buf, flat: Array[Long]): Buf = {
    val nl = flat(1).toInt
    var i = 0
    var p = 2
    while (i < nl) {
      if (i == a.levels.length)
        a.levels = a.levels :+ Level(new Array[Long](K), 0)
      val n = flat(p).toInt
      p += 1
      val dst = a.levels(i)
      var j = 0
      while (j < n) { dst.add(flat(p + j)); j += 1 }
      p += n
      i += 1
    }
    compact(a)
    a
  }

  /** Per-group partial sketch as `array<bigint>` (see [[toLongs]]) —
    * the grouped-aggregation form [[KllBufAgg]]'s kryo buffer can't
    * provide.
    */
  class KllLongsAgg extends Aggregator[Long, Buf, Array[Long]] {
    override def zero: Buf = empty
    override def reduce(b: Buf, v: Long): Buf = { add(b, v); b }
    override def merge(a: Buf, b: Buf): Buf = KllSketch.merge(a, b)
    override def finish(b: Buf): Array[Long] = toLongs(b)
    override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
    override def outputEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
  }
}
