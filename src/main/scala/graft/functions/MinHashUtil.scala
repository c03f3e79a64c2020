package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** MinHash kernel — standalone object for Janino-friendly static calls
  * from generated code (same pattern as [[SimHashUtil]]).
  *
  * 32 universal hashes h_i(x) = (a_i·x + b_i) mod P over the low 32 bits
  * of FNV-1a(token); a_i < 2^30 keeps a_i·x < 2^62 (no overflow), P is a
  * prime > 2^32. Parameters come from a fixed seed so signatures are
  * stable across runs, partitions, and cluster sizes.
  */
object MinHashUtil {
  val NumHashes = 32
  val P: Long = 4294967311L

  val A: Array[Long] = {
    val rnd = new scala.util.Random(7)
    Array.fill(NumHashes)(rnd.nextInt(1 << 30).toLong + 1)
  }
  val B: Array[Long] = {
    val rnd = new scala.util.Random(13)
    Array.fill(NumHashes)(math.abs(rnd.nextLong()) % P)
  }

  /** All 32 minhashes in one pass; empty input → P sentinels. */
  def signature(arr: ArrayData): Array[Long] = {
    val mins = Array.fill(NumHashes)(P)
    val n = arr.numElements()
    var t = 0
    while (t < n) {
      if (!arr.isNullAt(t)) {
        val x = SimHashUtil.fnv1a64(arr.getUTF8String(t)) & 0xffffffffL
        var i = 0
        while (i < NumHashes) {
          val v = (A(i) * x + B(i)) % P
          if (v < mins(i)) mins(i) = v
          i += 1
        }
      }
      t += 1
    }
    mins
  }
}
