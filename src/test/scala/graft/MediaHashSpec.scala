package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{MediaHash, MediaHeaders}
import graft.operators.Multimodal

/** Pins the perceptual average-hash: the bit law itself on hand-built
  * pixel arrays, invariance/sensitivity properties, the BMP-offset
  * handling, and the ranked candidate query's end-to-end invariants
  * (beyond the DuckDB hash oracle).
  */
class MediaHashSpec extends AnyFunSuite with SparkTestBase {

  private def bmp(pixels: Array[Byte]): Array[Byte] =
    MediaHeaders.bmpWrap(pixels, 8, 8)

  test("bit law: block means strictly above the global mean set bits") {
    // 64 bytes = one byte per block; global mean of 0..63-ish pattern
    val p = Array.tabulate(64)(i => i.toByte)
    val h = MediaHash.aHash64(bmp(p))
    // mean of 0..63 is 31.5 ⇒ bits 32..63 set, 0..31 clear
    (0 until 64).foreach { i =>
      assert(((h >>> i) & 1L) === (if (i >= 32) 1L else 0L), s"bit $i")
    }
  }

  test("identical pixel arrays hash identically; a byte flip is local") {
    val p = Array.tabulate(1024)(i => ((i * 37 + 11) % 251).toByte)
    val a = MediaHash.aHash64(bmp(p))
    assert(a === MediaHash.aHash64(bmp(p.clone())))
    // flipping one byte can only move blocks whose mean relation to the
    // (slightly shifted) global mean changes — measured, it stays small
    val q = p.clone(); q(500) = (q(500) ^ 0x7f).toByte
    val b = MediaHash.aHash64(bmp(q))
    assert(java.lang.Long.bitCount(a ^ b) <= 8)
  }

  test("hash reads bfOffBits, not an assumed 54") {
    // same pixels behind a padded header (bfOffBits = 60) must hash
    // identically to the standard container
    val p = Array.tabulate(256)(i => (i % 97).toByte)
    val std = bmp(p)
    val padded = new Array[Byte](std.length + 6)
    System.arraycopy(std, 0, padded, 0, 54)
    System.arraycopy(p, 0, padded, 60, p.length)
    // patch bfOffBits (LE int at 10) to 60
    padded(10) = 60
    assert(MediaHash.isBmp(padded))
    assert(MediaHash.aHash64(padded) === MediaHash.aHash64(std))
  }

  test("hash caps its input: bytes past MaxHashBytes cannot affect it") {
    // the downsample step doubles as the Long-overflow guard (the bit
    // rule cross-multiplies ~4n^2); two payloads differing only beyond
    // the cap must hash identically
    val n = MediaHash.MaxHashBytes + 4096
    val p = Array.tabulate(n)(i => ((i * 31 + 7) % 251).toByte)
    val q = p.clone()
    q(MediaHash.MaxHashBytes + 100) = 0x55
    assert(MediaHash.aHash64(bmp(p)) === MediaHash.aHash64(bmp(q)))
  }

  test("non-BMP and truncated payloads are rejected, not hashed") {
    assert(!MediaHash.isBmp(null))
    assert(!MediaHash.isBmp(Array[Byte]('B', 'M', 0)))
    assert(!MediaHash.isBmp("PNG-ish".getBytes))
    // header claims pixels beyond the buffer
    val trunc = bmp(Array[Byte](1, 2, 3)).take(54)
    assert(!MediaHash.isBmp(trunc))
  }

  test("mm_phash_dedup: deterministic top-k, ascending, hammings honest") {
    val out = Multimodal.mmPhashDedup(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length === Multimodal.PhashTopK)
    assert(out.map(_._3).toSeq === out.map(_._3).sorted.toSeq)
    // recompute each pair's hamming from the docs' own payload hashes
    val docs = Tables.documents(spark, sf001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        MediaHash.aHash64(MediaHeaders.bmpWrap(
          r.getString(1).getBytes("UTF-8"), 8, 8)))
      .toMap
    out.foreach { case (a, b, h) =>
      assert(a < b)
      assert(h === java.lang.Long.bitCount(docs(a) ^ docs(b)).toLong)
    }
    val again = Multimodal.mmPhashDedup(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.toSeq === out.toSeq)
  }
}
