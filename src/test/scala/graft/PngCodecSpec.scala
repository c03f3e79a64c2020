package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.PngCodec

/** Driver-level contract of the PNG/DEFLATE codec: pixel round trips
  * (every filter type runs on every image), the hand-written inflate
  * cross-checked against the JVM's own Inflater on arbitrary streams,
  * per-block-type coverage, checksum enforcement, and quarantine. No
  * Spark needed — pure byte arithmetic.
  */
class PngCodecSpec extends AnyFunSuite {

  private def roundTrip(w: Int, h: Int, gen: Int => Int): Unit = {
    val px = Array.tabulate(w * h)(i => gen(i).toByte)
    val png = PngCodec.pngWrapGray(w, h, px)
    val r = PngCodec.pngRaster(png).fold(e => fail(s"decode failed: $e"), identity)
    assert(r.width === w && r.height === h)
    assert(r.pixels.toSeq === px.toSeq, s"pixel round-trip broke at w=$w h=$h")
  }

  test("round trip: fixture formula, extremes, and every geometry parity") {
    roundTrip(8, 8, i => (i * 13 + 29 * 499) % 256) // operator formula shape
    roundTrip(48, 30, i => (i * 13) % 256)          // largest fixture dims
    roundTrip(1, 1, _ => 170)
    roundTrip(9, 7, _ => 0)                          // flat → max compression
    roundTrip(16, 5, i => if (i % 2 == 0) 0 else 255) // high-frequency
  }

  test("round trip: noise defeats LZ77 so literals dominate; RLE runs exercise matches") {
    roundTrip(64, 40, i => ((i * 2654435761L >>> 11) % 256).toInt) // literal-heavy
    roundTrip(64, 40, i => (i / 97) % 256)                         // long runs
  }

  test("hand-written inflate equals java.util.zip.Inflater on arbitrary data") {
    val rnd = new scala.util.Random(42)
    (0 until 20).foreach { trial =>
      val n = 1 + rnd.nextInt(5000)
      val data = new Array[Byte](n)
      // mix of compressible structure and noise
      (0 until n).foreach(i => data(i) =
        (if (trial % 2 == 0) (i / (1 + trial)) % 256 else rnd.nextInt(256)).toByte)
      val d = new java.util.zip.Deflater(1 + trial % 9)
      d.setInput(data); d.finish()
      val zb = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](4096)
      while (!d.finished()) zb.write(tmp, 0, d.deflate(tmp))
      d.end()
      val z = zb.toByteArray
      val got = PngCodec.inflate(z, 2, z.length - 4, n)
        .fold(e => fail(s"trial $trial: $e"), identity)
      assert(got.toSeq === data.toSeq, s"trial $trial inflate mismatch")
    }
  }

  test("inflate handles stored blocks (Deflater level 0)") {
    val data = Array.tabulate(3000)(i => ((i * 7) % 256).toByte)
    val d = new java.util.zip.Deflater(0) // stored blocks only
    d.setInput(data); d.finish()
    val zb = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](4096)
    while (!d.finished()) zb.write(tmp, 0, d.deflate(tmp))
    d.end()
    val z = zb.toByteArray
    val got = PngCodec.inflate(z, 2, z.length - 4, data.length)
      .fold(e => fail(e), identity)
    assert(got.toSeq === data.toSeq)
  }

  test("corruption quarantines: chunk CRC, zlib Adler, truncation") {
    val px = Array.tabulate(20 * 10)(i => ((i * 3) % 256).toByte)
    val png = PngCodec.pngWrapGray(20, 10, px)
    assert(PngCodec.pngRaster(null).isLeft)
    assert(PngCodec.pngRaster(png.take(7)).isLeft)
    assert(PngCodec.pngRaster(png.take(40)).isLeft)     // inside IHDR
    assert(PngCodec.pngRaster(png.dropRight(6)).isLeft) // inside IEND/IDAT
    // flip one bit inside the IDAT body: either the inflate structure
    // breaks or the Adler-32 catches it — silence is the only failure
    val corrupted = png.clone()
    corrupted(60) = (corrupted(60) ^ 0x10).toByte
    assert(PngCodec.pngRaster(corrupted).isLeft,
      "a corrupted IDAT byte must quarantine (CRC/Adler/structure)")
    // a bit flip in a pixel that ALSO gets its chunk CRC re-stamped
    // must be caught by the Adler-32 over the decompressed stream —
    // cheap here: flipping the stored CRC itself must fail loudly
    val badCrc = png.clone()
    badCrc(png.length - 1) = (badCrc(png.length - 1) ^ 0x01).toByte
    assert(PngCodec.pngRaster(badCrc).isLeft)
  }

  test("out-of-subset streams quarantine: color type, depth, interlace") {
    val px = Array.tabulate(8 * 8)(i => i.toByte)
    val png = PngCodec.pngWrapGray(8, 8, px)
    def patched(off: Int, v: Int): Array[Byte] = {
      // IHDR body starts at offset 16 (sig 8 + len 4 + tag 4); restamp
      // the CRC so only the targeted check can reject it
      val p = png.clone()
      p(off) = v.toByte
      val crc = new java.util.zip.CRC32()
      crc.update(p, 12, 4 + 13)
      val c = crc.getValue.toInt
      p(29) = (c >>> 24).toByte; p(30) = (c >>> 16).toByte
      p(31) = (c >>> 8).toByte; p(32) = c.toByte
      p
    }
    assert(PngCodec.pngRaster(patched(24, 16)).isLeft)  // 16-bit depth
    assert(PngCodec.pngRaster(patched(25, 2)).isLeft)   // RGB color type
    assert(PngCodec.pngRaster(patched(28, 1)).isLeft)   // Adam7 interlace
  }

  test("hostile streams quarantine: Int-overflow chunk lengths and IHDR dims") {
    val px = Array.tabulate(8 * 8)(i => i.toByte)
    val png = PngCodec.pngWrapGray(8, 8, px)
    // chunk length 0x7FFFFFF0: Int bounds math would wrap negative and
    // pass, then crash in crc.update — must be Left, not a throw
    val hostileLen = png.clone()
    hostileLen(8) = 0x7f.toByte; hostileLen(9) = 0xff.toByte
    hostileLen(10) = 0xff.toByte; hostileLen(11) = 0xf0.toByte
    assert(PngCodec.pngRaster(hostileLen).isLeft)
    // IHDR dims whose (w+1)*h wraps Int: 2^30 × 8 — must quarantine
    // before any allocation (restamp the CRC so only the cap rejects)
    val hostileDims = png.clone()
    hostileDims(16) = 0x40.toByte; hostileDims(17) = 0; hostileDims(18) = 0
    hostileDims(19) = 0 // width = 2^30
    val crc = new java.util.zip.CRC32()
    crc.update(hostileDims, 12, 4 + 13)
    val c = crc.getValue.toInt
    hostileDims(29) = (c >>> 24).toByte; hostileDims(30) = (c >>> 16).toByte
    hostileDims(31) = (c >>> 8).toByte; hostileDims(32) = c.toByte
    assert(PngCodec.pngRaster(hostileDims).isLeft)
  }

  test("the family's header probe and the content decoder agree on geometry") {
    val px = Array.tabulate(24 * 15)(i => ((i * 5) % 256).toByte)
    val png = PngCodec.pngWrapGray(24, 15, px)
    graft.functions.MediaHeaders.probe(png) match {
      case graft.functions.MediaHeaders.ImageInfo(f, w, h, _) =>
        assert(f === "png" && w === 24 && h === 15)
      case other => fail(s"probe said $other")
    }
  }
}
