package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.JpegCodec

/** Driver-level contract of the baseline JPEG codec: coefficient
  * round trips across the regimes that break naive implementations
  * (DC prediction chains, zero runs spanning ZRL, EOB-less full
  * blocks, byte-stuffing boundaries), IDCT properties, and quarantine
  * on malformed/out-of-subset streams. No Spark needed — pure byte
  * arithmetic.
  */
class JpegCodecSpec extends AnyFunSuite {

  private val quant = Array.tabulate(64)(z => 1 + z % 8)

  /** Reference pixels straight from the fixture formula: dequantize +
    * the codec's own integer IDCT (the IDCT is pinned separately below;
    * here it defines the expectation for the FULL file round trip).
    */
  private def expectedPixels(w: Int, h: Int,
      blocks: Array[Array[Int]]): Array[Byte] = {
    val px = new Array[Byte](w * h)
    val bw = w / 8
    blocks.zipWithIndex.foreach { case (blk, b) =>
      val coef = new Array[Long](64)
      (0 until 64).foreach(z =>
        coef(JpegCodec.ZigZag(z)) = blk(z).toLong * quant(z))
      val p = JpegCodec.idct(coef)
      val by = b / bw; val bx = b % bw
      (0 until 8).foreach(y =>
        System.arraycopy(p, y * 8, px, (by * 8 + y) * w + bx * 8, 8))
    }
    px
  }

  private def roundTrip(w: Int, h: Int, gen: (Int, Int) => Int): Unit = {
    val blocks = Array.tabulate((w / 8) * (h / 8))(b =>
      Array.tabulate(64)(z => gen(b, z)))
    val jpeg = JpegCodec.jpegWrapBaseline(w, h, quant, blocks)
    val r = JpegCodec.jpegRaster(jpeg).fold(e => fail(s"decode failed: $e"), identity)
    assert(r.width === w && r.height === h)
    assert(r.pixels.toSeq === expectedPixels(w, h, blocks).toSeq,
      s"pixel round-trip broke at w=$w h=$h")
  }

  test("round trip: the fixture formula across all geometry variants") {
    for (w <- Seq(8, 16, 24); h <- Seq(8, 16); docId <- Seq(0L, 7L, 499L)) {
      val zmax = (5 + docId % 5).toInt
      roundTrip(w, h, (b, z) =>
        if (z <= zmax) (((z * 7 + b * 5 + docId * 3) % 21) - 10).toInt else 0)
    }
  }

  test("round trip: DC-only blocks exercise the prediction chain alone") {
    roundTrip(24, 16, (b, z) => if (z == 0) (b * 13) % 21 - 10 else 0)
  }

  test("round trip: dense blocks (no EOB) and long zero runs (ZRL path)") {
    // dense: all 64 positions non-zero — the block ends without EOB
    roundTrip(8, 8, (_, z) => (z % 19) - 9)
    // sparse tail: single coefficient at z=63 forces 3 ZRLs + the run
    roundTrip(8, 8, (_, z) => if (z == 0) 5 else if (z == 63) -3 else 0)
  }

  test("round trip: amplitudes at the Annex K size boundaries") {
    // ±(2^s - 1) and ±2^(s-1) edges for s up to 10
    roundTrip(16, 8, (b, z) => z match {
      case 0 => if (b == 0) 1023 else -1023
      case 1 => 512
      case 2 => -512
      case 3 => 1
      case 4 => -1
      case _ => 0
    })
  }

  test("byte stuffing: streams containing 0xFF entropy bytes survive") {
    // size-10 amplitudes (1023 = ten 1-bits) behind the long canonical
    // AC codes (themselves mostly 1-bits) guarantee 0xFF entropy bytes
    val blocks = Array(Array.tabulate(64)(z => if (z <= 10) 1023 else 0))
    val jpeg = JpegCodec.jpegWrapBaseline(8, 8, quant, blocks)
    // confirm the stuffing path genuinely ran: a 0xFF00 inside the
    // entropy segment (after SOS)
    val sos = {
      var i = 2
      while (!(jpeg(i) == 0xff.toByte && jpeg(i + 1) == 0xda.toByte)) i += 1
      i
    }
    val hasStuffed = (sos until jpeg.length - 2).exists(i =>
      jpeg(i) == 0xff.toByte && jpeg(i + 1) == 0x00.toByte)
    assert(hasStuffed, "fixture regression: no stuffed byte in the stream")
    val r = JpegCodec.jpegRaster(jpeg).fold(e => fail(e), identity)
    assert(r.pixels.toSeq === expectedPixels(8, 8, blocks).toSeq)
  }

  test("IDCT: DC-only block is flat, zero block is mid-gray 128") {
    val zero = JpegCodec.idct(new Array[Long](64))
    assert(zero.forall(_ == 128.toByte))
    val dc = new Array[Long](64)
    dc(0) = 64 // dequantized DC of 64 → shift of 8 gray levels
    val flat = JpegCodec.idct(dc)
    assert(flat.distinct.length === 1, "DC-only IDCT must be flat")
    assert((flat(0) & 0xff) === 136)
  }

  test("IDCT: a horizontal-frequency coefficient varies along x only") {
    val coef = new Array[Long](64)
    coef(1) = 100 // u=0 (vertical), v=1 (horizontal)
    val p = JpegCodec.idct(coef)
    (0 until 8).foreach { y =>
      (0 until 8).foreach { x =>
        assert(p(y * 8 + x) === p(x), s"row $y differs at col $x")
      }
    }
    assert((0 until 8).map(x => p(x) & 0xff).distinct.length > 1)
  }

  test("malformed and out-of-subset streams quarantine, never throw") {
    val blocks = Array(Array.tabulate(64)(z => if (z < 6) z - 3 else 0))
    val jpeg = JpegCodec.jpegWrapBaseline(8, 8, quant, blocks)
    assert(JpegCodec.jpegRaster(null).isLeft)
    assert(JpegCodec.jpegRaster(Array[Byte](0x12, 0x34)).isLeft)
    assert(JpegCodec.jpegRaster(jpeg.take(4)).isLeft)    // inside DQT
    assert(JpegCodec.jpegRaster(jpeg.take(40)).isLeft)   // inside DHT
    assert(JpegCodec.jpegRaster(jpeg.dropRight(4)).isLeft) // entropy cut
    // progressive SOF (0xc2) is outside the subset
    val prog = jpeg.clone()
    val sof = {
      var i = 2
      while (!(prog(i) == 0xff.toByte && prog(i + 1) == 0xc0.toByte)) i += 1
      i
    }
    prog(sof + 1) = 0xc2.toByte
    assert(JpegCodec.jpegRaster(prog).isLeft)
  }

  test("hostile SOF dims that wrap width*height in Int quarantine, not throw") {
    val blocks = Array(Array.tabulate(64)(z => if (z < 4) z else 0))
    val jpeg = JpegCodec.jpegWrapBaseline(8, 8, quant, blocks)
    val sof = {
      var i = 2
      while (!(jpeg(i) == 0xff.toByte && jpeg(i + 1) == 0xc0.toByte)) i += 1
      i
    }
    // 65528×65528: multiples of 8, pass every subset check, but
    // width*height wraps negative in Int — must be Left pre-allocation
    val hostile = jpeg.clone()
    val d = 65528
    hostile(sof + 5) = (d >> 8).toByte; hostile(sof + 6) = (d & 0xff).toByte
    hostile(sof + 7) = (d >> 8).toByte; hostile(sof + 8) = (d & 0xff).toByte
    assert(JpegCodec.jpegRaster(hostile).isLeft)
  }

  test("the family's header probe and the content decoder agree on geometry") {
    val blocks = Array.tabulate(6)(b =>
      Array.tabulate(64)(z => if (z < 4) b + z else 0))
    val jpeg = JpegCodec.jpegWrapBaseline(24, 16, quant, blocks)
    graft.functions.MediaHeaders.probe(jpeg) match {
      case graft.functions.MediaHeaders.ImageInfo(f, w, h, _) =>
        assert(f === "jpeg" && w === 24 && h === 16)
      case other => fail(s"probe said $other")
    }
  }
}
