package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GifPixels

/** Driver-level contract of the LZW GIF codec: byte-exact round trips
  * across the regimes that break naive implementations (width bumps,
  * dictionary-full CLEAR resets, the cScSc case, sub-block boundaries),
  * plus quarantine on malformed streams. No Spark needed — the codec is
  * pure byte arithmetic.
  */
class GifPixelsSpec extends AnyFunSuite {

  private val palette16 =
    Array.tabulate(16)(p => ((p * 17) << 16) | (((p * 29) % 256) << 8) |
      ((p * 43) % 256))

  private def roundTrip(w: Int, h: Int, gen: Int => Int): Unit = {
    val idx = Array.tabulate(w * h)(i => gen(i).toByte)
    val gif = GifPixels.gifWrapPixels(w, h, palette16, idx)
    val r = GifPixels.gifRaster(gif)
      .fold(e => fail(s"decode failed: $e"), identity)
    assert(r.width === w && r.height === h)
    assert(r.palette.toSeq === palette16.toSeq)
    assert(r.indices.toSeq === idx.toSeq,
      s"pixel round-trip broke at w=$w h=$h")
  }

  test("round trip: fixture formula, tiny, single-pixel, and flat images") {
    roundTrip(8, 8, i => (i * 31 + 7) % 16)  // the operator's formula shape
    roundTrip(1, 1, _ => 5)
    roundTrip(3, 2, _ => 0)                  // maximal repetition
    roundTrip(36, 26, i => (i * 31 + 11 * 499) % 16) // largest fixture dims
  }

  test("round trip: pseudo-random indices grow the dictionary past width bumps") {
    // ~4k pixels of hash noise pushes codes well past the 5->10 bit
    // bumps; any encoder/decoder width desync corrupts the tail
    roundTrip(64, 64, i => ((i * 2654435761L >>> 7) % 16).toInt)
  }

  test("round trip: >4096 dictionary entries force a mid-stream CLEAR reset") {
    // worst case for dictionary growth is low-repetition data; 40k
    // noise pixels at 16 symbols comfortably fill the 12-bit table
    roundTrip(200, 200, i => ((i * 1103515245L + 12345 >>> 9) % 16).toInt)
  }

  test("round trip: 256-color palette (8-bit min code size)") {
    val pal = Array.tabulate(256)(p => (p << 16) | ((255 - p) << 8) | p)
    val idx = Array.tabulate(50 * 40)(i => ((i * 7919) % 256).toByte)
    val gif = GifPixels.gifWrapPixels(50, 40, pal, idx)
    val r = GifPixels.gifRaster(gif).fold(e => fail(e), identity)
    assert(r.indices.toSeq === idx.toSeq)
    assert(r.palette.length === 256)
  }

  test("malformed streams quarantine, never throw") {
    val gif = GifPixels.gifWrapPixels(8, 8, palette16,
      Array.tabulate(64)(i => (i % 16).toByte))
    // truncations at every structural boundary
    assert(GifPixels.gifRaster(null).isLeft)
    assert(GifPixels.gifRaster(gif.take(5)).isLeft)
    assert(GifPixels.gifRaster(gif.take(14)).isLeft)   // inside GCT
    assert(GifPixels.gifRaster(gif.take(62)).isLeft)   // inside descriptor
    assert(GifPixels.gifRaster(gif.dropRight(2)).isLeft) // LZW cut mid-block
    // flip a byte inside the LZW data: either an invalid code or a
    // wrong pixel count — must be Left, not garbage-or-throw
    val corrupted = gif.clone()
    corrupted(gif.length - 4) = (corrupted(gif.length - 4) ^ 0x55).toByte
    GifPixels.gifRaster(corrupted) match {
      case Left(_) => ()
      case Right(r) => // a lucky flip may still decode; then the pixel
        // count invariant must have held
        assert(r.indices.length === 64)
    }
    // no global color table = outside the content-decode subset
    val noGct = gif.clone()
    noGct(10) = (noGct(10) & 0x7f).toByte
    assert(GifPixels.gifRaster(noGct).isLeft)
  }

  test("animated round trip: every frame decodes byte-exact through gifFrames") {
    val w = 17; val h = 11
    val frames = (0 until 9).map { f =>
      Array.tabulate(w * h)(i => (((i * 31) + 11 * 42 + (f / 3) * 6 + f % 3) % 16).toByte)
    }
    val gif = GifPixels.gifWrapFrames(w, h, palette16, frames, delayCs = 7)
    val anim = GifPixels.gifFrames(gif).fold(e => fail(s"decode failed: $e"), identity)
    assert(anim.width === w && anim.height === h)
    assert(anim.palette.toSeq === palette16.toSeq)
    assert(anim.frames.length === 9)
    frames.zipWithIndex.foreach { case (exp, f) =>
      assert(anim.frames(f).toSeq === exp.toSeq, s"frame $f round-trip broke")
    }
  }

  test("gifFrames on a single-frame container agrees with gifRaster") {
    val idx = Array.tabulate(12 * 9)(i => ((i * 31 + 7) % 16).toByte)
    val gif = GifPixels.gifWrapPixels(12, 9, palette16, idx)
    val anim = GifPixels.gifFrames(gif).fold(e => fail(e), identity)
    val single = GifPixels.gifRaster(gif).fold(e => fail(e), identity)
    assert(anim.frames.length === 1)
    assert(anim.frames(0).toSeq === single.indices.toSeq)
  }

  test("animated quarantine: truncation inside a later frame is Left, not partial") {
    val frames = (0 until 4).map(f =>
      Array.tabulate(64)(i => ((i + f) % 16).toByte))
    val gif = GifPixels.gifWrapFrames(8, 8, palette16, frames)
    assert(GifPixels.gifFrames(gif.dropRight(2)).isLeft)  // cut mid-frame-4 LZW
    assert(GifPixels.gifFrames(gif.dropRight(1)).isLeft)  // missing trailer
    assert(GifPixels.gifFrames(Array.empty[Byte]).isLeft)
  }

  test("header-level probe still reads the same container (family consistency)") {
    val gif = GifPixels.gifWrapPixels(12, 9, palette16,
      Array.tabulate(108)(i => (i % 16).toByte))
    graft.functions.MediaHeaders.probe(gif) match {
      case graft.functions.MediaHeaders.ImageInfo(f, w, h, _) =>
        assert(f === "gif" && w === 12 && h === 9)
      case other => fail(s"probe said $other")
    }
  }
}
