package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{AviCodec, JpegCodec}
import graft.operators.Multimodal2

/** Driver-level contract of the AVI/MJPEG container codec and the
  * mm_video_frames operator: byte-level header pins against the RIFF
  * layout, frame round trips (odd-length payloads exercise word
  * alignment), quarantine on everything outside the subset, and a
  * driver-side recompute of the operator's sampled-frame stats.
  */
class AviCodecSpec extends AnyFunSuite with SparkTestBase {
  self: AnyFunSuite =>

  private def gray(docId: Long, f: Int, w: Int = 16): Array[Byte] = {
    val quant = Array.tabulate(64)(z => 1 + z % 8)
    val blocks = Array.tabulate(w / 8)(b => Array.tabulate(64) { z =>
      if (z <= 6) (((z * 7 + b * 5 + f * 11 + docId * 3) % 21) - 10).toInt else 0
    })
    JpegCodec.jpegWrapBaseline(w, 8, quant, blocks)
  }

  test("round trip: frames, geometry, timing, and declared counts") {
    for (nf <- Seq(1, 4, 8)) {
      val frames = Seq.tabulate(nf)(f => gray(3L, f))
      val avi = AviCodec.aviWrapMjpeg(16, 8, 40000, frames)
      val v = AviCodec.aviFrames(avi)
        .fold(e => fail(s"decode failed: $e"), identity)
      assert(v.width === 16 && v.height === 8)
      assert(v.usecPerFrame === 40000)
      assert(v.nFrames === nf && v.frames.length === nf)
      v.frames.zip(frames).zipWithIndex.foreach { case ((got, want), i) =>
        assert(got.toSeq === want.toSeq, s"frame $i payload diverges")
      }
    }
  }

  test("span walk equals the materializing walk frame-for-frame") {
    val frames = Seq.tabulate(6)(f => gray(5L, f))
    val avi = AviCodec.aviWrapMjpeg(16, 8, 2000, frames)
    val v = AviCodec.aviFrames(avi).fold(e => fail(e), identity)
    val s = AviCodec.aviSpans(avi).fold(e => fail(e), identity)
    assert((s.width, s.height, s.usecPerFrame, s.nFrames) ===
      ((v.width, v.height, v.usecPerFrame, v.nFrames)))
    (0 until s.nFrames).foreach(i =>
      assert(s.frame(i).toSeq === v.frames(i).toSeq, s"span $i diverges"))
  }

  test("word alignment: odd-length frame payloads survive the chunk walk") {
    // craft odd-length payloads by appending a trailing comment byte via
    // raw arrays (any byte payload is legal in a chunk; the decoder only
    // JPEG-decodes what the sampler keeps)
    val odd = Seq(Array[Byte](1, 2, 3), Array[Byte](4, 5, 6, 7, 8))
    val avi = AviCodec.aviWrapMjpeg(8, 8, 1000, odd)
    val v = AviCodec.aviFrames(avi)
      .fold(e => fail(s"decode failed: $e"), identity)
    assert(v.frames(0).toSeq === Seq[Byte](1, 2, 3))
    assert(v.frames(1).toSeq === Seq[Byte](4, 5, 6, 7, 8))
  }

  test("byte-level pins: RIFF grammar exactly as written") {
    val avi = AviCodec.aviWrapMjpeg(16, 8, 33333, Seq(gray(0L, 0)))
    def fcc(o: Int) = new String(avi, o, 4, "US-ASCII")
    def le32(o: Int) = (avi(o) & 0xff) | ((avi(o + 1) & 0xff) << 8) |
      ((avi(o + 2) & 0xff) << 16) | ((avi(o + 3) & 0xff) << 24)
    assert(fcc(0) === "RIFF")
    assert(le32(4) === avi.length - 8, "RIFF size must cover the payload")
    assert(fcc(8) === "AVI ")
    assert(fcc(12) === "LIST" && fcc(20) === "hdrl")
    assert(fcc(24) === "avih" && le32(28) === 56)
    assert(le32(32) === 33333, "dwMicroSecPerFrame")
    assert(le32(48) === 1, "dwTotalFrames")
    assert(le32(64) === 16 && le32(68) === 8, "avih geometry")
    // strh fccType/fccHandler sit right after the avih block + LIST hdr
    val strh = 24 + 8 + 56 + 12
    assert(fcc(strh) === "strh")
    assert(fcc(strh + 8) === "vids" && fcc(strh + 12) === "MJPG")
    // idx1 is the last chunk and holds one 16-byte keyframe entry
    val idx1 = avi.length - 8 - 16
    assert(fcc(idx1) === "idx1" && le32(idx1 + 4) === 16)
    assert(fcc(idx1 + 8) === "00dc" && le32(idx1 + 12) === 0x10)
  }

  test("quarantine: malformed and out-of-subset streams return Left") {
    val good = AviCodec.aviWrapMjpeg(8, 8, 1000, Seq(gray(1L, 0, w = 8)))
    assert(AviCodec.aviFrames(null).isLeft)
    assert(AviCodec.aviFrames(Array[Byte](1, 2, 3)).isLeft)
    assert(AviCodec.aviFrames("RIFX".getBytes ++ good.drop(4)).isLeft)
    // declared RIFF size overrunning the payload
    assert(AviCodec.aviFrames(good.dropRight(10)).isLeft)
    // wrong form type
    val wav = good.clone(); "WAVE".getBytes.copyToArray(wav, 8)
    assert(AviCodec.aviFrames(wav).isLeft)
    // non-MJPG handler
    val h264 = good.clone()
    val strh = 24 + 8 + 56 + 12
    "H264".getBytes.copyToArray(h264, strh + 12)
    assert(AviCodec.aviFrames(h264).isLeft)
    // frame-count mismatch: patch dwTotalFrames
    val bad = good.clone(); bad(48) = 9
    assert(AviCodec.aviFrames(bad).isLeft)
  }

  test("mm_video_frames: driver-side recompute of sampled-frame stats") {
    val rows = Multimodal2.mmVideoFrames(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // no quarantined rows at the gate SF — every fixture is in-subset
    assert(rows.forall(_.getLong(1) >= 0), "unexpected container quarantine")
    val byDoc = rows.groupBy(_.getLong(0))
    // recompute a handful of docs end-to-end from the synthesis formula
    val docs = Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "octet_length(cast(text as binary)) as n")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    byDoc.take(5).foreach { case (docId, frameRows) =>
      val n = docs(docId)
      val nf = (4 + docId % 5).toInt
      val sampled = (0 until nf).filter(_ % Multimodal2.SampleEvery == 0)
      assert(frameRows.map(_.getLong(1)).sorted.toSeq ===
        sampled.map(_.toLong), s"doc $docId sampled the wrong frames")
      frameRows.foreach { r =>
        val f = r.getLong(1).toInt
        assert(r.getLong(2) === nf.toLong)
        assert(r.getLong(3) === (33333 + n % 1000).toLong)
        val w = 8 * (1 + n % 2)
        assert(r.getLong(4) === w.toLong && r.getLong(5) === 8L)
        // replay the frame through the codec pair directly
        val quant = Array.tabulate(64)(z => 1 + z % 8)
        val zmax = (5 + docId % 5).toInt
        val blocks = Array.tabulate(w / 8)(b => Array.tabulate(64) { z =>
          if (z <= zmax)
            (((z * 7 + b * 5 + f * 11 + docId * 3) % 21) - 10).toInt
          else 0
        })
        val px = JpegCodec.jpegRaster(
          JpegCodec.jpegWrapBaseline(w, 8, quant, blocks))
          .fold(e => fail(e), identity).pixels
        assert(r.getLong(6) === px.map(_ & 0xff).map(_.toLong).sum)
        assert(r.getLong(7) === (px(0) & 0xff).toLong)
        assert(r.getLong(8) === (px(w - 1) & 0xff).toLong)
        assert(r.getLong(9) === (px(px.length - 1) & 0xff).toLong)
      }
    }
  }

  test("sampling drops still-encoded frames: only sampled indices decode") {
    // structural property of the operator contract: with SampleEvery=2
    // a 5-frame doc yields frames 0,2,4 — the odd payloads never reach
    // the JPEG decoder (verified by planting a CORRUPT jpeg at odd idx)
    val frames = Seq.tabulate(5)(f =>
      if (f % 2 == 1) Array[Byte](0x55, 0x66) else gray(2L, f, w = 8))
    val avi = AviCodec.aviWrapMjpeg(8, 8, 1000, frames)
    val v = AviCodec.aviFrames(avi).fold(e => fail(e), identity)
    val decoded = (0 until v.nFrames).filter(_ % 2 == 0)
      .map(f => JpegCodec.jpegRaster(v.frames(f)))
    assert(decoded.forall(_.isRight),
      "sampled (even) frames must decode — corrupt odd frames untouched")
  }
}
