package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import graft.operators.Multimodal

/** Driver-side recomputes of the round-12 content-decode re-bases:
  * mm_scene_cuts (animated-GIF LZW frames → inter-frame L1 distance)
  * and mm_audio_features (real PCM → 32-sample windowed features).
  * Each test brute-forces the expected rows from the SYNTHESIS FORMULA
  * only — the same replay the DuckDB oracle runs — so the Spark side
  * has to earn every value through the genuine codec path.
  */
class MultimodalContentSpec extends AnyFunSuite with SparkTestBase {

  private def docLens(): Map[Long, Int] = {
    Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "octet_length(cast(text as binary)) as n")
      .collect()
      .map(r => r.getLong(0) -> r.getInt(1).toInt)
      .toMap
  }

  test("mm_scene_cuts equals the formula replay at sf0.001") {
    val got = Multimodal.mmSceneCuts(spark, sf0001).collect()
    val lens = docLens()
    val expected = lens.toSeq.sortBy(_._1).flatMap { case (docId, n) =>
      val w = 8 + n % 29
      val h = 8 + (n * 7) % 19
      val nf = 6 + n % 7
      def frame(f: Int): Array[Int] = {
        val base = docId * 11 + (f / Multimodal.SceneLen) * 6 + (f % Multimodal.SceneLen)
        Array.tabulate(w * h)(i => (((i * 31) + base) % 16).toInt)
      }
      (1 until nf).map { f =>
        val a = frame(f - 1); val b = frame(f)
        val l1 = a.indices.map(i => math.abs(b(i) - a(i)).toLong).sum
        Row(docId, f.toLong, l1, l1 * 2 > 7L * w * h)
      }
    }
    assert(got.length === expected.length)
    got.zip(expected).foreach { case (g, e) => assert(g === e) }
    // both classes must actually occur, or the threshold proves nothing
    val cuts = got.count(_.getBoolean(3))
    assert(cuts > 0 && cuts < got.length,
      s"degenerate fixture: $cuts cuts of ${got.length} transitions")
  }

  test("mm_scene_cuts cut positions land exactly on scene boundaries") {
    val got = Multimodal.mmSceneCuts(spark, sf0001).collect()
    got.foreach { r =>
      val f = r.getLong(1)
      assert(r.getBoolean(3) === (f % Multimodal.SceneLen == 0),
        s"doc ${r.getLong(0)} frame $f: cut flag disagrees with scene structure")
    }
  }

  test("mm_audio_features equals the formula replay at sf0.001") {
    val got = Multimodal.mmAudioFeatures(spark, sf0001).collect()
    val lens = docLens()
    val expected = lens.toSeq.sortBy(_._1).flatMap { case (docId, n) =>
      val ns = 64 + n % 193
      val s = Array.tabulate(ns)(i => ((i * 37 + docId * 13) % 2001 - 1000).toInt)
      val nf = (ns + 31) / 32
      (0 until nf).map { f =>
        val from = f * 32
        val until = math.min(from + 32, ns)
        val win = (from until until).map(s)
        val energy = win.map(v => v.toLong * v).sum
        val peak = win.map(v => math.abs(v).toLong).max
        val zc = (from + 1 until until)
          .count(i => s(i - 1).toLong * s(i) < 0).toLong
        Row(docId, f.toLong, (until - from).toLong, energy, peak, zc)
      }
    }
    assert(got.length === expected.length)
    got.zip(expected).foreach { case (g, e) => assert(g === e) }
  }

  test("mm_audio_features exercises partial tail frames") {
    // ns = 64 + n % 193 is rarely a multiple of 32; at least one doc
    // must end in a short frame or the window-boundary logic is untested
    val got = Multimodal.mmAudioFeatures(spark, sf0001).collect()
    assert(got.exists(_.getLong(2) < 32), "no partial tail frame in fixture")
    assert(got.forall(r => r.getLong(2) > 0 && r.getLong(2) <= 32))
  }

  test("mm_audio_resample equals the formula replay at sf0.001") {
    val by = operators.Multimodal2.ResampleBy
    val got = operators.Multimodal2.mmAudioResample(spark, sf0001).collect()
    val lens = docLens()
    val expected = lens.toSeq.sortBy(_._1).map { case (docId, n) =>
      val ns = 64 + n % 193
      val s = Array.tabulate(ns)(i => ((i * 37 + docId * 13) % 2001 - 1000).toLong)
      val out = s.grouped(by).map(w => w.sum / w.length).toArray
      Row(docId, ns.toLong, out.length.toLong, (16000 / by).toLong,
        out.sum, out.min, out.max, out.head, out.last)
    }
    assert(got.length === expected.length)
    got.zip(expected).foreach { case (g, e) => assert(g === e) }
    // the decimator's negative-mean truncation must genuinely run: the
    // formula's range is symmetric around zero, so negative window
    // means exist unless the fixture degenerated
    assert(expected.exists(_.getLong(5) < 0), "no negative resampled value")
    // partial tail windows must exist (ns is rarely a multiple of 4)
    assert(lens.values.exists(n => (64 + n % 193) % by != 0),
      "no partial tail window in fixture")
  }
}
