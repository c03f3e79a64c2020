package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis6

/** The greedy longest-match segmenter's algebra plus a corpus-level
  * recompute of text_wordpiece through the naive (non-distinct-word)
  * path — proving the distinct-word optimization is invisible in the
  * output.
  */
class TextAnalysis6Spec extends AnyFunSuite with SparkTestBase {

  test("segmentation concatenates back to the word (totality)") {
    val rnd = new scala.util.Random(7)
    (0 until 500).foreach { _ =>
      val w = (0 until 1 + rnd.nextInt(18))
        .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      val toks = TextAnalysis6.segment(w)
      assert(toks.mkString("") === w, s"lossy segmentation of '$w'")
      assert(toks.forall(TextAnalysis6.Vocab.contains), s"OOV token for '$w'")
    }
  }

  test("greedy argmax: every step takes the longest vocabulary prefix") {
    val vs = TextAnalysis6.Vocab.toSet
    val rnd = new scala.util.Random(13)
    (0 until 300).foreach { _ =>
      // bias toward vocab fragments so multi-char matches actually occur
      val w = (0 until 1 + rnd.nextInt(5))
        .map(_ => TextAnalysis6.Vocab(rnd.nextInt(TextAnalysis6.Vocab.size)))
        .mkString
      var pos = 0
      TextAnalysis6.segment(w).foreach { t =>
        assert(w.substring(pos, pos + t.length) === t)
        // no longer vocab token matches at this position
        ((t.length + 1) to math.min(5, w.length - pos)).foreach { l =>
          assert(!vs.contains(w.substring(pos, pos + l)),
            s"'$w' at $pos: took '$t' but '${w.substring(pos, pos + l)}' is in vocab")
        }
        pos += t.length
      }
      assert(pos === w.length)
    }
  }

  test("known segmentations (greedy vs intuition pins)") {
    assert(TextAnalysis6.segment("lorem") === Seq("lorem"))
    // greedy takes "ipsum" whole, not "ip"+"s"+"um"
    assert(TextAnalysis6.segment("ipsum") === Seq("ipsum"))
    // "quorem": "qu" then "or" then "em"
    assert(TextAnalysis6.segment("quorem") === Seq("qu", "or", "em"))
    // single chars fall back
    assert(TextAnalysis6.segment("xyz") === Seq("x", "y", "z"))
  }

  test("text_wordpiece equals the naive per-occurrence recompute") {
    val docs = Tables.documents(spark, sf0001)
      .select("text").collect().map(_.getString(0))
    val words = docs.flatMap(_.toLowerCase.split(" ", -1))
      .map(_.replaceAll("[^a-z]", "")).filter(_.nonEmpty)
    val byTok = new scala.collection.mutable.HashMap[String, (Long, Set[String])]
    words.foreach { w =>
      TextAnalysis6.segment(w).foreach { t =>
        val (n, ws) = byTok.getOrElse(t, (0L, Set.empty[String]))
        byTok(t) = (n + 1, ws + w)
      }
    }
    val expect = byTok.toSeq.map { case (t, (n, ws)) => (t, n, ws.size.toLong) }
      .sortBy(_._1)
    val got = TextAnalysis6.textWordpiece(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expect)
  }

  // ---------------------------------------------------------- unigram

  /** All segmentations of `w` over the vocabulary (test-only brute
    * force — exponential, so words stay short).
    */
  private def allSegs(w: String): Seq[Seq[String]] =
    if (w.isEmpty) Seq(Seq.empty)
    else (1 to math.min(6, w.length)).flatMap { len =>
      val t = w.substring(0, len)
      if (TextAnalysis6.PieceCost.contains(t))
        allSegs(w.substring(len)).map(t +: _)
      else Seq.empty
    }

  test("viterbi equals brute-force (cost, then count) optimum") {
    val rnd = new scala.util.Random(29)
    (0 until 200).foreach { _ =>
      val w = (0 until 1 + rnd.nextInt(4))
        .map(_ => TextAnalysis6.Vocab(rnd.nextInt(TextAnalysis6.Vocab.size)))
        .mkString.take(10)
      val segs = allSegs(w)
      assert(segs.nonEmpty, s"no segmentation of '$w'")
      val costs = segs.map(s => (s.map(TextAnalysis6.PieceCost(_).toLong).sum,
        s.length.toLong))
      val minCost = costs.map(_._1).min
      val minTok = costs.filter(_._1 == minCost).map(_._2).min
      assert(TextAnalysis6.viterbi(w) === (minCost, minTok),
        s"viterbi suboptimal on '$w'")
    }
  }

  test("optimal never exceeds greedy; the corpus has genuine savings") {
    val docs = Tables.documents(spark, sf0001)
      .select("text").collect().map(_.getString(0))
    val words = docs.flatMap(_.toLowerCase.split(" ", -1))
      .map(_.replaceAll("[^a-z]", "")).filter(_.nonEmpty).distinct
    var saved = 0L
    words.foreach { w =>
      val (mc, _) = TextAnalysis6.viterbi(w)
      val gc = TextAnalysis6.segment(w)
        .map(TextAnalysis6.PieceCost(_).toLong).sum
      assert(mc <= gc, s"optimum above greedy on '$w'")
      saved += gc - mc
    }
    // the vocabulary induces words where greedy's longest-first choice
    // blocks a cheaper continuation — otherwise the lane is degenerate
    assert(saved > 0, "no word where the DP beats greedy — degenerate fixture")
  }

  test("text_unigram_lm equals the naive per-word recompute") {
    val docs = Tables.documents(spark, sf0001)
      .select("text").collect().map(_.getString(0))
    val words = docs.flatMap(_.toLowerCase.split(" ", -1))
      .map(_.replaceAll("[^a-z]", "")).filter(_.nonEmpty)
    val expect = words.groupBy(identity).map { case (w, occ) =>
      val (mc, mk) = TextAnalysis6.viterbi(w)
      val seg = TextAnalysis6.segment(w)
      val gc = seg.map(TextAnalysis6.PieceCost(_).toLong).sum
      (w, occ.length.toLong, mc, mk, gc, seg.length.toLong, gc - mc)
    }.toSeq.sortBy(_._1)
    val got = TextAnalysis6.textUnigramLm(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got === expect)
  }

  test("text_tokenizer_fertility equals the naive per-source recompute") {
    val rows = Tables.documents(spark, sf0001)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val bySource = rows.groupBy(_._1).map { case (src, docs) =>
      val words = docs.flatMap(_._2.toLowerCase.split(" ", -1))
        .map(_.replaceAll("[^a-z]", "")).filter(_.nonEmpty)
      val nWords = words.length.toLong
      val nTokens = words.map(w => TextAnalysis6.segment(w).length.toLong).sum
      val nChars = words.map(_.length.toLong).sum
      (src, nWords, nTokens, nChars,
        nTokens * 10000 / nWords, nChars * 10000 / nTokens)
    }.toSeq.sortBy(_._1)
    val got = TextAnalysis6.textTokenizerFertility(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got === bySource)
    // fertility must exceed 10000 bps (a word is at least one token,
    // and multi-token words exist) or the metric is degenerate
    assert(got.forall(_._5 >= 10000))
    assert(got.exists(_._5 > 10000))
  }
}
