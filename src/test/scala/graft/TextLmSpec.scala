package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis5

/** Driver-side recompute of the LM quality tier: the bigram model
  * (counts + the micro-nat pinning, same JVM op sequence) and every
  * per-doc score brute-forced from raw text; class balance pinned so
  * the threshold genuinely splits the corpus.
  */
class TextLmSpec extends AnyFunSuite with SparkTestBase {

  private def tokensOf(text: String): Array[String] =
    text.toLowerCase(java.util.Locale.ROOT).split(" ", -1).filter(_.nonEmpty)

  test("text_lm_train equals the brute-force model at sf0.001") {
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> tokensOf(r.getString(1)))
    val bigrams = docs.flatMap { case (_, t) => t.dropRight(1).zip(t.drop(1)) }
    val cab = bigrams.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val ca = bigrams.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val v = docs.flatMap(_._2).distinct.length.toLong
    val got = TextAnalysis5.textLmTrain(spark, sf0001).collect()
    assert(got.length === cab.size)
    got.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      assert(r.getLong(2) === cab(key), s"c_ab of $key")
      assert(r.getLong(3) === ca(key._1), s"c_a of ${key._1}")
      assert(r.getLong(4) === v)
      val expected = math.floor(
        -math.log((cab(key) + 1).toDouble / (ca(key._1) + v)) * 1e6 + 0.5).toLong
      assert(r.getLong(5) === expected, s"nll of $key")
    }
  }

  test("text_lm_perplexity equals the brute-force scores; both classes occur") {
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> tokensOf(r.getString(1)))
    val bigrams = docs.flatMap { case (_, t) => t.dropRight(1).zip(t.drop(1)) }
    val cab = bigrams.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val ca = bigrams.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val v = docs.flatMap(_._2).distinct.length.toLong
    def nll(key: (String, String)): Long = math.floor(
      -math.log((cab(key) + 1).toDouble / (ca(key._1) + v)) * 1e6 + 0.5).toLong
    val got = TextAnalysis5.textLmPerplexity(spark, sf0001).collect()
    assert(got.length === docs.length, "every document gets a verdict")
    val byId = docs.toMap
    got.foreach { r =>
      val id = r.getLong(0)
      val t = byId(id)
      val bg = t.dropRight(1).zip(t.drop(1))
      val sum = bg.map(nll).sum
      assert(r.getLong(1) === bg.length.toLong, s"n_bigrams of $id")
      assert(r.getLong(2) === sum, s"nll sum of $id")
      assert(r.getBoolean(3) ===
        (sum > bg.length * TextAnalysis5.FlagMicroNats), s"flag of $id")
    }
    val flagged = got.count(_.getBoolean(3))
    assert(flagged > 0 && flagged < got.length,
      s"degenerate threshold: $flagged of ${got.length} flagged")
  }
}
