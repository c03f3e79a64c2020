package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis4

class TextAnalysis4Spec extends AnyFunSuite with SparkTestBase {

  test("text_html_extract: exact round-trip of title and body text") {
    val docs = Tables.documents(spark, sf001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = TextAnalysis4.textHtmlExtract(spark, sf001).collect()
    assert(out.length === docs.size)
    out.foreach { r =>
      val text = docs(r.getLong(0))
      val title = text.split(" ", -1).take(3).mkString(" ")
      // title recovered from <title>, body reconstructed exactly:
      // h1-title + the two <p> halves reassemble to title + ' ' + text
      assert(r.getString(1) === title)
      assert(r.getString(2) === s"$title $text",
        s"doc ${r.getLong(0)}: main_text does not round-trip")
      // the wrapper has a fixed tag skeleton: 28 tags per page
      assert(r.getLong(3) === 28L, s"n_tags=${r.getLong(3)}")
      // extraction keeps strictly less than the raw page (markup
      // overhead exists) but is never empty
      assert(r.getDouble(5) > 0.0 && r.getDouble(5) < 1.0)
    }
  }
}
