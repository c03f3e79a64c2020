package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Fourth text-analysis batch: HTML main-content extraction — the very
  * first transform a web-crawl training pipeline applies (trafilatura/
  * jusText territory: strip markup, scripts, styles, and boilerplate
  * chrome; keep the article). Everything here is builtin regexp/string
  * expressions — one narrow codegen pass per doc, no shuffle until the
  * oracle's output sort, which is exactly how a 100 TB extraction pass
  * should look (scan → narrow map → write).
  *
  * The documents fixture is plain text, so the query first builds a
  * deterministic HTML page around each doc (title from its first three
  * tokens, `<style>`/`<script>` blocks, nav + footer chrome, the body
  * split into two `<p>`s) — both engines synthesize the identical
  * markup, so the DuckDB oracle replays wrapping AND extraction
  * end-to-end rather than trusting the Spark side. The fixture text is
  * `[a-z0-9 ]` only (spec-pinned in TestdataDriftSpec territory), so
  * no escaping layer is needed.
  *
  * Extraction contract (the spec pins the round-trip): title =
  * `<title>` content; main text = tag-stripped body AFTER dropping
  * `<head>` (title/style/script live there), `<nav>`, and `<footer>` —
  * which reconstructs `title + ' ' + original text` exactly (the `<h1>`
  * repeats the title; the two `<p>`s reassemble the body with the
  * paragraph break collapsing to one space).
  */
object TextAnalysis4 {

  private def toks(text: Column): Column = split(text, " ", -1)

  /** First-3-tokens page title. */
  private def titleOf(text: Column): Column =
    array_join(slice(toks(text), 1, 3), " ")

  /** The deterministic HTML wrapper both engines build. */
  private def htmlOf(docId: Column, text: Column): Column = {
    val t = toks(text)
    val n = size(t)
    val half = floor((n + 1) / 2).cast("int")
    val title = titleOf(text)
    concat(
      lit("<html><head><title>"), title,
      lit("</title><style>body{margin:0;font:14px serif}</style>"),
      lit("<script>var d="), docId.cast("string"),
      lit(";track(d);</script></head><body>"),
      lit("<nav><a href=\"/\">Home</a> <a href=\"/about\">About</a></nav>"),
      lit("<div id=\"main\"><h1>"), title, lit("</h1><p>"),
      array_join(slice(t, lit(1), half), " "),
      lit("</p><p>"),
      array_join(slice(t, half + 1, greatest(n - half, lit(0))), " "),
      lit("</p></div><footer>copyright site "), docId.cast("string"),
      lit("</footer></body></html>"))
  }

  /** HTML → (title, main text, tag accounting). Lazy quantifiers keep
    * each block drop bounded to its own element; there are no nested
    * same-name elements in the wrapper, so the regex grammar is exact
    * for this markup (a production pass swaps this stage for a real
    * parser via the same narrow-map plan shape).
    */
  def textHtmlExtract(spark: SparkSession, dir: String): DataFrame = {
    val html = htmlOf(col("doc_id"), col("text"))
    val title = regexp_extract(col("html"), "<title>(.*?)</title>", 1)
    val noHead = regexp_replace(col("html"), "<head>.*?</head>", " ")
    val noChrome = regexp_replace(
      regexp_replace(noHead, "<nav>.*?</nav>", " "),
      "<footer>.*?</footer>", " ")
    val mainText = trim(regexp_replace(
      regexp_replace(noChrome, "<[^>]*>", " "), " +", " "))
    Tables.documents(spark, dir)
      .select(col("doc_id"), html.as("html"))
      .select(col("doc_id"),
        title.as("title"),
        mainText.as("main_text"),
        regexp_count(col("html"), lit("<[^>]*>")).cast("long").as("n_tags"),
        length(col("html")).cast("long").as("html_len"))
      .withColumn("text_ratio",
        round(length(col("main_text")).cast("double") /
          col("html_len").cast("double"), 4))
      .orderBy(col("doc_id"))
  }

  private val HtmlExtractOracle: String =
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |built AS (
      |  SELECT doc_id,
      |    '<html><head><title>'
      |    || array_to_string(list_slice(t, 1, 3), ' ')
      |    || '</title><style>body{margin:0;font:14px serif}</style>'
      |    || '<script>var d=' || doc_id
      |    || ';track(d);</script></head><body>'
      |    || '<nav><a href="/">Home</a> <a href="/about">About</a></nav>'
      |    || '<div id="main"><h1>'
      |    || array_to_string(list_slice(t, 1, 3), ' ')
      |    || '</h1><p>'
      |    || array_to_string(list_slice(t, 1, (len(t) + 1) // 2), ' ')
      |    || '</p><p>'
      |    || array_to_string(list_slice(t, (len(t) + 1) // 2 + 1, len(t)), ' ')
      |    || '</p></div><footer>copyright site ' || doc_id
      |    || '</footer></body></html>' AS html
      |  FROM t),
      |ext AS (
      |  SELECT doc_id, html,
      |    regexp_extract(html, '<title>(.*?)</title>', 1) AS title,
      |    trim(regexp_replace(regexp_replace(
      |      regexp_replace(regexp_replace(regexp_replace(html,
      |        '<head>.*?</head>', ' '),
      |        '<nav>.*?</nav>', ' '),
      |        '<footer>.*?</footer>', ' '),
      |      '<[^>]*>', ' ', 'g'), ' +', ' ', 'g')) AS main_text
      |  FROM built)
      |SELECT doc_id, title, main_text,
      |  cast(len(regexp_extract_all(html, '<[^>]*>')) AS BIGINT) AS n_tags,
      |  cast(length(html) AS BIGINT) AS html_len,
      |  round(cast(length(main_text) AS DOUBLE) / length(html), 4)
      |    AS text_ratio
      |FROM ext ORDER BY doc_id""".stripMargin

  val registry: Seq[QueryDef] = Seq(
    QueryDef("text_html_extract", textHtmlExtract _, HtmlExtractOracle))
}
