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

  /** The deterministic HTML wrapper both engines build (shared with
    * the WARC ingestion lane, which wraps the same page markup in
    * HTTP + WARC + gzip layers — [[Pipeline9]]).
    */
  private[graft] def htmlOf(docId: Column, text: Column): Column = {
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
  /** Tag-strip + chrome-drop main-text extraction over an `html`
    * column — the one extraction chain, shared with the WARC lane so
    * ingestion and extraction provably agree.
    */
  private[operators] def mainTextOf(html: Column): Column = {
    val noHead = regexp_replace(html, "<head>.*?</head>", " ")
    val noChrome = regexp_replace(
      regexp_replace(noHead, "<nav>.*?</nav>", " "),
      "<footer>.*?</footer>", " ")
    trim(regexp_replace(
      regexp_replace(noChrome, "<[^>]*>", " "), " +", " "))
  }

  def textHtmlExtract(spark: SparkSession, dir: String): DataFrame = {
    val html = htmlOf(col("doc_id"), col("text"))
    val title = regexp_extract(col("html"), "<title>(.*?)</title>", 1)
    val mainText = mainTextOf(col("html"))
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

  // --------------------------------------------------------------- BM25

  /** Query-doc cadence (every Nth doc is a retrieval query). */
  private val Bm25QueryEvery = 50

  /** Query terms per query / retrieved docs per query. */
  private val Bm25Terms = 3
  private val Bm25TopK = 10

  /** BM25 retrieval — the RAG-era scoring stage over an inverted
    * index: every [[Bm25QueryEvery]]th doc poses a query (its first
    * [[Bm25Terms]] distinct tokens, in document order), candidates are
    * every doc sharing a query term, and each (query, doc) pair gets
    * the Okapi BM25 score with k1=1.2, b=0.75 (Lucene's non-negative
    * `ln(1 + (N-df+0.5)/(df+0.5))` idf). The top [[Bm25TopK]] docs per
    * query are ranked by EXACT INTEGER keys — matched-term count,
    * total matched tf, doc length, doc id — with the float score
    * attached as a VALUE column, deliberately: float-rank order is
    * engine-nondeterministic at ties (the repo's standing discipline —
    * tfidf's scaladoc), and the integer keys are BM25's own dominant
    * factors, so the ordering is a faithful deterministic surrogate; a
    * production consumer flips one orderBy to rank by the float.
    *
    * Scale shape: tf and dl are one doc-keyed combine each; df
    * re-aggregates tf's distinct pairs (no second corpus scan). The
    * query side is benchmark-sized, so candidate generation is a
    * BROADCAST join against the tf table (term-keyed inverted-index
    * probe — at 100 TB this is the posting-list read), df (≤|vocab|
    * rows) broadcasts, the scalars ride one-row attaches, and the
    * top-k filter lowers to WindowGroupLimit so each map task ships k
    * rows per query. Float discipline: every score input (tf, df, dl,
    * N, Σdl) is an exact integer; the per-term contribution runs the
    * identical IEEE op sequence in both engines and is then pinned to
    * an exact integer NANO-unit (floor(c·1e9 + 0.5) as long) BEFORE the
    * per-pair sum — integer addition is order-independent, so the score
    * can never move with partitioning, with no per-group array
    * buffering (the emb_matryoshka discipline; the collect→sort→fold
    * form this replaced allocated an array per (query, doc) group —
    * measurable GC pressure at the 100× probe volume). The final
    * nano→double division and r4 grain are the same op sequence both
    * engines; ln carries the documented rule-14 drift budget,
    * value-pinned, never rank-ordered.
    */
  def textBm25(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
    val tok = docs
      .select(col("doc_id"),
        posexplode(split(col("text"), " ", -1)).as(Seq("pos", "w")))
      .filter(col("w") =!= "")
    val tf = tok.groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("tf"))
    val dl = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val dfT = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    // both corpus scalars in ONE aggregate pass (one 1-row broadcast
    // attach, not two): Σdl re-derived as per-doc non-empty token-array
    // sizes — exact integers, equal to sum(dl) by construction
    val scalars = docs.agg(count(lit(1)).as("n_docs"),
      sum(size(filter(split(col("text"), " ", -1), w => w =!= "")))
        .cast("long").as("sumdl"))
    val wq = Window.partitionBy(col("query_id")).orderBy(col("min_pos"))
    val qterms = tok.filter(col("doc_id") % Bm25QueryEvery === 0)
      .groupBy(col("doc_id"), col("w")).agg(min(col("pos")).as("min_pos"))
      .select(col("doc_id").as("query_id"), col("w"), col("min_pos"))
      .withColumn("qrn", row_number().over(wq))
      .filter(col("qrn") <= Bm25Terms)
      .select(col("query_id"), col("w"))
    val avgdl = col("sumdl").cast("double") / col("n_docs").cast("double")
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val contrib = idf * ((col("tf") * lit(2.2)) /
      (col("tf") + lit(1.2) * (lit(0.25) +
        lit(0.75) * (col("dl").cast("double") / avgdl))))
    val wr = Window.partitionBy(col("query_id"))
      .orderBy(col("n_match").desc, col("tot_tf").desc, col("dl"),
        col("doc_id"))
    tf.join(broadcast(qterms), Seq("w"))
      .join(broadcast(dfT), Seq("w"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(scalars))
      .withColumn("contrib_nano",
        floor(contrib * 1e9 + 0.5).cast("long"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_match"), sum(col("tf")).as("tot_tf"),
        min(col("dl")).as("dl"),
        sum(col("contrib_nano")).as("score_nano"))
      .withColumn("score",
        Tables.r4(col("score_nano").cast("double") / 1e9))
      .withColumn("rank", row_number().over(wr).cast("long"))
      .filter(col("rank") <= Bm25TopK)
      .select(col("query_id"), col("rank"), col("doc_id"), col("n_match"),
        col("tot_tf"), col("dl"), col("score"))
      .orderBy(col("query_id"), col("rank"))
  }

  private val Bm25Oracle: String =
    s"""WITH tokarr AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |tok AS (
      |  SELECT doc_id, i AS pos, t[i] AS w
      |  FROM tokarr, unnest(generate_series(1, len(t))) AS s(i)
      |  WHERE t[i] <> ''),
      |tf AS (
      |  SELECT doc_id, w, cast(count(*) AS BIGINT) AS tf
      |  FROM tok GROUP BY doc_id, w),
      |dl AS (
      |  SELECT doc_id, cast(count(*) AS BIGINT) AS dl
      |  FROM tok GROUP BY doc_id),
      |dfr AS (SELECT w, cast(count(*) AS BIGINT) AS df FROM tf GROUP BY w),
      |sc AS (
      |  SELECT cast(count(*) AS BIGINT) AS n_docs,
      |    (SELECT cast(sum(dl) AS BIGINT) FROM dl) AS sumdl
      |  FROM documents),
      |qt AS (
      |  SELECT query_id, w FROM (
      |    SELECT doc_id AS query_id, w,
      |      row_number() OVER (PARTITION BY doc_id ORDER BY min_pos) AS qrn
      |    FROM (
      |      SELECT doc_id, w, min(pos) AS min_pos FROM tok
      |      WHERE doc_id % $Bm25QueryEvery = 0 GROUP BY doc_id, w))
      |  WHERE qrn <= $Bm25Terms),
      |con AS (
      |  SELECT qt.query_id, tf.doc_id, tf.w, tf.tf, dl.dl,
      |    ln(1.0 + (sc.n_docs - dfr.df + 0.5) / (dfr.df + 0.5)) *
      |      ((tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 +
      |        0.75 * (dl.dl / (cast(sc.sumdl AS DOUBLE) / sc.n_docs)))))
      |      AS contrib
      |  FROM qt JOIN tf USING (w) JOIN dfr USING (w)
      |    JOIN dl ON dl.doc_id = tf.doc_id, sc),
      |g AS (
      |  SELECT query_id, doc_id,
      |    cast(count(*) AS BIGINT) AS n_match,
      |    cast(sum(tf) AS BIGINT) AS tot_tf,
      |    min(dl) AS dl,
      |    cast(sum(cast(floor(contrib * 1000000000.0 + 0.5) AS BIGINT))
      |      AS BIGINT) AS score_nano
      |  FROM con GROUP BY query_id, doc_id),
      |r AS (
      |  SELECT *, row_number() OVER (PARTITION BY query_id
      |    ORDER BY n_match DESC, tot_tf DESC, dl, doc_id) AS rnk
      |  FROM g)
      |SELECT query_id, cast(rnk AS BIGINT) AS rank, doc_id, n_match,
      |  tot_tf, dl,
      |  floor(cast(score_nano AS DOUBLE) / 1000000000.0 * 10000 + 0.5)
      |    / 10000 AS score
      |FROM r WHERE rnk <= $Bm25TopK ORDER BY query_id, rank""".stripMargin

  /** Hosts in the synthetic web for [[pipelineLinkGraph]]. */
  private val LinkHosts = 50

  /** Crawl-pipeline LINK-GRAPH construction — the step between HTML
    * extraction and the graph tier that every web-corpus pipeline
    * runs: pages carry genuine anchor tags (the fixture embeds
    * 2 + doc_id % 4 absolute outbound links per page, hrefs following
    * a fixed formula of (doc_id, link ordinal), beside the RELATIVE
    * nav links the extractor must NOT count), outbound hosts are
    * regexp-extracted from the markup, and the host→host edge list is
    * aggregated with both multiplicities a link-graph consumer needs:
    * total anchor count and distinct linking documents. Self-edges are
    * retained (a consumer drops or keeps them by policy; dropping here
    * would hide information). One scan → explode → one aggregate; at
    * 100 TB the only shuffle is edge-keyed and carries (src, dst)
    * pairs, never page bytes — the host graph is then the input the
    * q78/q109 tier consumes.
    */
  def pipelineLinkGraph(spark: SparkSession, dir: String): DataFrame = {
    val k = (col("doc_id") % 4 + 2).cast("int")
    val links = transform(sequence(lit(0), k - 1), j =>
      concat(lit("<a href=\"https://host"),
        ((col("doc_id") * 7 + j * 13) % LinkHosts).cast("string"),
        lit(".example.com/p"), j.cast("string"),
        lit("\">ref</a>")))
    val html = concat(
      lit("<html><head><title>page</title></head><body>"),
      lit("<nav><a href=\"/\">Home</a> <a href=\"/about\">About</a></nav>"),
      lit("<p>"), col("text"), lit("</p><div class=\"refs\">"),
      array_join(links, " "),
      lit("</div></body></html>"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), html.as("html"))
      .select(col("doc_id"),
        concat(lit("host"), (col("doc_id") % LinkHosts).cast("string"))
          .as("src_host"),
        explode(regexp_extract_all(col("html"),
          lit("href=\"https://(host[0-9]+)\\.example\\.com[^\"]*\""), lit(1)))
          .as("dst_host"))
      .groupBy(col("src_host"), col("dst_host"))
      .agg(count(lit(1)).as("n_links"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("src_host"), col("dst_host"))
  }

  private val LinkGraphOracle: String =
    s"""WITH links AS (
      |  SELECT doc_id,
      |    'host' || CAST(doc_id % $LinkHosts AS VARCHAR) AS src_host,
      |    'host' || CAST((doc_id * 7 + j.j * 13) % $LinkHosts AS VARCHAR)
      |      AS dst_host
      |  FROM documents,
      |    LATERAL unnest(generate_series(0, 1 + doc_id % 4)) AS j(j))
      |SELECT src_host, dst_host,
      |  CAST(count(*) AS BIGINT) AS n_links,
      |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
      |FROM links GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val registry: Seq[QueryDef] = Seq(
    // the oracle replays the LINK SYNTHESIS formula; Spark earns the
    // same edges only by extracting the anchors back out of the markup
    // (and by correctly ignoring the relative nav links)
    QueryDef("pipeline_link_graph", pipelineLinkGraph _, LinkGraphOracle),
    QueryDef("text_html_extract", textHtmlExtract _, HtmlExtractOracle),
    QueryDef("text_bm25", textBm25 _, Bm25Oracle))
}
