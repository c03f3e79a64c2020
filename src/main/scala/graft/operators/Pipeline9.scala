package graft.operators

import java.nio.charset.StandardCharsets.{US_ASCII, UTF_8}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.WarcCodec

/** Pipeline tier 9: web-archive INGESTION — the step BEFORE every other
  * crawl-pipeline lane. A crawl-derived corpus arrives as `.warc.gz`
  * shards (the Common Crawl layout: multi-member gzip, ONE member per
  * WARC record, so shards are splittable at member boundaries without
  * a central index). This tier decodes that stack end-to-end with the
  * repo's own codecs: gzip member walk → hand-written RFC 1951 inflate
  * ([[graft.functions.PngCodec.inflateEx]]) → CRC-32/ISIZE trailer
  * verification → WARC/1.0 record parse → HTTP response parse → the
  * SAME main-text extraction chain `text_html_extract` runs
  * ([[TextAnalysis4.mainTextOf]]), so ingestion and extraction provably
  * compose.
  *
  * Fixture: each document's page (the `text_html_extract` HTML wrapper)
  * is wrapped in an HTTP/1.1 response, a WARC response record, and a
  * gzip member compressed by the JVM's OWN Deflater — the PNG-fixture
  * discipline: the hand-written inflate runs on a stream it did not
  * shape. Records are grouped into [[WarcShards]] shard archives (the
  * stand-in for reading real `.warc.gz` objects off storage).
  *
  * Oracle: replays the synthesis formulas — the HTML wrap, the HTTP
  * head's own string arithmetic (Content-Length digits included), the
  * URI/record-id formulas, and the per-shard member ordering — and
  * never touches gzip, deflate, or byte framing: Spark earns every
  * value by walking real compressed archives.
  *
  * Scale: decode is embarrassingly parallel per shard (narrow
  * mapPartitions, no state); the one exchange is the fixture's
  * shard-grouping shuffle, which at production is the storage layout
  * rather than a query step. At 100 TB the unit of parallelism is the
  * archive shard — exactly how Common Crawl is consumed — and a
  * corrupt member quarantines its shard loudly instead of silently
  * truncating (member boundaries are only discoverable by inflating,
  * so bytes past a corruption are unreachable by construction).
  */
object Pipeline9 {

  /** Archive shards the fixture packs records into. */
  val WarcShards = 24

  /** Deterministic WARC-Date (the capture-time field). */
  val WarcDate = "2026-01-01T00:00:00Z"

  /** Target-URI host space — [[Pipeline8.CrawledHosts]], tying the
    * ingested pages to the same host universe the link-graph and
    * frontier lanes rank.
    */
  private def uriOf(docId: Long): String =
    s"https://host${docId % Pipeline8.CrawledHosts}.example.com/doc/$docId"

  /** One WARC/1.0 response record: WARC named fields, then the
    * HTTP/1.1 response whose body is the page markup. Both
    * Content-Length fields count BYTES (the fixture text is ASCII, so
    * the oracle's character arithmetic replays them exactly).
    */
  private[graft] def warcRecordBytes(docId: Long,
      html: String): Array[Byte] = {
    val htmlB = html.getBytes(UTF_8)
    val httpHead = ("HTTP/1.1 200 OK\r\n" +
      "Content-Type: text/html; charset=utf-8\r\n" +
      s"Content-Length: ${htmlB.length}\r\n\r\n").getBytes(US_ASCII)
    val httpLen = httpHead.length + htmlB.length
    val warcHead = ("WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      s"WARC-Record-ID: <urn:uuid:$docId>\r\n" +
      s"WARC-Date: $WarcDate\r\n" +
      s"WARC-Target-URI: ${uriOf(docId)}\r\n" +
      s"Content-Length: $httpLen\r\n\r\n").getBytes(US_ASCII)
    val out = new Array[Byte](warcHead.length + httpLen + 4)
    System.arraycopy(warcHead, 0, out, 0, warcHead.length)
    System.arraycopy(httpHead, 0, out, warcHead.length, httpHead.length)
    System.arraycopy(htmlB, 0, out, warcHead.length + httpHead.length,
      htmlB.length)
    out(out.length - 4) = '\r'
    out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'
    out(out.length - 1) = '\n'
    out
  }

  /** Fixture stage: (shard_id, multi-member `.warc.gz` payload). */
  private[operators] def warcShards(spark: SparkSession,
      dir: String): Dataset[(Long, Array[Byte])] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        TextAnalysis4.htmlOf(col("doc_id"), col("text")).as("html"))
      .groupBy(pmod(col("doc_id"), lit(WarcShards.toLong)).as("shard_id"))
      .agg(sort_array(collect_list(
        struct(col("doc_id").as("_1"), col("html").as("_2")))).as("recs"))
      .as[(Long, Seq[(Long, String)])]
      .map { case (sid, recs) =>
        (sid, WarcCodec.gzipWrap(
          recs.map { case (id, h) => warcRecordBytes(id, h) }))
      }
  }

  /** The ingestion lane: decode the archives back to per-page rows.
    * A malformed member/record emits nothing — the oracle's row-count
    * comparison is the loud canary (the registered fixture is
    * all-valid; quarantine classes are spec-pinned at the codec level
    * in WarcCodecSpec).
    */
  def pipelineWarcIngest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rows = warcShards(spark, dir)
      .mapPartitions { it =>
        it.flatMap { case (sid, payload) =>
          WarcCodec.gzipMembers(payload) match {
            case Left(_) => Iterator.empty
            case Right(ms) =>
              ms.iterator.zipWithIndex.flatMap { case (m, i) =>
                WarcCodec.parseWarc(m).toOption.flatMap { r =>
                  val idStr = r.recordId
                    .stripPrefix("<urn:uuid:").stripSuffix(">")
                  idStr.toLongOption.map { id =>
                    (sid, i.toLong, id, r.targetUri, r.warcDate,
                      r.httpStatus.toLong, r.contentType, r.warcLen.toLong,
                      r.html)
                  }
                }
              }
          }
        }
      }
      .toDF("shard_id", "member_index", "doc_id", "target_uri",
        "warc_date", "http_status", "content_type", "record_len", "html")
    rows
      .withColumn("title",
        regexp_extract(col("html"), "<title>(.*?)</title>", 1))
      .withColumn("main_len",
        length(TextAnalysis4.mainTextOf(col("html"))).cast("long"))
      .withColumn("html_len", length(col("html")).cast("long"))
      .drop("html")
      .orderBy(col("doc_id"))
  }

  /** Replays the synthesis: the HTML wrap (text_html_extract's built
    * CTE), the HTTP head built with the same CRLF string arithmetic
    * (so Content-Length's own digit count participates), the URI and
    * record-id formulas, and member_index as the per-shard doc_id
    * rank. gzip/deflate/WARC framing never appears — Spark earns those
    * by decoding real bytes.
    */
  private val WarcIngestOracle: String =
    s"""WITH t AS (
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
      |rec AS (
      |  SELECT doc_id, html,
      |    cast(doc_id % $WarcShards AS BIGINT) AS shard_id,
      |    'https://host' || cast(doc_id % ${Pipeline8.CrawledHosts}
      |      AS VARCHAR) || '.example.com/doc/' || doc_id AS target_uri,
      |    length(html) AS html_len,
      |    length('HTTP/1.1 200 OK' || chr(13) || chr(10)
      |      || 'Content-Type: text/html; charset=utf-8'
      |      || chr(13) || chr(10)
      |      || 'Content-Length: ' || cast(length(html) AS VARCHAR)
      |      || chr(13) || chr(10) || chr(13) || chr(10))
      |      + length(html) AS record_len
      |  FROM built)
      |SELECT shard_id,
      |  cast(row_number() OVER (PARTITION BY shard_id ORDER BY doc_id) - 1
      |    AS BIGINT) AS member_index,
      |  doc_id, target_uri,
      |  '$WarcDate' AS warc_date,
      |  cast(200 AS BIGINT) AS http_status,
      |  'text/html; charset=utf-8' AS content_type,
      |  cast(record_len AS BIGINT) AS record_len,
      |  regexp_extract(html, '<title>(.*?)</title>', 1) AS title,
      |  cast(length(trim(regexp_replace(regexp_replace(
      |    regexp_replace(regexp_replace(regexp_replace(html,
      |      '<head>.*?</head>', ' '),
      |      '<nav>.*?</nav>', ' '),
      |      '<footer>.*?</footer>', ' '),
      |    '<[^>]*>', ' ', 'g'), ' +', ' ', 'g'))) AS BIGINT) AS main_len,
      |  cast(length(html) AS BIGINT) AS html_len
      |FROM rec ORDER BY doc_id""".stripMargin

  val registry: Seq[QueryDef] = Seq(
    QueryDef("pipeline_warc_ingest", pipelineWarcIngest _, WarcIngestOracle))
}
