package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.US_ASCII

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.WarcCodec
import graft.operators.Pipeline9

/** Contract of the `.warc.gz` ingestion stack: the multi-member gzip
  * walk (round trips, the JDK's own GZIPInputStream as an independent
  * reader of our streams, optional header fields, checksum/trailer
  * enforcement), the WARC/HTTP record parse, and a driver-side
  * recompute of the registered lane's rows.
  */
class WarcCodecSpec extends AnyFunSuite with SparkTestBase {

  private def bytes(n: Int, f: Int => Int): Array[Byte] =
    Array.tabulate(n)(i => f(i).toByte)

  // ------------------------------------------------------- gzip members

  test("gzipWrap -> gzipMembers round-trips multi-member archives") {
    val recs = Seq(
      bytes(5000, i => (i / 7) % 256),          // compressible
      bytes(3001, i => ((i * 2654435761L >>> 9) % 256).toInt), // noise
      Array.empty[Byte],                          // empty member
      bytes(1, _ => 65))
    val gz = WarcCodec.gzipWrap(recs)
    val got = WarcCodec.gzipMembers(gz)
      .fold(e => fail(s"walk failed: $e"), identity)
    assert(got.length === recs.length)
    got.zip(recs).zipWithIndex.foreach { case ((g, r), i) =>
      assert(g.toSeq === r.toSeq, s"member $i mismatch")
    }
    assert(WarcCodec.gzipMembers(Array.empty[Byte]) === Right(Vector()))
  }

  test("the JDK's GZIPInputStream reads our multi-member stream") {
    val recs = Seq(bytes(800, i => (i * 3) % 256), bytes(1200, i => i % 251))
    val gz = WarcCodec.gzipWrap(recs)
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(gz))
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](512)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    assert(out.toByteArray.toSeq === recs.flatten.toSeq,
      "JDK reader disagrees with our multi-member layout")
  }

  /** Hand-assemble one member with the optional FEXTRA + FNAME +
    * FCOMMENT + FHCRC fields set — the header shapes real crawlers
    * emit that the plain fixture never exercises.
    */
  test("member walk handles FEXTRA/FNAME/FCOMMENT/FHCRC header fields") {
    val data = bytes(300, i => (i * 11) % 256)
    val d = new java.util.zip.Deflater(6, true)
    d.setInput(data); d.finish()
    val defl = new ByteArrayOutputStream()
    val tmp = new Array[Byte](1024)
    while (!d.finished()) defl.write(tmp, 0, d.deflate(tmp))
    d.end()
    // header assembled separately: RFC 1952 FHCRC is CRC-32-low-16 over
    // every header byte before the field, which the walk now VERIFIES
    val hdr = new ByteArrayOutputStream()
    hdr.write(Array[Byte](0x1f, 0x8b.toByte, 8, (2 | 4 | 8 | 16).toByte,
      0, 0, 0, 0, 0, 0xff.toByte), 0, 10)
    hdr.write(Array[Byte](3, 0, 1, 2, 3), 0, 5)       // FEXTRA: XLEN=3
    hdr.write("name.warc".getBytes(US_ASCII)); hdr.write(0) // FNAME
    hdr.write("comment".getBytes(US_ASCII)); hdr.write(0)   // FCOMMENT
    val hcrc = new java.util.zip.CRC32(); hcrc.update(hdr.toByteArray)
    val h16 = (hcrc.getValue & 0xffff).toInt
    def assemble(fhcrcLo: Int, fhcrcHi: Int): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      out.write(hdr.toByteArray)
      out.write(Array[Byte](fhcrcLo.toByte, fhcrcHi.toByte), 0, 2) // FHCRC
      out.write(defl.toByteArray)
      val crc = new java.util.zip.CRC32(); crc.update(data)
      val v = crc.getValue.toInt
      out.write(Array[Byte](v.toByte, (v >>> 8).toByte, (v >>> 16).toByte,
        (v >>> 24).toByte), 0, 4)
      out.write(Array[Byte]((data.length & 0xff).toByte,
        (data.length >>> 8).toByte, 0, 0), 0, 4)
      out.toByteArray
    }
    val got = WarcCodec.gzipMembers(assemble(h16 & 0xff, h16 >>> 8))
      .fold(e => fail(s"flagged-header member failed: $e"), identity)
    assert(got.length === 1 && got(0).toSeq === data.toSeq)
    // corrupted optional header with an intact payload must quarantine
    assert(WarcCodec.gzipMembers(assemble(h16 ^ 0x1, h16 >>> 8)).isLeft,
      "FHCRC mismatch must quarantine even though the payload inflates")
  }

  test("corruption quarantines: CRC, ISIZE, trailer, magic, flags") {
    val gz = WarcCodec.gzipWrap(Seq(bytes(400, i => (i * 5) % 256)))
    def flip(at: Int): Array[Byte] = {
      val c = gz.clone(); c(at) = (c(at) ^ 0x1).toByte; c
    }
    assert(WarcCodec.gzipMembers(flip(gz.length - 8)).isLeft, "CRC flip")
    assert(WarcCodec.gzipMembers(flip(gz.length - 4)).isLeft, "ISIZE flip")
    assert(WarcCodec.gzipMembers(gz.dropRight(3)).isLeft, "trailer cut")
    assert(WarcCodec.gzipMembers(flip(0)).isLeft, "bad magic")
    val badFlg = gz.clone(); badFlg(3) = 0x20
    assert(WarcCodec.gzipMembers(badFlg).isLeft, "reserved FLG bit")
    val badCm = gz.clone(); badCm(2) = 7
    assert(WarcCodec.gzipMembers(badCm).isLeft, "non-deflate method")
  }

  test("a corrupt FIRST member blocks the walk (boundaries need inflate)") {
    val gz = WarcCodec.gzipWrap(
      Seq(bytes(200, _ => 1), bytes(200, _ => 2)))
    val c = gz.clone()
    c(12) = (c(12) ^ 0x7f).toByte // inside member 1's deflate stream
    assert(WarcCodec.gzipMembers(c).isLeft)
  }

  // --------------------------------------------------------- WARC parse

  test("parseWarc round-trips the fixture record") {
    val rec = Pipeline9.warcRecordBytes(42L, "<html><body>hi there</body></html>")
    val r = WarcCodec.parseWarc(rec).fold(e => fail(e), identity)
    assert(r.warcType === "response")
    assert(r.recordId === "<urn:uuid:42>")
    assert(r.targetUri === "https://host12.example.com/doc/42")
    assert(r.warcDate === Pipeline9.WarcDate)
    assert(r.httpStatus === 200)
    assert(r.contentType === "text/html; charset=utf-8")
    assert(r.html === "<html><body>hi there</body></html>")
    // warcLen = HTTP head + body
    assert(r.warcLen ===
      ("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n" +
        s"Content-Length: ${r.html.length}\r\n\r\n").length + r.html.length)
  }

  test("WARC/HTTP header names are case-insensitive") {
    val rec = new String(Pipeline9.warcRecordBytes(7L, "<p>x</p>"), US_ASCII)
      .replace("WARC-Target-URI", "warc-target-uri")
      .replace("Content-Type", "CONTENT-TYPE")
      .getBytes(US_ASCII)
    val r = WarcCodec.parseWarc(rec).fold(e => fail(e), identity)
    assert(r.targetUri === "https://host7.example.com/doc/7")
    assert(r.contentType === "text/html; charset=utf-8")
  }

  test("WARC parse quarantines: version, trailer, lengths, type") {
    val ok = Pipeline9.warcRecordBytes(1L, "<p>body</p>")
    val badVer = ("WARC/0.9" + new String(ok, US_ASCII).drop(8))
      .getBytes(US_ASCII)
    assert(WarcCodec.parseWarc(badVer).isLeft, "version")
    assert(WarcCodec.parseWarc(ok.dropRight(2)).isLeft, "trailer")
    val badLen = new String(ok, US_ASCII)
      .replaceFirst("Content-Length: ", "Content-Length: 9")
      .getBytes(US_ASCII) // first CL is the WARC one — now overruns
    assert(WarcCodec.parseWarc(badLen).isLeft, "warc length")
    val req = new String(ok, US_ASCII)
      .replace("WARC-Type: response", "WARC-Type: requestt")
      .getBytes(US_ASCII) // same byte length, different type
    assert(WarcCodec.parseWarc(req).isLeft, "non-response type")
  }

  // ------------------------------------------------------------- robots

  test("parseRobots: group structure, decoy isolation, comments, delay") {
    val (rules, delay) = Pipeline9.parseRobots(Pipeline9.robotsTxtOf(3))
    // only the * group's rules survive — the bad-bot Disallow: / must
    // NOT appear (applying it would block every page on the host)
    assert(rules === Seq(
      Pipeline9.RobotsRule(allow = false, "/doc/3"),
      Pipeline9.RobotsRule(allow = true, "/doc/33"),
      Pipeline9.RobotsRule(allow = false, "/admin")))
    assert(delay === 4L) // 3 % 5 + 1
    // absent file (the h % 7 == 6 class): no rules, no delay
    assert(Pipeline9.robotsTxtOf(13) === "")
    assert(Pipeline9.parseRobots("") === (Seq.empty, 0L))
    // key case-insensitivity + empty Disallow dropped (allow-all) +
    // a trailing group must not leak into *
    val (r2, d2) = Pipeline9.parseRobots(
      "USER-AGENT: *\nDISALLOW: /x\nDisallow:\nCRAWL-DELAY: 7\n\n" +
        "User-agent: other\nDisallow: /y\n")
    assert(r2 === Seq(Pipeline9.RobotsRule(allow = false, "/x")))
    assert(d2 === 7L)
    // a multi-agent group introduction (ua run) including * applies
    val (r3, _) = Pipeline9.parseRobots(
      "User-agent: a\nUser-agent: *\nDisallow: /z\n")
    assert(r3 === Seq(Pipeline9.RobotsRule(allow = false, "/z")))
  }

  test("robotsDecision: longest match wins, allow wins ties, default allow") {
    val rules = Seq(
      Pipeline9.RobotsRule(allow = false, "/doc/1"),
      Pipeline9.RobotsRule(allow = true, "/doc/11"),
      Pipeline9.RobotsRule(allow = false, "/admin"))
    assert(Pipeline9.robotsDecision("/doc/15", rules) === ((false, "/doc/1")))
    assert(Pipeline9.robotsDecision("/doc/115", rules) === ((true, "/doc/11")))
    assert(Pipeline9.robotsDecision("/doc/2", rules) === ((true, "")))
    assert(Pipeline9.robotsDecision("/admin/x", rules) === ((false, "/admin")))
    // equal length: least restrictive (allow) wins — RFC 9309
    val tie = Seq(Pipeline9.RobotsRule(allow = false, "/p"),
      Pipeline9.RobotsRule(allow = true, "/p"))
    assert(Pipeline9.robotsDecision("/p/q", tie)._1 === true)
  }

  test("pipeline_robots_filter: driver-side recompute at sf0.001") {
    import scala.jdk.CollectionConverters._
    val got = Pipeline9.pipelineRobotsFilter(spark, sf0001)
      .collectAsList().asScala.toVector
    val ids = Tables.documents(spark, sf0001)
      .select("doc_id").collectAsList().asScala.map(_.getLong(0)).toVector
    assert(got.length === ids.length)
    got.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val h = (id % 30).toInt
      val (rules, delay) = Pipeline9.parseRobots(Pipeline9.robotsTxtOf(h))
      val (allowed, rule) = Pipeline9.robotsDecision(s"/doc/$id", rules)
      assert(r.getAs[Boolean]("allowed") === allowed, s"verdict of $id")
      assert(r.getAs[String]("matched_rule") === rule, s"rule of $id")
      assert(r.getAs[Long]("crawl_delay") === delay, s"delay of $id")
    }
    // the fixture genuinely splits: blocked, allowed-by-default, and
    // allowed-by-longer-Allow-rule classes all present
    assert(got.exists(!_.getAs[Boolean]("allowed")), "no blocked pages")
    assert(got.exists(r => r.getAs[Boolean]("allowed") &&
      r.getAs[String]("matched_rule").nonEmpty), "no allow-rule winners")
    assert(got.exists(r => r.getAs[Boolean]("allowed") &&
      r.getAs[String]("matched_rule").isEmpty), "no default-allowed pages")
  }

  // ----------------------------------------------------- registered lane

  test("pipeline_warc_ingest: driver-side recompute at sf0.001") {
    import scala.jdk.CollectionConverters._
    val got = Pipeline9.pipelineWarcIngest(spark, sf0001)
      .collectAsList().asScala.toVector
    val docs = Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "text").collectAsList().asScala
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.length === docs.size, "one output row per document")
    // every row's fields replay from (doc_id, text) alone
    got.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val text = docs(id)
      val title = text.split(" ", -1).take(3).mkString(" ")
      assert(r.getAs[String]("title") === title, s"title of $id")
      // main text reconstructs title + ' ' + text (TextAnalysis4 contract)
      assert(r.getAs[Long]("main_len") === title.length + 1 + text.length,
        s"main_len of $id")
      assert(r.getAs[String]("target_uri") ===
        s"https://host${id % 30}.example.com/doc/$id")
      assert(r.getAs[Long]("http_status") === 200L)
      val htmlLen = r.getAs[Long]("html_len")
      val head = "HTTP/1.1 200 OK\r\n" +
        "Content-Type: text/html; charset=utf-8\r\n" +
        s"Content-Length: $htmlLen\r\n\r\n"
      assert(r.getAs[Long]("record_len") === head.length + htmlLen,
        s"record_len of $id")
      assert(r.getAs[Long]("shard_id") === id % Pipeline9.WarcShards)
    }
    // member_index is the per-shard doc_id rank
    got.groupBy(_.getAs[Long]("shard_id")).foreach { case (sid, rows) =>
      val byDoc = rows.sortBy(_.getAs[Long]("doc_id"))
      byDoc.zipWithIndex.foreach { case (r, i) =>
        assert(r.getAs[Long]("member_index") === i.toLong,
          s"member order in shard $sid")
      }
    }
  }
}
