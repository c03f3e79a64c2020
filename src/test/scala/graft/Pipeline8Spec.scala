package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Pipeline8

/** Driver-side recomputes for the governance tier: deletion
  * propagation (shard/chunk/token purge accounting + the integer
  * rewrite rule) and crawl-frontier selection (anchor re-extraction,
  * crawled-set exclusion, two-key ranked cut).
  */
class Pipeline8Spec extends AnyFunSuite with SparkTestBase {

  private def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map(b => f"$b%02x").mkString
  }

  private lazy val docs: Seq[(Long, String)] =
    Tables.documents(spark, sf0001).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

  test("pipeline_forget: brute-force shard accounting and rewrite rule") {
    case class Acc(var docs: Long = 0, var docsP: Long = 0,
      var chunks: Long = 0, var chunksP: Long = 0,
      var toks: Long = 0, var toksP: Long = 0)
    val acc = Array.fill(8)(Acc())
    docs.foreach { case (id, text) =>
      val shard = (java.lang.Long.parseLong(
        md5Hex(s"shuf:$id").substring(0, 8), 16) % 8).toInt
      val nTok = text.toLowerCase.split(" ", -1).length.toLong
      val nChunks = (nTok - 1) / operators.Pipeline4.ChunkS + 1
      val del = id % Pipeline8.ForgetEvery == 0
      val a = acc(shard)
      a.docs += 1; a.chunks += nChunks; a.toks += nTok
      if (del) { a.docsP += 1; a.chunksP += nChunks; a.toksP += nTok }
    }
    val got = Pipeline8.pipelineForget(spark, sf0001).collect()
    assert(got.length === 8)
    got.foreach { r =>
      val a = acc(r.getLong(0).toInt)
      assert(r.getLong(1) === a.docs)
      assert(r.getLong(2) === a.docsP)
      assert(r.getLong(3) === a.chunks)
      assert(r.getLong(4) === a.chunksP)
      assert(r.getLong(5) === a.toks)
      assert(r.getLong(6) === a.toksP)
      val rewrite = a.toksP * Pipeline8.RewriteDenom >= a.toks && a.docsP > 0
      assert(r.getString(7) === (if (rewrite) "rewrite" else "tombstone"))
    }
    // the threshold sits AT the request rate, so the per-shard draw must
    // genuinely split the fleet — a degenerate all-one-way decision
    // column would mean the rule tests nothing
    val actions = got.map(_.getString(7)).toSet
    assert(actions === Set("rewrite", "tombstone"),
      s"decision column degenerate: $actions")
  }

  test("pipeline_crawl_frontier: brute-force frontier ranking") {
    val h = Pipeline8.CrawledHosts
    // replay the synthesis: edges (docId, src, dst)
    val edges = docs.flatMap { case (id, _) =>
      val n = (id % 4 + 2).toInt
      (0 until n).map(j =>
        (id, s"host${id % h}", s"host${(id * 7 + j * 13) % (2 * h)}"))
    }
    val crawledSet = edges.map(_._2).toSet
    val expect = edges.groupBy(_._3)
      .filterNot { case (dst, _) => crawledSet(dst) }
      .map { case (dst, es) =>
        (dst, es.size.toLong, es.map(_._2).distinct.size.toLong,
          es.map(_._1).distinct.size.toLong)
      }.toSeq
      .sortBy { case (host, links, srcs, _) => (-srcs, -links, host) }
      .take(Pipeline8.FrontierK)
    val got = Pipeline8.pipelineCrawlFrontier(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === expect)
    // every selected host is genuinely undiscovered
    assert(got.forall { case (host, _, _, _) => !crawledSet(host) })
    assert(got.length === Pipeline8.FrontierK)
  }
}
