package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis4

/** Driver-side recompute of the link-graph lane: edges brute-forced
  * from the synthesis formula alone (the same replay the oracle runs),
  * plus the two properties the regexp path must earn — relative nav
  * links never counted, self-edges retained.
  */
class LinkGraphSpec extends AnyFunSuite with SparkTestBase {

  test("pipeline_link_graph equals the formula replay at sf0.001") {
    val got = TextAnalysis4.pipelineLinkGraph(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val docIds = Tables.documents(spark, sf0001)
      .select("doc_id").collect().map(_.getLong(0))
    val edges = docIds.flatMap { id =>
      val k = (id % 4 + 2).toInt
      (0 until k).map(j =>
        (id, s"host${id % 50}", s"host${(id * 7 + j * 13) % 50}"))
    }
    val expected = edges.groupBy(e => (e._2, e._3)).map { case (k, es) =>
      k -> (es.length.toLong, es.map(_._1).distinct.length.toLong)
    }
    assert(got === expected)
    // relative nav links must not have been counted: every dst is a
    // formula host, and totals equal the formula link count exactly
    assert(got.values.map(_._1).sum === edges.length.toLong)
    // self-edges exist in the fixture and are retained
    assert(got.keys.exists { case (s, d) => s == d },
      "fixture regression: no self-edge at this SF")
  }
}
