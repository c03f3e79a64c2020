package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Pipeline10

/** Snapshot-diff contract: every output row recomputed driver-side
  * from the synthesis formulas, all three churn classes present,
  * unchanged rows absent, and the delete-wins-over-edit precedence
  * pinned.
  */
class Pipeline10Spec extends AnyFunSuite with SparkTestBase {

  test("pipeline_snapshot_diff: driver recompute, classes, precedence") {
    import scala.jdk.CollectionConverters._
    val got = Pipeline10.pipelineSnapshotDiff(spark, sf0001)
      .collectAsList().asScala.toVector
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val docs = Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "text").collectAsList().asScala
      .map(r => r.getLong(0) -> r.getString(1)).toVector
    val expect = (docs.flatMap { case (id, t) =>
      if (id % 31 == 0) Some((id, "removed", t.length.toLong, -1L))
      else if (id % 13 == 0)
        Some((id, "modified", t.length.toLong, t.length.toLong + 5))
      else None
    } ++ docs.collect { case (id, t) if id % 17 == 0 =>
      (id + Pipeline10.AddOffset, "added", -1L, t.length.toLong + 4)
    }).sortBy(_._1)
    assert(got === expect)
    // all three classes genuinely occur, and no unchanged rows leak
    Seq("removed", "modified", "added").foreach { s =>
      assert(got.exists(_._2 == s), s"no $s rows — degenerate fixture")
    }
    assert(got.size < docs.size, "diff output not churn-sized")
    // precedence: an id divisible by both 31 and 13 is removed, not
    // modified (the delete applies before the edit in v2's derivation)
    got.filter(r => r._1 % 31 == 0 && r._1 % 13 == 0 &&
      r._1 < Pipeline10.AddOffset)
      .foreach(r => assert(r._2 === "removed"))
  }
}
