package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Pipeline7

/** Invariant specs for the corpus-mixing batch: the temperature scaling
  * must actually flatten the distribution (boost low-resource strata,
  * shave high-resource ones), shares must stay on the bps grid, and the
  * upsampler must emit exactly the per-stratum copy counts its mixture
  * row promises.
  */
class Pipeline7Spec extends AnyFunSuite with SparkTestBase {

  test("mixture: shares on the bps grid, sqrt temperature flattens") {
    val out = Pipeline7.mixtureWeights(spark, sf001).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6))))
    assert(out.nonEmpty)
    val docs = Tables.documents(spark, sf001).count()
    assert(out.map(_._2._1).sum === docs)
    // truncated integer shares: each sum lands in (10000 - #strata, 10000]
    val natSum = out.map(_._2._3).sum
    val tgtSum = out.map(_._2._4).sum
    assert(natSum > 10000 - out.length && natSum <= 10000 + out.length)
    assert(tgtSum > 10000 - out.length && tgtSum <= 10000)
    out.foreach { case (k, (nDocs, nToks, nat, tgt, boost)) =>
      assert(nDocs > 0 && nToks > 0, s"empty stratum $k")
      assert(nat >= 1 && tgt >= 0)
      // boost direction follows the share comparison exactly
      if (tgt >= nat) assert(boost >= 1000, s"$k") else assert(boost < 1000, s"$k")
    }
    // temperature flattening: the token-richest stratum is shaved, the
    // poorest boosted (sqrt compresses the range)
    val byToks = out.sortBy(_._2._2)
    assert(byToks.last._2._5 <= 1000,
      "richest stratum should downsample under sqrt temperature")
    assert(byToks.head._2._5 >= 1000,
      "poorest stratum should upsample under sqrt temperature")
    // sqrt preserves the share ORDER even as it compresses it
    assert(byToks.map(_._2._4).sliding(2)
      .forall(p => p.length < 2 || p(0) <= p(1)))
  }

  test("upsample: per-doc copies match the stratum boost exactly") {
    val boosts = Pipeline7.mixtureWeights(spark, sf001)
      .select(col("lang"), col("source"), col("boost_milli")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val perDoc = Pipeline7.upsampleRepeat(spark, sf001)
      .groupBy(col("doc_id"), col("lang"), col("source"))
      .agg(count(lit(1)).as("n"), max(col("copy")).as("mx"),
        min(col("copy")).as("mn"))
      .collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getString(2)),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(perDoc.nonEmpty)
    perDoc.foreach { case (id, k, n, mx, mn) =>
      val boost = boosts(k)
      // copy column is the contiguous 1..n sequence
      assert(mn === 1L && mx === n, s"doc $id")
      // emitted count is floor or ceil of boost/1000 per the hash rule
      assert(n === boost / 1000 || n === boost / 1000 + 1, s"doc $id")
    }
    // stratum totals: emitted mass stays within one copy per doc of the
    // exact fractional target n_docs*boost/1000
    val byStratum = perDoc.groupBy(_._2).view.mapValues(_.map(_._3).sum)
    val docs = Tables.documents(spark, sf001)
      .groupBy(col("lang"), col("source")).count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    byStratum.foreach { case (k, emitted) =>
      val ideal = docs(k).toDouble * boosts(k) / 1000.0
      assert(math.abs(emitted - ideal) <= docs(k).toDouble, s"stratum $k")
    }
    // deterministic: a second evaluation is bit-identical
    val again = Pipeline7.upsampleRepeat(spark, sf001)
      .agg(count(lit(1)), sum(col("doc_id") * col("copy")))
      .collect().head
    val first = Pipeline7.upsampleRepeat(spark, sf001)
      .agg(count(lit(1)), sum(col("doc_id") * col("copy")))
      .collect().head
    assert(again === first)
  }
}
