package graft

import java.security.MessageDigest
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Pipeline6, Sketches3}

/** Invariant specs for the round-8 corpus operators, beyond the DuckDB
  * hash oracles: the leakage-safety law itself (no verified near-dup
  * pair straddles a split), the reservoir's exact-min-k law against a
  * driver-side full recompute, and the KMV estimator's accuracy and
  * under-k degeneracy.
  */
class Pipeline6Spec extends AnyFunSuite with SparkTestBase {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("leakage split: total function, cluster-atomic, singleton keys") {
    val rows = Pipeline6.pipelineLeakageSplit(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val nDocs = Tables.documents(spark, sf001).count()
    assert(rows.length.toLong === nDocs)
    assert(rows.map(_._1).distinct.length === rows.length)
    val splitOf = rows.map(r => r._1 -> r._3).toMap
    val keyOf = rows.map(r => r._1 -> r._2).toMap
    // THE LAW: every verified near-dup pair lands in ONE split — the
    // pair list is the exact substrate the clusters were built from
    val pairs = Dedup.dedupMinhashLsh(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture regression: no near-dup pairs at sf0.01")
    pairs.foreach { case (a, b) =>
      assert(splitOf(a) === splitOf(b), s"pair ($a,$b) straddles splits")
      assert(keyOf(a) === keyOf(b), s"pair ($a,$b) has different group keys")
    }
    // docs in no pair use their own id as group key
    val inPair = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    // (transitively clustered docs may exceed the direct pair list, so
    // only assert the reverse direction: un-clustered ⇒ self-keyed)
    val clustered = Dedup.dedupClusters(spark, sf001).collect()
      .map(_.getLong(0)).toSet
    rows.foreach { case (id, key, _) =>
      if (!clustered.contains(id)) assert(key === id)
    }
    assert(inPair.subsetOf(clustered))
    // all three splits non-empty at this SF, train the large one
    val bySplit = rows.groupBy(_._3).view.mapValues(_.length).toMap
    assert(bySplit.keySet === Set("train", "valid", "test"))
    assert(bySplit("train") > bySplit("valid") &&
      bySplit("train") > bySplit("test"))
  }

  test("reservoir sample: exactly the global min-k under the salted hash") {
    val out = Pipeline6.pipelineReservoirSample(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    // full driver-side recompute of every doc's rank — the sample must
    // be EXACTLY the k smallest (ties impossible: rank ties broken by
    // doc_id, and (rk, doc_id) is unique per doc)
    val all = Tables.documents(spark, sf0001).select("doc_id").collect()
      .map(_.getLong(0))
      .map(id => (id, java.lang.Long.parseLong(
        md5hex(s"res:$id").take(8), 16)))
    val expected = all.sortBy(t => (t._2, t._1))
      .take(Pipeline6.ReservoirK.min(all.length))
    assert(out.toSeq === expected.toSeq)
    // rerun-stability (the property an RNG reservoir lacks)
    val again = Pipeline6.pipelineReservoirSample(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    assert(again.toSeq === out.toSeq)
  }

  test("kmv: accurate at both SFs, degenerates to exact below k") {
    for (sf <- Seq(sf0001, sf001)) {
      val r = Sketches3.kmvDistinct(spark, sf).collect().head
      val (k, nUsed, est, exact, ok) =
        (r.getInt(0), r.getLong(1), r.getLong(3), r.getLong(4),
          r.getBoolean(5))
      assert(k === Sketches3.KmvK)
      assert(ok, s"KMV estimate $est outside 3-sigma of $exact at $sf")
      if (nUsed < k) assert(est === nUsed) // under-k: KMV IS exact
      assert(nUsed <= exact)
    }
  }

  test("tokenizer coverage: totals conserve, bps exact, OOV mass present") {
    val out = Pipeline6.pipelineTokenizerCoverage(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val docs = Tables.documents(spark, sf0001)
    assert(out.length.toLong === docs.count())
    out.foreach { case (_, n, oov, bps) =>
      assert(oov <= n)
      assert(bps === (if (n == 0) 0L else oov * 10000 / n))
    }
    // conservation: per-doc token counts sum to the corpus token count
    val totalToks = docs.select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.lower(
            org.apache.spark.sql.functions.col("text")), " ", -1)).as("w"))
      .filter(org.apache.spark.sql.functions.col("w") =!= "").count()
    assert(out.map(_._2).sum === totalToks)
    // the fixture has a long tail: some OOV mass must exist, and the
    // 256-token vocab must cover the majority of tokens
    assert(out.map(_._3).sum > 0)
    assert(out.map(_._3).sum * 2 < totalToks)
  }

  test("shard manifest: partitions the corpus, fingerprint flips on any membership change") {
    val out = Pipeline6.pipelineShardManifest(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val docs = Tables.documents(spark, sf0001)
    assert(out.map(_._2).sum === docs.count())
    assert(out.map(_._1).toSet.subsetOf((0L until graft.operators.Pipeline3.NumShards).toSet))
    // manifest describes pipelineShuffle's shards: sizes must agree
    val shufSizes = graft.operators.Pipeline3.pipelineShuffle(spark, sf0001)
      .groupBy("shard").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { case (shard, n, _, _) => assert(shufSizes(shard) === n) }
    // fingerprint = XOR of member doc-id hashes: recompute driver-side
    val byShard = docs.select("doc_id").collect().map(_.getLong(0))
      .map { id =>
        def h(salt: String, digits: Int) = java.lang.Long.parseLong(
          java.security.MessageDigest.getInstance("MD5")
            .digest(s"$salt$id".getBytes("UTF-8"))
            .map("%02x".format(_)).mkString.take(digits), 16)
        (h("shuf:", 8) % graft.operators.Pipeline3.NumShards, h("fp:", 13))
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).reduce(_ ^ _)).toMap
    out.foreach { case (shard, _, _, fp) => assert(byShard(shard) === fp) }
  }
}
