package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.operators.{Pipeline3, Relational4}

class Pipeline3Spec extends AnyFunSuite with SparkTestBase {

  test("shuffle: every doc lands in exactly one shard, positions are contiguous, order is hash-deterministic") {
    val rows = Pipeline3.pipelineShuffle(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val all = Tables.documents(spark, sf0001).count()
    assert(rows.length.toLong === all, "bijection over the corpus")
    assert(rows.map(_._1).distinct.length === rows.length)
    rows.groupBy(_._2).foreach { case (shard, in) =>
      assert(in.map(_._3).sorted.toSeq === (1L to in.length).toSeq,
        s"shard $shard positions must be 1..n")
    }
    // no shard hogs the corpus (hash balance at 500 docs / 8 shards)
    val sizes = rows.groupBy(_._2).values.map(_.length)
    assert(sizes.max < 2 * sizes.min + 16, s"shard skew: $sizes")
    val again = Pipeline3.pipelineShuffle(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq === again.toSeq)
  }

  test("mixture: smallest source keeps everything, rates fall as sources grow, kept ≤ orig") {
    val rows = Pipeline3.pipelineMixture(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val minOrig = rows.map(_._2).min
    rows.foreach { case (src, nOrig, bps, nKept) =>
      assert(bps >= 0 && bps <= 10000, s"$src bps $bps")
      assert(nKept <= nOrig, s"$src kept $nKept > orig $nOrig")
      if (nOrig == minOrig)
        assert(bps === 10000L && nKept === nOrig,
          s"smallest source $src must keep everything")
    }
    // keep rate is monotone non-increasing in source size
    rows.sortBy(_._2).map(_._3).sliding(2).foreach {
      case Array(a, b) => assert(b <= a, "rates must fall as sources grow")
      case _ =>
    }
  }

  test("incremental dedup: survivors are novel vs the corpus index and unique within batch") {
    import org.apache.spark.sql.functions.{lower, md5, pmod, trim, lit}
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), md5(lower(trim(col("text")))).as("h"))
    val existing = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
      .select("h").collect().map(_.getString(0)).toSet
    val out = Pipeline3.pipelineDedupIncremental(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(out.nonEmpty)
    assert(out.map(_._2).distinct.length === out.length, "one survivor per digest")
    out.foreach { case (id, h) =>
      assert(id % 5 === 0, s"survivor $id must come from the batch")
      assert(!existing.contains(h), s"doc $id digest already in the corpus index")
    }
  }

  test("entropy: bounded by log2(n_toks), zero for a constant doc, maximal for all-distinct") {
    val rows = Pipeline3.textEntropy(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length.toLong === Tables.documents(spark, sf0001).count())
    rows.foreach { case (id, n, h) =>
      val hmax = math.log(n.toDouble) / math.log(2.0)
      assert(h >= -1e-4 && h <= hmax + 1e-4, s"doc $id entropy $h outside [0, $hmax]")
    }
    // synthetic pins for the two extremes, through the same operator
    import spark.implicits._
    val tiny = Seq((1L, "a a a a", "en", "s", 7L), (2L, "a b c d", "en", "s", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("entropy").toString
    tiny.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val ext = Pipeline3.textEntropy(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(ext(1L) === 0.0, "constant doc has zero entropy")
    assert(ext(2L) === 2.0, "4 distinct tokens = 2 bits")
  }

  test("quality gate: every verdict branch witnessed; real corpus keeps a majority") {
    import spark.implicits._
    val many = (1 to 40).map(i => s"w$i").mkString(" ")
    // Σc²·4 > n²: (900+25+25)·4 = 3800 > 1600 ⇒ low_entropy (H₂ < 2 bits)
    val lowEnt = (("a " * 30) + ("b " * 5) + ("c " * 5)).trim
    // Σc²·4 = (225+25)·4 = 1000 ≤ 1600, but max_c·4 = 60 > 40 ⇒ top_heavy
    val topHeavy = (("z " * 15) + (1 to 25).map(i => s"t$i").mkString(" ")).trim
    val docs = Seq(
      (1L, "just five short tokens here", "en", "s", 0L), // too_short
      (2L, lowEnt, "en", "s", 0L),
      (3L, topHeavy, "en", "s", 0L),
      (4L, many, "en", "s", 0L),                          // keep
      (5L, "", "en", "s", 0L))     // zero tokens — must NOT vanish
    val dir = java.nio.file.Files.createTempDirectory("gate").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val verdicts = Pipeline3.pipelineQualityGate(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(verdicts === Map(1L -> "too_short", 2L -> "low_entropy",
      3L -> "top_heavy", 4L -> "keep", 5L -> "too_short"))
    // the generated corpus is mostly natural-ish text: gate keeps most
    val real = Pipeline3.pipelineQualityGate(spark, sf0001).collect()
      .map(_.getString(3))
    assert(real.count(_ == "keep") * 2 > real.length,
      s"gate too aggressive: ${real.groupBy(identity).view.mapValues(_.length).toMap}")
  }

  test("vocab: tiny corpus pins exact ranks and integer coverage; real corpus is monotone") {
    import spark.implicits._
    // counts: a=3, b=2, c=1, total=6 → coverage 5000 / 8333 / 10000 bps
    val tiny = Seq((1L, "a a a b", "en", "s", 7L), (2L, "b c", "en", "s", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("vocab").toString
    tiny.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Pipeline3.pipelineVocab(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq === Seq((1L, "a", 3L, 5000L), (2L, "b", 2L, 8333L),
      (3L, "c", 1L, 10000L)))
    val real = Pipeline3.pipelineVocab(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(real.length <= Pipeline3.VocabSize)
    assert(real.map(_._1).toSeq === (1L to real.length).toSeq, "ranks contiguous")
    real.sliding(2).foreach {
      case Array(a, b) =>
        assert(b._2 <= a._2, "counts non-increasing down the ranks")
        assert(b._3 >= a._3, "coverage non-decreasing down the ranks")
      case _ =>
    }
    assert(real.last._3 <= 10000L)
    // the top-N must ship ≤ N rows per partition, never globally sort
    // the vocabulary: TakeOrderedAndProject, with the only Sorts the
    // trivial ones over the N surviving rows (window + output order)
    val plan = Pipeline3.pipelineVocab(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"vocab top-N must be TakeOrderedAndProject:\n$plan")
  }

  test("lm score: tiny corpus matches the hand model; real scores are strictly negative log-probs") {
    import spark.implicits._
    // bigrams: doc1 (a,b)(b,a)(a,b), doc2 (a,b); c(a,b)=3, c(b,a)=1,
    // contexts a=3 b=1, V=2 → lp(a,b)=ln(4/5), lp(b,a)=ln(2/3)
    val tiny = Seq((1L, "a b a b", "en", "s", 7L), (2L, "a b", "en", "s", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("lmscore").toString
    tiny.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    val out = Pipeline3.pipelineLmScore(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(out(1L)._1 === 3L && out(2L)._1 === 1L)
    assert(out(1L)._2 === r4((2 * math.log(4.0 / 5) + math.log(2.0 / 3)) / 3))
    assert(out(2L)._2 === r4(math.log(4.0 / 5)))
    assert(out(2L)._2 > out(1L)._2,
      "the doc made only of the corpus-frequent bigram must score higher")
    // real corpus: smoothing keeps every probability strictly below 1
    val real = Pipeline3.pipelineLmScore(spark, sf0001).collect()
    assert(real.nonEmpty)
    real.foreach(r => assert(r.getDouble(2) < 0.0,
      s"doc ${r.getLong(0)} lm_score must be a negative mean log-prob"))
  }

  test("empty corpus: shuffle/mixture/incremental/entropy/substring return empty, never crash") {
    // the r2 review found empty-corpus NPEs in clusters/packing; pin the
    // same guarantee for every new operator up front
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("empty_corpus").toString
    Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    assert(Pipeline3.pipelineShuffle(spark, dir).count() === 0L)
    assert(Pipeline3.pipelineMixture(spark, dir).count() === 0L)
    assert(Pipeline3.pipelineDedupIncremental(spark, dir).count() === 0L)
    assert(Pipeline3.textEntropy(spark, dir).count() === 0L)
    assert(Pipeline3.pipelineQualityGate(spark, dir).count() === 0L)
    assert(Pipeline3.pipelineVocab(spark, dir).count() === 0L)
    assert(Pipeline3.pipelineLmScore(spark, dir).count() === 0L)
    assert(graft.operators.Dedup.dedupSubstring(spark, dir).count() === 0L)
  }

  test("observe(): corpus accounting piggybacks on the job, no second scan") {
    import org.apache.spark.sql.Observation
    import org.apache.spark.sql.functions.{count, lit, sum}
    // at 100 TB an extra .count() for accounting is an extra full scan;
    // observe() attaches the metrics to the job that runs anyway
    val obs = Observation("corpus_account")
    val docs = Tables.documents(spark, sf0001)
      .observe(obs, count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
    val written = docs.select("doc_id").collect().length
    val row = obs.get
    assert(row("n_docs") === written.toLong)
    val expectChars = Tables.documents(spark, sf0001)
      .agg(sum(col("n_chars"))).head().getLong(0)
    assert(row("n_chars") === expectChars)
  }

  test("q65 mode is the absorbing 3-bin (dominance by construction) and q68 nations are sorted") {
    Relational4.q65OrderedSet(spark, sf0001).collect().foreach { r =>
      assert(r.getLong(1) === 3L,
        "least(l_linenumber,3)=3 strictly dominates (5/7 uniform, 15/28 triangular)")
    }
    Relational4.q68Listagg(spark, sf0001).collect().foreach { r =>
      val nations = r.getString(1).split(",").toSeq
      assert(nations === nations.sorted, "WITHIN GROUP ordering must hold")
    }
  }
}
