package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{SimHashUtil, VectorExpressions}

class VectorExpressionsSpec extends AnyFunSuite with SparkTestBase {

  test("cosine_similarity matches a driver-side computation") {
    import spark.implicits._
    val a = Array(1.0f, 2.0f, 3.0f)
    val b = Array(-1.0f, 0.5f, 2.0f)
    val got = Seq((a, b)).toDF("a", "b")
      .select(VectorExpressions.cosineSimilarity(col("a"), col("b")))
      .head().getDouble(0)
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val expected = dot / (math.sqrt(a.map(x => x.toDouble * x).sum) *
      math.sqrt(b.map(x => x.toDouble * x).sum))
    assert(math.abs(got - expected) < 1e-12)
  }

  test("cosine_similarity: zero vector → 0.0, identical vectors → 1.0") {
    import spark.implicits._
    val v = Array(0.3f, -0.7f, 0.1f)
    val rows = Seq((v, Array(0f, 0f, 0f)), (v, v)).toDF("a", "b")
      .select(VectorExpressions.cosineSimilarity(col("a"), col("b")).as("s"))
      .collect().map(_.getDouble(0))
    assert(rows(0) === 0.0)
    assert(math.abs(rows(1) - 1.0) < 1e-12)
  }

  test("codegen and interpreted paths agree on real embeddings") {
    val df = Tables.embeddings(spark, sf0001).limit(50)
      .select(col("vec_id"), VectorExpressions.cosineSimilarity(
        col("embedding"), col("embedding")).as("self_sim"))
    // self-similarity is exactly 1.0 modulo fp; both paths must agree
    val viaCodegen = df.collect().map(_.getDouble(1))
    viaCodegen.foreach(s => assert(math.abs(s - 1.0) < 1e-9))
  }

  test("simhash64 is deterministic and sensitive to token changes") {
    import spark.implicits._
    val rows = Seq(
      ("d1", Seq("the", "quick", "brown", "fox")),
      ("d2", Seq("the", "quick", "brown", "fox")),
      ("d3", Seq("a", "completely", "different", "doc", "entirely"))
    ).toDF("id", "toks")
      .select(col("id"), VectorExpressions.simhash64(col("toks")).as("sig"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows("d1") === rows("d2"))
    assert(rows("d1") !== rows("d3"))
  }

  test("simhash hamming distance: near-dup tokens ⇒ closer than random") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"tok$i")
    val nearDup = base.updated(3, "CHANGED")
    val far = (1 to 40).map(i => s"other$i")
    val sigs = Seq(("a", base), ("b", nearDup), ("c", far))
      .toDF("id", "toks")
      .select(col("id"), VectorExpressions.simhash64(col("toks")).as("sig"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val near = SimHashUtil.hamming(sigs("a"), sigs("b"))
    val rand = SimHashUtil.hamming(sigs("a"), sigs("c"))
    assert(near < rand, s"near=$near rand=$rand")
    assert(near <= 16)
  }

  test("type checking rejects wrong input types") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0), Array(1.0f))).toDF("a", "b")
    val ex = intercept[Exception] {
      df.select(VectorExpressions.cosineSimilarity(col("a"), col("b"))).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("array"))
  }

  test("SQL registration surface works") {
    VectorExpressions.register(spark)
    Tables.embeddings(spark, sf0001).limit(5).createOrReplaceTempView("emb5")
    val n = spark.sql(
      "SELECT cosine_similarity(embedding, embedding) AS s FROM emb5")
      .collect()
    assert(n.length === 5)
    n.foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-9))
  }
}
