package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorExpressions

/** Micro-benchmark: custom codegen expressions vs the semantically
  * identical built-in higher-order-function formulations (which Spark
  * evaluates interpreted, per element). Medians of 3 runs after warmup.
  * Run: sbt "runMain graft.tools.ExprBench [sfDir]"
  */
object ExprBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timeMedian(df: => DataFrame): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warmup
      val runs = Seq.fill(3)(once()).sorted
      runs(1)
    }

    val docs = graft.Tables.documents(spark, dir)
    val emb = graft.Tables.embeddings(spark, dir)
    val toks = split(lower(col("text")), " ", -1)

    // 1. shingles: codegen kernel vs transform+concat_ws+array_distinct
    val shingleExpr = timeMedian(
      docs.select(VectorExpressions.wordShingles3(toks).as("sh")))
    val shingleHof = timeMedian(docs.select(
      array_distinct(when(size(toks) >= 3,
        transform(sequence(lit(1), size(toks) - 2),
          i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1),
            element_at(toks, i + 2))))
        .otherwise(array().cast("array<string>"))).as("sh")))

    // 2. minhash: one-pass kernel vs 32 × array_min(transform(...))
    val sh = VectorExpressions.wordShingles3(toks)
    val mhExpr = timeMedian(
      docs.select(VectorExpressions.minhashSignature(sh).as("sig")))
    val h32 = transform(sh, s => xxhash64(s).bitwiseAND(lit(0xffffffffL)))
    val mhHof = timeMedian(docs.select(array(
      (0 until 32).map { i =>
        val a = graft.functions.MinHashUtil.A(i)
        val b = graft.functions.MinHashUtil.B(i)
        array_min(transform(h32,
          x => (lit(a) * x + lit(b)) % lit(graft.functions.MinHashUtil.P)))
      }: _*).as("sig")))

    // 3. cosine: codegen kernel vs zip_with + aggregate
    val q = emb.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).toArray
    val cosExpr = timeMedian(emb.select(
      VectorExpressions.cosineSimilarity(col("embedding"), typedLit(q)).as("s")))
    val cosHof = timeMedian {
      val qc = typedLit(q)
      val dot = aggregate(zip_with(col("embedding"), qc,
        (a, b) => a.cast("double") * b.cast("double")), lit(0.0), (s, x) => s + x)
      val na = aggregate(transform(col("embedding"), x => x.cast("double")),
        lit(0.0), (s, x) => s + x * x)
      val nb = aggregate(transform(qc, x => x.cast("double")),
        lit(0.0), (s, x) => s + x * x)
      emb.select((dot / (sqrt(na) * sqrt(nb))).as("s"))
    }

    // 4. int8 quant stats: one-pass kernel vs the higher-order chain
    //    (the scale subexpression re-derives array_max inside every
    //    per-element lambda — interpreted, outside whole-stage CSE)
    val quantExpr = timeMedian(emb.select(col("vec_id"),
      VectorExpressions.int8QuantStats(col("embedding")).as("st")))
    val quantHof = timeMedian {
      val v = transform(col("embedding"), x => x.cast("double"))
      val maxAbs = array_max(transform(v, x => abs(x)))
      val scale = when(maxAbs > 0, lit(127.0) / maxAbs)
      val qq = transform(v, x => floor(x * scale + 0.5).cast("long"))
      emb.select(col("vec_id"), scale.as("scale"),
        when(maxAbs > 0, aggregate(qq, lit(0L), (a, x) => a + x)).as("q_sum"),
        when(maxAbs > 0, size(filter(qq, x => abs(x) === 127)))
          .otherwise(0).cast("long").as("n_saturated"))
    }

    // 5. 8-token windows (substring-dedup kernel) vs the same
    //    transform+concat_ws+array_distinct chain at window 8
    val ngramExpr = timeMedian(
      docs.select(VectorExpressions.wordNgrams(toks, 8).as("w")))
    val ngramHof = timeMedian(docs.select(
      array_distinct(when(size(toks) >= 8,
        transform(sequence(lit(1), size(toks) - 7),
          i => concat_ws(" ", (0 until 8).map(j => element_at(toks, i + j)): _*)))
        .otherwise(array().cast("array<string>"))).as("w")))

    println(f"[exprbench] shingles: codegen=$shingleExpr%.2fs hof=$shingleHof%.2fs speedup=${shingleHof / shingleExpr}%.1fx")
    println(f"[exprbench] minhash32: codegen=$mhExpr%.2fs hof=$mhHof%.2fs speedup=${mhHof / mhExpr}%.1fx")
    println(f"[exprbench] cosine: codegen=$cosExpr%.2fs hof=$cosHof%.2fs speedup=${cosHof / cosExpr}%.1fx")
    println(f"[exprbench] int8quant: codegen=$quantExpr%.2fs hof=$quantHof%.2fs speedup=${quantHof / quantExpr}%.1fx")
    println(f"[exprbench] ngrams8: codegen=$ngramExpr%.2fs hof=$ngramHof%.2fs speedup=${ngramHof / ngramExpr}%.1fx")
    spark.stop()
  }
}
