package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.VectorExpressions._

/** SparkSessionExtensions entry point — lets any session pick up the
  * graft function surface at build time:
  *
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions)
  *   // or: spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * (The `VectorExpressions.register` path does the same for an
  * already-built session; this is the config-driven variant a cluster
  * would use so SQL users get the functions without any code.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "scala_udf")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("cosine_similarity"),
      info("cosine_similarity", "cosine_similarity(array<float>, array<float>) - cosine similarity in double precision"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(array<string>) - 64-bit Charikar SimHash"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)))
    ext.injectFunction((FunctionIdentifier("minhash_signature"),
      info("minhash_signature", "minhash_signature(array<string>) - 32-wide MinHash signature"),
      (exprs: Seq[Expression]) => MinHashSignature(exprs.head)))
    ext.injectFunction((FunctionIdentifier("word_shingles3"),
      info("word_shingles3", "word_shingles3(array<string>) - distinct word 3-grams"),
      (exprs: Seq[Expression]) => WordShingles3(exprs.head)))
  }
}
