package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc instrumentation for the MinHash-LSH pipeline stages. */
object DebugMinhash {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[debug] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val docs = graft.Tables.documents(spark, dir)
    println(s"[debug] docs: ${docs.count()}")
    // (stage-by-stage timings below mirror Dedup.dedupMinhashLsh)
    timed("tokenize only") {
      println("[debug] tok rows: " + docs.select(split(lower(col("text")), " ", -1).as("t"))
        .selectExpr("sum(size(t))").head())
    }
    timed("shingles only") {
      println("[debug] shingle rows: " + docs.select(graft.operators.Dedup.shinglesPublic(col("text")).as("sh"))
        .selectExpr("sum(size(sh))").head())
    }
    timed("shingles+minhash") {
      println("[debug] minhash sums: " + docs.select(
        graft.functions.VectorExpressions.minhashSignature(
          graft.operators.Dedup.shinglesPublic(col("text"))).as("sig"))
        .selectExpr("sum(element_at(sig, 1))").head())
    }
    // recompute stages inline (mirrors Dedup.dedupMinhashLsh)
    val banded = timed("bandedMinhash build+count") {
      val b = graft.operators.Dedup.bandedMinhashPublic(docs)
      b.cache(); println(s"[debug] banded rows: ${b.count()}"); b
    }
    val candidates = timed("candidate join+distinct") {
      val c = banded.as("x").join(banded.as("y"),
        col("x.band_idx") === col("y.band_idx")
          && col("x.band_hash") === col("y.band_hash")
          && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
        .distinct()
      c.cache(); println(s"[debug] candidate pairs: ${c.count()}"); c
    }
    timed("full query") {
      println(s"[debug] final rows: ${graft.operators.Dedup.dedupMinhashLsh(spark, dir).count()}")
    }
    spark.stop()
  }
}
