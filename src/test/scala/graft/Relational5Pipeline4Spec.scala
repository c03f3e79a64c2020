package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Pipeline4, Relational5}

/** Invariant pins for the round-4 additions (the DuckDB oracle already
  * value-pins them at sf0.01; these pin the LAWS and the plan shapes).
  */
class Relational5Pipeline4Spec extends AnyFunSuite with SparkTestBase {

  test("pipeline_chunk: chunk count, sizes, and coverage per document") {
    val rows = Pipeline4.pipelineChunk(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val nToks = Tables.documents(spark, sf0001)
      .select(col("doc_id"), size(split(lower(col("text")), " ", -1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(rows.keySet === nToks.keySet, "every document must be chunked")
    rows.foreach { case (doc, chunks) =>
      val n = nToks(doc)
      val expected = (n + Pipeline4.ChunkS - 1) / Pipeline4.ChunkS // ceil(n/S)
      assert(chunks.length.toLong === expected,
        s"doc $doc: ${chunks.length} chunks for $n tokens")
      chunks.sortBy(_._2).zipWithIndex.foreach { case ((_, cid, sz), i) =>
        assert(cid === i.toLong, "chunk ids are dense from 0")
        val start = i.toLong * Pipeline4.ChunkS
        assert(sz === math.min(Pipeline4.ChunkW, n - start),
          s"doc $doc chunk $cid size")
      }
    }
  }

  test("pipeline_chunk: chunk_md5 pins contents (first chunk spot check)") {
    val doc = Tables.documents(spark, sf0001)
      .select(col("doc_id"), split(lower(col("text")), " ", -1).as("t"))
      .orderBy(col("doc_id")).head()
    val toks = doc.getSeq[String](1)
    val expect = java.security.MessageDigest.getInstance("MD5")
      .digest(toks.take(Pipeline4.ChunkW).mkString(" ").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val got = Pipeline4.pipelineChunk(spark, sf0001)
      .filter(col("doc_id") === doc.getLong(0) && col("chunk_id") === 0)
      .head().getString(3)
    assert(got === expect)
  }

  test("pipeline_chunk plan: no shuffle except the harness sort") {
    val df = Pipeline4.pipelineChunk(spark, sf0001)
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 1, s"chunking must be shuffle-free before the sort:\n$plan")
  }

  test("text_tfidf: tf floor holds and the score is exactly r4(tf·ln(N/df))") {
    val rows = Pipeline4.textTfidf(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val nDocs = Tables.documents(spark, sf0001).count()
    rows.foreach { r =>
      val (tf, df, score) = (r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(tf >= 3)
      assert(df >= 1 && df <= nDocs)
      val expect = math.floor(tf.toDouble * math.log(nDocs.toDouble / df) * 10000 + 0.5) / 10000
      assert(score === expect, s"(${r.getLong(0)}, ${r.getString(1)})")
    }
  }

  test("q70_scd2: versions dense, statuses change, intervals chain") {
    val byCust = Relational5.q70Scd2(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getString(3), Option(r.getString(4))))
      .groupBy(_._1)
    assert(byCust.nonEmpty)
    byCust.foreach { case (cust, vs) =>
      val sorted = vs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (1L to vs.length).toSeq,
        s"cust $cust versions not dense")
      sorted.sliding(2).foreach {
        case Array((_, _, st1, _, to1), (_, _, st2, from2, _)) =>
          assert(st1 !== st2, s"cust $cust: consecutive versions share a status")
          assert(to1 === Some(from2), s"cust $cust: interval chain broken")
        case _ => ()
      }
      assert(sorted.last._5.isEmpty, s"cust $cust: current version must be open")
    }
  }

  test("q71_funnel: stage monotonicity and exact basis points") {
    val rows = Relational5.q71Funnel(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq === Seq("1_signup", "2_purchase_7d"))
    val Seq((_, n1, bps1), (_, n2, bps2)) = rows.toSeq
    assert(bps1 === 10000L)
    assert(n2 <= n1, "funnel stages must narrow")
    assert(bps2 === n2 * 10000 / n1)
  }

  test("q72_anomaly: integer verdict matches a BigDecimal replay") {
    val got = Relational5.q72Anomaly(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val ev = Tables.events(spark, sf0001)
      .select(col("event_type"),
        col("value").cast(org.apache.spark.sql.types.DecimalType(12, 2))
          .*(100).cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(got.keySet === ev.keySet)
    ev.foreach { case (tpe, cents) =>
      val n = BigInt(cents.length)
      val s = cents.map(BigInt(_)).sum
      val s2 = cents.map(c => BigInt(c) * BigInt(c)).sum
      val rhs = (n * s2 - s * s) * 9
      val anomalies = cents.count { c =>
        val lhs = n * BigInt(c) - s
        lhs * lhs > rhs
      }
      assert(got(tpe) === (cents.length.toLong, anomalies.toLong), tpe)
      assert(anomalies < cents.length, "3σ must not flag everything")
    }
  }

  test("q73_pipe_sql: pipe syntax agrees with the nested formulation") {
    val pipe = Relational5.q73PipeSql(spark, sf0001)
    val classic = spark.sql(
      """SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem WHERE l_quantity > 10
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    val p = pipe.select("l_returnflag", "n", "sum_qty").collect().map(_.toSeq)
    val c = classic.collect().map(_.toSeq)
    assert(p.toSeq === c.toSeq)
  }

  test("pipeline_sample_weighted: pure function of rows, recomputes exactly") {
    import graft.operators.Pipeline4
    val got = Pipeline4.sampleWeighted(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // driver-side replay of the priority rule
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val md = java.security.MessageDigest.getInstance("MD5")
    val expect = docs.map { case (id, text) =>
      val w = math.max(text.length, 1).toLong
      val hex = md.digest(s"wps:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(7)
      val u = java.lang.Long.parseLong(hex, 16) + 1
      (id, w, w.toDouble / u.toDouble)
    }.sortBy { case (id, _, p) => (-p, id) }.take(64)
    assert(got.toSeq === expect.toSeq)
    // weighting bites: the sampled docs skew long (chars per sampled doc
    // above the corpus mean)
    val meanAll = docs.map(_._2.length.toLong).sum.toDouble / docs.length
    val meanGot = got.map(_._2).sum.toDouble / got.length
    assert(meanGot > meanAll, "weighted draw must overrepresent long docs")
  }

  test("pipeline_sample_weighted: invariant under repartitioning") {
    import graft.operators.Pipeline4
    val docs = Tables.documents(spark, sf0001)
    val a = Pipeline4.weightedKeep(docs).collect().map(_.getLong(0))
    // same rows through different physical layouts → identical sample
    val b = Pipeline4.weightedKeep(docs.repartition(7)).collect().map(_.getLong(0))
    val c = Pipeline4.weightedKeep(docs.repartition(1).sortWithinPartitions(desc("doc_id")))
      .collect().map(_.getLong(0))
    assert(b.toSeq === a.toSeq)
    assert(c.toSeq === a.toSeq)
  }
}
