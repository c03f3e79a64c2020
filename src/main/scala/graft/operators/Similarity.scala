package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.{TopKByScore, VectorExpressions}

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  * Three tiers, mirroring how an ANN stack scales to 100 TB:
  *   1. brute-force top-k against a broadcast query vector — the exact
  *     baseline; one scan, no shuffle, TakeOrderedAndProject keeps only
  *     k rows per partition;
  *   2. grouped top-k via a typed bounded-heap Aggregator — partial
  *     aggregation ships ≤k rows per (group × partition);
  *   3. LSH-bucketed ANN (random hyperplanes) — signature computation is
  *     embarrassingly parallel; candidate selection is a bucket filter
  *     (here, against one query) or a bucket-keyed shuffle (pairwise),
  *     never an all-pairs product.
  */
object Similarity {

  /** Deterministic query vector: the embeddings row with the given
    * vec_id, fetched once driver-side and inlined as a literal — the
    * broadcast-the-needle pattern (the haystack never moves). The
    * registered queries pin qid = 0; the recall specs sweep several.
    */
  private def queryVector(spark: SparkSession, dir: String,
      qid: Long = 0L): Array[Float] =
    Tables.embeddings(spark, dir).filter(col("vec_id") === qid)
      .select("embedding").head().getSeq[Float](0).toArray

  private def simTo(vec: Array[Float]): Column =
    VectorExpressions.cosineSimilarity(col("embedding"), typedLit(vec))

  /** Exact top-10 by cosine similarity (self included, sim = 1.0). */
  def simTopkBruteforce(spark: SparkSession, dir: String): DataFrame =
    simTopkBruteforceFor(spark, dir, 0L)

  private[graft] def simTopkBruteforceFor(spark: SparkSession, dir: String,
      qid: Long): DataFrame = {
    val q = queryVector(spark, dir, qid)
    Tables.embeddings(spark, dir)
      .withColumn("sim_exact", simTo(q))
      .orderBy(col("sim_exact").desc, col("vec_id"))
      .limit(10)
      .select(col("vec_id"), round(col("sim_exact"), 4).as("sim"))
  }

  /** Per-label top-3 via the typed bounded-heap aggregator. */
  def simTopkByLabel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val q = queryVector(spark, dir)
    val scored = Tables.embeddings(spark, dir)
      .select(col("label"), col("vec_id"), simTo(q).as("sim"))
      .as[(Int, Long, Double)]
    scored.groupByKey(_._1)
      .agg(TopKByScore(3).toColumn)
      .flatMap { case (label, tops) =>
        tops.zipWithIndex.map { case ((id, s), i) => (label, i + 1, id, s) }
      }
      .toDF("label", "rn", "vec_id", "sim")
      .withColumn("sim", round(col("sim"), 4))
      .orderBy(col("label"), col("rn"))
  }

  /** Needle-batch size for [[simTopkBatch]]. */
  val BatchQ = 8

  /** Batch retrieval — the RAG-serving shape: [[BatchQ]] query vectors
    * answered in ONE corpus pass, each getting its exact top-5. The
    * needle batch (vec_id < BatchQ, fetched once driver-side — bounded
    * state, same contract as the single-needle queries) is inlined as a
    * LITERAL array and fanned out per corpus row by `explode`, so there
    * is no join operator at all — no broadcast nested loop for the
    * audit to flag, just a ×BatchQ codegen generator over the scan.
    * Per-needle top-5 then reuses the bounded-heap [[TopKByScore]]
    * aggregator: each map partition ships ≤ 5 rows per needle across
    * the one shuffle, versus a window row_number sorting all
    * |corpus|×BatchQ scored rows. At 100 TB this is the pattern that
    * amortizes the scan across a whole query batch instead of re-reading
    * the corpus per query.
    */
  def simTopkBatch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val needles: Seq[(Int, Seq[Float])] =
      Tables.embeddings(spark, dir).filter(col("vec_id") < BatchQ)
        .orderBy(col("vec_id"))
        .select(col("vec_id"), col("embedding"))
        .collect().toSeq
        .map(r => (r.getLong(0).toInt, r.getSeq[Float](1)))
    val scored = Tables.embeddings(spark, dir)
      .select(col("vec_id"), explode(typedLit(needles)).as("q"),
        col("embedding"))
      .select(col("q._1").as("qid"), col("vec_id"),
        VectorExpressions.cosineSimilarity(col("embedding"), col("q._2"))
          .as("sim"))
      .as[(Int, Long, Double)]
    scored.groupByKey(_._1)
      .agg(TopKByScore(5).toColumn)
      .flatMap { case (qid, tops) =>
        tops.zipWithIndex.map { case ((id, s), i) => (qid, i + 1, id, s) }
      }
      .toDF("qid", "rn", "vec_id", "sim")
      .withColumn("sim", round(col("sim"), 4))
      .orderBy(col("qid"), col("rn"))
  }

  private val BatchOracle: String =
    s"""WITH q AS (
       |  SELECT vec_id AS qid,
       |    list_transform(embedding, x -> cast(x AS DOUBLE)) AS qv
       |  FROM embeddings WHERE vec_id < $BatchQ),
       |scored AS (
       |  SELECT q.qid, e.vec_id,
       |    list_cosine_similarity(
       |      list_transform(e.embedding, x -> cast(x AS DOUBLE)), q.qv)
       |      AS sim_exact
       |  FROM embeddings e CROSS JOIN q)
       |SELECT cast(qid AS INTEGER) AS qid, rn, vec_id,
       |  round(sim_exact, 4) AS sim FROM (
       |  SELECT qid, vec_id, sim_exact,
       |    row_number() OVER (PARTITION BY qid
       |      ORDER BY sim_exact DESC, vec_id) AS rn
       |  FROM scored)
       |WHERE rn <= 5 ORDER BY qid, rn""".stripMargin

  /** 16 fixed random hyperplanes (seed 42), 4 bands × 4 bits. */
  private[graft] lazy val planes: Array[Array[Float]] = {
    val rnd = new scala.util.Random(42)
    Array.fill(16)(Array.fill(64)(rnd.nextGaussian().toFloat))
  }

  /** Signature bit b = (v · plane_b > 0); cosine sign == dot sign. */
  private def bandCols: Seq[Column] = (0 until 4).map { b =>
    (0 until 4).map { j =>
      val bit = when(VectorExpressions.cosineSimilarity(
        col("embedding"), typedLit(planes(4 * b + j))) > 0, 1).otherwise(0)
      bit * (1 << (3 - j))
    }.reduce(_ + _).as(s"band$b")
  }

  private[graft] def signatureOf(vec: Array[Float]): Array[Int] =
    (0 until 4).map { b =>
      (0 until 4).map { j =>
        val p = planes(4 * b + j)
        val dot = vec.indices.map(i => vec(i).toDouble * p(i)).sum
        (if (dot > 0) 1 else 0) << (3 - j)
      }.sum
    }.toArray

  /** ANN top-10: candidates share ≥1 LSH band with the query, then exact
    * cosine re-rank. At scale the bucket filter is a partition-pruned
    * lookup (bucket-partitioned layout), not a scan.
    */
  def simAnnLsh(spark: SparkSession, dir: String): DataFrame =
    simAnnLshFor(spark, dir, 0L)

  private[graft] def simAnnLshFor(spark: SparkSession, dir: String,
      qid: Long): DataFrame = {
    val q = queryVector(spark, dir, qid)
    val sig = signatureOf(q)
    val withBands = Tables.embeddings(spark, dir).select(
      col("vec_id") +: col("embedding") +: bandCols: _*)
    withBands
      .filter((0 until 4).map(b => col(s"band$b") === sig(b)).reduce(_ || _))
      .withColumn("sim_exact", simTo(q))
      .orderBy(col("sim_exact").desc, col("vec_id"))
      .limit(10)
      .select(col("vec_id"), round(col("sim_exact"), 4).as("sim"))
  }

  /** IVF (inverted-file) ANN — the coarse-quantizer scale path beside
    * LSH. Centroids: 16 seed vectors (vec_id 0..15) refined by ONE
    * distributed Lloyd iteration (assign → per-cluster mean), collected
    * (16×64 floats — tiny) and re-broadcast; components rounded to 6
    * decimals so the centroid set is identical under any partitioning.
    * Query time: probe the 4 nearest centroids, re-rank only their
    * members exactly. At 100 TB the assignment column becomes a
    * partition key, so probing = partition pruning.
    */
  /** One Lloyd iteration: assign to nearest centroid (broadcast argmax,
    * no shuffle) → per-(cluster, dim) mean (one shuffle) → collect the
    * 16×64-float table, components rounded to 6 decimals so the result
    * is identical under any partitioning. Shared by IVF and k-means.
    */
  private def lloydStep(emb: DataFrame,
      cents: Array[Array[Float]]): Array[Array[Float]] = {
    val means = emb.select(col("embedding"),
        nearestCentroid(cents, col("embedding")).as("c"))
      .select(col("c"), posexplode(col("embedding")))
      .groupBy(col("c"), col("pos"))
      .agg(avg(col("col").cast("double")).as("m"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    Array.tabulate(cents.length) { c =>
      Array.tabulate(64) { p =>
        val v = means.getOrElse((c, p), cents(c)(p).toDouble)
        Tables.stableRound(v, 6).toFloat
      }
    }
  }

  private def seedCentroids(emb: DataFrame): Array[Array[Float]] =
    emb.filter(col("vec_id") < 16).orderBy(col("vec_id"))
      .select("embedding").collect().map(_.getSeq[Float](0).toArray)

  private[graft] def ivfCentroids(spark: SparkSession, dir: String): Array[Array[Float]] = {
    val emb = Tables.embeddings(spark, dir)
    lloydStep(emb, seedCentroids(emb))
  }

  /** argmax over centroids via array_max of (sim, idx) structs —
    * lexicographic struct ordering gives max-sim, tie→max idx;
    * deterministic because sims are identical doubles everywhere.
    */
  private def nearestCentroidIdx(cents: Array[Array[Float]], v: Column): Column =
    array_max(array(cents.zipWithIndex.toIndexedSeq.map { case (c, i) =>
      struct(VectorExpressions.cosineSimilarity(v, typedLit(c)).as("s"),
        lit(i).as("idx"))
    }: _*)).getField("idx")

  /** Assignment implementation chosen by k. The expression form above
    * inlines one cosine sub-tree PER CENTROID — ideal codegen at the
    * registered k=16, but the tree grows O(k·d) and past the codegen
    * method limits Janino falls back to interpreted evaluation: the
    * round-11 semantic probe measured the k=160 production knob at 44×
    * base cost, almost all of it this fallback. Large k therefore
    * switches to a tight-loop UDF over the closure-broadcast centroid
    * matrix — same sequential-double cosine and the same tie rule
    * (equal sim → larger index, matching struct array_max ordering).
    */
  private def nearestCentroid(cents: Array[Array[Float]], v: Column): Column =
    if (cents.length <= 16) nearestCentroidIdx(cents, v)
    else nearestCentroidLoop(cents)(v)

  private def nearestCentroidLoop(cents: Array[Array[Float]])
      : org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (v: Seq[Float]) =>
      val arr = v.toArray
      var best = -1
      var bestSim = Double.NegativeInfinity
      var i = 0
      while (i < cents.length) {
        val c = cents(i)
        var dot = 0.0; var na = 0.0; var nb = 0.0
        var j = 0
        while (j < c.length) {
          val a = arr(j).toDouble; val b = c(j).toDouble
          dot += a * b; na += a * a; nb += b * b; j += 1
        }
        val denom = math.sqrt(na) * math.sqrt(nb)
        val s = if (denom == 0.0) 0.0 else dot / denom
        if (s >= bestSim) { bestSim = s; best = i }
        i += 1
      }
      best
    }

  /** IVF ANN top-10: assign corpus to centroids, probe the query's 4
    * nearest lists, exact re-rank within them.
    */
  def simAnnIvf(spark: SparkSession, dir: String): DataFrame =
    simAnnIvfFor(spark, dir, 0L)

  private[graft] def simAnnIvfFor(spark: SparkSession, dir: String,
      qid: Long): DataFrame = {
    val q = queryVector(spark, dir, qid)
    val cents = ivfCentroids(spark, dir)
    val qSims = cents.map { c =>
      val dot = q.indices.map(i => q(i).toDouble * c(i)).sum
      val nq = math.sqrt(q.map(x => x.toDouble * x).sum)
      val nc = math.sqrt(c.map(x => x.toDouble * x).sum)
      if (nq * nc == 0) 0.0 else dot / (nq * nc)
    }
    val probes = qSims.zipWithIndex.sortBy { case (s, i) => (-s, i) }
      .take(4).map(_._2)
    Tables.embeddings(spark, dir)
      .withColumn("c", nearestCentroidIdx(cents, col("embedding")))
      .filter(col("c").isin(probes.map(Integer.valueOf).toSeq: _*))
      .withColumn("sim_exact", simTo(q))
      .orderBy(col("sim_exact").desc, col("vec_id"))
      .limit(10)
      .select(col("vec_id"), round(col("sim_exact"), 4).as("sim"))
  }

  /** K-means over embeddings: 3 Lloyd iterations from the 16 vec_id
    * seeds — the iterative-refinement pattern at Spark scale: each
    * iteration is one assignment pass (codegen cosine argmax against
    * BROADCAST centroids, no shuffle) + one shuffle (per-cluster,
    * per-dim mean); centroids (16×64 floats) are the only driver-side
    * state. Rows-only (an iterative algorithm has no SQL twin);
    * the spec pins determinism and monotone within-cluster improvement.
    */
  def clusterKmeans(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    var cents = seedCentroids(emb)
    for (_ <- 1 to 3) cents = lloydStep(emb, cents)
    // each row carries its assigned centroid AS A STRING (16 distinct
    // values, dictionary-encoded by parquet) so the PARTIAL oracle can
    // verify the assignment step: DuckDB re-reads the dump, recovers
    // the 16 (cluster, centroid) pairs, string_split-parses each back
    // to doubles, and re-derives every vector's argmax cosine
    // assignment — the Lloyd refinement itself (iterative float means)
    // stays SQL-unreplayable, but "every vector sits in the cluster of
    // its nearest dumped centroid" is hash-checked. The string is
    // comma-joined Double.toString of each component's WIDENED float:
    // shortest-round-trip decimal, so DuckDB's correctly-rounded
    // VARCHAR→DOUBLE cast recovers the exact doubles the Spark cosine
    // kernel computed with — the oracle argmax sees bit-identical
    // inputs, no near-tie drift from a lossy re-quantization. (A raw
    // float-array column here crashes the driver's pandas row sort:
    // ndarray cells are unhashable — the r8 ERR.)
    val centStrs: Seq[String] =
      cents.toSeq.map(_.map(_.toDouble.toString).mkString(","))
    emb.select(col("vec_id"),
        nearestCentroidIdx(cents, col("embedding")).cast("long").as("cluster"))
      .withColumn("centroid",
        element_at(typedLit(centStrs), (col("cluster") + 1).cast("int")))
      .orderBy(col("vec_id"))
  }

  /** Cosine floor above which two same-cluster embeddings count as
    * semantic near-duplicates (fixture-scaled; production SemDeDup
    * runs ~0.95+ on real text embeddings).
    *
    * TAU-BOUNDARY FLAKE LEVER: dedup_semantic's oracle re-derives every
    * kept flag with DuckDB's list_cosine_similarity over widened
    * doubles, and this hard `>= tau` cutoff means a pair whose cosine
    * differs between engines ACROSS tau flips a kept flag and fails the
    * hash compare. The exposure is bounded by the kernel match: both
    * sides accumulate dot/norms in DOUBLE in index order
    * ([[graft.functions.VectorExpressions.CosineSimilarity]] widens
    * each float before multiply), so the only residual divergence is
    * the denominator form (`sqrt(na)*sqrt(nb)` here vs whatever DuckDB
    * composes) — a few ulps, ~1e-16 relative. A flake needs a pair
    * within that distance of tau: measure-zero in practice (probed
    * empirically in SCALE.md "cosine kernel parity"), and rounding to a
    * coarser grain would NOT shrink it — round(x,4) >= tau just moves
    * the single boundary to 0.39995 with the same ulp exposure. If a
    * flake ever materializes, nudge tau off the observed value, don't
    * add rounding.
    */
  private[graft] val SemDedupTau = 0.4

  /** SEMANTIC DEDUP at corpus scale (the SemDeDup recipe): assign every
    * embedding to its nearest IVF centroid (broadcast argmax — no
    * shuffle), then apply the within-cluster drop rule — a vector is
    * dropped iff some LOWER-id member of ITS cluster sits at cosine ≥
    * [[SemDedupTau]]; the lowest id of every near-dup group survives.
    * Output: (vec_id, cluster, kept) for the whole corpus — the
    * embedding-space sibling of [[Dedup.dedupSurvivors]].
    *
    * Scale shape: clustering makes the quadratic step LOCAL — pairwise
    * cosine runs per cluster (one cluster-keyed shuffle), never
    * all-pairs across the corpus; at 100 TB you size k so clusters stay
    * bounded (k ≈ N/1e4 in the published recipe) and the per-cluster
    * join cost is Σ|c|² with |c| capped by construction, the same
    * budget discipline as the LSH bucket cap — but here a hot cluster
    * is a modeling choice (k too small), not an adversary.
    *
    * PARTIAL oracle, one step stronger than cluster_kmeans's: the dump
    * carries each row's cluster id, and the oracle re-derives every
    * kept flag from EXACT cosines over the corpus embeddings within
    * the dumped partition — no centroid round-trip at all; only the
    * assignment itself (iterative Lloyd floats) stays SQL-unreplayable,
    * and vec→argmax-centroid assignment is already hash-verified by
    * cluster_kmeans's own oracle.
    */
  def dedupSemantic(spark: SparkSession, dir: String): DataFrame =
    dedupSemanticK(spark, dir, 16)

  /** k-parameterized form of [[dedupSemantic]] — the registered query
    * pins k=16 (the fixture-calibrated cell count its partial oracle
    * replays); the SCALE probe calls this with k ∝ corpus size, the
    * published SemDeDup discipline (cluster size, not cluster count,
    * is the bounded quantity — Σ|c|² stays linear in N only while
    * |c| ≈ N/k is pinned). Seeds: first k vec_ids, the same
    * deterministic seeding rule the k=16 form uses.
    */
  private[graft] def dedupSemanticK(spark: SparkSession, dir: String,
      k: Int): DataFrame = {
    val embAll = Tables.embeddings(spark, dir)
    val seeds = embAll.filter(col("vec_id") < k).orderBy(col("vec_id"))
      .select("embedding").collect().map(_.getSeq[Float](0).toArray)
    val cents = lloydStep(embAll, seeds)
    // checkpoint: the assigned frame feeds BOTH sides of the
    // within-cluster join and the final kept-flag join
    val emb = embAll
      .select(col("vec_id"), col("embedding"),
        nearestCentroid(cents, col("embedding")).cast("long")
          .as("cluster"))
      .localCheckpoint()
    val dropped = emb.as("x").join(emb.as("y"),
        col("x.cluster") === col("y.cluster") &&
          col("y.vec_id") < col("x.vec_id"))
      .filter(VectorExpressions.cosineSimilarity(
        col("x.embedding"), col("y.embedding")) >= SemDedupTau)
      .select(col("x.vec_id").as("d")).distinct()
    emb.join(dropped, col("vec_id") === col("d"), "left")
      .select(col("vec_id"), col("cluster"), col("d").isNull.as("kept"))
      .orderBy(col("vec_id"))
  }

  /** The PRODUCTION k-knob, gate-verified: k = 64 over the fixture
    * routes the assignment through [[nearestCentroidLoop]] (the
    * tight-loop UDF the round-11 probe built after the expression tree
    * fell out of codegen past k ≈ 50) — so the large-k path a 100 TB
    * deployment actually runs (k ∝ N keeps Σ|c|² linear) is verified
    * by the same partial-oracle gate as the registered k=16 form, not
    * only by the scale probe. Same drop rule, same dump shape.
    */
  def dedupSemanticK64(spark: SparkSession, dir: String): DataFrame =
    dedupSemanticK(spark, dir, 64)

  private def semanticDedupOracleFor(name: String): String =
    s"""WITH dump AS (
      |  SELECT * FROM read_parquet('__DUMP__/$name/*.parquet')),
      |m AS (
      |  SELECT d.vec_id, d.cluster,
      |    list_transform(e.embedding, x -> cast(x AS DOUBLE)) AS v
      |  FROM dump d JOIN embeddings e USING (vec_id)),
      |drops AS (
      |  SELECT a.vec_id FROM m a JOIN m b
      |    ON b.cluster = a.cluster AND b.vec_id < a.vec_id
      |  WHERE list_cosine_similarity(a.v, b.v) >= $SemDedupTau
      |  GROUP BY a.vec_id)
      |SELECT m.vec_id, m.cluster, (d.vec_id IS NULL) AS kept
      |FROM m LEFT JOIN drops d ON d.vec_id = m.vec_id
      |ORDER BY m.vec_id""".stripMargin

  private val SemanticDedupOracle: String =
    semanticDedupOracleFor("dedup_semantic")

  /** Embedding near-duplicate pairs (cosine ≥ threshold) on a bounded
    * slice — the exact verifier that, at scale, runs per LSH bucket
    * rather than all-pairs (see [[Dedup]] for the text-side analogue).
    */
  def dedupEmbeddingCosine(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir).filter(col("vec_id") < 100)
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("eb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("sim_exact", VectorExpressions.cosineSimilarity(col("ea"), col("eb")))
      .filter(col("sim_exact") > 0.3)
      .select(col("id_a"), col("id_b"), round(col("sim_exact"), 4).as("sim"))
      .orderBy(col("id_a"), col("id_b"))
  }

  private val simOracle =
    """WITH q AS (SELECT list_transform(embedding, x -> cast(x AS DOUBLE)) AS qv
      |  FROM embeddings WHERE vec_id = 0)
      |SELECT vec_id, round(sim_exact, 4) AS sim FROM (
      |  SELECT e.vec_id,
      |    list_cosine_similarity(list_transform(e.embedding, x -> cast(x AS DOUBLE)),
      |      (SELECT qv FROM q)) AS sim_exact
      |  FROM embeddings e)
      |ORDER BY sim_exact DESC, vec_id LIMIT 10""".stripMargin

  /** PQ geometry: 8 subspaces × 8 dims, 16 codewords each — an 8-byte
    * code per 256-byte vector (32× compression), the standard
    * billion-vector memory budget.
    */
  private val PqM = 8
  private val PqD = 8
  private val PqK = 16

  /** L2-normalized embedding (zero vectors pass through unchanged) —
    * PQ codebooks and codes live on the unit sphere so the asymmetric
    * L2 distance is order-equivalent to cosine (‖a−b‖² = 2 − 2·cos).
    * Used once per row in the codebook-build pass; the per-row ENCODE
    * path normalizes inside the [[PqEncode]] kernel instead.
    */
  private def normalized(v: Column): Column = {
    val n = sqrt(aggregate(v, lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double")))
    when(n === 0.0, v).otherwise(transform(v, x => (x.cast("double") / n).cast("float")))
  }

  /** PQ codebooks: per subspace, the 16 seed codewords (vec_id 0..15's
    * subvectors, normalized) refined by ONE fused Lloyd step — all 8
    * subspaces assign + average in a single aggregate job. Assignment
    * runs through the [[PqEncode]] codegen kernel (one fused loop per
    * row — the interpreted HOF argmin this replaces cost 99 s at
    * sf0.1). Components rounded to 6 decimals so the codebook is
    * identical under any partitioning; driver state is 8×16×8 floats.
    */
  private[graft] def pqCodebooks(spark: SparkSession, dir: String): Array[Array[Array[Float]]] = {
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), normalized(col("embedding")).as("embedding"))
    val seeds: Array[Array[Array[Float]]] = {
      val rows = emb.filter(col("vec_id") < PqK).orderBy(col("vec_id"))
        .select("embedding").collect().map(_.getSeq[Float](0).toArray)
      Array.tabulate(PqM)(m => rows.map(_.slice(m * PqD, m * PqD + PqD)))
    }
    // one pass: per row, ALL subspace assignments from one kernel call,
    // then per-(subspace, code, dim) mean over the subvectors
    val means = emb
      .select(col("embedding"),
        graft.functions.PqEncode(col("embedding"), seeds).as("codes"))
      .select(posexplode(col("codes")).as(Seq("m", "code")), col("embedding"))
      .select(col("m"), col("code"),
        posexplode(slice(col("embedding"), col("m") * PqD + 1, lit(PqD))))
      .groupBy(col("m"), col("code"), col("pos"))
      .agg(avg(col("col").cast("double")).as("v"))
      .collect()
      .map(r => ((r.getInt(0), r.getInt(1), r.getInt(2)), r.getDouble(3)))
      .toMap
    Array.tabulate(PqM)(m => Array.tabulate(PqK)(k => Array.tabulate(PqD) { d =>
      val v = means.getOrElse((m, k, d), seeds(m)(k)(d).toDouble)
      Tables.stableRound(v, 6).toFloat
    }))
  }

  /** PQ ANN top-10 — the memory-bounded billion-vector scale path
    * beside LSH (hash blocking) and IVF (partition pruning): every
    * vector is ENCODED as 8 nibble codes (32× smaller than the raw
    * floats; at 100 TB the codes table fits where the vectors cannot),
    * and the query scans CODES ONLY via asymmetric distance — the
    * query-to-codeword lookup table (8×16 doubles) is computed
    * driver-side and folded in as a literal, so scoring is 8 array
    * lookups + adds per row, no vector math. The ADC shortlist (top
    * 50) is then re-ranked exactly against the raw vectors — the
    * two-tier sketch-then-verify discipline every approximate family
    * here follows. Rows-only (codebook training has no SQL twin);
    * PqRecallSpec pins determinism and a recall@10 floor vs brute
    * force across query vectors.
    */
  def simAnnPq(spark: SparkSession, dir: String): DataFrame =
    simAnnPqFor(spark, dir, 0L)

  private[graft] def simAnnPqFor(spark: SparkSession, dir: String,
      qid: Long): DataFrame = {
    val books = pqCodebooks(spark, dir)
    val q = queryVector(spark, dir, qid)
    val qn = {
      val n = math.sqrt(q.map(x => x.toDouble * x).sum)
      if (n == 0) q.map(_.toDouble) else q.map(_ / n)
    }
    // asymmetric-distance lookup table: query subvector → each codeword
    val lut: Array[Double] = Array.tabulate(PqM * PqK) { i =>
      val m = i / PqK; val k = i % PqK
      (0 until PqD).map { d =>
        val diff = qn(m * PqD + d) - books(m)(k)(d)
        diff * diff
      }.sum
    }
    val lutCol = typedLit(lut)
    val emb = Tables.embeddings(spark, dir)
    // encode through the codegen kernel: normalize + all 8 argmins in
    // one fused loop per row (no interpreted lambdas in the scan)
    val codes = graft.functions.PqEncode(col("embedding"), books)
    val adc = aggregate(
      transform(codes, (c, m) =>
        element_at(lutCol, (m * PqK + c + 1).cast("int"))),
      lit(0.0), (acc, x) => acc + x)
    val shortlist = emb
      .select(col("vec_id"), col("embedding"), adc.as("adc"))
      .orderBy(col("adc"), col("vec_id"))
      .limit(50)
    shortlist
      .withColumn("sim_exact", simTo(q))
      .orderBy(col("sim_exact").desc, col("vec_id"))
      .limit(10)
      .select(col("vec_id"), round(col("sim_exact"), 4).as("sim"))
  }

  // ------------------------------------------------------------ IVF-PQ

  /** Number of coarse cells the IVF-PQ query probes (of 16). */
  private val IvfPqProbes = 4

  /** IVF-PQ model: coarse centroids trained in NORMALIZED space (16
    * vec_id seeds + one fused Lloyd step, same recipe as
    * [[ivfCentroids]] but over unit vectors, because the PQ codebooks
    * quantize residuals and residual scale must be the unit sphere's),
    * plus residual codebooks (per subspace, the first 16 docs'
    * residual subvectors refined by ONE Lloyd step). The refinement
    * pass runs the [[graft.functions.IvfPqEncode]] kernel itself with
    * the seed books — one fused coarse-assign + residual-encode loop
    * per row — then averages residual subvectors per (subspace, code).
    * Components rounded to 6 decimals so the model is identical under
    * any partitioning; driver state is 16×64 + 8×16×8 floats.
    */
  private[graft] def ivfPqModel(spark: SparkSession, dir: String)
      : (Array[Array[Float]], Array[Array[Array[Float]]]) = {
    val embN = Tables.embeddings(spark, dir)
      .select(col("vec_id"), normalized(col("embedding")).as("embedding"))
    val cents = lloydStep(embN, seedCentroids(embN))
    val centsLit = typedLit(cents.map(_.toSeq).toSeq)
    val residOf: Column = zip_with(col("embedding"),
      element_at(centsLit, element_at(col("enc"), 1) + 1), (a, b) => a - b)
    val seedEnc = graft.functions.IvfPqEncode(col("embedding"), cents,
      Array.fill(PqM)(Array.fill(1)(Array.fill(PqD)(0f))))
    val seeds: Array[Array[Array[Float]]] = {
      val rows = embN.filter(col("vec_id") < PqK)
        .select(col("vec_id"), col("embedding"), seedEnc.as("enc"))
        .select(col("vec_id"), residOf.as("r")).orderBy(col("vec_id"))
        .collect().map(_.getSeq[Float](1).toArray)
      Array.tabulate(PqM)(m => rows.map(_.slice(m * PqD, m * PqD + PqD)))
    }
    val enc = graft.functions.IvfPqEncode(col("embedding"), cents, seeds)
    val means = embN
      .select(col("embedding"), enc.as("enc"))
      .select(residOf.as("resid"),
        posexplode(slice(col("enc"), 2, PqM)).as(Seq("m", "code")))
      .select(col("m"), col("code"),
        posexplode(slice(col("resid"), col("m") * PqD + 1, lit(PqD))))
      .groupBy(col("m"), col("code"), col("pos"))
      .agg(avg(col("col").cast("double")).as("v"))
      .collect()
      .map(r => ((r.getInt(0), r.getInt(1), r.getInt(2)), r.getDouble(3)))
      .toMap
    val books = Array.tabulate(PqM)(m => Array.tabulate(PqK)(k =>
      Array.tabulate(PqD) { d =>
        val v = means.getOrElse((m, k, d), seeds(m)(k)(d).toDouble)
        Tables.stableRound(v, 6).toFloat
      }))
    (cents, books)
  }

  /** IVF-PQ ANN top-10 — the combined billion-vector production recipe
    * (IVFADC): the IVF tier's partition pruning AND the PQ tier's 32×
    * code compression in one index. Corpus side, one fused kernel call
    * per row ([[graft.functions.IvfPqEncode]]) yields the coarse cell
    * and the 8 residual nibble codes; at 100 TB only that 9-int encode
    * survives as the index — the raw vectors stay in cold storage for
    * the final re-rank. Query side, everything is driver math: probe
    * the [[IvfPqProbes]] nearest cells, build the shared
    * query-to-residual-codeword inner-product table (8×16 doubles) and
    * the per-cell `dot(q, centroid)` constants, fold both in as
    * literals. Scoring a row is then one array lookup for the cell
    * constant + 8 lookups for the residual codes — approximate cosine
    * `dot(q,c) + Σ_m dot(q_m, codeword_m)` (corpus vectors are unit,
    * so IP = cosine). Cell filter prunes ~12/16 of the scan BEFORE
    * scoring (at scale: the probe is a partition-pruned read of the
    * codes table, the other cells are never touched). ADC shortlist
    * (top 50) re-ranks exactly — the sketch-then-verify discipline of
    * every approximate tier. Rows-only (iterative-float training has
    * no SQL twin); the partial oracle re-verifies every returned
    * cosine, and the spec pins determinism + a recall floor.
    */
  def simAnnIvfPq(spark: SparkSession, dir: String): DataFrame =
    simAnnIvfPqFor(spark, dir, 0L)

  private[graft] def simAnnIvfPqFor(spark: SparkSession, dir: String,
      qid: Long): DataFrame = {
    val (cents, books) = ivfPqModel(spark, dir)
    val q = queryVector(spark, dir, qid)
    val qn = {
      val n = math.sqrt(q.map(x => x.toDouble * x).sum)
      if (n == 0) q.map(_.toDouble) else q.map(_ / n)
    }
    // Two per-cell query constants with distinct jobs: the ADC score
    // term must be the UN-normalized dot(q, c), because residuals are
    // defined against the raw centroid (r = normalize(v) - c), so the
    // exact decomposition is dot(q, v̂) = dot(q, c) + dot(q, r) — a
    // normalized constant would bias every cell's shortlist scores by
    // its centroid norm. The normalized cosine is kept ONLY to rank
    // cells for probe selection (where scale-invariance is what you
    // want: pick directions, not magnitudes).
    val cellDot: Array[Double] = cents.map { c =>
      qn.indices.map(i => qn(i) * c(i)).sum
    }
    // probe order: cosine desc, tie → larger cell id (the kernel's >=
    // argmax prefers larger ids, so the probe set matches assignment)
    val cellCos: Array[Double] = cents.zipWithIndex.map { case (c, i) =>
      val nc = math.sqrt(c.map(x => x.toDouble * x).sum)
      if (nc == 0) 0.0 else cellDot(i) / nc
    }
    val probes = cellCos.zipWithIndex.sortBy { case (s, i) => (-s, -i) }
      .take(IvfPqProbes).map(_._2)
    val lut: Array[Double] = Array.tabulate(PqM * PqK) { i =>
      val m = i / PqK; val k = i % PqK
      (0 until PqD).map(d => qn(m * PqD + d) * books(m)(k)(d)).sum
    }
    val lutCol = typedLit(lut)
    val constCol = typedLit(cellDot)
    val enc = graft.functions.IvfPqEncode(col("embedding"), cents, books)
    val adcIp = element_at(constCol, element_at(col("enc"), 1) + 1) +
      aggregate(
        transform(slice(col("enc"), 2, PqM), (c, m) =>
          element_at(lutCol, (m * PqK + c + 1).cast("int"))),
        lit(0.0), (acc, x) => acc + x)
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"), enc.as("enc"))
      .filter(element_at(col("enc"), 1)
        .isin(probes.map(Integer.valueOf).toSeq: _*))
      .withColumn("adc_ip", adcIp)
      .orderBy(col("adc_ip").desc, col("vec_id"))
      .limit(50)
      .withColumn("sim_exact", simTo(q))
      .orderBy(col("sim_exact").desc, col("vec_id"))
      .limit(10)
      .select(col("vec_id"), round(col("sim_exact"), 4).as("sim"))
  }

  /** PARTIAL oracle for an ANN tier: the candidate set (float-sign LSH
    * buckets / Lloyd-refined coarse centroids / trained PQ codebooks)
    * is not SQL-replayable, but every RETURNED row's value is — the
    * oracle re-reads the ids this query just dumped
    * (`__DUMP__/<name>/`, substituted by [[graft.Verify]]) and
    * recomputes each id's exact cosine to the query vector from the
    * corpus. A wrong reported sim, wrong rounding, or an id not in the
    * corpus hash-fails; candidate QUALITY is pinned separately by the
    * recall-floor specs in DedupSimilaritySpec (they sweep query ids
    * against brute force).
    */
  private def annPartialOracle(name: String): String =
    s"""WITH q AS (SELECT list_transform(embedding, x -> cast(x AS DOUBLE)) AS qv
       |  FROM embeddings WHERE vec_id = 0),
       |ids AS (SELECT vec_id FROM read_parquet('__DUMP__/$name/*.parquet'))
       |SELECT vec_id, round(sim_exact, 4) AS sim FROM (
       |  SELECT e.vec_id,
       |    list_cosine_similarity(list_transform(e.embedding, x -> cast(x AS DOUBLE)),
       |      (SELECT qv FROM q)) AS sim_exact
       |  FROM embeddings e JOIN ids USING (vec_id))
       |ORDER BY sim_exact DESC, vec_id""".stripMargin

  /** PARTIAL oracle for k-means: recover the 16 (cluster, centroid)
    * pairs from the dump itself, then re-derive every corpus vector's
    * argmax-cosine assignment in DuckDB (tie → larger cluster id,
    * matching [[nearestCentroidIdx]]'s struct-max semantics). Verifies
    * the assignment step end-to-end against whatever centroids Lloyd
    * produced; the centroid refinement itself is the irreducible
    * iterative-float part (determinism + monotone-improvement are
    * spec-pinned in DedupSimilaritySpec).
    *
    * Near-tie posture: the string dump hands DuckDB the EXACT doubles
    * Spark's kernel used (shortest-round-trip repr, correctly-rounded
    * parse), so the only residual cross-engine asymmetry is
    * list_cosine_similarity's internal accumulation order vs the
    * kernel's index-order loop — the same pairing every ANN partial
    * oracle has hash-matched since round 8. A vector would need two
    * centroids' cosines within that sub-ulp noise to flake; exact
    * ties are covered by the cluster-DESC tie-break.
    */
  private val KmeansPartialOracle: String =
    """WITH dump AS (SELECT * FROM read_parquet('__DUMP__/cluster_kmeans/*.parquet')),
      |cents AS (SELECT DISTINCT cluster, centroid,
      |    list_transform(string_split(centroid, ','),
      |      x -> cast(x AS DOUBLE)) AS cvec
      |  FROM dump),
      |best AS (
      |  SELECT e.vec_id, c.cluster, c.centroid,
      |    row_number() OVER (PARTITION BY e.vec_id
      |      ORDER BY list_cosine_similarity(
      |          list_transform(e.embedding, x -> cast(x AS DOUBLE)),
      |          c.cvec) DESC,
      |        c.cluster DESC) AS rn
      |  FROM embeddings e CROSS JOIN cents c)
      |SELECT vec_id, cluster, centroid FROM best WHERE rn = 1
      |ORDER BY vec_id""".stripMargin

  val registry: Seq[QueryDef] = Seq(
    QueryDef("sim_topk_bruteforce", simTopkBruteforce _, simOracle),
    QueryDef("sim_topk_by_label", simTopkByLabel _,
      """WITH q AS (SELECT list_transform(embedding, x -> cast(x AS DOUBLE)) AS qv
        |  FROM embeddings WHERE vec_id = 0),
        |scored AS (
        |  SELECT e.label, e.vec_id,
        |    list_cosine_similarity(list_transform(e.embedding, x -> cast(x AS DOUBLE)),
        |      (SELECT qv FROM q)) AS sim_exact
        |  FROM embeddings e)
        |SELECT label, rn, vec_id, round(sim_exact, 4) AS sim FROM (
        |  SELECT label, vec_id, sim_exact,
        |    row_number() OVER (PARTITION BY label
        |      ORDER BY sim_exact DESC, vec_id) AS rn
        |  FROM scored)
        |WHERE rn <= 3 ORDER BY label, rn""".stripMargin),
    QueryDef("sim_topk_batch", simTopkBatch _, BatchOracle),
    QueryDef("sim_ann_lsh", simAnnLsh _, annPartialOracle("sim_ann_lsh")),
    QueryDef("sim_ann_ivf", simAnnIvf _, annPartialOracle("sim_ann_ivf")),
    QueryDef("sim_ann_pq", simAnnPq _, annPartialOracle("sim_ann_pq")),
    QueryDef("sim_ann_ivfpq", simAnnIvfPq _, annPartialOracle("sim_ann_ivfpq")),
    QueryDef("cluster_kmeans", clusterKmeans _, KmeansPartialOracle),
    QueryDef("dedup_semantic", dedupSemantic _, SemanticDedupOracle),
    QueryDef("dedup_semantic_k64", dedupSemanticK64 _,
      semanticDedupOracleFor("dedup_semantic_k64")),
    QueryDef("dedup_embedding_cosine", dedupEmbeddingCosine _,
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_cosine_similarity(
        |    list_transform(a.embedding, x -> cast(x AS DOUBLE)),
        |    list_transform(b.embedding, x -> cast(x AS DOUBLE))), 4) AS sim
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE a.vec_id < 100 AND b.vec_id < 100
        |  AND list_cosine_similarity(
        |    list_transform(a.embedding, x -> cast(x AS DOUBLE)),
        |    list_transform(b.embedding, x -> cast(x AS DOUBLE))) > 0.3
        |ORDER BY id_a, id_b""".stripMargin)
  )
}
