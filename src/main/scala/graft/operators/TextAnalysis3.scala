package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Third text-analysis batch — two corpus transforms an LLM training
  * pipeline runs between ingestion and tokenization:
  *
  *   - text_rake: RAKE keyword extraction (Rose et al. 2010) — candidate
  *     phrases are maximal stopword-free token runs, scored by the sum
  *     of their words' degree/frequency ratios.
  *   - pipeline_span_corruption: T5-style span corruption (Raffel et
  *     al. 2020) — deterministic hash-selected token spans replaced by
  *     numbered sentinels, emitting the (corrupted, target) pair.
  *
  * Both run positionally: one posexplode to (doc, position, token),
  * window passes that all share the doc_id hash partition, then an
  * aggregation back to phrase/document grain — O(doc_len) work per
  * document, no join wider than a broadcast. Span corruption is a
  * single hash shuffle end to end (plan-audited); RAKE's executed plan
  * shows the corpus scan twice (the phrase path and the word-stats
  * path re-derive the token frame) with the doc-partition exchange
  * REUSED between them — at 100 TB the first move is persisting the
  * exploded token frame to a doc_id-bucketed table so both paths read
  * it shuffle-free. Scores and mask decisions are exact integer
  * arithmetic so the DuckDB oracles replay them bit-for-bit.
  */
object TextAnalysis3 {

  /** Per-document token cap — bounds per-doc work AND lets the oracle
    * enumerate positions with a constant-bound generate_series
    * (NOTES.md #8). The generator's documents top out at 100 tokens, so
    * 128 never truncates at the shipped SFs.
    */
  val MaxToks = 128

  /** RAKE stopword set for the synthetic corpus (its only function
    * words). In a real deployment this is a per-language list; the
    * algorithm is unchanged.
    */
  val StopWords: Seq[String] = Seq("a", "the")

  /** Phrases longer than this are discarded (standard RAKE practice —
    * a document with no stopwords at all is one giant "phrase", which
    * is noise, not a keyword).
    */
  val MaxPhraseLen = 4

  /** 1-based (doc_id, i, w) token stream, first [[MaxToks]] non-empty
    * tokens per document — the positional frame both queries build on.
    */
  private def toks(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        posexplode(slice(filter(split(col("text"), " ", -1),
          t => t =!= ""), 1, MaxToks)))
      .select(col("doc_id"), (col("pos") + 1).as("i"), col("col").as("w"))

  /** Shared oracle CTE for the same 1-based token stream. */
  private val ToksCte: String =
    s"""toks AS (
      |  SELECT doc_id, i, list_extract(l, i) AS w
      |  FROM (SELECT doc_id,
      |          list_filter(string_split(text, ' '), x -> x <> '') AS l
      |        FROM documents),
      |       generate_series(1, $MaxToks) AS g(i)
      |  WHERE i <= len(l))""".stripMargin

  /** RAKE keyword extraction. Candidate phrases = maximal runs of
    * non-stopword tokens (run id = running stopword count — the same
    * gaps-and-islands idiom as q79); each word scores
    * `degree/freq` where freq = occurrences in any phrase and degree =
    * Σ length of the phrases it appears in; a phrase scores the sum of
    * its words' scores. Scores are floor-scaled to basis points per
    * word BEFORE summing, so both engines add identical integers.
    * Shape: the token stream shuffles ONCE to doc partitions (all
    * window passes + the phrase/instance joins share that
    * partitioning); the word-stats frame is vocabulary-sized and
    * broadcasts back; the global top-40 is a TakeOrderedAndProject, not
    * a full sort.
    */
  def rake(spark: SparkSession, dir: String): DataFrame = {
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("i"))
    val runs = toks(spark, dir)
      .withColumn("is_stop",
        when(col("w").isin(StopWords: _*), 1).otherwise(0))
      .withColumn("pid", sum(col("is_stop")).over(wDoc))
    val inst = runs.filter(col("is_stop") === 0)
      .groupBy(col("doc_id"), col("pid"))
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("i"), col("w")))),
            x => x.getField("w")), " ").as("phrase"),
        count(lit(1)).as("plen"))
      .filter(col("plen") <= MaxPhraseLen)
    val winst = runs.filter(col("is_stop") === 0)
      .select(col("doc_id"), col("pid"), col("w"))
      .join(inst.select(col("doc_id"), col("pid"), col("plen")),
        Seq("doc_id", "pid"))
    val wstats = winst.groupBy(col("w"))
      .agg(count(lit(1)).as("freq"), sum(col("plen")).as("degree"))
    val iscore = winst.join(broadcast(wstats), Seq("w"))
      .withColumn("wscore", expr("(degree * 10000) div freq"))
      .groupBy(col("doc_id"), col("pid"))
      .agg(sum(col("wscore")).as("score_bps"))
    inst.join(iscore, Seq("doc_id", "pid"))
      .groupBy(col("phrase"))
      .agg(count(lit(1)).as("n_occ"), min(col("score_bps")).as("score_bps"))
      .orderBy(col("score_bps").desc, col("phrase"))
      .limit(40)
  }

  private val RakeOracle: String =
    s"""WITH $ToksCte,
      |runs AS (
      |  SELECT doc_id, i, w,
      |    CASE WHEN w IN ('a', 'the') THEN 1 ELSE 0 END AS is_stop,
      |    sum(CASE WHEN w IN ('a', 'the') THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY doc_id ORDER BY i) AS pid
      |  FROM toks),
      |inst AS (
      |  SELECT doc_id, pid, string_agg(w, ' ' ORDER BY i) AS phrase,
      |    count(*) AS plen
      |  FROM runs WHERE is_stop = 0 GROUP BY doc_id, pid
      |  HAVING count(*) <= $MaxPhraseLen),
      |winst AS (
      |  SELECT r.w, r.doc_id, r.pid, p.plen
      |  FROM runs r JOIN inst p ON r.doc_id = p.doc_id AND r.pid = p.pid
      |  WHERE r.is_stop = 0),
      |wstats AS (
      |  SELECT w, count(*) AS freq, cast(sum(plen) AS BIGINT) AS degree
      |  FROM winst GROUP BY w),
      |iscore AS (
      |  SELECT wi.doc_id, wi.pid,
      |    cast(sum((ws.degree * 10000) // ws.freq) AS BIGINT) AS score_bps
      |  FROM winst wi JOIN wstats ws ON wi.w = ws.w
      |  GROUP BY wi.doc_id, wi.pid),
      |ps AS (
      |  SELECT p.phrase, count(*) AS n_occ, min(s.score_bps) AS score_bps
      |  FROM inst p JOIN iscore s
      |    ON p.doc_id = s.doc_id AND p.pid = s.pid
      |  GROUP BY p.phrase)
      |SELECT phrase, n_occ, score_bps FROM ps
      |ORDER BY score_bps DESC, phrase LIMIT 40""".stripMargin

  /** Mask rate for [[spanCorruption]], in percent. */
  private val MaskPct = 15

  /** T5-style span corruption with DETERMINISTIC "randomness": token i
    * of document d is masked iff
    * `pmod(d·131 + i·2654435761, 100) < MaskPct` — a replayable hash
    * both engines compute identically (operands stay far below Int64:
    * i ≤ 128, and doc ids would need to exceed ~7·10¹⁶ to overflow).
    * Consecutive masked tokens form one span; span k is replaced by the
    * sentinel `<extra_id_k>` in the corrupted text, and the target is
    * the sentinel-prefixed concatenation of the masked spans — the
    * exact (inputs, labels) pair T5 pre-training consumes. A document
    * with no masked token gets an empty-string target on both sides
    * (the oracle coalesces DuckDB's all-NULL string_agg). One shuffle
    * to doc partitions; the lag/running-sum passes and the final
    * per-doc aggregation all share it.
    */
  def spanCorruption(spark: SparkSession, dir: String): DataFrame = {
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("i"))
    val sk = toks(spark, dir)
      .withColumn("msk",
        when(pmod(col("doc_id") * 131 + col("i") * lit(2654435761L),
          lit(100)) < MaskPct, 1).otherwise(0))
      .withColumn("start",
        when(col("msk") === 1 &&
          coalesce(lag(col("msk"), 1).over(wDoc), lit(0)) === 0, 1)
          .otherwise(0))
      .withColumn("k", sum(col("start")).over(wDoc) - 1)
    val sentinel =
      concat(lit("<extra_id_"), col("k").cast("string"), lit(">"))
    val pieceC = when(col("msk") === 0, col("w"))
      .when(col("start") === 1, sentinel)
    val pieceT = when(col("msk") === 1 && col("start") === 1,
        concat(sentinel, lit(" "), col("w")))
      .when(col("msk") === 1, col("w"))
    def joined(piece: Column): Column =
      array_join(
        transform(
          filter(array_sort(collect_list(struct(col("i"), piece.as("p")))),
            x => x.getField("p").isNotNull),
          x => x.getField("p")), " ")
    sk.groupBy(col("doc_id"))
      .agg(sum(col("start")).as("n_spans"), sum(col("msk")).as("n_masked"),
        joined(pieceC).as("corrupted"), joined(pieceT).as("target"))
      .orderBy(col("doc_id"))
  }

  private val SpanCorruptionOracle: String =
    s"""WITH $ToksCte,
      |sk AS (
      |  SELECT doc_id, i, w, msk,
      |    CASE WHEN msk = 1 AND coalesce(lag(msk)
      |        OVER (PARTITION BY doc_id ORDER BY i), 0) = 0
      |      THEN 1 ELSE 0 END AS start
      |  FROM (
      |    SELECT doc_id, i, w,
      |      CASE WHEN (doc_id * 131 + i * 2654435761) % 100 < $MaskPct
      |        THEN 1 ELSE 0 END AS msk
      |    FROM toks)),
      |sk2 AS (
      |  SELECT doc_id, i, w, msk, start,
      |    sum(start) OVER (PARTITION BY doc_id ORDER BY i) - 1 AS k
      |  FROM sk)
      |SELECT doc_id,
      |  cast(sum(start) AS BIGINT) AS n_spans,
      |  cast(sum(msk) AS BIGINT) AS n_masked,
      |  coalesce(string_agg(CASE WHEN msk = 0 THEN w
      |      WHEN start = 1 THEN '<extra_id_' || k || '>'
      |      ELSE NULL END, ' ' ORDER BY i), '') AS corrupted,
      |  coalesce(string_agg(CASE
      |      WHEN msk = 1 AND start = 1 THEN '<extra_id_' || k || '> ' || w
      |      WHEN msk = 1 THEN w
      |      ELSE NULL END, ' ' ORDER BY i), '') AS target
      |FROM sk2 GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val registry: Seq[QueryDef] = Seq(
    QueryDef("text_rake", rake _, RakeOracle),
    QueryDef("pipeline_span_corruption", spanCorruption _, SpanCorruptionOracle)
  )
}
