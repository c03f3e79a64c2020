package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.{QueryDef, Tables}
import graft.functions.KllSketch

/** Third sketch batch: the hand-built KLL mergeable quantile sketch
  * (functions/KllSketch) run as a first-class query with the
  * exact-bracket oracle idiom.
  */
object Sketches3 {

  /** Bracket half-width in percentage points: the estimate for
    * percentile p must have exact rank within [p−5, p+5] % of n.
    * Measured sketch error is ≤0.6 % (KllSketch scaladoc) — ~9× margin.
    */
  private val BracketPct = 5

  /** Distribution profile of lineitem prices via the KLL sketch:
    * percentiles 25/50/75/90/99 of `l_extendedprice` in cents.
    *
    * Two bounded passes over the column (the same shape as
    * `sketch_heavy_hitters`): pass 1 folds the whole column into ONE
    * K·log(n/K)-sized sketch through ordinary two-phase aggregation
    * (map-side partials, one reduce); pass 2 broadcast-attaches the 5
    * estimates back and computes each estimate's EXACT rank with a
    * conditional count — so the emitted row is exact integers plus the
    * in-bracket boolean, never the merge-order-dependent estimate
    * itself (exact-bracket idiom; DuckDB replays the bracket arithmetic
    * and a literal TRUE). At 100 TB the sketch pass is the point: a
    * true percentile needs a global sort; the sketch needs one
    * aggregation and 512·log₂(n/512) longs of state.
    */
  def kllQuantiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cents = Tables.lineitem(spark, dir)
      .select(col("l_extendedprice").cast(DecimalType(12, 2)).*(100)
        .cast("long").as("v"))
      .localCheckpoint() // scanned twice: sketch pass + exact-rank pass
    val est = cents.as[Long](Encoders.scalaLong)
      .select(new KllSketch.KllAgg().toColumn.name("est"))
    val ps = KllSketch.Ps.map(p => (p * 100).toInt)
    val estRows = est
      .select(posexplode(col("est")).as(Seq("idx", "est")))
      .select(element_at(typedlit(ps), col("idx") + 1).as("p"), col("est"))
    cents.crossJoin(broadcast(estRows)) // 5-row broadcast scalar attach
      .groupBy(col("p"), col("est"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("v") <= col("est"), 1L).otherwise(0L)).as("est_rank"))
      .select(col("p"), col("n").as("n_rows"),
        expr(s"(p - $BracketPct) * n div 100").as("lo_rank"),
        expr(s"((p + $BracketPct) * n + 99) div 100").as("hi_rank"),
        (col("est_rank") >= expr(s"(p - $BracketPct) * n div 100") &&
          col("est_rank") <= expr(s"((p + $BracketPct) * n + 99) div 100"))
          .as("in_bracket"))
      .orderBy(col("p"))
  }

  private val KllOracle: String =
    s"""WITH t AS (SELECT count(*) AS n FROM lineitem)
      |SELECT p, n AS n_rows,
      |  (p - $BracketPct) * n // 100 AS lo_rank,
      |  ((p + $BracketPct) * n + 99) // 100 AS hi_rank,
      |  TRUE AS in_bracket
      |FROM t, (VALUES (25), (50), (75), (90), (99)) v(p)
      |ORDER BY p""".stripMargin

  val registry: Seq[QueryDef] = Seq(
    QueryDef("sketch_kll_quantiles", kllQuantiles _, KllOracle)
  )
}
