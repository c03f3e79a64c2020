package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.{SketchExpressions, SketchUtil}

/** Second sketch batch: probabilistic MEMBERSHIP (Bloom) and FREQUENCY
  * (count-min) — the two classic mergeable summaries `Sketches` (heavy
  * hitters) and `q61` (HLL distinct) don't cover. Both build through
  * ordinary two-phase typed Aggregators whose merge is elementwise
  * OR / sum, so partials combine in any order on any partitioning; both
  * kernels live in [[graft.functions.SketchUtil]] so the build side, the
  * probe side and the specs share one definition.
  */
object Sketches2 {

  /** The Bloom build pass: fold keys into one [[SketchUtil.BloomWords]]
    * bitset per partition, OR the partials.
    */
  class BloomBuildAgg extends Aggregator[Long, Array[Long], Array[Long]] {
    override def zero: Array[Long] = new Array[Long](SketchUtil.BloomWords)
    override def reduce(b: Array[Long], key: Long): Array[Long] = {
      SketchUtil.bloomAdd(b, key); b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: Encoder[Array[Long]] =
      Encoders.kryo[Array[Long]]
    override def outputEncoder: Encoder[Array[Long]] =
      Encoders.kryo[Array[Long]]
  }

  /** Bloom-prefiltered join: revenue of lineitems belonging to URGENT
    * orders, with the probe side (lineitem) cut down by a Bloom filter
    * on the build side's keys BEFORE any join machinery runs — the
    * explicit, deterministic form of the runtime filter Spark's
    * `InjectRuntimeFilter` rule plants under selective shuffle joins.
    * The exact join that follows removes the filter's false positives,
    * so the result is bit-identical to the plain join (the oracle IS
    * the plain join) — the sketch changes the plan, never the answer.
    *
    * Scale: the filter is 128 KiB of driver state (same bounded-state
    * budget as the IVF centroids) broadcast into the probe scan's
    * codegen, so at 100 TB the probe side sheds ~80% of its rows at
    * scan time and the shuffle moves only probable matches. Sizing is
    * one knob (bits/key — see [[SketchUtil.BloomBits]]); no false
    * negatives by construction, FP rate ≈ 5e-5 at the bench build
    * cardinality (spec-pinned).
    */
  def bloomJoin(spark: SparkSession, dir: String): DataFrame = {
    val urgent = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val words = urgent.as[Long](Encoders.scalaLong)
      .select(new BloomBuildAgg().toColumn).head()
    Tables.lineitem(spark, dir)
      .filter(SketchExpressions.bloomMightContain(col("l_orderkey"), words))
      .join(urgent, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        Tables.sumMoney(col("l_extendedprice")).as("revenue"))
      .orderBy(col("l_returnflag"))
  }

  private val BloomJoinOracle: String =
    """SELECT l_returnflag, cast(count(*) AS BIGINT) AS n_items,
      |  cast(sum(cast(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
      |    AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderpriority = '1-URGENT'
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** The count-min build pass: a Depth×Width counter matrix, merged by
    * elementwise sum — counters are exact integer sums, so the FINAL
    * matrix (unlike Misra–Gries contents) is merge-order-INDEPENDENT
    * and the query's output is deterministic.
    */
  class CountMinAgg extends Aggregator[Long, Array[Long], Array[Long]] {
    override def zero: Array[Long] =
      new Array[Long](SketchUtil.CmDepth * SketchUtil.CmWidth)
    override def reduce(b: Array[Long], key: Long): Array[Long] = {
      SketchUtil.cmAdd(b, key); b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: Encoder[Array[Long]] =
      Encoders.kryo[Array[Long]]
    override def outputEncoder: Encoder[Array[Long]] =
      Encoders.kryo[Array[Long]]
  }

  /** Probe set: the sketch answers point queries; these are the keys the
    * query reports (small, fixed, deterministic).
    */
  val CmProbeMax = 16L

  /** Count-min frequency estimates vs exact truth for the probe users:
    * one sketch pass over the full event stream (64 KiB of mergeable
    * state moved per partition — never a per-key shuffle), one exact
    * pass over ONLY the probe keys' rows, reported side by side. The
    * classic CM guarantee holds deterministically on the ≥ side
    * (est ≥ exact always — hash collisions only ADD); the ≤ side
    * (est ≤ exact + e/Width · N w.h.p.) is pinned by Sketches2Spec.
    * The raw estimates depend on the JVM hash mix, which SQL can't
    * replicate — so the registered output is the exact count plus a
    * boolean pinning BOTH sides of the CM guarantee (est ≥ exact, and
    * est ≤ exact + e/Width·N + 1, the same bound Sketches2Spec asserts
    * over every key; N rides along as the sum of the matrix's first
    * row — each depth row independently sums to the stream length).
    * DuckDB replays the exact side and a literal TRUE (exact-bracket
    * idiom, see `Relational2.q37ApproxPercentile`); [[countMinFrame]]
    * keeps the raw estimates for the spec.
    *
    * At 100 TB: the sketch pass shuffles Depth×Width longs per
    * partition regardless of key cardinality (vs a groupBy over ~1e9
    * users), which is the whole point of frequency sketching; the
    * exact pass stays cheap because the probe set is pushed into the
    * scan as an IN filter.
    */
  private[graft] def countMinFrame(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val events = Tables.events(spark, dir)
    val sketch = events.select(col("user_id")).as[Long](Encoders.scalaLong)
      .select(new CountMinAgg().toColumn).head()
    val n = sketch.take(SketchUtil.CmWidth).sum
    val bound = math.E / SketchUtil.CmWidth * n + 1
    val ests = (0L until CmProbeMax)
      .map(u => (u, SketchUtil.cmEstimate(sketch, u), bound))
      .toDF("user_id", "est", "bound")
    val exact = events.filter(col("user_id") < CmProbeMax)
      .groupBy(col("user_id")).agg(count(lit(1)).as("exact_cnt"))
    exact.join(broadcast(ests), Seq("user_id"))
      .select(col("user_id"), col("est"), col("exact_cnt"), col("bound"))
      .orderBy(col("user_id"))
  }

  def countMin(spark: SparkSession, dir: String): DataFrame =
    countMinFrame(spark, dir)
      .select(col("user_id"), col("exact_cnt"),
        (col("est") >= col("exact_cnt") &&
          (col("est") - col("exact_cnt")).cast("double") <= col("bound"))
          .as("within_bounds"))
      .orderBy(col("user_id"))

  val registry: Seq[QueryDef] = Seq(
    QueryDef("sketch_bloom_join", bloomJoin _, BloomJoinOracle),
    QueryDef("sketch_countmin", countMin _,
      s"""SELECT user_id, count(*) AS exact_cnt, true AS within_bounds
         |FROM events WHERE user_id < $CmProbeMax
         |GROUP BY user_id ORDER BY user_id""".stripMargin)
  )
}
