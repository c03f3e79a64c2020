package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedException
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftglue

/** The whole-operator extension point (SURVEY.md §7 custom-vs-built-in
  * ladder, tier c): a DECLARATIVE as-of join — "for each left row, the
  * most recent right-side time at or before it, per key" — expressed as
  * a custom Catalyst `LogicalPlan` node that an injected analyzer
  * `Rule` lowers to the scale-correct union+running-max plan (ONE
  * shuffle, no join blowup, no skew amplification — the same shape
  * hand-written in `Relational.q18AsofJoin` and pinned by its oracle).
  *
  * Spark itself has no as-of join in SQL/DataFrame-land (only
  * pandas-on-Spark's merge_asof, which lowers to a join+argmax), so
  * this is a genuine operator gap: the node gives users the 6-argument
  * declarative form, and the rule — not the user — owns the physical
  * strategy. Registered via `GraftExtensions` (`spark.sql.extensions`),
  * so any session on a cluster picks it up from config alone; a session
  * without the rule fails analysis loudly rather than running a wrong
  * plan.
  *
  * Reserved column names `__asof_k/__asof_t/__asof_side` are internal
  * to the lowered plan; the left side must not use them.
  */
final case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    key: String,
    leftTime: String,
    rightTime: String,
    asOfName: String) extends BinaryNode {

  // never resolves: analysis can only succeed through ResolveAsOfJoin,
  // so a missing rule registration is a hard error, not silence
  override lazy val resolved: Boolean = false
  override def output: Seq[Attribute] = throw new UnresolvedException("output")

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Analyzer rule lowering [[AsOfJoin]]: tag both inputs, union them
  * (left columns null on the right side), take the per-key running max
  * of right-side times in (time, side) order — side 0 first so an
  * equal-timestamp right row IS visible to the left row (`<=`
  * semantics) — then keep only left rows. Cost: one hash shuffle on the
  * key, one sort within partitions; never materializes candidate pairs.
  */
final class ResolveAsOfJoin(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case AsOfJoin(l, r, key, lt, rt, asOfName) if l.resolved && r.resolved =>
      val leftDf = graftglue.dfFromPlan(session, l)
      val rightDf = graftglue.dfFromPlan(session, r)
      val leftCols = leftDf.columns.toSeq.map(col)
      val lTag = leftDf.select(leftCols ++ Seq(
        col(key).as("__asof_k"), col(lt).as("__asof_t"),
        lit(1).as("__asof_side")): _*)
      val rTag = rightDf.select(
        leftDf.schema.fields.toSeq.map(f =>
          lit(null).cast(f.dataType).as(f.name)) ++ Seq(
          col(key).as("__asof_k"), col(rt).as("__asof_t"),
          lit(0).as("__asof_side")): _*)
      val w = Window.partitionBy(col("__asof_k"))
        .orderBy(col("__asof_t"), col("__asof_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val lowered = lTag.unionAll(rTag)
        .withColumn("__asof_val",
          max(when(col("__asof_side") === 0, col("__asof_t"))).over(w))
        .filter(col("__asof_side") === 1)
        .select(leftCols :+ col("__asof_val").as(asOfName): _*)
      graftglue.analyzedPlanOf(lowered)
  }
}

/** User-facing constructor: wraps the children's logical plans in the
  * custom node; the injected rule owns everything below.
  */
object AsOf {

  /** Column-name prefix reserved by the lowered plan. */
  val ReservedPrefix = "__asof_"

  def join(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, asOfName: String): DataFrame = {
    // fail at the API boundary with the reserved prefix named, instead
    // of a confusing duplicate-attribute error deep in the lowered plan
    val clashes = (left.columns ++ right.columns).filter(_.startsWith(ReservedPrefix))
    require(clashes.isEmpty,
      s"AsOf.join: column name(s) ${clashes.distinct.mkString(", ")} collide with " +
        s"the reserved internal prefix '$ReservedPrefix'; rename them before joining")
    require(!asOfName.startsWith(ReservedPrefix),
      s"AsOf.join: output column '$asOfName' must not use the reserved prefix '$ReservedPrefix'")
    // a duplicate output name would only surface as AMBIGUOUS_REFERENCE
    // at the first downstream use — reject it here instead (resolver is
    // case-insensitive by default, so compare the same way)
    val caseSensitive =
      left.sparkSession.conf.get("spark.sql.caseSensitive", "false").toBoolean
    require(!left.columns.exists(c =>
        if (caseSensitive) c == asOfName else c.equalsIgnoreCase(asOfName)),
      s"AsOf.join: output column '$asOfName' collides with an existing left column; pass a different asOfName")
    graftglue.dfFromPlan(left.sparkSession,
      AsOfJoin(graftglue.analyzedPlanOf(left), graftglue.analyzedPlanOf(right),
        key, leftTime, rightTime, asOfName))
  }
}
