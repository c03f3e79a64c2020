package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedException
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftglue

/** Second whole-operator extension point (beside [[AsOfJoin]]): a
  * DECLARATIVE per-group top-k — "the k highest-`orderCol` rows per
  * `partitionCols` group, ranked" — as a custom Catalyst `LogicalPlan`
  * node whose injected analyzer rule owns the lowering.
  *
  * The rule lowers to `row_number()` over a window + `rank <= k`
  * filter — deliberately, because that exact shape triggers Spark's
  * `InferWindowGroupLimit` optimizer rule, which inserts the
  * `WindowGroupLimit` physical operator: each map task keeps only k
  * rows per group BEFORE the window shuffle, so the exchange moves
  * O(k × groups × partitions) rows instead of the full table. Users
  * who hand-write `filter(col("rn") <= k)` get this for free only if
  * they use the blessed pattern; the node makes the pattern the API.
  *
  * Ties on `orderCol` are broken by `tieBreak` (ascending), making the
  * result deterministic — a requirement for the oracle gate.
  */
final case class TopKPerGroup(
    child: LogicalPlan,
    partitionCols: Seq[String],
    orderCol: String,
    tieBreak: Seq[String],
    k: Int,
    rankName: String) extends UnaryNode {

  // never resolves: analysis can only succeed through the injected
  // rule, so a missing registration fails loudly instead of silently
  override lazy val resolved: Boolean = false
  override def output: Seq[Attribute] = throw new UnresolvedException("output")

  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

/** Analyzer rule lowering [[TopKPerGroup]] to the WindowGroupLimit-
  * eligible window + filter shape.
  */
final class ResolveTopKPerGroup(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case TopKPerGroup(child, parts, ord, tieBreak, k, rankName)
        if child.resolved =>
      val df = graftglue.dfFromPlan(session, child)
      val w = Window.partitionBy(parts.map(col): _*)
        .orderBy(col(ord).desc +: tieBreak.map(c => col(c).asc): _*)
      val lowered = df
        .withColumn(rankName, row_number().over(w))
        .filter(col(rankName) <= k)
      graftglue.analyzedPlanOf(lowered)
  }
}

/** User-facing constructor. */
object TopK {
  def perGroup(df: DataFrame, partitionCols: Seq[String], orderCol: String,
      k: Int, rankName: String = "rn", tieBreak: Seq[String] = Nil): DataFrame = {
    require(k > 0, s"TopK.perGroup: k must be positive, got $k")
    require(partitionCols.nonEmpty, "TopK.perGroup: partitionCols must be non-empty")
    // withColumn resolves case-INsensitively under the default
    // spark.sql.caseSensitive=false, so a case-differing clash would
    // silently overwrite the user's column — match the resolver here
    val caseSensitive =
      df.sparkSession.conf.get("spark.sql.caseSensitive", "false").toBoolean
    val clash = df.columns.exists(c =>
      if (caseSensitive) c == rankName else c.equalsIgnoreCase(rankName))
    require(!clash,
      s"TopK.perGroup: rank column '$rankName' already exists in the input (case-insensitive match); pass a different rankName")
    graftglue.dfFromPlan(df.sparkSession,
      TopKPerGroup(graftglue.analyzedPlanOf(df), partitionCols, orderCol,
        tieBreak, k, rankName))
  }
}
