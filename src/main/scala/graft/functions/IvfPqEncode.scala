package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftglue.{columnToExpr, exprToColumn}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Fused IVF+PQ encoder:
  * `ivfpq_encode(array<float>) → array<int>` of length `1 + m` —
  * element 0 is the coarse IVF cell (cosine argmax over the broadcast
  * centroid table, tie → LARGEST index, matching the struct-max
  * semantics of the IVF tier's `nearestCentroidIdx`), elements 1..m
  * are the PQ codes of the RESIDUAL `normalize(v) − centroid[cell]`
  * (squared-L2 argmin per subspace, tie → lowest index, matching
  * [[PqUtil.encode]]).
  *
  * One tight primitive loop per row, same discipline as [[PqEncode]]:
  * normalize once, one pass over the centroid table for the coarse
  * argmax, then M·K·D fused float ops for the residual codes — zero
  * per-row allocations beyond the output ints. The naive composition
  * this avoids (cosine-argmax expression + an interpreted `zip_with`
  * subtraction + a second encode kernel) re-derives the normalized
  * vector three times and pays a per-element lambda for the residual;
  * fusing keeps the whole encode inside one codegen call.
  *
  * Both tables are constructor parameters (per-query training
  * artifacts, not SQL data), so like [[PqEncode]] this expression is
  * API-only — not FunctionRegistry-registered.
  */
object IvfPqUtil {

  /** @param cents coarse centroids flattened as [c][dims]
    * @param books residual codebooks flattened as [m][k][d]
    */
  def encode(v: ArrayData, cents: Array[Float], books: Array[Float],
      nc: Int, m: Int, k: Int, d: Int): ArrayData = {
    val dims = m * d
    val vec = new Array[Double](dims)
    var i = 0
    var norm = 0.0
    val n = math.min(v.numElements(), dims)
    while (i < n) {
      val x = v.getFloat(i).toDouble
      vec(i) = x
      norm += x * x
      i += 1
    }
    norm = math.sqrt(norm)
    if (norm != 0.0) {
      i = 0
      while (i < dims) { vec(i) /= norm; i += 1 }
    }
    // coarse cell: cosine argmax over the centroid table; v is unit so
    // cosine = dot / ||c||. Ties break to the LARGER index (>=), the
    // exact struct-max order the IVF tier's array_max argmax uses.
    var best = 0
    var bestS = Double.NegativeInfinity
    var c = 0
    while (c < nc) {
      var dot = 0.0
      var cn = 0.0
      var j = 0
      val base = c * dims
      while (j < dims) {
        val cv = cents(base + j).toDouble
        dot += vec(j) * cv
        cn += cv * cv
        j += 1
      }
      val s = if (cn == 0.0) 0.0 else dot / math.sqrt(cn)
      if (s >= bestS) { bestS = s; best = c }
      c += 1
    }
    // residual in place, then per-subspace squared-L2 argmin
    val cbase = best * dims
    i = 0
    while (i < dims) { vec(i) -= cents(cbase + i).toDouble; i += 1 }
    val out = new Array[Int](1 + m)
    out(0) = best
    var mm = 0
    while (mm < m) {
      var bk = 0
      var bestD = Double.MaxValue
      var kk = 0
      while (kk < k) {
        var dist = 0.0
        var dd = 0
        val bbase = (mm * k + kk) * d
        while (dd < d) {
          val diff = vec(mm * d + dd) - books(bbase + dd)
          dist += diff * diff
          dd += 1
        }
        if (dist < bestD) { bestD = dist; bk = kk }
        kk += 1
      }
      out(1 + mm) = bk
      mm += 1
    }
    new GenericArrayData(out.map(Int.box))
  }
}

case class IvfPqEncode(child: Expression, flatCents: Array[Float],
    flatBooks: Array[Float], nc: Int, m: Int, k: Int, d: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "ivfpq_encode"

  override def nullSafeEval(input: Any): Any =
    IvfPqUtil.encode(input.asInstanceOf[ArrayData], flatCents, flatBooks,
      nc, m, k, d)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("ivfpqCents", flatCents, "float[]")
    val booksRef = ctx.addReferenceObj("ivfpqBooks", flatBooks, "float[]")
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.IvfPqUtil.encode($in, $centsRef, " +
        s"$booksRef, $nc, $m, $k, $d);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object IvfPqEncode {
  def apply(v: Column, cents: Array[Array[Float]],
      books: Array[Array[Array[Float]]]): Column = {
    val m = books.length
    val k = books.head.length
    val d = books.head.head.length
    exprToColumn(IvfPqEncode(columnToExpr(v), cents.flatten, books.flatten.flatten,
      cents.length, m, k, d))
  }
}
