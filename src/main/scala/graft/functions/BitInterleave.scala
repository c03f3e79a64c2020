package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graftglue.{columnToExpr, exprToColumn}
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-order (Morton) key: `interleave_bits16(x, y) → long` interleaves
  * the LOW 16 BITS of each input — x on even bit positions, y on odd —
  * into a 32-bit z-value.
  *
  * This is the data-layout primitive for multi-dimensional clustering:
  * sort (or range-partition) a table by the z-value of two filter
  * columns and every parquet file's min/max column statistics cover a
  * tight axis-aligned rectangle, so a scan with predicates on EITHER
  * dimension prunes files — where a one-column sort order only ever
  * prunes on its leading column. The reference has no layout control
  * at all (its partition "key" is the first letter of the word,
  * reference: `user/UserDefinedFunctions.scala:27-29`).
  *
  * 16 bits per dimension keeps the oracle replayable as a 32-term
  * bitwise-OR in ANSI SQL (see `operators/Layout`); production keys
  * would widen to 32 bits/dim with the same spread steps.
  *
  * The kernel is the classic mask-spread sequence (no loop — straight
  * line integer ops, codegen keeps it inside whole-stage): spread x's
  * 16 bits to even positions via 4 shift-or-mask rounds, same for y,
  * then `z = spread(x) | spread(y) << 1`.
  */
object BitInterleave {

  /** Spread the low 16 bits of v to the even bit positions of a 32-bit
    * word: 0b...b3b2b1b0 → 0b...0b3·0b2·0b1·0b0.
    */
  def spread16(v: Long): Long = {
    var x = v & 0xFFFFL
    x = (x | (x << 8)) & 0x00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0FL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  def interleave16(x: Long, y: Long): Long =
    spread16(x) | (spread16(y) << 1)

  case class InterleaveBits16(left: Expression, right: Expression)
      extends BinaryExpression {

    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType == LongType && right.dataType == LongType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (bigint, bigint), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

    override def dataType: DataType = LongType
    override def nullable: Boolean = left.nullable || right.nullable
    override def prettyName: String = "interleave_bits16"

    override def nullSafeEval(l: Any, r: Any): Any =
      interleave16(l.asInstanceOf[Long], r.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val x = ctx.freshName("x"); val y = ctx.freshName("y")
        s"""
           |long $x = $a & 0xFFFFL;
           |$x = ($x | ($x << 8)) & 0x00FF00FFL;
           |$x = ($x | ($x << 4)) & 0x0F0F0F0FL;
           |$x = ($x | ($x << 2)) & 0x33333333L;
           |$x = ($x | ($x << 1)) & 0x55555555L;
           |long $y = $b & 0xFFFFL;
           |$y = ($y | ($y << 8)) & 0x00FF00FFL;
           |$y = ($y | ($y << 4)) & 0x0F0F0F0FL;
           |$y = ($y | ($y << 2)) & 0x33333333L;
           |$y = ($y | ($y << 1)) & 0x55555555L;
           |${ev.value} = $x | ($y << 1);
           |""".stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Column API: z-order key of two long columns (low 16 bits each). */
  def interleaveBits16(x: Column, y: Column): Column =
    exprToColumn(InterleaveBits16(columnToExpr(x), columnToExpr(y)))
}
