package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftglue.exprToColumn
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Shared JVM kernels for the probabilistic-membership and frequency
  * sketches (`operators/Sketches2`): a blocked Bloom filter and a
  * count-min matrix, both over 64-bit keys. One definition serves the
  * Aggregator (build), the codegen Expression (probe) and the specs, so
  * the three can never drift. Hashing is Kirsch–Mitzenmacher double
  * hashing over a SplitMix64 finalizer (Steele et al., "Fast Splittable
  * Pseudorandom Number Generators", OOPSLA'14 — public mixing
  * constants): position_i = h1 + i·h2 mod m, giving k independent-enough
  * probes from two mixes.
  */
object SketchUtil {

  /** SplitMix64 finalizer: the standard 64-bit avalanche mix. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  // ---- Bloom filter: NumBits bits as long words, K probes per key ----

  /** 2^20 bits = 128 KiB — ~35 bits/key at the sf0.1 build cardinality
    * (~30k urgent orders), false-positive rate ≈ 5e-5. At 100 TB the
    * width is the ONE knob: size m ≈ 10–14 bits per expected build key
    * (1 GiB of filter covers ~800M keys at 1% FP) and keep everything
    * else unchanged.
    */
  val BloomBits = 1 << 20
  val BloomWords: Int = BloomBits / 64
  val BloomK = 5

  def bloomAdd(words: Array[Long], key: Long): Unit = {
    val h1 = mix(key)
    val h2 = mix(h1) | 1L // odd step → full cycle over the bit space
    var i = 0
    while (i < BloomK) {
      val pos = ((((h1 + i * h2) % BloomBits) + BloomBits) % BloomBits).toInt
      words(pos >>> 6) |= 1L << (pos & 63)
      i += 1
    }
  }

  /** Static-forwarded so generated Java can call it directly. */
  def bloomMightContain(words: Array[Long], key: Long): Boolean = {
    val h1 = mix(key)
    val h2 = mix(h1) | 1L
    var i = 0
    while (i < BloomK) {
      val pos = ((((h1 + i * h2) % BloomBits) + BloomBits) % BloomBits).toInt
      if ((words(pos >>> 6) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  // ---- Count-min: Depth rows of Width counters, row d seeded by d ----

  val CmDepth = 4
  /** Power of two so the row index is a mask, not a modulo. Error bound
    * ε = e/Width per the CM guarantee; at 100 TB widen the row (the
    * sketch stays KiB-scale until Width reaches millions) — depth only
    * sharpens the CONFIDENCE, not the bound.
    */
  val CmWidth = 2048

  private def cmIdx(key: Long, d: Int): Int =
    (mix(key ^ (d.toLong * 0xA5A5A5A5A5A5A5A5L)) & (CmWidth - 1)).toInt

  def cmAdd(buf: Array[Long], key: Long): Unit = {
    var d = 0
    while (d < CmDepth) {
      buf(d * CmWidth + cmIdx(key, d)) += 1L
      d += 1
    }
  }

  def cmEstimate(buf: Array[Long], key: Long): Long = {
    var est = Long.MaxValue
    var d = 0
    while (d < CmDepth) {
      val c = buf(d * CmWidth + cmIdx(key, d))
      if (c < est) est = c
      d += 1
    }
    est
  }
}

object SketchExpressions {

  /** bloom_might_contain(long) → boolean, probing a DRIVER-BUILT filter
    * shipped into codegen as a reference object (each executor gets one
    * array with the task closure — the explicit form of the runtime
    * bloom filter Spark's `InjectRuntimeFilter` plants under a shuffle
    * join, made deterministic and plan-visible). No false negatives by
    * construction; false positives are removed by the exact join that
    * always follows (see `Sketches2.bloomJoin`).
    */
  case class BloomMightContain(child: Expression, words: Array[Long])
      extends UnaryExpression {

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case LongType if words.length == SketchUtil.BloomWords =>
        TypeCheckResult.TypeCheckSuccess
      case LongType => TypeCheckResult.TypeCheckFailure(
        s"$prettyName filter must have ${SketchUtil.BloomWords} words, " +
          s"got ${words.length}")
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects bigint, got ${other.simpleString}")
    }
    override def dataType: DataType = BooleanType
    override def prettyName: String = "bloom_might_contain"

    override def nullSafeEval(input: Any): Any =
      SketchUtil.bloomMightContain(words, input.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bloomWords", words, "long[]")
      nullSafeCodeGen(ctx, ev, key =>
        s"${ev.value} = graft.functions.SketchUtil.bloomMightContain($ref, $key);\n")
    }

    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(child = newChild)
  }

  def bloomMightContain(key: Column, words: Array[Long]): Column =
    exprToColumn(BloomMightContain(
      org.apache.spark.sql.graftglue.columnToExpr(key), words))
}
