package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Word-shingle kernel — standalone object for Janino-friendly static
  * calls from generated code.
  */
object ShingleUtil {
  private val Space = UTF8String.fromString(" ")

  /** Distinct word 3-grams in first-occurrence order (matches the
    * array_distinct(transform(…)) built-in formulation and DuckDB's
    * list_distinct ordering), one pass, no intermediate arrays.
    */
  def wordShingles3(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    if (n < 3) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String](math.max(16, n))
    var i = 0
    while (i <= n - 3) {
      val s = UTF8String.concatWs(Space,
        tokens.getUTF8String(i), tokens.getUTF8String(i + 1),
        tokens.getUTF8String(i + 2))
      seen.add(s)
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }
}
