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
  def wordShingles3(tokens: ArrayData): ArrayData = wordNgrams(tokens, 3)

  /** Distinct word n-grams in first-occurrence order (matches the
    * array_distinct(transform(…)) built-in formulation and DuckDB's
    * list_distinct ordering), one pass, no intermediate arrays.
    */
  def wordNgrams(tokens: ArrayData, w: Int): ArrayData = {
    val n = tokens.numElements()
    if (n < w) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String](math.max(16, n))
    val parts = new Array[UTF8String](w)
    var i = 0
    while (i <= n - w) {
      var j = 0
      while (j < w) { parts(j) = tokens.getUTF8String(i + j); j += 1 }
      seen.add(UTF8String.concatWs(Space, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }
}
