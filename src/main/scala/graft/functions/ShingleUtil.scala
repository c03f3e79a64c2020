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
    *
    * Windows containing a NULL token are skipped entirely: concatWs
    * would silently drop the null and emit a shorter-than-w gram that
    * collides with genuine (w−1)-grams, so a null token simply breaks
    * the shingle stream — the defined semantics for the SQL-registered
    * function over arbitrary array<string> input, and what keeps the
    * declared `containsNull = false` output type truthful.
    */
  def wordNgrams(tokens: ArrayData, w: Int): ArrayData = {
    val n = tokens.numElements()
    if (n < w) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String](math.max(16, n))
    val parts = new Array[UTF8String](w)
    var i = 0
    while (i <= n - w) {
      var j = 0
      var hasNull = false
      while (j < w) {
        if (tokens.isNullAt(i + j)) hasNull = true
        else parts(j) = tokens.getUTF8String(i + j)
        j += 1
      }
      if (!hasNull) seen.add(UTF8String.concatWs(Space, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }
}
