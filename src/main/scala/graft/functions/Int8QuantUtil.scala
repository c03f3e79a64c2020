package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData

/** Shared kernel for [[VectorExpressions.Int8QuantStats]] — a standalone
  * object so codegen can call it through a static forwarder
  * (Janino-friendly), and the interpreted path shares the exact same
  * IEEE operation sequence.
  *
  * Semantics (must stay in lockstep with the DuckDB oracle in
  * `operators/Embeddings`): scale = 127 / max|x_i| (double math),
  * q_i = floor(x_i · scale + 0.5) as long, q_sum = Σ q_i,
  * n_saturated = #{i : |q_i| = 127}. A zero or empty vector has no
  * scale: (NULL, NULL, 0). NULL and NaN elements are SKIPPED in every
  * aggregate, so the SQL-registered function is total over any
  * array<float>, not just the clean embeddings table. DuckDB does NOT
  * skip NaN on its own — it orders NaN as the greatest float, so a bare
  * list_max would yield scale = NaN — which is why the oracle filters
  * NULL/NaN elements out with list_filter BEFORE every fold, keeping
  * the two engines in lockstep on dirty vectors too.
  */
object Int8QuantUtil {

  private def usable(arr: ArrayData, i: Int): Boolean =
    !arr.isNullAt(i) && !java.lang.Float.isNaN(arr.getFloat(i))

  def stats(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    var maxAbs = 0.0
    var any = false
    var i = 0
    while (i < n) {
      if (usable(arr, i)) {
        any = true
        val x = math.abs(arr.getFloat(i).toDouble)
        if (x > maxAbs) maxAbs = x
      }
      i += 1
    }
    val row = new GenericInternalRow(3)
    if (!any || maxAbs <= 0.0) {
      row.setNullAt(0); row.setNullAt(1); row.setLong(2, 0L)
    } else {
      val scale = 127.0 / maxAbs
      var qSum = 0L
      var nSat = 0L
      i = 0
      while (i < n) {
        if (usable(arr, i)) {
          val q = math.floor(arr.getFloat(i).toDouble * scale + 0.5).toLong
          qSum += q
          if (q == 127L || q == -127L) nSat += 1
        }
        i += 1
      }
      row.update(0, scale); row.setLong(1, qSum); row.setLong(2, nSat)
    }
    row
  }
}
