package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.SortedIntersectSize.sortedIntersectSize

/** The merge-walk intersection kernel behind q77's adjacency
  * intersection (r16 optimization): on sorted duplicate-free bigint
  * arrays it must equal `size(array_intersect(a, b))` exactly, in both
  * codegen and interpreted modes, and on the real co-purchase
  * adjacency frame it must reproduce the builtin's triangle count.
  */
class SortedIntersectSizeSpec extends AnyFunSuite with SparkTestBase {

  private def inBothModes[T](f: => Array[T]): (Array[T], Array[T]) = {
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.get(key, "FALLBACK")
    try {
      spark.conf.set(key, "CODEGEN_ONLY")
      val gen = f
      spark.conf.set(key, "NO_CODEGEN")
      val interp = f
      (gen, interp)
    } finally spark.conf.set(key, prev)
  }

  test("equals size(array_intersect) on random sorted distinct arrays, both modes") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = Seq.tabulate(500) { _ =>
      def arr(): Array[Long] =
        Array.fill(rnd.nextInt(150))(rnd.nextInt(400).toLong)
          .distinct.sorted
      (arr(), arr())
    } ++ Seq(
      (Array.empty[Long], Array.empty[Long]),
      (Array.empty[Long], Array(1L, 2L)),
      (Array(1L), Array(1L)),
      (Array(Long.MinValue, 0L, Long.MaxValue),
        Array(Long.MinValue, Long.MaxValue)))
    val df = rows.toDF("a", "b").localCheckpoint()
    def run: Array[(Long, Long)] = df
      .select(sortedIntersectSize(col("a"), col("b")).as("walk"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("ref"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val (gen, interp) = inBothModes(run)
    assert(gen.toSeq === interp.toSeq)
    gen.foreach { case (walk, ref) => assert(walk === ref) }
  }

  test("null array propagates null") {
    import spark.implicits._
    val df = Seq((Some(Array(1L, 2L)), Option.empty[Array[Long]]))
      .toDF("a", "b")
    val out = df.select(sortedIntersectSize(col("a"), col("b"))).collect()
    assert(out.head.isNullAt(0))
  }

  test("reproduces the builtin triangle count on the real adjacency frame") {
    val li = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val adj = li.groupBy(col("ok")).agg(collect_set(col("pk")).as("pks"))
      .select(explode(col("pks")).as("u"), col("pks"))
      .select(col("u"), explode(col("pks")).as("v"))
      .filter(col("u") < col("v"))
      .groupBy(col("u").as("p"))
      .agg(sort_array(collect_set(col("v"))).as("nbrs"))
      .localCheckpoint()
    val edges = adj.select(col("p").as("u"), explode(col("nbrs")).as("v"))
    val joined = edges
      .join(broadcast(adj.select(col("p").as("u"), col("nbrs").as("nu"))), Seq("u"))
      .join(broadcast(adj.select(col("p").as("v"), col("nbrs").as("nv"))), Seq("v"))
    val viaWalk = joined
      .agg(sum(sortedIntersectSize(col("nu"), col("nv")))).head.getLong(0)
    val viaBuiltin = joined
      .agg(sum(size(array_intersect(col("nu"), col("nv"))).cast("long")))
      .head.getLong(0)
    assert(viaWalk === viaBuiltin)
    assert(viaWalk > 0L) // the fixture graph genuinely has triangles
  }
}
