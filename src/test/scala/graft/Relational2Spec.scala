package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational2

class Relational2Spec extends AnyFunSuite with SparkTestBase {

  test("salted aggregation equals plain aggregation exactly") {
    val salted = Relational2.q23SaltedAgg(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val plain = Tables.events(spark, sf001)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(Tables.money(col("value"))).cast("double").as("s"))
      .orderBy(col("event_type")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(salted.toSeq === plain.toSeq)
  }

  test("salted aggregation stays exact under heavy key skew") {
    // amplify one event_type 50x: ~91% of all rows share one key
    val base = Tables.events(spark, sf0001)
      .select(col("event_id"), col("event_type"), col("value"))
    val hot = base.filter(col("event_type") === "purchase")
      .withColumn("rep", explode(array_repeat(lit(1), 50)))
      .drop("rep")
    val skewed = base.union(hot)
    val salted = skewed
      .withColumn("salt", pmod(col("event_id"), lit(8)))
      .groupBy(col("event_type"), col("salt"))
      .agg(count(lit(1)).as("pn"), sum(Tables.money(col("value"))).as("ps"))
      .groupBy(col("event_type"))
      .agg(sum(col("pn")).as("n"), sum(col("ps")).cast("double").as("s"))
      .orderBy(col("event_type")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val plain = skewed.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(Tables.money(col("value"))).cast("double").as("s"))
      .orderBy(col("event_type")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(salted.toSeq === plain.toSeq)
    val hotShare = plain.find(_._1 == "purchase").get._2.toDouble /
      plain.map(_._2).sum
    assert(hotShare > 0.85, s"skew amplification failed: $hotShare")
  }

  test("approx_count_distinct within 5% of exact") {
    Relational2.q32Frame(spark, sf001).collect().foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"${r.getString(0)}: approx=$approx exact=$exact")
    }
    // the registered bracket shape must agree with the raw-value check
    Relational2.q32ApproxDistinct(spark, sf001).collect().foreach { r =>
      assert(r.getBoolean(2), s"${r.getString(0)}: bracket boolean false")
    }
  }

  test("grouping sets emit the 3 expected grouping shapes") {
    val rows = Relational2.q24GroupingSets(spark, sf0001).collect()
    val shapes = rows.map(r => (r.getLong(2), r.getLong(3))).distinct.sorted
    assert(shapes.toSeq === Seq((0L, 1L), (1L, 0L), (1L, 1L)))
    // grand total row matches table count
    val total = rows.filter(r => r.getLong(2) == 1 && r.getLong(3) == 1)
    assert(total.length === 1)
    assert(total.head.getLong(4) === Tables.orders(spark, sf0001).count())
  }

  test("cross join cardinality = |nation| × |region|") {
    assert(Relational2.q26CrossJoin(spark, sf0001).count() === 25L * 5L)
  }

  test("window analytic: first/last bracket every customer's prices") {
    val rows = Relational2.q28WindowAnalytic(spark, sf0001).collect()
      .groupBy(_.getLong(0))
    rows.foreach { case (_, rs) =>
      val firsts = rs.map(_.getDouble(4)).distinct
      val lasts = rs.map(_.getDouble(5)).distinct
      assert(firsts.length === 1 && lasts.length === 1)
      // lag of row i+1 equals price chain consistency: prev of first row is null
      assert(rs.exists(_.isNullAt(2)))
    }
  }
}
