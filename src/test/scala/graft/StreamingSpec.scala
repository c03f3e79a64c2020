package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingQueries

/** Streaming results must equal their batch-equivalent computations
  * (beyond the DuckDB oracle, which already pins them at sf0.01).
  */
class StreamingSpec extends AnyFunSuite with SparkTestBase {

  test("stream_tumbling equals batch tumbling aggregation") {
    val streamed = StreamingQueries.streamTumbling(spark, sf0001).collect()
    val batch = Tables.events(spark, sf0001)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(Tables.money(col("value"))).cast("double").as("sum_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("window_start"), col("event_type"))
      .collect()
    assert(streamed.toSeq === batch.toSeq)
  }

  test("stream_dedup equals batch distinct") {
    val streamed = StreamingQueries.streamDedup(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val batch = Tables.events(spark, sf0001)
      .select("user_id", "event_type").distinct()
      .orderBy("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(streamed.toSeq === batch.toSeq)
  }

  test("stream_session: session count and event conservation") {
    val sessions = StreamingQueries.streamSession(spark, sf0001).collect()
    val totalEvents = sessions.map(_.getLong(2)).sum
    assert(totalEvents === Tables.events(spark, sf0001).count())
    // session starts are unique per user
    val keys = sessions.map(r => (r.getLong(0), r.getString(1)))
    assert(keys.distinct.length === keys.length)
  }
}
