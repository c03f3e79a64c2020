package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Canary for driver-side testdata regeneration. Round 5 lost 35 of 170
  * queries to a silent regen that flipped `events.ts` from parquet
  * TIMESTAMP(NANOS) to timestamp[us] under a hard-coded adapter. This
  * spec fails LOUDLY — one named test, readable message — when the next
  * regen changes a shape the loaders depend on. Analysis-only (schema
  * resolution, no job execution), so it costs milliseconds per table.
  */
class TestdataDriftSpec extends AnyFunSuite with SparkTestBase {

  private val dirs = Seq(sf0001, sf001, "/root/testdata/sf0.1")

  test("every Tables loader resolves against every SF (analysis only)") {
    for (d <- dirs; t <- Tables.names) {
      val schema =
        try {
          if (t == "events") Tables.events(spark, d).schema
          else Tables.load(spark, d, t).schema
        } catch {
          case e: Throwable =>
            fail(s"testdata drift: loader for '$t' at $d no longer " +
              s"resolves — ${e.getMessage}")
        }
      assert(schema.nonEmpty, s"$t at $d resolved to an empty schema")
    }
  }

  test("events.ts normalizes to µs TimestampType at every SF") {
    dirs.foreach { d =>
      val dt = Tables.events(spark, d).schema("ts").dataType
      assert(dt === TimestampType,
        s"testdata drift: events.ts at $d normalized to $dt, not " +
          "TimestampType — update Tables.adaptEventsTs for the new encoding")
    }
  }

  test("adaptEventsTs handles every historical ts encoding") {
    import spark.implicits._
    // raw int64 epoch-nanos (the legacy-long read of TIMESTAMP(NANOS))
    val nanos = Seq((1L, 1700000000123456789L)).toDF("event_id", "ts")
    val fromNanos = Tables.adaptEventsTs(nanos)
    assert(fromNanos.schema("ts").dataType === TimestampType)
    assert(fromNanos.select(unix_micros(col("ts"))).head.getLong(0)
      === 1700000000123456L, "nanos must truncate (not round) to µs")
    // TIMESTAMP_NTZ (how inferTimestampNTZ reads plain timestamp[us])
    val ntz = Seq((1L, java.time.LocalDateTime.of(2023, 11, 14, 22, 13, 20)))
      .toDF("event_id", "ts")
    val fromNtz = Tables.adaptEventsTs(ntz)
    assert(fromNtz.schema("ts").dataType === TimestampType)
    assert(fromNtz.select(unix_micros(col("ts"))).head.getLong(0)
      === 1700000000000000L, "NTZ→TS must be the identity under UTC")
    // already-canonical TimestampType passes through untouched
    val ts = Seq((1L, new java.sql.Timestamp(1700000000000L)))
      .toDF("event_id", "ts")
    assert(Tables.adaptEventsTs(ts) eq ts)
    // an encoding nobody taught it yet must fail LOUDLY, naming the fix
    val weird = Seq((1L, "2023-11-14")).toDF("event_id", "ts")
    val e = intercept[RuntimeException](Tables.adaptEventsTs(weird))
    assert(e.getMessage.contains("testdata drifted"))
  }
}
