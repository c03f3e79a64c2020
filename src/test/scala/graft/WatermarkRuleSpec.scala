package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins WHICH watermark the late-record filter uses, with a fixture
  * crafted so the candidate rules disagree (the sf replay slices all
  * span the full time range, so they cannot distinguish them):
  *
  *   slice 0 (batch 0): rows at 00:10, 00:20, 00:59  → W after b0 = 00:49
  *   slice 1 (batch 1): one row at 10:00             → W after b1 = 09:50
  *   slice 2 (batch 2): one row at 00:30, window [00:00, 01:00)
  *
  * If batch 2 filters with the watermark ESTABLISHED DURING batch 1
  * (i.e. from slice-0 data only, 00:49), window end 01:00 > 00:49 and
  * the row is KEPT → the 00:00 window emits n=4. If it filters with
  * the watermark CURRENT AT batch 2 (from slices 0∪1, 09:50), the row
  * is DROPPED → n=3.
  */
class WatermarkRuleSpec extends AnyFunSuite with SparkTestBase {

  test("late filter watermark provenance (discriminating fixture)") {
    val base = java.nio.file.Files.createTempDirectory("wm_probe").toFile
    def write(name: String, mtime: Long, ts: Seq[String]): Unit = {
      val tmp = new java.io.File(base, s"_tmp_$name")
      spark.createDataFrame(
          java.util.Arrays.asList(ts.map(org.apache.spark.sql.Row(_)): _*),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("ts_str",
              org.apache.spark.sql.types.StringType))))
        .select(to_timestamp(col("ts_str")).as("ts"))
        .coalesce(1).write.mode("overwrite").parquet(tmp.getPath)
      val part = tmp.listFiles()
        .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
        .getOrElse(sys.error("no part"))
      val dest = new java.io.File(base, name)
      java.nio.file.Files.move(part.toPath, dest.toPath)
      assert(dest.setLastModified(mtime))
    }
    write("slice-0.parquet", 1000000000000L,
      Seq("2024-01-01 00:10:00", "2024-01-01 00:20:00", "2024-01-01 00:59:00"))
    write("slice-1.parquet", 1000000060000L, Seq("2024-01-01 10:00:00"))
    write("slice-2.parquet", 1000000120000L, Seq("2024-01-01 00:30:00"))

    val schema = spark.read.parquet(new java.io.File(base, "slice-0.parquet").getPath).schema
    val agg = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
      .parquet(s"${base.getPath}/slice-*.parquet")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour")).agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("wm_probe")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val rows = spark.table("wm_probe")
      .select(date_format(col("window.start"), "HH:mm").as("s"), col("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val drops = q.recentProgress.toSeq
      .map(p => p.stateOperators.headOption.map(_.numRowsDroppedByWatermark).getOrElse(-1L))
    info(s"emitted=$rows drops=$drops")
    // MEASURED (Spark 4.1): the 00:30 row survives batch 2 — the late
    // filter used 00:49 (watermark established DURING batch 1, i.e.
    // slice-0 data only), not 09:50 (the batch-2-current value from
    // slices 0∪1). stream_late_data's oracle encodes exactly this.
    assert(rows === Map("00:00" -> 4L),
      s"late-filter watermark rule changed: emitted $rows")
    assert(drops.forall(_ == 0L), s"unexpected watermark drops: $drops")
  }
}
