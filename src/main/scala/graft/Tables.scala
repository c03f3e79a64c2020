package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Loaders for the driver-generated parquet test tables (see TESTDATA.md).
  *
  * One parquet file per table under `\$dir/`. All queries go through here so
  * that scans stay plain `spark.read.parquet` — Catalyst then gets full
  * predicate-pushdown / column-pruning / partition-split planning on the
  * file source. At 100 TB these would be directories of parquet files
  * (possibly partitioned/bucketed); nothing in the query code assumes a
  * single file.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    require(names.contains(name), s"unknown table: $name")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Oracle-stable money arithmetic. Sums of 2-decimal doubles are
    * summation-order-dependent in the last bits, and `round(sum, 2)` sits
    * on an exact `.xx5` knife-edge whenever the true decimal sum ends in
    * a half-cent — Spark (BigDecimal HALF_UP) and DuckDB (multiply-shift)
    * then disagree. Casting to decimal makes the sum EXACT in both
    * engines; casting the exact result back to double is
    * nearest-double-of-the-same-rational, hence bit-identical.
    */
  def money(c: Column): Column = c.cast(DecimalType(12, 2))
  /** discount/tax factors (0.00–0.10), 2 decimals. */
  def rate(c: Column): Column = c.cast(DecimalType(4, 2))
  def sumMoney(c: Column): Column = sum(money(c)).cast("double")

  /** Engine-stable 4-decimal rounding: `floor(x·10⁴ + 0.5)/10⁴` is the
    * same IEEE op sequence in Spark and DuckDB, so identical input
    * doubles give identical output — unlike round(), whose half-up
    * implementations diverge when the true value sits exactly on a
    * 0.00005 boundary (as rationals like 567/4000 routinely do). The
    * single definition here keeps every operator module and its DuckDB
    * oracle twin on the same idiom.
    */
  def r4(c: Column): Column = floor(c * 10000 + 0.5) / 10000

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects ([PARQUET_TYPE_ILLEGAL]). Read it as raw nanos
    * (legacy long mode) and truncate to microseconds — the same
    * truncation DuckDB applies when it coerces ns → its µs timestamp.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
