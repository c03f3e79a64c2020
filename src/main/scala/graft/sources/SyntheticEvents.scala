package graft.sources

import java.util.OptionalLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import graft.QueryDef

/** A full DataSourceV2 connector: a deterministic synthetic event
  * generator (`spark.read.format("graft-events")`) exercising the whole
  * batch-read contract — `planInputPartitions` split planning,
  * `SupportsPushDownFilters` (id-range predicates are absorbed into the
  * generation range, so filtered rows are NEVER materialized),
  * `SupportsPushDownRequiredColumns` (pruned columns are never
  * computed), and `SupportsReportStatistics` (row/byte estimates feed
  * Catalyst's join-side sizing). This is the connector shape a 100 TB
  * deployment uses for first-party formats: pushdown at the source is
  * the difference between scanning a shard and scanning a fleet.
  *
  * Row formula (exact int64 arithmetic, replayable in ANSI SQL — the
  * DuckDB oracle regenerates it with generate_series):
  * {{{
  *   mix         = (id * 2654435761) % 2^32          // Knuth multiplicative
  *   user_id     = mix % 997
  *   event_type  = ['view','click','purchase','signup','error'][mix % 5]
  *   value_cents = ((id % 2^32) * 1103515245 + 12345) % 100000
  *   ts_s        = 1704067200 + id % 2592000
  * }}}
  * All kernels are overflow-safe for any int64 id (exact-math mod 2³²
  * via masking; pre-reduced multiplicands), so the formula above holds
  * verbatim at any row count.
  */
class SyntheticEventsSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-events"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticEvents.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    // DSv2 reader options are conventionally case-insensitive; a raw
    // Map lookup would silently ignore .option("ROWS", …)
    val opts = new CaseInsensitiveStringMap(properties)
    val rows = opts.getLong("rows", 100000L)
    val splits = opts.getInt("splits", 8)
    require(rows >= 0, s"graft-events: rows must be >= 0, got $rows")
    // a non-positive split count would silently plan ZERO partitions
    // (empty table, no error) — fail loudly at table resolution instead
    require(splits >= 1, s"graft-events: splits must be >= 1, got $splits")
    new SyntheticEventsTable(rows, splits)
  }
}

class SyntheticEventsTable(rows: Long, splits: Int)
    extends Table with SupportsRead {
  override def name(): String = s"synthetic_events($rows)"
  override def schema(): StructType = SyntheticEvents.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SyntheticEventsScanBuilder(rows, splits)
}

/** Absorbs id-range filters into [lo, hi] (fully handled — nothing is
  * re-evaluated post-scan) and records the pruned schema. Non-id
  * filters are returned to Spark unhandled.
  */
class SyntheticEventsScanBuilder(rows: Long, splits: Int)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var lo = 1L
  private var hi = rows
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = SyntheticEvents.Schema

  private def asLong(v: Any): Long = v.asInstanceOf[Number].longValue()

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case GreaterThan("id", _) | GreaterThanOrEqual("id", _) |
           LessThan("id", _) | LessThanOrEqual("id", _) |
           EqualTo("id", _) | IsNotNull("id") => true
      case _ => false
    }
    accepted.foreach {
      case GreaterThan("id", v)        => lo = math.max(lo, asLong(v) + 1)
      case GreaterThanOrEqual("id", v) => lo = math.max(lo, asLong(v))
      case LessThan("id", v)           => hi = math.min(hi, asLong(v) - 1)
      case LessThanOrEqual("id", v)    => hi = math.min(hi, asLong(v))
      case EqualTo("id", v) =>
        lo = math.max(lo, asLong(v)); hi = math.min(hi, asLong(v))
      case _ => // IsNotNull: id is never null — trivially satisfied
    }
    pushed = accepted
    rejected
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new SyntheticEventsScan(lo, hi, splits, required)
}

class SyntheticEventsScan(lo: Long, hi: Long, splits: Int,
    required: StructType) extends Scan with Batch
    with SupportsReportStatistics {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"SyntheticEvents[lo=$lo,hi=$hi,cols=${required.fieldNames.mkString(",")}]"

  /** Contiguous id-range splits — the moral equivalent of parquet
    * row-group splits. Empty ranges plan zero partitions.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(0L, hi - lo + 1)
    if (n == 0) Array.empty
    else (0 until splits).flatMap { s =>
      val a = lo + n * s / splits
      val b = lo + n * (s + 1) / splits - 1
      if (b >= a) Some(SyntheticEventsRange(a, b): InputPartition) else None
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SyntheticEventsReaderFactory(required)

  override def estimateStatistics(): Statistics = new Statistics {
    private val n = math.max(0L, hi - lo + 1)
    override def sizeInBytes(): OptionalLong = OptionalLong.of(n * 40L)
    override def numRows(): OptionalLong = OptionalLong.of(n)
  }
}

case class SyntheticEventsRange(lo: Long, hi: Long) extends InputPartition

class SyntheticEventsReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new SyntheticEventsReader(p.asInstanceOf[SyntheticEventsRange], required)
}

class SyntheticEventsReader(range: SyntheticEventsRange,
    required: StructType) extends PartitionReader[InternalRow] {
  private var id = range.lo - 1
  // resolve the projection ONCE per partition, not per row
  private val gens: Array[Long => Any] =
    required.fieldNames.map(SyntheticEvents.generators)

  override def next(): Boolean = { id += 1; id <= range.hi }
  override def get(): InternalRow = {
    // hot loop: one values array per row, no collection wrappers
    val values = new Array[Any](gens.length)
    var i = 0
    while (i < gens.length) { values(i) = gens(i)(id); i += 1 }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(values)
  }
  override def close(): Unit = ()
}

object SyntheticEvents {
  val Schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value_cents", LongType, nullable = false),
    StructField("ts_s", LongType, nullable = false)))

  private val EventTypes: Array[UTF8String] =
    Array("view", "click", "purchase", "signup", "error")
      .map(UTF8String.fromString)

  /** (id · 2654435761) mod 2³² in EXACT mathematical terms: int64
    * multiplication wraps mod 2⁶⁴, and 2⁶⁴ ≡ 0 (mod 2³²), so masking
    * the wrapped product gives the true remainder for EVERY id — where
    * `% 4294967296L` would go NEGATIVE once id·2654435761 overflows
    * int64 (id ≥ ~3.5e9, well inside the 100 TB row range this
    * connector advertises), crashing the event_type array index.
    */
  private def mix(id: Long): Long = (id * 2654435761L) & 0xFFFFFFFFL

  val generators: Map[String, Long => Any] = Map(
    "id" -> (id => id),
    "user_id" -> (id => mix(id) % 997L),
    "event_type" -> (id => EventTypes((mix(id) % 5L).toInt)),
    // reduce id mod 2³² BEFORE the multiply: the max product is then
    // (2³²−1)·1103515245 ≈ 4.7e18 < 2⁶³, so the arithmetic never wraps
    // (a raw id·1103515245 overflows at id ≈ 8.4e9 and Java % would go
    // negative); unchanged for every id < 2³²
    "value_cents" -> (id => ((id & 0xFFFFFFFFL) * 1103515245L + 12345L) % 100000L),
    "ts_s" -> (id => 1704067200L + id % 2592000L))

  /** The registered query: read through the connector with an id-range
    * predicate (absorbed by pushdown — only 50k of 100k rows are ever
    * generated) and aggregate per event type. The oracle regenerates
    * the same rows from the same formula over the same range.
    */
  def customSourceAgg(spark: SparkSession, dir: String): DataFrame = {
    spark.read.format("graft-events")
      .option("rows", "100000").option("splits", "8").load()
      .filter(col("id") >= 25000 && col("id") < 75000)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value_cents")).as("total_cents"),
        countDistinct(col("user_id")).as("n_users"),
        min(col("id")).as("min_id"), max(col("id")).as("max_id"))
      .orderBy(col("event_type"))
  }

  private val CustomSourceOracle: String =
    """WITH src AS (
      |  SELECT i AS id,
      |    (i * 2654435761) % 4294967296 AS mix,
      |    (i * 1103515245 + 12345) % 100000 AS value_cents
      |  FROM generate_series(25000, 74999) AS g(i)),
      |ev AS (
      |  SELECT id, mix % 997 AS user_id,
      |    CASE mix % 5 WHEN 0 THEN 'view' WHEN 1 THEN 'click'
      |      WHEN 2 THEN 'purchase' WHEN 3 THEN 'signup'
      |      ELSE 'error' END AS event_type,
      |    value_cents FROM src)
      |SELECT event_type, count(*) AS n,
      |  cast(sum(value_cents) AS BIGINT) AS total_cents,
      |  count(DISTINCT user_id) AS n_users,
      |  min(id) AS min_id, max(id) AS max_id
      |FROM ev GROUP BY event_type ORDER BY event_type""".stripMargin

  val registry: Seq[QueryDef] = Seq(
    QueryDef("q83_custom_source", customSourceAgg _, CustomSourceOracle))
}
