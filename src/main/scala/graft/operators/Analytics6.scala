package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.{QueryDef, Tables}

/** Sixth analytics batch — privacy auditing, spatial blocking, and
  * incremental-maintenance patterns a production training-data platform
  * needs around the core pipeline:
  *
  *   - q112_k_anonymity: k-anonymity risk audit over a generalization
  *     ladder in ONE rollup pass (privacy gate before a corpus ships).
  *   - q113_geo_cell_join: radius self-join via spatial cell blocking —
  *     the same candidate-generation discipline as the LSH dedup family,
  *     applied to 2-D coordinates in exact integer micro-units.
  *   - q114_view_maintenance: incremental materialized-view merge —
  *     partial aggregates of a base snapshot combined with a delta batch,
  *     oracle-checked against the full recompute.
  *   - q115_seasonality: day-of-week seasonal profile per event type in
  *     exact basis points (drift/seasonality monitor for event streams).
  *   - q116_point_in_time: bitemporal (valid-time × transaction-time)
  *     snapshot reconstruction — "as known at tx horizon T, effective
  *     at valid time V".
  *   - q117_dp_contribution: differential-privacy prep — per-user
  *     contribution bounding + value clamping, yielding an aggregate
  *     with exactly known sensitivity.
  *
  * House float discipline throughout (NOTES.md oracle rules): every
  * derived metric is exact integer arithmetic — no doubles ever reach
  * the hash comparison.
  */
object Analytics6 {

  /** Risk threshold for [[kAnonymity]]: a quasi-identifier group with
    * fewer than K members re-identifies its rows.
    */
  private val K = 5

  /** k-anonymity audit over the generalization ladder
    * (segment, nation, balance-band) → (segment, nation) → (segment) →
    * (), computed in ONE `rollup` pass: every ladder level is a rollup
    * grouping set, so the audit costs a single shuffle regardless of
    * ladder depth. Per level we report the group count, the number of
    * risky (< K members) groups, and how many rows sit in them. The
    * balance band is `floor(acctbal/1000)` — floor-of-double semantics
    * are identical across engines (the `div`-on-negatives trap in
    * NOTES.md does not apply to floor). Levels are numbered by how many
    * quasi-identifiers have been generalized away (0 = finest), derived
    * from per-column `grouping()` flags rather than `grouping_id` so the
    * bit-order convention of either engine never matters.
    */
  def kAnonymity(spark: SparkSession, dir: String): DataFrame = {
    val qi = Tables.customer(spark, dir)
      .select(col("c_mktsegment").as("seg"), col("c_nationkey").as("nation"),
        floor(col("c_acctbal") / 1000.0).cast("long").as("band"))
    val levelExpr =
      when(grouping(col("band")) === 0, 0)
        .when(grouping(col("nation")) === 0, 1)
        .when(grouping(col("seg")) === 0, 2)
        .otherwise(3)
    qi.rollup(col("seg"), col("nation"), col("band"))
      .agg(levelExpr.as("level"), count(lit(1)).as("cnt"))
      .groupBy(col("level"))
      .agg(count(lit(1)).as("n_groups"),
        sum(when(col("cnt") < K, 1).otherwise(0)).as("n_risky_groups"),
        sum(when(col("cnt") < K, col("cnt")).otherwise(0)).as("risky_rows"))
      .orderBy(col("level"))
  }

  private val KAnonymityOracle: String =
    s"""WITH g AS (
      |  SELECT CASE WHEN GROUPING(band) = 0 THEN 0
      |              WHEN GROUPING(nation) = 0 THEN 1
      |              WHEN GROUPING(seg) = 0 THEN 2
      |              ELSE 3 END AS level,
      |         count(*) AS cnt
      |  FROM (SELECT c_mktsegment AS seg, c_nationkey AS nation,
      |          cast(floor(c_acctbal / 1000.0) AS BIGINT) AS band
      |        FROM customer)
      |  GROUP BY ROLLUP (seg, nation, band))
      |SELECT level, count(*) AS n_groups,
      |  cast(sum(CASE WHEN cnt < $K THEN 1 ELSE 0 END) AS BIGINT) AS n_risky_groups,
      |  cast(sum(CASE WHEN cnt < $K THEN cnt ELSE 0 END) AS BIGINT) AS risky_rows
      |FROM g GROUP BY level ORDER BY level""".stripMargin

  /** Coordinate-space parameters for [[geoCellJoin]]: points live on a
    * 40000×40000 integer grid, cells are 1000 units, the radius is 800 —
    * radius < cell size is what makes the 3×3 neighborhood exhaustive.
    */
  private[graft] val GridSide = 40000
  private[graft] val CellSize = 1000
  private[graft] val Radius2  = 800L * 800L

  /** Scalar twin of [[geoCellJoin]]'s coordinate derivation, exposed so
    * the brute-force spec references THE operator's formula instead of
    * re-hardcoding the constants (a constant change must fail the spec
    * by producing different pairs, not by drifting silently).
    */
  private[graft] def geoCoords(k: Long): (Long, Long) =
    (k % 100003 * 48271 % GridSide, k % 99991 * 16807 % GridSide)

  /** Radius self-join via spatial cell blocking. Deterministic synthetic
    * coordinates derive from the customer key with modulus-first integer
    * arithmetic (the key is reduced BEFORE the multiply so the product
    * stays far from Int64 overflow at any key scale — the
    * embNegativeSample lesson). Scale path: each point explodes to its
    * 3×3 neighbor cells (constant 9× fanout) and the pair search becomes
    * an equi-join on cell id — Σ_cell |cell|² work instead of the O(N²)
    * all-pairs the oracle states declaratively. Since the radius (800)
    * is below the cell size (1000), any in-radius pair differs by ≤ 1
    * cell per axis, so the neighborhood join finds every pair exactly
    * once (the probe row of the smaller id meets the home cell of the
    * larger). Distances are exact integer squared distances; no trig,
    * no floats.
    */
  def geoCellJoin(spark: SparkSession, dir: String): DataFrame = {
    val pts = Tables.customer(spark, dir)
      .select(col("c_custkey").as("id"),
        (col("c_custkey") % 100003 * 48271 % GridSide).as("x"),
        (col("c_custkey") % 99991 * 16807 % GridSide).as("y"))
    val probes = pts
      .withColumn("dx", explode(array(lit(-1), lit(0), lit(1))))
      .withColumn("dy", explode(array(lit(-1), lit(0), lit(1))))
      .select(col("id").as("id_a"), col("x").as("xa"), col("y").as("ya"),
        (expr(s"x div $CellSize") + col("dx")).as("cx"),
        (expr(s"y div $CellSize") + col("dy")).as("cy"))
    val homes = pts.select(col("id").as("id_b"), col("x").as("xb"),
      col("y").as("yb"),
      expr(s"x div $CellSize").as("cx"),
      expr(s"y div $CellSize").as("cy"))
    val d2 = (col("xa") - col("xb")) * (col("xa") - col("xb")) +
      (col("ya") - col("yb")) * (col("ya") - col("yb"))
    probes.join(homes, Seq("cx", "cy"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist2", d2)
      .filter(col("dist2") <= Radius2)
      .select(col("id_a"), col("id_b"), col("dist2"))
      .orderBy(col("id_a"), col("id_b"))
  }

  private val GeoCellJoinOracle: String =
    s"""WITH pts AS (
      |  SELECT c_custkey AS id,
      |    c_custkey % 100003 * 48271 % $GridSide AS x,
      |    c_custkey % 99991 * 16807 % $GridSide AS y
      |  FROM customer)
      |SELECT a.id AS id_a, b.id AS id_b,
      |  (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist2
      |FROM pts a JOIN pts b ON a.id < b.id
      |WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= $Radius2
      |ORDER BY id_a, id_b""".stripMargin

  /** Snapshot boundary for [[viewMaintenance]]: orders strictly before
    * this instant form the "materialized" base, the rest are the delta.
    */
  private val MvCutoff = "1997-01-01 00:00:00"

  /** Incremental materialized-view maintenance: the per-priority revenue
    * rollup is kept as MERGEABLE partial state (sum of exact cents +
    * row count — every derived metric, like the average, is computed
    * AFTER the merge, never stored). Refresh cost is
    * O(|delta| + |groups|): aggregate the delta batch, union with the
    * stored partials, re-reduce. The oracle recomputes the view from
    * scratch — the hash match IS the proof that the merge path equals
    * the full recompute (associativity of the partial state). Both
    * engines derive `avg_cents` by integer division on the merged sums
    * (all-positive, so trunc-vs-floor division cannot diverge).
    */
  def viewMaintenance(spark: SparkSession, dir: String): DataFrame = {
    val cents = col("o_totalprice").cast(DecimalType(12, 2)).*(100)
      .cast("long").as("cents")
    val o = Tables.orders(spark, dir)
      .select(col("o_orderpriority").as("priority"), col("o_orderdate"), cents)
    val cutoff = lit(java.sql.Timestamp.valueOf(MvCutoff))
    def partial(df: DataFrame): DataFrame =
      df.groupBy(col("priority"))
        .agg(sum(col("cents")).as("s"), count(lit(1)).as("c"))
    val base  = partial(o.filter(col("o_orderdate") < cutoff))
    val delta = partial(o.filter(col("o_orderdate") >= cutoff))
    base.unionByName(delta)
      .groupBy(col("priority"))
      .agg(sum(col("s")).as("revenue_cents"), sum(col("c")).as("order_cnt"))
      .select(col("priority"), col("order_cnt"), col("revenue_cents"),
        expr("revenue_cents div order_cnt").as("avg_cents"))
      .orderBy(col("priority"))
  }

  private val ViewMaintenanceOracle: String =
    s"""SELECT o_orderpriority AS priority, count(*) AS order_cnt,
      |  cast(sum(cast(cast(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS revenue_cents,
      |  cast(sum(cast(cast(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT)
      |    // count(*) AS avg_cents
      |FROM orders
      |GROUP BY priority ORDER BY priority""".stripMargin

  /** Day-of-week seasonal profile per event type, in exact basis points:
    * `idx_bps = (cnt · 7 · 10000) div total` — 10000 means the day
    * carries exactly its uniform share. The weekday number is computed
    * arithmetically (days since Monday 1970-01-05, mod 7; all dates are
    * post-epoch so no negative-modulus hazard) instead of either
    * engine's `dayofweek`, whose origin conventions differ. Shape: one
    * shuffle to the (type, dow) aggregate; the per-type total is a
    * window over that 35-row frame, not a second pass over the data.
    */
  def seasonality(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.events(spark, dir)
      .select(col("event_type"),
        (datediff(to_date(col("ts")), lit("1970-01-05")) % 7).as("dow"))
    val c = d.groupBy(col("event_type"), col("dow"))
      .agg(count(lit(1)).as("cnt"))
    c.withColumn("total_cnt",
        sum(col("cnt")).over(Window.partitionBy(col("event_type"))))
      .withColumn("idx_bps", expr("(cnt * 70000) div total_cnt"))
      .select(col("event_type"), col("dow"), col("cnt"), col("idx_bps"))
      .orderBy(col("event_type"), col("dow"))
  }

  private val SeasonalityOracle: String =
    """WITH c AS (
      |  SELECT event_type,
      |    cast((CAST(ts AS DATE) - DATE '1970-01-05') % 7 AS INTEGER) AS dow,
      |    count(*) AS cnt
      |  FROM events GROUP BY event_type, dow)
      |SELECT event_type, dow, cnt,
      |  cast((cnt * 70000) // sum(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS idx_bps
      |FROM c ORDER BY event_type, dow""".stripMargin

  /** Valid-time horizon for [[pointInTime]] — the "effective as of"
    * instant of the reconstruction.
    */
  private val VtHorizon = "2024-01-20 00:00:00"

  /** Bitemporal point-in-time reconstruction: "as the system KNEW it at
    * transaction horizon T, what was each user's latest state EFFECTIVE
    * at valid-time V?" Transaction time is the ingestion order
    * (event_id); the tx horizon is the first ¾ of ingested events,
    * derived with a one-row broadcast scalar attach (exact integer
    * `(max·3) div 4` — no driver collect, and the horizon scales with
    * the data instead of hard-coding an id). Within the known set, the
    * latest (ts, event_id) row per user at or before the valid-time
    * horizon wins — one window pass, rn = 1 lowers to WindowGroupLimit.
    * Timestamps are emitted as formatted strings (NOTES.md #6).
    */
  def pointInTime(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val txMax = ev.agg(max(col("event_id")).as("max_id"))
    val known = ev.crossJoin(broadcast(txMax))
      .filter(col("event_id") <= expr("(max_id * 3) div 4"))
      .filter(col("ts") <= lit(java.sql.Timestamp.valueOf(VtHorizon)))
      .select(col("user_id"), col("ts"), col("event_id"),
        col("value").cast(DecimalType(12, 2)).*(100).cast("long").as("cents"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    known.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id").as("version_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("eff_ts"),
        col("cents").as("value_cents"))
      .orderBy(col("user_id"))
  }

  private val PointInTimeOracle: String =
    s"""WITH mx AS (SELECT max(event_id) AS max_id FROM events),
      |known AS (
      |  SELECT e.user_id, e.ts, e.event_id,
      |    cast(cast(e.value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
      |  FROM events e, mx
      |  WHERE e.event_id <= (mx.max_id * 3) // 4
      |    AND e.ts <= TIMESTAMP '$VtHorizon'),
      |r AS (
      |  SELECT user_id, ts, event_id, cents,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM known)
      |SELECT user_id, event_id AS version_id,
      |  strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS eff_ts,
      |  cents AS value_cents
      |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin

  /** Per-user contribution cap and value clamp for [[dpContribution]]:
    * at most [[DpMaxRows]] events per user, each clamped into
    * [0, [[DpClampCents]]] cents.
    */
  private val DpMaxRows    = 3
  private val DpClampCents = 5000L

  /** Differential-privacy PREP — the data-side mechanics of a
    * user-level DP aggregation: bound each user's contribution to at
    * most [[DpMaxRows]] rows (earliest by ingestion order — a
    * deterministic, auditable rule) and clamp each value into
    * [0, [[DpClampCents]]], so the sensitivity of the per-type sum is
    * exactly DpMaxRows · DpClampCents per user. Noise injection itself
    * is a deployment-side step (it is nondeterministic by definition
    * and has no place in a hash-verified result); what the engine owns
    * is the bounded-sensitivity aggregate, in exact cents. One window
    * pass + one shuffle to the type aggregate.
    */
  def dpContribution(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"), col("ts"), col("event_id"),
        least(greatest(col("value").cast(DecimalType(12, 2)).*(100)
          .cast("long"), lit(0L)), lit(DpClampCents)).as("clamped"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= DpMaxRows)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_rows"),
        sum(col("clamped")).as("bounded_sum"))
      .orderBy(col("event_type"))
  }

  private val DpContributionOracle: String =
    s"""WITH capped AS (
      |  SELECT event_type, user_id,
      |    least(greatest(cast(cast(value AS DECIMAL(12,2)) * 100 AS BIGINT), 0),
      |      $DpClampCents) AS clamped,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM events)
      |SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_rows,
      |  cast(sum(clamped) AS BIGINT) AS bounded_sum
      |FROM capped WHERE rn <= $DpMaxRows
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  val registry: Seq[QueryDef] = Seq(
    QueryDef("q112_k_anonymity", kAnonymity _, KAnonymityOracle),
    QueryDef("q113_geo_cell_join", geoCellJoin _, GeoCellJoinOracle),
    QueryDef("q114_view_maintenance", viewMaintenance _, ViewMaintenanceOracle),
    QueryDef("q115_seasonality", seasonality _, SeasonalityOracle),
    QueryDef("q116_point_in_time", pointInTime _, PointInTimeOracle),
    QueryDef("q117_dp_contribution", dpContribution _, DpContributionOracle)
  )
}
