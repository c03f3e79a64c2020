package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Data-quality, change-data-capture, and graph operators — the
  * engine-side tooling a production data platform runs beside its
  * analytics (the reference has none of this; SURVEY.md §2b mandates the
  * superset). Everything here is exact-integer/string arithmetic, so
  * every query is oracle-verified.
  */
object Quality {

  /** Columns profiled by [[dqProfile]]: name → needs-timestamp-format.
    * Shared with the oracle construction below so the two lists can
    * never drift.
    */
  private val ProfileCols: Seq[(String, Boolean)] = Seq(
    "l_partkey" -> false, "l_quantity" -> false, "l_returnflag" -> false,
    "l_linestatus" -> false, "l_shipdate" -> true)

  /** Per-column table profile (row count, nulls, exact distinct, min,
    * max as strings) over `lineitem` — the schema-discovery primitive a
    * data platform runs before anything else (Deequ/Great-Expectations
    * shape).
    *
    * r15 restructure (guide §2.3 — shuffle fewer bytes, aggregate
    * before the exchange): the original single multi-distinct aggregate
    * planned as Expand ×(cols+1) → Sort → SortAggregate — every input
    * row multiplied six ways and SORTED before the shuffle, 7.6 s warm
    * at sf0.1, the suite's most expensive batch lane. It now runs as
    * two independent branches of one output query, the exact shape its
    * approx twin [[dqProfileApprox]] already proved out at 1.9 s:
    *   - count/min/max: ONE plain hash-aggregate scan, no Expand;
    *   - exact distincts: posexplode to (column-index, value-string)
    *     pairs — injective casts, so per-column string distincts equal
    *     raw distincts — then partial `distinct` collapses duplicates
    *     map-side BEFORE the only shuffle, and a count per index gives
    *     the distinct count. The shuffled key is (int, string), never
    *     the 11-column Expand row.
    * Same output, same oracle (hash-verified); at 100 TB the map-side
    * duplicate collapse is the difference between shuffling ~|distinct|
    * rows and sorting 6× the corpus. The production flip for truly
    * high-cardinality columns remains `approx_count_distinct` (q74b).
    */
  def dqProfile(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    def asStr(c: Column, isTs: Boolean): Column =
      if (isTs) date_format(c, "yyyy-MM-dd HH:mm:ss") else c.cast("string")
    val aggs = ProfileCols.flatMap { case (c, isTs) =>
      Seq(count(col(c)).as(s"nn_$c"),
        asStr(min(col(c)), isTs).as(s"mn_$c"),
        asStr(max(col(c)), isTs).as(s"mx_$c"))
    }
    val row = li.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val nameArr = typedLit(ProfileCols.map(_._1))
    val exact = li.select(posexplode(array(ProfileCols.map { case (c, _) =>
        col(c).cast("string")
      }: _*)).as(Seq("i", "v")))
      .where(col("v").isNotNull)
      .distinct()
      .groupBy(col("i")).agg(count(lit(1)).as("n_distinct"))
      .select(element_at(nameArr, col("i") + 1).as("column_name"),
        col("n_distinct"))
    val stackExpr = s"stack(${ProfileCols.length}, " + ProfileCols.map {
      case (c, _) => s"'$c', nn_$c, mn_$c, mx_$c"
    }.mkString(", ") + ") AS (column_name, n_nonnull, min_value, max_value)"
    // Left join: a column whose values are ALL null has no row in
    // `exact` (the isNotNull filter drops everything) but must still
    // report n_distinct = 0, matching the countDistinct form and the
    // DuckDB oracle. An inner join would silently drop its profile row.
    row.select(col("n_rows"), expr(stackExpr))
      .join(broadcast(exact), Seq("column_name"), "left")
      .select(col("column_name"), col("n_rows"),
        (col("n_rows") - col("n_nonnull")).as("n_nulls"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        col("min_value"), col("max_value"))
      .orderBy(col("column_name"))
  }

  private val DqProfileOracle: String = ProfileCols.map { case (c, isTs) =>
    val mn = if (isTs) s"strftime(min($c), '%Y-%m-%d %H:%M:%S')"
             else s"cast(min($c) AS VARCHAR)"
    val mx = if (isTs) s"strftime(max($c), '%Y-%m-%d %H:%M:%S')"
             else s"cast(max($c) AS VARCHAR)"
    s"""SELECT '$c' AS column_name, count(*) AS n_rows,
       |  count(*) - count($c) AS n_nulls,
       |  count(DISTINCT $c) AS n_distinct,
       |  $mn AS min_value, $mx AS max_value FROM lineitem""".stripMargin
  }.mkString("", "\nUNION ALL\n", "\nORDER BY column_name")

  /** Approximate twin of [[dqProfile]] — the registered 100 TB shape.
    * The exact profile's cost is the multi-distinct Expand: five
    * `count(distinct)` in one aggregate multiply every row ×5 before
    * the shuffle, the suite's most expensive lane. This twin replaces
    * them with one HLL sketch per column (`approx_count_distinct`,
    * rsd 0.01) so the production scan is a SINGLE pass with NO row
    * expansion — partial sketches merge map-side, the shuffle ships
    * five ~24 KB HLL buffers total, and the shape is flat in corpus
    * size. Oracle discipline (the q32/q37 exact-bracket idiom): the
    * output carries the exact distinct count plus a boolean pinning
    * the sketch within 5 % of it — deterministic for fixed data, so
    * DuckDB replays the boolean as a literal TRUE and a sketch
    * regression breaks the hash loudly. The exact side is
    * VERIFICATION cost, not the production shape, and deliberately
    * avoids the Expand: explode to (column, value-string) pairs —
    * injective casts, so per-column string distincts equal raw
    * distincts — then a two-level aggregate whose first level
    * collapses duplicates map-side before anything shuffles.
    */
  /** Per-column HLL precision for [[dqProfileApprox]]. Spark's HLL++
    * has no sparse-exact small-range mode, so even a cardinality-50
    * column can read a few percent off at the default rsd 0.05
    * (measured: l_quantity 47 vs 50 = 6 %, outside the bracket); the
    * numeric/temporal/key columns therefore carry a tightened 0.02
    * sketch (measured max error 2.0 % at both test SFs — 2.5× inside
    * the bracket), while the enum-ish flag columns (cardinality 2–3,
    * estimated exactly at every rsd) keep the default. Register cost
    * scales as 1/rsd²; the tightened sketches are the measured
    * cost/precision knee (0.01 is 3× slower for precision the bracket
    * doesn't need).
    */
  private val ApproxRsd: Map[String, Double] = Map(
    "l_returnflag" -> 0.05, "l_linestatus" -> 0.05).withDefaultValue(0.02)

  def dqProfileApprox(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    def asStr(c: Column, isTs: Boolean): Column =
      if (isTs) date_format(c, "yyyy-MM-dd HH:mm:ss") else c.cast("string")
    // production scan: ONE pass, no Expand
    val aggs = ProfileCols.flatMap { case (c, isTs) =>
      Seq(count(col(c)).as(s"nn_$c"),
        approx_count_distinct(col(c), ApproxRsd(c)).as(s"ad_$c"),
        asStr(min(col(c)), isTs).as(s"mn_$c"),
        asStr(max(col(c)), isTs).as(s"mx_$c"))
    }
    val row = li.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val stackExpr = s"stack(${ProfileCols.length}, " + ProfileCols.map {
      case (c, _) => s"'$c', nn_$c, ad_$c, mn_$c, mx_$c"
    }.mkString(", ") +
      ") AS (column_name, n_nonnull, n_approx, min_value, max_value)"
    val approx = row.select(col("n_rows"), expr(stackExpr))
    // verification side: exact distincts, Expand-free. posexplode keeps
    // the shuffled key an int (the name string is re-attached to the
    // final 5 rows from a literal array), and the first-level distinct
    // collapses duplicate values map-side before anything moves.
    val nameArr = typedLit(ProfileCols.map(_._1))
    val exact = li.select(posexplode(array(ProfileCols.map { case (c, _) =>
        col(c).cast("string")
      }: _*)).as(Seq("i", "v")))
      .where(col("v").isNotNull)
      .distinct()
      .groupBy(col("i")).agg(count(lit(1)).as("n_distinct"))
      .select(element_at(nameArr, col("i") + 1).as("column_name"),
        col("n_distinct"))
    approx.join(broadcast(exact), Seq("column_name"))
      .select(col("column_name"), col("n_rows"),
        (col("n_rows") - col("n_nonnull")).as("n_nulls"),
        col("n_distinct"), col("min_value"), col("max_value"),
        (abs(col("n_approx") - col("n_distinct"))
          <= col("n_distinct") * 0.05).as("in_bracket"))
      .orderBy(col("column_name"))
  }

  private val DqProfileApproxOracle: String = ProfileCols.map { case (c, isTs) =>
    val mn = if (isTs) s"strftime(min($c), '%Y-%m-%d %H:%M:%S')"
             else s"cast(min($c) AS VARCHAR)"
    val mx = if (isTs) s"strftime(max($c), '%Y-%m-%d %H:%M:%S')"
             else s"cast(max($c) AS VARCHAR)"
    s"""SELECT '$c' AS column_name, count(*) AS n_rows,
       |  count(*) - count($c) AS n_nulls,
       |  count(DISTINCT $c) AS n_distinct,
       |  $mn AS min_value, $mx AS max_value,
       |  true AS in_bracket FROM lineitem""".stripMargin
  }.mkString("", "\nUNION ALL\n", "\nORDER BY column_name")

  /** Constraint-validation suite (check_name, n_violations, pass) —
    * uniqueness, referential integrity, and range checks with one row
    * per rule, the output a quality gate alerts on. Scan discipline:
    * all per-row rules on the same table FUSE into one conditional
    * aggregate (one scan for the four lineitem rules, one for the two
    * orders rules — not one scan per rule); the two FK rules are
    * anti-joins against broadcast key sets, so the fact tables are
    * never shuffled. At 100 TB the FK build sides outgrow broadcast and
    * become shuffle joins or bloom-filter probes — the pattern this
    * repo pins in ScaleBehaviorSpec — but the fused-scan rule count per
    * table stays the invariant that matters.
    */
  def dqChecks(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir)
    val cust = Tables.customer(spark, dir)

    def viol(c: Column): Column = sum(when(c, 1L).otherwise(0L))
    // one scan, four rules
    val liAgg = li.agg(
      viol(!(col("l_quantity") >= 1 && col("l_quantity") <= 50))
        .as("v_lineitem_qty_range"),
      viol(col("l_extendedprice") <= 0).as("v_lineitem_price_positive"),
      viol(col("l_shipdate").isNull).as("v_lineitem_shipdate_complete"),
      (count(lit(1)) - countDistinct(col("l_orderkey"), col("l_linenumber")))
        .as("v_lineitem_pk_unique"))
    // one scan, two rules
    val ordAgg = ord.agg(
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("v_orders_pk_unique"),
      viol(col("o_totalprice") <= 0).as("v_orders_price_positive"))
    val ordersFk = ord.join(
        cust.select(col("c_custkey").as("o_custkey")), Seq("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("v_orders_custkey_fk"))
    val lineitemFk = li.join(
        ord.select(col("o_orderkey").as("l_orderkey")), Seq("l_orderkey"), "left_anti")
      .agg(count(lit(1)).as("v_lineitem_orderkey_fk"))

    def unpivot(df: DataFrame): DataFrame = {
      val cols = df.columns
      val stackExpr = s"stack(${cols.length}, " + cols.map { c =>
        s"'${c.stripPrefix("v_")}', $c"
      }.mkString(", ") + ") AS (check_name, n_violations)"
      df.select(expr(stackExpr))
    }
    unpivot(liAgg).union(unpivot(ordAgg))
      .union(unpivot(ordersFk)).union(unpivot(lineitemFk))
      .withColumn("pass", col("n_violations") === 0L)
      .orderBy(col("check_name"))
  }

  private val DqChecksOracle: String =
    """WITH checks AS (
      |  SELECT 'lineitem_qty_range' AS check_name,
      |    sum(CASE WHEN NOT (l_quantity >= 1 AND l_quantity <= 50)
      |      THEN 1 ELSE 0 END) AS n_violations FROM lineitem
      |  UNION ALL SELECT 'lineitem_price_positive',
      |    sum(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) FROM lineitem
      |  UNION ALL SELECT 'lineitem_shipdate_complete',
      |    sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) FROM lineitem
      |  UNION ALL SELECT 'lineitem_pk_unique',
      |    count(*) - count(DISTINCT (l_orderkey, l_linenumber)) FROM lineitem
      |  UNION ALL SELECT 'orders_pk_unique',
      |    count(*) - count(DISTINCT o_orderkey) FROM orders
      |  UNION ALL SELECT 'orders_price_positive',
      |    sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) FROM orders
      |  UNION ALL SELECT 'orders_custkey_fk',
      |    (SELECT count(*) FROM orders o WHERE NOT EXISTS
      |      (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
      |  UNION ALL SELECT 'lineitem_orderkey_fk',
      |    (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
      |      (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)))
      |SELECT check_name, cast(n_violations AS BIGINT) AS n_violations,
      |  n_violations = 0 AS pass
      |FROM checks ORDER BY check_name""".stripMargin

  /** Event-time snapshot cutoffs for [[stateDiff]] (events span
    * 2024-01-01..2024-01-30; see FIXTURES.md).
    */
  private val T1 = "2024-01-10 00:00:00"
  private val T2 = "2024-01-20 00:00:00"

  /** Change-data-capture between two event-time snapshots: each user's
    * STATE is their latest event_type as of the cutoff (deterministic
    * tie-break on event_id); the diff full-outer-joins the two
    * snapshots and labels every user added / changed / unchanged —
    * the row-level CDC feed a downstream consumer ingests. ("removed"
    * cannot occur: the event log is append-only, so any user in the T1
    * snapshot is in the T2 snapshot.) Each snapshot is one window pass
    * partitioned by user (one hash shuffle over the filtered slice);
    * the diff join keys on user_id, which both sides are already
    * keyed by. At scale, snapshots are incrementally maintained state
    * tables (the SCD-2 surface, q70) and this same diff runs over two
    * SMALL state tables, not two raw-log scans.
    */
  def stateDiff(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    def stateAt(cutoff: String): DataFrame = {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      ev.filter(col("ts") <= lit(cutoff).cast("timestamp"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type").as("state"))
    }
    val old = stateAt(T1).withColumnRenamed("state", "old_state")
    val neu = stateAt(T2).withColumnRenamed("state", "new_state")
    old.join(neu, Seq("user_id"), "full_outer")
      .select(col("user_id"), col("old_state"), col("new_state"),
        when(col("old_state").isNull, "added")
          .when(col("old_state") =!= col("new_state"), "changed")
          .otherwise("unchanged").as("change_type"))
      .orderBy(col("user_id"))
  }

  private val StateDiffOracle: String =
    s"""WITH s1 AS (
       |  SELECT user_id, event_type AS old_state FROM (
       |    SELECT user_id, event_type, row_number() OVER (
       |      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
       |    FROM events WHERE ts <= TIMESTAMP '$T1') WHERE rn = 1),
       |s2 AS (
       |  SELECT user_id, event_type AS new_state FROM (
       |    SELECT user_id, event_type, row_number() OVER (
       |      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
       |    FROM events WHERE ts <= TIMESTAMP '$T2') WHERE rn = 1)
       |SELECT coalesce(s1.user_id, s2.user_id) AS user_id,
       |  s1.old_state, s2.new_state,
       |  CASE WHEN s1.old_state IS NULL THEN 'added'
       |       WHEN s1.old_state <> s2.new_state THEN 'changed'
       |       ELSE 'unchanged' END AS change_type
       |FROM s1 FULL OUTER JOIN s2 ON s1.user_id = s2.user_id
       |ORDER BY user_id""".stripMargin

  /** Triangle counting on the co-purchase graph (parts are nodes; an
    * edge joins two parts appearing in the same order). Edges are
    * generated with the `u < v` orientation and deduplicated ONCE, so
    * each triangle is counted exactly once as an ordered triple
    * u < v < w.
    *
    * The counting algorithm is ADJACENCY INTERSECTION, not the naive
    * wedge join: per directed edge (u,v), the triangle count through it
    * is |N⁺(u) ∩ N⁺(v)|, so the plan is out-adjacency-list build (one
    * groupBy) → the edge table joined to the two (node, nbrs) sides →
    * `size(array_intersect(...))` summed, all inside one codegen stage.
    * The naive e1⋈e2⋈e3 form materializes every WEDGE — ~100M rows on
    * this graph at sf0.1 (measured; 20k nodes, 1.2M edges, near-uniform
    * degree ~120, where even degree-ordered orientation only sheds
    * 16%) and took 58 s; the intersection form moves only |V| adjacency
    * rows (~10 MB — broadcast, so the edge table is never reshuffled
    * after its build) and runs in ~3 s. At 100 TB drop the broadcast
    * hints (two ordinary hash joins on a key that was just grouped) —
    * work stays Σ(deg(u)+deg(v)) per edge with no quadratic
    * intermediate ever materialized.
    */
  def triangleCount(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    // NOT checkpointed: all uses live in ONE output query, so the
    // adjacency build computes once via exchange reuse — and, unlike a
    // checkpoint, it stays IN the executed plan, where the audit's
    // cart=0/bnlj=0 ban covers it.
    // r15 (guide §2.4 — remove shuffles outright): the edge build is a
    // GROUP-AND-PAIR, not a self-join (the lineitem⋈lineitem form paid
    // two exchanges + two SMJ sorts of the fact table; measured 2.2 s).
    // r16 (same section, one step further): the pair DISTINCT — a full
    // exchange of the ~1.2M generated pair rows — is gone too. The
    // pairs go straight into the adjacency groupBy, where collect_SET
    // deduplicates inside the aggregate (map-side partials first), so
    // the build is TWO exchanges total (order groupBy, adjacency
    // groupBy) and every downstream consumer derives from the
    // deduplicated adjacency: edges = explode(nbrs) (distinct by
    // construction), n_edges = Σ size(nbrs) (no count pass over a pair
    // table), n_nodes = distinct over p ∪ nbrs. sort_array pins the
    // neighbor order so the frame is deterministic under any
    // partitioning. Same outputs, oracle unchanged (hash-verified);
    // probe: edges-with-distinct 1.00 s vs adjacency-direct 1.3 s
    // INCLUDING the list build the old form paid separately.
    val adj = Analytics.orderPairs(li)
      .groupBy(col("u").as("p"))
      .agg(sort_array(collect_set(col("v"))).as("nbrs"))
    val edges = adj.select(col("p").as("u"), explode(col("nbrs")).as("v"))
    // r16 (guide §1.2 step 2 — per-task work): the per-edge intersection
    // is a two-pointer MERGE WALK over the sorted adjacency arrays
    // (codegen kernel, zero allocations per row) instead of
    // size(array_intersect(...)), which builds a hash set and
    // materializes the intersection array per edge — ~1.2M edges ×
    // ~120-element arrays made that the lane's hottest stage. Counts
    // are identical: both sides are sort_array(collect_set(...)) —
    // ascending, duplicate-free — the kernel's documented precondition.
    val tri = edges
      .join(broadcast(adj.select(col("p").as("u"), col("nbrs").as("nu"))), Seq("u"))
      .join(broadcast(adj.select(col("p").as("v"), col("nbrs").as("nv"))), Seq("v"))
      .select(graft.functions.SortedIntersectSize
        .sortedIntersectSize(col("nu"), col("nv")).as("c"))
    // the three scalar stats are unioned as (k, v) rows and folded into
    // one output row — a 3-row shuffle instead of scalar-attach
    // crossJoins (which would plan as BroadcastNestedLoopJoins and trip
    // the repo-wide no-BNLJ plan audit)
    def one(name: String, df: DataFrame): DataFrame =
      df.select(lit(name).as("k"), col(df.columns.head).cast("long").as("v"))
    val nodes = adj
      .select(explode(array_union(array(col("p")), col("nbrs"))).as("p"))
      .distinct().agg(count(lit(1)).as("n_nodes"))
    one("n_nodes", nodes)
      .union(one("n_edges",
        adj.agg(coalesce(sum(size(col("nbrs"))), lit(0L)).as("n_edges"))))
      .union(one("n_triangles",
        tri.agg(coalesce(sum(col("c")), lit(0L)).as("n_triangles"))))
      .groupBy()
      .agg(max(when(col("k") === "n_nodes", col("v"))).as("n_nodes"),
        max(when(col("k") === "n_edges", col("v"))).as("n_edges"),
        max(when(col("k") === "n_triangles", col("v"))).as("n_triangles"))
  }

  private val TriangleOracle: String =
    """WITH edges AS (
      |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      |  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
      |    AND a.l_partkey < b.l_partkey)
      |SELECT
      |  (SELECT count(DISTINCT p) FROM (
      |     SELECT u AS p FROM edges UNION ALL SELECT v FROM edges)) AS n_nodes,
      |  (SELECT count(*) FROM edges) AS n_edges,
      |  (SELECT count(*) FROM edges e1
      |     JOIN edges e2 ON e1.v = e2.u
      |     JOIN edges e3 ON e1.u = e3.u AND e2.v = e3.v) AS n_triangles""".stripMargin

  /** Benford first-digit audit — the classic fabricated-data detector a
    * DQ platform runs over monetary columns: observed first-significant-
    * digit shares of `o_totalprice` against Benford's log distribution,
    * with the per-digit χ² contribution. The first digit comes from the
    * INTEGER part formatted as a string (both engines format BIGINT
    * identically), never from floor(log10(x)) — a libm log10 landing a
    * hair under an exact power of ten would mis-bucket boundary values
    * differently per engine. One scan, one 9-row aggregate. (Synthetic
    * uniform-ish prices are NOT Benford-distributed — the query reports
    * the divergence; judging it is the caller's policy.)
    */
  def q103Benford(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy() // 9 post-aggregate rows
    val share = col("n").cast("double") / col("total").cast("double")
    val expected = log(lit(1.0) + lit(1.0) / col("digit").cast("double")) / log(lit(10.0))
    Tables.orders(spark, dir)
      // explicit floor: DuckDB CAST(double AS BIGINT) rounds, Spark's
      // truncates — floor() first makes both engines agree at x.5+
      .select(substring(floor(col("o_totalprice")).cast("string"), 1, 1)
        .cast("bigint").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      .withColumn("total", sum(col("n")).over(w))
      .select(col("digit"), col("n"),
        Tables.r4(share).as("share"),
        Tables.r4(expected).as("benford_exp"),
        Tables.r4((share - expected) * (share - expected) / expected).as("chi2"))
      .orderBy(col("digit"))
  }

  private val BenfordOracle: String =
    """WITH d AS (
      |  SELECT cast(substring(cast(cast(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
      |    AS BIGINT) AS digit
      |  FROM orders),
      |c AS (SELECT digit, cast(count(*) AS BIGINT) AS n FROM d GROUP BY digit),
      |t AS (SELECT cast(sum(n) AS BIGINT) AS total FROM c)
      |SELECT digit, n,
      |  floor(cast(n AS DOUBLE) / total * 10000 + 0.5) / 10000 AS share,
      |  floor(ln(1.0 + 1.0 / digit) / ln(10.0) * 10000 + 0.5) / 10000 AS benford_exp,
      |  floor((cast(n AS DOUBLE) / total - ln(1.0 + 1.0 / digit) / ln(10.0))
      |    * (cast(n AS DOUBLE) / total - ln(1.0 + 1.0 / digit) / ln(10.0))
      |    / (ln(1.0 + 1.0 / digit) / ln(10.0)) * 10000 + 0.5) / 10000 AS chi2
      |FROM c, t ORDER BY digit""".stripMargin

  val registry: Seq[QueryDef] = Seq(
    QueryDef("q74_dq_profile", dqProfile _, DqProfileOracle),
    QueryDef("q74b_dq_profile_approx", dqProfileApprox _, DqProfileApproxOracle),
    QueryDef("q75_dq_checks", dqChecks _, DqChecksOracle),
    QueryDef("q76_state_diff", stateDiff _, StateDiffOracle),
    QueryDef("q77_triangle_count", triangleCount _, TriangleOracle),
    QueryDef("q103_benford", q103Benford _, BenfordOracle)
  )
}
