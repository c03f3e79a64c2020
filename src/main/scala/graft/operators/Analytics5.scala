package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.{QueryDef, Tables}
import graft.functions.StringSimilarity

/** Fifth analytics batch: fuzzy entity resolution (Jaro–Winkler blocked
  * join), weighted shortest paths, oracle-verified connected components
  * over a thresholded graph, and exact-integer multi-touch attribution.
  * House float discipline throughout — Jaro–Winkler scores are
  * floor-scaled to basis points (NOTES.md #14), every other column is
  * exact integer/string arithmetic.
  */
object Analytics5 {

  /** Weighted co-purchase edge list shared by [[shortestPath]] and
    * [[components]]: parts are nodes; an edge joins parts appearing in
    * the same order, weighted by the number of DISTINCT orders sharing
    * the pair (`n`). Edge cost for SSSP maps co-purchase frequency to
    * an integer distance (frequent pair = cheap hop): n≥3 → 1, n=2 → 2,
    * else 4. One self-join + one groupBy; at scale this is the same
    * single-shuffle shape as [[Analytics.coPurchaseEdges]] with an
    * extra count. Deliberately LAZY (no checkpoint): at the 100× probe
    * volume this frame is ~120M rows and materializing it cost
    * 83–108 s per query invocation — while components' thresholded
    * graph kept just 200 of those rows. Each consumer instead caches
    * the (much smaller, partition-pinned) frame IT iterates on, inside
    * IterCache, so warm invocations skip this build entirely and the
    * full-volume intermediate is never stored anywhere.
    */
  private def weightedEdges(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    // r16 (guide §2.4): the shared group-and-pair substrate
    // ([[Analytics.orderPairs]]) replaces the fact self-join — no
    // self-join and no standalone distinct exchange: 4 exchange legs
    // (join×2, distinct, count) become 2 (basket agg, count).
    Analytics.orderPairs(li)
      .groupBy(col("u"), col("v")).agg(count(lit(1)).as("n"))
  }

  /** The SQL twin of [[weightedEdges]] (CTE `wed`), shared by both
    * graph oracles.
    */
  private val WeightedEdgesCte: String =
    """wed AS (
      |  SELECT u, v, count(*) AS n FROM (
      |    SELECT DISTINCT a.l_orderkey AS ok, a.l_partkey AS u, b.l_partkey AS v
      |    FROM lineitem a JOIN lineitem b
      |      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
      |  GROUP BY u, v)""".stripMargin

  /** Fuzzy entity resolution over part names with the custom
    * `jaro_winkler` codegen expression (functions/StringSimilarity):
    * names are first DEDUPLICATED (name → occurrence count), then
    * blocked by first word, and only intra-block distinct-name pairs
    * are scored — the blocking that turns an all-pairs O(N²) match
    * into Σ_b |b|² over bounded blocks, the same candidate-generation
    * discipline as the LSH dedup family. Scores are floor-scaled to
    * basis points; the threshold (≥ 0.8) is applied to the RAW double,
    * which is bit-identical across engines (see the expression's
    * scaladoc — arithmetic order pinned to DuckDB's).
    */
  def fuzzyJoin(spark: SparkSession, dir: String): DataFrame = {
    val names = Tables.part(spark, dir)
      .groupBy(col("p_name"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("blk", split(col("p_name"), " ").getItem(0))
    val a = names.select(col("blk"), col("p_name").as("name_a"), col("cnt").as("cnt_a"))
    val b = names.select(col("blk"), col("p_name").as("name_b"), col("cnt").as("cnt_b"))
    a.join(b, "blk")
      .filter(col("name_a") < col("name_b"))
      .withColumn("jw", StringSimilarity.jaroWinkler(col("name_a"), col("name_b")))
      .filter(col("jw") >= 0.8)
      .select(col("name_a"), col("name_b"),
        floor(col("jw") * 10000).cast("long").as("jw_bps"),
        col("cnt_a"), col("cnt_b"))
      .orderBy(col("name_a"), col("name_b"))
  }

  private val FuzzyJoinOracle: String =
    """WITH names AS (
      |  SELECT p_name, count(*) AS cnt, split_part(p_name, ' ', 1) AS blk
      |  FROM part GROUP BY p_name)
      |SELECT a.p_name AS name_a, b.p_name AS name_b,
      |  cast(floor(jaro_winkler_similarity(a.p_name, b.p_name) * 10000) AS BIGINT) AS jw_bps,
      |  a.cnt AS cnt_a, b.cnt AS cnt_b
      |FROM names a JOIN names b ON a.blk = b.blk AND a.p_name < b.p_name
      |WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= 0.8
      |ORDER BY name_a, name_b""".stripMargin

  /** Hop bound shared by the Spark relaxation loop and the oracle's
    * unrolled CTEs.
    */
  private val SsspHops = 3

  /** Single-source shortest paths (bounded to [[SsspHops]] hops) over
    * the weighted co-purchase graph — Bellman–Ford frontier relaxation:
    * each round is one hash join dist⋈edges + one min-aggregation,
    * `localCheckpoint`ed so lineage stays one round deep. The source is
    * the minimum node id, attached as a broadcast one-row scalar (no
    * driver collect). Distances are exact integers. The oracle unrolls
    * the identical three relaxation rounds as CTEs.
    */
  def shortestPath(spark: SparkSession, dir: String): DataFrame = {
    val wed = weightedEdges(spark, dir)
    val w = when(col("n") >= 3, 1).when(col("n") === 2, 2).otherwise(4)
    // partition+sort by the relaxation join key and CACHE — the
    // InMemoryTableScan keeps |E| out of every round's exchange and
    // sort (see Analytics.coPurchaseEdges for why cache, not
    // localCheckpoint, is the partitioning-preserving truncation)
    val ew = IterCache.getOrBuild(s"sssp-ew:$dir") {
      val np = spark.sessionState.conf.numShufflePartitions
      // both directions in ONE pass over the (now-lazy) wed: a
      // self-union would execute the aggregate branch twice
      wed.select(explode(array(
          struct(col("u"), col("v"), w.as("w")),
          struct(col("v").as("u"), col("u").as("v"), w.as("w")))).as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v"), col("e.w").as("w"))
        .repartition(np, col("u"))
        .sortWithinPartitions(col("u"))
        .persist()
    }
    // checkpoint the seed too: it derives from ew, and the relaxation
    // join would otherwise be an ambiguous self-join
    var dist = ew.agg(min(col("u")).as("node"))
      .withColumn("dist", lit(0))
      .localCheckpoint()
    for (_ <- 1 to SsspHops) {
      val step = dist.as("d").join(ew.as("e"), col("d.node") === col("e.u"))
        .select(col("e.v").as("node"), (col("d.dist") + col("e.w")).as("dist"))
      dist = dist.union(step)
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
        .localCheckpoint()
    }
    dist.orderBy(col("node"))
  }

  private val ShortestPathOracle: String =
    s"""WITH $WeightedEdgesCte,
      |ew AS (
      |  SELECT u, v, CASE WHEN n >= 3 THEN 1 WHEN n = 2 THEN 2 ELSE 4 END AS w FROM wed
      |  UNION ALL
      |  SELECT v, u, CASE WHEN n >= 3 THEN 1 WHEN n = 2 THEN 2 ELSE 4 END FROM wed),
      |d0 AS (SELECT min(u) AS node, 0 AS dist FROM ew),
      |d1 AS (SELECT node, min(dist) AS dist FROM (
      |  SELECT node, dist FROM d0 UNION ALL
      |  SELECT e.v, d.dist + e.w FROM d0 d JOIN ew e ON e.u = d.node) GROUP BY node),
      |d2 AS (SELECT node, min(dist) AS dist FROM (
      |  SELECT node, dist FROM d1 UNION ALL
      |  SELECT e.v, d.dist + e.w FROM d1 d JOIN ew e ON e.u = d.node) GROUP BY node),
      |d3 AS (SELECT node, min(dist) AS dist FROM (
      |  SELECT node, dist FROM d2 UNION ALL
      |  SELECT e.v, d.dist + e.w FROM d2 d JOIN ew e ON e.u = d.node) GROUP BY node)
      |SELECT node, dist FROM d3 ORDER BY node""".stripMargin

  /** Edge-count threshold for [[components]] — co-purchase pairs seen
    * in ≥ 3 distinct orders. At sf0.01 this keeps 63 edges over 119
    * nodes in 56 components (the interesting fragmented regime; ≥ 2
    * yields one giant component).
    */
  private val CompThreshold = 3

  /** Connected components over the thresholded co-purchase graph by
    * min-label propagation: every node's label converges to the
    * minimum node id in its component. Bounded synchronous rounds with
    * per-round `localCheckpoint` and an early exit when a round changes
    * no label (the same convergence idiom as `dedup_clusters`, but over
    * a SQL-expressible graph, so this one is fully oracle-verified —
    * the oracle computes the reachability closure with a recursive CTE
    * and takes min per source, which is O(Σ component²) and fine for an
    * oracle but NOT the scale path; label propagation is O(rounds·|E|)).
    */
  def components(spark: SparkSession, dir: String): DataFrame = {
    val wed = weightedEdges(spark, dir).filter(col("n") >= CompThreshold)
    // same partition-preserving CACHE discipline as shortestPath's ew:
    // the label-propagation join re-keys on u every round
    val e = IterCache.getOrBuild(s"components-e:$dir") {
      val np = spark.sessionState.conf.numShufflePartitions
      wed.select(explode(array(
          struct(col("u"), col("v")),
          struct(col("v").as("u"), col("u").as("v")))).as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v"))
        .repartition(np, col("u"))
        .sortWithinPartitions(col("u"))
        .persist()
    }
    var labels = e.select(col("u").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint()
    var converged = false
    var round = 0
    while (!converged && round < 12) {
      val prop = labels.join(e, labels("node") === e("u"))
        .select(e("v").as("node"), col("label"))
      val next = labels.union(prop)
        .groupBy(col("node")).agg(min(col("label")).as("label"))
        .localCheckpoint()
      // bounded driver state: one count — rows whose label still moves
      converged = next.as("n").join(labels.as("p"),
        col("n.node") === col("p.node") && col("n.label") =!= col("p.label"))
        .isEmpty
      labels = next
      round += 1
    }
    labels.select(col("node"), col("label").as("component"))
      .orderBy(col("node"))
  }

  private val ComponentsOracle: String =
    s"""WITH RECURSIVE $WeightedEdgesCte,
      |e AS (SELECT u, v FROM wed WHERE n >= $CompThreshold
      |      UNION ALL SELECT v, u FROM wed WHERE n >= $CompThreshold),
      |reach(src, node) AS (
      |  SELECT u, u FROM (SELECT DISTINCT u FROM e)
      |  UNION
      |  SELECT r.src, e.v FROM reach r JOIN e ON e.u = r.node)
      |SELECT src AS node, min(node) AS component
      |FROM reach GROUP BY src ORDER BY node""".stripMargin

  /** U-shaped (position-based) multi-touch attribution in EXACT integer
    * arithmetic: events between consecutive purchases form a journey
    * attributed to the closing purchase; the first and last touches get
    * 40 % each, middles split the remaining 20 % by integer division
    * with the remainder assigned to the LAST middle touch (the
    * deterministic auditable rule that keeps every journey summing to
    * exactly 10 000 bps). One-touch journeys take 100 %, two-touch
    * 50/50, touchless purchases land in the `direct` bucket. Credit is
    * reported in cents·bps (BIGINT — no division ever happens). Two
    * window passes share the (user) and (user, journey) partitioning;
    * the purchase⋈touch join is journey-keyed.
    */
  def multiTouch(spark: SparkSession, dir: String): DataFrame = {
    val wUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        col("value").cast(DecimalType(12, 2)).*(100).cast("long").as("cents"))
      .withColumn("jid",
        coalesce(sum(when(col("event_type") === "purchase", 1).otherwise(0))
          .over(wUser), lit(0)))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("jid"), col("cents"))
    val wJourney = Window.partitionBy(col("user_id"), col("jid"))
      .orderBy(col("ts"), col("event_id"))
    val touches = ev.filter(col("event_type") =!= "purchase")
      .withColumn("i", row_number().over(wJourney))
      .withColumn("nt", count(lit(1)).over(
        Window.partitionBy(col("user_id"), col("jid"))))
    val creditBps =
      when(col("nt") === 1, 10000)
        .when(col("nt") === 2, 5000)
        .when(col("i") === 1 || col("i") === col("nt"), 4000)
        .otherwise(expr("2000 div (nt - 2)") +
          when(col("i") === col("nt") - 1, expr("2000 % (nt - 2)")).otherwise(0))
    val touched = touches.as("t")
      .join(purchases.as("p"),
        col("t.user_id") === col("p.user_id") && col("t.jid") === col("p.jid"))
      .select(col("t.event_type").as("touch_type"),
        (col("p.cents") * creditBps).as("credit"))
      .groupBy(col("touch_type"))
      .agg(count(lit(1)).as("n_touches"),
        sum(col("credit")).as("credit_cents_bps"))
    val direct = purchases.as("p")
      .join(touches.as("t"),
        col("t.user_id") === col("p.user_id") && col("t.jid") === col("p.jid"),
        "left_anti")
      .agg(count(lit(1)).as("n_touches"),
        (sum(col("cents")) * 10000).as("credit_cents_bps"))
      .select(lit("direct").as("touch_type"), col("n_touches"),
        col("credit_cents_bps"))
    touched.unionByName(direct).orderBy(col("touch_type"))
  }

  private val MultiTouchOracle: String =
    """WITH ev AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    cast(cast(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
      |    coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS jid
      |  FROM events),
      |purchases AS (
      |  SELECT user_id, jid, cents FROM ev WHERE event_type = 'purchase'),
      |touches AS (
      |  SELECT user_id, jid, event_type,
      |    row_number() OVER (PARTITION BY user_id, jid ORDER BY ts, event_id) AS i,
      |    count(*) OVER (PARTITION BY user_id, jid) AS nt
      |  FROM ev WHERE event_type <> 'purchase'),
      |touched AS (
      |  SELECT t.event_type AS touch_type, count(*) AS n_touches,
      |    sum(p.cents * (CASE
      |      WHEN t.nt = 1 THEN 10000
      |      WHEN t.nt = 2 THEN 5000
      |      WHEN t.i = 1 OR t.i = t.nt THEN 4000
      |      ELSE 2000 // (t.nt - 2)
      |        + (CASE WHEN t.i = t.nt - 1 THEN 2000 % (t.nt - 2) ELSE 0 END)
      |      END)) AS credit_cents_bps
      |  FROM touches t JOIN purchases p
      |    ON t.user_id = p.user_id AND t.jid = p.jid
      |  GROUP BY t.event_type),
      |direct AS (
      |  SELECT 'direct' AS touch_type, count(*) AS n_touches,
      |    sum(cents) * 10000 AS credit_cents_bps
      |  FROM purchases p
      |  WHERE NOT EXISTS (SELECT 1 FROM touches t
      |    WHERE t.user_id = p.user_id AND t.jid = p.jid))
      |SELECT touch_type, n_touches, cast(credit_cents_bps AS BIGINT) AS credit_cents_bps
      |FROM (SELECT * FROM touched UNION ALL SELECT * FROM direct)
      |ORDER BY touch_type""".stripMargin

  /** End-to-end entity resolution — the composite the fuzzy join exists
    * for: distinct part names → blocked Jaro–Winkler candidate pairs
    * (≥ 0.8, the q107 stage) → connected components over the match
    * graph by min-label propagation (labels are the NAMES, ordered
    * lexicographically; singletons stay their own cluster) →
    * survivorship: each cluster reports its canonical (minimum) name,
    * member count, and total occurrence mass. The oracle replays the
    * whole pipeline: pair CTE, recursive-CTE reachability closure for
    * the components, and the same aggregation. Scale shape: blocking
    * bounds pair generation, propagation is O(rounds·|E|) with
    * per-round localCheckpoint; the closure is oracle-only.
    */
  def entityResolution(spark: SparkSession, dir: String): DataFrame = {
    val names = Tables.part(spark, dir)
      .groupBy(col("p_name")).agg(count(lit(1)).as("cnt"))
      .withColumn("blk", split(col("p_name"), " ").getItem(0))
      .localCheckpoint()
    val a = names.select(col("blk"), col("p_name").as("name_a"))
    val b = names.select(col("blk"), col("p_name").as("name_b"))
    val pairs = a.join(b, "blk")
      .filter(col("name_a") < col("name_b"))
      .filter(StringSimilarity.jaroWinkler(col("name_a"), col("name_b")) >= 0.8)
      .select(col("name_a"), col("name_b"))
    val e = pairs.union(pairs.select(col("name_b").as("name_a"),
        col("name_a").as("name_b")))
      .localCheckpoint()
    var labels = names.select(col("p_name").as("node"), col("cnt"))
      .withColumn("label", col("node"))
      .localCheckpoint()
    var converged = false
    var round = 0
    while (!converged && round < 12) {
      val prop = labels.join(e, labels("node") === e("name_a"))
        .select(e("name_b").as("node"), col("label"))
      val next = labels.select(col("node"), col("label")).union(prop)
        .groupBy(col("node")).agg(min(col("label")).as("label"))
        .join(names.select(col("p_name").as("node"), col("cnt")), "node")
        .localCheckpoint()
      converged = next.as("n").join(labels.as("p"),
        col("n.node") === col("p.node") && col("n.label") =!= col("p.label"))
        .isEmpty
      labels = next
      round += 1
    }
    labels.groupBy(col("label").as("canonical"))
      .agg(count(lit(1)).as("n_members"), sum(col("cnt")).as("total_cnt"))
      .orderBy(col("canonical"))
  }

  private val EntityResolutionOracle: String =
    """WITH RECURSIVE names AS (
      |  SELECT p_name, count(*) AS cnt, split_part(p_name, ' ', 1) AS blk
      |  FROM part GROUP BY p_name),
      |pairs AS (
      |  SELECT a.p_name AS name_a, b.p_name AS name_b
      |  FROM names a JOIN names b ON a.blk = b.blk AND a.p_name < b.p_name
      |  WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= 0.8),
      |e AS (SELECT name_a, name_b FROM pairs
      |      UNION ALL SELECT name_b, name_a FROM pairs),
      |reach(src, node) AS (
      |  SELECT p_name, p_name FROM names
      |  UNION
      |  SELECT r.src, e.name_b FROM reach r JOIN e ON e.name_a = r.node),
      |comp AS (
      |  SELECT src AS node, min(node) AS label FROM reach GROUP BY src)
      |SELECT c.label AS canonical, count(*) AS n_members,
      |  cast(sum(n.cnt) AS BIGINT) AS total_cnt
      |FROM comp c JOIN names n ON n.p_name = c.node
      |GROUP BY c.label ORDER BY canonical""".stripMargin

  val registry: Seq[QueryDef] = Seq(
    QueryDef("q111_entity_resolution", entityResolution _, EntityResolutionOracle),
    QueryDef("q107_fuzzy_join", fuzzyJoin _, FuzzyJoinOracle),
    QueryDef("q108_shortest_path", shortestPath _, ShortestPathOracle),
    QueryDef("q109_components", components _, ComponentsOracle),
    QueryDef("q110_multitouch", multiTouch _, MultiTouchOracle)
  )
}
