package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Duplicate-cluster graph analytics — the stage AFTER pair-emitting
  * near-dup detection. q21/q31/q32/q39 all end at "pairs (a, b) are
  * near-duplicates", but a curation pipeline must act on CLUSTERS:
  * if a~b and b~c, keeping "one of each pair" would still keep two
  * copies of the cluster {a,b,c}. q55 closes that gap: connected
  * components over the near-dup pair graph, one keeper per component.
  *
  * Algorithm: min-label propagation with pointer doubling. Each node
  * starts labeled with itself; every round a node takes the min of its
  * own label, its neighbors' labels, and its LABEL'S label (the
  * pointer-doubling hop that short-circuits long chains: label paths
  * halve every round, so convergence is O(log diameter) rounds, not
  * O(diameter) — the property that makes this runnable on a 100 TB
  * pair graph where a plain flood fill on a chain-shaped component
  * would need thousands of barriers). Each round is two keyed
  * equi-joins + one min-aggregate — all partial-aggregated shuffles on
  * bounded keys, nothing quadratic, nothing driver-side except the
  * O(1) convergence counter. Lineage is truncated per round via
  * [[graft.ops.Checkpoints.cut]] so the plan does not grow with
  * iterations (the standard iterative-algorithm discipline on Spark):
  * executor-local by default, durable `checkpoint()` for
  * executor-loss recovery when `spark.graft.checkpointDir` points at
  * cluster storage — the mode a 100 TB run must use.
  *
  * The driver-side loop is control plane, not data plane: the number
  * of rounds is ~log2 of the largest component's diameter (2-3 in
  * practice for dedup graphs), and the only values crossing the
  * driver are per-round change counts.
  *
  * Oracle: an independent DuckDB restatement — WITH RECURSIVE
  * min-label reachability over the same pair relation (q21's oracle
  * CTEs, mounted unchanged) — so the Spark fixpoint is checked against
  * a different algorithm, not a re-run of itself.
  */
object Graph {
  private type Q = (SparkSession, String) => DataFrame

  /** Connected components of an undirected graph given as (a, b)
    * pairs; returns (id, lbl) with lbl = min node id reachable. */
  private[graft] def connectedComponents(pairs: DataFrame): DataFrame = {
    // UNBOUNDED driver loop ⇒ durable cuts are mandatory: in local
    // mode each round's blocks keep object references into the
    // previous round, and the driver-side walk doubles per round from
    // ~round 18 (see Checkpoints.ensureDurable) — long-diameter
    // graphs (q144's 28-round merge chains) hang without this.
    graft.ops.Checkpoints.ensureDurable(pairs.sparkSession)
    // the pair source is materialized BEFORE symmetrization: the
    // union references it twice, and without the checkpoint the whole
    // upstream pair-detection plan (q21's joins, for q55) would be
    // computed once per union leg
    val p = pairs.select(col("a"), col("b")).transform(graft.ops.Checkpoints.cut)
    // symmetric edge list, materialized ONCE — every round re-reads it
    val sym = p.select(col("a").as("src"), col("b").as("dst"))
      .union(p.select(col("b").as("src"), col("a").as("dst")))
      .distinct()
      .transform(graft.ops.Checkpoints.cut)
    var lbl = sym.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("lbl"))
      .transform(graft.ops.Checkpoints.cut)
    var changed = 1L
    while (changed > 0) {
      val viaEdge = sym.join(lbl, col("src") === col("id"))
        .select(col("dst").as("id"), col("lbl"))
      val ptr = lbl.select(col("id").as("pid"), col("lbl").as("plbl"))
      // Note: under ensureDurable the jump self-join needs no extra
      // per-round cut — the file-backed checkpoint of `next` alone
      // keeps rounds flat (A/B measured 20.1s vs 22.0s for q144's
      // 28-round loop WITH an extra viaPtr cut; in the old local-only
      // mode no amount of cutting prevented the ~round-18 blowup).
      val viaPtr = lbl.join(ptr, col("lbl") === col("pid"))
        .select(col("id"), col("plbl").as("lbl"))
      val next = lbl.union(viaEdge).union(viaPtr)
        .groupBy("id").agg(min("lbl").as("lbl"))
        .transform(graft.ops.Checkpoints.cut)
      changed = next.join(lbl.select(col("id"), col("lbl").as("old")), "id")
        .filter(col("lbl") =!= col("old")).count()
      lbl = next
    }
    lbl
  }

  /** q55: near-duplicate clusters over the q21 MinHash-verified pair
    * graph. One row per clustered document: its component id (= the
    * smallest doc_id in the component — the canonical keeper), the
    * component size, and the keep/drop verdict. Documents in no pair
    * are implicitly singleton keepers and are not emitted (at corpus
    * scale they are the overwhelming majority; emitting them would be
    * an O(corpus) append of trivial rows). */
  val q55DupClusters: Q = (s, d) => {
    val pairs = LlmPipeline.q21DedupMinhashLsh(s, d)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    val lbl = connectedComponents(pairs)
    val sizes = lbl.groupBy("lbl").agg(count(lit(1)).as("cluster_size"))
    lbl.join(sizes, "lbl")
      .select(col("id").as("doc_id"), col("lbl").as("cluster_id"),
        col("cluster_size"), (col("id") === col("lbl")).as("is_keeper"))
  }

  // -- q90: PageRank (two unrolled iterations, integer e9) -------------

  /** PAGERANK over the supplier→customer shipment graph (who supplies
    * whom, from lineitem⋈orders): the iterative NUMERIC graph compute
    * next to q55's iterative LABEL propagation — the
    * importance/centrality score behind seed-quality weighting of
    * link-graph corpus curation. Two Jacobi iterations unrolled (no
    * driver loop — the oracle restates them as chained CTEs), damping
    * 0.85, dangling mass dropped (documented simplification; customers
    * are sinks here). ALL math is integer e9 with floor division —
    * identical in both engines, no float accumulation order anywhere.
    * Per iteration: one keyed equi-join of ranks onto the static
    * (src, dst, outdeg) edge relation + one partial-aggregated
    * inflow sum — linear in edges, nothing quadratic, the classic
    * scale shape (edges re-read per round from a checkpoint; the
    * node-count scalar is driver-hosted control plane like q61's
    * corpus stats). */
  val q90PageRank: Q = (s, d) => {
    import graft.Tables
    val edges = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
      .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(concat(lit("s"), col("l_suppkey")).as("src"),
        concat(lit("c"), col("o_custkey")).as("dst"))
      .distinct()
      .transform(graft.ops.Checkpoints.cut) // reused by nodes, outdeg, and both iterations
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
      .transform(graft.ops.Checkpoints.cut)
    val n = nodes.count() // control-plane scalar (q61 convention)
    val r0 = 1000000000L / n
    val base = 150000000L / n // (1 - 0.85) * 1e9 / N, floor
    val wedges = edges
      .join(edges.groupBy("src").agg(count(lit(1)).as("deg")), "src")
      .transform(graft.ops.Checkpoints.cut) // static (src, dst, deg), built once
    def iterate(r: DataFrame): DataFrame = {
      val inflow = wedges.join(r, col("src") === col("node"))
        .select(col("dst"), expr("rank_e9 div deg").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("inflow"))
      nodes.join(inflow, col("node") === col("dst"), "left")
        .select(col("node"),
          (lit(base) + expr("85 * coalesce(inflow, 0) div 100")).as("rank_e9"))
    }
    iterate(iterate(nodes.select(col("node"), lit(r0).as("rank_e9"))))
  }

  // -- q121: triangle counting (degree-ordered compact-forward) --------

  private val TriMinSupport = 2

  /** TRIANGLE COUNTING over the part co-purchase graph (parts bought
    * together in ≥2 orders, the support floor that separates affinity
    * from coincidence): per-node triangle participation and the local
    * clustering coefficient in integer e6 — the cohesion metric next
    * to q55's reachability and q90's centrality, and the standard
    * community-density signal for link-graph corpus weighting.
    *
    * Scale shape is the compact-forward algorithm: orient every edge
    * from its (degree, id)-smaller endpoint to the larger, so each
    * triangle {u<v<w in that total order} is generated EXACTLY once as
    * a wedge at its lowest-order corner and closed by one equi-join —
    * and, critically, wedge fan-out at a hub is bounded by its
    * FORWARD degree (max O(√m) after orientation), not its raw degree:
    * the celebrity node that would explode a naive wedge join
    * contributes almost nothing because nearly all its edges point
    * INTO it. Edge building reuses q96's in-row pair expansion (one
    * shuffle on l_orderkey, no self-join on raw lineitem); the edge
    * relation is checkpoint-cut once and re-read by the degree pass
    * and all three join legs. Everything downstream is equi-joins and
    * partial-aggregated counts on bounded keys — no cartesian, no
    * driver-side state. */
  /** Core of q121: per-node (deg, n_triangles, clustering_e6) for an
    * undirected simple graph given as (x, y) pairs with x ≠ y, each
    * edge listed once. Exposed for spec fixtures (K4, paths). */
  private[graft] def triangleStats(pairs: DataFrame): DataFrame = {
    val edges = pairs.select(col("x"), col("y"))
      .transform(graft.ops.Checkpoints.cut) // reused: degrees + three join legs
    val deg = edges.select(col("x").as("node"))
      .union(edges.select(col("y").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
      .transform(graft.ops.Checkpoints.cut) // reused: orientation + final join
    // (deg, id) total order; struct comparison is lexicographic in both
    // engines (DuckDB row-value compare in the oracle)
    val xFirst = struct(col("dx"), col("x")) < struct(col("dy"), col("y"))
    val oriented = edges
      .join(deg.select(col("node").as("x"), col("deg").as("dx")), "x")
      .join(deg.select(col("node").as("y"), col("deg").as("dy")), "y")
      .select(
        when(xFirst, col("x")).otherwise(col("y")).as("src"),
        when(xFirst, col("y")).otherwise(col("x")).as("dst"),
        when(xFirst, col("dy")).otherwise(col("dx")).as("ddeg"))
      .transform(graft.ops.Checkpoints.cut) // three self-join legs below
    val wedges = oriented.as("e1").join(oriented.as("e2"),
        col("e1.src") === col("e2.src") &&
          struct(col("e1.ddeg"), col("e1.dst")) <
            struct(col("e2.ddeg"), col("e2.dst")))
      .select(col("e1.src").as("a"), col("e1.dst").as("b"), col("e2.dst").as("c"))
    val corners = wedges
      .join(oriented.as("e3"),
        col("b") === col("e3.src") && col("c") === col("e3.dst"))
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
    deg.join(corners, Seq("node"), "left")
      .select(col("node"), col("deg"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        when(col("deg") >= 2,
          expr("2 * coalesce(n_triangles, 0L) * 1000000 div (deg * (deg - 1))"))
          .otherwise(lit(0L)).as("clustering_e6"))
  }

  /** The support-floored part co-purchase graph (parts bought together
    * in ≥ [[TriMinSupport]] orders), built with the in-row pair
    * expansion — one shuffle on l_orderkey, no self-join on raw
    * lineitem. Shared by q121 (triangles, ≥2 support) and q138
    * (k-core, all pairs). */
  private def copurchaseEdges(s: SparkSession, d: String, minSupport: Int): DataFrame = {
    import graft.Tables
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey"))
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("items"))
      .filter(size(col("items")) >= 2)
      .select(explode(flatten(transform(col("items"), (x, i) =>
        transform(slice(col("items"), i + lit(2), size(col("items"))), y =>
          struct(x.as("x"), y.as("y")))))).as("p"))
      .groupBy(col("p.x").as("x"), col("p.y").as("y"))
      .agg(count(lit(1)).as("n_orders"))
      .filter(col("n_orders") >= minSupport)
      .select(col("x"), col("y"))
  }

  val q121TriangleCount: Q = (s, d) =>
    triangleStats(copurchaseEdges(s, d, TriMinSupport)).withColumnRenamed("node", "p_partkey")

  private val RaMaxBasket = 64
  private val RaMinShared = 2

  /** LINK PREDICTION via the Resource-Allocation index (Zhou, Lü &
    * Zhang 2009): for every part pair, Σ over shared orders of
    * 1/|order| — the degree-penalized common-neighbor score that beats
    * raw co-occurrence counting (q96) because a 2-item basket is far
    * stronger evidence of affinity than co-appearing in a 50-item
    * megabasket. RA is the log-free sibling of Adamic-Adar (1/log deg
    * would break the README libm rule; RA is equally standard and
    * integer-exact: weight = 1e6 div basket size, summed as BIGINTs).
    *
    * Plan: same in-row pair expansion as q121 — one map-combined
    * shuffle to per-order item sets, pairs generated INSIDE the row
    * with the order's weight attached, one partial-aggregated shuffle
    * on the pair key. No self-join on raw lineitem, no wedge
    * explosion: the basket cap (≤64 items ⇒ ≤2016 pairs/order,
    * declared — TPC-H baskets are ≤7) bounds per-row fan-out, and hub
    * PARTS cost nothing extra because the aggregation key is the pair,
    * not the part. ≥2-shared-orders floor keeps the output the
    * affinity shortlist, not the quadratic noise tail. */
  val q136LinkPrediction: Q = (s, d) => {
    import graft.Tables
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey"))
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("items"))
      .filter(size(col("items")).between(2, RaMaxBasket))
      .select(expr("1000000 div size(items)").as("w_e6"),
        explode(flatten(transform(col("items"), (x, i) =>
          transform(slice(col("items"), i + lit(2), size(col("items"))), y =>
            struct(x.as("x"), y.as("y")))))).as("p"))
      .groupBy(col("p.x").as("x"), col("p.y").as("y"))
      .agg(count(lit(1)).as("shared_orders"), sum(col("w_e6")).as("ra_e6"))
      .filter(col("shared_orders") >= RaMinShared)
  }

  private val KCoreK = 90
  private val KCorePeels = 4

  /** Core of q138: [[KCorePeels]] unrolled rounds of k-core peeling —
    * drop every node with degree < k, delete its edges, recompute,
    * repeat — over an undirected simple graph given as (x, y) pairs,
    * each edge listed once. Returns surviving nodes with their
    * residual in-core degree. Exposed for spec fixtures. */
  private[graft] def kcorePeel(edges0: DataFrame, k: Int, rounds: Int): DataFrame = {
    def degrees(e: DataFrame): DataFrame =
      e.select(col("x").as("node")).union(e.select(col("y").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
    var e = edges0.transform(graft.ops.Checkpoints.cut)
    for (_ <- 1 to rounds) {
      val keep = degrees(e).filter(col("deg") >= k).select("node")
        .transform(graft.ops.Checkpoints.cut) // feeds BOTH semi-join legs
      e = e
        .join(keep.select(col("node").as("x")), Seq("x"), "left_semi")
        .join(keep.select(col("node").as("y")), Seq("y"), "left_semi")
        .transform(graft.ops.Checkpoints.cut) // next round reads e twice
    }
    degrees(e).select(col("node"), col("deg").as("deg_in_core"))
  }

  /** K-CORE DECOMPOSITION (90-core, 4 unrolled peels): the maximal-ish
    * subgraph where every part keeps ≥90 co-purchase neighbors (the
    * testdata's co-purchase degrees center near 115 at every sf, so
    * k=90 peels a substantial fringe and cascades across rounds
    * without collapsing the core — the support-floored q121 graph is
    * near-forest at sf0.1, hence ALL pairs here) — the
    * density backbone that separates a genuinely cohesive product
    * community from stars and chains that triangle counts (q121) and
    * centrality (q90) each miss in their own way. Peeling is the
    * textbook Matula–Beck reduction; FOUR unrolled rounds is the
    * repo's iterative convention (q90's Jacobi / q57's Lloyd) so the
    * oracle restates each round as a chained CTE — a fixpoint loop at
    * 100 TB keeps the same per-round plan (degree aggregate + two
    * semi-joins, all partial-aggregated equi-joins on node keys) with
    * a driver-side convergence check on a one-row count, and each
    * round STRICTLY shrinks the edge set, so later rounds get cheaper.
    * Checkpoint cuts bound the lineage exactly as q55's pointer
    * doubling does. */
  val q138KCore: Q = (s, d) =>
    kcorePeel(copurchaseEdges(s, d, 1), KCoreK, KCorePeels)
      .withColumnRenamed("node", "p_partkey")

  val defs: Map[String, Q] = Map(
    "q55_dup_clusters" -> q55DupClusters,
    "q90_pagerank" -> q90PageRank,
    "q121_triangle_count" -> q121TriangleCount,
    "q136_link_prediction" -> q136LinkPrediction,
    "q138_kcore" -> q138KCore)

  val oracles: Map[String, String] = Map(
    // The same four peel rounds as chained CTEs over the self-join
    // edge restatement (q121 oracle convention for the edge builder).
    // Every round's CTEs are multi-referenced by later rounds, so they
    // MUST be AS MATERIALIZED: DuckDB otherwise inlines each reference
    // and the re-evaluation tree grows exponentially across rounds
    // (observed: temp-disk exhaustion at sf0.1).
    "q138_kcore" -> {
      val rounds = (1 to KCorePeels).map { r =>
        s"""d${r - 1} AS MATERIALIZED (
           |  SELECT node, count(*) AS deg FROM (
           |    SELECT x AS node FROM e${r - 1} UNION ALL SELECT y FROM e${r - 1}
           |  ) GROUP BY 1
           |), k${r - 1} AS MATERIALIZED (SELECT node FROM d${r - 1} WHERE deg >= $KCoreK),
           |e$r AS MATERIALIZED (
           |  SELECT e.x, e.y FROM e${r - 1} e
           |  JOIN k${r - 1} a ON e.x = a.node
           |  JOIN k${r - 1} b ON e.y = b.node
           |)""".stripMargin
      }.mkString(",\n")
      s"""WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         |e0 AS MATERIALIZED (
         |  SELECT DISTINCT a.l_partkey AS x, b.l_partkey AS y
         |  FROM li a JOIN li b
         |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         |),
         |$rounds
         |SELECT node AS p_partkey, CAST(count(*) AS BIGINT) AS deg_in_core FROM (
         |  SELECT x AS node FROM e$KCorePeels UNION ALL SELECT y FROM e$KCorePeels
         |) GROUP BY 1""".stripMargin
    },
    // Independent restatement: distinct-item self-join (a < b) against
    // the in-row pair expansion; same basket cap, weight, and floor.
    "q136_link_prediction" ->
      s"""WITH items AS (
         |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
         |), osize AS (
         |  SELECT l_orderkey, count(*) AS n_items
         |  FROM items GROUP BY 1
         |  HAVING count(*) BETWEEN 2 AND $RaMaxBasket
         |), pairs AS (
         |  SELECT a.l_partkey AS x, b.l_partkey AS y,
         |    CAST(1000000 // o.n_items AS BIGINT) AS w_e6
         |  FROM items a
         |  JOIN items b ON a.l_orderkey = b.l_orderkey
         |    AND a.l_partkey < b.l_partkey
         |  JOIN osize o ON a.l_orderkey = o.l_orderkey
         |)
         |SELECT x, y, count(*) AS shared_orders,
         |  CAST(sum(w_e6) AS BIGINT) AS ra_e6
         |FROM pairs GROUP BY 1, 2
         |HAVING count(*) >= $RaMinShared""".stripMargin,
    // The same two unrolled iterations as chained CTEs — integer e9
    // floor arithmetic reproduces exactly (q57 unrolled-Lloyd
    // convention for iterative algorithms).
    "q90_pagerank" ->
      """WITH e AS (
        |  SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
        |    'c' || CAST(o_custkey AS VARCHAR) AS dst
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |), nodes AS (
        |  SELECT src AS node FROM e UNION SELECT dst FROM e
        |), nn AS (SELECT count(*) AS n FROM nodes),
        |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
        |r0 AS (SELECT node, 1000000000 // n AS rank_e9 FROM nodes CROSS JOIN nn),
        |i1 AS (
        |  SELECT e.dst, sum(r.rank_e9 // d.deg) AS inflow
        |  FROM e JOIN deg d ON e.src = d.src JOIN r0 r ON r.node = e.src
        |  GROUP BY 1
        |), r1 AS (
        |  SELECT node, 150000000 // n + 85 * coalesce(inflow, 0) // 100 AS rank_e9
        |  FROM nodes CROSS JOIN nn LEFT JOIN i1 ON i1.dst = node
        |), i2 AS (
        |  SELECT e.dst, sum(r.rank_e9 // d.deg) AS inflow
        |  FROM e JOIN deg d ON e.src = d.src JOIN r1 r ON r.node = e.src
        |  GROUP BY 1
        |), r2 AS (
        |  SELECT node, 150000000 // n + 85 * coalesce(inflow, 0) // 100 AS rank_e9
        |  FROM nodes CROSS JOIN nn LEFT JOIN i2 ON i2.dst = node
        |)
        |SELECT node, CAST(rank_e9 AS BIGINT) AS rank_e9 FROM r2""".stripMargin,
    // Independent restatement: plain a<b pair expansion via self-join
    // (no in-row expansion), the same (deg, id) orientation via
    // DuckDB row-value comparison, and the same wedge-close join.
    "q121_triangle_count" ->
      """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e AS (
        |  SELECT a.l_partkey AS x, b.l_partkey AS y
        |  FROM li a JOIN li b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 2
        |), deg AS (
        |  SELECT node, count(*) AS deg FROM (
        |    SELECT x AS node FROM e UNION ALL SELECT y FROM e
        |  ) GROUP BY 1
        |), o AS (
        |  SELECT
        |    CASE WHEN (da.deg, e.x) < (db.deg, e.y) THEN e.x ELSE e.y END AS src,
        |    CASE WHEN (da.deg, e.x) < (db.deg, e.y) THEN e.y ELSE e.x END AS dst,
        |    CASE WHEN (da.deg, e.x) < (db.deg, e.y) THEN db.deg ELSE da.deg END AS ddeg
        |  FROM e JOIN deg da ON da.node = e.x JOIN deg db ON db.node = e.y
        |), tri AS (
        |  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
        |  FROM o e1
        |  JOIN o e2 ON e1.src = e2.src AND (e1.ddeg, e1.dst) < (e2.ddeg, e2.dst)
        |  JOIN o e3 ON e3.src = e1.dst AND e3.dst = e2.dst
        |), corners AS (
        |  SELECT node, count(*) AS n_triangles FROM (
        |    SELECT a AS node FROM tri
        |    UNION ALL SELECT b FROM tri
        |    UNION ALL SELECT c FROM tri
        |  ) GROUP BY 1
        |)
        |SELECT deg.node AS p_partkey, deg.deg,
        |  coalesce(corners.n_triangles, 0) AS n_triangles,
        |  CASE WHEN deg.deg >= 2
        |    THEN 2 * coalesce(corners.n_triangles, 0) * 1000000
        |           // (deg.deg * (deg.deg - 1))
        |    ELSE 0 END AS clustering_e6
        |FROM deg LEFT JOIN corners ON corners.node = deg.node""".stripMargin,
    // Reachability fixpoint per node (recursive CTE), then min label —
    // algorithmically independent of the Spark pointer-doubling loop.
    "q55_dup_clusters" ->
      s"""WITH RECURSIVE ${LlmPipeline.minhashPairCtes}, pairs AS (
         |  ${LlmPipeline.minhashPairSelect}
         |), edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM pairs
         |  UNION
         |  SELECT doc_b AS src, doc_a AS dst FROM pairs
         |), walk AS (
         |  SELECT src AS doc_id, src AS lbl FROM edges
         |  UNION
         |  SELECT e.dst AS doc_id, w.lbl FROM walk w
         |  JOIN edges e ON e.src = w.doc_id
         |), comp AS (
         |  SELECT doc_id, min(lbl) AS cluster_id FROM walk GROUP BY doc_id
         |)
         |SELECT c.doc_id, c.cluster_id, s.cluster_size,
         |  c.doc_id = c.cluster_id AS is_keeper
         |FROM comp c JOIN (
         |  SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY 1
         |) s ON s.cluster_id = c.cluster_id""".stripMargin)
}
