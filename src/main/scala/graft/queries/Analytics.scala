package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The grouping-sets / window-function analytics surface (SURVEY §7.5
  * item c): multi-level ROLLUP aggregation (q36), partitioned top-k
  * ranking with lag deltas (q37), and sliding row-frame windows (q38).
  * The reference engine has none of these — BigQuery expresses them,
  * so a user migrating analytics queries needs them — and all three
  * are fully oracle-checked (ANSI rollup/window SQL runs unchanged in
  * DuckDB).
  *
  * Scale notes:
  *  - q36: `rollup` compiles to a Catalyst Expand (3 rows per input
  *    group here) feeding ONE hash aggregate — a single shuffle on the
  *    grouping-set key, partial-aggregated map-side. At 100 TB the
  *    Expand multiplies pre-shuffle rows by the number of grouping
  *    sets; that is the honest cost of exact multi-level totals, and
  *    it scales linearly (no added shuffle).
  *  - q37/q38: window functions shuffle once on the partition key and
  *    sort within partitions. Both queries put every window function
  *    over the SAME (partitionBy, orderBy), so Catalyst evaluates them
  *    in one Window node over one sort. Partition keys (l_suppkey,
  *    o_custkey) are high-cardinality — no single-partition bottleneck.
  *  - Determinism: every orderBy carries a unique tiebreak column, and
  *    all monetary math is integer-scaled per the Relational.scala
  *    float rules.
  */
object Analytics {
  private type Q = (SparkSession, String) => DataFrame

  private def sumE2(c: Column): Column = sum(round(c * lit(100.0), 0).cast("long"))
  private def sumE4(c: Column): Column = sum(round(c * lit(10000.0), 0).cast("long"))

  // -- q36: ROLLUP over (nation, order year) -------------------------

  /** Order revenue at three levels — (nation, year), (nation), grand
    * total — in one pass. Rollup NULL markers are coalesced to
    * sentinels ('ALL' / -1) so both engines agree on the marker
    * representation; nation names are never NULL in the data, so the
    * sentinel is unambiguous. */
  val q36RollupRevenue: Q = (s, d) => {
    val base = Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), year(col("o_orderdate")).cast("long").as("order_year"),
        col("o_totalprice"))
    base.rollup(col("n_name"), col("order_year"))
      .agg(count(lit(1)).as("n_orders"), sumE2(col("o_totalprice")).as("revenue_e2"))
      .select(
        coalesce(col("n_name"), lit("ALL")).as("nation"),
        coalesce(col("order_year"), lit(-1L)).as("order_year"),
        col("n_orders"), col("revenue_e2"))
  }

  // -- q37: partitioned top-k with rank + lag delta ------------------

  /** Top-3 parts per supplier by net revenue, with each part's gap to
    * the next-better part (lag over the same window — one sort). */
  val q37WindowTopk: Q = (s, d) => {
    val rev = Tables.lineitem(s, d)
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sumE4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue_e4"))
    val w = Window.partitionBy("l_suppkey").orderBy(col("revenue_e4").desc, col("l_partkey"))
    rev
      .withColumn("rnk", row_number().over(w))
      .withColumn("gap_to_prev_e4",
        coalesce(lag(col("revenue_e4"), 1).over(w) - col("revenue_e4"), lit(0L)))
      .filter(col("rnk") <= 3)
  }

  // -- q38: sliding row-frame window ---------------------------------

  /** Per-customer order sequence: position, 3-order rolling spend, and
    * running total — all over one (o_custkey, o_orderdate, o_orderkey)
    * sort. Monetary values in exact cents. */
  val q38MovingWindow: Q = (s, d) => {
    val cents = round(col("o_totalprice") * lit(100.0), 0).cast("long")
    val order = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    val roll3 = order.rowsBetween(-2, Window.currentRow)
    val run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), cents.as("price_e2"))
      .withColumn("ord_idx", row_number().over(order))
      .withColumn("roll3_e2", sum(col("price_e2")).over(roll3))
      .withColumn("running_e2", sum(col("price_e2")).over(run))
      .drop("o_orderdate")
  }

  // -- q54: CUBE over (lang, source-group) -----------------------------

  /** Corpus totals at ALL FOUR grouping levels — (lang, src_grp),
    * (lang), (src_grp), grand — in one pass: `cube` completes the
    * grouping-sets family next to q36's `rollup`. Catalyst compiles it
    * to one Expand (4 rows per input group here) feeding ONE
    * partial-aggregated hash aggregate — a single shuffle carrying
    * aggregated cells; the Expand multiplier is the honest cost of
    * exact multi-dimensional totals and scales linearly. NULL grouping
    * markers are coalesced to sentinels ('ALL' / -1) so both engines
    * agree on the marker representation (q36 convention; lang and the
    * source suffix are never NULL in the data). */
  val q54CubeComposition: Q = (s, d) => {
    val base = Tables.documents(s, d).select(
      col("lang"),
      (substring(col("source"), 4, 10).cast("int") % 4).cast("long").as("src_grp"),
      col("n_chars"))
    base.cube(col("lang"), col("src_grp"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars_sum"))
      .select(
        coalesce(col("lang"), lit("ALL")).as("lang_g"),
        coalesce(col("src_grp"), lit(-1L)).as("src_grp_g"),
        col("n_docs"), col("chars_sum"))
  }

  // -- registry ------------------------------------------------------

  // -- q64: Z-order layout keys --------------------------------------

  private val ZBits = 16

  /** Z-ORDER (Morton) clustering keys over (l_partkey, l_suppkey) —
    * the multi-dimensional sort-key technique behind lakehouse
    * `OPTIMIZE ZORDER BY`: interleaving the bits of both keys gives a
    * 1-D order in which ranges of EITHER key stay spatially local, so
    * a `repartitionByRange(zbucket)` write lets parquet min/max stats
    * prune scans filtered on either dimension (a single-column sort
    * only prunes its own column). Computed as a 16-step shift/mask OR
    * chain — pure narrow codegen'd integer math, ZERO shuffles; the
    * expensive part of a real ZORDER rewrite (the range repartition)
    * is the writer's one shuffle, not this key derivation. zbucket =
    * top 12 interleaved bits ⇒ 4096 range-stable file buckets. */
  val q64ZorderLayout: Q = (s, d) => {
    def interleave(x: Column, y: Column): Column =
      (0 until ZBits).foldLeft(lit(0L)) { (acc, i) =>
        acc
          .bitwiseOR(shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i))
          .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
      }
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        (col("l_partkey") % (1 << ZBits)).cast("long").as("zx"),
        (col("l_suppkey") % (1 << ZBits)).cast("long").as("zy"))
      .select(col("l_orderkey"), col("l_linenumber"),
        interleave(col("zx"), col("zy")).as("zcode"))
      .withColumn("zbucket", shiftright(col("zcode"), 2 * ZBits - 12))
  }

  val defs: Map[String, Q] = Map(
    "q64_zorder_layout" -> q64ZorderLayout,
    "q54_cube_composition" -> q54CubeComposition,
    "q36_rollup_revenue" -> q36RollupRevenue,
    "q37_window_topk" -> q37WindowTopk,
    "q38_moving_window" -> q38MovingWindow)

  // -- DuckDB oracles ------------------------------------------------

  val oracles: Map[String, String] = Map(
    "q64_zorder_layout" -> {
      val zexpr = (0 until ZBits).flatMap { i =>
        Seq(s"(((zx >> $i) & 1) << ${2 * i})", s"(((zy >> $i) & 1) << ${2 * i + 1})")
      }.mkString(" | ")
      s"""WITH k AS (
         |  SELECT l_orderkey, l_linenumber,
         |    CAST(l_partkey % ${1 << ZBits} AS BIGINT) AS zx,
         |    CAST(l_suppkey % ${1 << ZBits} AS BIGINT) AS zy
         |  FROM lineitem
         |)
         |SELECT l_orderkey, l_linenumber,
         |  CAST($zexpr AS BIGINT) AS zcode,
         |  CAST(($zexpr) >> ${2 * ZBits - 12} AS BIGINT) AS zbucket
         |FROM k""".stripMargin
    },
    "q54_cube_composition" ->
      """WITH base AS (
        |  SELECT lang, CAST(CAST(substr(source, 4) AS INT) % 4 AS BIGINT) AS src_grp, n_chars
        |  FROM documents
        |)
        |SELECT coalesce(lang, 'ALL') AS lang_g,
        |  coalesce(src_grp, -1) AS src_grp_g,
        |  count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS chars_sum
        |FROM base
        |GROUP BY CUBE (lang, src_grp)""".stripMargin,
    "q36_rollup_revenue" ->
      """WITH base AS (
        |  SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS order_year, o_totalprice
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |)
        |SELECT coalesce(n_name, 'ALL') AS nation,
        |  coalesce(order_year, -1) AS order_year,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice * 100.0, 0) AS BIGINT)) AS BIGINT) AS revenue_e2
        |FROM base
        |GROUP BY ROLLUP (n_name, order_year)""".stripMargin,
    "q37_window_topk" ->
      """WITH rev AS (
        |  SELECT l_suppkey, l_partkey,
        |    CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000.0, 0) AS BIGINT)) AS BIGINT) AS revenue_e4
        |  FROM lineitem GROUP BY 1, 2
        |)
        |SELECT l_suppkey, l_partkey, revenue_e4, rnk, gap_to_prev_e4 FROM (
        |  SELECT *,
        |    row_number() OVER w AS rnk,
        |    coalesce(lag(revenue_e4, 1) OVER w - revenue_e4, 0) AS gap_to_prev_e4
        |  FROM rev
        |  WINDOW w AS (PARTITION BY l_suppkey ORDER BY revenue_e4 DESC, l_partkey)
        |) WHERE rnk <= 3""".stripMargin,
    "q38_moving_window" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(round(o_totalprice * 100.0, 0) AS BIGINT) AS price_e2,
        |  CAST(row_number() OVER w AS BIGINT) AS ord_idx,
        |  CAST(sum(CAST(round(o_totalprice * 100.0, 0) AS BIGINT))
        |    OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS roll3_e2,
        |  CAST(sum(CAST(round(o_totalprice * 100.0, 0) AS BIGINT))
        |    OVER (w ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_e2
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin)
}
