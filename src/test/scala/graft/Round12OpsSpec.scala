package graft

import org.apache.spark.sql.functions._

/** Fixture pins for the round-12 operator batch: the Poisson-bootstrap
  * confidence intervals (q244) — the declared inverse-CDF weight
  * function pinned EXACTLY (boundary draws + the full-grid integral),
  * plus interval/reconciliation identities at sf0.001.
  */
class Round12OpsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  // -- q244: Poisson-bootstrap confidence intervals -------------------------

  test("q244 weight function: boundary draws land on the declared CDF steps") {
    // one row per (u, expected w) — the < comparisons at every step
    // edge, incl. the truncation tail at 8
    val cases = Seq(
      (0L, 0L), (367878L, 0L), (367879L, 1L), (735758L, 1L), (735759L, 2L),
      (919698L, 2L), (919699L, 3L), (981011L, 3L), (981012L, 4L),
      (996339L, 4L), (996340L, 5L), (999405L, 5L), (999406L, 6L),
      (999916L, 6L), (999917L, 7L), (999989L, 7L), (999990L, 8L),
      (999999L, 8L))
    val got = cases.map(_._1).toDF("u")
      .select(col("u"), graft.queries.Analytics.bootWeight(col("u")).as("w"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    cases.foreach { case (u, w) =>
      withClue(s"u=$u:") { got(u) shouldBe w }
    }
  }

  test("q244 weight function integrates to exactly 999998 over the ppm grid") {
    // Σ w(u) for u in 0..999999 — a pure function of the declared
    // literals: Σ k·(c_k − c_{k−1}) + 8·(1e6 − c_7) = 999,998, i.e.
    // mean weight 0.999998 (the truncation-at-8 deficit is 2 ppm).
    // A drifted literal or a broken CASE fold moves this integral.
    val total = spark.range(0L, 1000000L)
      .select(graft.queries.Analytics.bootWeight(col("id")).as("w"))
      .agg(sum(col("w"))).collect().head.getLong(0)
    total shouldBe 999998L
  }

  test("q244 intervals: one row per priority, ordered endpoints, exact mean leg") {
    val rows = graft.queries.Analytics.q244PoissonBootstrap(spark, sf)
      .collect()
    rows.length shouldBe 5
    // independent restatement of the exact leg
    val want = spark.read.parquet(s"$sf/orders.parquet")
      .groupBy(col("o_orderpriority").as("priority"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("o_totalprice") * 100.0, 0).cast("long")).as("s"))
      .select(col("priority"), col("n"), expr("s div n").as("m"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { r =>
      val p = r.getString(r.fieldIndex("priority"))
      val (n, m) = want(p)
      withClue(s"$p:") {
        r.getLong(r.fieldIndex("n_orders")) shouldBe n
        r.getLong(r.fieldIndex("mean_e2")) shouldBe m
        val lo = r.getLong(r.fieldIndex("boot_lo_e2"))
        val hi = r.getLong(r.fieldIndex("boot_hi_e2"))
        lo should be <= hi
        r.getLong(r.fieldIndex("width_e2")) shouldBe hi - lo
        // 40 replicates over hundreds of orders: the percentile
        // interval brackets a value near the point estimate — pin the
        // deterministic containment (hash draws make this exact, not
        // probabilistic, for this fixed corpus)
        lo should be <= m
        hi should be >= m
      }
    }
  }
}
