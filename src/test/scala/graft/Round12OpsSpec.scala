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

  // -- q245: permutation test ----------------------------------------------

  test("q245 reconciles with q133's split and respects the add-one p floor") {
    val perm = graft.queries.EventAnalytics.q245PermutationTest(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    // same parity split, same cents: n0/n1/means must EQUAL q133's
    val z = graft.queries.EventAnalytics.q133AbZtest(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    perm.keySet shouldBe z.keySet
    perm.foreach { case (t, p) =>
      val zr = z(t)
      withClue(s"$t:") {
        p.getLong(p.fieldIndex("n0")) shouldBe zr.getLong(zr.fieldIndex("n0"))
        p.getLong(p.fieldIndex("n1")) shouldBe zr.getLong(zr.fieldIndex("n1"))
        p.getLong(p.fieldIndex("mean0_e2")) shouldBe
          zr.getLong(zr.fieldIndex("mean0_e2"))
        p.getLong(p.fieldIndex("mean1_e2")) shouldBe
          zr.getLong(zr.fieldIndex("mean1_e2"))
        val nGe = p.getLong(p.fieldIndex("n_perm_ge"))
        nGe should be >= 0L
        nGe should be <= 64L
        // the add-one Monte-Carlo convention: p ∈ [1/65, 1] exactly
        p.getLong(p.fieldIndex("p_ppm")) shouldBe (1 + nGe) * 1000000L / 65L
        p.getLong(p.fieldIndex("p_ppm")) should be >= 15384L
        p.getLong(p.fieldIndex("obs_diff_e2")) shouldBe
          math.abs(p.getLong(p.fieldIndex("mean1_e2")) -
            p.getLong(p.fieldIndex("mean0_e2")))
      }
    }
  }

  test("q245 survives an all-one-side fixture (guarded means, p well-defined)") {
    val dir = tmpDir("q245fix")
    // every user odd → treat side only; n0 = 0 must yield mean0 = 0
    // (greatest guard), not a crash or NULL, in both engines' algebra
    Seq((1L, 1L, "purchase", 10.0, "2024-01-01 00:00:00"),
      (2L, 3L, "purchase", 30.0, "2024-01-01 01:00:00"))
      .toDF("event_id", "user_id", "event_type", "value", "ts")
      .withColumn("ts", to_timestamp(col("ts")))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = graft.queries.EventAnalytics.q245PermutationTest(spark, dir)
      .collect()
    r.length shouldBe 1
    val row = r.head
    row.getLong(row.fieldIndex("n0")) shouldBe 0L
    row.getLong(row.fieldIndex("n1")) shouldBe 2L
    row.getLong(row.fieldIndex("mean0_e2")) shouldBe 0L
    row.getLong(row.fieldIndex("mean1_e2")) shouldBe 2000L
    row.getLong(row.fieldIndex("obs_diff_e2")) shouldBe 2000L
    val p = row.getLong(row.fieldIndex("p_ppm"))
    p should be >= 15384L
    p should be <= 1000000L
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
