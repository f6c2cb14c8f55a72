package graft

import org.apache.spark.sql.functions._

/** Fixture pins for the q132–q135 time-series family: each operator's
  * core math on a tiny hand-derivable events table (the oracle gate
  * checks the same functions against DuckDB on the driver testdata;
  * these pin the SEMANTICS — pair gating, exact walks, argmax
  * tiebreaks — on inputs where the answer is checkable by hand).
  */
class Round8bOpsSpec extends SparkSpec {
  import spark.implicits._

  private def writeEvents(dir: String,
      rows: Seq[(Long, String, Long, String, Double)]): Unit =
    rows.map { case (id, ts, uid, et, v) =>
      (id, java.sql.Timestamp.valueOf(ts), uid, et, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

  // -- q132: autocorrelation ------------------------------------------

  test("q132: perfectly persistent series → acf1 = 1, calendar gaps drop pairs") {
    val dir = tmpDir("acf")
    // one event per day, linearly rising values Jan 1–4 (3 consecutive
    // pairs, exactly correlated), plus an isolated day Jan 10 whose
    // lag-pair must be gated out by the day = prev + 1 check
    writeEvents(dir, Seq(
      (1L, "2024-01-01 12:00:00", 1L, "a", 1.00),
      (2L, "2024-01-02 12:00:00", 1L, "a", 2.00),
      (3L, "2024-01-03 12:00:00", 1L, "a", 3.00),
      (4L, "2024-01-04 12:00:00", 1L, "a", 4.00),
      (5L, "2024-01-10 12:00:00", 1L, "a", 9.99)))
    val r = graft.queries.EventAnalytics.q132Autocorr(spark, dir)
      .select("event_type", "n_pairs", "acf1")
      .as[(String, Long, Option[Double])].collect()
    r.length shouldBe 1
    val (_, nPairs, acf) = r.head
    nPairs shouldBe 3L
    // y = x − 100 cents: shift-invariant Pearson is exactly 1 up to
    // the sqrt(A)·sqrt(B) vs √(AB) ulp
    acf.get shouldBe 1.0 +- 1e-12
  }

  test("q132: constant series has zero variance → acf1 is null") {
    val dir = tmpDir("acf0")
    writeEvents(dir, (1 to 4).map(i =>
      (i.toLong, f"2024-01-0$i 00:30:00", 1L, "flat", 5.00)))
    val r = graft.queries.EventAnalytics.q132Autocorr(spark, dir)
      .select("n_pairs", "acf1").as[(Long, Option[Double])].collect()
    r shouldBe Array((3L, None))
  }

  // -- q133: A/B z-test -----------------------------------------------

  test("q133: parity split arms, Welch z from the exact moment sums") {
    val dir = tmpDir("ab")
    // control (even uid): 100.00, 300.00 → mean 200.00, var 2e8 cents²
    // treat (odd uid):    200.00, 600.00 → mean 400.00, var 8e8 cents²
    writeEvents(dir, Seq(
      (1L, "2024-01-01 00:00:00", 0L, "x", 100.00),
      (2L, "2024-01-01 01:00:00", 2L, "x", 300.00),
      (3L, "2024-01-01 02:00:00", 1L, "x", 200.00),
      (4L, "2024-01-01 03:00:00", 3L, "x", 600.00)))
    val r = graft.queries.EventAnalytics.q133AbZtest(spark, dir)
      .select("n0", "n1", "mean0_e2", "mean1_e2", "z_score")
      .as[(Long, Long, Long, Long, Double)].head()
    r._1 shouldBe 2L
    r._2 shouldBe 2L
    r._3 shouldBe 20000L
    r._4 shouldBe 40000L
    // z = (40000−20000)/√(8e8/2 + 2e8/2) — same IEEE ops, exact match
    r._5 shouldBe 20000.0 / math.sqrt(5e8)
  }

  // -- q134: CUSUM change point ---------------------------------------

  test("q134: level shift peaks the exact n-scaled walk at the last low day") {
    val dir = tmpDir("cusum")
    // counts/day: 1,1,1 then 3,3,3 — walk (×n=6): −6,−12,−18,−12,−6,0
    val rows = (1 to 6).flatMap { day =>
      val n = if (day <= 3) 1 else 3
      (1 to n).map(k =>
        ((day * 10 + k).toLong, f"2024-01-0$day 0$k:00:00", 1L, "load", 1.0))
    }
    writeEvents(dir, rows)
    val r = graft.queries.EventAnalytics.q134CusumChangepoint(spark, dir)
      .select(col("n_days"), date_format(col("change_day"), "yyyy-MM-dd"),
        col("cusum_xn"), col("max_abs_xn"))
      .as[(Long, String, Long, Long)].head()
    r shouldBe ((6L, "2024-01-03", -18L, 18L))
  }

  // -- q135: seasonal baseline ----------------------------------------

  test("q135: spike vs the same-slot median, quiet weeks stay unflagged") {
    val dir = tmpDir("seasonal")
    // same weekday+hour across three weeks: counts 1, 1, 10 → slot
    // median 1.0; only the 10 is a spike (10 > 2×1); nothing dips
    // (all ≥ 0.5)
    val weeks = Seq("2024-01-05", "2024-01-12", "2024-01-19") // Fridays
    val rows = weeks.zipWithIndex.flatMap { case (day, wi) =>
      val n = if (wi == 2) 10 else 1
      (1 to n).map(k => ((wi * 100 + k).toLong, s"$day 09:${10 + k}:00", 1L, "beat", 1.0))
    }
    writeEvents(dir, rows)
    val r = graft.queries.EventAnalytics.q135SeasonalBaseline(spark, dir)
      .select(col("hour_ts").cast("string"), col("cnt"), col("slot_median"),
        col("is_spike"), col("is_dip"))
      .as[(String, Long, Double, Boolean, Boolean)].collect()
      .sortBy(_._1)
    r.map(_._2).toSeq shouldBe Seq(1L, 1L, 10L)
    r.map(_._3).distinct.toSeq shouldBe Seq(1.0)
    r.map(_._4).toSeq shouldBe Seq(false, false, true)
    r.forall(!_._5) shouldBe true
    // all three land in one slot: Friday (Spark dayofweek 6) 09h
    graft.queries.EventAnalytics.q135SeasonalBaseline(spark, dir)
      .select("slot").distinct().as[Long].collect().toSeq shouldBe Seq(5 * 24 + 9)
  }

  // -- q130: Gini -----------------------------------------------------

  test("q130: equal spends → 0, a 1:3 split → exactly 250000 e6") {
    val dir = tmpDir("gini")
    Seq((0L, "EQ"), (1L, "CONC")).toDF("n_nationkey", "n_name")
      .withColumn("n_regionkey", lit(0L))
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L))
      .toDF("c_custkey", "c_nationkey")
      .withColumn("c_name", concat(lit("c"), col("c_custkey")))
      .withColumn("c_mktsegment", lit("S"))
      .withColumn("c_acctbal", lit(0.0))
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    // EQ: both customers spend 100 → G = 0
    // CONC: spends 100 and 300 → G = (2·700 − 3·400)/(2·400) = 0.25
    Seq((10L, 1L, 100.00), (11L, 2L, 100.00), (12L, 3L, 100.00),
      (13L, 4L, 200.00), (14L, 4L, 100.00))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .withColumn("o_orderstatus", lit("F"))
      .withColumn("o_orderdate", lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .withColumn("o_orderpriority", lit("1-URGENT"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = graft.queries.Analytics.q130Gini(spark, dir)
      .select("n_name", "n_cust", "total_e0", "gini_e6")
      .as[(String, Long, Long, Long)].collect().map(t => t._1 -> t).toMap
    r("EQ") shouldBe (("EQ", 2L, 200L, 0L))
    r("CONC") shouldBe (("CONC", 2L, 400L, 250000L))
  }

  // -- q131: Benford digits -------------------------------------------

  test("q131: integer digit extraction spans magnitudes; ppm vs the literal") {
    val dir = tmpDir("benford")
    // cents: 12300 → 1, 1999 → 1, 7 → 7, 90000 → 9
    Seq((1L, 123.00), (2L, 19.99), (3L, 0.07), (4L, 900.00))
      .toDF("o_orderkey", "o_totalprice")
      .withColumn("o_custkey", lit(1L))
      .withColumn("o_orderstatus", lit("F"))
      .withColumn("o_orderdate", lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .withColumn("o_orderpriority", lit("1-URGENT"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = graft.queries.Analytics.q131Benford(spark, dir)
      .select("digit", "n", "n_total", "share_ppm", "benford_ppm", "dev_ppm")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> t).toMap
    r.keySet shouldBe Set(1L, 7L, 9L)
    r(1L) shouldBe ((1L, 2L, 4L, 500000L, 301030L, 198970L))
    r(7L)._4 shouldBe 250000L
    r(9L)._5 shouldBe 45757L // round(1e6·log10(10/9))
  }

  // -- q136: resource-allocation link prediction ----------------------

  test("q136: small baskets outweigh megabaskets; singletons filtered") {
    val dir = tmpDir("ra")
    // order 1: {1,2}         → w = 500000
    // order 2: {1,2,3,4}     → w = 250000
    // order 3: {1,2}         → w = 500000
    // pair (1,2): 3 shared orders, ra = 1250000; all other pairs share
    // only order 2 → below the ≥2 floor
    val rows = Seq(
      (1L, 1L), (1L, 2L),
      (2L, 1L), (2L, 2L), (2L, 3L), (2L, 4L),
      (3L, 1L), (3L, 2L))
    rows.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = graft.queries.Graph.q136LinkPrediction(spark, dir)
      .select("x", "y", "shared_orders", "ra_e6")
      .as[(Long, Long, Long, Long)].collect()
    r.toSeq shouldBe Seq((1L, 2L, 3L, 1250000L))
  }

  // -- q137: chi-square independence ----------------------------------

  test("q137: independent table → zero cells; absent-cell mass lands in the total") {
    val dir = tmpDir("chisq")
    def docs(rows: Seq[(String, String, Int)]) = rows
      .flatMap { case (src, lang, n) => (1 to n).map(i => (src, lang, i)) }
      .zipWithIndex
      .map { case ((src, lang, _), i) => (i.toLong, s"text $i", lang, src, 6L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // perfectly independent 2×2: e = o for every cell → chi2 = 0
    docs(Seq(("a", "en", 2), ("a", "fr", 2), ("b", "en", 1), ("b", "fr", 1)))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r0 = graft.queries.Profiling.q137ChisqIndependence(spark, dir)
      .select("cell_chi2_e6", "chi2_total_e6").as[(Long, Long)].collect()
    r0.length shouldBe 4
    r0.map(_._1).sum shouldBe 0L
    r0.map(_._2).distinct.toSeq shouldBe Seq(0L)

    // diagonal 2×2 with an UNOBSERVED off-diagonal: a/en=2, b/fr=2.
    // Observed cells: e = 1 each, contribution (2·4−2·2)²/(4·2·2) = 1
    // → 1e6 each; absent mass = G·1e6 − Σe_e6 = 4e6 − 2e6 = 2e6;
    // total = 2e6 + 2e6 = 4e6 (= exact χ² = n for a perfect 2×2
    // association: 4).
    docs(Seq(("a", "en", 2), ("b", "fr", 2)))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r1 = graft.queries.Profiling.q137ChisqIndependence(spark, dir)
      .select("cell_chi2_e6", "chi2_total_e6").as[(Long, Long)].collect()
    r1.length shouldBe 2
    r1.map(_._1).toSeq.sorted shouldBe Seq(1000000L, 1000000L)
    r1.map(_._2).distinct.toSeq shouldBe Seq(4000000L)
  }

  // -- q138: k-core peeling -------------------------------------------

  test("q138 kcorePeel: cascading tail peels over multiple rounds, K4 survives") {
    // K4 on 1..4 plus a tail: 5—4, 5—6, 5—7, 6—7. Round 1 removes 6,7
    // (deg 2); that drops 5 to deg 1 → round 2 removes 5; K4 is the
    // stable 3-core with every node at residual degree 3.
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L), (5L, 7L), (6L, 7L)).toDF("x", "y")
    val r = graft.queries.Graph.kcorePeel(edges, 3)
      .as[(Long, Long)].collect().toMap
    r shouldBe Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L)
  }

  test("q138 kcorePeel: fixpoint outlasts the old 4-round unroll") {
    // an 11-node path under k=2 cascades from both ends: round r
    // removes the current endpoints, so full convergence (to empty)
    // takes 5 rounds — the old fixed 4-round unroll silently left
    // the middle 5—6—7 stub behind
    val path = (1L until 11L).map(i => (i, i + 1)).toDF("x", "y")
    graft.queries.Graph.kcorePeel(path, 2).count() shouldBe 0L
    // and a core that exists is reached, not peeled through: a cycle
    // is its own 2-core at any cascade depth
    val cycle = ((1L until 8L).map(i => (i, i + 1)) :+ (8L, 1L)).toDF("x", "y")
    val r = graft.queries.Graph.kcorePeel(cycle, 2)
      .as[(Long, Long)].collect().toMap
    r shouldBe (1L to 8L).map(_ -> 2L).toMap
  }

  // -- q139: multi-touch attribution ----------------------------------

  test("q139: linear split, exact-24h boundary in, same-instant out, T=0 visible") {
    val dir = tmpDir("mta")
    writeEvents(dir, Seq(
      (1L, "2024-01-01 00:00:00", 7L, "view", 0.0), // exactly 24 h before → in
      (2L, "2024-01-01 23:00:00", 7L, "click", 0.0),
      (3L, "2024-01-02 00:00:00", 7L, "view", 0.0), // same µs as purchase → out
      (4L, "2024-01-02 00:00:00", 7L, "purchase", 100.00),
      (5L, "2024-01-05 00:00:00", 7L, "purchase", 50.00), // nothing trailing
      (6L, "2024-01-01 00:00:00", 8L, "error", 1.0))) // wrong type+user
    val r = graft.queries.EventAnalytics.q139MultiTouch(spark, dir)
      .select("purchase_id", "nv", "nc", "n_touches", "credit_view_e2", "credit_click_e2")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> t).toMap
    // purchase 4: one view (the boundary one), one click → 5000/5000
    r(4L) shouldBe ((4L, 1L, 1L, 2L, 5000L, 5000L))
    // purchase 5: unattributed
    r(5L) shouldBe ((5L, 0L, 0L, 0L, 0L, 0L))
  }

  // -- q140: quantile normalization -----------------------------------

  test("q140: same centile across sources maps to the cross-source mean rep") {
    val dir = tmpDir("qn")
    // srcA lengths 10..40, srcB 100..400: with 4 docs per source each
    // doc is its own centile bucket; target(centile of the i-th doc)
    // = (10i + 100i) div 2 = 55i
    val rows =
      (1 to 4).map(i => (i.toLong, s"a$i", "en", "srcA", 10L * i)) ++
        (1 to 4).map(i => (10L + i, s"b$i", "en", "srcB", 100L * i))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = graft.queries.Profiling.q140QuantileNormalize(spark, dir)
      .select("doc_id", "n_chars", "norm_chars", "n_sources")
      .as[(Long, Long, Long, Long)].collect().map(t => t._1 -> t).toMap
    r.values.foreach(_._4 shouldBe 2L)
    r(1L)._3 shouldBe 55L // (10 + 100) / 2
    r(11L)._3 shouldBe 55L // same centile, same target
    r(4L)._3 shouldBe 220L // (40 + 400) / 2
    r(14L)._3 shouldBe 220L
  }

  // -- q141: Wilson conversion ----------------------------------------

  test("q141: week-1 cohort, post-week conversion, Wilson LB from exact counts") {
    val dir = tmpDir("wilson")
    writeEvents(dir, Seq(
      (1L, "2024-01-01 00:00:00", 1L, "view", 0.0), // cohort: view {1,2}
      (2L, "2024-01-02 00:00:00", 2L, "view", 0.0),
      (3L, "2024-01-03 00:00:00", 2L, "purchase", 5.0), // week-1 purchase: cohort, NOT conversion
      (4L, "2024-01-10 00:00:00", 1L, "purchase", 9.0))) // converts user 1
    val r = graft.queries.EventAnalytics.q141WilsonConversion(spark, dir)
      .select("event_type", "n_cohort", "n_converted", "cvr_ppm", "wilson_lb_e6")
      .as[(String, Long, Long, Long, Long)].collect().map(t => t._1 -> t).toMap
    r("view")._2 shouldBe 2L
    r("view")._3 shouldBe 1L
    r("view")._4 shouldBe 500000L
    val lb = (0.5 + 3.8416 / (2 * 2) - 1.96 * math.sqrt(
      (0.5 * (1 - 0.5) + 3.8416 / (4.0 * 2 * 2)) / 2)) / (1 + 3.8416 / 2)
    r("view")._5 shouldBe math.round(lb * 1000000)
    // the week-1 purchaser (user 2) is a purchase-type cohort of 1
    // with zero conversions
    r("purchase")._2 shouldBe 1L
    r("purchase")._3 shouldBe 0L
  }

  // -- q143: incremental join view -------------------------------------

  test("q143: the A∆⋈B∆ cross term lands in the folded view") {
    val dir = tmpDir("ijv")
    Seq((0L, "NEW")).toDF("n_nationkey", "n_name")
      .withColumn("n_regionkey", lit(0L))
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    // customer 7 is a DELTA customer (7 % 7 == 0); order 10 a DELTA
    // order (10 % 10 == 0): their revenue exists ONLY in the A∆⋈B∆
    // term — a fold that dropped it would lose these 123.00
    Seq((7L, 0L), (1L, 0L)).toDF("c_custkey", "c_nationkey")
      .withColumn("c_name", lit("c")).withColumn("c_mktsegment", lit("S"))
      .withColumn("c_acctbal", lit(0.0))
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((10L, 7L, 123.00), (11L, 1L, 1000.00))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .withColumn("o_orderstatus", lit("F"))
      .withColumn("o_orderdate", lit(java.sql.Timestamp.valueOf("2024-06-01 00:00:00")))
      .withColumn("o_orderpriority", lit("1-URGENT"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = graft.queries.Analytics.q143IncrementalJoinView(spark, dir)
      .select("n_name", "order_year", "revenue_e2", "n_orders")
      .as[(String, Long, Long, Long)].collect()
    r.toSeq shouldBe Seq(("NEW", 2024L, 112300L, 2L))
  }

  // -- q144: survivorship ----------------------------------------------

  test("q144: transitive chain merges to one golden record; singletons absent") {
    val dir = tmpDir("surv")
    Seq(
      (1L, "alpha beta", "B1", 30.00, 5),
      (2L, "alpha beta gamma", "B1", 10.00, 9),
      (3L, "beta gamma", "B1", 20.00, 7),
      (4L, "zzz unrelated", "B1", 1.00, 1))
      .toDF("p_partkey", "p_name", "p_brand", "p_retailprice", "p_size")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val r = graft.queries.NearDup.q144Survivorship(spark, dir)
      .select("cluster_id", "n_members", "golden_name", "min_price_e2", "max_size")
      .as[(Long, Long, String, Long, Long)].collect()
    r.toSeq shouldBe Seq((1L, 3L, "alpha beta gamma", 1000L, 9L))
  }

  // -- q145: balanced downsampling --------------------------------------

  test("q145: every class lands exactly at the minority count") {
    val dir = tmpDir("balance")
    val rows = (1 to 7).map(i => (i.toLong, Array(0.1f), 0)) ++
      (11 to 13).map(i => (i.toLong, Array(0.2f), 1)) ++
      (21 to 25).map(i => (i.toLong, Array(0.3f), 2))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val r = graft.queries.Curation.q145BalancedDownsample(spark, dir)
      .select("label", "vec_id").as[(Long, Long)].collect()
    r.groupBy(_._1).view.mapValues(_.length).toMap shouldBe
      Map(0L -> 3, 1L -> 3, 2L -> 3)
    // the minority class keeps everything
    r.filter(_._1 == 1L).map(_._2).toSet shouldBe Set(11L, 12L, 13L)
  }

  // -- q148/q149: lift and AUC -----------------------------------------

  test("q148: deciles of a clean separator double the base rate up top") {
    val dir = tmpDir("lift")
    // 10 docs, lengths 10..100; English iff length > 50 (5 of 10)
    (1 to 10).map(i => (i.toLong, s"t$i", if (i > 5) "en" else "fr", "s0", 10L * i))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = graft.queries.Profiling.q148DecileLift(spark, dir)
      .select("decile", "n_pos", "lift_e6", "cum_capture_e6")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // top decile: 1 doc, positive → lift = (1·10)/(1·5) = 2.0
    r.head shouldBe ((1L, 1L, 2000000L, 200000L))
    // all positives captured by decile 5
    r(4)._4 shouldBe 1000000L
    r.last._2 shouldBe 0L
  }

  test("q149: perfect separation → 1.0; fully tied → exactly 0.5") {
    val dir = tmpDir("auc")
    val rows = Seq(
      // sep: both positives outrank both negatives
      (1L, "sep", "en", 200L), (2L, "sep", "en", 100L),
      (3L, "sep", "fr", 20L), (4L, "sep", "fr", 10L),
      // tied: identical scores → tie-corrected AUC is exactly 1/2
      (11L, "tied", "en", 50L), (12L, "tied", "fr", 50L))
      .map { case (id, src, lang, n) => (id, s"t$id", lang, src, n) }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = graft.queries.Profiling.q149ExactAuc(spark, dir)
      .select("source", "auc_e6").as[(String, Long)].collect().toMap
    r("sep") shouldBe 1000000L
    r("tied") shouldBe 500000L
  }

  // -- q150: trend slope ------------------------------------------------

  test("q150: a perfect +1/day ramp fits slope 1 with r² = 1") {
    val dir = tmpDir("trend")
    val rows = (1 to 4).flatMap { day =>
      (1 to day).map(k => ((day * 10 + k).toLong, f"2024-02-0$day 0$k:00:00", 1L, "ramp", 1.0))
    }
    writeEvents(dir, rows)
    val r = graft.queries.EventAnalytics.q150TrendSlope(spark, dir)
      .select("n_days", "slope_e6", "r2_e6").as[(Long, Long, Long)].head()
    r shouldBe ((4L, 1000000L, 1000000L))
  }

  // -- q151/q152: Spearman + association rules --------------------------

  test("q151: monotone → +1, reversed → −1, exactly") {
    val dir = tmpDir("rho")
    Seq((0L, "MONO"), (1L, "REV")).toDF("n_nationkey", "n_name")
      .withColumn("n_regionkey", lit(0L))
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    (Seq((1L, 0L, 10.0), (2L, 0L, 20.0), (3L, 0L, 30.0),
      (11L, 1L, 10.0), (12L, 1L, 20.0), (13L, 1L, 30.0)))
      .toDF("c_custkey", "c_nationkey", "c_acctbal")
      .withColumn("c_name", lit("c")).withColumn("c_mktsegment", lit("S"))
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    // MONO spends rise with balance; REV spends fall
    Seq((1L, 1L, 100.0), (2L, 2L, 200.0), (3L, 3L, 300.0),
      (11L, 11L, 300.0), (12L, 12L, 200.0), (13L, 13L, 100.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .withColumn("o_orderstatus", lit("F"))
      .withColumn("o_orderdate", lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .withColumn("o_orderpriority", lit("1-URGENT"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = graft.queries.Analytics.q151SpearmanRho(spark, dir)
      .select("n_name", "rho_e6").as[(String, Long)].collect().toMap
    r("MONO") shouldBe 1000000L
    r("REV") shouldBe -1000000L
  }

  test("q152: directed confidence is asymmetric, lift is not") {
    val dir = tmpDir("rules")
    // orders: {1,2}, {1,2}, {1,3}, {1}: only (1,2) reaches support 2
    Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (3L, 1L), (3L, 3L), (4L, 1L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = graft.queries.Analytics.q152AssociationRules(spark, dir)
      .select("a", "b", "confidence_ppm", "lift_ppm")
      .as[(Long, Long, Long, Long)].collect().map(t => (t._1, t._2) -> t).toMap
    r.keySet shouldBe Set((1L, 2L), (2L, 1L))
    r((1L, 2L))._3 shouldBe 500000L // 2 of item-1's 4 orders
    r((2L, 1L))._3 shouldBe 1000000L // every item-2 order has item 1
    r.values.map(_._4).toSet shouldBe Set(1000000L) // lift symmetric: 2·4/(4·2)
  }

  // -- q153: native gear-hash boundaries --------------------------------

  test("q153 GearBoundaries: matches a from-scratch fold; boundaries re-align after a prefix") {
    import graft.functions.{GearFunctions, GearHash}
    import org.apache.spark.unsafe.types.UTF8String
    // independent brute-force restatement of the definition
    def brute(s: String): Seq[Long] = {
      val cps = s.codePoints().toArray
      (1 to cps.length).flatMap { i =>
        if (i < 8) None
        else {
          val h = (0 until 8).map { k =>
            GearHash.GTable(cps(i - 1 - k) % 256) << k
          }.sum
          if (h % 64 == 0) Some(i.toLong) else None
        }
      }
    }
    val text = "the quick brown fox jumps over the lazy dog " * 8
    val got = GearHash.compute(UTF8String.fromString(text)).toLongArray.toSeq
    got shouldBe brute(text)
    got should not be empty

    // CONTENT-DEFINED property: after an inserted prefix, boundaries
    // past the 8-char junction window are the same positions shifted
    // by the prefix length — fixed-stride chunking has no such
    // re-alignment
    val prefix = "INSERTED-PREFIX-123 "
    val shifted = GearHash.compute(UTF8String.fromString(prefix + text))
      .toLongArray.toSeq
    val junction = prefix.length + 8
    shifted.filter(_ > junction).map(_ - prefix.length) shouldBe
      got.filter(_ > 8)

    // the registered function runs the same scan through codegen
    GearFunctions.register(spark)
    val viaSql = Seq(text).toDF("text")
      .select(explode(GearFunctions.gearBoundaries(col("text"))).as("pos"))
      .as[Long].collect().toSeq
    viaSql shouldBe got
  }

  // -- q154: mix repair rates -------------------------------------------

  test("q154: over-represented class is throttled, under-represented capped at 1") {
    val dir = tmpDir("mixfix")
    val rows = (1 to 8).map(i => (i, "srcA", "en")) ++ (9 to 10).map(i => (i, "srcA", "fr")) ++
      (11 to 12).map(i => (i, "srcB", "en")) ++ (13 to 20).map(i => (i, "srcB", "fr"))
    rows.map { case (i, s0, l) => (i.toLong, s"t$i", l, s0, 5L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = graft.queries.Curation.q154MixRepairRates(spark, dir)
      .select("source", "lang", "rate_ppm", "n_kept")
      .as[(String, String, Long, Long)].collect()
      .map(t => (t._1, t._2) -> (t._3, t._4)).toMap
    // corpus is 50/50; srcA is 80% en → en throttled to 5/8, fr capped
    r(("srcA", "en")) shouldBe ((625000L, 5L))
    r(("srcA", "fr")) shouldBe ((1000000L, 2L))
    r(("srcB", "fr")) shouldBe ((625000L, 5L))
  }

  // -- q155: lagged cross-correlation -----------------------------------

  test("q155: a 2-day click→purchase echo wins the lag scan with r = 1") {
    val dir = tmpDir("xcorr")
    val clicks = (1 to 5).flatMap { day =>
      (1 to day).map(k => ((day * 100 + k).toLong, f"2024-03-0$day 0$k:00:00", 1L, "click", 0.0))
    }
    val purchases = (3 to 7).flatMap { day =>
      (1 to (day - 2)).map(k => ((day * 1000 + k).toLong, f"2024-03-0$day 1$k:00:00", 1L, "purchase", 0.0))
    }
    writeEvents(dir, clicks ++ purchases)
    val r = graft.queries.EventAnalytics.q155LaggedXcorr(spark, dir)
      .select("lag", "r_e6", "is_best_lag")
      .as[(Long, Option[Long], Boolean)].collect().map(t => t._1 -> t).toMap
    r(2L)._2 shouldBe Some(1000000L)
    r(2L)._3 shouldBe true
    r.filter(_._1 != 2L).values.forall(!_._3) shouldBe true
  }

  // -- q156/q157: ABC classes + robust trend ----------------------------

  test("q156: the 80% crosser stays in A; textbook 80/15/5 split") {
    val dir = tmpDir("abc")
    Seq((0L, "N")).toDF("n_nationkey", "n_name")
      .withColumn("n_regionkey", lit(0L))
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    Seq((1L, 0L), (2L, 0L), (3L, 0L)).toDF("c_custkey", "c_nationkey")
      .withColumn("c_name", lit("c")).withColumn("c_mktsegment", lit("S"))
      .withColumn("c_acctbal", lit(0.0))
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((1L, 1L, 80.0), (2L, 2L, 15.0), (3L, 3L, 5.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .withColumn("o_orderstatus", lit("F"))
      .withColumn("o_orderdate", lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .withColumn("o_orderpriority", lit("1-URGENT"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = graft.queries.Analytics.q156AbcClasses(spark, dir)
      .select("o_custkey", "abc_class").as[(Long, String)].collect().toMap
    r shouldBe Map(1L -> "A", 2L -> "B", 3L -> "C")
  }

  test("q157: a spike day cannot drag the median delta") {
    val dir = tmpDir("rtrend")
    // counts 1,2,3,10 → deltas 1,1,7 → median 1.0, MAD 0.0 (the OLS
    // slope over the same series is ~2.8 — the robustness gap)
    val rows = Seq(1, 2, 3, 10).zipWithIndex.flatMap { case (n, di) =>
      (1 to n).map(k => ((di * 100 + k).toLong, f"2024-04-0${di + 1} 0${k % 10}:0$k:00", 1L, "load", 1.0))
    }
    writeEvents(dir, rows)
    val r = graft.queries.Analytics.q157RobustTrend(spark, dir)
      .select("n_deltas", "med_delta", "mad_delta")
      .as[(Long, Double, Double)].head()
    r shouldBe ((3L, 1.0, 0.0))
  }

  // -- q147: video container ------------------------------------------

  test("VideoContainer: pack/parse round trip, stride sampling, loud demux failures") {
    import graft.multimodal.VideoContainer
    val frames = Seq(Array[Byte](1, 2, 3), Array[Byte](), Array[Byte](9), Array[Byte](7, 7))
    val c = VideoContainer.pack(frames)
    val parsed = VideoContainer.parse(c)
    parsed.map(_.idx) shouldBe Seq(0, 1, 2, 3)
    parsed.map(_.bytes.toSeq) shouldBe frames.map(_.toSeq)
    VideoContainer.sampleFrames(c, 2).map(_.idx) shouldBe Seq(0, 2)
    VideoContainer.sampleFrames(c, 3).map(_.idx) shouldBe Seq(0, 3)
    // truncated payload and corrupt magic both refuse, never yield junk
    an[IllegalArgumentException] should be thrownBy
      VideoContainer.parse(c.dropRight(1))
    val bad = c.clone(); bad(0) = 'X'
    an[IllegalArgumentException] should be thrownBy VideoContainer.parse(bad)
  }

  // -- q142: PCM audio path -------------------------------------------

  test("PcmAudio: S16LE round trip over the full int16 range; odd tail dropped") {
    import graft.multimodal.PcmAudio
    val samples = Array(-1000, 0, 1000, -32768, 32767, 5)
    PcmAudio.decodeS16LE(PcmAudio.encodeS16LE(samples)).toSeq shouldBe samples.toSeq
    // a truncated trailing byte is not half a sample
    PcmAudio.decodeS16LE(PcmAudio.encodeS16LE(samples) :+ 0x7f.toByte)
      .toSeq shouldBe samples.toSeq
  }

  test("PcmAudio.frameStats: exact sums, peaks, and within-frame-only crossings") {
    import graft.multimodal.PcmAudio
    val fs = PcmAudio.frameStats(9L, Array(-3, -1, 2, 4, -5), 4).toSeq
    fs.map(f => (f.frame_idx, f.n_samples, f.sumsq, f.peak_abs, f.zero_cross)) shouldBe
      Seq((0, 4, 30L, 4, 1), (1, 1, 25L, 5, 0)) // the 4 → −5 boundary flip is NOT counted
  }
}
