package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Round-13 pins: the r12 ADVICE fixes (survival censoring rule on the
  * purchase-before-AND-after-view case, RMST degenerate-curve
  * coalesce, q246 decimal tie term, q258 restructured chi-square) and
  * the two de-watch-graded rank rewrites (q255 distributed decile ≡
  * ntile, q249 distributed rank ≡ the direct window), plus the new
  * q259 per-arm KM fixture.
  */
class Round13OpsSpec extends SparkSpec {
  import spark.implicits._

  private def writeEvents(dir: String,
      rows: Seq[(Long, Long, String, Double, String)]): Unit =
    rows.toDF("event_id", "user_id", "event_type", "value", "ts")
      .withColumn("ts", to_timestamp(col("ts")))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

  private def writeDocs(dir: String,
      rows: Seq[(Long, String, String, String, Long)]): Unit =
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

  // -- survival censoring rule (r12 ADVICE, medium) ----------------------

  test("survival: purchase BEFORE and AFTER first view is still censored") {
    // The documented bounded-mergeable-state rule: the user's EARLIEST
    // purchase (d1) precedes the first view (d2), so the later
    // purchase (d5) does NOT convert them — censored at le - fv = 3.
    val dir = tmpDir("surv-both")
    writeEvents(dir, Seq(
      (1L, 9L, "purchase", 1.0, "2024-01-01 01:00:00"),
      (2L, 9L, "view", 1.0, "2024-01-02 01:00:00"),
      (3L, 9L, "purchase", 1.0, "2024-01-05 01:00:00")))
    // no conversion anywhere -> the KM event table is EMPTY
    graft.queries.EventAnalytics.q254KaplanMeier(spark, dir)
      .collect() shouldBe empty
    // ...and q257 exercises the degenerate-curve coalesce on the real
    // query path: S ≡ 1 on [0, tau] -> RMST = tau exactly, median NULL
    val r = graft.queries.EventAnalytics.q257Rmst(spark, dir).collect()
    r should have length 1
    r(0).getLong(r(0).fieldIndex("tau_days")) shouldBe 30L
    r(0).getLong(r(0).fieldIndex("rmst_e9_days")) shouldBe 30000000000L
    r(0).isNullAt(r(0).fieldIndex("median_day")) shouldBe true
  }

  test("rmstFinalize coalesces the empty curve to tau, not NULL") {
    val empty = Seq.empty[(Long, Long, Long, Long, Long)]
      .toDF("day", "n_risk", "d_conv", "n_censored", "surv_e9")
    val r = graft.queries.EventAnalytics.rmstFinalize(empty).collect()
    r should have length 1
    r(0).getLong(0) shouldBe 30L
    r(0).getLong(1) shouldBe 30000000000L
    r(0).isNullAt(2) shouldBe true
  }

  // -- q259: per-arm Kaplan–Meier ----------------------------------------

  test("q259 hand fixture: independent folds per arm, arm as BIGINT") {
    val dir = tmpDir("q259fix")
    writeEvents(dir, Seq(
      // treat u1 (odd): view d1, purchase d3 -> event dur 2
      (1L, 1L, "view", 1.0, "2024-01-01 01:00:00"),
      (2L, 1L, "purchase", 1.0, "2024-01-03 01:00:00"),
      // treat u3: view d2, purchase d2 -> event dur 0
      (3L, 3L, "view", 1.0, "2024-01-02 03:00:00"),
      (4L, 3L, "purchase", 1.0, "2024-01-02 04:00:00"),
      // control u2 (even): view d1, purchase d5 -> event dur 4
      (5L, 2L, "view", 1.0, "2024-01-01 02:00:00"),
      (6L, 2L, "purchase", 1.0, "2024-01-05 02:00:00"),
      // control u4: purchase d1 BEFORE view d2 -> censored dur 0
      (7L, 4L, "purchase", 1.0, "2024-01-01 05:00:00"),
      (8L, 4L, "view", 1.0, "2024-01-02 06:00:00")))
    val rows = graft.queries.EventAnalytics.q259KmByArm(spark, dir)
      .collect()
      .map(r => (r.getLong(r.fieldIndex("arm")),
        r.getLong(r.fieldIndex("day"))) -> r).toMap
    rows.keySet shouldBe Set((1L, 0L), (1L, 2L), (0L, 4L))
    // treat arm: 2 at risk at day 0 (1 converts), 1 at day 2
    val t0 = rows((1L, 0L))
    t0.getLong(t0.fieldIndex("n_risk")) shouldBe 2L
    t0.getLong(t0.fieldIndex("surv_e9")) shouldBe 500000000L
    val t2 = rows((1L, 2L))
    t2.getLong(t2.fieldIndex("n_risk")) shouldBe 1L
    t2.getLong(t2.fieldIndex("surv_e9")) shouldBe 0L
    // control arm: u4 censored at day 0 leaves the risk set; u2
    // converts alone at day 4 on ITS OWN arm's risk set of 1
    val c4 = rows((0L, 4L))
    c4.getLong(c4.fieldIndex("n_risk")) shouldBe 1L
    c4.getLong(c4.fieldIndex("d_conv")) shouldBe 1L
    c4.getLong(c4.fieldIndex("surv_e9")) shouldBe 0L
  }

  test("q259 at sf0.001: per-arm curves are non-increasing, pooled q254 sits between") {
    val sf = "/root/testdata/sf0.001"
    val byArm = graft.queries.EventAnalytics.q259KmByArm(spark, sf)
      .collect().groupBy(_.getLong(0))
    byArm.keySet shouldBe Set(0L, 1L)
    byArm.values.foreach { rows =>
      rows.sortBy(_.getLong(1)).sliding(2).foreach {
        case Array(a, b) =>
          a.getLong(a.fieldIndex("surv_e9")) should be >=
            b.getLong(b.fieldIndex("surv_e9"))
        case _ =>
      }
    }
    // arm risk sets partition the pooled risk set on shared event days
    val pooled = graft.queries.EventAnalytics.q254KaplanMeier(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(r.fieldIndex("n_risk")))
      .toMap
    val armRisk = byArm.values.flatten
      .groupBy(_.getLong(1)).view
      .mapValues(_.map(r => r.getLong(r.fieldIndex("n_risk"))).sum)
    armRisk.foreach { case (day, n) =>
      if (pooled.contains(day)) n should be <= pooled(day)
    }
  }

  // -- q260: per-arm RMST + difference -------------------------------------

  test("q260 hand fixture: per-arm integrals, diff, eventless arm reads tau") {
    // treat u1: view d1, purchase d3 (event dur 2) -> curve S(2)=0,
    // RMST_1 = 2 days exactly; control u2: view d1, last d5, NO
    // purchase -> at risk, eventless -> RMST_0 = tau = 30
    val dir = tmpDir("q260fix")
    writeEvents(dir, Seq(
      (1L, 1L, "view", 1.0, "2024-01-01 01:00:00"),
      (2L, 1L, "purchase", 1.0, "2024-01-03 01:00:00"),
      (3L, 2L, "view", 1.0, "2024-01-01 02:00:00"),
      (4L, 2L, "view", 1.0, "2024-01-05 02:00:00")))
    val r = graft.queries.EventAnalytics.q260RmstByArm(spark, dir).collect()
    r should have length 1
    val row = r.head
    row.getLong(row.fieldIndex("tau_days")) shouldBe 30L
    row.getLong(row.fieldIndex("n0_at_risk")) shouldBe 1L
    row.getLong(row.fieldIndex("n1_at_risk")) shouldBe 1L
    row.getLong(row.fieldIndex("rmst0_e9_days")) shouldBe 30000000000L
    row.getLong(row.fieldIndex("rmst1_e9_days")) shouldBe 2000000000L
    row.getLong(row.fieldIndex("rmst_diff_e9_days")) shouldBe -28000000000L
    row.isNullAt(row.fieldIndex("median0_day")) shouldBe true
    row.getLong(row.fieldIndex("median1_day")) shouldBe 2L
  }

  test("q260 at sf0.001: per-arm RMSTs reconcile with q259's curves") {
    val sf = "/root/testdata/sf0.001"
    val row = graft.queries.EventAnalytics.q260RmstByArm(spark, sf)
      .collect().head
    // independent integration of the q259 curve per arm
    val curves = graft.queries.EventAnalytics.q259KmByArm(spark, sf)
      .collect().groupBy(_.getLong(0))
    def integral(arm: Long): Long = {
      val pts = curves(arm).map(r =>
        r.getLong(r.fieldIndex("day")) ->
          r.getLong(r.fieldIndex("surv_e9"))).sortBy(_._1)
      val tau = 30L
      val first = math.min(pts.head._1, tau)
      val spans = pts.zip(pts.drop(1).map(_._1) :+ tau).map {
        case ((d, s), nd) =>
          math.max(math.min(nd, tau) - math.min(d, tau), 0L) * s
      }
      1000000000L * first + spans.sum
    }
    row.getLong(row.fieldIndex("rmst0_e9_days")) shouldBe integral(0L)
    row.getLong(row.fieldIndex("rmst1_e9_days")) shouldBe integral(1L)
    row.getLong(row.fieldIndex("rmst_diff_e9_days")) shouldBe
      (integral(1L) - integral(0L))
  }

  // -- q264: HITS hubs & authorities ----------------------------------------

  test("q264 at sf0.001: scores equal an independent in-memory HITS restatement") {
    val sf = "/root/testdata/sf0.001"
    val got = graft.queries.Graph.q264Hits(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // independent restatement: collect the tiny edge list, run the
    // same L1-normalized integer half-steps in plain Scala
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_suppkey").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val ord = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_custkey").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val edges = li.flatMap { case (ok, sk) =>
      ord.get(ok).map(ck => (s"s$sk", s"c$ck"))
    }.distinct
    val hubs = edges.map(_._1).distinct
    val h0 = 1000000000L / math.max(hubs.length, 1L)
    def norm(m: Map[String, Long]): Map[String, Long] = {
      val s = math.max(m.values.sum, 1L)
      m.map { case (k, v) => k -> (v * 1000000000L / s) }
    }
    def aStep(h: Map[String, Long]) = norm(
      edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map(e => h(e._1)).sum
      })
    def hStep(a: Map[String, Long]) = norm(
      edges.groupBy(_._1).map { case (s0, es) =>
        s0 -> es.map(e => a(e._2)).sum
      })
    val a1 = aStep(Map.empty[String, Long].withDefaultValue(h0))
    val h1 = hStep(a1); val a2 = aStep(h1); val h2 = hStep(a2)
    got.count(_._1._1 == "hub") shouldBe h2.size
    got.count(_._1._1 == "authority") shouldBe a2.size
    h2.foreach { case (n, v) => got(("hub", n)) shouldBe v }
    a2.foreach { case (n, v) => got(("authority", n)) shouldBe v }
    // L1 normalization: each vector sums to 1e9 minus the floor loss
    val hs = h2.values.sum; val as = a2.values.sum
    hs should be <= 1000000000L
    hs should be > (1000000000L - h2.size.toLong)
    as should be <= 1000000000L
    as should be > (1000000000L - a2.size.toLong)
  }

  // -- q255: distributed decile ≡ ntile ----------------------------------

  private def upliftEvents(users: Seq[(Long, Long)]): Seq[(Long, Long, String, Double, String)] =
    users.zipWithIndex.flatMap { case ((uid, spendCents), i) =>
      // one even-epoch-day spend event per user (2024-01-01 = day
      // 19723, odd; 2024-01-02 = day 19724, even -> 'pre' score day)
      Seq((i * 2L + 1L, uid, "click", spendCents / 100.0, "2024-01-02 01:00:00"),
        (i * 2L + 2L, uid, if (uid % 3 == 0) "purchase" else "view",
          1.0, "2024-01-03 01:00:00"))
    }

  test("q255 distributed decile table equals the direct ntile(10) table") {
    // 23 users (rem=3: deciles 1-3 carry 3 users, 4-10 carry 2),
    // heavy score ties INCLUDING across uid buckets (ids > 2^20), and
    // a zero-score clump — the skew case the bucket leg bounds
    val users = Seq(
      (1L, 900L), (3L, 900L), (1048577L, 900L), (2097153L, 900L),
      (2L, 500L), (4L, 500L), (6L, 500L),
      (5L, 400L), (7L, 300L), (9L, 200L), (11L, 100L),
      (8L, 0L), (10L, 0L), (12L, 0L), (14L, 0L), (1048578L, 0L),
      (2097154L, 0L), (13L, 0L), (15L, 0L), (17L, 0L), (19L, 0L),
      (21L, 0L), (23L, 0L))
    val dir = tmpDir("q255fix")
    writeEvents(dir, upliftEvents(users))
    val got = graft.queries.EventAnalytics.q255UpliftDeciles(spark, dir)
      .collect().map(_.toSeq).toSet
    // direct restatement: the ntile window q255 used before r13
    import org.apache.spark.sql.expressions.Window
    val u = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_type"), col("user_id"),
        (col("user_id") % 2 === 1).as("treat"),
        (datediff(col("ts"), lit("1970-01-01")) % 2 === 0).as("pre"),
        round(col("value") * 100, 0).cast("long").as("v"))
      .groupBy("user_id", "treat")
      .agg(sum(when(col("pre"), col("v")).otherwise(0L)).as("score"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("conv"))
    val wRank = Window.orderBy(col("score").desc, col("user_id"))
    val wCum = Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = u.withColumn("decile", ntile(10).over(wRank).cast("long"))
      .groupBy("decile")
      .agg(sum(when(!col("treat"), 1L).otherwise(0L)).as("n0"),
        sum(when(col("treat"), 1L).otherwise(0L)).as("n1"),
        sum(when(!col("treat"), col("conv")).otherwise(0L)).as("conv0"),
        sum(when(col("treat"), col("conv")).otherwise(0L)).as("conv1"))
      .withColumn("cn0", sum(col("n0")).over(wCum))
      .withColumn("cn1", sum(col("n1")).over(wCum))
      .withColumn("cc0", sum(col("conv0")).over(wCum))
      .withColumn("cc1", sum(col("conv1")).over(wCum))
      .select(col("decile"), col("n0"), col("n1"), col("conv0"), col("conv1"),
        expr("CASE WHEN n0 > 0 THEN conv0 * 1000000 div n0 END").as("rate0_ppm"),
        expr("CASE WHEN n1 > 0 THEN conv1 * 1000000 div n1 END").as("rate1_ppm"),
        expr("""CASE WHEN n0 > 0 AND n1 > 0 THEN
               | conv1 * 1000000 div n1 - conv0 * 1000000 div n0
               | END""".stripMargin).as("uplift_ppm"),
        (col("cc1") * col("cn0") - col("cc0") * col("cn1")).as("qini_x"))
      .collect().map(_.toSeq).toSet
    got shouldBe want
  }

  test("q255 closed-form ntile handles N < 10 (one user per decile)") {
    val users = Seq((1L, 700L), (2L, 600L), (3L, 500L), (4L, 400L),
      (5L, 300L), (6L, 200L), (7L, 100L))
    val dir = tmpDir("q255small")
    writeEvents(dir, upliftEvents(users))
    val deciles = graft.queries.EventAnalytics.q255UpliftDeciles(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(r.fieldIndex("n0")) + r.getLong(r.fieldIndex("n1"))))
      .toMap
    deciles shouldBe (1L to 7L).map(_ -> 1L).toMap
  }

  // -- q249: distributed rank ≡ direct window -----------------------------

  test("q249 distributed rank reproduces the direct per-source window AP") {
    // ties across uid buckets and sources; en/non-en mix
    val docs = (1L to 40L).map { i =>
      val id = if (i % 5 == 0) 2097152L + i else i // some ids in bucket 2
      (id, s"t$i", if (i % 3 == 0) "en" else "de",
        if (i % 2 == 0) "web" else "books",
        (i % 7) * 100L) // heavy n_chars ties
    }
    val dir = tmpDir("q249fix")
    writeDocs(dir, docs)
    val got = graft.queries.Profiling.q249AveragePrecision(spark, dir)
      .collect().map(_.toSeq).toSet
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source")
      .orderBy(col("n_chars").desc, col("doc_id"))
    val want = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("source"), col("doc_id"), col("n_chars"),
        when(col("lang") === "en", 1L).otherwise(0L).as("pos"))
      .withColumn("k", row_number().over(w).cast("long"))
      .withColumn("cum_pos", sum(col("pos")).over(w))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("pos")).as("n_pos"),
        sum(when(col("pos") === 1L,
          expr("cum_pos * 1000000 div k")).otherwise(0L)).as("term_sum"))
      .select(col("source"), col("n_docs"), col("n_pos"),
        expr("CASE WHEN n_pos > 0 THEN term_sum div n_pos END").as("ap_e6"),
        expr("n_pos * 1000000 div n_docs").as("base_e6"))
      .collect().map(_.toSeq).toSet
    got shouldBe want
  }

  // -- q246: decimal tie term --------------------------------------------

  test("q246 tie3 is DOUBLE from the exact decimal; all-tied guard -> NULL z") {
    val dir = tmpDir("q246fix")
    // type 'a': every value identical across both arms -> all-tied,
    // sigma = 0, z NULL; type 'b': two value cells, computable z
    writeEvents(dir, Seq(
      (1L, 1L, "a", 5.0, "2024-01-01 01:00:00"),
      (2L, 2L, "a", 5.0, "2024-01-01 02:00:00"),
      (3L, 3L, "a", 5.0, "2024-01-01 03:00:00"),
      (4L, 4L, "a", 5.0, "2024-01-01 04:00:00"),
      (5L, 1L, "b", 1.0, "2024-01-01 05:00:00"),
      (6L, 2L, "b", 2.0, "2024-01-01 06:00:00"),
      (7L, 3L, "b", 2.0, "2024-01-01 07:00:00"),
      (8L, 4L, "b", 1.0, "2024-01-01 08:00:00")))
    val df = graft.queries.EventAnalytics.q246RankSumTest(spark, dir)
    df.schema("tie3").dataType shouldBe DoubleType
    val rows = df.collect().map(r => r.getString(0) -> r).toMap
    val a = rows("a")
    a.getDouble(a.fieldIndex("tie3")) shouldBe 60.0 // 4^3 - 4, all tied
    a.isNullAt(a.fieldIndex("z_score")) shouldBe true
    val b = rows("b")
    // cells: v=100 (u1 treat? ids 1,3 odd=treat... v100: u1(t),u4(c);
    // v200: u2(c),u3(t)) -> t=2 per cell, tie3 = 2*(8-2) = 12
    b.getDouble(b.fieldIndex("tie3")) shouldBe 12.0
    b.isNullAt(b.fieldIndex("z_score")) shouldBe false
  }

  // -- q261: winsorized means ----------------------------------------------

  test("q261 hand fixture: exact p99 cap, whale capped, raw means diverge") {
    // 100 events at 1.00 + one 500.00 whale (control user 102):
    // N=101, thr=ceil(.99*101)=100 -> cap=100 cents, whale capped
    val dir = tmpDir("q261fix")
    val evs = (1L to 100L).map(i =>
      (i, i, "buy", 1.00, "2024-01-01 01:00:00")) :+
      (101L, 102L, "buy", 500.00, "2024-01-01 02:00:00")
    writeEvents(dir, evs)
    val r = graft.queries.EventAnalytics.q261WinsorizedMeans(spark, dir)
      .collect()
    r should have length 1
    val row = r.head
    row.getLong(row.fieldIndex("n0")) shouldBe 51L // 50 even + whale
    row.getLong(row.fieldIndex("n1")) shouldBe 50L
    row.getLong(row.fieldIndex("cap_cents")) shouldBe 100L
    row.getLong(row.fieldIndex("n_capped")) shouldBe 1L
    row.getLong(row.fieldIndex("wmean0_cents")) shouldBe 100L
    row.getLong(row.fieldIndex("wmean1_cents")) shouldBe 100L
    row.getLong(row.fieldIndex("wdiff_cents")) shouldBe 0L
    // the raw mean is whale-dragged: (50*100 + 50000) div 51 = 1078
    row.getLong(row.fieldIndex("rmean0_cents")) shouldBe 1078L
    row.getLong(row.fieldIndex("rmean1_cents")) shouldBe 100L
  }

  test("q261 at sf0.001: winsorized means never exceed raw, cap touches <=1%") {
    val rows = graft.queries.EventAnalytics
      .q261WinsorizedMeans(spark, "/root/testdata/sf0.001").collect()
    rows should not be empty
    rows.foreach { r =>
      val n = r.getLong(r.fieldIndex("n0")) + r.getLong(r.fieldIndex("n1"))
      r.getLong(r.fieldIndex("wmean0_cents")) should be <=
        r.getLong(r.fieldIndex("rmean0_cents"))
      r.getLong(r.fieldIndex("wmean1_cents")) should be <=
        r.getLong(r.fieldIndex("rmean1_cents"))
      // rank-ceil(.99N) cap: strictly-above-cap count is < 1% + 1
      r.getLong(r.fieldIndex("n_capped")) should be <= (n / 100L + 1L)
    }
  }

  // -- q263: quantile treatment effects -------------------------------------

  test("q263 hand fixture: exact per-arm rank-ceil quantiles and diffs") {
    // control (even uids): 1.00, 2.00, 3.00, 4.00; treat (odd):
    // 11.00, 12.00, 13.00, 14.00 -> per-arm ranks ceil(p*4/100):
    // p25 -> rank 1, p50 -> rank 2, p75 -> rank 3
    val dir = tmpDir("q263fix")
    writeEvents(dir, (1L to 4L).map(i =>
      (i, i * 2L, "buy", i.toDouble, "2024-01-01 01:00:00")) ++
      (1L to 4L).map(i =>
        (4L + i, i * 2L + 1L, "buy", 10.0 + i, "2024-01-01 02:00:00")))
    val rows = graft.queries.EventAnalytics.q263QuantileEffects(spark, dir)
      .collect().map(r => r.getLong(1) -> r).toMap
    rows.keySet shouldBe Set(25L, 50L, 75L)
    def q(p: Long, f: String) = rows(p).getLong(rows(p).fieldIndex(f))
    q(25L, "q0_cents") shouldBe 100L
    q(50L, "q0_cents") shouldBe 200L
    q(75L, "q0_cents") shouldBe 300L
    q(25L, "q1_cents") shouldBe 1100L
    q(50L, "q1_cents") shouldBe 1200L
    q(75L, "q1_cents") shouldBe 1300L
    Seq(25L, 50L, 75L).foreach { p =>
      q(p, "qte_cents") shouldBe (q(p, "q1_cents") - q(p, "q0_cents"))
    }
  }

  test("q263 at sf0.001: quantiles are monotone in p and live in each arm's support") {
    val rows = graft.queries.EventAnalytics
      .q263QuantileEffects(spark, "/root/testdata/sf0.001").collect()
    rows should not be empty
    rows.groupBy(_.getString(0)).values.foreach { g =>
      val byP = g.sortBy(_.getLong(1))
      byP.map(r => r.getLong(r.fieldIndex("q0_cents"))) shouldBe
        byP.map(r => r.getLong(r.fieldIndex("q0_cents"))).sorted
      byP.map(r => r.getLong(r.fieldIndex("q1_cents"))) shouldBe
        byP.map(r => r.getLong(r.fieldIndex("q1_cents"))).sorted
    }
  }

  // -- q262: Schoenfeld events ladder ---------------------------------------

  test("q262 hand fixture: d = zsq/(p(1-p)ln2HR) under the exact ceil") {
    // 4 at-risk users (2 treat, 2 control), 1 conversion
    val dir = tmpDir("q262fix")
    writeEvents(dir, Seq(
      (1L, 1L, "view", 1.0, "2024-01-01 01:00:00"),
      (2L, 1L, "purchase", 1.0, "2024-01-02 01:00:00"),
      (3L, 2L, "view", 1.0, "2024-01-01 02:00:00"),
      (4L, 3L, "view", 1.0, "2024-01-01 03:00:00"),
      (5L, 4L, "view", 1.0, "2024-01-01 04:00:00")))
    val rows = graft.queries.EventAnalytics.q262SchoenfeldLadder(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    rows.keySet shouldBe Set(50L, 70L, 80L, 90L)
    rows.values.foreach { r =>
      r.getLong(r.fieldIndex("n_risk_users")) shouldBe 4L
      r.getLong(r.fieldIndex("events_observed")) shouldBe 1L
      r.getLong(r.fieldIndex("enough")) shouldBe 0L
    }
    // independent restatement of the fixed IEEE shape per rung
    graft.queries.EventAnalytics.SchoenfeldHrX100.foreach { hr =>
      val lnSq = { val l = math.log(hr.toDouble / 100.0); l * l }
      val pTerm = 2.0 * (4L - 2L) / (4.0 * 4L)
      val want = math.ceil(
        graft.queries.EventAnalytics.SchoenfeldZSq / (pTerm * lnSq)).toLong
      rows(hr).getLong(rows(hr).fieldIndex("events_needed")) shouldBe want
    }
    // monotone: smaller effect -> more events needed
    val need = Seq(50L, 70L, 80L, 90L)
      .map(hr => rows(hr).getLong(rows(hr).fieldIndex("events_needed")))
    need shouldBe need.sorted
  }

  // -- q258: restructured chi-square --------------------------------------

  test("q258 split-division chi2 and widened flag match the exact forms") {
    // u0=8 even-id users, u1=2 odd-id users, one event each:
    // diff^2=36, chi2 = 36*1e6 div 10 = 3600000; flag: 1000*36=36000
    // <= 3841*10=38410 -> 0 (boundary just below critical)
    val dir = tmpDir("q258fix")
    val evs = (1L to 10L).map { i =>
      val uid = if (i <= 8) i * 2L else i * 2L + 1L // 8 even, 2 odd
      (i, uid, "click", 1.0, "2024-01-01 01:00:00")
    } ++ Seq( // second type: u0=9, u1=2 -> 49 > (3841*11 div 1000)=42 -> flag 1
      (11L to 21L).map { i =>
        val uid = if (i <= 19) i * 2L else i * 2L + 1L // 9 even, 2 odd
        (i, uid, "view", 1.0, "2024-01-01 02:00:00")
      }: _*)
    writeEvents(dir, evs)
    val rows = graft.queries.EventAnalytics.q258SrmCheck(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    val c = rows("click")
    c.getLong(c.fieldIndex("chi2_user_ppm")) shouldBe 3600000L
    c.getLong(c.fieldIndex("srm_flag")) shouldBe 0L
    val v = rows("view")
    v.getLong(v.fieldIndex("chi2_user_ppm")) shouldBe (49L * 1000000L / 11L)
    v.getLong(v.fieldIndex("srm_flag")) shouldBe 1L
  }
}
