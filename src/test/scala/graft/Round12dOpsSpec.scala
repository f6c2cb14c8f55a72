package graft

import org.apache.spark.sql.functions._

/** Fixture pins for the round-12d pair: the Kaplan–Meier
  * time-to-conversion curve (q254) and the uplift/Qini decile table
  * (q255) — hand-computed fixtures covering the censoring and
  * truncating-product edges, plus identities at sf0.001.
  */
class Round12dOpsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def writeEvents(dir: String,
      rows: Seq[(Long, Long, String, Double, String)]): Unit =
    rows.toDF("event_id", "user_id", "event_type", "value", "ts")
      .withColumn("ts", to_timestamp(col("ts")))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

  // -- q254: Kaplan–Meier ----------------------------------------------------

  test("q254 hand fixture: censoring, same-day conversion, pre-view purchase") {
    val dir = tmpDir("q254fix")
    writeEvents(dir, Seq(
      // u1: view d1, purchase d3 -> event, dur 2
      (1L, 1L, "view", 1.0, "2024-01-01 01:00:00"),
      (2L, 1L, "purchase", 1.0, "2024-01-03 01:00:00"),
      // u2: view d1, last seen d5 -> censored, dur 4
      (3L, 2L, "view", 1.0, "2024-01-01 02:00:00"),
      (4L, 2L, "view", 1.0, "2024-01-05 02:00:00"),
      // u3: view d2, purchase d2 -> event, dur 0
      (5L, 3L, "view", 1.0, "2024-01-02 03:00:00"),
      (6L, 3L, "purchase", 1.0, "2024-01-02 04:00:00"),
      // u4: purchase d1 BEFORE first view d2 -> censored at dur 0
      (7L, 4L, "purchase", 1.0, "2024-01-01 05:00:00"),
      (8L, 4L, "view", 1.0, "2024-01-02 06:00:00")))
    val rows = graft.queries.EventAnalytics.q254KaplanMeier(spark, dir)
      .collect().map(r => r.getLong(r.fieldIndex("day")) -> r).toMap
    rows.keySet shouldBe Set(0L, 2L)
    val d0 = rows(0L)
    d0.getLong(d0.fieldIndex("n_risk")) shouldBe 4L
    d0.getLong(d0.fieldIndex("d_conv")) shouldBe 1L
    d0.getLong(d0.fieldIndex("n_censored")) shouldBe 1L
    d0.getLong(d0.fieldIndex("surv_e9")) shouldBe 750000000L // 1e9*3 div 4
    val d2 = rows(2L)
    d2.getLong(d2.fieldIndex("n_risk")) shouldBe 2L
    d2.getLong(d2.fieldIndex("d_conv")) shouldBe 1L
    d2.getLong(d2.fieldIndex("n_censored")) shouldBe 0L
    d2.getLong(d2.fieldIndex("surv_e9")) shouldBe 375000000L // 750e6*1 div 2
  }

  test("q254 at sf0.001: survival is non-increasing, risk set shrinks") {
    val rows = graft.queries.EventAnalytics.q254KaplanMeier(spark, sf)
      .collect().sortBy(_.getLong(0))
    rows should not be empty
    rows.sliding(2).foreach {
      case Array(a, b) =>
        a.getLong(a.fieldIndex("surv_e9")) should be >=
          b.getLong(b.fieldIndex("surv_e9"))
        a.getLong(a.fieldIndex("n_risk")) should be >
          b.getLong(b.fieldIndex("n_risk"))
      case _ =>
    }
    rows.foreach { r =>
      val s = r.getLong(r.fieldIndex("surv_e9"))
      s should be > 0L
      s should be <= 1000000000L
      r.getLong(r.fieldIndex("d_conv")) should be > 0L
      r.getLong(r.fieldIndex("n_risk")) should be >=
        r.getLong(r.fieldIndex("d_conv"))
    }
  }

  // -- q256: log-rank test ---------------------------------------------------

  test("q256 hand fixture: per-day hypergeometric terms, quantized then summed") {
    val dir = tmpDir("q256fix")
    writeEvents(dir, Seq(
      // treat u1: view d1, purchase d2 (event dur 1)
      (1L, 1L, "view", 1.0, "2024-01-01 01:00:00"),
      (2L, 1L, "purchase", 1.0, "2024-01-02 01:00:00"),
      // control u2: view d1, purchase d3 (event dur 2)
      (3L, 2L, "view", 1.0, "2024-01-01 02:00:00"),
      (4L, 2L, "purchase", 1.0, "2024-01-03 02:00:00"),
      // treat u3 / control u4: censored at dur 3
      (5L, 3L, "view", 1.0, "2024-01-01 03:00:00"),
      (6L, 3L, "view", 1.0, "2024-01-04 03:00:00"),
      (7L, 4L, "view", 1.0, "2024-01-01 04:00:00"),
      (8L, 4L, "view", 1.0, "2024-01-04 04:00:00")))
    val r = graft.queries.EventAnalytics.q256LogRank(spark, dir).collect()
    r.length shouldBe 1
    val row = r.head
    row.getLong(row.fieldIndex("n_event_days")) shouldBe 2L
    row.getLong(row.fieldIndex("o1")) shouldBe 1L
    // day1: U = 1 - 1*2/4 = 0.5; day2: U = 0 - 1*1/3
    row.getLong(row.fieldIndex("u_e9")) shouldBe 500000000L - 333333333L
    // day1: V = (2/4)(2/4)(3/3) = 0.25; day2: V = (1/3)(2/3)(2/2) = 2/9
    row.getLong(row.fieldIndex("v_e9")) shouldBe 250000000L + 222222222L
    row.getLong(row.fieldIndex("e1_e9")) shouldBe 500000000L + 333333333L
    val z = row.getDouble(row.fieldIndex("z_logrank"))
    z shouldBe (166666667.0 / math.sqrt(472222222.0 * 1e9)) +- 1e-12
  }

  test("q256 at sf0.001: O - E reconciles with U within the per-day ulp budget") {
    val r = graft.queries.EventAnalytics.q256LogRank(spark, sf).collect().head
    val o1 = r.getLong(r.fieldIndex("o1"))
    val e1 = r.getLong(r.fieldIndex("e1_e9"))
    val u = r.getLong(r.fieldIndex("u_e9"))
    val days = r.getLong(r.fieldIndex("n_event_days"))
    // U = O - E exactly before quantization; each day rounds both
    // terms once, so the folded sums agree to <= 1 ulp per event day
    math.abs(u - (o1 * 1000000000L - e1)) should be <= days
    r.getLong(r.fieldIndex("v_e9")) should be > 0L
  }

  // -- q257: RMST + median ---------------------------------------------------

  test("q257 hand fixture: step integral and median from the q254 curve") {
    val dir = tmpDir("q257fix")
    // the q254 fixture: events at day 0 (S -> .75) and day 2 (S -> .375)
    writeEvents(dir, Seq(
      (1L, 1L, "view", 1.0, "2024-01-01 01:00:00"),
      (2L, 1L, "purchase", 1.0, "2024-01-03 01:00:00"),
      (3L, 2L, "view", 1.0, "2024-01-01 02:00:00"),
      (4L, 2L, "view", 1.0, "2024-01-05 02:00:00"),
      (5L, 3L, "view", 1.0, "2024-01-02 03:00:00"),
      (6L, 3L, "purchase", 1.0, "2024-01-02 04:00:00"),
      (7L, 4L, "purchase", 1.0, "2024-01-01 05:00:00"),
      (8L, 4L, "view", 1.0, "2024-01-02 06:00:00")))
    val r = graft.queries.EventAnalytics.q257Rmst(spark, dir).collect()
    r.length shouldBe 1
    val row = r.head
    row.getLong(row.fieldIndex("tau_days")) shouldBe 30L
    // 0.75e9 * (2-0) + 0.375e9 * (30-2) = 12e9
    row.getLong(row.fieldIndex("rmst_e9_days")) shouldBe 12000000000L
    row.getLong(row.fieldIndex("median_day")) shouldBe 2L
  }

  test("q257 at sf0.001: integral reconciles with a scala restatement of q254") {
    val curve = graft.queries.EventAnalytics.q254KaplanMeier(spark, sf)
      .collect().map(r => (r.getLong(r.fieldIndex("day")),
        r.getLong(r.fieldIndex("surv_e9")))).sortBy(_._1)
    val tau = 30L
    val tail = curve.zipWithIndex.map { case ((day, s), i) =>
      val next = if (i + 1 < curve.length) curve(i + 1)._1 else tau
      math.max(math.min(next, tau) - math.min(day, tau), 0L) * s
    }.sum
    val want = tail + 1000000000L * math.min(curve.head._1, tau)
    val r = graft.queries.EventAnalytics.q257Rmst(spark, sf).collect().head
    r.getLong(r.fieldIndex("rmst_e9_days")) shouldBe want
    val med = curve.find(_._2 <= 500000000L).map(_._1)
    if (med.isDefined)
      r.getLong(r.fieldIndex("median_day")) shouldBe med.get
    else r.isNullAt(r.fieldIndex("median_day")) shouldBe true
  }

  // -- q258: sample-ratio mismatch -------------------------------------------

  test("q258 hand fixture: balanced split passes, broken assignment flags") {
    val dir = tmpDir("q258fix")
    // type "ok": 2 control + 2 treat users; type "bad": 6 control, 0 treat
    val ok = Seq(1L, 2L, 3L, 4L).zipWithIndex.map { case (u, i) =>
      ((i + 1).toLong, u, "ok", 1.0, s"2024-01-01 0$i:00:00")
    }
    val bad = Seq(2L, 4L, 6L, 8L, 10L, 12L).zipWithIndex.map { case (u, i) =>
      ((i + 10).toLong, u, "bad", 1.0, s"2024-01-01 1$i:00:00")
    }
    writeEvents(dir, ok ++ bad)
    val rows = graft.queries.EventAnalytics.q258SrmCheck(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    val o = rows("ok")
    o.getLong(o.fieldIndex("u0")) shouldBe 2L
    o.getLong(o.fieldIndex("u1")) shouldBe 2L
    o.getLong(o.fieldIndex("chi2_user_ppm")) shouldBe 0L
    o.getLong(o.fieldIndex("srm_flag")) shouldBe 0L
    val b = rows("bad")
    b.getLong(b.fieldIndex("u0")) shouldBe 6L
    b.getLong(b.fieldIndex("u1")) shouldBe 0L
    // chi2 = 36/6 = 6.0 > 3.841
    b.getLong(b.fieldIndex("chi2_user_ppm")) shouldBe 6000000L
    b.getLong(b.fieldIndex("srm_flag")) shouldBe 1L
  }

  test("q258 at sf0.001: user counts reconcile with q250's arms, no SRM") {
    val srm = graft.queries.EventAnalytics.q258SrmCheck(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    val cuped = graft.queries.EventAnalytics.q250Cuped(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    srm.keySet shouldBe cuped.keySet
    srm.foreach { case (t, r) =>
      val c = cuped(t)
      withClue(s"$t:") {
        r.getLong(r.fieldIndex("u0")) shouldBe c.getLong(c.fieldIndex("n0"))
        r.getLong(r.fieldIndex("u1")) shouldBe c.getLong(c.fieldIndex("n1"))
        // the generator's parity split is sound: no type may flag
        r.getLong(r.fieldIndex("srm_flag")) shouldBe 0L
      }
    }
  }

  // -- q255: uplift deciles --------------------------------------------------

  test("q255 hand fixture: one user per decile, guards and Qini cross-product") {
    val dir = tmpDir("q255fix")
    // even day 2024-01-02 carries the score; purchases on the odd day
    // so conversion does not contaminate the pre-period covariate
    writeEvents(dir, Seq(
      (1L, 1L, "view", 4.00, "2024-01-02 01:00:00"),
      (2L, 1L, "purchase", 1.00, "2024-01-01 01:00:00"),
      (3L, 2L, "view", 3.00, "2024-01-02 02:00:00"),
      (4L, 3L, "view", 2.00, "2024-01-02 03:00:00"),
      (5L, 4L, "view", 1.00, "2024-01-02 04:00:00"),
      (6L, 4L, "purchase", 0.50, "2024-01-01 04:00:00")))
    val rows = graft.queries.EventAnalytics.q255UpliftDeciles(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    rows.keySet shouldBe Set(1L, 2L, 3L, 4L)
    val d1 = rows(1L) // u1: treated converter, no control in the decile
    d1.getLong(d1.fieldIndex("n1")) shouldBe 1L
    d1.getLong(d1.fieldIndex("rate1_ppm")) shouldBe 1000000L
    d1.isNullAt(d1.fieldIndex("rate0_ppm")) shouldBe true
    d1.isNullAt(d1.fieldIndex("uplift_ppm")) shouldBe true
    d1.getLong(d1.fieldIndex("qini_x")) shouldBe 0L // cn0 = 0 yet
    val d2 = rows(2L)
    d2.getLong(d2.fieldIndex("rate0_ppm")) shouldBe 0L
    d2.getLong(d2.fieldIndex("qini_x")) shouldBe 1L // 1*1 - 0*1
    val d4 = rows(4L) // full population: one converter per arm, 2 vs 2
    d4.getLong(d4.fieldIndex("qini_x")) shouldBe 0L // 1*2 - 1*2
  }

  test("q255 at sf0.001: deciles cover all users, full-population Qini identity") {
    val rows = graft.queries.EventAnalytics.q255UpliftDeciles(spark, sf)
      .collect().sortBy(_.getLong(0))
    rows.map(_.getLong(0)).toSeq shouldBe (1L to 10L)
    val nUsers = spark.read.parquet(s"$sf/events.parquet")
      .select("user_id").distinct().count()
    rows.map(r => r.getLong(r.fieldIndex("n0")) +
      r.getLong(r.fieldIndex("n1"))).sum shouldBe nUsers
    // the final cumulative row IS the whole population: its Qini
    // cross-product must equal conv1_tot*n0_tot - conv0_tot*n1_tot
    val n0t = rows.map(_.getLong(rows.head.fieldIndex("n0"))).sum
    val n1t = rows.map(_.getLong(rows.head.fieldIndex("n1"))).sum
    val c0t = rows.map(_.getLong(rows.head.fieldIndex("conv0"))).sum
    val c1t = rows.map(_.getLong(rows.head.fieldIndex("conv1"))).sum
    rows.last.getLong(rows.last.fieldIndex("qini_x")) shouldBe
      c1t * n0t - c0t * n1t
  }
}
