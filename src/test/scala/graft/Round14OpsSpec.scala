package graft

import org.apache.spark.sql.functions._

/** Round-14 operator pins (r13 verdict items). */
class Round14OpsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def haveData = new java.io.File(s"$sfDir/documents.parquet").exists()

  test("kmCentroidBudget: exact boundary passes, one past it fails loudly") {
    val cap = graft.queries.NearDup.KmCentroidLiteralCap
    // the sf-scale working points are far inside the cap
    noException should be thrownBy
      graft.queries.NearDup.kmCentroidBudget(1000L, 64L)
    // exact boundary is allowed (the cap is a ceiling, not a fence)
    noException should be thrownBy
      graft.queries.NearDup.kmCentroidBudget(cap / 64L, 64L)
    // one centroid past it fails loudly and names the remediation
    val e = the[IllegalStateException] thrownBy
      graft.queries.NearDup.kmCentroidBudget(cap / 64L + 1L, 64L)
    e.getMessage should include("KmCentroidLiteralCap")
    e.getMessage should include("broadcast equi-join")
  }

  test("the cap sits far above every test-scale K·dim working point") {
    // N = 10⁸ vectors (well past sf1.0) → K = ⌈√N⌉ = 10⁴, dim 64 →
    // 6.4×10⁵ literal values: still under the 2²¹ cap. The ceiling
    // binds only at true 100-TB vector counts, as declared.
    val k = math.ceil(math.sqrt(1e8)).toLong
    noException should be thrownBy
      graft.queries.NearDup.kmCentroidBudget(k, 64L)
    (k * 64L) should be < graft.queries.NearDup.KmCentroidLiteralCap
  }

  test("q265 migration manifest: conservation + lcm fan-out structure") {
    assume(haveData, s"$sfDir not present")
    val m = graft.queries.Curation.defs("q265_state_migration")(spark, sfDir)
      .collect()
    m should not be empty
    val migrated = m.filter(_.getString(0) == "m")
    val landed = m.filter(_.getString(0) == "i")
    // entry-count conservation: the manifest's 'm' rows restate the
    // old state exactly (recomputed independently here)
    val stateN = Tables.documents(spark, sfDir)
      .select(md5(trim(regexp_replace(lower(col("text")), "\\s+", " ")))
        .as("ch"), substring(col("source"), 4, 10).cast("int").as("si"))
      .filter(col("si") < 10).select("ch").distinct().count()
    migrated.map(_.getLong(3)).sum shouldBe stateN
    // landed rows are fresh inserts: bucket_old is NULL, buckets in range
    landed.foreach { r =>
      r.isNullAt(1) shouldBe true
      r.getLong(2) should (be >= 0L and be < 24L)
    }
    // modular structure: h%16 and h%24 are both functions of h%48, so
    // an old bucket ships to AT MOST lcm/16 = 3 new buckets and a new
    // bucket receives from at most lcm/24 = 2 old ones
    migrated.groupBy(_.getLong(1)).foreach { case (_, rows) =>
      rows.map(_.getLong(2)).distinct.length should be <= 3
    }
    migrated.groupBy(_.getLong(2)).foreach { case (_, rows) =>
      rows.map(_.getLong(1)).distinct.length should be <= 2
    }
    // fingerprint conservation: XOR over the 'm' cells equals the old
    // state's root fingerprint (order-free, the q164 Merkle identity)
    val root = Tables.documents(spark, sfDir)
      .select(md5(trim(regexp_replace(lower(col("text")), "\\s+", " ")))
        .as("ch"), substring(col("source"), 4, 10).cast("int").as("si"))
      .filter(col("si") < 10).select("ch").distinct()
      .select(conv(substring(col("ch"), 1, 12), 16, 10).cast("long").as("h48"))
      .agg(expr("bit_xor(h48)")).head.getLong(0)
    migrated.map(_.getLong(4)).reduce(_ ^ _) shouldBe root
  }

  test("q266: consistent ring beats modulo exactly where the theory says") {
    assume(haveData, s"$sfDir not present")
    val rows = graft.queries.Curation.defs("q266_reshard_policy")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(4)).toMap
    rows should have size 4
    // +1 node: modulo re-keys nearly everything (~16/17), the ring
    // moves only the new node's share (~1/17). The measured gap is the
    // whole reason consistent hashing exists.
    rows(("modulo", 17L)) should be > 800000L
    rows(("ring", 17L)) should be < 200000L
    // same-factor bump 16→24: modulo moves the 2/3 of keys whose
    // h mod 48 residue is not preserved; the ring moves ~8/24 = 1/3
    rows(("modulo", 24L)) should (be > 550000L and be < 780000L)
    rows(("ring", 24L)) should (be > 200000L and be < 470000L)
    // and the ring never loses to modulo at either size
    rows(("ring", 17L)) should be < rows(("modulo", 17L))
    rows(("ring", 24L)) should be < rows(("modulo", 24L))
  }

  test("q267: more vnodes tighten the arc-share distribution (Karger balance)") {
    assume(haveData, s"$sfDir not present")
    val rows = graft.queries.Curation.defs("q267_ring_balance")(spark, sfDir)
      .collect()
    rows should have size 48 // 24 buckets × {V=8, V=64}
    def arcsOf(cfg: Long) = rows.filter(_.getLong(0) == cfg).map(_.getLong(3))
    val (a8, a64) = (arcsOf(8L), arcsOf(64L))
    // shares are exact ppm of the 2^48 ring: sum to 1e6 minus ≤1 ppm
    // floor loss per bucket
    a8.sum should (be > 999976L - 24L and be <= 1000000L)
    a64.sum should (be > 999976L - 24L and be <= 1000000L)
    // the balance theorem, measured: V=64's worst bucket owns LESS of
    // the ring than V=8's worst, and its best owns more (tighter both
    // ways around the ideal 1/24 ≈ 41667 ppm)
    a64.max should be < a8.max
    a64.min should be > a8.min
    // every point set is complete and the observed keys all route
    rows.filter(_.getLong(0) == 8L).foreach(_.getLong(2) shouldBe 8L)
    rows.filter(_.getLong(0) == 64L).foreach(_.getLong(2) shouldBe 64L)
    val keyTotals = rows.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(4)).sum)
    keyTotals(8L) shouldBe keyTotals(64L)
  }

  test("q268 Holt fold matches the hand recursion on a 3-day fixture") {
    import spark.implicits._
    // y = [100, 200, 300] cents, α=0.2, β=0.1:
    //   l0 = 100e6, b0 = 0
    //   l1 = (2·200e6 + 8·100e6)/10 = 120e6 ; b1 = (20e6 + 0)/10 = 2e6
    //   l2 = (2·300e6 + 8·122e6)/10 = 157.6e6
    //   b2 = ((157.6e6 − 120e6) + 9·2e6)/10 = 5.56e6
    //   ŷ(1) = ⌊(157.6e6 + 5.56e6)/1e6⌋ = 163 ; ŷ(7) = ⌊196.52⌋ = 196
    val dir = tmpDir("holt")
    Seq(
      (1L, 1L, "view", 1.00, "2024-01-01 01:00:00"),
      (2L, 1L, "view", 2.00, "2024-01-02 01:00:00"),
      (3L, 1L, "view", 3.00, "2024-01-03 01:00:00"))
      .toDF("event_id", "user_id", "event_type", "value", "ts")
      .withColumn("ts", org.apache.spark.sql.functions.to_timestamp(
        org.apache.spark.sql.functions.col("ts")))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = graft.queries.EventAnalytics.defs("q268_holt_forecast")(spark, dir)
      .collect().sortBy(_.getLong(4))
    rows should have size 7
    rows.foreach { r =>
      r.getString(0) shouldBe "view"
      r.getLong(1) shouldBe 3L
      r.getLong(2) shouldBe 157600000L
      r.getLong(3) shouldBe 5560000L
    }
    rows.map(r => (r.getLong(4), r.getLong(5))).toSeq shouldBe
      Seq(1L -> 163L, 2L -> 168L, 3L -> 174L, 4L -> 179L,
        5L -> 185L, 6L -> 190L, 7L -> 196L)
  }

  test("q268 on the real corpus: 7 horizons per type, level positive") {
    assume(haveData, s"$sfDir not present")
    val rows = graft.queries.EventAnalytics.defs("q268_holt_forecast")(spark, sfDir)
      .collect()
    rows.length % 7 shouldBe 0
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      rs.map(_.getLong(4)).sorted.toSeq shouldBe (1L to 7L)
      rs.foreach(_.getLong(2) should be > 0L) // daily cents are positive
    }
  }

  test("q269 Holt-Winters matches the hand recursion incl. seasonal slots") {
    import spark.implicits._
    // Same 3-day series as the q268 fixture (y = 100/200/300 cents).
    // Epoch-day slots: 2024-01-01 = day 19723 ≡ 4 (mod 7) → slots 4/5/6.
    //   t1: l=100e6, b=0, s[*]=0
    //   t2 (slot5): l=120e6, b=2e6, s5=⌊3·(200e6−120e6)/10⌋=24e6
    //   t3 (slot6): l=157.6e6, b=5.56e6, s6=⌊3·(300e6−157.6e6)/10⌋=42.72e6
    // Forecast slots (last_idx 19725 ≡ 6): h1..h5 hit empty slots
    // (season 0 — Holt numbers), h6 hits s5=+24, h7 hits s6=+42.72:
    //   163, 168, 174, 179, 185, 190+24=214, 196+42=239 (floors)
    val dir = tmpDir("hw")
    Seq(
      (1L, 1L, "view", 1.00, "2024-01-01 01:00:00"),
      (2L, 1L, "view", 2.00, "2024-01-02 01:00:00"),
      (3L, 1L, "view", 3.00, "2024-01-03 01:00:00"))
      .toDF("event_id", "user_id", "event_type", "value", "ts")
      .withColumn("ts", org.apache.spark.sql.functions.to_timestamp(
        org.apache.spark.sql.functions.col("ts")))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = graft.queries.EventAnalytics.defs("q269_holt_winters")(spark, dir)
      .collect().sortBy(_.getLong(4))
    rows should have size 7
    rows.foreach { r =>
      r.getString(0) shouldBe "view"
      r.getLong(1) shouldBe 3L
      r.getLong(2) shouldBe 157600000L // level: identical to plain Holt
      r.getLong(3) shouldBe 5560000L   // trend: identical to plain Holt
    }
    rows.map(r => (r.getLong(4), r.getLong(5), r.getLong(6))).toSeq shouldBe
      Seq((1L, 0L, 163L), (2L, 0L, 168L), (3L, 0L, 174L), (4L, 0L, 179L),
        (5L, 0L, 185L), (6L, 24000000L, 214L), (7L, 42720000L, 239L))
  }

  test("q270 backtest matches the hand-scored origin on a 4-day fixture") {
    import spark.implicits._
    // y = 100/200/300/400 cents. Holt state at rn=3: l=157.6e6, b=5.56e6
    // (the q268 fixture values). The only origin is rn=3 (h=1):
    //   holt ŷ = ⌊163.16⌋ = 163, actual 400 → err 237
    //   naive ŷ = y3 = 300 → err 100
    // sad = 100+100+100 = 300, N=4:
    //   mase_holt = (237·3·1e6) div 300 = 2_370_000
    //   mase_naive = (100·3·1e6) div 300 = 1_000_000 exactly
    val dir = tmpDir("bt")
    Seq(
      (1L, 1L, "view", 1.00, "2024-01-01 01:00:00"),
      (2L, 1L, "view", 2.00, "2024-01-02 01:00:00"),
      (3L, 1L, "view", 3.00, "2024-01-03 01:00:00"),
      (4L, 1L, "view", 4.00, "2024-01-04 01:00:00"))
      .toDF("event_id", "user_id", "event_type", "value", "ts")
      .withColumn("ts", org.apache.spark.sql.functions.to_timestamp(
        org.apache.spark.sql.functions.col("ts")))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = graft.queries.EventAnalytics
      .defs("q270_forecast_backtest")(spark, dir)
      .collect().sortBy(_.getString(2))
    rows should have size 2
    val Array(holt, naive) = rows
    holt.getString(2) shouldBe "holt"
    (holt.getLong(1), holt.getLong(3), holt.getLong(4), holt.getLong(5)) shouldBe
      ((1L, 1L, 237L, 2370000L))
    naive.getString(2) shouldBe "naive"
    (naive.getLong(1), naive.getLong(3), naive.getLong(4), naive.getLong(5)) shouldBe
      ((1L, 1L, 100L, 1000000L))
  }

  test("q271 seasonal backtest picks the TARGET day's seasonal slot") {
    import spark.implicits._
    // Days Jan 1/2/3/9 (slots 4/5/6/5), y = 100/200/300/400 cents.
    // HW state after t3 (same fold as the q269 fixture): l=157.6e6,
    // b=5.56e6, s5=24e6, s6=42.72e6. The only origin is rn=3, h=1,
    // and the TARGET (Jan 9) has slot 5 — the forecast must pick up
    // s5 even though the POSITIONAL lag-7 slot would be empty:
    //   hw ŷ = ⌊157.6 + 5.56 + 24⌋ = 187 → err 213, mase 2_130_000
    //   snaive: rn+h−7 < 1 → falls back to y3=300 → err 100, mase 1e6
    val dir = tmpDir("sbt14")
    Seq(
      (1L, 1L, "view", 1.00, "2024-01-01 01:00:00"),
      (2L, 1L, "view", 2.00, "2024-01-02 01:00:00"),
      (3L, 1L, "view", 3.00, "2024-01-03 01:00:00"),
      (4L, 1L, "view", 4.00, "2024-01-09 01:00:00"))
      .toDF("event_id", "user_id", "event_type", "value", "ts")
      .withColumn("ts", org.apache.spark.sql.functions.to_timestamp(
        org.apache.spark.sql.functions.col("ts")))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = graft.queries.EventAnalytics
      .defs("q271_seasonal_backtest")(spark, dir)
      .collect().sortBy(_.getString(2))
    rows should have size 2
    val Array(hw, sn) = rows
    hw.getString(2) shouldBe "hw"
    (hw.getLong(1), hw.getLong(3), hw.getLong(4), hw.getLong(5)) shouldBe
      ((1L, 1L, 213L, 2130000L))
    sn.getString(2) shouldBe "snaive"
    (sn.getLong(1), sn.getLong(3), sn.getLong(4), sn.getLong(5)) shouldBe
      ((1L, 1L, 100L, 1000000L))
  }

  test("q272 conformal: hand-computed radius, coverage, and NULL cell") {
    import spark.implicits._
    // y = 100..500 on Jan 1-5. Origins 3 (odd→cal) and 4 (even→test).
    //   rn3 h1: ŷ=163, actual 400 → err 237; rn3 h2: ŷ=168, 500 → 332
    //   rn4 h1: ŷ=⌊210.528+10.2968⌋=220, 500 → 280
    // h=1: n_cal=1, k=min(⌈9·2/10⌉+…,1)=1 → q̂=237; test err 280 > 237
    //   → cover 0/1 = 0. h=2: q̂=332, no test origins → cover NULL.
    val dir = tmpDir("conf")
    Seq(
      (1L, 1L, "view", 1.00, "2024-01-01 01:00:00"),
      (2L, 1L, "view", 2.00, "2024-01-02 01:00:00"),
      (3L, 1L, "view", 3.00, "2024-01-03 01:00:00"),
      (4L, 1L, "view", 4.00, "2024-01-04 01:00:00"),
      (5L, 1L, "view", 5.00, "2024-01-05 01:00:00"))
      .toDF("event_id", "user_id", "event_type", "value", "ts")
      .withColumn("ts", org.apache.spark.sql.functions.to_timestamp(
        org.apache.spark.sql.functions.col("ts")))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = graft.queries.EventAnalytics
      .defs("q272_conformal_intervals")(spark, dir)
      .collect().sortBy(_.getLong(1))
    rows should have size 2
    val Array(h1, h2) = rows
    (h1.getLong(1), h1.getLong(2), h1.getLong(3), h1.getLong(4)) shouldBe
      ((1L, 1L, 1L, 237L))
    h1.getLong(5) shouldBe 0L
    (h2.getLong(1), h2.getLong(2), h2.getLong(3), h2.getLong(4)) shouldBe
      ((2L, 1L, 0L, 332L))
    h2.isNullAt(5) shouldBe true
  }

  test("q273 flags the day the forecast did NOT see coming") {
    import spark.implicits._
    // y = 100/200/300/1000. One-step forecasts: 100, 122, 163 →
    // residuals 100, 178, 837. Lower median 178; adevs 78/0/659 →
    // MAD 78. Only |837−178| = 659 > 3·78 = 234 → day 4 flagged.
    val dir = tmpDir("anom")
    Seq(
      (1L, 1L, "view", 1.00, "2024-01-01 01:00:00"),
      (2L, 1L, "view", 2.00, "2024-01-02 01:00:00"),
      (3L, 1L, "view", 3.00, "2024-01-03 01:00:00"),
      (4L, 1L, "view", 10.00, "2024-01-04 01:00:00"))
      .toDF("event_id", "user_id", "event_type", "value", "ts")
      .withColumn("ts", org.apache.spark.sql.functions.to_timestamp(
        org.apache.spark.sql.functions.col("ts")))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = graft.queries.EventAnalytics
      .defs("q273_residual_anomalies")(spark, dir)
      .collect().sortBy(_.getDate(1).toString)
    rows should have size 3
    rows.map(r => (r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getLong(6), r.getBoolean(7))).toSeq shouldBe Seq(
      (200L, 100L, 100L, 178L, 78L, false),
      (300L, 122L, 178L, 178L, 78L, false),
      (1000L, 163L, 837L, 178L, 78L, true))
  }

  test("q274 truncation audit: full-width recall exactly 1e6, 16-query panel") {
    assume(haveData, s"$sfDir not present")
    val rows = graft.queries.NearDup.defs("q274_truncation_audit")(spark, sfDir)
      .collect().sortBy(-_.getLong(0))
    rows should have size 3
    rows.foreach(_.getLong(1) shouldBe 16L)
    // the m = 64 "truncation" IS the truth: recall 1e6 by construction
    rows.head.getLong(0) shouldBe 64L
    rows.head.getLong(2) shouldBe 1000000L
    rows.head.getLong(3) shouldBe 1000000L
  }

  test("q274 catches a prefix/full ranking flip (independent restatement)") {
    import spark.implicits._
    // 23 engineered vectors: ids 1..11 ("A") carry +1 in dim 1 and −2
    // in dim 33; ids 21..31 ("B") carry −1/+2; id 41 ("Q") +1/+2.
    // Full cosine ranks the opposite group of what every ≤32-dim
    // prefix ranks (the tail term dominates), so the audit must show
    // the flip. Expected output computed by an independent in-test
    // restatement (plain Scala md5 panel + cosine + top-k + recall).
    val vecs: Seq[(Long, Array[Float])] =
      ((1L to 11L).map(i => i -> mkVec(1f, -2f)) ++
        (21L to 31L).map(i => i -> mkVec(-1f, 2f)) :+
        (41L -> mkVec(1f, 2f)))
    val dir = tmpDir("trunc")
    vecs.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    // ---- independent restatement ----
    val q = vecs.map { case (id, v) =>
      id -> v.map(x => math.round(x.toDouble * 10000.0)) }.toMap
    def md5sel(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 12), 16)
    }
    val panel = vecs.map(_._1).sortBy(id => (md5sel(id), id)).take(16)
    def cosE6(a: Array[Long], b: Array[Long], m: Int): Long = {
      val dot = (0 until m).map(i => a(i) * b(i)).sum.toDouble
      val sa = (0 until m).map(i => a(i) * a(i)).sum.toDouble
      val sb = (0 until m).map(i => b(i) * b(i)).sum.toDouble
      math.round(1e6 * dot / (math.sqrt(sa) * math.sqrt(sb)))
    }
    def top10(qid: Long, m: Int): Seq[Long] = vecs.map(_._1)
      .filter(_ != qid)
      .map(id => (id, cosE6(q(qid), q(id), m)))
      .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1)
    val expected = Seq(64, 32, 16).map { m =>
      val recalls = panel.map { qid =>
        top10(qid, m).toSet.intersect(top10(qid, 64).toSet).size * 100000L
      }
      (m.toLong, 16L, recalls.sum / 16L, recalls.min)
    }

    val rows = graft.queries.NearDup.defs("q274_truncation_audit")(spark, dir)
      .collect().sortBy(-_.getLong(0))
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.toSeq shouldBe expected
    // and the flip is real: truncated recall strictly below full-width
    expected.head._3 shouldBe 1000000L
    expected(1)._3 should be < 1000000L
    expected(2)._3 should be < 1000000L
  }

  private def mkVec(d1: Float, d33: Float): Array[Float] = {
    val v = Array.fill(64)(0f); v(0) = d1; v(32) = d33; v
  }

  test("q270 under 4 days yields zero eval rows, not a reversed ramp") {
    import spark.implicits._
    val dir = tmpDir("bt0")
    Seq((1L, 1L, "view", 1.00, "2024-01-01 01:00:00"),
      (2L, 1L, "view", 2.00, "2024-01-02 01:00:00"))
      .toDF("event_id", "user_id", "event_type", "value", "ts")
      .withColumn("ts", org.apache.spark.sql.functions.to_timestamp(
        org.apache.spark.sql.functions.col("ts")))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    graft.queries.EventAnalytics.defs("q270_forecast_backtest")(spark, dir)
      .count() shouldBe 0L
  }
}
