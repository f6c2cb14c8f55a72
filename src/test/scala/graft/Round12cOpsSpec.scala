package graft

import org.apache.spark.sql.functions._

/** Fixture pins for the round-12c experiment-platform batch: CUPED
  * variance reduction (q250), the MDE sample-size ladder (q251),
  * Benjamini–Hochberg FDR step-up (q252), and the Mann–Kendall trend
  * test (q253) — hand-computed fixtures, guard pins, and
  * cross-query reconciliations at sf0.001.
  */
class Round12cOpsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def writeEvents(dir: String,
      rows: Seq[(Long, Long, String, Double, String)]): Unit =
    rows.toDF("event_id", "user_id", "event_type", "value", "ts")
      .withColumn("ts", to_timestamp(col("ts")))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

  // 2024-01-01 = epoch day 19723 (odd → outcome Y);
  // 2024-01-02 = epoch day 19724 (even → covariate X)
  private val OddDay = "2024-01-01 10:00:00"
  private val EvenDay = "2024-01-02 10:00:00"

  // -- q250: CUPED ----------------------------------------------------------

  test("q250 hand fixture: a perfect covariate removes ALL variance") {
    val dir = tmpDir("q250fix")
    // every user spends the same on the even (X) and odd (Y) day:
    // theta = 1, diff_cuped = 0 exactly, rho^2 = 1
    writeEvents(dir, Seq(
      (1L, 2L, "t", 1.00, EvenDay), (2L, 2L, "t", 1.00, OddDay),
      (3L, 4L, "t", 3.00, EvenDay), (4L, 4L, "t", 3.00, OddDay),
      (5L, 1L, "t", 2.00, EvenDay), (6L, 1L, "t", 2.00, OddDay),
      (7L, 3L, "t", 4.00, EvenDay), (8L, 3L, "t", 4.00, OddDay)))
    val r = graft.queries.EventAnalytics.q250Cuped(spark, dir).collect()
    r.length shouldBe 1
    val row = r.head
    row.getLong(row.fieldIndex("n")) shouldBe 4L
    row.getLong(row.fieldIndex("n0")) shouldBe 2L
    row.getLong(row.fieldIndex("n1")) shouldBe 2L
    row.getLong(row.fieldIndex("theta_e6")) shouldBe 1000000L
    row.getDouble(row.fieldIndex("diff_raw")) shouldBe 100.0 +- 1e-12
    row.getDouble(row.fieldIndex("diff_cuped")) shouldBe 0.0 +- 1e-12
    row.getLong(row.fieldIndex("var_red_e6")) shouldBe 1000000L
  }

  test("q250 zero covariate variance guards theta/cuped to NULL, raw survives") {
    val dir = tmpDir("q250deg")
    // all users have identical X — var(X) = 0
    writeEvents(dir, Seq(
      (1L, 2L, "t", 1.00, EvenDay), (2L, 2L, "t", 5.00, OddDay),
      (3L, 1L, "t", 1.00, EvenDay), (4L, 1L, "t", 9.00, OddDay)))
    val r = graft.queries.EventAnalytics.q250Cuped(spark, dir).collect()
    r.length shouldBe 1
    val row = r.head
    row.isNullAt(row.fieldIndex("theta_e6")) shouldBe true
    row.isNullAt(row.fieldIndex("diff_cuped")) shouldBe true
    row.isNullAt(row.fieldIndex("var_red_e6")) shouldBe true
    row.getDouble(row.fieldIndex("diff_raw")) shouldBe 400.0 +- 1e-12
  }

  test("q250 at sf0.001: arm counts sum, variance reduction within [0, 1e6]") {
    graft.queries.EventAnalytics.q250Cuped(spark, sf).collect().foreach { row =>
      withClue(s"${row.getString(0)}:") {
        row.getLong(row.fieldIndex("n")) shouldBe
          row.getLong(row.fieldIndex("n0")) + row.getLong(row.fieldIndex("n1"))
        val vr = row.getLong(row.fieldIndex("var_red_e6"))
        vr should be >= 0L
        vr should be <= 1000000L
      }
    }
  }

  // -- q251: MDE ladder -------------------------------------------------------

  test("q251 hand fixture: ladder matches the independent formula restatement") {
    val dir = tmpDir("q251fix")
    writeEvents(dir, Seq(
      (1L, 1L, "t", 1.00, OddDay), (2L, 2L, "t", 3.00, OddDay)))
    val rows = graft.queries.EventAnalytics.q251MdeLadder(spark, dir)
      .collect().map(r => r.getLong(r.fieldIndex("mde_pct")) ->
        r.getLong(r.fieldIndex("n_per_arm"))).toMap
    rows.keySet shouldBe Set(1L, 2L, 5L, 10L)
    // n=2, mean=200 cents, s2=20000: n/arm = ceil(K*2*s2/(200*pct/100)^2)
    val K = graft.queries.EventAnalytics.PowerK
    Seq(1L, 2L, 5L, 10L).foreach { pct =>
      val delta = 200.0 * pct / 100
      val want = math.ceil(K * 2 * 20000.0 / (delta * delta)).toLong
      withClue(s"mde=$pct%:") { rows(pct) shouldBe want }
    }
  }

  test("q251 zero variance guards to NULL; ladder is monotone at sf0.001") {
    val dir = tmpDir("q251deg")
    writeEvents(dir, Seq(
      (1L, 1L, "t", 2.00, OddDay), (2L, 2L, "t", 2.00, OddDay)))
    graft.queries.EventAnalytics.q251MdeLadder(spark, dir).collect()
      .foreach(r => r.isNullAt(r.fieldIndex("n_per_arm")) shouldBe true)
    // real data: a larger detectable effect needs fewer observations
    graft.queries.EventAnalytics.q251MdeLadder(spark, sf).collect()
      .groupBy(_.getString(0)).foreach { case (t, rs) =>
        val byPct = rs.map(r => r.getLong(r.fieldIndex("mde_pct")) ->
          r.getLong(r.fieldIndex("n_per_arm"))).sortBy(_._1)
        withClue(s"$t:") {
          byPct.map(_._2).toSeq.sliding(2).foreach {
            case Seq(a, b) => a should be >= b
            case _         =>
          }
        }
      }
  }

  // -- q252: BH step-up ---------------------------------------------------------

  test("q252 reproduces the BH rule recomputed from q245's p-values") {
    val p245 = graft.queries.EventAnalytics.q245PermutationTest(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(r.fieldIndex("p_ppm")))
    val m = p245.length.toLong
    val sorted = p245.sortBy { case (t, p) => (p, t) }
    val kStar = sorted.zipWithIndex
      .filter { case ((_, p), i) => p * m <= 50000L * (i + 1) }
      .map(_._2 + 1L).reduceOption(_ max _).getOrElse(0L)
    val got = graft.queries.EventAnalytics.q252BhFdr(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    got.keySet shouldBe p245.map(_._1).toSet
    sorted.zipWithIndex.foreach { case ((t, p), i) =>
      val row = got(t)
      withClue(s"$t:") {
        row.getLong(row.fieldIndex("p_ppm")) shouldBe p
        row.getLong(row.fieldIndex("rk")) shouldBe i + 1L
        row.getLong(row.fieldIndex("m")) shouldBe m
        row.getLong(row.fieldIndex("k_star")) shouldBe kStar
        row.getLong(row.fieldIndex("rejected")) shouldBe
          (if (i + 1L <= kStar) 1L else 0L)
      }
    }
  }

  // -- q253: Mann–Kendall ----------------------------------------------------

  test("q253 hand fixture: a strictly rising series has tau_b = 1") {
    val dir = tmpDir("q253fix")
    // daily counts 1,2,3,4 over four consecutive days
    val rows = (1 to 4).flatMap { day =>
      (1 to day).map(i =>
        ((day * 10 + i).toLong, i.toLong, "t", 1.0,
          f"2024-01-0$day%d 0$i%d:00:00"))
    }
    writeEvents(dir, rows)
    val r = graft.queries.Analytics.q253MannKendall(spark, dir).collect()
    r.length shouldBe 1
    val row = r.head
    row.getLong(row.fieldIndex("n_days")) shouldBe 4L
    row.getLong(row.fieldIndex("n_pairs")) shouldBe 6L
    row.getLong(row.fieldIndex("s_stat")) shouldBe 6L
    row.getLong(row.fieldIndex("tie_v")) shouldBe 0L
    row.getLong(row.fieldIndex("tau_b_e6")) shouldBe 1000000L
    // z = (6-1)/sqrt(4*3*13/18)
    row.getDouble(row.fieldIndex("z_mk")) shouldBe
      (5.0 / math.sqrt(4.0 * 3 * 13 / 18)) +- 1e-12
  }

  test("q253 all-tied series guards tau and z to NULL") {
    val dir = tmpDir("q253tie")
    writeEvents(dir, Seq(
      (1L, 1L, "t", 1.0, "2024-01-01 00:00:00"),
      (2L, 2L, "t", 1.0, "2024-01-02 00:00:00")))
    val r = graft.queries.Analytics.q253MannKendall(spark, dir).collect()
    r.length shouldBe 1
    val row = r.head
    row.getLong(row.fieldIndex("s_stat")) shouldBe 0L
    row.isNullAt(row.fieldIndex("tau_b_e6")) shouldBe true
    row.isNullAt(row.fieldIndex("z_mk")) shouldBe true
  }

  test("q253 at sf0.001: pair domain reconciles with q160's, S bounded") {
    val mk = graft.queries.Analytics.q253MannKendall(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    val ts = graft.queries.Analytics.q160TheilSen(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    mk.keySet shouldBe ts.keySet
    mk.foreach { case (t, r) =>
      val tr = ts(t)
      withClue(s"$t:") {
        r.getLong(r.fieldIndex("n_pairs")) shouldBe
          tr.getLong(tr.fieldIndex("n_pairs"))
        math.abs(r.getLong(r.fieldIndex("s_stat"))) should be <=
          r.getLong(r.fieldIndex("n_pairs"))
      }
    }
  }
}
