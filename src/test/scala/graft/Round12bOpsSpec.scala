package graft

import org.apache.spark.sql.functions._

/** Fixture pins for the round-12b operator batch: the Mann–Whitney
  * rank-sum test (q246), the Kolmogorov–Smirnov two-sample distance
  * (q247), degree assortativity (q248), and average precision (q249)
  * — each against a hand-computed fixture plus identity/guard checks
  * at sf0.001.
  */
class Round12bOpsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def writeEvents(dir: String, rows: Seq[(Long, Long, String, Double)]): Unit =
    rows.zipWithIndex
      .map { case ((eid, uid, t, v), i) => (eid, uid, t, v, s"2024-01-01 0$i:00:00") }
      .toDF("event_id", "user_id", "event_type", "value", "ts")
      .withColumn("ts", to_timestamp(col("ts")))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

  // -- q246: Mann–Whitney rank-sum test -----------------------------------

  test("q246 hand fixture: tie-correct U, tie term, effect size, and z") {
    val dir = tmpDir("q246fix")
    // control (even users): 1.00, 2.00; treat (odd): 2.00, 3.00
    // U1 = 3.5 (one cross-arm tie counts 1/2), tie3 = 2^3-2 = 6
    writeEvents(dir, Seq(
      (1L, 2L, "t", 1.00), (2L, 4L, "t", 2.00),
      (3L, 1L, "t", 2.00), (4L, 3L, "t", 3.00)))
    val r = graft.queries.EventAnalytics.q246RankSumTest(spark, dir).collect()
    r.length shouldBe 1
    val row = r.head
    row.getLong(row.fieldIndex("n0")) shouldBe 2L
    row.getLong(row.fieldIndex("n1")) shouldBe 2L
    row.getLong(row.fieldIndex("u1_x2")) shouldBe 7L // 2*U1
    // r13: tie3 reports as DOUBLE from the exact decimal accumulator
    row.getDouble(row.fieldIndex("tie3")) shouldBe 6.0
    row.getLong(row.fieldIndex("cles_ppm")) shouldBe 875000L // 3.5/4
    // z = 1.5 / sqrt(4/12 * (5 - 6/12)) = 1.5/sqrt(1.5)
    row.getDouble(row.fieldIndex("z_score")) shouldBe
      (1.5 / math.sqrt(1.5)) +- 1e-12
  }

  test("q246 all-tied group: sigma = 0 is guarded to NULL, U still exact") {
    val dir = tmpDir("q246tie")
    writeEvents(dir, Seq((1L, 2L, "t", 1.00), (2L, 1L, "t", 1.00)))
    val r = graft.queries.EventAnalytics.q246RankSumTest(spark, dir).collect()
    r.length shouldBe 1
    val row = r.head
    row.getLong(row.fieldIndex("u1_x2")) shouldBe 1L // U1 = 0.5: one tie pair
    row.getDouble(row.fieldIndex("tie3")) shouldBe 6.0 // N^3-N with N=2: all tied
    row.isNullAt(row.fieldIndex("z_score")) shouldBe true
    // U1 = 0.5 over n0*n1 = 1 pair: the tied pair is exactly half a win
    row.getLong(row.fieldIndex("cles_ppm")) shouldBe 500000L
  }

  test("q246 at sf0.001: splits reconcile with q133, U within [0, n0*n1]") {
    val mw = graft.queries.EventAnalytics.q246RankSumTest(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    val z = graft.queries.EventAnalytics.q133AbZtest(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    mw.keySet shouldBe z.keySet
    mw.foreach { case (t, r) =>
      val zr = z(t)
      withClue(s"$t:") {
        r.getLong(r.fieldIndex("n0")) shouldBe zr.getLong(zr.fieldIndex("n0"))
        r.getLong(r.fieldIndex("n1")) shouldBe zr.getLong(zr.fieldIndex("n1"))
        val n0 = r.getLong(r.fieldIndex("n0"))
        val n1 = r.getLong(r.fieldIndex("n1"))
        val u2 = r.getLong(r.fieldIndex("u1_x2"))
        u2 should be >= 0L
        u2 should be <= 2 * n0 * n1
        val cles = r.getLong(r.fieldIndex("cles_ppm"))
        cles should be >= 0L
        cles should be <= 1000000L
      }
    }
  }

  // -- q247: Kolmogorov–Smirnov two-sample ---------------------------------

  test("q247 hand fixture: disjoint supports give D = 1 at the control max") {
    val dir = tmpDir("q247fix")
    // control: 1.00, 2.00; treat: 3.00, 4.00 — ECDFs separate fully at v=200
    writeEvents(dir, Seq(
      (1L, 2L, "t", 1.00), (2L, 4L, "t", 2.00),
      (3L, 1L, "t", 3.00), (4L, 3L, "t", 4.00)))
    val r = graft.queries.EventAnalytics.q247KsTwoSample(spark, dir).collect()
    r.length shouldBe 1
    val row = r.head
    row.getLong(row.fieldIndex("n0")) shouldBe 2L
    row.getLong(row.fieldIndex("n1")) shouldBe 2L
    row.getLong(row.fieldIndex("d_num")) shouldBe 4L // n0*n1*D, D = 1
    row.getLong(row.fieldIndex("v_at_d")) shouldBe 200L
    row.getLong(row.fieldIndex("ks_e6")) shouldBe 1000000L
    // D = 1 but 1.358*sqrt(4/4) = 1.358 > 1: too few samples to reject
    row.getLong(row.fieldIndex("reject_05")) shouldBe 0L
  }

  test("q247 at sf0.001: totals reconcile with q133, D bounds, flag formula") {
    val ks = graft.queries.EventAnalytics.q247KsTwoSample(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    val z = graft.queries.EventAnalytics.q133AbZtest(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    ks.keySet shouldBe z.keySet
    ks.foreach { case (t, r) =>
      val zr = z(t)
      withClue(s"$t:") {
        val n0 = r.getLong(r.fieldIndex("n0"))
        val n1 = r.getLong(r.fieldIndex("n1"))
        n0 shouldBe zr.getLong(zr.fieldIndex("n0"))
        n1 shouldBe zr.getLong(zr.fieldIndex("n1"))
        val d = r.getLong(r.fieldIndex("d_num"))
        d should be >= 0L
        d should be <= n0 * n1
        r.getLong(r.fieldIndex("ks_e6")) shouldBe d * 1000000L / (n0 * n1)
        val want =
          if (d.toDouble / (n0.toDouble * n1) >
            1.358 * math.sqrt((n0.toDouble + n1) / (n0.toDouble * n1))) 1L
          else 0L
        r.getLong(r.fieldIndex("reject_05")) shouldBe want
      }
    }
  }

  // -- q248: degree assortativity ------------------------------------------

  private def writeLineitem(dir: String, rows: Seq[(Long, Long)]): Unit =
    rows.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")

  test("q248 hand fixture: a star is perfectly disassortative (r = -1)") {
    val dir = tmpDir("q248fix")
    // center part 1, leaves 2 and 3; each pair co-bought in 2 orders
    // (the support floor): degrees 2/1/1, Newman r = -1 exactly
    writeLineitem(dir, Seq(
      (1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 3L), (4L, 1L), (4L, 3L)))
    val r = graft.queries.Graph.q248DegreeAssortativity(spark, dir).collect()
    r.length shouldBe 1
    val row = r.head
    row.getLong(row.fieldIndex("n_edges")) shouldBe 2L
    row.getLong(row.fieldIndex("sum_jk")) shouldBe 4L
    row.getLong(row.fieldIndex("sum_jpk")) shouldBe 6L
    row.getLong(row.fieldIndex("sum_j2k2")) shouldBe 10L
    row.getLong(row.fieldIndex("assort_e6")) shouldBe -1000000L
  }

  test("q248 regular graph: zero degree variance is guarded to NULL") {
    val dir = tmpDir("q248reg")
    // one edge, both endpoints degree 1 — denominator exactly 0
    writeLineitem(dir, Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L)))
    val r = graft.queries.Graph.q248DegreeAssortativity(spark, dir).collect()
    r.length shouldBe 1
    val row = r.head
    row.getLong(row.fieldIndex("n_edges")) shouldBe 1L
    row.isNullAt(row.fieldIndex("assort_e6")) shouldBe true
  }

  test("q248 at sf0.001: a correlation stays within [-1, 1] in e6") {
    val r = graft.queries.Graph.q248DegreeAssortativity(spark, sf).collect()
    r.length shouldBe 1
    val row = r.head
    row.getLong(row.fieldIndex("n_edges")) should be > 0L
    val a = row.getLong(row.fieldIndex("assort_e6"))
    a should be >= -1000000L
    a should be <= 1000000L
  }

  // -- q249: average precision ----------------------------------------------

  private def writeDocs(dir: String,
      rows: Seq[(Long, String, String, Long)]): Unit =
    rows.map { case (id, lang, src, n) => (id, "x" * n.toInt, lang, src, n) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

  test("q249 hand fixture: alternating relevance, per-term floor quantization") {
    val dir = tmpDir("q249fix")
    // length order 50,40,30,20 -> rel pattern 1,0,1,0:
    // AP = (1e6//1 + 2e6//3) // 2 = (1000000 + 666666) // 2 = 833333
    writeDocs(dir, Seq(
      (1L, "en", "s", 50L), (2L, "xx", "s", 40L),
      (3L, "en", "s", 30L), (4L, "xx", "s", 20L)))
    val r = graft.queries.Profiling.q249AveragePrecision(spark, dir).collect()
    r.length shouldBe 1
    val row = r.head
    row.getLong(row.fieldIndex("n_docs")) shouldBe 4L
    row.getLong(row.fieldIndex("n_pos")) shouldBe 2L
    row.getLong(row.fieldIndex("ap_e6")) shouldBe 833333L
    row.getLong(row.fieldIndex("base_e6")) shouldBe 500000L
  }

  test("q249 perfect ranking scores exactly 1e6; no positives is NULL") {
    val dir = tmpDir("q249top")
    writeDocs(dir, Seq(
      (1L, "en", "s", 50L), (2L, "en", "s", 40L),
      (3L, "xx", "s", 30L), (4L, "xx", "s", 20L),
      (5L, "xx", "z", 10L)))
    val rs = graft.queries.Profiling.q249AveragePrecision(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    val sRow = rs("s")
    sRow.getLong(sRow.fieldIndex("ap_e6")) shouldBe 1000000L
    val zRow = rs("z")
    zRow.isNullAt(zRow.fieldIndex("ap_e6")) shouldBe true
    zRow.getLong(zRow.fieldIndex("base_e6")) shouldBe 0L
  }

  test("q249 at sf0.001: AP bounded, n_pos reconciles with q149's label") {
    val ap = graft.queries.Profiling.q249AveragePrecision(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    val auc = graft.queries.Profiling.q149ExactAuc(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    ap.keySet shouldBe auc.keySet
    ap.foreach { case (src, r) =>
      val a = auc(src)
      withClue(s"$src:") {
        r.getLong(r.fieldIndex("n_pos")) shouldBe a.getLong(a.fieldIndex("n_pos"))
        val v = r.getLong(r.fieldIndex("ap_e6"))
        v should be >= 0L
        v should be <= 1000000L
        // AP can't sit below the base rate by more than the per-term
        // floor ulp budget on a positive-bearing source... the exact
        // claim worth pinning is the bound pair itself:
        r.getLong(r.fieldIndex("base_e6")) should be <= 1000000L
      }
    }
  }
}
