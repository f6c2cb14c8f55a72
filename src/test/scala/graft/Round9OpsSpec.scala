package graft

import graft.functions.StringSim
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Fixture pins for the round-9 operator family: the JaroWinkler
  * expression's exact doubles (pinned against DuckDB's native
  * `jaro_winkler_similarity` outputs, measured), the entropy fold,
  * the Theil–Sen robustness property, and the LLR sign contract.
  */
class Round9OpsSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    StringSim.jaroWinkler(UTF8String.fromString(a), UTF8String.fromString(b))

  // -- JaroWinkler: exact DuckDB-measured doubles ---------------------

  test("jaroWinkler matches DuckDB bit-for-bit on the classic fixtures") {
    jw("martha", "marhta") shouldBe 0.9611111111111111
    jw("dwayne", "duane") shouldBe 0.8400000000000001
    jw("dixon", "dicksonx") shouldBe 0.8133333333333332
    jw("a", "ab") shouldBe 0.8500000000000001
    jw("small ring", "small gizmo") shouldBe 0.8804545454545455
    jw("red widget", "red wrench") shouldBe 0.8400000000000001
  }

  test("jaroWinkler edge cases follow DuckDB (empty→0, window clamp, transposed)") {
    jw("", "") shouldBe 0.0 // DuckDB returns 0 for empty, NOT 1
    jw("", "a") shouldBe 0.0
    jw("a", "a") shouldBe 1.0 // needs the max(0, window) clamp
    jw("a", "b") shouldBe 0.0
    jw("ab", "ba") shouldBe 0.0 // window 0: adjacent transposition can't match
    jw("ab", "ab") shouldBe 1.0
  }

  test("jaroWinkler expression runs inside codegen identically to direct eval") {
    graft.functions.StringSimFunctions.register(spark)
    val got = Seq(("martha", "marhta"), ("dixon", "dicksonx"), ("", ""))
      .toDF("a", "b")
      .select(graft.functions.StringSimFunctions.jaroWinkler(col("a"), col("b")))
      .collect().map(_.getDouble(0)).toSeq
    got shouldBe Seq(0.9611111111111111, 0.8133333333333332, 0.0)
  }

  // -- q158 core: the entropy fold ------------------------------------

  test("q158 entropy orders repetitive < natural < uniform") {
    val dir = tmpDir("entropy-docs")
    Seq(
      (1L, "aaaa aaaa aaaa aaaa aaaa aaaa", "en", "s", 29L),
      (2L, "the quick brown fox jumps over the lazy dog again", "en", "s", 50L),
      (3L, "abcdefghijklmnopqrstuvwxyz0123456789", "en", "s", 36L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val r = graft.queries.LlmPipeline.q158CharEntropy(spark, dir)
      .collect().map(x => x.getLong(0) -> x.getLong(3)).toMap
    r(1L) should be < r(2L)
    r(2L) should be < r(3L)
    // two symbols, 24 a's + 5 spaces: H = ln(29) - (24 ln 24 + 5 ln 5)/29
    val expected = math.log(29.0) - (24.0 * math.log(24.0) + 5.0 * math.log(5.0)) / 29.0
    r(1L) shouldBe math.floor(expected * 1e6).toLong +- 1L
    // 36 distinct symbols once each: exactly ln(36)
    r(3L) shouldBe math.floor(math.log(36.0) * 1e6).toLong +- 1L
  }

  // -- q160 core: Theil–Sen robustness --------------------------------

  test("q160 Theil–Sen shrugs off a single spike day that drags OLS") {
    val dir = tmpDir("theil-events")
    // 9 days of perfect slope 2 plus one 1000-count spike day
    val rows = (0 until 9).map { i =>
      (1 to (10 + 2 * i)).map(j =>
        (i * 1000L + j, java.sql.Timestamp.valueOf(f"2024-01-${i + 1}%02d 12:00:00"),
          j.toLong, "view", 1.0, "{}"))
    }.flatten ++ (1 to 1000).map(j =>
      (90000L + j, java.sql.Timestamp.valueOf("2024-01-10 12:00:00"), j.toLong, "view", 1.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val r = graft.queries.Analytics.q160TheilSen(spark, dir).collect()
    r.length shouldBe 1
    r(0).getLong(1) shouldBe 45L // C(10,2) pairs
    // median pairwise slope stays at the true trend despite the spike
    r(0).getDouble(2) shouldBe 2.0 +- 1e-9
  }

  // -- q161 core: LLR sign contract -----------------------------------

  test("q161 weights rank target-exclusive vocabulary above off-target") {
    assume(new java.io.File("/root/testdata/sf0.001/documents.parquet").exists())
    val w = graft.queries.Curation.q161ImportanceWeights(spark, "/root/testdata/sf0.001")
      .withColumn("per_tok",
        col("llr_e6_sum").cast("double") / col("n_tokens").cast("double"))
    val byLang = w.groupBy("lang").agg(avg(col("per_tok")).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // the en slice IS the target: its average per-token LLR must beat
    // every other language's
    byLang.filter(_._1 != "en").values.foreach(_ should be < byLang("en"))
  }
}
