package graft

import graft.streaming.StreamingSprt
import org.apache.spark.sql.functions.col

/** Time-split chunked-fold ≡ batch equality for the streaming SPRT:
  * the walk offset carries across batch seams, so folding the events
  * table in event-time slices must land on exactly batch q238's
  * report — including the first-crossing observation index, the
  * sequential property the seam handling exists for. Plus replay
  * no-op and a crossing-at-the-seam fixture.
  */
class StreamingSprtSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def q238(dir: String) =
    graft.queries.EventAnalytics.q238SprtTest(spark, dir)
      .orderBy("variant").collect().map(_.toSeq).toSeq

  test("time-sliced fold reproduces batch q238 exactly on the events table") {
    val ev = graft.Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type")
    val days = ev.select(org.apache.spark.sql.functions.to_date(col("ts")).as("d"))
      .distinct().orderBy("d").collect().map(_.getDate(0))
    val cut = days(days.length / 2)
    val dir = tmpDir("sprt")
    StreamingSprt.processBatch(spark,
      ev.filter(org.apache.spark.sql.functions.to_date(col("ts")) <= cut),
      0L, dir) shouldBe true
    StreamingSprt.processBatch(spark,
      ev.filter(org.apache.spark.sql.functions.to_date(col("ts")) > cut),
      1L, dir) shouldBe true
    StreamingSprt.report(spark, dir)
      .orderBy("variant").collect().map(_.toSeq).toSeq shouldBe q238(sf)
  }

  test("replay is a no-op") {
    val ev = graft.Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type")
    val dir = tmpDir("sprt-replay")
    StreamingSprt.processBatch(spark, ev, 0L, dir) shouldBe true
    val before = StreamingSprt.report(spark, dir).collect().map(_.toSeq).toSet
    StreamingSprt.processBatch(spark, ev, 0L, dir) shouldBe false
    StreamingSprt.report(spark, dir)
      .collect().map(_.toSeq).toSet shouldBe before
  }

  test("a crossing that completes ACROSS the seam lands at the right index") {
    // Variant 0 (user 2): 5 purchases cross +2944439 at obs 5; split
    // the stream 3 + 2, so the crossing happens in batch 2 with the
    // offset carried in — n_to_decision must still be 5.
    val rows = (1 to 5).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-01-01 00:$i%02d:00"),
        2L, "purchase")
    }
    val df = rows.toDF("event_id", "ts", "user_id", "event_type")
    val dir = tmpDir("sprt-seam")
    StreamingSprt.processBatch(spark, df.filter(col("event_id") <= 3), 0L, dir)
    // undecided after 3 observations (3×693147 = 2079441 < threshold)
    StreamingSprt.report(spark, dir).collect()
      .head.getString(3) shouldBe "undecided"
    StreamingSprt.processBatch(spark, df.filter(col("event_id") > 3), 1L, dir)
    val r = StreamingSprt.report(spark, dir).collect().head
    r.getString(3) shouldBe "accept_h1"
    r.getLong(r.fieldIndex("n_to_decision")) shouldBe 5L
    r.getLong(r.fieldIndex("llr_final_e6")) shouldBe 5L * 693147L
  }
}
