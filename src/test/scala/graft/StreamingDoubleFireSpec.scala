package graft

import graft.streaming.StreamingDoubleFire
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-split chunked-fold ≡ batch equality for the streaming
  * double-fire monitor: per-(type, user) tallies merge exactly across
  * time-ordered batch seams (the sequential-state contract — unlike
  * the additive privacy monitors, chunk-order independence is NOT
  * claimed), so the maintained state's report must be BIT-EQUAL to
  * batch q195 over the same accumulated rows — including a repeat that
  * STRADDLES a batch boundary. Plus replay no-op and a full-table pin
  * against q195 itself.
  */
class StreamingDoubleFireSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
  private def at(ms: Long) = new java.sql.Timestamp(t0.getTime + ms)

  // the 500 ms repeat at event 2→3 straddles the chunk boundary
  private val chunks: Seq[Seq[(Long, java.sql.Timestamp, Long, String)]] = Seq(
    Seq((1L, at(0L), 10L, "click"), (2L, at(200L), 10L, "click")),
    Seq((3L, at(700L), 10L, "click"), (4L, at(900L), 20L, "click")),
    Seq((5L, at(30000L), 10L, "click"), (6L, at(30100L), 10L, "view")))

  private def df(rows: Seq[(Long, java.sql.Timestamp, Long, String)]): DataFrame =
    rows.map { case (id, ts, u, t) => (id, ts, u, t, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  private def writeAll(dir: String): Unit =
    df(chunks.flatten).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")

  private def batchRows(dir: String): Seq[Seq[Any]] =
    graft.queries.EventAnalytics.q195DoubleFire(spark, dir)
      .orderBy("event_type").collect().map(_.toSeq).toSeq

  private def streamRows(state: String): Seq[Seq[Any]] =
    StreamingDoubleFire.report(spark, state)
      .orderBy("event_type").collect().map(_.toSeq).toSeq

  test("time-split fold is bit-equal to batch q195, seam repeat included") {
    val dir = tmpDir("dfire")
    writeAll(dir)
    val state = s"$dir/state"
    chunks.zipWithIndex.foreach { case (c, i) =>
      StreamingDoubleFire.processBatch(spark, df(c), i.toLong, state) shouldBe true
    }
    val got = streamRows(state)
    got shouldBe batchRows(dir)
    // and the seam repeat was actually counted: clicks 200ms→700ms
    val clicks = got.find(_.head == "click").get
    clicks(2) shouldBe 2L // repeats: 0→200ms in-batch, 200→700ms seam
  }

  test("replay is a no-op") {
    val dir = tmpDir("dfire-replay")
    writeAll(dir)
    val state = s"$dir/state"
    chunks.zipWithIndex.foreach { case (c, i) =>
      StreamingDoubleFire.processBatch(spark, df(c), i.toLong, state) shouldBe true
    }
    val before = streamRows(state)
    StreamingDoubleFire.processBatch(spark, df(chunks(1)), 1L, state) shouldBe false
    streamRows(state) shouldBe before
  }

  test("one-batch fold of the events table matches batch q195 bit-for-bit") {
    val sf = "/root/testdata/sf0.001"
    val dir = tmpDir("dfire-full")
    val state = s"$dir/state"
    val events = spark.read.parquet(s"$sf/events.parquet")
    StreamingDoubleFire.processBatch(spark, events, 0L, state) shouldBe true
    streamRows(state) shouldBe
      graft.queries.EventAnalytics.q195DoubleFire(spark, sf)
        .orderBy("event_type").collect().map(_.toSeq).toSeq
  }

  test("three time-split folds of the events table match batch q195") {
    val sf = "/root/testdata/sf0.001"
    val dir = tmpDir("dfire-split")
    val state = s"$dir/state"
    val events = spark.read.parquet(s"$sf/events.parquet")
      .withColumn("ts", col("ts").cast("timestamp"))
    val Array(c1, c2) = events
      .selectExpr("percentile_approx(unix_micros(ts), array(0.33, 0.66), 1000) p")
      .selectExpr("p[0]", "p[1]").head().toSeq.map(_.asInstanceOf[Long]).toArray
    val splits = Seq(
      events.filter(unix_micros(col("ts")) <= c1),
      events.filter(unix_micros(col("ts")) > c1 &&
        unix_micros(col("ts")) <= c2),
      events.filter(unix_micros(col("ts")) > c2))
    splits.zipWithIndex.foreach { case (c, i) =>
      StreamingDoubleFire.processBatch(spark, c, i.toLong, state) shouldBe true
    }
    streamRows(state) shouldBe
      graft.queries.EventAnalytics.q195DoubleFire(spark, sf)
        .orderBy("event_type").collect().map(_.toSeq).toSeq
  }
}
