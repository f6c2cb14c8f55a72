package graft

import graft.streaming.StreamingUplift
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Chunked-fold ≡ batch equality for the streaming uplift monitor:
  * the per-(user, arm) (score, conv) cells merge by sum/max under any
  * chunking — with a user whose pre-period spend and conversion
  * arrive in DIFFERENT batches (the seam the sum/max fold must close)
  * — plus replay no-op, chunk-order independence, and a full-table
  * report pin vs batch q255.
  */
class StreamingUpliftSpec extends SparkSpec {
  import spark.implicits._

  // u1's even-day spend arrives in chunk 0 AND chunk 2 (score must
  // SUM across the seam); the purchase only in chunk 1. u2 spends on
  // an odd day (score 0) and never converts.
  // 2024-01-02 = epoch day 19724 (even -> pre); 2024-01-03 odd.
  private val chunks: Seq[Seq[(Long, Long, String, Double, String)]] = Seq(
    Seq((1L, 1L, "click", 3.00, "2024-01-02 01:00:00"),
      (2L, 2L, "click", 9.00, "2024-01-03 02:00:00")),
    Seq((3L, 1L, "purchase", 1.50, "2024-01-03 01:00:00")),
    Seq((4L, 1L, "view", 2.25, "2024-01-02 02:00:00"),
      (5L, 2L, "view", 1.00, "2024-01-02 03:00:00")))

  private def df(rows: Seq[(Long, Long, String, Double, String)]): DataFrame =
    rows.toDF("event_id", "user_id", "event_type", "value", "ts")
      .withColumn("ts", to_timestamp(col("ts")))

  private def batchCells: Set[Seq[Any]] =
    graft.queries.EventAnalytics.upliftCells(df(chunks.flatten))
      .collect().map(_.toSeq).toSet

  test("chunked fold lands on the bit-equal batch cells (score sums across the seam)") {
    val dir = tmpDir("uplift")
    chunks.zipWithIndex.foreach { case (c, i) =>
      StreamingUplift.processBatch(spark, df(c), i.toLong, dir) shouldBe true
    }
    val got = StreamingUplift.cells(spark, dir)
      .collect().map(_.toSeq).toSet
    got shouldBe batchCells
    // and the seam user's cell is the summed score WITH the conversion
    val u1 = got.find(_.head == 1L).get
    u1 shouldBe Seq(1L, true, 525L, 1L) // 300 + 225 cents, converted
  }

  test("chunk order does not matter; replay is a no-op") {
    val dir = tmpDir("uplift-order")
    chunks.reverse.zipWithIndex.foreach { case (c, i) =>
      StreamingUplift.processBatch(spark, df(c), i.toLong, dir) shouldBe true
    }
    StreamingUplift.cells(spark, dir)
      .collect().map(_.toSeq).toSet shouldBe batchCells
    StreamingUplift.processBatch(spark, df(chunks(0)), 1L, dir) shouldBe false
    StreamingUplift.cells(spark, dir)
      .collect().map(_.toSeq).toSet shouldBe batchCells
  }

  test("two-chunk fold of the events table matches batch q255's decile table") {
    val dir = tmpDir("uplift-full")
    val events = spark.read
      .parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("half", (col("event_id") % 2).cast("int"))
    (0 to 1).foreach { h =>
      StreamingUplift.processBatch(
        spark, events.filter(col("half") === h).drop("half"), h.toLong,
        dir) shouldBe true
    }
    StreamingUplift.report(spark, dir).collect().map(_.toSeq).toSet shouldBe
      graft.queries.EventAnalytics
        .q255UpliftDeciles(spark, "/root/testdata/sf0.001")
        .collect().map(_.toSeq).toSet
  }
}
