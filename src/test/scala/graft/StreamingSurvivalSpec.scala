package graft

import graft.streaming.StreamingSurvival
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Chunked-fold ≡ batch equality for the streaming survival monitor:
  * the per-(user, arm) (first-view, first-purchase, last-seen) cells
  * merge by min/min/max under any chunking — with a user whose view
  * and purchase arrive in DIFFERENT batches, pinning the
  * censored-then-converted revision the online fold must perform —
  * plus replay no-op, chunk-order independence, and full-table report
  * pins vs batch q254, q256, AND q257.
  */
class StreamingSurvivalSpec extends SparkSpec {
  import spark.implicits._

  // u1's view (d1) arrives in chunk 0; the purchase (d3) only in
  // chunk 2 — after chunk 1, u1 is censored; chunk 2 must revise the
  // cell into an event row. u2 stays censored throughout.
  private val chunks: Seq[Seq[(Long, Long, String, Double, String)]] = Seq(
    Seq((1L, 1L, "view", 1.0, "2024-01-01 01:00:00"),
      (2L, 2L, "view", 1.0, "2024-01-01 02:00:00")),
    Seq((3L, 2L, "view", 1.0, "2024-01-04 02:00:00"),
      (4L, 3L, "purchase", 1.0, "2024-01-02 03:00:00")),
    Seq((5L, 1L, "purchase", 1.0, "2024-01-03 01:00:00"),
      (6L, 3L, "view", 1.0, "2024-01-01 03:00:00")))

  private def df(rows: Seq[(Long, Long, String, Double, String)]): DataFrame =
    rows.toDF("event_id", "user_id", "event_type", "value", "ts")
      .withColumn("ts", to_timestamp(col("ts")))

  private def batchCells: Set[Seq[Any]] =
    graft.queries.EventAnalytics.survivalCells(df(chunks.flatten))
      .collect().map(_.toSeq).toSet

  test("chunked fold lands on the bit-equal batch cells (censor revision)") {
    val dir = tmpDir("surv")
    chunks.zipWithIndex.foreach { case (c, i) =>
      StreamingSurvival.processBatch(spark, df(c), i.toLong, dir) shouldBe true
    }
    StreamingSurvival.cells(spark, dir)
      .collect().map(_.toSeq).toSet shouldBe batchCells
    // and the revised curve sees u1 as an EVENT at dur 2 (not censored)
    val curve = StreamingSurvival.curve(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(r.fieldIndex("d_conv")))
      .toMap
    curve.keySet should contain(2L)
  }

  test("chunk order does not matter; replay is a no-op") {
    val dir = tmpDir("surv-order")
    chunks.reverse.zipWithIndex.foreach { case (c, i) =>
      StreamingSurvival.processBatch(spark, df(c), i.toLong, dir) shouldBe true
    }
    StreamingSurvival.cells(spark, dir)
      .collect().map(_.toSeq).toSet shouldBe batchCells
    StreamingSurvival.processBatch(spark, df(chunks(0)), 1L, dir) shouldBe false
    StreamingSurvival.cells(spark, dir)
      .collect().map(_.toSeq).toSet shouldBe batchCells
  }

  test("two-chunk fold of the events table matches batch q254, q256, q257, q259") {
    val dir = tmpDir("surv-full")
    val events = spark.read
      .parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("half", (col("event_id") % 2).cast("int"))
    (0 to 1).foreach { h =>
      StreamingSurvival.processBatch(
        spark, events.filter(col("half") === h).drop("half"), h.toLong,
        dir) shouldBe true
    }
    val sf = "/root/testdata/sf0.001"
    StreamingSurvival.curve(spark, dir).collect().map(_.toSeq).toSet shouldBe
      graft.queries.EventAnalytics.q254KaplanMeier(spark, sf)
        .collect().map(_.toSeq).toSet
    StreamingSurvival.logRankReport(spark, dir)
      .collect().map(_.toSeq).toSet shouldBe
      graft.queries.EventAnalytics.q256LogRank(spark, sf)
        .collect().map(_.toSeq).toSet
    StreamingSurvival.rmstReport(spark, dir)
      .collect().map(_.toSeq).toSet shouldBe
      graft.queries.EventAnalytics.q257Rmst(spark, sf)
        .collect().map(_.toSeq).toSet
    // r13: the fourth and fifth reports off the same state — per-arm
    // overlay and RMST treatment effect
    StreamingSurvival.armCurves(spark, dir)
      .collect().map(_.toSeq).toSet shouldBe
      graft.queries.EventAnalytics.q259KmByArm(spark, sf)
        .collect().map(_.toSeq).toSet
    StreamingSurvival.armRmstReport(spark, dir)
      .collect().map(_.toSeq).toSet shouldBe
      graft.queries.EventAnalytics.q260RmstByArm(spark, sf)
        .collect().map(_.toSeq).toSet
    // ...and the sixth — the Schoenfeld planning ladder
    StreamingSurvival.schoenfeldReport(spark, dir)
      .collect().map(_.toSeq).toSet shouldBe
      graft.queries.EventAnalytics.q262SchoenfeldLadder(spark, sf)
        .collect().map(_.toSeq).toSet
  }
}
