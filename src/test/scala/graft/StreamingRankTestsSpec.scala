package graft

import graft.streaming.StreamingRankTests
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Chunked-fold ≡ batch equality for the streaming rank statistics:
  * the (type, cents-value, arm) count cells are additive under any
  * chunking of the event stream — the folded state must be BIT-EQUAL
  * to the single-batch cells, with the same value deliberately split
  * ACROSS chunks to exercise the merge — plus replay no-op,
  * chunk-order independence, and full-table report pins vs BOTH
  * batch q246 and batch q247.
  */
class StreamingRankTestsSpec extends SparkSpec {
  import spark.implicits._

  // value 20.00 appears in chunks 0 and 2 (different users/arms), so
  // its cell must fold across the seam; chunk 1 brings a fresh value
  private val chunks: Seq[Seq[(Long, Long, String, Double)]] = Seq(
    Seq((1L, 1L, "view", 10.0), (2L, 2L, "view", 20.0)),
    Seq((3L, 3L, "purchase", 99.0), (4L, 4L, "view", 7.5)),
    Seq((5L, 1L, "view", 20.0), (6L, 2L, "purchase", 45.0)))

  private def df(rows: Seq[(Long, Long, String, Double)]): DataFrame =
    rows.map { case (e, u, t, v) => (e, u, t, v, "2024-01-01 00:00:00") }
      .toDF("event_id", "user_id", "event_type", "value", "ts")
      .withColumn("ts", to_timestamp(col("ts")))

  private def batchCells: Set[Seq[Any]] =
    graft.queries.EventAnalytics.rankCells(df(chunks.flatten))
      .collect().map(_.toSeq).toSet

  test("chunked fold lands on the bit-equal batch cells") {
    val dir = tmpDir("rank")
    chunks.zipWithIndex.foreach { case (c, i) =>
      StreamingRankTests.processBatch(spark, df(c), i.toLong, dir) shouldBe true
    }
    StreamingRankTests.cells(spark, dir)
      .collect().map(_.toSeq).toSet shouldBe batchCells
  }

  test("chunk order does not matter; replay is a no-op") {
    val dir = tmpDir("rank-order")
    chunks.reverse.zipWithIndex.foreach { case (c, i) =>
      StreamingRankTests.processBatch(spark, df(c), i.toLong, dir) shouldBe true
    }
    StreamingRankTests.cells(spark, dir)
      .collect().map(_.toSeq).toSet shouldBe batchCells
    StreamingRankTests.processBatch(spark, df(chunks(0)), 1L, dir) shouldBe false
    StreamingRankTests.cells(spark, dir)
      .collect().map(_.toSeq).toSet shouldBe batchCells
  }

  test("two-chunk fold of the events table matches batch q246 AND q247") {
    val dir = tmpDir("rank-full")
    val events = spark.read
      .parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("half", (col("event_id") % 2).cast("int"))
    (0 to 1).foreach { h =>
      StreamingRankTests.processBatch(
        spark, events.filter(col("half") === h).drop("half"), h.toLong,
        dir) shouldBe true
    }
    val wantU = graft.queries.EventAnalytics
      .q246RankSumTest(spark, "/root/testdata/sf0.001")
      .collect().map(_.toSeq).toSet
    StreamingRankTests.rankSumReport(spark, dir)
      .collect().map(_.toSeq).toSet shouldBe wantU
    val wantKs = graft.queries.EventAnalytics
      .q247KsTwoSample(spark, "/root/testdata/sf0.001")
      .collect().map(_.toSeq).toSet
    StreamingRankTests.ksReport(spark, dir)
      .collect().map(_.toSeq).toSet shouldBe wantKs
    // r13: the third and fourth readings off the same state —
    // winsorized means and quantile treatment effects
    val wantW = graft.queries.EventAnalytics
      .q261WinsorizedMeans(spark, "/root/testdata/sf0.001")
      .collect().map(_.toSeq).toSet
    StreamingRankTests.winsorReport(spark, dir)
      .collect().map(_.toSeq).toSet shouldBe wantW
    val wantQ = graft.queries.EventAnalytics
      .q263QuantileEffects(spark, "/root/testdata/sf0.001")
      .collect().map(_.toSeq).toSet
    StreamingRankTests.qteReport(spark, dir)
      .collect().map(_.toSeq).toSet shouldBe wantQ
  }
}
