package graft

import graft.streaming.StreamingPermTest
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Chunked-fold ≡ batch equality for the streaming permutation test:
  * relabeling bits are a pure (user, replicate) function, so both the
  * permuted cells and the observed partials are additive under any
  * chunking of the event stream — the folded state must be BIT-EQUAL
  * to the batch partials, with a user's events deliberately split
  * ACROSS chunks to exercise the linearity — plus replay no-op,
  * chunk-order independence, and a full-table report pin vs q245.
  */
class StreamingPermTestSpec extends SparkSpec {
  import spark.implicits._

  // user 1's events straddle chunks 0 and 2: the per-user flip must
  // act linearly on their aggregates across the seam
  private val chunks: Seq[Seq[(Long, Long, String, Double)]] = Seq(
    Seq((1L, 1L, "view", 10.0), (2L, 2L, "view", 20.0)),
    Seq((3L, 3L, "purchase", 99.0), (4L, 4L, "view", 7.5)),
    Seq((5L, 1L, "view", 30.0), (6L, 2L, "purchase", 45.0)))

  private def df(rows: Seq[(Long, Long, String, Double)]): DataFrame =
    rows.map { case (e, u, t, v) => (e, u, t, v, "2024-01-01 00:00:00") }
      .toDF("event_id", "user_id", "event_type", "value", "ts")
      .withColumn("ts", to_timestamp(col("ts")))

  private def batchCells: Set[Seq[Any]] =
    graft.queries.EventAnalytics.permCellPartials(
      graft.queries.EventAnalytics.permBaseCells(df(chunks.flatten)))
      .collect().map(_.toSeq).toSet

  private def batchObs: Set[Seq[Any]] =
    graft.queries.EventAnalytics.permObsPartials(
      graft.queries.EventAnalytics.permBaseCells(df(chunks.flatten)))
      .collect().map(_.toSeq).toSet

  test("chunked fold lands on the bit-equal batch partials") {
    val dir = tmpDir("perm")
    chunks.zipWithIndex.foreach { case (c, i) =>
      StreamingPermTest.processBatch(spark, df(c), i.toLong, dir) shouldBe true
    }
    StreamingPermTest.cells(spark, dir)
      .collect().map(_.toSeq).toSet shouldBe batchCells
    StreamingPermTest.obsRows(spark, dir)
      .collect().map(_.toSeq).toSet shouldBe batchObs
  }

  test("chunk order does not matter; replay is a no-op") {
    val dir = tmpDir("perm-order")
    chunks.reverse.zipWithIndex.foreach { case (c, i) =>
      StreamingPermTest.processBatch(spark, df(c), i.toLong, dir) shouldBe true
    }
    StreamingPermTest.cells(spark, dir)
      .collect().map(_.toSeq).toSet shouldBe batchCells
    StreamingPermTest.processBatch(spark, df(chunks(0)), 1L, dir) shouldBe false
    StreamingPermTest.obsRows(spark, dir)
      .collect().map(_.toSeq).toSet shouldBe batchObs
  }

  test("two-chunk fold of the events table matches batch q245's report") {
    val dir = tmpDir("perm-full")
    val events = spark.read
      .parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("half", (col("event_id") % 2).cast("int"))
    (0 to 1).foreach { h =>
      StreamingPermTest.processBatch(
        spark, events.filter(col("half") === h).drop("half"), h.toLong,
        dir) shouldBe true
    }
    val want = graft.queries.EventAnalytics
      .q245PermutationTest(spark, "/root/testdata/sf0.001")
      .collect().map(_.toSeq).toSet
    StreamingPermTest.report(spark, dir)
      .collect().map(_.toSeq).toSet shouldBe want
  }
}
