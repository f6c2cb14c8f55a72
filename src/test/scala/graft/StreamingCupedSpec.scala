package graft

import graft.streaming.StreamingCuped
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Chunked-fold ≡ batch equality for the streaming CUPED monitor: the
  * per-(type, user, arm) covariate/outcome cents cells are additive
  * under any chunking — the folded state must be BIT-EQUAL to the
  * single-batch cells, with one user's even-day (X) and odd-day (Y)
  * events deliberately split ACROSS chunks — plus replay no-op,
  * chunk-order independence, and a full-table report pin vs q250.
  */
class StreamingCupedSpec extends SparkSpec {
  import spark.implicits._

  // 2024-01-01 = odd epoch day (Y side); 2024-01-02 = even (X side).
  // user 1's X and Y land in DIFFERENT chunks: the fold must rebuild
  // the complete (x, y) cell across the seam
  private val chunks: Seq[Seq[(Long, Long, String, Double, String)]] = Seq(
    Seq((1L, 1L, "view", 10.0, "2024-01-02 01:00:00"),
      (2L, 2L, "view", 20.0, "2024-01-01 02:00:00")),
    Seq((3L, 3L, "purchase", 99.0, "2024-01-02 03:00:00"),
      (4L, 2L, "view", 7.5, "2024-01-02 04:00:00")),
    Seq((5L, 1L, "view", 30.0, "2024-01-01 05:00:00"),
      (6L, 4L, "view", 45.0, "2024-01-01 06:00:00")))

  private def df(rows: Seq[(Long, Long, String, Double, String)]): DataFrame =
    rows.toDF("event_id", "user_id", "event_type", "value", "ts")
      .withColumn("ts", to_timestamp(col("ts")))

  private def batchCells: Set[Seq[Any]] =
    graft.queries.EventAnalytics.cupedCells(df(chunks.flatten))
      .collect().map(_.toSeq).toSet

  test("chunked fold lands on the bit-equal batch cells") {
    val dir = tmpDir("cuped")
    chunks.zipWithIndex.foreach { case (c, i) =>
      StreamingCuped.processBatch(spark, df(c), i.toLong, dir) shouldBe true
    }
    StreamingCuped.cells(spark, dir)
      .collect().map(_.toSeq).toSet shouldBe batchCells
  }

  test("chunk order does not matter; replay is a no-op") {
    val dir = tmpDir("cuped-order")
    chunks.reverse.zipWithIndex.foreach { case (c, i) =>
      StreamingCuped.processBatch(spark, df(c), i.toLong, dir) shouldBe true
    }
    StreamingCuped.cells(spark, dir)
      .collect().map(_.toSeq).toSet shouldBe batchCells
    StreamingCuped.processBatch(spark, df(chunks(0)), 1L, dir) shouldBe false
    StreamingCuped.cells(spark, dir)
      .collect().map(_.toSeq).toSet shouldBe batchCells
  }

  test("two-chunk fold of the events table matches batch q250's report") {
    val dir = tmpDir("cuped-full")
    val events = spark.read
      .parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("half", (col("event_id") % 2).cast("int"))
    (0 to 1).foreach { h =>
      StreamingCuped.processBatch(
        spark, events.filter(col("half") === h).drop("half"), h.toLong,
        dir) shouldBe true
    }
    val want = graft.queries.EventAnalytics
      .q250Cuped(spark, "/root/testdata/sf0.001")
      .collect().map(_.toSeq).toSet
    StreamingCuped.report(spark, dir)
      .collect().map(_.toSeq).toSet shouldBe want
  }
}
