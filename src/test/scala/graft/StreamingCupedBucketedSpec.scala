package graft

import graft.streaming.StreamingCupedBucketed
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The second [[graft.streaming.BucketedState]] client: same
  * chunked-fold ≡ batch contract as [[StreamingCupedSpec]] plus the
  * layout property (untouched bucket dirs byte-identical after a
  * batch). The protocol's crash-recovery tests live in
  * [[StreamingUpliftBucketedSpec]] — shared code, tested once.
  */
class StreamingCupedBucketedSpec extends SparkSpec {
  import spark.implicits._

  // the StreamingCupedSpec seam fixture: user 1's even-day X and
  // odd-day Y arrive in different chunks
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

  private def cellsOf(dir: String): Set[Seq[Any]] =
    StreamingCupedBucketed.cells(spark, dir).collect().map(_.toSeq).toSet

  test("chunked fold lands on the bit-equal batch cells; replay no-op") {
    val dir = tmpDir("cupedb")
    chunks.zipWithIndex.foreach { case (c, i) =>
      StreamingCupedBucketed.processBatch(spark, df(c), i.toLong, dir) shouldBe true
    }
    cellsOf(dir) shouldBe batchCells
    StreamingCupedBucketed.processBatch(spark, df(chunks(0)), 1L, dir) shouldBe false
    cellsOf(dir) shouldBe batchCells
  }

  test("a batch rewrites only the buckets it touches") {
    val dir = tmpDir("cupedb-touch")
    StreamingCupedBucketed.processBatch(spark, df(chunks.flatten), 0L, dir) shouldBe true
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    def snapshot(): Map[String, Seq[(String, Long, Long)]] =
      fs.listStatus(new Path(dir)).filter(_.getPath.getName.startsWith("bkt="))
        .map { d =>
          d.getPath.getName ->
            fs.listStatus(d.getPath).toSeq
              .map(f => (f.getPath.getName, f.getLen, f.getModificationTime))
              .sortBy(_._1)
        }.toMap
    val before = snapshot()
    // one user-3 event → user bucket 3; marker bucket = 1 % 64 = 1
    StreamingCupedBucketed.processBatch(
      spark, df(Seq((7L, 3L, "purchase", 1.0, "2024-01-02 07:00:00"))),
      1L, dir) shouldBe true
    val after = snapshot()
    before.keySet.diff(Set("bkt=3", "bkt=1")).foreach { untouched =>
      withClue(s"$untouched must be byte-identical: ") {
        after(untouched) shouldBe before(untouched)
      }
    }
    after("bkt=3") should not be before("bkt=3")
  }

  test("two-chunk fold of the events table matches batch q250's report") {
    val dir = tmpDir("cupedb-full")
    val events = spark.read
      .parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("half", (col("event_id") % 2).cast("int"))
    (0 to 1).foreach { h =>
      StreamingCupedBucketed.processBatch(
        spark, events.filter(col("half") === h).drop("half"), h.toLong,
        dir) shouldBe true
    }
    StreamingCupedBucketed.report(spark, dir).collect().map(_.toSeq).toSet shouldBe
      graft.queries.EventAnalytics
        .q250Cuped(spark, "/root/testdata/sf0.001")
        .collect().map(_.toSeq).toSet
  }
}
