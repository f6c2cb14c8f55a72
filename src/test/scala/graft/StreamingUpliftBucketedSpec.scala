package graft

import graft.streaming.StreamingUpliftBucketed
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The bucketed state layout (SURVEY §6.5d's declared scale path):
  * same chunked-fold ≡ batch contract as [[StreamingUpliftSpec]],
  * PLUS the two properties that justify the layout — a batch rewrites
  * ONLY the buckets its users route to (untouched bucket dirs are
  * byte-identical afterwards), and a crash in the middle of the
  * multi-directory publish is recovered exactly-once (simulated on
  * the real code path via the bucket-limited publish).
  */
class StreamingUpliftBucketedSpec extends SparkSpec {
  import spark.implicits._

  private val B = StreamingUpliftBucketed.Buckets

  // same seam fixture as StreamingUpliftSpec (user 1's pre-period
  // spend splits across chunks 0 and 2; conversion in chunk 1)
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

  private def cellsOf(dir: String): Set[Seq[Any]] =
    StreamingUpliftBucketed.cells(spark, dir).collect().map(_.toSeq).toSet

  test("chunked fold lands on the bit-equal batch cells; replay no-op") {
    val dir = tmpDir("upliftb")
    chunks.zipWithIndex.foreach { case (c, i) =>
      StreamingUpliftBucketed.processBatch(spark, df(c), i.toLong, dir) shouldBe true
    }
    cellsOf(dir) shouldBe batchCells
    StreamingUpliftBucketed.processBatch(spark, df(chunks(0)), 1L, dir) shouldBe false
    cellsOf(dir) shouldBe batchCells
  }

  test("a batch rewrites only the buckets it touches") {
    val dir = tmpDir("upliftb-touch")
    StreamingUpliftBucketed.processBatch(spark, df(chunks(0)), 0L, dir) shouldBe true
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
    // chunk 1 routes to user bucket 1 (user_id 1) + marker bucket 1
    StreamingUpliftBucketed.processBatch(spark, df(chunks(1)), 1L, dir) shouldBe true
    val after = snapshot()
    val touched = Set(s"bkt=${1L % B}", s"bkt=${math.floorMod(1L, B)}")
    before.keySet.diff(touched).foreach { untouchedBkt =>
      withClue(s"$untouchedBkt must be byte-identical: ") {
        after(untouchedBkt) shouldBe before(untouchedBkt)
      }
    }
    // ...and the touched bucket did change (the seam user's cell merged)
    after(s"bkt=1") should not be before.get(s"bkt=1").orNull
  }

  test("mid-publish crash is recovered exactly-once on the real code path") {
    val clean = tmpDir("upliftb-clean")
    val crashy = tmpDir("upliftb-crash")
    // reference: both batches applied cleanly. chunks(2) carries users
    // 1 AND 2 → two distinct user buckets, so its publish is genuinely
    // multi-directory and can be interrupted between renames.
    StreamingUpliftBucketed.processBatch(spark, df(chunks(0)), 0L, clean) shouldBe true
    StreamingUpliftBucketed.processBatch(spark, df(chunks(2)), 1L, clean) shouldBe true
    // crashy: batch 0 clean, then batch 1 "crashes" after ONE of its
    // staged buckets is published (the rest remain staged)
    StreamingUpliftBucketed.processBatch(spark, df(chunks(0)), 0L, crashy) shouldBe true
    val fs = new Path(crashy).getFileSystem(spark.sessionState.newHadoopConf())
    StreamingUpliftBucketed.stageBatch(spark, df(chunks(2)), 1L, crashy) shouldBe true
    StreamingUpliftBucketed.publishStaged(fs, crashy, maxBuckets = 1)
    fs.exists(new Path(crashy + "__batch_tmp")) shouldBe true // interrupted
    // replay of the SAME batch: entry recovery finishes the publish,
    // the marker is then present, and the fold is NOT applied twice
    StreamingUpliftBucketed.processBatch(spark, df(chunks(2)), 1L, crashy) shouldBe false
    fs.exists(new Path(crashy + "__batch_tmp")) shouldBe false
    cellsOf(crashy) shouldBe cellsOf(clean)
  }

  test("an uncommitted staging dir is discarded, state untouched") {
    val dir = tmpDir("upliftb-uncommitted")
    StreamingUpliftBucketed.processBatch(spark, df(chunks(0)), 0L, dir) shouldBe true
    val before = cellsOf(dir)
    // fake a crash DURING the staging write: staged dir without _SUCCESS
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(new Path(dir + "__batch_tmp/bkt=7"))
    StreamingUpliftBucketed.processBatch(spark, df(chunks(1)), 1L, dir) shouldBe true
    cellsOf(dir) should not be before
    fs.exists(new Path(dir + "__batch_tmp")) shouldBe false
  }

  test("two-chunk fold of the events table matches batch q255's decile table") {
    val dir = tmpDir("upliftb-full")
    val events = spark.read
      .parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("half", (col("event_id") % 2).cast("int"))
    (0 to 1).foreach { h =>
      StreamingUpliftBucketed.processBatch(
        spark, events.filter(col("half") === h).drop("half"), h.toLong,
        dir) shouldBe true
    }
    StreamingUpliftBucketed.report(spark, dir).collect().map(_.toSeq).toSet shouldBe
      graft.queries.EventAnalytics
        .q255UpliftDeciles(spark, "/root/testdata/sf0.001")
        .collect().map(_.toSeq).toSet
  }
}
