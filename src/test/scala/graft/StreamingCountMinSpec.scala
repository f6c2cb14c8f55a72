package graft

import graft.streaming.StreamingCountMin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Chunked-fold ≡ batch equality for the streaming count-min sketch:
  * counters merge by `+` under any chunking (the CMS mergeable
  * property) and the row hashes are batch q215's, so the folded state
  * must be BIT-EQUAL to the batch sketch over the same rows, and
  * estimates keep the one-sided never-under-count guarantee — plus
  * replay no-op, chunk-order independence, and a full-table pin
  * against q215's estimates.
  */
class StreamingCountMinSpec extends SparkSpec {
  import spark.implicits._

  private val chunks: Seq[Seq[(Long, String)]] = Seq(
    Seq((1L, "a a b"), (2L, "c b a")),
    Seq((3L, "a b c d")),
    Seq((4L, "d d d a"), (5L, "b")))

  private def df(rows: Seq[(Long, String)]): DataFrame =
    rows.map { case (id, t) => (id, t, "en", "w") }
      .toDF("doc_id", "text", "lang", "source")

  private def batchCells: Set[Seq[Any]] =
    graft.queries.Profiling.cmsCellPartials(
      graft.queries.Profiling.cmsTokens(df(chunks.flatten)))
      .collect().map(_.toSeq).toSet

  test("chunked fold lands on the bit-equal batch sketch") {
    val dir = tmpDir("cms")
    chunks.zipWithIndex.foreach { case (c, i) =>
      StreamingCountMin.processBatch(spark, df(c), i.toLong, dir) shouldBe true
    }
    StreamingCountMin.cells(spark, dir)
      .collect().map(_.toSeq).toSet shouldBe batchCells
  }

  test("chunk order does not matter; replay is a no-op") {
    val dir = tmpDir("cms-order")
    chunks.reverse.zipWithIndex.foreach { case (c, i) =>
      StreamingCountMin.processBatch(spark, df(c), i.toLong, dir) shouldBe true
    }
    StreamingCountMin.cells(spark, dir)
      .collect().map(_.toSeq).toSet shouldBe batchCells
    StreamingCountMin.processBatch(spark, df(chunks(0)), 1L, dir) shouldBe false
    StreamingCountMin.cells(spark, dir)
      .collect().map(_.toSeq).toSet shouldBe batchCells
  }

  test("estimates never under-count the accumulated stream; unseen → 0") {
    val dir = tmpDir("cms-est")
    chunks.zipWithIndex.foreach { case (c, i) =>
      StreamingCountMin.processBatch(spark, df(c), i.toLong, dir)
    }
    val exact = graft.queries.Profiling.cmsTokens(df(chunks.flatten))
      .groupBy("t").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = StreamingCountMin
      .estimate(spark, dir, Seq("a", "b", "c", "d", "never-seen"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (t, n) => est(t) should be >= n }
    est("never-seen") shouldBe 0L
  }

  test("one-batch fold of the documents table matches batch q215's estimates") {
    val dir = tmpDir("cms-full")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    StreamingCountMin.processBatch(spark, docs, 0L, dir) shouldBe true
    val want = graft.queries.Profiling
      .q215CountMinSketch(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val est = StreamingCountMin.estimate(spark, dir, want.keys.toSeq)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    est shouldBe want
  }
}
