package graft

import graft.streaming.StreamingDpRelease
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Chunked-fold ≡ batch equality for the streaming DP release:
  * (source, lang) cell counts are exact under any chunking and the
  * noise is a deterministic function of the cell key alone, so the
  * maintained state's release must be BIT-EQUAL to batch q206's
  * mechanism over the same accumulated rows — plus replay no-op,
  * chunk-order independence, and a full-table pin against q206 itself
  * (the StreamingLDiversity template for the mechanism).
  */
class StreamingDpReleaseSpec extends SparkSpec {
  import spark.implicits._

  private val chunks: Seq[Seq[(Long, String, String)]] = Seq(
    Seq((1L, "webA", "en"), (2L, "webA", "en"), (3L, "webA", "fr")),
    Seq((4L, "bookB", "en"), (5L, "webA", "en")),
    Seq((6L, "bookB", "en"), (7L, "webA", "fr"), (8L, "s3", "en")))

  private def df(rows: Seq[(Long, String, String)]): DataFrame =
    rows.toDF("doc_id", "source", "lang")

  private def batchRows: Seq[Seq[Any]] =
    graft.queries.Profiling.dpReleaseFromCells(
      df(chunks.flatten)
        .groupBy("source", "lang").agg(count(lit(1)).as("n_docs")))
      .orderBy("source", "lang").collect().map(_.toSeq).toSeq

  private def streamRows(dir: String): Seq[Seq[Any]] =
    StreamingDpRelease.release(spark, dir)
      .orderBy("source", "lang").collect().map(_.toSeq).toSeq

  test("chunked fold releases bit-equal noised counts to batch q206") {
    val dir = tmpDir("dprel")
    chunks.zipWithIndex.foreach { case (c, i) =>
      StreamingDpRelease.processBatch(spark, df(c), i.toLong, dir) shouldBe true
    }
    streamRows(dir) shouldBe batchRows
  }

  test("chunk order does not matter; replay is a no-op") {
    val dir = tmpDir("dprel-order")
    chunks.reverse.zipWithIndex.foreach { case (c, i) =>
      StreamingDpRelease.processBatch(spark, df(c), i.toLong, dir) shouldBe true
    }
    streamRows(dir) shouldBe batchRows
    StreamingDpRelease.processBatch(spark, df(chunks(0)), 1L, dir) shouldBe false
    streamRows(dir) shouldBe batchRows
  }

  test("noise is key-stable: a cell's noise never changes as counts grow") {
    val dir = tmpDir("dprel-stable")
    StreamingDpRelease.processBatch(spark, df(chunks(0)), 0L, dir) shouldBe true
    val n1 = StreamingDpRelease.release(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    StreamingDpRelease.processBatch(spark, df(chunks(1)), 1L, dir) shouldBe true
    val n2 = StreamingDpRelease.release(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    n1.keySet.foreach(k => n2(k) shouldBe n1(k))
  }

  test("one-batch fold of the documents table matches batch q206 bit-for-bit") {
    val dir = tmpDir("dprel-full")
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    StreamingDpRelease.processBatch(spark, docs, 0L, dir) shouldBe true
    val want = graft.queries.Profiling
      .q206DpRelease(spark, "/root/testdata/sf0.001")
      .orderBy("source", "lang").collect().map(_.toSeq).toSeq
    streamRows(dir) shouldBe want
  }
}
