package graft

import graft.streaming.StreamingAmsF2
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Chunked-fold ≡ batch equality for the streaming AMS F2 sketch:
  * tug-of-war counters merge by `+` under any chunking (signs are a
  * pure function of the token) and the sign hashes are batch q222's,
  * so the folded state must be BIT-EQUAL to the batch counters over
  * the same rows — plus replay no-op, chunk-order independence, and a
  * full-table pin of estimateF2 against q222's estimate columns.
  */
class StreamingAmsF2Spec extends SparkSpec {
  import spark.implicits._

  private val chunks: Seq[Seq[(Long, String)]] = Seq(
    Seq((1L, "a a b"), (2L, "c b a")),
    Seq((3L, "a b c d")),
    Seq((4L, "d d d a"), (5L, "b")))

  private def df(rows: Seq[(Long, String)]): DataFrame =
    rows.map { case (id, t) => (id, t, "en", "w") }
      .toDF("doc_id", "text", "lang", "source")

  private def batchCounters: Set[Seq[Any]] =
    graft.queries.Profiling.amsCounterPartials(
      graft.queries.Profiling.cmsTokens(df(chunks.flatten)))
      .collect().map(_.toSeq).toSet

  test("chunked fold lands on the bit-equal batch counters") {
    val dir = tmpDir("ams")
    chunks.zipWithIndex.foreach { case (c, i) =>
      StreamingAmsF2.processBatch(spark, df(c), i.toLong, dir) shouldBe true
    }
    StreamingAmsF2.counters(spark, dir)
      .collect().map(_.toSeq).toSet shouldBe batchCounters
  }

  test("chunk order does not matter; replay is a no-op") {
    val dir = tmpDir("ams-order")
    chunks.reverse.zipWithIndex.foreach { case (c, i) =>
      StreamingAmsF2.processBatch(spark, df(c), i.toLong, dir) shouldBe true
    }
    StreamingAmsF2.counters(spark, dir)
      .collect().map(_.toSeq).toSet shouldBe batchCounters
    StreamingAmsF2.processBatch(spark, df(chunks(0)), 1L, dir) shouldBe false
    StreamingAmsF2.counters(spark, dir)
      .collect().map(_.toSeq).toSet shouldBe batchCounters
  }

  test("chunked fold of the documents table matches batch q222's estimate") {
    val dir = tmpDir("ams-full")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("half", (col("doc_id") % 2).cast("int"))
    // two half-corpus chunks, so the full-table pin also exercises a
    // real merge, not just a single fold
    (0 to 1).foreach { h =>
      StreamingAmsF2.processBatch(
        spark, docs.filter(col("half") === h).drop("half"), h.toLong,
        dir) shouldBe true
    }
    val want = graft.queries.Profiling
      .q222AmsF2(spark, "/root/testdata/sf0.001")
      .select("est_f2", "est_min", "est_max")
      .collect().map(_.toSeq).toSeq
    StreamingAmsF2.estimateF2(spark, dir)
      .select("est_f2", "est_min", "est_max")
      .collect().map(_.toSeq).toSeq shouldBe want
  }
}
