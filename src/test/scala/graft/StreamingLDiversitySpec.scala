package graft

import graft.streaming.StreamingLDiversity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Chunked-fold ≡ batch equality for the streaming l-diversity
  * monitor: (QI, sensitive) cell counts are exact under any chunking,
  * so the maintained state's diversity report must be BIT-EQUAL to
  * batch q188's finalizer over the same accumulated rows — plus replay
  * no-op, chunk-order independence, and a full-table pin against q188
  * itself (the StreamingKAnonymitySpec template one level finer).
  */
class StreamingLDiversitySpec extends SparkSpec {
  import spark.implicits._

  private val qi = Seq("nat", "band")

  // sensitive value repeats inside class (1, 0): homogeneous at l=2
  private val chunks: Seq[Seq[(Int, Long, String)]] = Seq(
    Seq((1, 0L, "A"), (1, 0L, "A"), (2, 1L, "B")),
    Seq((1, 0L, "A"), (2, 1L, "C"), (3, 2L, "C")),
    Seq((3, 2L, "B"), (3, 2L, "C"), (1, 3L, "A")))

  private def df(rows: Seq[(Int, Long, String)]): DataFrame =
    rows.toDF("nat", "band", "seg")

  private def batchRows: Seq[Seq[Any]] =
    graft.queries.Profiling.ldivFromCells(
      df(chunks.flatten)
        .groupBy(col("nat").as("q1"), col("band").as("q2"),
          col("seg").as("sens"))
        .agg(count(lit(1)).as("cell")))
      .orderBy("l").collect().map(_.toSeq).toSeq

  private def streamRows(dir: String): Seq[Seq[Any]] =
    StreamingLDiversity.report(spark, dir)
      .orderBy("l").collect().map(_.toSeq).toSeq

  test("chunked fold reports bit-equal diversity risk to the batch finalizer") {
    val dir = tmpDir("ldiv")
    chunks.zipWithIndex.foreach { case (c, i) =>
      StreamingLDiversity.processBatch(
        spark, df(c), i.toLong, dir, qi, "seg") shouldBe true
    }
    streamRows(dir) shouldBe batchRows
  }

  test("chunk order does not matter; replay is a no-op") {
    val dir = tmpDir("ldiv-order")
    chunks.reverse.zipWithIndex.foreach { case (c, i) =>
      StreamingLDiversity.processBatch(
        spark, df(c), i.toLong, dir, qi, "seg") shouldBe true
    }
    streamRows(dir) shouldBe batchRows
    StreamingLDiversity.processBatch(
      spark, df(chunks(0)), 1L, dir, qi, "seg") shouldBe false
    streamRows(dir) shouldBe batchRows
  }

  test("one-batch fold of the customer table matches batch q188 bit-for-bit") {
    val dir = tmpDir("ldiv-full")
    val customers = spark.read
      .parquet("/root/testdata/sf0.001/customer.parquet")
      .withColumn("bal_band", floor(col("c_acctbal") / 1000).cast("long"))
    StreamingLDiversity.processBatch(spark, customers, 0L, dir,
      Seq("c_nationkey", "bal_band"), "c_mktsegment") shouldBe true
    val got = streamRows(dir)
    val want = graft.queries.Profiling
      .q188LDiversity(spark, "/root/testdata/sf0.001")
      .orderBy("l").collect().map(_.toSeq).toSeq
    got shouldBe want
  }
}
