package graft

import graft.streaming.StreamingKAnonymity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Chunked-fold ≡ batch equality for the streaming k-anonymity
  * monitor: QI class counts are exact under any chunking, so the
  * maintained state's risk report must be BIT-EQUAL to batch q173's
  * finalizer over the same accumulated rows — plus replay no-op,
  * chunk-order independence, and a full-table pin against q173 itself.
  */
class StreamingKAnonymitySpec extends SparkSpec {
  import spark.implicits._

  private val qi = Seq("nat", "seg", "band")

  private val chunks: Seq[Seq[(Int, String, Long)]] = Seq(
    Seq((1, "A", 0L), (1, "A", 0L), (2, "B", 1L)),
    Seq((1, "A", 0L), (2, "B", 1L), (3, "C", 2L)),
    Seq((3, "C", 2L), (3, "C", 2L), (1, "A", 3L)))

  private def df(rows: Seq[(Int, String, Long)]): DataFrame =
    rows.toDF("nat", "seg", "band")

  private def batchRows: Seq[Seq[Any]] =
    graft.queries.Profiling.kanonFromSizes(
      df(chunks.flatten).groupBy("nat", "seg", "band")
        .agg(count(lit(1)).as("cls")))
      .orderBy("k").collect().map(_.toSeq).toSeq

  private def streamRows(dir: String): Seq[Seq[Any]] =
    StreamingKAnonymity.report(spark, dir)
      .orderBy("k").collect().map(_.toSeq).toSeq

  test("chunked fold reports bit-equal risk to the batch finalizer") {
    val dir = tmpDir("kanon")
    chunks.zipWithIndex.foreach { case (c, i) =>
      StreamingKAnonymity.processBatch(spark, df(c), i.toLong, dir, qi) shouldBe true
    }
    streamRows(dir) shouldBe batchRows
  }

  test("chunk order does not matter; replay is a no-op") {
    val dir = tmpDir("kanon-order")
    chunks.reverse.zipWithIndex.foreach { case (c, i) =>
      StreamingKAnonymity.processBatch(spark, df(c), i.toLong, dir, qi) shouldBe true
    }
    streamRows(dir) shouldBe batchRows
    StreamingKAnonymity.processBatch(
      spark, df(chunks(0)), 1L, dir, qi) shouldBe false
    streamRows(dir) shouldBe batchRows
  }

  test("one-batch fold of the customer table matches batch q173 bit-for-bit") {
    val dir = tmpDir("kanon-full")
    val customers = spark.read
      .parquet("/root/testdata/sf0.001/customer.parquet")
      .withColumn("bal_band", floor(col("c_acctbal") / 1000).cast("long"))
    StreamingKAnonymity.processBatch(spark, customers, 0L, dir,
      Seq("c_nationkey", "c_mktsegment", "bal_band")) shouldBe true
    val got = streamRows(dir)
    val want = graft.queries.Profiling
      .q173KAnonymity(spark, "/root/testdata/sf0.001")
      .orderBy("k").collect().map(_.toSeq).toSeq
    got shouldBe want
  }
}
