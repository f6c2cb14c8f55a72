package graft

import graft.streaming.StreamingHll
import org.apache.spark.sql.DataFrame

/** Chunked-fold ≡ batch equality for the streaming HyperLogLog:
  * registers merge by max under any chunking (HLL's mergeable
  * property) and the decomposition is batch q129's, so the folded
  * registers must be BIT-EQUAL to the single-batch registers over the
  * same rows — plus replay no-op, chunk-order independence, and an
  * events-table estimate cross-checked against the exact distinct
  * count within the m = 16 error envelope.
  */
class StreamingHllSpec extends SparkSpec {
  import spark.implicits._

  private val chunks: Seq[Seq[Long]] = Seq(
    Seq(1L, 2L, 3L), Seq(2L, 4L), Seq(5L, 1L, 6L, 7L))

  private def df(users: Seq[Long]): DataFrame = users.toDF("user_id")

  private def batchRegisters: Set[Seq[Any]] =
    StreamingHll.registerPartials(df(chunks.flatten))
      .collect().map(_.toSeq).toSet

  test("chunked fold lands on the bit-equal batch registers") {
    val dir = tmpDir("hll")
    chunks.zipWithIndex.foreach { case (c, i) =>
      StreamingHll.processBatch(spark, df(c), i.toLong, dir) shouldBe true
    }
    StreamingHll.registers(spark, dir)
      .collect().map(_.toSeq).toSet shouldBe batchRegisters
  }

  test("chunk order does not matter; replay is a no-op") {
    val dir = tmpDir("hll-order")
    chunks.reverse.zipWithIndex.foreach { case (c, i) =>
      StreamingHll.processBatch(spark, df(c), i.toLong, dir) shouldBe true
    }
    StreamingHll.registers(spark, dir)
      .collect().map(_.toSeq).toSet shouldBe batchRegisters
    StreamingHll.processBatch(spark, df(chunks(0)), 1L, dir) shouldBe false
    StreamingHll.registers(spark, dir)
      .collect().map(_.toSeq).toSet shouldBe batchRegisters
  }

  test("estimate tracks the exact distinct count over the events table") {
    val dir = tmpDir("hll-est")
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select("user_id")
    StreamingHll.processBatch(spark, ev, 0L, dir) shouldBe true
    val est = StreamingHll.estimate(spark, dir)
    val exact = ev.distinct().count()
    // m = 16 ⇒ rsd ≈ 26%; this fixed hash realization must land
    // within a generous 3-sigma envelope of the truth
    est should be > (exact * 22 / 100)
    est should be < (exact * 280 / 100)
  }
}
