package graft

import graft.streaming.StreamingFdMonitor
import org.apache.spark.sql.DataFrame

/** Chunked-fold ≡ batch equality for the streaming FD monitor: cell
  * counts are exact under any chunking, so the maintained state's g3
  * report must be BIT-EQUAL to batch q167's fdProfile over the same
  * accumulated rows — plus replay no-op and chunk-order independence.
  */
class StreamingFdMonitorSpec extends SparkSpec {
  import spark.implicits._

  private val chunks: Seq[Seq[(String, String)]] = Seq(
    Seq(("a", "1"), ("a", "2"), ("b", "3")),
    Seq(("a", "2"), ("b", "3"), ("c", "4")),
    Seq(("a", "2"), ("c", "5"), ("c", "5")))

  private def df(rows: Seq[(String, String)]): DataFrame = rows.toDF("x", "y")

  private def batchRow: Seq[Any] = {
    val r = graft.queries.Profiling
      .fdProfile(df(chunks.flatten), "t.x->y", "x", "y").head()
    r.toSeq
  }

  private def streamRow(dir: String): Seq[Any] =
    StreamingFdMonitor.report(spark, dir, "t.x->y").head().toSeq

  test("chunked fold reports bit-equal g3 to the batch profile") {
    val dir = tmpDir("fdmon")
    chunks.zipWithIndex.foreach { case (c, i) =>
      StreamingFdMonitor.processBatch(spark, df(c), i.toLong, dir, "x", "y") shouldBe true
    }
    streamRow(dir) shouldBe batchRow
  }

  test("chunk order does not matter; replay is a no-op") {
    val dir = tmpDir("fdmon-order")
    chunks.reverse.zipWithIndex.foreach { case (c, i) =>
      StreamingFdMonitor.processBatch(spark, df(c), i.toLong, dir, "x", "y") shouldBe true
    }
    streamRow(dir) shouldBe batchRow
    // replaying an applied batch id changes nothing
    StreamingFdMonitor.processBatch(
      spark, df(chunks(0)), 1L, dir, "x", "y") shouldBe false
    streamRow(dir) shouldBe batchRow
  }
}
