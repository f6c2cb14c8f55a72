package graft

import graft.streaming.{StreamingEvents, StreamingRollingMau}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp
import java.time.LocalDate

/** The streaming rolling-MAU membership index: counts after streaming
  * micro-batches (including OUT-OF-ORDER late days) must equal the
  * brute-force distinct-users-per-trailing-window over the combined
  * input, and batch replays must be no-ops.
  */
class StreamingRollingMauSpec extends SparkSpec {
  import StreamingEvents.Ev
  import spark.implicits._

  private def ev(id: Long, day: String, user: Long) =
    Ev(id, Timestamp.valueOf(s"$day 10:00:00"), user, "view", 1.0, "{}")

  /** The shared quadratic restatement (TrailingDistinctSpec.brute)
    * over the full fixture. */
  private def expected(evs: Seq[Ev]): Map[LocalDate, Long] =
    TrailingDistinctSpec.brute(
      evs.map(e => (e.ts.toLocalDateTime.toLocalDate, e.user_id)).distinct)

  private def readCounts(countsDir: String): Map[LocalDate, Long] =
    spark.read.parquet(countsDir).collect()
      .map(r => r.getDate(0).toLocalDate -> r.getLong(1)).toMap

  test("streamed counts equal brute force, including out-of-order late days") {
    val indexDir = tmpDir("mau-idx")
    val countsDir = tmpDir("mau-out") + "/counts"
    val batch1 = Seq(ev(1, "2024-01-01", 1), ev(2, "2024-01-03", 1), ev(3, "2024-01-01", 2))
    // batch 2 arrives later but contains an EARLIER day (late data) —
    // no watermark eviction exists to lose it
    val batch2 = Seq(ev(4, "2024-01-02", 3), ev(5, "2024-01-10", 1))

    val stream = MemoryStream[Ev](spark)
    val q = StreamingRollingMau.start(spark, stream.toDF(), indexDir, countsDir,
      tmpDir("mau-ckpt"))
    try {
      stream.addData(batch1); q.processAllAvailable()
      stream.addData(batch2); q.processAllAvailable()
    } finally q.stop()

    readCounts(countsDir) shouldBe expected(batch1 ++ batch2)
  }

  test("replaying a processed batch is a no-op (exactly-once counts)") {
    val indexDir = tmpDir("mau-idx2")
    val countsDir = tmpDir("mau-out2") + "/counts"
    val batch = Seq(ev(1, "2024-02-01", 7), ev(2, "2024-02-02", 8)).toDF()
    StreamingRollingMau.processBatch(spark, batch, indexDir, countsDir) should be > 0L
    val first = readCounts(countsDir)
    StreamingRollingMau.processBatch(spark, batch, indexDir, countsDir) shouldBe 0L
    readCounts(countsDir) shouldBe first
  }
}
