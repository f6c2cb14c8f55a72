package graft

import graft.queries.EventAnalytics
import graft.streaming.{StreamingAnomaly, StreamingEvents}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Pins the streaming anomaly monitors against their batch twins:
  * folding the events table through the hourly count state in chunks
  * (out-of-order, with a replay) must leave [[StreamingAnomaly]]'s
  * changepoints/seasonal EXACTLY equal to batch q134/q135 over the
  * same rows — the q134/q135 DuckDB oracles then transitively verify
  * the streaming finalizers. */
class StreamingAnomalySpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def haveData = new java.io.File(s"$sfDir/events.parquet").exists()

  private def canon(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.mkString("\u0001")).toSet

  test("chunked out-of-order fold + replay equals batch q134/q135") {
    assume(haveData, s"$sfDir not present")
    val stateDir = tmpDir("anomaly-state") + "/hourly"
    val events = Tables.events(spark, sfDir)

    // three chunks, folded OUT OF ORDER (2, 0, 1): hour buckets merge
    // by +, so arrival order must not matter; then replay batch id 0 —
    // the marker row must make it a provable no-op
    val chunks = Seq(0, 1, 2).map(i => events.filter(col("event_id") % 3 === i))
    StreamingAnomaly.processBatch(spark, chunks(2), 2L, stateDir) shouldBe true
    StreamingAnomaly.processBatch(spark, chunks(0), 0L, stateDir) shouldBe true
    StreamingAnomaly.processBatch(spark, chunks(1), 1L, stateDir) shouldBe true
    StreamingAnomaly.processBatch(spark, chunks(0), 0L, stateDir) shouldBe false

    // maintained state equals the one-shot hourly rollup
    canon(StreamingAnomaly.hourlyCounts(spark, stateDir)) shouldBe
      canon(events.groupBy(col("event_type"), date_trunc("HOUR", col("ts")).as("hour_ts"))
        .agg(count(lit(1)).as("cnt")))

    // finalizers over the state equal the batch queries over raw events
    canon(StreamingAnomaly.changepoints(spark, stateDir)) shouldBe
      canon(EventAnalytics.q134CusumChangepoint(spark, sfDir))
    canon(StreamingAnomaly.seasonal(spark, stateDir)) shouldBe
      canon(EventAnalytics.q135SeasonalBaseline(spark, sfDir))
  }

  test("end-to-end MemoryStream run matches batch over the same events") {
    import spark.implicits._
    val stateDir = tmpDir("anomaly-state-e2e") + "/hourly"
    def ev(id: Long, t: String, typ: String) =
      StreamingEvents.Ev(id, java.sql.Timestamp.valueOf(t), id % 5, typ, 1.0, "{}")
    val evs = (
      (1 to 40).map(i => ev(i.toLong, f"2024-03-${i % 9 + 1}%02d ${i % 23}%02d:15:00", "view")) ++
      (1 to 25).map(i => ev(100L + i, f"2024-03-${i % 7 + 3}%02d ${i % 11}%02d:45:00", "click"))
    )

    val stream = MemoryStream[StreamingEvents.Ev](spark)
    val q = StreamingAnomaly.start(spark, stream.toDF(), stateDir, tmpDir("anomaly-ckpt"))
    try {
      stream.addData(evs.take(30)); q.processAllAvailable()
      stream.addData(evs.drop(30)); q.processAllAvailable()
    } finally q.stop()

    canon(StreamingAnomaly.changepoints(spark, stateDir)) shouldBe
      canon(EventAnalytics.cusumFromDaily(
        evs.toDF().groupBy(col("event_type"), date_trunc("DAY", col("ts")).as("day"))
          .agg(count(lit(1)).as("x"))))
    canon(StreamingAnomaly.seasonal(spark, stateDir)) shouldBe
      canon(EventAnalytics.seasonalFromHourly(
        evs.toDF().groupBy(col("event_type"), date_trunc("HOUR", col("ts")).as("hour_ts"))
          .agg(count(lit(1)).as("cnt"))))
  }
}
