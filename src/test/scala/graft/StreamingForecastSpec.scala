package graft

import graft.streaming.StreamingForecast
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Chunked-fold ≡ batch equality for the streaming forecast state:
  * the (type, day, cents) daily relation is ADDITIVE — same-day
  * partials from different batches merge by + (the seam case: one
  * day's events split across chunks) — so the folded state must be
  * bit-equal to batch `forecastDaily` over the same rows under any
  * chunk order, replay must be a no-op, and every report must equal
  * its batch query verbatim (they share the finalizers, so this pins
  * the wiring, and the q268–q273 oracles transitively gate the rest).
  */
class StreamingForecastSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private def haveData =
    new java.io.File(s"$sfDir/events.parquet").exists()

  // day 2 is SPLIT across chunks 0 and 1 — the additive seam
  private val chunks: Seq[Seq[(Long, String, Double, String)]] = Seq(
    Seq((1L, "view", 1.00, "2024-01-01 01:00:00"),
      (2L, "view", 0.75, "2024-01-02 02:00:00")),
    Seq((3L, "view", 1.25, "2024-01-02 09:00:00"),
      (4L, "view", 3.00, "2024-01-03 01:00:00")),
    Seq((5L, "view", 4.00, "2024-01-04 01:00:00"),
      (6L, "click", 2.00, "2024-01-04 02:00:00")))

  private def df(rows: Seq[(Long, String, Double, String)]): DataFrame =
    rows.map { case (id, et, v, ts) => (id, id, et, v, ts) }
      .toDF("event_id", "user_id", "event_type", "value", "ts")
      .withColumn("ts", to_timestamp(col("ts")))

  private def batchCells: Set[Seq[Any]] =
    graft.queries.EventAnalytics.forecastDaily(df(chunks.flatten))
      .collect().map(_.toSeq).toSet

  test("chunked fold lands on the bit-equal batch daily relation") {
    val dir = tmpDir("fc")
    chunks.zipWithIndex.foreach { case (c, i) =>
      StreamingForecast.processBatch(spark, df(c), i.toLong, dir) shouldBe true
    }
    StreamingForecast.cells(spark, dir)
      .collect().map(_.toSeq).toSet shouldBe batchCells
  }

  test("chunk order does not matter; replay is a no-op") {
    val dir = tmpDir("fc-order")
    chunks.reverse.zipWithIndex.foreach { case (c, i) =>
      StreamingForecast.processBatch(spark, df(c), i.toLong, dir) shouldBe true
    }
    StreamingForecast.cells(spark, dir)
      .collect().map(_.toSeq).toSet shouldBe batchCells
    StreamingForecast.processBatch(spark, df(chunks(0)), 1L, dir) shouldBe false
    StreamingForecast.cells(spark, dir)
      .collect().map(_.toSeq).toSet shouldBe batchCells
  }

  test("all six reports equal their batch queries on the real corpus") {
    assume(haveData, s"$sfDir not present")
    val dir = tmpDir("fc-full")
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    // two chunks split by event_id parity: every day lands in BOTH
    StreamingForecast.processBatch(spark,
      events.filter(col("event_id") % 2 === 0), 0L, dir) shouldBe true
    StreamingForecast.processBatch(spark,
      events.filter(col("event_id") % 2 === 1), 1L, dir) shouldBe true
    val reports: Seq[(DataFrame, DataFrame)] = Seq(
      StreamingForecast.holtForecast(spark, dir) ->
        graft.queries.EventAnalytics.defs("q268_holt_forecast")(spark, sfDir),
      StreamingForecast.hwForecast(spark, dir) ->
        graft.queries.EventAnalytics.defs("q269_holt_winters")(spark, sfDir),
      StreamingForecast.backtestReport(spark, dir) ->
        graft.queries.EventAnalytics.defs("q270_forecast_backtest")(spark, sfDir),
      StreamingForecast.seasonalBacktestReport(spark, dir) ->
        graft.queries.EventAnalytics.defs("q271_seasonal_backtest")(spark, sfDir),
      StreamingForecast.conformalReport(spark, dir) ->
        graft.queries.EventAnalytics.defs("q272_conformal_intervals")(spark, sfDir),
      StreamingForecast.anomalyReport(spark, dir) ->
        graft.queries.EventAnalytics.defs("q273_residual_anomalies")(spark, sfDir))
    reports.foreach { case (stream, batch) =>
      stream.collect().map(_.toSeq).toSet shouldBe
        batch.collect().map(_.toSeq).toSet
    }
  }
}
