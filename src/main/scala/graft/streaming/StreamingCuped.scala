package graft.streaming

import graft.ops.TableSwap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Continuous CUPED — the streaming twin of batch q250: the
  * variance-reduced A/B readout ("what is the adjusted treatment
  * effect, and how much variance is the covariate still buying")
  * refreshed after every micro-batch without rescanning history.
  *
  * Why it streams: the per-(type, user, arm) covariate/outcome cells
  * are cents SUMS — a user's even-day X and odd-day Y accumulate by
  * `+` under any chunking of the event stream, so the folded state is
  * bit-equal to the single-batch cells. The cells are built with
  * EXACTLY batch q250's code
  * ([[graft.queries.EventAnalytics.cupedCells]], shared verbatim) and
  * the report is the literally shared
  * [[graft.queries.EventAnalytics.cupedFinalize]], so the q250 DuckDB
  * oracle transitively verifies the streaming θ / adjusted-diff / ρ²
  * columns.
  *
  * Exactly-once under at-least-once delivery: applied-batch marker
  * rows ride the same state file, whole-state republish via one
  * crash-safe [[TableSwap]] — the StreamingCountMin contract
  * verbatim. Per-batch cost: O(batch rows) map-combined cell partials
  * + a keyed merge over the (type, user)-sized state — the same
  * membership-index scale the StreamingRollingMau contract already
  * admits.
  */
object StreamingCuped {

  import ParquetState.readOrEmpty

  /** One relation, two row kinds, one atomic swap:
    * kind='c' → (event_type, user_id, treat, x, y) covariate cells;
    * kind='b' → markers. */
  private val StateDdl =
    "kind STRING, event_type STRING, user_id BIGINT, treat BOOLEAN, " +
      "x BIGINT, y BIGINT, batch_id BIGINT"

  /** The maintained covariate cells. */
  def cells(spark: SparkSession, stateDir: String): DataFrame =
    readOrEmpty(spark, stateDir, StateDdl)
      .filter(col("kind") === "c")
      .select(col("event_type"), col("user_id"), col("treat"),
        col("x"), col("y"))

  /** Fold one micro-batch of events into the state at `stateDir`.
    * Returns false (state untouched) when `batchId` was already
    * applied. */
  def processBatch(
      spark: SparkSession, batch: DataFrame, batchId: Long,
      stateDir: String): Boolean = {
    val st = readOrEmpty(spark, stateDir, StateDdl)
    if (st.filter(col("kind") === "b" && col("batch_id") === batchId)
        .limit(1).count() > 0) return false

    val nullL = lit(null).cast("bigint")
    val mergedCells = st.filter(col("kind") === "c")
      .select(col("event_type"), col("user_id"), col("treat"),
        col("x"), col("y"))
      .unionByName(graft.queries.EventAnalytics.cupedCells(batch))
      .groupBy("event_type", "user_id", "treat")
      .agg(sum(col("x")).as("x"), sum(col("y")).as("y"))
      .select(lit("c").as("kind"), col("event_type"), col("user_id"),
        col("treat"), col("x"), col("y"), nullL.as("batch_id"))
    val markers = st.filter(col("kind") === "b").unionByName(
      spark.range(1).select(lit("b").as("kind"),
        lit(null).cast("string").as("event_type"), nullL.as("user_id"),
        lit(null).cast("boolean").as("treat"),
        nullL.as("x"), nullL.as("y"), lit(batchId).as("batch_id")))

    val fs = new org.apache.hadoop.fs.Path(stateDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val dst = new org.apache.hadoop.fs.Path(stateDir)
    val tmp = TableSwap.tmpPath(stateDir)
    TableSwap.recover(fs, dst, tmp)
    mergedCells.unionByName(markers)
      .write.mode("overwrite").parquet(tmp.toString)
    TableSwap.publish(fs, dst, tmp)
    true
  }

  /** The CUPED report over the accumulated stream — batch q250's
    * columns, computed by the SHARED finalizer. */
  def report(spark: SparkSession, stateDir: String): DataFrame =
    graft.queries.EventAnalytics.cupedFinalize(cells(spark, stateDir))
}
