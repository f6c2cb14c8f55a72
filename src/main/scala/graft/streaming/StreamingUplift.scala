package graft.streaming

import graft.ops.TableSwap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Continuous uplift/Qini deciles — the streaming twin of batch q255:
  * the targeting table ("which score deciles does the treatment
  * actually help, and how steep is the Qini curve so far") refreshed
  * after every micro-batch without rescanning history — the campaign
  * monitor read WHILE the campaign runs, not after.
  *
  * Why it streams: the per-(user, arm) state is (pre-period score,
  * converted flag) — the score is a cents SUM (additive by `+` under
  * any chunking) and the flag an idempotent `max`, so a user whose
  * spend and conversion arrive in different batches folds to exactly
  * the cell the single batch would produce (the seam case the spec
  * pins). Cells are built with EXACTLY batch q255's code
  * ([[graft.queries.EventAnalytics.upliftCells]], shared verbatim)
  * and the report is the literally shared
  * [[graft.queries.EventAnalytics.upliftFinalize]] — the r13
  * DISTRIBUTED rank (score-cell prefix + uid-bucket prefix + bounded
  * row_number + closed-form ntile), so the q255 DuckDB oracle
  * transitively verifies the streaming decile table, and the report
  * path inherits the same no-single-task-sort scale property the
  * batch plan is pinned to.
  *
  * Exactly-once under at-least-once delivery: applied-batch marker
  * rows ride the same state file, whole-state republish via one
  * crash-safe [[TableSwap]] — the StreamingCountMin contract
  * verbatim. Per-batch cost: O(batch rows) map-combined cell partials
  * + a keyed merge over the user-sized state (the StreamingRollingMau
  * membership-index scale).
  */
object StreamingUplift {

  import ParquetState.readOrEmpty

  /** One relation, two row kinds, one atomic swap:
    * kind='c' → (user_id, treat, score, conv) uplift cells;
    * kind='b' → markers. */
  private val StateDdl =
    "kind STRING, user_id BIGINT, treat BOOLEAN, score BIGINT, " +
      "conv BIGINT, batch_id BIGINT"

  /** The maintained uplift cells. */
  def cells(spark: SparkSession, stateDir: String): DataFrame =
    readOrEmpty(spark, stateDir, StateDdl)
      .filter(col("kind") === "c")
      .select(col("user_id"), col("treat"), col("score"), col("conv"))

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
      .select(col("user_id"), col("treat"), col("score"), col("conv"))
      .unionByName(graft.queries.EventAnalytics.upliftCells(batch))
      .groupBy("user_id", "treat")
      .agg(sum(col("score")).as("score"), max(col("conv")).as("conv"))
      .select(lit("c").as("kind"), col("user_id"), col("treat"),
        col("score"), col("conv"), nullL.as("batch_id"))
    val markers = st.filter(col("kind") === "b").unionByName(
      spark.range(1).select(lit("b").as("kind"), nullL.as("user_id"),
        lit(null).cast("boolean").as("treat"),
        nullL.as("score"), nullL.as("conv"), lit(batchId).as("batch_id")))

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

  /** The uplift-decile/Qini report over the accumulated stream —
    * batch q255's columns, computed by the SHARED finalizer. */
  def report(spark: SparkSession, stateDir: String): DataFrame =
    graft.queries.EventAnalytics.upliftFinalize(cells(spark, stateDir))
}
