package graft.streaming

import graft.ops.TableSwap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Continuous Poisson-bootstrap intervals — the streaming twin of
  * batch q244, and the reason the POISSON bootstrap is the one that
  * scales: Chamandy et al. 2012 designed it for exactly this setting
  * (per-row independent weights ⇒ the replicate sums are additive
  * over any chunking), so "confidence intervals over the stream so
  * far" falls out of maintaining 2·B longs per group, where the
  * classic resample-n bootstrap would have to re-draw against the
  * full history every batch.
  *
  * Same decomposition contract as the other monitors: the maintained
  * state is the (priority, r, swx, sw) replicate cells plus the
  * (priority, n, sum) exact-leg partials — both merge by `+` — built
  * with EXACTLY batch q244's draws
  * ([[graft.queries.Analytics.bootCellPartials]] /
  * [[graft.queries.Analytics.bootExactPartials]], shared verbatim),
  * so the folded state is bit-equal to the batch partials over the
  * same rows and the q244 DuckDB oracle transitively verifies the
  * streaming intervals, whose rank/percentile tail is the literally
  * shared code path ([[graft.queries.Analytics.bootFinalize]]).
  *
  * Exactly-once under at-least-once delivery: applied-batch marker
  * rows ride the same state file, whole-state republish via one
  * crash-safe [[TableSwap]] — the StreamingCountMin contract
  * verbatim. Per-batch cost: O(batch rows · B) map-combined partials
  * + a keyed merge over the |priorities|·(B+1)-row state — bounded
  * by the report geometry, never by the stream.
  */
object StreamingBootstrap {

  import ParquetState.readOrEmpty

  /** One relation, three row kinds, one atomic swap:
    * kind='c' → (priority, r, swx, sw) replicate cells;
    * kind='e' → (priority, n_orders, sum_e2) exact partials;
    * kind='b' → markers. */
  private val StateDdl =
    "kind STRING, priority STRING, r BIGINT, swx BIGINT, sw BIGINT, " +
      "n_orders BIGINT, sum_e2 BIGINT, batch_id BIGINT"

  /** The maintained replicate cells. */
  def cells(spark: SparkSession, stateDir: String): DataFrame =
    readOrEmpty(spark, stateDir, StateDdl)
      .filter(col("kind") === "c")
      .select(col("priority"), col("r"), col("swx"), col("sw"))

  /** The maintained exact-leg partials. */
  def exactRows(spark: SparkSession, stateDir: String): DataFrame =
    readOrEmpty(spark, stateDir, StateDdl)
      .filter(col("kind") === "e")
      .select(col("priority"), col("n_orders"), col("sum_e2"))

  /** Fold one micro-batch of orders rows into the state at
    * `stateDir`. Returns false (state untouched) when `batchId` was
    * already applied. */
  def processBatch(
      spark: SparkSession, batch: DataFrame, batchId: Long,
      stateDir: String): Boolean = {
    val st = readOrEmpty(spark, stateDir, StateDdl)
    if (st.filter(col("kind") === "b" && col("batch_id") === batchId)
        .limit(1).count() > 0) return false

    val base = graft.queries.Analytics.bootBaseRows(batch)
    val nullL = lit(null).cast("bigint")
    val mergedCells = st.filter(col("kind") === "c")
      .select(col("priority"), col("r"), col("swx"), col("sw"))
      .unionByName(graft.queries.Analytics.bootCellPartials(base))
      .groupBy("priority", "r")
      .agg(sum(col("swx")).as("swx"), sum(col("sw")).as("sw"))
      .select(lit("c").as("kind"), col("priority"), col("r"),
        col("swx"), col("sw"), nullL.as("n_orders"), nullL.as("sum_e2"),
        nullL.as("batch_id"))
    val mergedExact = st.filter(col("kind") === "e")
      .select(col("priority"), col("n_orders"), col("sum_e2"))
      .unionByName(graft.queries.Analytics.bootExactPartials(base))
      .groupBy("priority")
      .agg(sum(col("n_orders")).as("n_orders"), sum(col("sum_e2")).as("sum_e2"))
      .select(lit("e").as("kind"), col("priority"), nullL.as("r"),
        nullL.as("swx"), nullL.as("sw"), col("n_orders"), col("sum_e2"),
        nullL.as("batch_id"))
    val markers = st.filter(col("kind") === "b").unionByName(
      spark.range(1).select(lit("b").as("kind"),
        lit(null).cast("string").as("priority"), nullL.as("r"),
        nullL.as("swx"), nullL.as("sw"), nullL.as("n_orders"),
        nullL.as("sum_e2"), lit(batchId).as("batch_id")))

    val fs = new org.apache.hadoop.fs.Path(stateDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val dst = new org.apache.hadoop.fs.Path(stateDir)
    val tmp = TableSwap.tmpPath(stateDir)
    TableSwap.recover(fs, dst, tmp)
    mergedCells.unionByName(mergedExact).unionByName(markers)
      .write.mode("overwrite").parquet(tmp.toString)
    TableSwap.publish(fs, dst, tmp)
    true
  }

  /** The interval report over the accumulated stream — batch q244's
    * columns, computed by the SHARED finalizer over the maintained
    * state. */
  def intervals(spark: SparkSession, stateDir: String): DataFrame =
    graft.queries.Analytics.bootFinalize(
      exactRows(spark, stateDir), cells(spark, stateDir))
}
