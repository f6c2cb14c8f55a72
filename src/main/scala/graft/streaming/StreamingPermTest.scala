package graft.streaming

import graft.ops.TableSwap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Continuous permutation test — the streaming twin of batch q245,
  * completing the round-12 resampling family's batch/stream symmetry
  * (the Poisson bootstrap has [[StreamingBootstrap]]): the sequential
  * A/B monitor that asks "is the parity split's mean difference
  * explainable by chance, given everything seen so far" after every
  * micro-batch, without re-drawing permutations over history.
  *
  * Why it streams at all: the relabeling is a pure (user, replicate)
  * bit, so a user's contribution to every permuted side is LINEAR in
  * their event aggregates — the (event_type, r) permuted sums and the
  * observed-leg partials both merge by `+` under any chunking of the
  * event stream. Both relations are built with EXACTLY batch q245's
  * code ([[graft.queries.EventAnalytics.permCellPartials]] /
  * [[graft.queries.EventAnalytics.permObsPartials]] over
  * [[graft.queries.EventAnalytics.permBaseCells]], shared verbatim),
  * so the folded state is bit-equal to the batch partials and the
  * q245 DuckDB oracle transitively verifies the streaming p-values,
  * whose rank/count tail is the literally shared
  * [[graft.queries.EventAnalytics.permFinalize]].
  *
  * Exactly-once under at-least-once delivery: applied-batch marker
  * rows ride the same state file, whole-state republish via one
  * crash-safe [[TableSwap]] — the StreamingCountMin contract
  * verbatim. Per-batch cost: O(batch cells · B) map-combined
  * partials + a keyed merge over the |types|·(B+1)-row state —
  * bounded by the report geometry, never by the stream.
  */
object StreamingPermTest {

  import ParquetState.readOrEmpty

  /** One relation, three row kinds, one atomic swap:
    * kind='c' → (event_type, r, pn0, pn1, ps0, ps1) permuted cells;
    * kind='o' → (event_type, n0, n1, s0, s1) observed partials;
    * kind='b' → markers. */
  private val StateDdl =
    "kind STRING, event_type STRING, r BIGINT, pn0 BIGINT, pn1 BIGINT, " +
      "ps0 BIGINT, ps1 BIGINT, n0 BIGINT, n1 BIGINT, s0 BIGINT, " +
      "s1 BIGINT, batch_id BIGINT"

  /** The maintained permuted-side cells. */
  def cells(spark: SparkSession, stateDir: String): DataFrame =
    readOrEmpty(spark, stateDir, StateDdl)
      .filter(col("kind") === "c")
      .select(col("event_type"), col("r"),
        col("pn0"), col("pn1"), col("ps0"), col("ps1"))

  /** The maintained observed-leg partials. */
  def obsRows(spark: SparkSession, stateDir: String): DataFrame =
    readOrEmpty(spark, stateDir, StateDdl)
      .filter(col("kind") === "o")
      .select(col("event_type"), col("n0"), col("n1"), col("s0"), col("s1"))

  /** Fold one micro-batch of events into the state at `stateDir`.
    * Returns false (state untouched) when `batchId` was already
    * applied. */
  def processBatch(
      spark: SparkSession, batch: DataFrame, batchId: Long,
      stateDir: String): Boolean = {
    val st = readOrEmpty(spark, stateDir, StateDdl)
    if (st.filter(col("kind") === "b" && col("batch_id") === batchId)
        .limit(1).count() > 0) return false

    val base = graft.queries.EventAnalytics.permBaseCells(batch)
    val nullL = lit(null).cast("bigint")
    val mergedCells = st.filter(col("kind") === "c")
      .select(col("event_type"), col("r"),
        col("pn0"), col("pn1"), col("ps0"), col("ps1"))
      .unionByName(graft.queries.EventAnalytics.permCellPartials(base))
      .groupBy("event_type", "r")
      .agg(sum(col("pn0")).as("pn0"), sum(col("pn1")).as("pn1"),
        sum(col("ps0")).as("ps0"), sum(col("ps1")).as("ps1"))
      .select(lit("c").as("kind"), col("event_type"), col("r"),
        col("pn0"), col("pn1"), col("ps0"), col("ps1"),
        nullL.as("n0"), nullL.as("n1"), nullL.as("s0"), nullL.as("s1"),
        nullL.as("batch_id"))
    val mergedObs = st.filter(col("kind") === "o")
      .select(col("event_type"), col("n0"), col("n1"), col("s0"), col("s1"))
      .unionByName(graft.queries.EventAnalytics.permObsPartials(base))
      .groupBy("event_type")
      .agg(sum(col("n0")).as("n0"), sum(col("n1")).as("n1"),
        sum(col("s0")).as("s0"), sum(col("s1")).as("s1"))
      .select(lit("o").as("kind"), col("event_type"), nullL.as("r"),
        nullL.as("pn0"), nullL.as("pn1"), nullL.as("ps0"), nullL.as("ps1"),
        col("n0"), col("n1"), col("s0"), col("s1"), nullL.as("batch_id"))
    val markers = st.filter(col("kind") === "b").unionByName(
      spark.range(1).select(lit("b").as("kind"),
        lit(null).cast("string").as("event_type"), nullL.as("r"),
        nullL.as("pn0"), nullL.as("pn1"), nullL.as("ps0"), nullL.as("ps1"),
        nullL.as("n0"), nullL.as("n1"), nullL.as("s0"), nullL.as("s1"),
        lit(batchId).as("batch_id")))

    val fs = new org.apache.hadoop.fs.Path(stateDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val dst = new org.apache.hadoop.fs.Path(stateDir)
    val tmp = TableSwap.tmpPath(stateDir)
    TableSwap.recover(fs, dst, tmp)
    mergedCells.unionByName(mergedObs).unionByName(markers)
      .write.mode("overwrite").parquet(tmp.toString)
    TableSwap.publish(fs, dst, tmp)
    true
  }

  /** The test report over the accumulated stream — batch q245's
    * columns, computed by the SHARED finalizer over the maintained
    * state. */
  def report(spark: SparkSession, stateDir: String): DataFrame =
    graft.queries.EventAnalytics.permFinalize(
      obsRows(spark, stateDir), cells(spark, stateDir))
}
