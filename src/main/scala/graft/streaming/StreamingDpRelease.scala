package graft.streaming

import graft.ops.TableSwap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Continuous differentially-private release — the streaming twin of
  * batch q206, extending the privacy family's batch/stream symmetry
  * from its three AUDITS ([[StreamingKAnonymity]],
  * [[StreamingLDiversity]] and its t-closeness readout) to its
  * MECHANISM: as documents arrive, maintain the (source, lang)
  * doc-count histogram and publish it at any point under the same
  * hash-seeded two-sided geometric noise as the batch release.
  *
  * Same decomposition contract as the other privacy monitors: the
  * maintained state is the cell COUNTS, which merge by `+` under ANY
  * chunking, and the release re-runs the EXACT batch finalizer
  * ([[graft.queries.Profiling.dpReleaseFromCells]], shared verbatim).
  * Because the noise is a deterministic function of the CELL KEY
  * alone, a cell's noise never changes across publishes — repeated
  * releases of a growing stream leak nothing beyond the single-release
  * budget per count snapshot, and the q206 DuckDB oracle transitively
  * verifies the streaming math. StreamingDpReleaseSpec pins
  * chunked-fold ≡ batch BIT-EQUALITY.
  *
  * Exactly-once under at-least-once delivery: applied-batch marker
  * rows ride the same state file and the whole state republishes via
  * one crash-safe [[TableSwap]] — the StreamingKAnonymity contract
  * verbatim. Per-batch cost: O(batch) map-combined cell partials + a
  * keyed merge over the |source × lang|-row state — bounded by the
  * attribute domains, never by documents seen.
  */
object StreamingDpRelease {

  import ParquetState.readOrEmpty

  /** One relation, two row kinds, one atomic swap:
    * kind='c' → (source, lang, cnt) cells; kind='b' → markers. */
  private val StateDdl =
    "kind STRING, source STRING, lang STRING, cnt BIGINT, batch_id BIGINT"

  /** Collapse a raw micro-batch to (source, lang) cell partials — the
    * only pass over batch rows (map-side combined). */
  private[graft] def cellPartials(batch: DataFrame): DataFrame =
    batch
      .groupBy(col("source").cast("string").as("source"),
        col("lang").cast("string").as("lang"))
      .agg(count(lit(1)).as("cnt"))

  /** The maintained (source, lang) cell counts. */
  def cells(spark: SparkSession, stateDir: String): DataFrame =
    readOrEmpty(spark, stateDir, StateDdl)
      .filter(col("kind") === "c")
      .select(col("source"), col("lang"), col("cnt"))

  /** Fold one micro-batch into the cell state at `stateDir`. Returns
    * false (state untouched) when `batchId` was already applied. */
  def processBatch(
      spark: SparkSession, batch: DataFrame, batchId: Long,
      stateDir: String): Boolean = {
    val st = readOrEmpty(spark, stateDir, StateDdl)
    if (st.filter(col("kind") === "b" && col("batch_id") === batchId)
        .limit(1).count() > 0) return false

    val merged = st.filter(col("kind") === "c")
      .select(col("source"), col("lang"), col("cnt"))
      .unionByName(cellPartials(batch))
      .groupBy(col("source"), col("lang"))
      .agg(sum(col("cnt")).as("cnt"))
      .select(lit("c").as("kind"), col("source"), col("lang"),
        col("cnt"), lit(null).cast("bigint").as("batch_id"))
    val markers = st.filter(col("kind") === "b").unionByName(
      spark.range(1).select(lit("b").as("kind"),
        lit(null).cast("string").as("source"),
        lit(null).cast("string").as("lang"),
        lit(null).cast("bigint").as("cnt"),
        lit(batchId).as("batch_id")))

    val fs = new org.apache.hadoop.fs.Path(stateDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val dst = new org.apache.hadoop.fs.Path(stateDir)
    val tmp = TableSwap.tmpPath(stateDir)
    TableSwap.recover(fs, dst, tmp)
    merged.unionByName(markers).write.mode("overwrite").parquet(tmp.toString)
    TableSwap.publish(fs, dst, tmp)
    true
  }

  /** The current noised release — the EXACT batch mechanism over the
    * maintained cells (shared verbatim with q206). */
  def release(spark: SparkSession, stateDir: String): DataFrame =
    graft.queries.Profiling.dpReleaseFromCells(
      cells(spark, stateDir).withColumnRenamed("cnt", "n_docs"))
}
