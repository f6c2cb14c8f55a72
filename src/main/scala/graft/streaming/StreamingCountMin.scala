package graft.streaming

import graft.ops.TableSwap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Continuous count-min sketch — the streaming twin of batch q215,
  * completing the sketch family's batch/stream symmetry (q169's
  * Misra–Gries has [[StreamingHeavyHitters]]; this gives the frequency
  * QUERY its continuous form): as documents arrive, maintain the
  * 4×1024 counter relation and answer point-frequency queries at any
  * moment — the classic use of CMS as the unbounded-stream frequency
  * oracle.
  *
  * Same decomposition contract as the other monitors: the maintained
  * state is the CELL counters, which merge by `+` under ANY chunking
  * (CMS's defining mergeable property), built with EXACTLY batch
  * q215's row hashes ([[graft.queries.Profiling.cmsCellPartials]],
  * shared verbatim) — so the folded state is bit-equal to the batch
  * sketch over the same rows and the q215 DuckDB oracle transitively
  * verifies the streaming estimates. The one-sided guarantee survives
  * streaming unchanged: estimates never under-count the accumulated
  * stream. StreamingCountMinSpec pins chunked-fold ≡ batch
  * BIT-EQUALITY plus the guarantee.
  *
  * Exactly-once under at-least-once delivery: applied-batch marker
  * rows ride the same state file, whole-state republish via one
  * crash-safe [[TableSwap]] — the StreamingKAnonymity contract
  * verbatim. Per-batch cost: O(batch tokens) map-combined partials +
  * a keyed merge over the ≤4096-row state — bounded by the sketch
  * geometry, never by the stream.
  */
object StreamingCountMin {

  import ParquetState.readOrEmpty

  /** One relation, two row kinds, one atomic swap:
    * kind='c' → (r, c, n) counters; kind='b' → markers. */
  private val StateDdl =
    "kind STRING, r BIGINT, c BIGINT, n BIGINT, batch_id BIGINT"

  /** The maintained counter cells. */
  def cells(spark: SparkSession, stateDir: String): DataFrame =
    readOrEmpty(spark, stateDir, StateDdl)
      .filter(col("kind") === "c")
      .select(col("r"), col("c"), col("n"))

  /** Fold one micro-batch of documents into the sketch at `stateDir`.
    * Returns false (state untouched) when `batchId` was already
    * applied. */
  def processBatch(
      spark: SparkSession, batch: DataFrame, batchId: Long,
      stateDir: String): Boolean = {
    val st = readOrEmpty(spark, stateDir, StateDdl)
    if (st.filter(col("kind") === "b" && col("batch_id") === batchId)
        .limit(1).count() > 0) return false

    val merged = st.filter(col("kind") === "c")
      .select(col("r"), col("c"), col("n"))
      .unionByName(graft.queries.Profiling.cmsCellPartials(
        graft.queries.Profiling.cmsTokens(batch)))
      .groupBy(col("r"), col("c"))
      .agg(sum(col("n")).as("n"))
      .select(lit("c").as("kind"), col("r"), col("c"), col("n"),
        lit(null).cast("bigint").as("batch_id"))
    val markers = st.filter(col("kind") === "b").unionByName(
      spark.range(1).select(lit("b").as("kind"),
        lit(null).cast("bigint").as("r"),
        lit(null).cast("bigint").as("c"),
        lit(null).cast("bigint").as("n"),
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

  /** Point-frequency estimates for a requested token list (control
    * plane — a query list, like q57's centroids): min over the token's
    * CmsRows counters, exactly batch q215's probe. Tokens none of
    * whose cells exist yet estimate 0. */
  def estimate(spark: SparkSession, stateDir: String,
      tokens: Seq[String]): DataFrame = {
    import spark.implicits._
    val probes = tokens.toDF("t")
      .select(col("t"),
        explode(graft.queries.Profiling.cmsRcArr(col("t"))).as("rc"))
    probes
      .join(broadcast(cells(spark, stateDir)),
        probes("rc.r") === col("r") && probes("rc.c") === col("c"), "left")
      .groupBy("t")
      .agg(min(coalesce(col("n"), lit(0L))).as("n_est"))
      .select(col("t").as("token"), col("n_est"))
  }
}
