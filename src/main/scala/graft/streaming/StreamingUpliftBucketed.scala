package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** BUCKETED-LAYOUT streaming uplift state — the declared scale path
  * past [[StreamingUplift]]'s whole-state republish (SURVEY §6.5d):
  * the per-(user, arm) cells live in [[Buckets]] hash partitions of
  * the state dir (`bkt=<k>/`, bkt = user_id mod B), and a micro-batch
  * rewrites ONLY the buckets its users route to — per-batch publish
  * cost is O(touched buckets' state), not O(users), which is the
  * difference between a viable and a non-viable user-sized state at
  * 100-TB event volume (with B sized so one bucket fits an executor,
  * the rewrite is also embarrassingly parallel). q164's Merkle
  * partitioning applied to state, exactly as the contract row
  * promised.
  *
  * Exactly-once under at-least-once delivery WITHOUT a global atomic
  * swap. Multi-directory publishes cannot be atomic, so atomicity is
  * a RECOVERY protocol instead:
  *
  *  1. The batch's full update (merged cells + preserved markers +
  *     the new applied-batch marker) is computed against the CURRENT
  *     state and committed to one staging dir
  *     (`<state>__batch_tmp/bkt=<k>/…`, parquet job `_SUCCESS` = the
  *     commit point). State is untouched until the job commits.
  *  2. Publish = per touched bucket: delete live dir, RENAME the
  *     staged dir over it. The rename REMOVES the staged source, so
  *     the staging dir always contains exactly the not-yet-published
  *     buckets — recovery needs no bookkeeping reads.
  *  3. Every entry point first runs [[recoverPending]]: a committed
  *     staging dir has its remaining buckets published (finishing the
  *     interrupted batch — including its marker — before anything
  *     else observes the state), an uncommitted one is discarded
  *     (state was never touched). After recovery a batch is therefore
  *     either FULLY applied or not at all, and the applied-check is
  *     one partition-pruned read of the single marker bucket
  *     (`batchId mod B`), never a state scan.
  *
  * The cells and the report are the literally shared batch-q255 code
  * ([[graft.queries.EventAnalytics.upliftCells]] /
  * [[graft.queries.EventAnalytics.upliftFinalize]]), so the q255
  * DuckDB oracle transitively gates this layout too, and the
  * finalizer's no-cache contract (r14) means the mutable bucket reads
  * are never served stale.
  */
object StreamingUpliftBucketed {

  /** Bucket count. Sized here for test visibility; at production
    * scale B is the knob that makes one bucket's state fit an
    * executor (and bounds publish fan-out). Must stay FIXED for a
    * given state dir — re-sharding a live state is q265's migration
    * manifest, not a config flip. */
  val Buckets = 64L

  /** Data columns only — `bkt` is the partition directory, restored
    * on read via basePath. kind='c' → cells; kind='b' → markers. */
  private val StateDdl =
    "kind STRING, user_id BIGINT, treat BOOLEAN, score BIGINT, " +
      "conv BIGINT, batch_id BIGINT"

  private def fsOf(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  private def tmpRoot(stateDir: String): Path =
    new Path(stateDir + "__batch_tmp")

  /** Finish (or discard) an interrupted publish. Committed staging
    * (`_SUCCESS` present) ⇒ publish every bucket still in it — each
    * rename removes its staged source, so this is idempotent across
    * repeated crashes; uncommitted staging ⇒ delete (live state was
    * never touched). Cheap when there is nothing to do: one exists
    * probe. */
  private[graft] def recoverPending(fs: FileSystem, stateDir: String): Unit = {
    val tmp = tmpRoot(stateDir)
    if (fs.exists(tmp)) {
      if (fs.exists(new Path(tmp, "_SUCCESS"))) {
        publishStaged(fs, stateDir, Int.MaxValue)
      } else {
        if (!fs.delete(tmp, true))
          throw new java.io.IOException(s"bucketed state: delete uncommitted $tmp failed")
      }
    }
  }

  /** Publish up to `maxBuckets` staged bucket dirs over the live
    * state, then remove the staging root once empty. Package-visible
    * with a bucket limit so the spec can simulate a mid-publish crash
    * on the REAL code path. */
  private[graft] def publishStaged(
      fs: FileSystem, stateDir: String, maxBuckets: Int): Unit = {
    val tmp = tmpRoot(stateDir)
    val staged = fs.listStatus(tmp).map(_.getPath)
      .filter(_.getName.startsWith("bkt=")).sortBy(_.getName)
    staged.take(maxBuckets).foreach { src =>
      val dst = new Path(stateDir, src.getName)
      if (fs.exists(dst) && !fs.delete(dst, true))
        throw new java.io.IOException(s"bucketed state: delete $dst failed")
      if (!fs.rename(src, dst))
        throw new java.io.IOException(s"bucketed state: rename $src -> $dst failed")
    }
    if (maxBuckets >= staged.length && !fs.delete(tmp, true))
      throw new java.io.IOException(s"bucketed state: delete staging $tmp failed")
  }

  /** Read the named buckets (all existing ones when `only` is None)
    * with the partition column restored. Missing dirs read as empty —
    * partition PRUNING by construction: only the listed directories
    * are ever opened. */
  private def readBuckets(
      spark: SparkSession, stateDir: String,
      only: Option[Seq[Long]]): DataFrame = {
    val fs = fsOf(spark, stateDir)
    val root = new Path(stateDir)
    val dirs =
      if (!fs.exists(root)) Array.empty[String]
      else {
        val existing = fs.listStatus(root).map(_.getPath)
          .filter(_.getName.startsWith("bkt="))
        only match {
          case Some(bs) =>
            val want = bs.map(b => s"bkt=$b").toSet
            existing.filter(p => want(p.getName)).map(_.toString)
          case None => existing.map(_.toString)
        }
      }
    if (dirs.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType.fromDDL(StateDdl + ", bkt BIGINT"))
    else
      spark.read.schema(StructType.fromDDL(StateDdl))
        .option("basePath", stateDir).parquet(dirs.toIndexedSeq: _*)
  }

  /** The maintained uplift cells (all buckets). */
  def cells(spark: SparkSession, stateDir: String): DataFrame = {
    recoverPending(fsOf(spark, stateDir), stateDir)
    readBuckets(spark, stateDir, None)
      .filter(col("kind") === "c")
      .select(col("user_id"), col("treat"), col("score"), col("conv"))
  }

  /** True when `batchId`'s marker is already in its marker bucket —
    * after [[recoverPending]] this is equivalent to "fully applied"
    * (publishes can no longer be half-done). */
  private def applied(
      spark: SparkSession, stateDir: String, batchId: Long): Boolean =
    readBuckets(spark, stateDir, Some(Seq(markerBucket(batchId))))
      .filter(col("kind") === "b" && col("batch_id") === batchId)
      .limit(1).count() > 0

  private def markerBucket(batchId: Long): Long =
    math.floorMod(batchId, Buckets)

  /** Stage one micro-batch's update: merged cells for the touched
    * buckets + their preserved markers + the new applied marker, all
    * committed to the staging root. Returns false when the batch was
    * already applied (nothing staged). Reads ONLY the touched bucket
    * dirs. */
  private[graft] def stageBatch(
      spark: SparkSession, batch: DataFrame, batchId: Long,
      stateDir: String): Boolean = {
    if (applied(spark, stateDir, batchId)) return false

    val bc = graft.queries.EventAnalytics.upliftCells(batch)
      .withColumn("bkt", pmod(col("user_id"), lit(Buckets)))
    // control-plane: ≤B touched bucket ids (+ the marker's bucket)
    val touched = (bc.select("bkt").distinct().collect().map(_.getLong(0))
      :+ markerBucket(batchId)).distinct.toSeq
    val old = readBuckets(spark, stateDir, Some(touched))

    val nullL = lit(null).cast("bigint")
    val mergedCells = old.filter(col("kind") === "c")
      .select(col("user_id"), col("treat"), col("score"), col("conv"))
      .unionByName(bc.drop("bkt"))
      .groupBy("user_id", "treat")
      .agg(sum(col("score")).as("score"), max(col("conv")).as("conv"))
      .select(lit("c").as("kind"), col("user_id"), col("treat"),
        col("score"), col("conv"), nullL.as("batch_id"),
        pmod(col("user_id"), lit(Buckets)).as("bkt"))
    val markers = old.filter(col("kind") === "b")
      .select(col("kind"), col("user_id"), col("treat"), col("score"),
        col("conv"), col("batch_id"), col("bkt"))
      .unionByName(spark.range(1).select(lit("b").as("kind"),
        nullL.as("user_id"), lit(null).cast("boolean").as("treat"),
        nullL.as("score"), nullL.as("conv"),
        lit(batchId).as("batch_id"), lit(markerBucket(batchId)).as("bkt")))

    mergedCells.unionByName(markers)
      .write.mode("overwrite").partitionBy("bkt")
      .parquet(tmpRoot(stateDir).toString)
    true
  }

  /** Fold one micro-batch into the bucketed state. Returns false
    * (state untouched) when `batchId` was already applied. */
  def processBatch(
      spark: SparkSession, batch: DataFrame, batchId: Long,
      stateDir: String): Boolean = {
    val fs = fsOf(spark, stateDir)
    recoverPending(fs, stateDir)
    if (!stageBatch(spark, batch, batchId, stateDir)) return false
    publishStaged(fs, stateDir, Int.MaxValue)
    true
  }

  /** The uplift-decile/Qini report — batch q255's columns, computed
    * by the SHARED finalizer over the bucketed cells. */
  def report(spark: SparkSession, stateDir: String): DataFrame =
    graft.queries.EventAnalytics.upliftFinalize(cells(spark, stateDir))
}
