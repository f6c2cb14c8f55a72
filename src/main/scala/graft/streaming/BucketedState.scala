package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The BUCKETED streaming-state protocol — the reusable scale path
  * past the whole-state TableSwap republish for MERGE-style states
  * whose size tracks a data dimension (users), not a bounded domain:
  * state rows live in `bkt=<k>/` hash partitions of the state dir and
  * a micro-batch rewrites ONLY the buckets its keys route to, so the
  * per-batch publish cost is O(touched state), not O(state).
  *
  * Exactly-once under at-least-once delivery WITHOUT a global atomic
  * swap — multi-directory publishes cannot be atomic, so atomicity is
  * a RECOVERY protocol:
  *
  *  1. [[stageBatch]] computes the batch's complete update (merged
  *     cells for the touched buckets + their preserved markers + the
  *     new applied-batch marker) against the CURRENT state and
  *     commits it to ONE staging dir (`<state>__batch_tmp/bkt=<k>/…`;
  *     the parquet job's `_SUCCESS` is the commit point). Live state
  *     is untouched until the job commits.
  *  2. [[publishStaged]] publishes per bucket: delete live dir,
  *     RENAME the staged dir over it. The rename REMOVES the staged
  *     source, so a committed staging dir always contains exactly the
  *     not-yet-published buckets — recovery needs no bookkeeping.
  *  3. Every entry point first runs [[recoverPending]]: a committed
  *     staging dir has its remaining buckets published (finishing the
  *     interrupted batch, marker included, before anything observes
  *     the state); an uncommitted one is discarded (state was never
  *     touched). After recovery a batch is therefore either FULLY
  *     applied or not at all, and the applied-check ([[applied]]) is
  *     one partition-pruned read of the single marker bucket
  *     (`batchId mod B`), never a state scan.
  *
  * State schema contract (the StreamingCountMin row-kinds convention,
  * bucketed): data columns include `kind` (STRING: 'c' cells / 'b'
  * markers) and `batch_id` (BIGINT, markers only); `bkt` (BIGINT) is
  * the partition directory, restored on read via basePath. The bucket
  * count must stay FIXED for a given state dir — re-sharding a live
  * state is q265's migration manifest, not a config flip.
  *
  * Clients: [[StreamingUpliftBucketed]] (q255 cells),
  * [[StreamingCupedBucketed]] (q250 cells).
  */
private[graft] object BucketedState {

  private[graft] def fsOf(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  private def tmpRoot(stateDir: String): Path =
    new Path(stateDir + "__batch_tmp")

  private[graft] def markerBucket(batchId: Long, buckets: Long): Long =
    math.floorMod(batchId, buckets)

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
    * with a bucket limit so specs can simulate a mid-publish crash on
    * the REAL code path. */
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
  private[graft] def readBuckets(
      spark: SparkSession, stateDir: String, ddl: String,
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
        spark.sparkContext.emptyRDD[Row],
        StructType.fromDDL(ddl + ", bkt BIGINT"))
    else
      spark.read.schema(StructType.fromDDL(ddl))
        .option("basePath", stateDir).parquet(dirs.toIndexedSeq: _*)
  }

  /** True when `batchId`'s marker is already in its marker bucket —
    * after [[recoverPending]] this is equivalent to "fully applied"
    * (publishes can no longer be half-done). */
  private[graft] def applied(
      spark: SparkSession, stateDir: String, ddl: String,
      batchId: Long, buckets: Long): Boolean =
    readBuckets(spark, stateDir, ddl, Some(Seq(markerBucket(batchId, buckets))))
      .filter(col("kind") === "b" && col("batch_id") === batchId)
      .limit(1).count() > 0

  /** One marker row of the state schema: every column null except
    * kind='b', batch_id, bkt — derived from the DDL so clients never
    * hand-build null templates. */
  private def markerRow(
      spark: SparkSession, ddl: String, batchId: Long, bkt: Long): DataFrame = {
    val schema = StructType.fromDDL(ddl + ", bkt BIGINT")
    val values = schema.fields.map(_.name match {
      case "kind" => "b"
      case "batch_id" => batchId
      case "bkt" => bkt
      case _ => null
    })
    spark.createDataFrame(
      java.util.Arrays.asList(Row.fromSeq(values.toIndexedSeq)), schema)
  }

  /** Stage one micro-batch's update. `batchCells` must carry the data
    * columns plus `bkt`; `mergeCells(oldTouchedRows, batchCells)` must
    * return the COMPLETE merged kind='c' relation for the touched
    * buckets (all data columns + bkt; `oldTouchedRows` arrives
    * pre-filtered to kind='c', without the kind/batch_id columns).
    * Markers are handled here generically: the touched buckets'
    * existing markers are preserved and the new applied marker is
    * appended in bucket `batchId mod B`. Returns false when the batch
    * was already applied (nothing staged). Reads ONLY the touched
    * bucket dirs. */
  private[graft] def stageBatch(
      spark: SparkSession, stateDir: String, ddl: String, buckets: Long,
      batchId: Long, batchCells: DataFrame,
      mergeCells: (DataFrame, DataFrame) => DataFrame): Boolean = {
    if (applied(spark, stateDir, ddl, batchId, buckets)) return false

    val mb = markerBucket(batchId, buckets)
    // control-plane: ≤B touched bucket ids (+ the marker's bucket)
    val touched = (batchCells.select("bkt").distinct().collect()
      .map(_.getLong(0)) :+ mb).distinct.toSeq
    val old = readBuckets(spark, stateDir, ddl, Some(touched))
    val schema = StructType.fromDDL(ddl + ", bkt BIGINT")
    val dataCols = schema.fieldNames.filterNot(
      n => n == "kind" || n == "batch_id" || n == "bkt")

    val merged = mergeCells(
      old.filter(col("kind") === "c")
        .select(dataCols.map(col).toIndexedSeq: _*),
      batchCells)
    val markers = old.filter(col("kind") === "b")
      .select(schema.fieldNames.map(col).toIndexedSeq: _*)
      .unionByName(markerRow(spark, ddl, batchId, mb))

    merged.select(schema.fieldNames.map(col).toIndexedSeq: _*)
      .unionByName(markers)
      .write.mode("overwrite").partitionBy("bkt")
      .parquet(tmpRoot(stateDir).toString)
    true
  }

  /** Fold one micro-batch into the bucketed state: recover, stage,
    * publish. Returns false (state untouched) when `batchId` was
    * already applied. */
  private[graft] def processBatch(
      spark: SparkSession, stateDir: String, ddl: String, buckets: Long,
      batchId: Long, batchCells: DataFrame,
      mergeCells: (DataFrame, DataFrame) => DataFrame): Boolean = {
    val fs = fsOf(spark, stateDir)
    recoverPending(fs, stateDir)
    if (!stageBatch(spark, stateDir, ddl, buckets, batchId, batchCells,
        mergeCells)) return false
    publishStaged(fs, stateDir, Int.MaxValue)
    true
  }

  /** The maintained cells (all buckets), data columns only. */
  private[graft] def cells(
      spark: SparkSession, stateDir: String, ddl: String): DataFrame = {
    recoverPending(fsOf(spark, stateDir), stateDir)
    val dataCols = StructType.fromDDL(ddl).fieldNames.filterNot(
      n => n == "kind" || n == "batch_id")
    readBuckets(spark, stateDir, ddl, None)
      .filter(col("kind") === "c")
      .select(dataCols.map(col).toIndexedSeq: _*)
  }
}
