package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Shared parquet-backed state access for the foreachBatch index
  * pattern (StreamingNearDup, StreamingRollingMau). */
private[streaming] object ParquetState {

  /** Read a parquet state directory, or an empty relation of the
    * declared schema when it does not exist yet.
    *
    * Existence probes go through the Hadoop FileSystem API — a
    * java.io.File check is false for every non-local scheme (hdfs://,
    * s3a://, even file:/), which would silently treat a populated
    * index as empty and re-admit every known duplicate. The schema is
    * ALWAYS declared on the read: an existing-but-EMPTY directory
    * (e.g. a pre-created index root) must read as zero rows, not fail
    * parquet schema inference. */
  def readOrEmpty(spark: SparkSession, path: String, ddl: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) spark.read.schema(StructType.fromDDL(ddl)).parquet(path)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], StructType.fromDDL(ddl))
  }
}
