package graft.ops

import org.apache.spark.sql.DataFrame

/** Lineage truncation for iterative / self-referencing plans, with a
  * durability switch.
  *
  * `localCheckpoint()` materializes to executor block storage — the
  * right default on local[*] where the single JVM cannot lose an
  * executor, but the blocks die with their executor, so on a real
  * cluster a lost node aborts the whole iterative job (there is no
  * lineage left to recompute from). Setting
  * `spark.graft.checkpointDir` to a durable path (HDFS / object
  * store) routes [[cut]] through reliable `checkpoint()` instead:
  * partitions are written to that path, survive executor loss, and
  * the scheduler re-reads rather than re-derives them. The conf is
  * read per call, so one session can run both modes (tests do).
  */
object Checkpoints {
  /** Session conf key; when set, [[cut]] checkpoints durably here. */
  val DirKey = "spark.graft.checkpointDir"

  /** Materialize `df` eagerly and truncate its lineage; durable iff
    * [[DirKey]] is set in the session conf, executor-local otherwise. */
  def cut(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    s.conf.getOption(DirKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        if (s.sparkContext.getCheckpointDir.isEmpty)
          s.sparkContext.setCheckpointDir(dir)
        df.checkpoint()
      case None => df.localCheckpoint()
    }
  }
}
