package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: keep a per-key rollup (count /
  * sum / min / max — the RE-AGGREGATABLE metrics) as a state table and
  * fold each new batch into it, instead of recomputing history every
  * run. This is the batch analog of a streaming aggregation's state
  * store, and the pattern behind every "daily totals" mart that cannot
  * afford a full-history scan per day at 100 TB: per-run cost is
  * O(batch + |touched keys|), independent of corpus age.
  *
  * Mechanics: the batch collapses to one row per key (partial
  * aggregation — the only pass over batch rows), then a UNION +
  * re-aggregate with the state merges the two keyed relations (count/
  * sum merge by +, min/max by min/max — associative and commutative,
  * so batch boundaries and arrival order cannot change the result; avg
  * is served as sum/count at READ time, never stored).
  *
  * Exactly-once: `mergeOnce` tracks applied batch ids in a SEPARATE
  * single-column relation alongside the state. A re-delivered batch id
  * is a NO-OP (at-least-once delivery upstream becomes exactly-once
  * state), pinned by IncrementalAggSpec replay tests — same discipline
  * as the streaming near-dup index (X47).
  */
object IncrementalAgg {

  /** Long-typed metric spec over a value column. */
  final case class Metrics(valueCol: String) {
    private[ops] def batchAgg: Seq[Column] = Seq(
      count(lit(1)).as("cnt"),
      sum(col(valueCol)).as("sum_v"),
      min(col(valueCol)).as("min_v"),
      max(col(valueCol)).as("max_v"))
    private[ops] def mergeAgg: Seq[Column] = Seq(
      sum(col("cnt")).as("cnt"),
      sum(col("sum_v")).as("sum_v"),
      min(col("min_v")).as("min_v"),
      max(col("max_v")).as("max_v"))
  }

  /** Collapse a raw batch to per-key partials (state-table schema). */
  def aggregate(batch: DataFrame, keys: Seq[String], m: Metrics): DataFrame = {
    val aggs = m.batchAgg
    batch.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Fold per-key partials into the state. Both inputs carry the state
    * schema (keys + cnt/sum_v/min_v/max_v). */
  def merge(state: DataFrame, batchAgg: DataFrame, keys: Seq[String], m: Metrics): DataFrame = {
    val aggs = m.mergeAgg
    state.unionByName(batchAgg).groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Exactly-once fold of a RAW batch: no-op when `batchId` was already
    * applied. The applied-set lives in `appliedBatches` — a separate
    * one-row-per-applied-id relation returned alongside the state (the
    * state rows themselves carry only keys + metrics); persist both
    * together when checkpointing. */
  def mergeOnce(
      state: DataFrame,
      appliedBatches: DataFrame, // single column: __batch_id
      batch: DataFrame,
      batchId: String,
      keys: Seq[String],
      m: Metrics): (DataFrame, DataFrame) = {
    val already = appliedBatches.filter(col("__batch_id") === batchId).limit(1).count() > 0
    if (already) (state, appliedBatches)
    else {
      val next = merge(state, aggregate(batch, keys, m), keys, m)
      val nextApplied = appliedBatches.unionByName(
        batch.sparkSession.createDataFrame(
          java.util.List.of[org.apache.spark.sql.Row](
            org.apache.spark.sql.Row(batchId)),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("__batch_id",
              org.apache.spark.sql.types.StringType)))))
      (next, nextApplied)
    }
  }
}
