package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Zero-cost data-plane observability through Spark's `observe` API
  * (`CollectMetrics` + `Observation`): named aggregates evaluated AS
  * THE DATA FLOWS through the plan — accumulator-style, no second
  * pass, no extra shuffle, exact under task retries (per-task updates
  * de-dup). This is the metrics layer a pipeline needs BETWEEN the
  * audit log (row counts after an action, ingest/AuditLog) and the
  * expectation suite (a separate verification pass, ops/Expectations):
  * volume and null-rate telemetry for every load at zero marginal
  * cost.
  *
  * The `Observation` handle — not the frame's own `queryExecution` —
  * is the read path: ANY action on (a plan derived from) the returned
  * frame fires the observation listener, including actions like
  * `count()` that execute a derived plan. `Observation.get` blocks
  * until the first such action completes.
  *
  * Usage:
  * {{{
  *   val (staged, obs) = Observed.rowStats(df, "bronze_load", "patient_id")
  *   warehouse.save(staged, "bronze_patients")   // the caller's action
  *   val m = Observed.stageMetrics(obs)          // n_rows, n_null_*
  * }}}
  */
object Observed {

  /** Attach standard stage metrics — total rows plus a null count per
    * listed column — returning the observed frame and the handle to
    * read after the caller's own action. */
  def rowStats(df: DataFrame, name: String, nullCols: String*): (DataFrame, Observation) = {
    val obs = Observation(name)
    val aggs: Seq[Column] = count(lit(1)).as("n_rows") +:
      nullCols.map(c => sum(when(col(c).isNull, 1L).otherwise(0L))
        .as(s"n_null_$c"))
    (df.observe(obs, aggs.head, aggs.tail: _*), obs)
  }

  /** The observed metrics as a name→value map (blocks until the first
    * action on the observed frame completes). */
  def stageMetrics(obs: Observation): Map[String, Long] =
    obs.get.map { case (k, v) => k -> v.asInstanceOf[Long] }
}
