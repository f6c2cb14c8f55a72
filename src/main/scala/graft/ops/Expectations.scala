package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative table-level data-quality expectations (the dbt-test /
  * Great-Expectations pillar), compiled Spark-first:
  *
  *  - every ROW-SCOPED rule (not-null, accepted-values, range) becomes
  *    one `sum(when(violation, 1))` column of a SINGLE aggregate pass
  *    over the table — adding a rule adds a projection column, never a
  *    scan;
  *  - `Unique` rides the same pass as `count(*) − count(DISTINCT …)`
  *    (the standard Expand; exact, since an approximate uniqueness
  *    check is not an expectation);
  *  - `RefIntegrity` (every FK value exists in the dimension) is a
  *    LEFT ANTI equi-join count against the DISTINCT referenced keys —
  *    one keyed join per referenced table, the dimension side
  *    broadcast when small.
  *
  * `run` returns one row per rule: (rule, detail, n_violations, pass)
  * — the violations REPORT, not an exception, so callers decide
  * whether a failed expectation halts the pipeline (PipelineRunner) or
  * just lands in the audit log. Row-level quarantine is
  * [[QualityStage]]'s job; this is the table-level contract check that
  * runs AFTER a load and BEFORE publishing.
  *
  * Scale: the row-scoped pass is one partial-aggregated global
  * aggregate (constant shuffle volume); each referential rule shuffles
  * only distinct keys. Nothing here is per-rule-per-scan.
  */
object Expectations {

  sealed trait Expectation { def label: String }
  /** Column must never be NULL. */
  final case class NotNull(col: String) extends Expectation {
    val label = s"not_null:$col"
  }
  /** Column values restricted to an explicit set (NULLs are counted by
    * NotNull, not here). */
  final case class AcceptedValues(col: String, values: Seq[String]) extends Expectation {
    val label = s"accepted_values:$col"
  }
  /** Inclusive numeric bounds on a LONG-expressible column (cents
    * convention for money). NULLs are NotNull's business. */
  final case class InRange(col: String, lo: Long, hi: Long) extends Expectation {
    val label = s"in_range:$col[$lo,$hi]"
  }
  /** (cols) combination must be unique across the table. */
  final case class Unique(cols: Seq[String]) extends Expectation {
    val label = s"unique:${cols.mkString("+")}"
  }
  /** Every non-NULL value of `col` must exist in `refCol` of the
    * referenced table (referential integrity). */
  final case class RefIntegrity(col: String, ref: DataFrame, refCol: String)
      extends Expectation {
    val label = s"ref_integrity:$col"
  }

  private def violations(e: Expectation): Option[Column] = e match {
    // every sum is coalesced: over an EMPTY table sum() is NULL, and a
    // zero-row load must report (0, pass) — not a NULL row that both
    // pass-filters and failure-filters silently drop
    case NotNull(c) =>
      Some(coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L)))
    case AcceptedValues(c, vs) =>
      Some(coalesce(sum(when(col(c).isNotNull && !col(c).isin(vs: _*), 1L).otherwise(0L)),
        lit(0L)))
    case InRange(c, lo, hi) =>
      Some(coalesce(sum(when(col(c).isNotNull && (col(c) < lo || col(c) > hi), 1L)
        .otherwise(0L)), lit(0L)))
    case Unique(cs) =>
      Some(count(lit(1)) - countDistinct(cs.head, cs.tail: _*))
    case _: RefIntegrity => None // needs a join, not an aggregate column
  }

  /** Evaluate all expectations; one report row per rule. */
  def run(df: DataFrame, expectations: Seq[Expectation]): DataFrame = {
    val rowScoped = expectations.flatMap(e => violations(e).map(e.label -> _))
    val reports = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    if (rowScoped.nonEmpty) {
      val wide = df.agg(
        rowScoped.head._2.as("v0"),
        rowScoped.tail.zipWithIndex.map { case ((_, c), i) => c.as(s"v${i + 1}") }: _*)
      val stacked = rowScoped.zipWithIndex.map { case ((label, _), i) =>
        s"'${label.replace("'", "''")}', CAST(v$i AS BIGINT)"
      }.mkString(", ")
      reports += wide.selectExpr(
        s"stack(${rowScoped.size}, $stacked) AS (rule, n_violations)")
    }
    expectations.collect { case r: RefIntegrity =>
      val refKeys = r.ref.select(col(r.refCol).as("__ref_key")).distinct()
      reports += df.filter(col(r.col).isNotNull)
        .join(refKeys, col(r.col) === col("__ref_key"), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
        .select(lit(r.label).as("rule"), col("n_violations"))
    }
    if (reports.isEmpty) {
      // an all-disabled suite is a valid (empty) report, not a crash
      df.sparkSession.createDataFrame(
        df.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "rule STRING, n_violations BIGINT, pass BOOLEAN"))
    } else
      reports.reduce(_ unionByName _)
        .withColumn("pass", col("n_violations") === 0L)
  }
}
