package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SCD Type-2 merge as a reusable DataFrame composite.
  *
  * Reproduces the reference's BigQuery `MERGE` semantics
  * (/root/reference/src/pipelines/transforms/silver.sql:142-199 and the
  * four sibling merges) faithfully, including its quirks:
  *
  *  (a) NULL-blind change detection — the match predicate is
  *      `t.c <> s.c OR …`, so a column going NULL→value (or value→NULL)
  *      yields NULL, not TRUE, and the row is treated as *unchanged*.
  *      We build the predicate with null-unsafe `=!=` to keep this.
  *  (b) close-only — a changed key's current row is closed
  *      (`is_current = false`, `modified_date = clock`) but the new
  *      version is NOT inserted in the same run; it arrives on the next
  *      run as a NOT-MATCHED insert (the old row is no longer current).
  *  (c) brand-new keys insert with
  *      `inserted_date = modified_date = clock, is_current = true`;
  *      unchanged keys and source-absent keys are untouched; closed
  *      history rows are carried through untouched.
  *  (d) NULL business keys never match — SQL `t.k = s.k` is NULL for a
  *      NULL key, and BigQuery MERGE treats them as unmatched: a
  *      NULL-key target row is carried through untouched, a NULL-key
  *      source row inserts. (QualityStage deliberately flags-not-drops
  *      NULL-naturalKey rows, so NULL surrogate keys DO reach this
  *      operator in the health pipeline.)
  *
  * Caller contract: `source` must be key-unique. BigQuery MERGE fails
  * loudly on a multi-matched target row ("UPDATE/MERGE must match at
  * most one source row"); a relational join cannot detect that without
  * an extra pass, so a duplicate-key source here would instead emit the
  * matched target row once per duplicate. Every in-repo caller feeds a
  * QualityStage snapshot, which is distinct per run.
  *
  * Scale notes: the single wide operation is one full-outer join on the
  * business key — a keyed sort-merge join whose shuffle is unavoidable
  * and linear in |target ∪ source|. No driver-side collection, no
  * windowing over the whole table; history rows bypass the join
  * entirely (union, narrow). AQE handles skewed keys.
  *
  * @param keyCols     business-key columns (present in both sides)
  * @param compareCols change-detection columns (present in both sides)
  * @param clock       timestamp used for SCD bookkeeping; inject a
  *                    literal for deterministic tests (SURVEY §2.6 F11)
  */
final case class Scd2Merge(
    keyCols: Seq[String],
    compareCols: Seq[String],
    clock: Column = current_timestamp()) {

  import Scd2Merge._

  /** @param target SCD2 table: keyCols ++ compareCols ++
    *               (inserted_date, modified_date, is_current)
    * @param source  new snapshot: keyCols ++ compareCols
    * @return        merged SCD2 table with the same schema as target
    */
  def apply(target: DataFrame, source: DataFrame): DataFrame = {
    val outCols = keyCols ++ compareCols ++ Seq(InsertedDate, ModifiedDate, IsCurrent)

    val current = target.filter(col(IsCurrent))
    val history = target.filter(!col(IsCurrent))

    // presence markers, NOT key-nullness: a NULL-business-key row is a
    // real row (quirk d) and inferring presence from the key would
    // misroute it to the insert branch and replace it with all-NULLs
    val t = current.select(current.columns.map(c => col(c).as(s"t_$c")).toSeq
      :+ lit(true).as("t_present"): _*)
    val s = source.select(
      (keyCols ++ compareCols).map(c => source(c).as(s"s_$c")).toSeq
        :+ lit(true).as("s_present"): _*)

    // plain (null-unsafe) equality — BigQuery MERGE `ON t.k = s.k`
    // never matches NULL keys (quirk d); <=> would pair them up
    val joinCond = keyCols.map(k => col(s"t_$k") === col(s"s_$k")).reduce(_ && _)
    val joined = t.join(s, joinCond, "full_outer")

    val inTarget = col("t_present").isNotNull
    val inSource = col("s_present").isNotNull
    // Null-unsafe <> keeps quirk (a): NULL vs value ⇒ NULL ⇒ not changed.
    val changed = compareCols
      .map(c => col(s"t_$c") =!= col(s"s_$c"))
      .reduce(_ || _)

    def tCols(over: Map[String, Column] = Map.empty): Seq[Column] =
      outCols.map(c => over.getOrElse(c, col(s"t_$c")).as(c)).toSeq

    // MATCHED AND changed → close the current row.
    val closed = joined
      .filter(inTarget && inSource && coalesce(changed, lit(false)))
      .select(tCols(Map(IsCurrent -> lit(false), ModifiedDate -> clock)): _*)

    // MATCHED unchanged, or source-absent → untouched current row.
    val untouched = joined
      .filter(inTarget && (!inSource || !coalesce(changed, lit(false))))
      .select(tCols(): _*)

    // NOT MATCHED → insert as the new current version.
    val inserted = joined
      .filter(!inTarget)
      .select(outCols.map {
        case InsertedDate | ModifiedDate => clock
        case IsCurrent                   => lit(true)
        case c                           => col(s"s_$c")
      }.zip(outCols).map { case (c, n) => c.as(n) }.toSeq: _*)

    closed
      .unionByName(untouched)
      .unionByName(inserted)
      .unionByName(history.select(outCols.map(col).toSeq: _*))
  }
}

object Scd2Merge {
  val InsertedDate = "inserted_date"
  val ModifiedDate = "modified_date"
  val IsCurrent = "is_current"
}
