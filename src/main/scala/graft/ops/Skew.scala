package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY §4.2 / the 100 TB playbook:
  * "skewed keys → salting or AQE skew-join").
  *
  * AQE's runtime skew-join split handles sort-merge joins whose skew
  * shows up in shuffle-block sizes; these helpers cover the cases AQE
  * cannot: a hot key concentrated enough that even a split partition
  * is one task's worth of a SINGLE key (salted join), and a high-dup
  * aggregation whose single hot group serializes the final merge
  * (salted two-phase aggregate — exact for algebraic aggregates).
  *
  * Both are pure DataFrame rewrites with results identical to the
  * unsalted plan (the spec pins equality); salt values affect only
  * row placement, never output.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `keys`, salting the big side into
    * `saltFactor` sub-keys and replicating the small side once per
    * salt: the hot key's rows spread over `saltFactor` tasks instead
    * of one. Inner and left_outer (big-preserving) joins only — the
    * replicate-side must not be null-producing.
    *
    * At scale: small's size multiplies by `saltFactor` through the
    * shuffle — keep it for genuinely modest build sides whose
    * broadcast is just out of reach, and pick the smallest factor
    * that bounds the hot key's per-task share.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      saltFactor: Int,
      joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"saltedJoin supports big-preserving joins only, got $joinType")
    require(!big.columns.contains("_salt") && !small.columns.contains("_salt"),
      "saltedJoin reserves the _salt column name; rename the caller's column")
    // rand-based salt is safe: it decides placement, not results
    val salted = big.withColumn("_salt", floor(rand(42) * saltFactor).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated, keys :+ "_salt", joinType).drop("_salt")
  }

  /** Exact two-phase aggregation for skewed groups: phase 1 aggregates
    * on (keys, salt) — spreading a hot group across `saltFactor`
    * partial rows — and phase 2 merges the partials per key. Exact for
    * the algebraic aggregates expressible as (partial, merge) pairs;
    * the caller supplies both sides, e.g.
    * `saltedAgg(df, Seq("k"), 8, Seq(sum("v").as("v")), Seq(sum("v").as("v")))`.
    *
    * Note Spark's hash aggregate already partial-aggregates map-side;
    * this helps when the MERGE of one group's partials is itself the
    * bottleneck (extreme dup factors, wide aggregation state).
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      saltFactor: Int,
      partial: Seq[Column],
      merge: Seq[Column]): DataFrame = {
    require(!df.columns.contains("_salt"),
      "saltedAgg reserves the _salt column name; rename the caller's column")
    df.withColumn("_salt", floor(rand(42) * saltFactor).cast("int"))
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }
}
