package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{col, posexplode, struct, udaf}

/** Map-side-combining per-group top-k (the §7.5 `Aggregator` work).
  *
  * The window formulation of per-group top-k —
  * `row_number over (partition by g order by score desc)` then
  * `rank <= k` — shuffles EVERY candidate row to its group's reducer
  * and sorts whole partitions before discarding all but k rows. This
  * aggregator keeps a bounded k-element buffer instead, and because it
  * runs through Spark's normal partial-aggregation machinery the
  * buffer merges MAP-SIDE: the shuffle carries at most k rows per
  * group per input partition, not the full candidate set. For an ANN
  * scoring join producing |queries|·|candidates| rows, that's the
  * difference between shuffling the cross product and shuffling
  * k·partitions rows per query.
  *
  * Ordering is (score desc, id asc) — identical to the window + rank
  * tiebreak it replaces, so results are row-for-row equal
  * (TopKSpec pins this).
  */
object TopK {

  /** One scored candidate; field ORDER is the udaf input contract
    * (callers pass `struct(id, score)`). */
  final case class Scored(id: Long, score: Long)

  /** Product wrapper so the bounded buffer has a native (non-kryo)
    * encoder — the output stays a real array column for posexplode. */
  final case class TopBuf(rows: Seq[Scored])

  private def ord: Ordering[Scored] =
    Ordering.by((s: Scored) => (-s.score, s.id))

  /** Aggregator keeping the k best (score desc, id asc) rows. The
    * buffer is a sorted Seq truncated to k — O(k) per update, tiny
    * serialized state. */
  final class TopKAgg(k: Int) extends Aggregator[Scored, TopBuf, TopBuf] {
    override def zero: TopBuf = TopBuf(Seq.empty)
    override def reduce(b: TopBuf, a: Scored): TopBuf =
      if (b.rows.sizeIs >= k && ord.lteq(b.rows.last, a)) b
      else TopBuf((a +: b.rows).sorted(ord).take(k))
    override def merge(b1: TopBuf, b2: TopBuf): TopBuf =
      TopBuf((b1.rows ++ b2.rows).sorted(ord).take(k))
    override def finish(r: TopBuf): TopBuf = TopBuf(r.rows.sorted(ord))
    override def bufferEncoder: Encoder[TopBuf] = Encoders.product[TopBuf]
    override def outputEncoder: Encoder[TopBuf] = Encoders.product[TopBuf]
  }

  /** top-k as a ready-to-use aggregate column over (id, score) columns
    * (the udaf flattens the `Scored` input encoder to two arguments);
    * the result is a struct whose `rows` field is the sorted array. */
  def topK(k: Int): (Column, Column) => Column = {
    val agg = udaf(new TopKAgg(k), Encoders.product[Scored])
    (id, score) => agg(id, score)
  }

  /** The whole pattern: per-`group` top-k of (`idCol`, `scoreCol`)
    * with output columns (group, idCol, scoreCol, rank) — a drop-in
    * for the window + `rank <= k` formulation. */
  def topKPerGroup(
      df: DataFrame, group: String, idCol: String, scoreCol: String, k: Int): DataFrame =
    // null scores are dropped, not ranked: the udaf's Scored input has a
    // primitive (non-nullable) score, so a NULL — e.g. a NaN cosine from
    // a zero-norm embedding, rounded and cast to NULL long — would
    // otherwise fail encoding at runtime; an undefined score is not a
    // rankable candidate in any caller's semantics
    df.filter(col(scoreCol).isNotNull)
      .groupBy(col(group))
      .agg(topK(k)(col(idCol), col(scoreCol)).as("top"))
      .select(col(group), posexplode(col("top.rows")).as(Seq("pos", "s")))
      .select(col(group), col("s.id").as(idCol), col("s.score").as(scoreCol),
        (col("pos") + 1).as("rank"))
}
