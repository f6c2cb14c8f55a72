package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.call_function

/** Spark's own runtime-filter bloom expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the machinery
  * behind `spark.sql.optimizer.runtimeFilter.bloomFilter.enabled`,
  * normally injected by the optimizer, not user-addressable) exposed
  * as session functions, the same public path as
  * [[VectorFunctions]]: `FunctionRegistry` + `call_function`, no
  * Spark-private Column internals.
  *
  * Why: q107 builds an EXPLICIT semi-join pruning filter — bloom the
  * small (test-gram) side, probe the huge (train-gram) side map-side
  * before the exact equi-join, so the shuffle carries only probable
  * matches plus the declared false-positive rate. The optimizer's
  * automatic runtime filter makes the same move only when join
  * statistics happen to trigger it; a curation pipeline wants it
  * guaranteed, sized from the data.
  *
  * The aggregate's buffer is ONE bloom filter per partition, merged
  * by OR — constant shuffle volume like HLL; `might_contain` against
  * a literal bloom is a pure narrow map. False positives only ever
  * ENLARGE the candidate set; the exact join downstream removes them,
  * so results are exactly the unpruned ones (q107's oracle is
  * literally q47's).
  */
object BloomFunctions {

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_agg",
      es => new BloomFilterAggregate(es(0), es(1), es(2)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_might_contain",
      es => BloomFilterMightContain(es(0), es(1)), "built-in")
  }

  /** Bloom filter over a LONG column → BINARY (one merged filter). */
  def bloomAgg(c: Column, estItems: Column, numBits: Column): Column =
    call_function("graft_bloom_agg", c, estItems, numBits)

  /** Membership probe against a (foldable) serialized bloom filter. */
  def mightContain(bloom: Column, v: Column): Column =
    call_function("graft_bloom_might_contain", bloom, v)
}
