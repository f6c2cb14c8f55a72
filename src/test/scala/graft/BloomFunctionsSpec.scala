package graft

import graft.functions.BloomFunctions
import org.apache.spark.sql.functions._

/** Pins the bloom-pruned decontamination path (q107): the exposed
  * bloom expressions behave like a bloom filter must (zero false
  * negatives, bounded false positives at the sized bits/item), and
  * the pruned pipeline returns exactly the unpruned q47 relation
  * with the probe visibly in the plan. */
class BloomFunctionsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"
  private def haveData = new java.io.File(s"$sfDir/documents.parquet").exists()

  test("no false negatives; false positives bounded by the sized rate") {
    BloomFunctions.register(spark)
    val members = spark.range(0, 10000).toDF("id")
    val bf = members
      .agg(BloomFunctions.bloomAgg(col("id"), lit(10000L), lit(100000L)).as("bf"))
      .head().getAs[Array[Byte]](0)
    // every member must be contained — a bloom cannot miss
    members.filter(BloomFunctions.mightContain(lit(bf), col("id")))
      .count() shouldBe 10000L
    // disjoint probes: 10 bits/item sizes the filter at ~1% fp
    val fps = spark.range(1000000, 1100000).toDF("id")
      .filter(BloomFunctions.mightContain(lit(bf), col("id"))).count()
    (fps.toDouble / 100000) should be <= 0.03
  }

  test("q107 equals q47 row-for-row; the probe runs map-side in the plan") {
    assume(haveData, s"$sfDir not present")
    def rows(name: String) =
      SparkEntry.queries(name)(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    rows("q107_bloom_decontaminate") shouldBe rows("q47_decontaminate")
    val p = SparkEntry.queries("q107_bloom_decontaminate")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the bloom probe is a Filter ahead of the exact join, not a join
    p should include("might_contain")
  }
}
