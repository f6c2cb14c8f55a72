package graft

import graft.ingest.Warehouse
import org.apache.spark.sql.functions._

/** Pins the physical-layout claims of the bucketed/partitioned
  * warehouse sinks on actual plans: a join of two same-bucketed tables
  * must be exchange-free, and a partition-column filter must prune at
  * the scan (PartitionFilters), not post-scan.
  */
class WarehouseLayoutSpec extends SparkSpec {

  import spark.implicits._

  private lazy val wh = {
    val w = new Warehouse(spark, "layoutdb")
    w.init()
    w
  }

  test("joining two same-bucketed tables produces a zero-Exchange plan") {
    val facts = (1L to 1000L).map(i => (i % 50, i, i * 2.0)).toDF("k", "id", "v")
    val other = (1L to 500L).map(i => (i % 50, s"t$i")).toDF("k", "tag")
    wh.saveBucketed(facts, "fact_a", 4, Seq("k"))
    wh.saveBucketed(other, "fact_b", 4, Seq("k"))

    // disable auto-broadcast so the test sees the large-table shape
    // (two real facts, neither broadcastable) instead of AQE
    // broadcasting the tiny fixture
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = wh.table("fact_a").join(wh.table("fact_b"), Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      plan should include("SortMergeJoin")
      plan should not include "Exchange hashpartitioning"
      joined.count() shouldBe 10000L // 50 keys x 20 fact rows x 10 tag rows
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }

  test("bucketed aggregation on the bucket key needs no exchange") {
    val agg = wh.table("fact_a").groupBy("k").agg(sum("v").as("s"))
    val plan = agg.queryExecution.executedPlan.toString
    plan should not include "Exchange hashpartitioning"
    agg.count() shouldBe 50L
  }

  test("partition-column filters prune at the scan") {
    val gold = (1L to 300L).map(i => (i, s"d${i % 3}", i * 1.5)).toDF("id", "dept", "v")
    wh.savePartitioned(gold, "gold_by_dept", Seq("dept"))
    val one = wh.table("gold_by_dept").filter($"dept" === "d1")
    val plan = one.queryExecution.executedPlan.toString
    plan should include("PartitionFilters: [isnotnull(dept")
    one.count() shouldBe 100L
  }

  test("appendEvolving widens the schema; old rows read new columns as NULL") {
    val b1 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    wh.appendEvolving(b1, "evolving")
    // batch 2 carries a new column: metadata-only ALTER, no file rewrite
    val b2 = Seq((3L, "c", 30L)).toDF("id", "v", "extra")
    wh.appendEvolving(b2, "evolving")
    val t = wh.table("evolving")
    t.columns.toSeq shouldBe Seq("id", "v", "extra")
    t.count() shouldBe 3L
    t.filter($"id" < 3L && $"extra".isNull).count() shouldBe 2L
    t.filter($"id" === 3L).select("extra").head.getLong(0) shouldBe 30L
    // batch 3 from an OLD producer (missing `extra`): aligned with
    // typed NULLs, not rejected
    val b3 = Seq((4L, "d")).toDF("id", "v")
    wh.appendEvolving(b3, "evolving")
    wh.table("evolving").count() shouldBe 4L
    wh.table("evolving").filter($"id" === 4L && $"extra".isNull).count() shouldBe 1L
  }

  test("appendEvolving refuses a type change loudly; accepts case-variant names") {
    // a DOUBLE arriving where the table holds BIGINT must throw, not
    // silently truncate through the store-assignment cast
    val bad = Seq((5L, "e", 1.7)).toDF("id", "v", "extra")
    val ex = intercept[IllegalArgumentException](wh.appendEvolving(bad, "evolving"))
    ex.getMessage should include("type change")
    wh.table("evolving").count() shouldBe 4L // nothing appended
    // a case-variant column name resolves like Spark's own analysis
    // (case-insensitive): aligned, not treated as a new column
    val variant = Seq((5L, "e", 50L)).toDF("id", "V", "extra")
    wh.appendEvolving(variant, "evolving")
    wh.table("evolving").columns.toSeq shouldBe Seq("id", "v", "extra")
    wh.table("evolving").filter($"id" === 5L).select("v").head.getString(0) shouldBe "e"
  }
}
