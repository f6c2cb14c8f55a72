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
}
