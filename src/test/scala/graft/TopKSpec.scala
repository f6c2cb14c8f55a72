package graft

import graft.functions.TopK
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins the map-side top-k aggregator against the window + rank
  * formulation it replaces — row-for-row equality including tie
  * handling, and the partial-aggregation plan shape.
  */
class TopKSpec extends SparkSpec {

  import spark.implicits._

  private def scored = {
    // 40 groups x 200 candidates with deliberate score ties
    val rows = for (g <- 1L to 40L; c <- 1L to 200L)
      yield (g, c, (c * 7919) % 50) // many ties per group
    rows.toDF("g", "id", "score")
  }

  test("topKPerGroup equals window row_number + rank filter, ties included") {
    val viaAgg = TopK.topKPerGroup(scored, "g", "id", "score", 5)
      .select($"g", $"id", $"score", $"rank".cast("long"))
      .as[(Long, Long, Long, Long)].collect().sorted
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id").asc)
    val viaWindow = scored
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
      .select($"g", $"id", $"score", $"rank".cast("long"))
      .as[(Long, Long, Long, Long)].collect().sorted
    viaAgg shouldBe viaWindow
    viaAgg.length shouldBe 200 // 40 groups x 5
  }

  test("the aggregate partial-merges map-side (two ObjectHashAggregate phases)") {
    val plan = TopK.topKPerGroup(scored, "g", "id", "score", 3)
      .queryExecution.executedPlan.toString
    plan.sliding("ObjectHashAggregate".length)
      .count(_ == "ObjectHashAggregate") should be >= 2
    plan should include("partial_topkagg")
  }

  test("groups smaller than k emit all rows, ranked") {
    val tiny = Seq((1L, 10L, 5L), (1L, 11L, 9L), (2L, 20L, 1L)).toDF("g", "id", "score")
    val out = TopK.topKPerGroup(tiny, "g", "id", "score", 5)
      .select($"g", $"id", $"rank".cast("long"))
      .as[(Long, Long, Long)].collect().sorted
    out shouldBe Array((1L, 10L, 2L), (1L, 11L, 1L), (2L, 20L, 1L))
  }
}
