package graft

import graft.ops.Observed
import org.apache.spark.sql.functions._

/** Pins the observe/CollectMetrics wrapper: metrics must report the
  * rows that actually FLOWED (post-filter), fire for derived-plan
  * actions like count(), and cost no extra job.
  */
class ObservedSpec extends SparkSpec {

  import spark.implicits._

  test("rowStats reports flowed rows and per-column null counts") {
    val df = Seq(
      (Some(1L), "a"), (None, "b"), (Some(3L), null), (None, null)
    ).toDF("id", "name")
    val (observed, obs) = Observed.rowStats(df, "stage1", "id", "name")
    observed.collect() // the caller's action
    val m = Observed.stageMetrics(obs)
    m("n_rows") shouldBe 4L
    m("n_null_id") shouldBe 2L
    m("n_null_name") shouldBe 2L
  }

  test("metrics see the post-filter stream and fire for derived actions") {
    val df = (1L to 100L).toDF("v").filter($"v" > 90L)
    val (observed, obs) = Observed.rowStats(df, "filtered")
    observed.count() // count() executes a DERIVED plan — must still fire
    Observed.stageMetrics(obs)("n_rows") shouldBe 10L
  }

  test("metrics ride the caller's job: observing adds no extra Spark job") {
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val (observed, obs) = Observed.rowStats((1L to 50L).toDF("v"), "zerocost")
    observed.collect()
    Observed.stageMetrics(obs)("n_rows") shouldBe 50L
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    (after - before) shouldBe 1
  }
}
