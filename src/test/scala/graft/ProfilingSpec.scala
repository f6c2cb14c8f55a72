package graft

import graft.queries.Profiling
import org.apache.spark.sql.functions._

/** Pins q41's sketches against exact answers on the testdata — the
  * correctness check the driver gate can't do for approximate outputs
  * (same pattern as AnnLshSpec for q24). */
class ProfilingSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"
  private def haveData = new java.io.File(s"$sfDir/lineitem.parquet").exists()

  test("exact counts match, HLL distinct within 3x rsd, percentiles within rank tolerance") {
    assume(haveData, s"$sfDir not present")
    val prof = Profiling.q41ProfileSketch(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    val li = Tables.lineitem(spark, sfDir)
    Seq("l_quantity", "l_extendedprice", "l_discount").foreach { c =>
      val row = prof(c)
      val exact = li.agg(
        count(col(c)), (count(lit(1)) - count(col(c))),
        countDistinct(col(c))).collect()(0)
      withClue(s"$c n/n_null:") {
        row.getLong(1) shouldBe exact.getLong(0)
        row.getLong(2) shouldBe exact.getLong(1)
      }
      val dExact = exact.getLong(2).toDouble
      withClue(s"$c approx_distinct=${row.getLong(3)} exact=$dExact:") {
        math.abs(row.getLong(3) - dExact) / dExact should be <= 3 * Profiling.Rsd
      }
      // rank tolerance: the sketch's p-quantile must sit between the
      // exact (p-eps) and (p+eps) quantiles, eps = 1/accuracy + slack
      val eps = 0.005
      Seq(0.5 -> row.getDouble(4), 0.9 -> row.getDouble(5), 0.99 -> row.getDouble(6))
        .foreach { case (p, v) =>
          val lohi = li.selectExpr(
            s"percentile($c, ${math.max(p - eps, 0.0)})",
            s"percentile($c, ${math.min(p + eps, 1.0)})").collect()(0)
          withClue(s"$c p$p=$v bounds=(${lohi.getDouble(0)}, ${lohi.getDouble(1)}):") {
            v should be >= lohi.getDouble(0)
            v should be <= lohi.getDouble(1)
          }
        }
    }
  }

  test("the aggregate is a single pass: one shuffle, no Expand") {
    assume(haveData, s"$sfDir not present")
    val p = Profiling.q41ProfileSketch(spark, sfDir)
      .queryExecution.executedPlan.toString
    p should not include "Expand"
    p.sliding("Exchange".length).count(_ == "Exchange") shouldBe 1
  }

  test("q91 sliding HLL matches exact q83 window-by-window within sketch error") {
    assume(haveData, s"$sfDir not present")
    val exact = graft.queries.EventAnalytics.q83TrailingDistinct(spark, sfDir)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val approx = graft.queries.EventAnalytics.q91SlidingHll(spark, sfDir)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    // same window-day set: both emit exactly the covered trailing days
    approx.keySet shouldBe exact.keySet
    exact.foreach { case (day, n) =>
      val est = approx(day)
      withClue(s"$day exact=$n approx=$est:") {
        math.abs(est - n).toDouble / n should be <= 0.05 // lgK 12 ⇒ ~1.6% rsd
      }
    }
  }
}
