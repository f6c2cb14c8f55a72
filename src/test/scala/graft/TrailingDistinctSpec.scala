package graft

import java.sql.Timestamp
import java.time.LocalDate

/** Property pin for q83's interval-cover trick: "active day d covers
  * window-days [d, min(d+6, next_active−1)]" must equal brute-force
  * distinct-users-per-trailing-window on RANDOM activity patterns —
  * the off-by-one surface (gaps longer than the window, adjacent
  * days, singleton users, boundary days) is exactly where a cover
  * rule quietly breaks.
  */
/** Shared quadratic restatement of the trailing-7-day distinct-users
  * contract — the single source of truth for the window-boundary logic
  * both the batch (q83) and streaming (RollingMau) specs pin against. */
object TrailingDistinctSpec {
  def brute(act: Seq[(LocalDate, Long)]): Map[LocalDate, Long] = {
    val days = act.map(_._1)
    val lo = days.min
    val hi = days.max.plusDays(6)
    Iterator.iterate(lo)(_.plusDays(1)).takeWhile(!_.isAfter(hi)).map { d =>
      d -> act.filter { case (ad, _) =>
        !ad.isAfter(d) && !ad.isBefore(d.minusDays(6))
      }.map(_._2).distinct.length.toLong
    }.filter(_._2 > 0).toMap
  }
}

class TrailingDistinctSpec extends SparkSpec {

  import spark.implicits._
  import TrailingDistinctSpec.brute

  test("q83 cover rule equals brute force on random activity patterns") {
    val rnd = new scala.util.Random(7)
    val base = LocalDate.of(2024, 3, 1)
    (1 to 5).foreach { trial =>
      // random sparse activity: gaps can exceed the 7-day window
      val act = Seq.fill(rnd.nextInt(30) + 5)(
        (base.plusDays(rnd.nextInt(25).toLong), rnd.nextInt(4).toLong + 1)).distinct
      // ts as NANOSECOND LONG — the driver testdata's physical encoding,
      // which Tables.events rebuilds into a microsecond timestamp
      val events = act.zipWithIndex.map { case ((day, user), i) =>
        (i.toLong, Timestamp.valueOf(day.atTime(12, 0)).getTime * 1000000L,
          user, "view", 1.0, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val dir = tmpDir(s"q83prop$trial")
      events.write.mode("overwrite").parquet(s"$dir/events.parquet")
      val got = graft.queries.EventAnalytics.q83TrailingDistinct(spark, dir)
        .collect().map(r => r.getDate(0).toLocalDate -> r.getLong(1)).toMap
      withClue(s"trial $trial (${act.size} activity rows):") {
        got shouldBe brute(act)
      }
    }
  }
}
