package graft

import java.sql.Timestamp

import graft.queries.EventAnalytics
import graft.streaming.StreamingEvents
import graft.streaming.StreamingEvents.{Ev, SessionState}
import org.apache.spark.api.java.Optional
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}

/** Pins the Structured Streaming surfaces against their batch twins:
  *
  *  - `windowedKpis` run as a stream over a JSON landing dir must equal
  *    the same function run in batch over the same dir (the batch q34
  *    oracle then transitively verifies the streaming plan);
  *  - `foldUser` (the flatMapGroupsWithState kernel) unit semantics:
  *    in-batch gap close, cross-batch state carry, timeout emission;
  *  - end-to-end `sessionize` over a MemoryStream must emit exactly the
  *    sessions batch `sessionizeBatch` computes on the same events,
  *    once the watermark has passed every gap.
  */
class EventStreamSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def haveData = new java.io.File(s"$sfDir/events.parquet").exists()

  private def ts(minutes: Long): Timestamp = new Timestamp(1700000000000L + minutes * 60000L)

  test("streaming windowedKpis equals batch windowedKpis over the same landing") {
    assume(haveData, s"$sfDir not present")
    import spark.implicits._
    val landing = tmpDir("events-landing")
    val fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    Tables.events(spark, sfDir)
      .write.mode("overwrite").option("timestampFormat", fmt).json(landing)

    val batchIn = spark.read.schema(StreamingEvents.eventSchema)
      .option("timestampFormat", fmt).json(landing)
    val expected = StreamingEvents.windowedKpis(batchIn)
      .as[(Timestamp, String, Long, Long, Long)].collect().toSet
    expected should not be empty

    val stream = spark.readStream.schema(StreamingEvents.eventSchema)
      .option("timestampFormat", fmt).json(landing)
    val q = StreamingEvents.windowedKpis(stream)
      .writeStream.format("memory").queryName("kpis").outputMode("complete").start()
    try q.processAllAvailable()
    finally q.stop()
    val got = spark.table("kpis")
      .as[(Timestamp, String, Long, Long, Long)].collect().toSet
    got shouldBe expected
  }

  test("streaming ohlcBars equals batch ohlcBars over the same landing") {
    assume(haveData, s"$sfDir not present")
    import spark.implicits._
    val landing = tmpDir("ohlc-landing")
    val fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    Tables.events(spark, sfDir)
      .write.mode("overwrite").option("timestampFormat", fmt).json(landing)

    val batchIn = spark.read.schema(StreamingEvents.eventSchema)
      .option("timestampFormat", fmt).json(landing)
    val expected = StreamingEvents.ohlcBars(batchIn)
      .as[(Timestamp, String, Long, Long, Long, Long, Long)].collect().toSet
    expected should not be empty

    val stream = spark.readStream.schema(StreamingEvents.eventSchema)
      .option("timestampFormat", fmt).json(landing)
    val q = StreamingEvents.ohlcBars(stream)
      .writeStream.format("memory").queryName("ohlc").outputMode("complete").start()
    try q.processAllAvailable()
    finally q.stop()
    val got = spark.table("ohlc")
      .as[(Timestamp, String, Long, Long, Long, Long, Long)].collect().toSet
    got shouldBe expected
  }

  test("foldUser closes a session in-batch on a >30min gap and keeps the last open") {
    val state = TestGroupState.create[SessionState](
      Optional.empty(), GroupStateTimeout.EventTimeTimeout, 0L, Optional.of(0L), false)
    val events = Iterator(
      Ev(1, ts(0), 7, "view", 1.0, "{}"),
      Ev(2, ts(10), 7, "click", 2.0, "{}"),
      Ev(3, ts(90), 7, "view", 4.0, "{}")) // 80min gap -> closes first
    val out = StreamingEvents.foldUser(7, events, state).toSeq
    out should have size 1
    out.head.n_events shouldBe 2
    out.head.value_sum_e2 shouldBe 300L
    out.head.session_start shouldBe ts(0)
    out.head.session_end shouldBe ts(10)
    state.exists shouldBe true
    state.get.nEvents shouldBe 1 // the ts(90) session stays open
  }

  test("foldUser extends carried state across batches, then emits on timeout") {
    val carried = TestGroupState.create[SessionState](
      Optional.empty(), GroupStateTimeout.EventTimeTimeout, 0L, Optional.of(0L), false)
    StreamingEvents.foldUser(7, Iterator(Ev(1, ts(0), 7, "view", 1.0, "{}")), carried)
      .toSeq shouldBe empty
    // next batch, within the gap: extends, still nothing emitted
    val st1 = TestGroupState.create[SessionState](
      Optional.of(carried.get), GroupStateTimeout.EventTimeTimeout, 0L, Optional.of(0L), false)
    StreamingEvents.foldUser(7, Iterator(Ev(2, ts(20), 7, "view", 2.5, "{}")), st1)
      .toSeq shouldBe empty
    st1.get.nEvents shouldBe 2
    // watermark passes end+gap: timed-out invocation emits and clears
    val st2 = TestGroupState.create[SessionState](
      Optional.of(st1.get), GroupStateTimeout.EventTimeTimeout, 0L,
      Optional.of(ts(120).getTime), true)
    val out = StreamingEvents.foldUser(7, Iterator.empty, st2).toSeq
    out should have size 1
    out.head.n_events shouldBe 2
    out.head.duration_us shouldBe 20L * 60 * 1000000
    out.head.value_sum_e2 shouldBe 350L
    st2.isRemoved shouldBe true
  }

  test("foldUser handles cross-batch stragglers like batch event-time order") {
    // open session at [60min, 70min]
    val base = SessionState(ts(60).getTime * 1000, ts(70).getTime * 1000, 2, 500L)
    // straggler 10 min before the open start (within gap): merges and
    // extends the session BACKWARDS, as batch sorting would
    val stNear = TestGroupState.create[SessionState](
      Optional.of(base), GroupStateTimeout.EventTimeTimeout, 0L, Optional.of(0L), false)
    StreamingEvents.foldUser(7, Iterator(Ev(9, ts(50), 7, "view", 1.0, "{}")), stNear)
      .toSeq shouldBe empty
    stNear.get.start shouldBe ts(50).getTime * 1000
    stNear.get.nEvents shouldBe 3
    // straggler 50 min before the open start (gap violated): its own
    // already-closed single-event session; the open session unchanged
    val stFar = TestGroupState.create[SessionState](
      Optional.of(base), GroupStateTimeout.EventTimeTimeout, 0L, Optional.of(0L), false)
    val out = StreamingEvents.foldUser(7, Iterator(Ev(9, ts(10), 7, "view", 1.0, "{}")), stFar)
      .toSeq
    out should have size 1
    out.head.n_events shouldBe 1
    out.head.session_start shouldBe ts(10)
    stFar.get shouldBe base
  }

  test("stream-stream interval join equals the batch interval join") {
    import spark.implicits._
    val views = Seq(
      Ev(1, ts(0), 1, "view", 0, "{}"),
      Ev(2, ts(40), 1, "view", 0, "{}"),
      Ev(3, ts(5), 2, "view", 0, "{}"))
    val clicks = Seq(
      Ev(10, ts(8), 1, "click", 0, "{}"),   // within 10min of view 1
      Ev(11, ts(45), 1, "click", 0, "{}"),  // within 10min of view 2 only
      Ev(12, ts(300), 2, "click", 0, "{}")) // no view within 10min

    val vStream = MemoryStream[Ev](spark)
    val cStream = MemoryStream[Ev](spark)
    val q = StreamingEvents.attributeWithin(vStream.toDF(), cStream.toDF(), 600)
      .writeStream.format("memory").queryName("attrib").outputMode("append").start()
    try {
      vStream.addData(views); cStream.addData(clicks)
      q.processAllAvailable()
      // advance both watermarks so all joinable pairs are emitted
      vStream.addData(Ev(99, ts(100000), 9, "view", 0, "{}"))
      cStream.addData(Ev(98, ts(100000), 9, "click", 0, "{}"))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("attrib")
      .filter($"user_id" =!= 9L)
      .select("user_id", "trigger_id", "action_id")
      .as[(Long, Long, Long)].collect().toSet
    val expected = StreamingEvents.attributeWithin(views.toDF(), clicks.toDF(), 600)
      .select("user_id", "trigger_id", "action_id")
      .as[(Long, Long, Long)].collect().toSet
    expected shouldBe Set((1L, 1L, 10L), (1L, 2L, 11L))
    got shouldBe expected
  }

  test("stream-static broadcast enrichment equals the batch join; unknown users pass through") {
    import spark.implicits._
    val dim = Seq((1L, "gold", 10L), (2L, "silver", 3L))
      .toDF("user_id", "tier", "lifetime_orders")
    val events = Seq(
      Ev(1, ts(0), 1, "view", 1.0, "{}"),
      Ev(2, ts(1), 2, "click", 2.0, "{}"),
      Ev(3, ts(2), 7, "view", 3.0, "{}")) // user 7 not in the dim

    val in = MemoryStream[Ev](spark)
    val q = StreamingEvents.enrichWithDim(in.toDF(), dim)
      .writeStream.format("memory").queryName("enriched").outputMode("append").start()
    try { in.addData(events); q.processAllAvailable() } finally q.stop()

    val got = spark.table("enriched")
      .select("event_id", "user_id", "tier", "lifetime_orders")
      .as[(Long, Long, Option[String], Option[Long])].collect().toSet
    val expected = StreamingEvents.enrichWithDim(events.toDF(), dim)
      .select("event_id", "user_id", "tier", "lifetime_orders")
      .as[(Long, Long, Option[String], Option[Long])].collect().toSet
    expected shouldBe Set(
      (1L, 1L, Some("gold"), Some(10L)),
      (2L, 2L, Some("silver"), Some(3L)),
      (3L, 7L, None, None)) // left join: unknown user kept, null attrs
    got shouldBe expected
    // the static side broadcasts: no shuffle of the stream
    val plan = StreamingEvents.enrichWithDim(events.toDF(), dim)
      .queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
  }

  test("end-to-end streaming sessionize equals batch sessionizeBatch") {
    import spark.implicits._
    val users = Seq(
      // user 1: two sessions (gap 45min), user 2: one session
      Ev(1, ts(0), 1, "view", 1.0, "{}"),
      Ev(2, ts(5), 1, "click", 2.0, "{}"),
      Ev(3, ts(50), 1, "view", 3.0, "{}"),
      Ev(4, ts(3), 2, "view", 4.0, "{}"))
    val sentinelUser = 999L

    val input = MemoryStream[Ev](spark)
    val q = StreamingEvents.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    try {
      input.addData(users)
      q.processAllAvailable()
      // two sentinel batches: the first advances the watermark past every
      // real gap, the second triggers the timeout sweep under it
      input.addData(Ev(100, ts(100000), sentinelUser, "view", 0.0, "{}"))
      q.processAllAvailable()
      input.addData(Ev(101, ts(200000), sentinelUser, "view", 0.0, "{}"))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("sessions")
      .filter($"user_id" =!= sentinelUser)
      .select("user_id", "session_start", "session_end", "duration_us", "n_events", "value_sum_e2")
      .as[(Long, Timestamp, Timestamp, Long, Long, Long)].collect().toSet

    val expected = EventAnalytics.sessionizeBatch(users.toDF())
      .select("user_id", "session_start", "session_end", "duration_us", "n_events", "value_sum_e2")
      .as[(Long, Timestamp, Timestamp, Long, Long, Long)].collect().toSet

    expected should have size 3
    got shouldBe expected
  }
}
