package graft

import org.apache.spark.sql.functions._

/** Fixture pins for the round-10b operator batch: the t-closeness
  * audit completing the privacy trilogy (q199 — hand-derived skew
  * arithmetic + trilogy reconciliation), the BPE compression curve
  * (q200 — hand-traced merges on a 3-word corpus), audio VAD spans
  * (q201 — structural span bounds the silent-slot synth guarantees),
  * shot boundaries (q202 — closed-form jumps), the landmark BFS hop
  * histogram (q203 — a hand-built two-component graph + the horizon
  * headroom witness), and the stationary event mix (q204 — an exact
  * 2-cycle fixture + a one-extra-step convergence witness).
  */
class Round10bOpsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  // -- q199: t-closeness --------------------------------------------------

  test("q199 matches hand-derived variational distances") {
    // Global: A=3, B=3, N=6. Class (1,0) = 2×A: dist = ½(|1−½|+|0−½|)
    // = ½ → 500000 ppm. Class (2,0) = 1×A + 3×B: dist = ½(|¼−½|+|¾−½|)
    // = ¼ → 250000 ppm. Thresholds 1e5/2e5: both at risk; 4e5: only
    // the homogeneous class.
    val dir = tmpDir("q199fix")
    (Seq.fill(2)((1L, 500.0, "A")) ++ Seq((2L, 500.0, "A")) ++
      Seq.fill(3)((2L, 500.0, "B")))
      .toDF("c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val rows = graft.queries.Profiling.q199TCloseness(spark, dir)
      .orderBy("t").collect()
    rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5))).toSeq shouldBe Seq(
      (100000L, 6L, 2L, 6L, 2L, 1000000L),
      (200000L, 6L, 2L, 6L, 2L, 1000000L),
      (400000L, 6L, 2L, 2L, 1L, 333333L))
  }

  test("q199 reconciles with the trilogy and is monotone in t at sf0.001") {
    val rows = graft.queries.Profiling.q199TCloseness(spark, sf)
      .orderBy("t").collect()
    rows.length shouldBe 3
    val k = graft.queries.Profiling.q173KAnonymity(spark, sf).collect().head
    // same table, same row universe as the k-anonymity gate
    rows.foreach(_.getLong(1) shouldBe k.getLong(1))
    // risk can only shrink as the tolerance t grows
    rows.map(-_.getLong(3)).toSeq shouldBe sorted
    rows.map(-_.getLong(4)).toSeq shouldBe sorted
    rows.foreach { r =>
      r.getLong(3) should be <= r.getLong(1)
      r.getLong(5) shouldBe r.getLong(3) * 1000000L / r.getLong(1)
    }
  }

  test("q199 streaming twin reports bit-equal closeness from folded cells") {
    // Fold the fixture in two chunks through the l-diversity cell
    // state, then read the t-closeness report off the SAME state.
    val dir = tmpDir("q199strm")
    val st = s"$dir/state"
    val batch = (Seq.fill(2)((1L, 500.0, "A")) ++ Seq((2L, 500.0, "A")) ++
      Seq.fill(3)((2L, 500.0, "B")))
      .toDF("c_nationkey", "c_acctbal", "c_mktsegment")
      .withColumn("q2", floor(col("c_acctbal") / 1000).cast("long"))
    graft.streaming.StreamingLDiversity.processBatch(spark,
      batch.filter(col("c_mktsegment") === "A"), 0L, st,
      Seq("c_nationkey", "q2"), "c_mktsegment")
    graft.streaming.StreamingLDiversity.processBatch(spark,
      batch.filter(col("c_mktsegment") === "B"), 1L, st,
      Seq("c_nationkey", "q2"), "c_mktsegment")
    val got = graft.streaming.StreamingLDiversity
      .tclosenessReport(spark, st).orderBy("t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSeq
    got shouldBe Seq((100000L, 6L, 6L), (200000L, 6L, 6L), (400000L, 6L, 2L))
  }

  // -- q200: BPE compression curve -----------------------------------------

  test("q200 matches the hand-traced merge arithmetic") {
    // words: aaab×2, ab×1 → round 0: 2·4+1·2 = 10 symbols. Merge 1 =
    // (a,a) (count 4 > (a,b) 3): aaab → (aa)ab, 8 symbols. Merge 2 =
    // (a,b) (count 3 > (aa,a) 2): → (aa)(ab) and (ab), 5 symbols.
    val dir = tmpDir("q200fix")
    Seq((1L, "aaab aaab", "en", "s1", 9L), (2L, "ab", "en", "s1", 2L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.queries.Curation.q200BpeCompressionCurve(spark, dir)
      .orderBy("round").collect()
    rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6))).toSeq shouldBe Seq(
      (0L, 3L, 2L, 10L, 0L, 0L, 3333L),
      (1L, 3L, 2L, 8L, 2L, 200000L, 2666L),
      (2L, 3L, 2L, 5L, 5L, 500000L, 1666L))
  }

  test("q200 curve is monotone and reconciles with the corpus at sf0.001") {
    val rows = graft.queries.Curation.q200BpeCompressionCurve(spark, sf)
      .orderBy("round").collect()
    rows.length shouldBe 3
    // merges can only shrink the corpus; words/dictionary never change
    rows.map(-_.getLong(3)).toSeq shouldBe sorted
    rows.map(_.getLong(1)).distinct.length shouldBe 1
    rows.map(_.getLong(2)).distinct.length shouldBe 1
    // round 0 = full character split: symbols ≡ total token characters
    val chars = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(split(trim(regexp_replace(lower(col("text")), "\\s+", " ")), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .agg(sum(expr("length(tok)"))).head().getLong(0)
    rows.head.getLong(3) shouldBe chars
  }

  // -- q201: audio VAD spans ------------------------------------------------

  test("q201 spans respect the silent-slot structure of the synth") {
    val rows = graft.queries.LlmPipeline.q201AudioVadSpans(spark, sf).collect()
    val sampled = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") % 10 === 5).count()
    rows.length.toLong shouldBe sampled
    rows.foreach { r =>
      r.getLong(1) shouldBe 8L // 2048 samples / 256
      val active = r.getLong(2)
      active should be <= 8L
      // every third frame slot is synthesized silent (exact zeros), so
      // no active run can exceed 2 frames and runs are ≤ 3 islands
      r.getLong(4) should be <= 2L // longest_span
      r.getLong(3) should be <= 3L // n_spans
      if (active == 0L) r.getLong(3) shouldBe 0L
      r.getLong(5) shouldBe active * 1000000L / 8L
    }
    // the energy floor actually bites both ways somewhere in the corpus
    rows.map(_.getLong(2)).max should be > 0L
    rows.map(_.getLong(2)).min should be < 8L
  }

  // -- q202: shot boundaries ------------------------------------------------

  test("q202 matches the closed-form frame-color jumps") {
    val rows = graft.queries.LlmPipeline.q202ShotBoundaries(spark, sf).collect()
    val sampled = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") % 10 === 5).count()
    rows.length.toLong shouldBe sampled
    def ch(id: Long, f: Long, m: Long) = (id * m + f * (m match {
      case 37L => 11L; case 59L => 23L; case _ => 31L
    })) % 256L
    rows.foreach { r =>
      val id = r.getLong(0)
      val jumps = (1L to 3L).map { f =>
        math.abs(ch(id, f, 37) - ch(id, f - 1, 37)) +
          math.abs(ch(id, f, 59) - ch(id, f - 1, 59)) +
          math.abs(ch(id, f, 83) - ch(id, f - 1, 83))
      }
      r.getLong(1) shouldBe 4L // n_frames: the stride-1 demux saw all
      r.getLong(2) shouldBe jumps.count(_ >= 128L).toLong // n_cuts
      r.getLong(3) shouldBe jumps.max // max_jump
      r.getLong(4) shouldBe r.getLong(2) + 1L // n_shots
    }
  }

  // -- q203: landmark BFS hop histogram --------------------------------------

  test("q203 matches hand-computed hop distances on a two-component graph") {
    // s1—c10—s2—c20 chain (landmark s1: dists 0,1,2,3) plus a separate
    // s3—c30 component (unreachable: −1 ×2).
    val dir = tmpDir("q203fix")
    Seq(1L, 2L, 3L).toDF("s_suppkey")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    Seq((100L, 10L), (101L, 10L), (102L, 20L), (103L, 30L))
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((100L, 1L), (101L, 2L), (102L, 2L), (103L, 3L))
      .toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = graft.queries.Graph.q203BfsHops(spark, dir)
      .orderBy("dist").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    got shouldBe Seq((-1L, 2L), (0L, 1L), (1L, 1L), (2L, 1L), (3L, 1L))
  }

  test("q203 covers the node universe with horizon headroom at sf0.001") {
    val rows = graft.queries.Graph.q203BfsHops(spark, sf).collect()
    val dists = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the shipment graph's node count, independently derived
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(spark.read.parquet(s"$sf/orders.parquet")
        .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
    val nNodes = li.select(concat(lit("s"), col("l_suppkey")).as("n"))
      .union(li.select(concat(lit("c"), col("o_custkey")).as("n")))
      .distinct().count()
    rows.map(_.getLong(1)).sum shouldBe nNodes
    // loud-failure headroom: the measured eccentricity sits far below
    // the declared horizon (the q138 convergence-witness discipline)
    val maxDist = dists.keys.max
    maxDist should be < graft.queries.Graph.BfsHorizon.toLong
    maxDist should be <= 6L
    dists(0L) shouldBe 1L // exactly one landmark supplier at sf0.001
  }

  // -- q204: stationary event mix ---------------------------------------------

  test("q204 reaches the exact stationary split of a 2-cycle chain") {
    // A→B and B→A with probability 1: the uniform start IS stationary,
    // every power iteration reproduces (5e8, 5e8) exactly.
    val dir = tmpDir("q204fix")
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(s: Long) = new java.sql.Timestamp(t0.getTime + s * 1000L)
    Seq((1L, at(0L), 10L, "A", 1.0, "{}"), (2L, at(1L), 10L, "B", 1.0, "{}"),
      (3L, at(2L), 10L, "A", 1.0, "{}"), (4L, at(3L), 10L, "B", 1.0, "{}"),
      (5L, at(0L), 20L, "B", 1.0, "{}"), (6L, at(1L), 20L, "A", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.queries.EventAnalytics.q204StationaryMix(spark, dir)
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    got shouldBe Seq(("A", 500000000L, 500000L), ("B", 500000000L, 500000L))
  }

  test("q204 has converged at sf0.001: one more step moves nothing material") {
    val pi = graft.queries.EventAnalytics.q204StationaryMix(spark, sf)
    val trans = graft.queries.EventAnalytics.q84TransitionMatrix(spark, sf)
    // apply the transition operator once more, from already-verified
    // relations — the convergence witness (q138/q162 discipline)
    val next = trans.join(pi, col("prev_type") === col("event_type"))
      .select(col("next_type"), expr("pi_e9 * rate_ppm div 1000000").as("c"))
      .groupBy("next_type").agg(sum(col("c")).as("next_e9"))
    val moved = pi.join(next, col("event_type") === col("next_type"))
      .select(abs(col("next_e9") - col("pi_e9")).as("d"))
      .agg(max(col("d"))).head().getLong(0)
    moved should be < 1000000L // < 0.1% of total mass per type
    // mass only leaks through floors/sinks, never appears
    val total = pi.agg(sum(col("pi_e9"))).head().getLong(0)
    total should be <= 1000000000L
    total should be > 900000000L
  }
}
