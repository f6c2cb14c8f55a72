package graft

import org.apache.spark.sql.functions._

/** Fixture pins for the round-10 operator batch: per-source vocabulary
  * concentration (q190 — hand-counted token frequencies), the IVF
  * cell-balance audit (q191 — partition identities against the
  * embedding table), the context-length policy sweep (q192 — exact
  * per-L arithmetic on known token counts), and the dedup token-yield
  * forecast (q193 — reconciled row-for-row against q183 and q55).
  */
class Round10OpsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  // -- q190: vocabulary concentration ------------------------------------

  test("q190 matches hand-counted frequencies on a tiny corpus") {
    // source s1: tokens a a a b b c → n=6, vocab=3, top1=a(3),
    // hapax = {c} → 1
    val dir = tmpDir("q190fix")
    Seq((1L, "a a a b", "en", "s1", 7L), (2L, "b c", "en", "s1", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = graft.queries.Curation.q190VocabConcentration(spark, dir)
      .collect()
    r.length shouldBe 1
    val row = r.head
    row.getString(0) shouldBe "s1"
    row.getLong(1) shouldBe 6L // n_tokens
    row.getLong(2) shouldBe 3L // vocab
    row.getLong(3) shouldBe 3L * 1000000L / 6L // ttr
    row.getLong(4) shouldBe 3L * 1000000L / 6L // top1 = a(3)
    row.getLong(5) shouldBe 1000000L // top10 covers everything
    row.getLong(6) shouldBe 1000000L // top100 covers everything
    row.getLong(7) shouldBe 1L * 1000000L / 6L // hapax token share
    row.getLong(8) shouldBe 1L * 1000000L / 3L // hapax vocab share
  }

  test("q190 ratios are internally consistent at sf0.001") {
    val rows = graft.queries.Curation.q190VocabConcentration(spark, sf)
      .collect()
    rows.length should be > 0
    rows.foreach { r =>
      r.getLong(2) should be <= r.getLong(1) // vocab ≤ tokens
      // head coverage is monotone in the cutoff
      r.getLong(4) should be <= r.getLong(5)
      r.getLong(5) should be <= r.getLong(6)
      r.getLong(6) should be <= 1000000L
      r.getLong(7) should be <= r.getLong(3) // hapax tokens ⊆ vocab mass
    }
    // corpus totals reconcile with a direct count
    val direct = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(split(trim(regexp_replace(lower(col("text")), "\\s+", " ")), " ")).as("tok"))
      .filter(col("tok") =!= "").count()
    rows.map(_.getLong(1)).sum shouldBe direct
  }

  // -- q191: IVF cell balance --------------------------------------------

  test("q191 cells partition the vector set and load factors average 1e6") {
    val rows = graft.queries.NearDup.q191IvfBalance(spark, sf)
      .orderBy("cell").collect()
    rows.length shouldBe 16 // one row per centroid, empty cells included
    val nVecs = spark.read.parquet(s"$sf/embeddings.parquet").count()
    rows.map(_.getLong(1)).sum shouldBe nVecs // assignment is a partition
    // share ppm sums to ~1e6 (floor-division loss < |cells|)
    val shareSum = rows.map(_.getLong(2)).sum
    shareSum should be <= 1000000L
    shareSum should be > 1000000L - 16L
    // load_e6 is share * K by construction
    rows.foreach { r =>
      r.getLong(3) shouldBe r.getLong(1) * 16L * 1000000L / nVecs
    }
  }

  // -- q192: context-length sweep ----------------------------------------

  test("q192 matches exact per-L arithmetic on known token counts") {
    // docs of 3 and 700 tokens; L=512: fit=1, trunc=188, pad=509
    val dir = tmpDir("q192fix")
    Seq((1L, "a b c", "en", "s1", 5L),
      (2L, Seq.fill(700)("w").mkString(" "), "en", "s1", 1399L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.queries.Curation.q192ContextSweep(spark, dir)
      .orderBy("ctx_len").collect()
    rows.map(_.getLong(0)).toSeq shouldBe Seq(512L, 1024L, 2048L, 4096L, 8192L)
    val at512 = rows.head
    at512.getLong(1) shouldBe 2L // n_docs
    at512.getLong(2) shouldBe 703L // n_tokens
    at512.getLong(3) shouldBe 1L // fit_docs
    at512.getLong(4) shouldBe 1L // cut_docs
    at512.getLong(5) shouldBe 188L // trunc_tokens = 700-512
    at512.getLong(6) shouldBe 188L * 1000000L / 703L
    at512.getLong(7) shouldBe (512L - 3L) + 0L // pad: doc2 fills its window
    at512.getLong(9) shouldBe 2L // packed_seqs = ceil(703/512)
    val at1024 = rows(1)
    at1024.getLong(3) shouldBe 2L // both fit
    at1024.getLong(5) shouldBe 0L
    at1024.getLong(9) shouldBe 1L // ceil(703/1024)
  }

  test("q192 policies are monotone in L at sf0.001") {
    val rows = graft.queries.Curation.q192ContextSweep(spark, sf)
      .orderBy("ctx_len").collect()
    rows.length shouldBe 5
    // larger windows: more docs fit, fewer tokens truncated, more padding
    rows.map(_.getLong(3)).toSeq shouldBe sorted // fit_docs ↑
    rows.map(-_.getLong(5)).toSeq shouldBe sorted // trunc_tokens ↓
    rows.map(_.getLong(7)).toSeq shouldBe sorted // pad_tokens ↑
    rows.map(-_.getLong(9)).toSeq shouldBe sorted // packed_seqs ↓
    rows.foreach { r =>
      // packing identity: seqs = ceil(n_tokens / L)
      r.getLong(9) shouldBe (r.getLong(2) + r.getLong(0) - 1L) / r.getLong(0)
    }
  }

  // -- q194: cluster-agreement audit -------------------------------------

  test("q194: LSH pairs ⊆ truth ⇒ zero merges, perfect pair precision") {
    // The generator guarantees q21 ⊆ q39 (q146's precision-1 property),
    // so the LSH closure refines the exact closure: every LSH cluster
    // sits inside one truth cluster — merged_pairs MUST be 0 and pair
    // precision exactly 1e6. Recall bounds and the Rand identities
    // cover the rest.
    val r = graft.queries.NearDup.q194ClusterAgreement(spark, sf).collect()
    r.length shouldBe 1
    val row = r.head
    val (nDocs, lshP, exactP, agree) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    nDocs should be > 0L
    agree shouldBe lshP // subset ⇒ all LSH same-pairs agree
    row.getLong(4) shouldBe 0L // merged_pairs
    row.getLong(5) shouldBe exactP - agree // missed_pairs
    row.getLong(6) shouldBe 1000000L // pair precision
    row.getLong(7) should be <= 1000000L // recall
    agree should be <= exactP
  }

  // -- q195: telemetry double-fire audit ---------------------------------

  test("q195 flags sub-second same-user same-type repeats on a hand fixture") {
    val dir = tmpDir("q195fix")
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(ms: Long) = new java.sql.Timestamp(t0.getTime + ms)
    Seq(
      (1L, at(0L), 10L, "click", 1.0, "{}"),
      (2L, at(500L), 10L, "click", 1.0, "{}"),   // repeat (0.5 s)
      (3L, at(10000L), 10L, "click", 1.0, "{}"), // not a repeat (10 s)
      (4L, at(0L), 20L, "click", 1.0, "{}"),     // other user, no repeat
      (5L, at(100L), 10L, "view", 1.0, "{}"))    // other type, no repeat
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.queries.EventAnalytics.q195DoubleFire(spark, dir)
      .orderBy("event_type")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    got shouldBe Seq(
      ("click", 4L, 1L, 250000L, 1L),
      ("view", 1L, 0L, 0L, 0L))
  }

  test("q195 partitions the event stream at sf0.001") {
    val rows = graft.queries.EventAnalytics.q195DoubleFire(spark, sf).collect()
    val total = spark.read.parquet(s"$sf/events.parquet").count()
    rows.map(_.getLong(1)).sum shouldBe total
    rows.foreach { r =>
      r.getLong(2) should be <= r.getLong(1)
      r.getLong(3) shouldBe r.getLong(2) * 1000000L / r.getLong(1)
    }
  }

  // -- q196: funnel time-to-convert percentiles --------------------------

  test("q196 reports the exact view→purchase latency on a hand fixture") {
    val dir = tmpDir("q196fix")
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(ms: Long) = new java.sql.Timestamp(t0.getTime + ms)
    Seq(
      (1L, at(0L), 10L, "view", 1.0, "{}"),
      (2L, at(5000L), 10L, "click", 1.0, "{}"),
      (3L, at(65000L), 10L, "purchase", 1.0, "{}"), // lat = 65 s
      (4L, at(0L), 20L, "view", 1.0, "{}"))         // never converts
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = graft.queries.EventAnalytics.q196FunnelLatency(spark, dir).collect()
    r.length shouldBe 1
    r.head.getLong(0) shouldBe 1L // n_converted
    r.head.getLong(1) shouldBe 65000L // mean e3
    r.head.getLong(2) shouldBe 65L
    r.head.getLong(3) shouldBe 65L
    r.head.getLong(4) shouldBe 65L
  }

  test("q196 reconciles with q65's converted-user count; percentiles ordered") {
    val r = graft.queries.EventAnalytics.q196FunnelLatency(spark, sf)
      .collect().head
    val converted = graft.queries.EventAnalytics.q65Funnel(spark, sf)
      .filter(col("funnel_stage") === 3L).count()
    r.getLong(0) shouldBe converted
    r.getLong(2) should be <= r.getLong(3)
    r.getLong(3) should be <= r.getLong(4)
  }

  // -- q197: per-language mix diversity ----------------------------------

  test("q197 inverse-Simpson matches hand arithmetic") {
    // en: sources 3 + 1 docs → eff = 4²·1000/(9+1) = 1600, top 750000
    val dir = tmpDir("q197fix")
    Seq((1L, "a", "en", "s1", 1L), (2L, "b", "en", "s1", 1L),
      (3L, "c", "en", "s1", 1L), (4L, "d", "en", "s2", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = graft.queries.Curation.q197MixDiversity(spark, dir).collect()
    r.length shouldBe 1
    r.head.getLong(1) shouldBe 4L
    r.head.getLong(2) shouldBe 2L
    r.head.getLong(3) shouldBe 1600L
    r.head.getLong(4) shouldBe 750000L
  }

  test("q197 effective count is bounded by the source count at sf0.001") {
    val rows = graft.queries.Curation.q197MixDiversity(spark, sf).collect()
    rows.length should be > 0
    val corpus = spark.read.parquet(s"$sf/documents.parquet").count()
    rows.map(_.getLong(1)).sum shouldBe corpus
    rows.foreach { r =>
      r.getLong(3) should be >= 1000L // ≥ 1 effective source
      r.getLong(3) should be <= r.getLong(2) * 1000L // ≤ n_sources
      r.getLong(4) should be <= 1000000L
    }
  }

  // -- q198: perceptual-hash image dedup ---------------------------------

  test("q198 aHash is brightness-invariant and structure-sensitive") {
    // ids 0 and 25 share the split column (m=1) but use DIFFERENT gray
    // pairs (40/160 vs 60/180) → identical hash (perceptual identity);
    // id 5 has a different split (m=2) → different hash.
    val dir = tmpDir("q198fix")
    Seq(0L, 25L, 5L).map(id => (id, "x", "en", "s1", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = graft.queries.LlmPipeline.q198ImagePhashDedup(spark, dir)
      .collect().map(x => x.getLong(0) ->
        (x.getString(1), x.getLong(2), x.getBoolean(3))).toMap
    r.keySet shouldBe Set(0L, 25L, 5L)
    r(0L)._1 shouldBe r(25L)._1 // brightness pair cancels
    r(0L)._1 should not be r(5L)._1 // split column does not
    r(0L)._1 shouldBe "FE" * 8 // closed form: 256 - 2^1, row-repeated
    r(5L)._1 shouldBe "FC" * 8 // 256 - 2^2
    r(0L)._2 shouldBe 2L
    r(0L)._3 shouldBe true // keeper = min asset id
    r(25L)._3 shouldBe false
  }

  test("q198 clusters partition the sampled assets at sf0.001") {
    val rows = graft.queries.LlmPipeline.q198ImagePhashDedup(spark, sf)
      .collect()
    val sampled = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") % 5 === 0).count()
    rows.length.toLong shouldBe sampled
    rows.map(_.getString(1)).distinct.length shouldBe 6 // six split columns
    // exactly one keeper per cluster
    rows.filter(_.getBoolean(3)).map(_.getString(1)).distinct.length shouldBe 6
    rows.count(_.getBoolean(3)) shouldBe 6
  }

  // -- q193: dedup token yield -------------------------------------------

  test("q193 reconciles with q183's removable rows and bounds its yields") {
    val rows = graft.queries.Graph.q193DedupYield(spark, sf).collect()
    rows.length should be > 0
    val removableDocs = graft.queries.Graph.q183ClusterProfile(spark, sf)
      .agg(sum(col("n_removable"))).head().getLong(0)
    rows.map(_.getLong(3)).sum shouldBe removableDocs
    val corpus = spark.read.parquet(s"$sf/documents.parquet").count()
    rows.map(_.getLong(1)).sum shouldBe corpus
    rows.foreach { r =>
      r.getLong(3) should be <= r.getLong(1) // removable ⊆ docs
      r.getLong(4) should be <= r.getLong(2) // removable tokens ⊆ tokens
      r.getLong(5) shouldBe r.getLong(3) * 1000000L / r.getLong(1)
      r.getLong(6) shouldBe r.getLong(4) * 1000000L / r.getLong(2)
    }
  }
}
