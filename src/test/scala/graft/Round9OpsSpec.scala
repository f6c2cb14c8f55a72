package graft

import graft.functions.StringSim
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Fixture pins for the round-9 operator family: the JaroWinkler
  * expression's exact doubles (pinned against DuckDB's native
  * `jaro_winkler_similarity` outputs, measured), the entropy fold,
  * the Theil–Sen robustness property, and the LLR sign contract.
  */
class Round9OpsSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    StringSim.jaroWinkler(UTF8String.fromString(a), UTF8String.fromString(b))

  // -- JaroWinkler: exact DuckDB-measured doubles ---------------------

  test("jaroWinkler matches DuckDB bit-for-bit on the classic fixtures") {
    jw("martha", "marhta") shouldBe 0.9611111111111111
    jw("dwayne", "duane") shouldBe 0.8400000000000001
    jw("dixon", "dicksonx") shouldBe 0.8133333333333332
    jw("a", "ab") shouldBe 0.8500000000000001
    jw("small ring", "small gizmo") shouldBe 0.8804545454545455
    jw("red widget", "red wrench") shouldBe 0.8400000000000001
  }

  test("jaroWinkler edge cases follow DuckDB (empty→0, window clamp, transposed)") {
    jw("", "") shouldBe 0.0 // DuckDB returns 0 for empty, NOT 1
    jw("", "a") shouldBe 0.0
    jw("a", "a") shouldBe 1.0 // needs the max(0, window) clamp
    jw("a", "b") shouldBe 0.0
    jw("ab", "ba") shouldBe 0.0 // window 0: adjacent transposition can't match
    jw("ab", "ab") shouldBe 1.0
  }

  test("jaroWinkler expression runs inside codegen identically to direct eval") {
    graft.functions.StringSimFunctions.register(spark)
    val got = Seq(("martha", "marhta"), ("dixon", "dicksonx"), ("", ""))
      .toDF("a", "b")
      .select(graft.functions.StringSimFunctions.jaroWinkler(col("a"), col("b")))
      .collect().map(_.getDouble(0)).toSeq
    got shouldBe Seq(0.9611111111111111, 0.8133333333333332, 0.0)
  }

  // -- q158 core: the entropy fold ------------------------------------

  test("q158 entropy orders repetitive < natural < uniform") {
    val dir = tmpDir("entropy-docs")
    Seq(
      (1L, "aaaa aaaa aaaa aaaa aaaa aaaa", "en", "s", 29L),
      (2L, "the quick brown fox jumps over the lazy dog again", "en", "s", 50L),
      (3L, "abcdefghijklmnopqrstuvwxyz0123456789", "en", "s", 36L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val r = graft.queries.LlmPipeline.q158CharEntropy(spark, dir)
      .collect().map(x => x.getLong(0) -> x.getLong(3)).toMap
    r(1L) should be < r(2L)
    r(2L) should be < r(3L)
    // two symbols, 24 a's + 5 spaces: H = ln(29) - (24 ln 24 + 5 ln 5)/29
    val expected = math.log(29.0) - (24.0 * math.log(24.0) + 5.0 * math.log(5.0)) / 29.0
    r(1L) shouldBe math.floor(expected * 1e6).toLong +- 1L
    // 36 distinct symbols once each: exactly ln(36)
    r(3L) shouldBe math.floor(math.log(36.0) * 1e6).toLong +- 1L
  }

  // -- q160 core: Theil–Sen robustness --------------------------------

  test("q160 Theil–Sen shrugs off a single spike day that drags OLS") {
    val dir = tmpDir("theil-events")
    // 9 days of perfect slope 2 plus one 1000-count spike day
    val rows = (0 until 9).map { i =>
      (1 to (10 + 2 * i)).map(j =>
        (i * 1000L + j, java.sql.Timestamp.valueOf(f"2024-01-${i + 1}%02d 12:00:00"),
          j.toLong, "view", 1.0, "{}"))
    }.flatten ++ (1 to 1000).map(j =>
      (90000L + j, java.sql.Timestamp.valueOf("2024-01-10 12:00:00"), j.toLong, "view", 1.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val r = graft.queries.Analytics.q160TheilSen(spark, dir).collect()
    r.length shouldBe 1
    r(0).getLong(1) shouldBe 45L // C(10,2) pairs
    // median pairwise slope stays at the true trend despite the spike
    r(0).getDouble(2) shouldBe 2.0 +- 1e-9
  }

  // -- q162 core: deterministic LPA hand-derivation --------------------

  test("q162 labelPropagate matches the hand-derived 2-round sync LPA") {
    // two triangles {1,2,3}, {10,11,12} bridged 3-10; sync rounds with
    // (count desc, label asc) tiebreak derive exactly:
    //   r1: 1→2, 2→1, 3→1, 10→3, 11→10, 12→10
    //   r2: 1→1, 2→1, 3→1, 10→10, 11→3, 12→3
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L), (3L, 10L)).toDF("x", "y")
    val r = graft.queries.Graph.labelPropagate(edges, 2)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    r shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 3L, 12L -> 3L)
  }

  test("q162 convergence witness: an LpaRounds+1-th round is a no-op at this sf") {
    // The q138 lesson (a fixed unroll can silently under-iterate):
    // pin that LpaRounds has reached the measured FIXPOINT on the real
    // sf0.001 co-purchase graph — an extra synchronous round changes
    // no label (it moved 115 labels when LpaRounds was 2). If testdata
    // grows a deeper community structure, this fails loudly instead of
    // q162 quietly under-propagating. (At sf0.01 synchronous LPA
    // 2-cycles forever — there the fixed round count is the DOCUMENTED
    // semantics, see the LpaRounds scaladoc.)
    val sfDir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$sfDir/lineitem.parquet").exists())
    val n = graft.queries.Graph.LpaRounds
    val edges = graft.queries.Graph
      .copurchaseEdges(spark, sfDir, 2) // TriMinSupport
      .transform(graft.ops.SharedCache.persist)
    val atN = graft.queries.Graph.labelPropagate(edges, n)
    val atN1 = graft.queries.Graph.labelPropagate(edges, n + 1)
    atN.exceptAll(atN1).count() shouldBe 0L
    atN1.exceptAll(atN).count() shouldBe 0L
  }

  // -- q163 core: discount table + perfect-retrieval fixture -----------

  test("q163 discount literals are the floor-e9 log2 table") {
    graft.queries.LlmPipeline.NdcgDiscE9.head shouldBe 1000000000L
    graft.queries.LlmPipeline.NdcgDiscE9(1) shouldBe 630929753L // 1e9/log2(3)
    graft.queries.LlmPipeline.NdcgCumE9.head shouldBe 1000000000L
    graft.queries.LlmPipeline.NdcgCumE9(1) shouldBe 1630929753L
    graft.queries.LlmPipeline.NdcgCumE9.last shouldBe
      graft.queries.LlmPipeline.NdcgDiscE9.sum
  }

  test("q163 scores a perfectly separated corpus at NDCG exactly 1.0") {
    val dir = tmpDir("ndcg-emb")
    // 26 vectors, two orthogonal label clusters with tiny in-cluster
    // spread: every same-label cosine ≫ every cross-label cosine, so
    // the top-10 for query 0 (label 0, 12 same-label others) are all
    // relevant → dcg = idcg → ndcg = 1.0
    val dim = 64
    (0 until 26).map { i =>
      val v = Array.fill(dim)(0.0f)
      v(i % 2) = 1.0f
      v(3 + i % 2) = 0.001f * i
      (i.toLong, v.toSeq, i % 2)
    }.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val r = graft.queries.LlmPipeline.q163NdcgAudit(spark, dir)
      .collect().map(x => x.getLong(0) -> (x.getLong(2), x.getDouble(5))).toMap
    r.keySet shouldBe Set(0L, 25L)
    r(0L)._1 shouldBe 12L // 13 even ids, minus the query itself
    r(0L)._2 shouldBe 1.0
    r(25L)._2 shouldBe 1.0
  }

  // -- q164 core: XOR fingerprint localization -------------------------

  test("q164 a single-row change flips exactly its leaf and the root") {
    def write(dir: String, price42: Double): Unit =
      (0 until 600).map(i => (i.toLong, (i % 37).toLong,
        if (i % 3 == 0) "F" else "O",
        if (i == 42) price42 else 100.0 + i,
        java.sql.Timestamp.valueOf("2024-05-01 00:00:00"),
        "1-URGENT"))
        .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate", "o_orderpriority")
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val d1 = tmpDir("merkle-a"); val d2 = tmpDir("merkle-b")
    write(d1, 142.0); write(d2, 999.0)
    def fps(d: String): Map[Long, (Long, Long)] =
      graft.queries.Profiling.q164MerkleFingerprint(spark, d)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val (a, b) = (fps(d1), fps(d2))
    a.keySet shouldBe b.keySet
    val diff = a.keySet.filter(k => a(k) != b(k))
    diff shouldBe Set(42L, -1L) // the changed row's bucket and the root
    a(42L)._1 shouldBe b(42L)._1 // row COUNTS agree; only content differs
  }

  // -- q165 core: BPE merge rounds ------------------------------------

  test("q165 learns the hand-derived merges, non-overlapping left-to-right") {
    val dir = tmpDir("bpe-docs")
    // corpus: "abab abab aaaa" ×3 docs → dict {abab: 6, aaaa: 3}
    // round 1 pairs: (a,b) 2·6=12, (b,a) 6, (a,a) 3·3=9 → merge a+b
    // round 2 seqs: (ab)(ab), a·a·a·a → pairs: (ab,ab) 6, (a,a) 9 → a+a
    //   — and "aaaa" must contribute THREE (a,a) pairs (overlapping
    //   positions count in the pair statistics) yet rewrite to exactly
    //   (aa)(aa) under the non-overlapping left-to-right replace
    Seq((1L, "abab abab aaaa", "en", "s", 14L),
      (2L, "abab abab aaaa", "en", "s", 14L),
      (3L, "abab abab aaaa", "en", "s", 14L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val r = graft.queries.Curation.q165BpeMerges(spark, dir)
      .collect().map(x => (x.getLong(0), x.getLong(1)) ->
        (x.getString(2), x.getString(3), x.getLong(4))).toMap
    r((1L, 1L)) shouldBe (("a", "b", 12L))
    r((1L, 2L)) shouldBe (("a", "a", 9L))
    r((1L, 3L)) shouldBe (("b", "a", 6L))
    r((2L, 1L)) shouldBe (("a", "a", 9L))
    r((2L, 2L)) shouldBe (("ab", "ab", 6L))
  }

  // -- q161 core: LLR sign contract -----------------------------------

  test("q161 weights rank target-exclusive vocabulary above off-target") {
    assume(new java.io.File("/root/testdata/sf0.001/documents.parquet").exists())
    val w = graft.queries.Curation.q161ImportanceWeights(spark, "/root/testdata/sf0.001")
      .withColumn("per_tok",
        col("llr_e6_sum").cast("double") / col("n_tokens").cast("double"))
    val byLang = w.groupBy("lang").agg(avg(col("per_tok")).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // the en slice IS the target: its average per-token LLR must beat
    // every other language's
    byLang.filter(_._1 != "en").values.foreach(_ should be < byLang("en"))
  }
}
