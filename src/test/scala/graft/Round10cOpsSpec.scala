package graft

/** Fixture pins for the round-10c operator batch: the per-source
  * n-gram novelty curve (q205 — hand-traced 5-gram first-seen
  * attribution on a 3-doc corpus, plus a reconciliation against the
  * q115 overlap matrix's per-source gram universe at sf0.001), the DP
  * histogram release (q206 — hand-derived trailing-zero geometric
  * noise incl. a clamped-at-zero cell), and the cluster-aware
  * split-leakage audit (q207 — a hand-built 3-cluster corpus with one
  * cluster straddling train/test).
  */
class Round10cOpsSpec extends SparkSpec {
  import org.apache.spark.sql.functions.col
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  // -- q205: per-source n-gram novelty curve -------------------------------

  test("q205 matches hand-traced first-seen gram attribution") {
    // source a: one doc of 6 tokens → 2 distinct 5-grams (both new:
    // a is lexicographically first). source b: a byte-identical copy
    // of a's doc (both grams already seen) + one 5-token doc (1 new
    // gram). So a = (2, 2, 1e6, cum 2); b = (3, 1, 333333, cum 3).
    val dir = tmpDir("q205fix")
    Seq(
      (1L, "t1 t2 t3 t4 t5 t6", "a"),
      (2L, "t1 t2 t3 t4 t5 t6", "b"),
      (3L, "u1 u2 u3 u4 u5", "b"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.queries.Curation.q205NoveltyCurve(spark, dir)
      .orderBy("source").collect()
    rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSeq shouldBe Seq(
      ("a", 2L, 2L, 1000000L, 2L),
      ("b", 3L, 1L, 333333L, 3L))
  }

  test("q205 curve is internally consistent and reconciles with q115 at sf0.001") {
    val rows = graft.queries.Curation.q205NoveltyCurve(spark, sf)
      .orderBy("source").collect()
    rows.length should be > 1
    // the lexicographically-first source can only see new grams
    rows.head.getLong(3) shouldBe 1000000L
    // the curve is the running sum of new_grams, so strictly increasing
    // as long as every source contributes ≥1 gram nobody earlier had —
    // assert the weaker invariant (monotone non-decreasing) plus the
    // exact fold identity
    var cum = 0L
    rows.foreach { r =>
      r.getLong(2) should be <= r.getLong(1)
      r.getLong(3) shouldBe r.getLong(2) * 1000000L / r.getLong(1)
      cum += r.getLong(2)
      r.getLong(4) shouldBe cum
    }
    // per-source gram universes are the SAME relation q115 reports as
    // n_a/n_b — reconcile n_grams row-for-row against the overlap matrix
    val sizes = graft.queries.Curation.q115SourceOverlap(spark, sf)
      .collect()
      .flatMap(r => Seq(r.getString(0) -> r.getLong(2),
        r.getString(1) -> r.getLong(3)))
      .toMap
    rows.foreach(r => sizes.get(r.getString(0)).foreach(_ shouldBe r.getLong(1)))
  }

  // -- q206: DP-noised histogram release -----------------------------------

  test("q206 matches hand-derived geometric noise, including the zero clamp") {
    // Trailing-zero noise per cell key (verified against an
    // independent Python md5 walk): (s0,en) → +1, (s3,en) → −1,
    // (bookB,en) → −3. With n = 2/1/1: s0 releases 3 (err 500000),
    // s3 releases exactly 0, and bookB CLAMPS −2 up to 0 — the
    // post-processing step — so its |err| is 1 doc, not 3.
    val dir = tmpDir("q206fix")
    (Seq((1L, "d one", "en", "s0"), (2L, "d two", "en", "s0"),
      (3L, "d three", "en", "s3"), (4L, "d four", "en", "bookB")))
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.queries.Profiling.q206DpRelease(spark, dir)
      .orderBy("source").collect()
    rows.map(r => (r.getString(0), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5))).toSeq shouldBe Seq(
      ("bookB", 1L, -3L, 0L, 1000000L),
      ("s0", 2L, 1L, 3L, 500000L),
      ("s3", 1L, -1L, 0L, 1000000L))
  }

  test("q206 mechanism identities hold on every cell at sf0.001") {
    val rows = graft.queries.Profiling.q206DpRelease(spark, sf).collect()
    rows.length should be > 1
    rows.foreach { r =>
      val (n, noise, rel, err) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      math.abs(noise) should be <= 20L
      rel shouldBe math.max(n + noise, 0L)
      err shouldBe math.abs(rel - n) * 1000000L / n
    }
  }

  // -- q207: cluster-aware split-leakage audit ------------------------------

  test("q207 matches the hand-built straddling cluster") {
    // Identical texts force q21 pairs (Jaccard 1), so q55 clusters are
    // exactly the text groups. Splits by doc-id hash: 2→train, 3→test,
    // 4/5→train, 1/7→val. Cluster {2,3} straddles train/test; {4,5}
    // and {1,7} stay inside one split. Doc 6 is a singleton — never
    // clustered, never counted.
    val dir = tmpDir("q207fix")
    val tA = "alpha beta gamma delta epsilon zeta eta theta"
    val tB = "one two three four five six seven eight"
    val tC = "rouge bleu vert jaune violet orange rose gris"
    Seq((2L, tA, "en", "w"), (3L, tA, "en", "w"),
      (4L, tB, "en", "w"), (5L, tB, "en", "w"),
      (1L, tC, "fr", "w"), (7L, tC, "fr", "w"),
      (6L, "lone wolf document nothing like the others here", "en", "w"))
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.queries.Graph.q207SplitLeakage(spark, dir)
      .orderBy("split").collect()
    rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5))).toSeq shouldBe Seq(
      ("test", 1L, 1L, 1L, 1L, 1000000L),
      ("train", 3L, 2L, 1L, 1L, 333333L),
      ("val", 2L, 1L, 0L, 0L, 0L))
  }

  test("q207 reconciles with q55 + q42 recomputed independently at sf0.001") {
    import org.apache.spark.sql.functions._
    val rows = graft.queries.Graph.q207SplitLeakage(spark, sf).collect()
    rows.foreach { r =>
      r.getLong(3) should be <= r.getLong(1) // leaky_docs ≤ n_docs
      r.getLong(4) should be <= r.getLong(2) // leaky_clusters ≤ n_clusters
      r.getLong(5) shouldBe r.getLong(3) * 1000000L / r.getLong(1)
    }
    // independent recompute: total clustered docs and total leaky docs
    val cl = graft.queries.Graph.q55DupClusters(spark, sf)
      .withColumn("split",
        when(conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
          .cast("long") % 10 < 8, "train")
          .when(conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
            .cast("long") % 10 === 8, "val").otherwise("test"))
    val straddle = cl.groupBy("cluster_id")
      .agg(countDistinct(col("split")).as("ns"))
      .filter(col("ns") > 1)
    val leakyDocs = cl.join(straddle, "cluster_id").count()
    rows.map(_.getLong(3)).sum shouldBe leakyDocs
    rows.map(_.getLong(1)).sum shouldBe cl.count()
  }

  // -- q212: space-filling-curve layout comparison ----------------------------

  test("hilbertD matches independently computed canonical xy2d values") {
    // Pinned against a Python reference of the canonical Wikipedia
    // xy2d walk at n = 65536 (adjacency-verified on the full 16×16
    // grid; the s−1 and n−1 flip variants verified equivalent on 20k
    // random points).
    import org.apache.spark.sql.functions._
    val got = Seq((0L, 0L), (4096L, 0L), (8192L, 0L), (4097L, 1L),
      (65535L, 65535L), (12345L, 54321L))
      .toDF("x", "y")
      .select(graft.queries.Analytics.hilbertD(col("x"), col("y")).as("d"))
      .collect().map(_.getLong(0)).toSeq
    got shouldBe Seq(0L, 16777216L, 246065834L, 16777218L,
      2863311530L, 1555040834L)
  }

  test("q212 matches hand-computed zones on a layout-distinguishing fixture") {
    // (0,0) and (255,65535) share a single-key file but land in curve
    // files 0 / 170 (Morton) and 0 / 85 (Hilbert); the curves pay 3e0
    // extra pk width for a ZERO sk zone spread, the single-key layout
    // reads every file on sk probes.
    val dir = tmpDir("q212fix")
    Seq((1L, 0L, 0L), (2L, 255L, 65535L), (3L, 256L, 0L),
      (4L, 511L, 65535L))
      .toDF("l_orderkey", "l_partkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val rows = graft.queries.Analytics.q212CurveComparison(spark, dir)
      .orderBy("layout").collect()
    rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSeq shouldBe Seq(
      ("hilbert", 2L, 2L, 1003L, 0L),
      ("morton", 2L, 2L, 1003L, 0L),
      ("single", 2L, 2L, 1000L, 2000L))
  }

  test("q212 shows the curve trade-off at sf0.1") {
    val rows = graft.queries.Analytics
      .q212CurveComparison(spark, "/root/testdata/sf0.1").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3), r.getLong(4)))
      .toMap
    val (sF, sPk, sSk) = rows("single")
    val (_, mPk, mSk) = rows("morton")
    val (_, hPk, hSk) = rows("hilbert")
    // single-key: near-perfect on its own key, blind on the other
    sPk should be <= 1100L
    sSk should be >= sF * 900L
    // curves: bounded on BOTH dimensions — each reads far less of the
    // file set on sk probes than the single-key layout
    mSk should be < sSk / 4
    hSk should be < sSk / 4
    // and pay only a bounded factor on pk vs the perfect layout
    Seq(mPk, hPk).foreach(_ should be < sSk)
  }

  // -- q213: split representativeness audit -----------------------------------

  test("q213 matches hand-computed L1 drift per split") {
    // doc 2→train "a a b", doc 3→test "a b b", doc 1→val "a b".
    // Corpus: a=4, b=4 of 8 ⇒ ppm_c = 500000 each (both in the top-100
    // reference). train/test skew one token 2:1 ⇒ L1 = |666666−500000|
    // + |333333−500000| = 333333 ppm; val matches the corpus exactly.
    val dir = tmpDir("q213fix")
    Seq((2L, "a a b", "en", "w"), (3L, "a b b", "en", "w"),
      (1L, "a b", "en", "w"))
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.queries.Profiling.q213SplitDrift(spark, dir)
      .orderBy("split").collect()
    rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq shouldBe
      Seq(("test", 3L, 333333L), ("train", 3L, 333333L), ("val", 2L, 0L))
  }

  test("q213 splits cover the corpus and stay within the L1 range at sf0.001") {
    import org.apache.spark.sql.functions._
    val rows = graft.queries.Profiling.q213SplitDrift(spark, sf).collect()
    rows.map(_.getString(0)).sorted shouldBe Seq("test", "train", "val")
    rows.foreach { r =>
      r.getLong(2) should (be >= 0L and be <= 2000000L)
    }
    // token totals reconcile with a direct corpus count
    val total = graft.Tables.documents(spark, sf)
      .select(explode(split(trim(regexp_replace(lower(col("text")),
        "\\s+", " ")), " "))).count()
    rows.map(_.getLong(1)).sum shouldBe total
  }

  // -- q214: contrastive pair mining -------------------------------------------

  test("q214 labels identical docs positive and reconciles its legs with q21") {
    val dir = tmpDir("q214fix")
    val tA = "alpha beta gamma delta epsilon zeta eta theta"
    Seq((2L, tA, "en", "w"), (3L, tA, "en", "w"),
      (6L, "lone wolf document nothing like the others here", "en", "w"))
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.queries.LlmPipeline.q214ContrastivePairs(spark, dir)
      .filter(col("kind") === "positive").collect()
    rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq shouldBe
      Seq((2L, 3L, 1000000L))
  }

  test("q214's positive leg is row-identical to q21 at sf0.001") {
    val pos = graft.queries.LlmPipeline.q214ContrastivePairs(spark, sf)
      .filter(col("kind") === "positive")
      .select(col("anchor"), col("pair_id"), col("jaccard_e6"))
      .collect().map(_.toSeq).toSet
    val q21 = graft.queries.LlmPipeline.q21DedupMinhashLsh(spark, sf)
      .select(col("doc_a"), col("doc_b"), col("jaccard_e6"))
      .collect().map(_.toSeq).toSet
    pos shouldBe q21
    // hard negatives exist (band collisions below threshold) and every
    // label matches its score
    val all = graft.queries.LlmPipeline.q214ContrastivePairs(spark, sf).collect()
    all.foreach { r =>
      (r.getString(3) == "positive") shouldBe (r.getLong(2) >= 500000L)
    }
    all.count(_.getString(3) == "hard_negative") should be > 0
  }

  // -- q215: count-min sketch ----------------------------------------------------

  test("q215 estimates exactly on a collision-free fixture") {
    // 3 distinct tokens land in 12 distinct cells (verified against an
    // independent Python md5 walk), so every estimate is exact.
    val dir = tmpDir("q215fix")
    Seq((1L, "a a a b b c", "en", "w"))
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.queries.Profiling.q215CountMinSketch(spark, dir)
      .orderBy("token").collect()
    rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSeq shouldBe Seq(
      ("a", 3L, 3L, 0L), ("b", 2L, 2L, 0L), ("c", 1L, 1L, 0L))
  }

  test("q215 never under-counts and reports the head tokens at sf0.001") {
    val rows = graft.queries.Profiling.q215CountMinSketch(spark, sf).collect()
    // sf0.001's synthetic vocab holds 31 distinct tokens — fewer than
    // the top-32 cut, so the report covers the whole head
    rows.length should (be > 0 and be <= 32)
    rows.foreach { r =>
      // the one-sided CMS guarantee: collisions only ADD
      r.getLong(2) should be >= r.getLong(1)
      r.getLong(3) shouldBe (r.getLong(2) - r.getLong(1)) * 1000000L / r.getLong(1)
    }
  }

  // -- q216: duplicate-aware preference pairs -----------------------------------

  test("q216 pairs the near-dup variants and drops the byte-dup cluster") {
    // Cluster {2,3}: same text except theta→iota — margins −65500 vs
    // −73500 (Python-verified) ⇒ one pair with gap 8000. Cluster
    // {4,5}: byte-identical ⇒ equal margins ⇒ no signal, filtered.
    val dir = tmpDir("q216fix")
    Seq(
      (2L, "alpha beta gamma delta epsilon zeta eta theta", "en", "w"),
      (3L, "alpha beta gamma delta epsilon zeta eta iota", "en", "w"),
      (4L, "one two three four five six seven eight", "en", "w"),
      (5L, "one two three four five six seven eight", "en", "w"))
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.queries.Curation.q216PreferencePairs(spark, dir).collect()
    rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5))).toSeq shouldBe Seq(
      (2L, 2L, 3L, -65500L, -73500L, 8000L))
  }

  test("q216 pairs come from real clusters with positive gaps at sf0.001") {
    val rows = graft.queries.Curation.q216PreferencePairs(spark, sf).collect()
    val clusters = graft.queries.Graph.q55DupClusters(spark, sf)
      .select("doc_id", "cluster_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      r.getLong(5) should be > 0L
      r.getLong(5) shouldBe r.getLong(3) - r.getLong(4)
      clusters(r.getLong(1)) shouldBe r.getLong(0) // chosen in its cluster
      clusters(r.getLong(2)) shouldBe r.getLong(0) // rejected too
      r.getLong(1) should not be r.getLong(2)
    }
  }

  // -- q217: incremental connected-components maintenance -----------------------

  test("q217 folds delta docs into base labels and keeps label identity") {
    // Base clusters {2,3} (tA) and {4,7} (tB); delta doc 10 (tA copy)
    // must join cluster 2 through the contracted run; delta-only pair
    // {20,30} (tC) forms its own cluster with the true min label.
    val dir = tmpDir("q217fix")
    val tA = "alpha beta gamma delta epsilon zeta eta theta"
    val tB = "one two three four five six seven eight"
    val tC = "rouge bleu vert jaune violet orange rose gris"
    Seq((2L, tA), (3L, tA), (10L, tA), (4L, tB), (7L, tB),
      (20L, tC), (30L, tC))
      .map { case (id, t) => (id, t, "en", "w") }
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.queries.Graph.q217IncrementalCc(spark, dir)
      .orderBy("doc_id").collect()
    rows.map(r => (r.getLong(0), r.getLong(1))).toSeq shouldBe Seq(
      (2L, 2L), (3L, 2L), (4L, 4L), (7L, 4L), (10L, 2L),
      (20L, 20L), (30L, 20L))
  }

  test("q217 is bit-identical to the from-scratch CC at sf0.001") {
    val inc = graft.queries.Graph.q217IncrementalCc(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = graft.queries.Graph.q55DupClusters(spark, sf)
      .select("doc_id", "cluster_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    inc shouldBe full
  }

  // -- q218: greedy quality-knapsack mix -----------------------------------------

  test("q218 takes whole feeds to the budget line and splits the boundary") {
    // Margins (Python-verified): sC 274000, sD −168000, sA −523000,
    // sB −866000. Total 9 tokens ⇒ budget 4: sC (3) whole, sD (2)
    // split at (4−3)/2 = 500000 ppm, sA/sB dropped.
    val dir = tmpDir("q218fix")
    Seq((1L, "c c c", "en", "sC"), (2L, "d d", "en", "sD"),
      (3L, "a", "en", "sA"), (4L, "b b b", "en", "sB"))
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.queries.Curation.q218QualityKnapsack(spark, dir)
      .orderBy("rank").collect()
    rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5))).toSeq shouldBe Seq(
      ("sC", 1L, 3L, 274000L, 3L, 1000000L),
      ("sD", 2L, 2L, -168000L, 5L, 500000L),
      ("sA", 3L, 1L, -523000L, 6L, 0L),
      ("sB", 4L, 3L, -866000L, 9L, 0L))
  }

  test("q218 greedy structure holds at sf0.001") {
    val rows = graft.queries.Curation.q218QualityKnapsack(spark, sf)
      .orderBy("rank").collect()
    rows.length should be > 1
    // margins weakly decrease down the rank order
    rows.map(-_.getLong(3)).toSeq shouldBe sorted
    // take_ppm is a monotone step: full → (≤1 partial) → zero
    val takes = rows.map(_.getLong(5)).toSeq
    takes.map(-_) shouldBe sorted
    takes.count(t => t > 0L && t < 1000000L) should be <= 1
    // taken token mass hits the budget exactly (integer identities)
    val total = rows.map(_.getLong(2)).sum
    val budget = total * 500000L / 1000000L
    val taken = rows.map(r => r.getLong(2) * r.getLong(5) / 1000000L).sum
    taken should (be >= budget - rows.length and be <= budget)
  }

  // -- q219: IVF recall audit ------------------------------------------------------

  test("q219 reconciles with an independent intersect of q23 and q33 at sf0.001") {
    val exact = graft.queries.LlmPipeline.q23AnnBruteForce(spark, sf)
      .select("q_id", "neighbor_id")
    val ivf = graft.queries.NearDup.q33AnnIvf(spark, sf)
      .select("q_id", "neighbor_id")
    val nExact = exact.count()
    val nHit = exact.intersect(ivf).count() // independent set operator
    val r = graft.queries.NearDup.q219IvfRecall(spark, sf).collect().head
    r.getLong(0) shouldBe nExact
    r.getLong(1) shouldBe nHit
    r.getLong(2) shouldBe nExact - nHit
    r.getLong(3) shouldBe nHit * 1000000L / nExact
    // the probed index finds a meaningful share of the exact edges
    r.getLong(3) should be > 0L
  }

  // -- q220: source-ablation quality impact ---------------------------------------

  test("q220 matches Python-verified leave-one-out means") {
    // Same 4-source corpus as q218; full-corpus mean −292778. Removing
    // the one GOOD feed (sC, margin 274000) drops the corpus to
    // −576167 (delta −283389); removing the worst (sB) lifts it to
    // −6167 (delta +286611).
    val dir = tmpDir("q220fix")
    Seq((1L, "c c c", "en", "sC"), (2L, "d d", "en", "sD"),
      (3L, "a", "en", "sA"), (4L, "b b b", "en", "sB"))
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.queries.Curation.q220SourceAblation(spark, dir)
      .orderBy("source").collect()
    rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4))).toSeq shouldBe Seq(
      ("sA", 1L, -523000L, -264000L, 28778L),
      ("sB", 3L, -866000L, -6167L, 286611L),
      ("sC", 3L, 274000L, -576167L, -283389L),
      ("sD", 2L, -168000L, -328429L, -35651L))
  }

  test("q220 deltas oppose margins and totals reconcile at sf0.001") {
    val rows = graft.queries.Curation.q220SourceAblation(spark, sf).collect()
    rows.length should be > 1
    // removing a below-average feed improves the corpus and vice versa:
    // delta sign is opposite to (margin − corpus mean) sign — verify
    // via the strongest pair ordering: the worst-margin source has the
    // largest delta and the best-margin source the smallest
    val byMargin = rows.sortBy(_.getLong(2))
    val byDelta = rows.sortBy(-_.getLong(4))
    byMargin.head.getString(0) shouldBe byDelta.head.getString(0)
    byMargin.last.getString(0) shouldBe byDelta.last.getString(0)
  }

  // -- empty-input guards for driver-hosted scalars ---------------------------

  test("corpus-scalar queries survive empty inputs (null-safe head reads)") {
    // The r9 ADVICE pattern: agg-scalar reads like sum(...).head()
    // NPE on empty relations. Guarded sites must degrade to empty
    // results instead.
    val dir = tmpDir("emptyfix")
    Seq.empty[(Long, String, String, String)]
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Seq.empty[(Long, Array[Float], Int)]
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    graft.queries.Relevance.q61Bm25Search(spark, dir).count() shouldBe 0L
    graft.queries.Relevance.q124PmiCollocations(spark, dir).count() shouldBe 0L
    graft.queries.Curation.q145BalancedDownsample(spark, dir)
      .count() shouldBe 0L
  }

  // -- q211: leakage-free cluster-aware splits --------------------------------

  test("q211 moves exactly the straddling cluster member") {
    // q207's fixture: cluster {2,3} (representative 2, bucket 0 →
    // train) has doc 3 in test under q42 — the only row that moves.
    // {4,5} and {1,7} already sit inside their representative's split;
    // singleton 6 keeps its own hash by construction.
    val dir = tmpDir("q211fix")
    val tA = "alpha beta gamma delta epsilon zeta eta theta"
    val tB = "one two three four five six seven eight"
    val tC = "rouge bleu vert jaune violet orange rose gris"
    Seq((2L, tA, "en", "w"), (3L, tA, "en", "w"),
      (4L, tB, "en", "w"), (5L, tB, "en", "w"),
      (1L, tC, "fr", "w"), (7L, tC, "fr", "w"),
      (6L, "lone wolf document nothing like the others here", "en", "w"))
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.queries.Graph.q211LeakFreeSplits(spark, dir)
      .orderBy("doc_id").collect()
    rows.map(r => (r.getLong(0), r.getLong(1), r.getString(2),
      r.getBoolean(3))).toSeq shouldBe Seq(
      (1L, 1L, "val", false), (2L, 2L, "train", false),
      (3L, 2L, "train", true), (4L, 4L, "train", false),
      (5L, 4L, "train", false), (6L, 6L, "train", false),
      (7L, 1L, "val", false))
  }

  test("q211 yields zero leakage and preserves singleton splits at sf0.001") {
    import org.apache.spark.sql.functions._
    val sp = graft.queries.Graph.q211LeakFreeSplits(spark, sf)
    // every dedup cluster lands in exactly one split
    sp.groupBy("unit").agg(countDistinct(col("split")).as("ns"))
      .filter(col("ns") > 1).count() shouldBe 0L
    // unclustered docs (unit == doc_id) never move
    sp.filter(col("unit") === col("doc_id") && col("moved")).count() shouldBe 0L
    // full doc universe, exactly once
    sp.count() shouldBe graft.Tables.documents(spark, sf).count()
    sp.select("doc_id").distinct().count() shouldBe sp.count()
  }

  // -- q208: simplified-silhouette audit ------------------------------------

  test("q208 matches a hand-traced 2-cluster Lloyd run") {
    // N=4 ⇒ K=2, seeds v0=(0,0), v1=(1,1). Quantized: (0,0),(10000,10000),
    // (0,2),(10000,9998). Both Lloyd updates settle on centroids (0,1)
    // and (10000,9999); every vector then sits at a=1 from its own
    // centroid and b≈2e8 from the other, so every silhouette floor-divs
    // to 999999 (ratio just under 1).
    val dir = tmpDir("q208fix")
    Seq((0L, Array(0.0f, 0.0f), 0), (1L, Array(1.0f, 1.0f), 0),
      (2L, Array(0.0f, 0.0002f), 0), (3L, Array(1.0f, 0.9998f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = graft.queries.NearDup.q208SilhouetteAudit(spark, dir)
      .orderBy("cluster").collect()
    rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSeq shouldBe Seq(
      (0L, 2L, 999999L, 999999L),
      (1L, 2L, 999999L, 999999L))
  }

  test("q208 reconciles with q57's assignment at sf0.001") {
    val sil = graft.queries.NearDup.q208SilhouetteAudit(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val counts = graft.queries.NearDup.q57KmeansCluster(spark, sf)
      .groupBy("cluster").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    sil.keySet shouldBe counts.keySet // same clusters, bit-identical argmin
    sil.foreach { case (c, (n, mean, mn)) =>
      n shouldBe counts(c)
      mean should (be >= -1000000L and be <= 1000000L)
      mn should be <= mean
    }
  }

  // -- q210: top principal component (power iteration) -----------------------

  test("q210 finds the axis of an axis-aligned fixture exactly") {
    // All vectors lie on dimension 1, so the Gram matrix is
    // diag(Σx², 0) and every iteration maps v to (Σx²·scale, 0) —
    // after normalization the component is exactly (1e6, 0) from
    // round 1 and stays there.
    val dir = tmpDir("q210fix")
    Seq((0L, Array(0.5f, 0.0f), 0), (1L, Array(-0.25f, 0.0f), 0),
      (2L, Array(1.0f, 0.0f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = graft.queries.NearDup.q210TopComponent(spark, dir)
      .orderBy("pos").collect()
    rows.map(r => (r.getLong(0), r.getLong(1))).toSeq shouldBe Seq(
      (1L, 1000000L), (2L, 0L))
  }

  test("q210 returns a unit ∞-norm 64-dim component at sf0.001") {
    val rows = graft.queries.NearDup.q210TopComponent(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    rows.length shouldBe 64
    rows.map(_._1).sorted shouldBe (1L to 64L)
    rows.map(p => math.abs(p._2)).max shouldBe 1000000L
    rows.foreach(p => math.abs(p._2) should be <= 1000000L)
  }

  // -- q209: zone-map pruning-effectiveness audit ----------------------------

  test("q209 matches hand-computed zone widths on a 4-row fact") {
    // Arrival files (orderkey div 4096): {1,2}→f0, 5000→f1, 9000→f2;
    // f0's partkey zone spans 4096..8192 (width 4097), the singletons
    // width 1 ⇒ Σ4099 over domain 4098 ⇒ 1000 e3 (no pruning: ~1 file
    // of 3 per probe is 1000/3 e3 ... the arrival zones here overlap
    // the whole domain). Z-order files (top-8 Morton bits): pk 4096/
    // 4097 → fz1, 8192/8193 → fz4 — zone widths 2+2 ⇒ 4·1000 div 4098
    // = 0 e3: pruning collapses reads to the matching file.
    val dir = tmpDir("q209fix")
    Seq((1L, 4096L, 0L), (2L, 8192L, 0L), (5000L, 4097L, 0L),
      (9000L, 8193L, 0L))
      .toDF("l_orderkey", "l_partkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val rows = graft.queries.Analytics.q209ZoneMapAudit(spark, dir)
      .orderBy("layout").collect()
    rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6))).toSeq shouldBe Seq(
      ("arrival", 3L, 1L, 2L, 4098L, 4099L, 1000L),
      ("zorder", 2L, 2L, 2L, 4098L, 4L, 0L))
  }

  test("q209 shows z-order pruning beating arrival order at sf0.1") {
    // sf0.001/sf0.01 fit in ONE file under both layouts (orderkey max
    // < 4096, partkey < 2^12 ⇒ a single Morton bucket) — the pruning
    // contrast needs sf0.1's key ranges, where arrival order spreads
    // ~146 files that each span the whole partkey domain while the
    // top-8 Morton bits confine each z-file to a ~4096-wide zone.
    val rows = graft.queries.Analytics
      .q209ZoneMapAudit(spark, "/root/testdata/sf0.1").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    val (aFiles, aDom, aSum, aAvg) = rows("arrival")
    val (zFiles, zDom, zSum, zAvg) = rows("zorder")
    aDom shouldBe zDom // same rows, same probe domain
    // arrival files see random partkeys: zones span ~the whole domain,
    // so a probe reads nearly every file
    aAvg should be >= aFiles * 500L
    // z-order zones cover the domain ~n_files/16 times over
    zAvg should be < aAvg / 4
    zSum should be < aSum
    zFiles should be > 0L
  }
}
