package graft

/** Fixture pins for the round-11 operator batch: the Bloom-filter
  * decontamination precheck (q221 — hand-built split fixture incl. the
  * one-sided no-false-negative identity), the AMS F2 tug-of-war sketch
  * (q222 — a single-token corpus where every estimator is EXACT by
  * algebra), and the KMV sketch-estimated source-overlap matrix (q223
  * — a sub-k fixture where the sketch estimate must equal the exact
  * Jaccard up to floor-vs-round).
  */
class Round11OpsSpec extends SparkSpec {
  import org.apache.spark.sql.functions.col
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  // -- q221: Bloom-filter decontamination precheck --------------------------

  test("q221 matches the hand-built split fixture (member hits, clean miss)") {
    // q42 buckets: doc 2/4 → train, doc 3 → test (md5 split rule).
    // Train vocab {alpha, beta, gamma, delta} (4 tokens); probe vocab
    // {alpha, zeta}: alpha is a member (MUST hit — Bloom's one-sided
    // guarantee), zeta's 4 bits against ≤16 set bits of 65536 miss.
    val dir = tmpDir("q221fix")
    Seq(
      (2L, "alpha beta gamma", "s0"),
      (4L, "beta delta", "s0"),
      (3L, "alpha zeta", "s1"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = graft.queries.Profiling.q221BloomPrecheck(spark, dir).collect()
    r.length shouldBe 1
    val row = r.head
    row.getLong(row.fieldIndex("n_inserted")) shouldBe 4L
    row.getLong(row.fieldIndex("n_probes")) shouldBe 2L
    row.getLong(row.fieldIndex("n_members")) shouldBe 1L
    row.getLong(row.fieldIndex("n_hits")) shouldBe 1L
    row.getLong(row.fieldIndex("n_false_pos")) shouldBe 0L
    row.getLong(row.fieldIndex("fpr_ppm")) shouldBe 0L
    // 4 hashes x 4 tokens, distinct-collapsed
    row.getLong(row.fieldIndex("bits_set")) should be <= 16L
    row.getLong(row.fieldIndex("fill_ppm")) shouldBe
      row.getLong(row.fieldIndex("bits_set")) * 1000000L / 65536L
  }

  test("q221 one-sided guarantee and fill identities hold at sf0.001") {
    val row = graft.queries.Profiling.q221BloomPrecheck(spark, sf)
      .collect().head
    val hits = row.getLong(row.fieldIndex("n_hits"))
    val members = row.getLong(row.fieldIndex("n_members"))
    val falsePos = row.getLong(row.fieldIndex("n_false_pos"))
    val probes = row.getLong(row.fieldIndex("n_probes"))
    // a true member can NEVER miss, so every hit is a member or a
    // false positive, exactly
    hits shouldBe members + falsePos
    members should be <= probes
    // fpr denominator identity
    val nonMembers = math.max(probes - members, 1L)
    row.getLong(row.fieldIndex("fpr_ppm")) shouldBe
      falsePos * 1000000L / nonMembers
    // the fill-derived estimate is the staged (bits/m)^4 squaring
    val fill = row.getLong(row.fieldIndex("fill_ppm"))
    val p2 = fill * fill / 1000000L
    row.getLong(row.fieldIndex("est_fpr_ppm")) shouldBe p2 * p2 / 1000000L
  }

  // -- q222: AMS F2 tug-of-war sketch ---------------------------------------

  test("q222 is algebraically exact on a single-token corpus") {
    // f = {x: 5} → F2 = 25; every estimator is X_i = ±5 (one token,
    // one sign) so est_i = 25 EXACTLY for all 16 — means, median, and
    // spread all collapse to the true value with zero error.
    val dir = tmpDir("q222fix")
    Seq((1L, "x x x"), (2L, "x x"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = graft.queries.Profiling.q222AmsF2(spark, dir).collect()
    r.length shouldBe 1
    r.head.toSeq shouldBe Seq(25L, 25L, 0L, 25L, 25L)
  }

  test("q222 estimator identities hold at sf0.001") {
    val row = graft.queries.Profiling.q222AmsF2(spark, sf).collect().head
    val trueF2 = row.getLong(row.fieldIndex("true_f2"))
    val est = row.getLong(row.fieldIndex("est_f2"))
    val errPpm = row.getLong(row.fieldIndex("err_ppm"))
    trueF2 should be > 0L
    // median-of-means lies within the estimator envelope
    est should be >= row.getLong(row.fieldIndex("est_min"))
    est should be <= row.getLong(row.fieldIndex("est_max"))
    errPpm shouldBe math.abs(est - trueF2) * 1000000L / trueF2
  }

  // -- q224: histogram join-cardinality estimation --------------------------

  test("q224 matches the hand-computed skewed fixture") {
    // l_partkey [1,1,1,2]: exact self-join card = 3² + 1² = 10;
    // keys 1 and 2 hash to buckets 35 and 16 (md5 'jc|k'), so the
    // histogram sees each key alone and is EXACT (err 0); the global
    // uniform estimate 4²//2 = 8 misses by 200000 ppm — the report's
    // point, skew-refinement, on the smallest possible skew.
    val dir = tmpDir("q224fix")
    Seq(1L, 1L, 1L, 2L).toDF("l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = graft.queries.Analytics.q224HistJoinCard(spark, dir).collect()
    r.length shouldBe 1
    r.head.toSeq shouldBe Seq(4L, 2L, 8L, 10L, 10L, 0L, 200000L)
  }

  test("q224 estimate identities hold at sf0.001") {
    val row = graft.queries.Analytics.q224HistJoinCard(spark, sf)
      .collect().head
    val nRows = row.getLong(row.fieldIndex("n_rows"))
    val nKeys = row.getLong(row.fieldIndex("n_keys"))
    val exact = row.getLong(row.fieldIndex("exact_card"))
    row.getLong(row.fieldIndex("est_uniform")) shouldBe nRows * nRows / nKeys
    // every row self-joins at least once, and Cauchy–Schwarz floors
    // the exact card at the uniform estimate's ideal
    exact should be >= nRows
    row.getLong(row.fieldIndex("hist_err_ppm")) shouldBe
      math.abs(row.getLong(row.fieldIndex("est_hist")) - exact) * 1000000L / exact
    row.getLong(row.fieldIndex("uniform_err_ppm")) shouldBe
      math.abs(nRows * nRows / nKeys - exact) * 1000000L / exact
  }

  // -- q225: LSH S-curve calibration -----------------------------------------

  test("q225 pins the exact-duplicate bin on a byte-identical pair") {
    // Two byte-identical docs: J = 1.0 → bin 20, and identical minhash
    // signatures collide in every band → measured = analytic = 1e6.
    val dir = tmpDir("q225fix")
    Seq(
      (1L, "w1 w2 w3 w4 w5"),
      (2L, "w1 w2 w3 w4 w5"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = graft.queries.NearDup.q225LshScurve(spark, dir).collect()
    r.length shouldBe 1
    r.head.toSeq shouldBe Seq(20L, 1000000L, 1L, 1L, 1000000L, 1000000L, 0L)
  }

  test("q225 per-bin identities and the staged analytic polynomial at sf0.001") {
    def analytic(mid: Long): Long = {
      val q = mid * mid / 1000000L
      val m = 1000000L - q
      val m2 = m * m / 1000000L
      val m4 = m2 * m2 / 1000000L
      val m8 = m4 * m4 / 1000000L
      1000000L - m8
    }
    val rows = graft.queries.NearDup.q225LshScurve(spark, sf).collect()
    rows.length should be > 0
    rows.foreach { r =>
      val bin = r.getLong(r.fieldIndex("bin"))
      val nPairs = r.getLong(r.fieldIndex("n_pairs"))
      val nCollide = r.getLong(r.fieldIndex("n_collide"))
      bin should be >= 10L // truth domain is J >= 0.5
      nCollide should be <= nPairs
      r.getLong(r.fieldIndex("jacc_lo_e6")) shouldBe bin * 50000L
      r.getLong(r.fieldIndex("recall_ppm")) shouldBe nCollide * 1000000L / nPairs
      val mid = math.min(bin * 50000L + 25000L, 1000000L)
      r.getLong(r.fieldIndex("analytic_ppm")) shouldBe analytic(mid)
      r.getLong(r.fieldIndex("gap_ppm")) shouldBe
        r.getLong(r.fieldIndex("recall_ppm")) - r.getLong(r.fieldIndex("analytic_ppm"))
    }
  }

  // -- q226: dedup threshold-yield sweep -------------------------------------

  test("q226 matches the two-pair hand fixture across all 11 thresholds") {
    // Pair (1,2): byte-identical → J = 1.0 (bin 20). Pair (3,4):
    // grams {abc,bcd,cde} vs {abc,bcd,cdf} → J = 2/4 = 0.5 (bin 10).
    // So τ=0.50 sees 2 pairs / 4 docs / 20 tokens; every higher τ
    // sees only the identical pair: 1 / 2 / 10.
    val dir = tmpDir("q226fix")
    Seq(
      (1L, "w1 w2 w3 w4 w5"), (2L, "w1 w2 w3 w4 w5"),
      (3L, "a b c d e"), (4L, "a b c d f"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.queries.NearDup.q226ThresholdSweep(spark, dir)
      .orderBy("thresh_e6").collect()
    rows.length shouldBe 11
    rows.head.toSeq shouldBe Seq(500000L, 2L, 4L, 20L)
    rows.tail.foreach { r =>
      r.toSeq.drop(1) shouldBe Seq(1L, 2L, 10L)
    }
  }

  test("q226 sweep is monotone and reconciles with q39 at sf0.001") {
    val rows = graft.queries.NearDup.q226ThresholdSweep(spark, sf)
      .orderBy("thresh_e6").collect()
    rows.length shouldBe 11
    // τ=0.5 row counts exactly the q39 truth pairs
    rows.head.getLong(1) shouldBe
      graft.queries.NearDup.q39DedupNgramJaccard(spark, sf).count()
    // raising the threshold can only shrink every yield column
    rows.sliding(2).foreach { case Array(lo, hi) =>
      hi.getLong(1) should be <= lo.getLong(1)
      hi.getLong(2) should be <= lo.getLong(2)
      hi.getLong(3) should be <= lo.getLong(3)
    }
  }

  // -- q227: shard-packing balance audit --------------------------------------

  test("q227 is exact on perfectly-filling shards") {
    // Three 20000-char docs at the 20000-char budget: each doc exactly
    // fills one shard REGARDLESS of the hash order, so every balance
    // number collapses to the ideal (imbalance = makespan = 1e6).
    val dir = tmpDir("q227fix")
    Seq((1L, "en", 20000L), (2L, "en", 20000L), (3L, "en", 20000L))
      .toDF("doc_id", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = graft.queries.Curation.q227ShardBalance(spark, dir).collect()
    r.length shouldBe 1
    r.head.toSeq shouldBe
      Seq("en", 3L, 60000L, 20000L, 20000L, 20000L, 1000000L, 20000L, 1000000L)
  }

  test("q227 ratio identities hold per language at sf0.001") {
    val rows = graft.queries.Curation.q227ShardBalance(spark, sf).collect()
    rows.length should be > 0
    rows.foreach { r =>
      val nShards = r.getLong(r.fieldIndex("n_shards"))
      val total = r.getLong(r.fieldIndex("total_chars"))
      val maxL = r.getLong(r.fieldIndex("max_load"))
      val mean = r.getLong(r.fieldIndex("mean_load"))
      mean shouldBe total / nShards
      maxL should be >= mean
      r.getLong(r.fieldIndex("min_load")) should be <= mean
      r.getLong(r.fieldIndex("imbalance_ppm")) shouldBe maxL * 1000000L / mean
      val ideal = (total + nShards - 1) / nShards
      r.getLong(r.fieldIndex("ideal_makespan")) shouldBe ideal
      r.getLong(r.fieldIndex("makespan_ppm")) shouldBe maxL * 1000000L / ideal
    }
  }

  // -- q228: int8 scalar-quantization audit -----------------------------------

  test("q228 matches the hand-computed two-dim fixture") {
    // dim1 e4 values {0, 5000, 10000}: midpoint code 127 reconstructs
    // 4980 (err 20), endpoints exact → mean 20/3 = 6, bound 40.
    // dim2 {10000, 17000, 30000}: code 89 → 16980 (err 20), mean 6,
    // bound 79. Endpoints of an affine SQ are ALWAYS exact.
    val dir = tmpDir("q228fix")
    Seq(
      (1L, Seq(0.0f, 1.0f)), (2L, Seq(0.5f, 1.7f)), (3L, Seq(1.0f, 3.0f)))
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = graft.queries.NearDup.q228SqAudit(spark, dir)
      .orderBy("dim").collect()
    rows.map(_.toSeq) shouldBe Array(
      Seq(1L, 0L, 10000L, 10000L, 3L, 6L, 20L, 40L),
      Seq(2L, 10000L, 30000L, 20000L, 3L, 6L, 20L, 79L))
  }

  test("q228 error bound holds on every dimension at sf0.001") {
    val rows = graft.queries.NearDup.q228SqAudit(spark, sf).collect()
    rows.length shouldBe 64
    rows.foreach { r =>
      r.getLong(r.fieldIndex("range_e4")) shouldBe
        r.getLong(r.fieldIndex("max_e4")) - r.getLong(r.fieldIndex("min_e4"))
      r.getLong(r.fieldIndex("mean_abs_err_e4")) should be <=
        r.getLong(r.fieldIndex("max_err_e4"))
      // the analytic worst case of truncating affine SQ8
      r.getLong(r.fieldIndex("max_err_e4")) should be <=
        r.getLong(r.fieldIndex("bound_e4"))
    }
  }

  // -- q229: quality-gate agreement (Cohen's kappa) ---------------------------

  test("q229 cells reconcile with the two gates and the kappa identity at sf0.001") {
    val row = graft.queries.Profiling.q229GateAgreement(spark, sf)
      .collect().head
    // independent contingency: join the two gate outputs in the spec
    val rule = graft.queries.LlmPipeline.q22TextStats(spark, sf)
      .select(col("doc_id"), col("is_quality")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val model = graft.queries.Curation.q113QualityClassifier(spark, sf)
      .select(col("doc_id"), col("keep")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val cells = rule.keys.toSeq.map { id => (rule(id), model(id)) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    row.getLong(row.fieldIndex("n")) shouldBe rule.size.toLong
    row.getLong(row.fieldIndex("n11")) shouldBe cells.getOrElse((true, true), 0L)
    row.getLong(row.fieldIndex("n10")) shouldBe cells.getOrElse((true, false), 0L)
    row.getLong(row.fieldIndex("n01")) shouldBe cells.getOrElse((false, true), 0L)
    row.getLong(row.fieldIndex("n00")) shouldBe cells.getOrElse((false, false), 0L)
    // kappa identity with explicit toward-zero semantics
    val n = row.getLong(row.fieldIndex("n"))
    val (n11, n10, n01, n00) = (row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4))
    val po = (n11 + n00) * 1000000L / n
    val pe = ((n11 + n10) * (n11 + n01) / n + (n01 + n00) * (n10 + n00) / n) * 1000000L / n
    row.getLong(row.fieldIndex("po_ppm")) shouldBe po
    row.getLong(row.fieldIndex("pe_ppm")) shouldBe pe
    val den = math.max(1000000L - pe, 1L)
    val expected = if (po >= pe) (po - pe) * 1000000L / den
      else -((pe - po) * 1000000L / den)
    row.getLong(row.fieldIndex("kappa_e6")) shouldBe expected
  }

  // -- q230: JL projection distortion audit -----------------------------------

  test("q230 is algebraically exact on single-dimension differences") {
    // If two vectors differ in exactly one dimension by δ, every
    // projected coordinate differs by ±δ (the sign), so ‖Δy‖² = 16·δ²
    // = 16·‖Δx‖² and the ratio is EXACTLY 1000 regardless of the sign
    // matrix. Pair (2,3) is byte-identical → degenerate, excluded.
    val dir = tmpDir("q230fix")
    val zeros = Seq.fill(64)(0.0f)
    val oneHot = 1.0f +: Seq.fill(63)(0.0f)
    Seq((1L, zeros), (2L, oneHot), (3L, oneHot))
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val r = graft.queries.NearDup.q230JlDistortion(spark, dir).collect()
    r.length shouldBe 1
    r.head.toSeq shouldBe Seq(2L, 1L, 1000L, 1000L, 1000L, 1L, 1000000L)
  }

  test("q230 aggregate identities hold at sf0.001") {
    val row = graft.queries.NearDup.q230JlDistortion(spark, sf)
      .collect().head
    val nPairs = row.getLong(row.fieldIndex("n_pairs"))
    val nDegen = row.getLong(row.fieldIndex("n_degenerate"))
    nPairs should be > 0L
    val mean = row.getLong(row.fieldIndex("mean_ratio_e3"))
    mean should be >= row.getLong(row.fieldIndex("min_ratio_e3"))
    mean should be <= row.getLong(row.fieldIndex("max_ratio_e3"))
    row.getLong(row.fieldIndex("within30_ppm")) shouldBe
      row.getLong(row.fieldIndex("n_within30")) * 1000000L /
        math.max(nPairs - nDegen, 1L)
  }

  // -- q231: two-stage retrieval audit ----------------------------------------

  test("q231 reconciles with q219's IVF recall and obeys the stage bounds at sf0.001") {
    val row = graft.queries.NearDup.q231TwoStageRetrieval(spark, sf)
      .collect().head
    // the IVF leg is exactly q219's audit — same truth, same index
    val q219 = graft.queries.NearDup.q219IvfRecall(spark, sf).collect().head
    row.getLong(row.fieldIndex("n_exact")) shouldBe
      q219.getLong(q219.fieldIndex("n_exact"))
    row.getLong(row.fieldIndex("n_ivf_hit")) shouldBe
      q219.getLong(q219.fieldIndex("n_ivf_hit"))
    // survivors are a per-query top-16 subset of the candidates
    val nCand = row.getLong(row.fieldIndex("n_candidates"))
    val nRerank = row.getLong(row.fieldIndex("n_reranked"))
    nRerank should be <= nCand
    nRerank should be <= (row.getLong(row.fieldIndex("n_exact")) / 5) * 16
    // ppm identities (prune loss is SIGNED subtraction of the two)
    val nExact = row.getLong(row.fieldIndex("n_exact"))
    val ivf = row.getLong(row.fieldIndex("n_ivf_hit")) * 1000000L / nExact
    val ts = row.getLong(row.fieldIndex("n_two_stage_hit")) * 1000000L / nExact
    row.getLong(row.fieldIndex("ivf_recall_ppm")) shouldBe ivf
    row.getLong(row.fieldIndex("two_stage_recall_ppm")) shouldBe ts
    row.getLong(row.fieldIndex("prune_loss_ppm")) shouldBe ivf - ts
  }

  // -- q232: split semantic-shift audit ----------------------------------------

  test("q232 matches the hand-computed two-dim fixture") {
    // vec_ids 2,4 → train ([1,0] each), 3 → test ([0,1]); corpus
    // centroid (6666, 3333) after truncating e4 means. train cos =
    // 2/√5 → 894427, L1 6667; test cos = 1/√5 → 447214, L1 13333.
    val dir = tmpDir("q232fix")
    Seq((2L, Seq(1.0f, 0.0f)), (4L, Seq(1.0f, 0.0f)), (3L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = graft.queries.NearDup.q232SplitShift(spark, dir)
      .orderBy("split").collect()
    rows.map(_.toSeq) shouldBe Array(
      Seq("test", 1L, 447214L, 13333L),
      Seq("train", 2L, 894427L, 6667L))
  }

  test("q232 split centroids stay near the corpus direction at sf0.001") {
    val rows = graft.queries.NearDup.q232SplitShift(spark, sf).collect()
    rows.length should be > 0
    val n = rows.map(r => r.getLong(r.fieldIndex("n_vecs"))).sum
    n should be > 0L
    // the dominant (train) split must track the corpus centroid closely
    val train = rows.find(_.getString(0) == "train").get
    train.getLong(train.fieldIndex("cos_to_corpus_e6")) should be > 800000L
  }

  // -- q233: HLL cumulative adoption curve --------------------------------------

  test("q233 estimate and exact curves are monotone; last day reconciles at sf0.001") {
    val rows = graft.queries.Profiling.q233HllAdoption(spark, sf)
      .orderBy("day").collect()
    rows.length should be > 1
    // registers only grow (running max) → s45 shrinks → est grows
    rows.sliding(2).foreach { case Array(a, b) =>
      b.getLong(1) should be >= a.getLong(1)
      b.getLong(2) should be >= a.getLong(2)
    }
    // the exact leg lands on the true all-time distinct-user count
    val allUsers = graft.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    rows.last.getLong(2) shouldBe allUsers
    rows.foreach { r =>
      r.getLong(3) shouldBe
        math.abs(r.getLong(1) - r.getLong(2)) * 100L / r.getLong(2)
    }
  }

  // -- q234: token frequency spectrum --------------------------------------

  test("q234 matches the hand-computed two-bucket fixture") {
    // "a a a b": f(a)=3 → bucket 1, f(b)=1 → bucket 0. Shares over
    // 2 types / 4 tokens; decay undefined on the lowest bucket, then
    // 1·1000/1 = 1000.
    val dir = tmpDir("q234fix")
    Seq((1L, "a a a b")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.queries.Profiling.q234FreqSpectrum(spark, dir)
      .orderBy("b").collect()
    rows.map(_.toSeq) shouldBe Array(
      Seq(0L, 1L, 1L, 1L, 500000L, 250000L, null),
      Seq(1L, 2L, 1L, 3L, 500000L, 750000L, 1000L))
  }

  test("q234 shares fold to ~1e6 and bucket identities hold at sf0.001") {
    val rows = graft.queries.Profiling.q234FreqSpectrum(spark, sf).collect()
    rows.length should be > 0
    rows.foreach { r =>
      r.getLong(r.fieldIndex("lo_freq")) shouldBe (1L << r.getLong(0).toInt)
      r.getLong(r.fieldIndex("n_tokens")) should be >=
        r.getLong(r.fieldIndex("n_types")) * r.getLong(r.fieldIndex("lo_freq"))
    }
    // truncating shares can each lose <1 ppm
    val ts = rows.map(_.getLong(4)).sum
    ts should be <= 1000000L
    ts should be > 1000000L - rows.length.toLong
  }

  // -- q235: weighted (multiset) Jaccard --------------------------------------

  test("q235 separates literal mirrors from weight-skewed rewrites") {
    // (1,2): byte-identical → set 1e6, weighted 1e6, delta 0.
    // (3,4): identical shingle SETS (J = 1e6) but 3× vs 2× repetition
    // → Σmin = 6, na+nb−Σmin = 9 → weighted 666666, delta −333334 —
    // the set-close/weight-far case the operator exists to expose.
    val dir = tmpDir("q235fix")
    Seq(
      (1L, "x y x"), (2L, "x y x"),
      (3L, "p q r p q r p q r"), (4L, "p q r p q r"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.queries.NearDup.q235WeightedJaccard(spark, dir)
      .orderBy("doc_a").collect()
    rows.map(_.toSeq) shouldBe Array(
      Seq(1L, 2L, 1000000L, 1000000L, 0L),
      Seq(3L, 4L, 1000000L, 666666L, -333334L))
  }

  test("q235 covers every q39 pair with consistent deltas at sf0.001") {
    val rows = graft.queries.NearDup.q235WeightedJaccard(spark, sf).collect()
    rows.length.toLong shouldBe
      graft.queries.NearDup.q39DedupNgramJaccard(spark, sf).count()
    rows.foreach { r =>
      val wj = r.getLong(r.fieldIndex("weighted_jaccard_e6"))
      wj should be >= 0L
      wj should be <= 1000000L
      r.getLong(r.fieldIndex("delta_e6")) shouldBe
        wj - r.getLong(r.fieldIndex("jaccard_e6"))
    }
  }

  // -- q236: shard-budget sweep -------------------------------------------------

  test("q236 shipped-budget rows reconcile with q227 at sf0.001") {
    val sweep = graft.queries.Curation.q236ShardBudgetSweep(spark, sf)
      .filter(col("budget_chars") === 20000L).collect()
      .map(r => r.getString(1) -> (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6))).toMap
    val audit = graft.queries.Curation.q227ShardBalance(spark, sf).collect()
    audit.length shouldBe sweep.size
    audit.foreach { r =>
      val (nShards, total, maxL, imb, mk) = sweep(r.getString(0))
      nShards shouldBe r.getLong(r.fieldIndex("n_shards"))
      total shouldBe r.getLong(r.fieldIndex("total_chars"))
      maxL shouldBe r.getLong(r.fieldIndex("max_load"))
      imb shouldBe r.getLong(r.fieldIndex("imbalance_ppm"))
      mk shouldBe r.getLong(r.fieldIndex("makespan_ppm"))
    }
  }

  test("q236 shard counts shrink as the budget grows at sf0.001") {
    val rows = graft.queries.Curation.q236ShardBudgetSweep(spark, sf)
      .collect()
      .groupBy(_.getString(1))
    rows.foreach { case (_, rs) =>
      val byBudget = rs.sortBy(_.getLong(0)).map(_.getLong(2))
      byBudget.sliding(2).foreach { case Array(lo, hi) =>
        hi should be <= lo
      }
      // total char mass is budget-independent
      rs.map(_.getLong(3)).distinct.length shouldBe 1
    }
  }

  // -- q237: MinHash banding-config sweep ----------------------------------------

  test("q237 all configs catch a byte-identical pair with one candidate") {
    val dir = tmpDir("q237fix")
    Seq((1L, "w1 w2 w3 w4 w5"), (2L, "w1 w2 w3 w4 w5"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.queries.LlmPipeline.q237BandingSweep(spark, dir)
      .orderBy("n_bands").collect()
    rows.map(_.toSeq) shouldBe Array(
      Seq("b4r4", 4L, 4L, 1L, 1L, 1L, 1000000L),
      Seq("b8r2", 8L, 2L, 1L, 1L, 1L, 1000000L),
      Seq("b16r1", 16L, 1L, 1L, 1L, 1L, 1000000L))
  }

  test("q237 collision sets nest with band width; shipped config matches q146") {
    // a (4×4) band match is four equal hashes → its two (8×2) halves
    // match → its four (16×1) singles match: candidate and collide
    // counts are monotone in the band count
    val rows = graft.queries.LlmPipeline.q237BandingSweep(spark, sf)
      .orderBy("n_bands").collect()
    rows.length shouldBe 3
    rows.map(_.getLong(4)).distinct.length shouldBe 1 // one truth set
    rows.sliding(2).foreach { case Array(narrow, wide) =>
      wide.getLong(3) should be >= narrow.getLong(3) // candidates
      wide.getLong(5) should be >= narrow.getLong(5) // collides
    }
    rows.foreach { r =>
      r.getLong(6) shouldBe r.getLong(5) * 1000000L / r.getLong(4)
    }
    // a truth pair that band-collides always verifies (J ≥ 0.5 IS the
    // verify threshold), so the shipped config's recall is q146's
    val q146 = graft.queries.NearDup.q146LshRecall(spark, sf).collect().head
    val shipped = rows.find(_.getString(0) == "b8r2").get
    shipped.getLong(6) shouldBe q146.getLong(q146.fieldIndex("recall_ppm"))
  }

  // -- q238: SPRT sequential conversion test --------------------------------------

  test("q238 crosses at the hand-computed observation counts") {
    // All-purchase arm: +693147/obs crosses +2944439 at obs 5
    // (4×693147 = 2772588 < threshold ≤ 3465735 = 5×). All-miss arm:
    // −117783/obs crosses −2944439 at obs 25 (24× = −2826792 above,
    // 25× = −2944575 below).
    val dir = tmpDir("q238fix")
    val rows = (1 to 30).flatMap { i =>
      Seq(
        (i.toLong * 2, java.sql.Timestamp.valueOf(f"2024-01-01 00:$i%02d:00"),
          2L, "purchase"),
        (i.toLong * 2 + 1, java.sql.Timestamp.valueOf(f"2024-01-01 00:$i%02d:00"),
          1L, "view"))
    }
    rows.toDF("event_id", "ts", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.queries.EventAnalytics.q238SprtTest(spark, dir)
      .orderBy("variant").collect()
    out.map(_.toSeq) shouldBe Array(
      Seq(0L, 30L, 30L, "accept_h1", 5L, 30L * 693147L),
      Seq(1L, 30L, 0L, "accept_h0", 25L, 30L * -117783L))
  }

  test("q238 decisions are consistent with the walk at sf0.001") {
    val rows = graft.queries.EventAnalytics.q238SprtTest(spark, sf).collect()
    rows.length shouldBe 2
    rows.foreach { r =>
      val dec = r.getString(r.fieldIndex("decision"))
      Set("accept_h0", "accept_h1", "undecided") should contain(dec)
      r.getLong(r.fieldIndex("n_conversions")) should be <=
        r.getLong(r.fieldIndex("n_obs"))
      if (dec != "undecided") {
        r.getLong(r.fieldIndex("n_to_decision")) should be <=
          r.getLong(r.fieldIndex("n_obs"))
      } else r.isNullAt(r.fieldIndex("n_to_decision")) shouldBe true
    }
  }

  // -- q239: per-file Bloom data-skipping audit ------------------------------------

  test("q239 matches the hand-built two-file fixture") {
    // File 0 (orderkeys < 128) holds partkeys {0, 5}; file 1 holds
    // {0, 97}. Probes (k % 97 == 0): {0, 97}. True pairs: 0 ∈ both
    // files, 97 ∈ file 1 → 3. Zones: f0 = [0,5] contains 0 only;
    // f1 = [0,97] contains both → 3 zone pairs. Bloom ⊇ true with
    // 2 keys in 16384 bits → no false positives → 3.
    val dir = tmpDir("q239fix")
    Seq((1L, 0L), (2L, 5L), (200L, 0L), (201L, 97L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = graft.queries.Analytics.q239FileBloomAudit(spark, dir).collect()
    r.length shouldBe 1
    r.head.toSeq shouldBe
      Seq(2L, 2L, 1500L, 1500L, 1500L, 0L, 0L)
  }

  test("q239 one-sidedness and ordering hold at sf0.001") {
    val row = graft.queries.Analytics.q239FileBloomAudit(spark, sf)
      .collect().head
    val trueE3 = row.getLong(row.fieldIndex("true_files_e3"))
    val zoneE3 = row.getLong(row.fieldIndex("zone_files_e3"))
    val bloomE3 = row.getLong(row.fieldIndex("bloom_files_e3"))
    // a containing file always zone-hits and bloom-hits
    zoneE3 should be >= trueE3
    bloomE3 should be >= trueE3
    row.getLong(row.fieldIndex("zone_excess_e3")) shouldBe zoneE3 - trueE3
    row.getLong(row.fieldIndex("bloom_excess_e3")) shouldBe bloomE3 - trueE3
    // Bloom never reads more than the zone map; the STRICT win needs
    // keys rarer than sf0.001's 12 saturated files (at sf0.01 the
    // gate-checked output reads 27.8 vs 113.7 files per probe)
    bloomE3 should be <= zoneE3
  }

  // -- q240: Markov removal-effect attribution -------------------------------------

  test("q240 matches the hand-solved two-journey chain") {
    // User 1: view → purchase; user 2: view (ends in null). Matrix:
    // start→view 1e9, view→conv 5e8, view→null 5e8 ⇒ P(conv|start) =
    // 5e8. Removing 'view' kills the only path (0); removing any
    // absent channel changes nothing — so view takes ALL the credit.
    val dir = tmpDir("q240fix")
    Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), 1L, "view"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:02:00"), 1L, "purchase"),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), 2L, "view"))
      .toDF("event_id", "ts", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = graft.queries.EventAnalytics.q240RemovalEffect(spark, dir)
      .orderBy("channel").collect()
    rows.map(_.toSeq) shouldBe Array(
      Seq("click", 500000000L, 500000000L, 0L, 0L),
      Seq("error", 500000000L, 500000000L, 0L, 0L),
      Seq("signup", 500000000L, 500000000L, 0L, 0L),
      Seq("view", 500000000L, 0L, 500000000L, 1000000L))
  }

  test("q240 removal can only lose conversion probability at sf0.001") {
    val rows = graft.queries.EventAnalytics.q240RemovalEffect(spark, sf)
      .collect()
    rows.length shouldBe 4
    var creditSum = 0L
    rows.foreach { r =>
      val base = r.getLong(r.fieldIndex("base_conv_e9"))
      val removed = r.getLong(r.fieldIndex("removed_conv_e9"))
      base should be <= 1000000000L
      // removing a state deletes non-negative path mass at every
      // iteration step, so the inequality survives truncation
      removed should be <= base
      r.getLong(r.fieldIndex("effect_e9")) shouldBe base - removed
      creditSum += r.getLong(r.fieldIndex("credit_ppm"))
    }
    creditSum should be <= 1000000L
  }

  // -- q241: IVF probe-count sweep -----------------------------------------------

  test("q241 candidates and recall are monotone in nprobe; nprobe=2 matches q219") {
    val rows = graft.queries.NearDup.q241ProbeSweep(spark, sf)
      .orderBy("nprobe").collect()
    rows.length shouldBe 3
    rows.map(_.getLong(2)).distinct.length shouldBe 1 // one truth set
    // candidate sets nest: every pair at probe rank r exists for p >= r
    rows.sliding(2).foreach { case Array(lo, hi) =>
      hi.getLong(1) should be >= lo.getLong(1)
      hi.getLong(3) should be >= lo.getLong(3)
    }
    rows.foreach { r =>
      r.getLong(4) shouldBe r.getLong(3) * 1000000L / r.getLong(2)
    }
    // the shipped nprobe=2 row IS q219's audit
    val q219 = graft.queries.NearDup.q219IvfRecall(spark, sf).collect().head
    val shipped = rows.find(_.getLong(0) == 2L).get
    shipped.getLong(3) shouldBe q219.getLong(q219.fieldIndex("n_ivf_hit"))
    shipped.getLong(2) shouldBe q219.getLong(q219.fieldIndex("n_exact"))
  }

  // -- q242: feed mirror-direction audit --------------------------------------------

  test("q242 names the direction on a hand-built scraper fixture") {
    // Source b is a strict subset of a's grams (one 5-token doc inside
    // a 6-token doc): shared = 1 = |B| → cont_b = 1e6 (b_in_a verdict
    // means B's content is inside A... direction tracks the LARGER
    // containment side), is_mirror true. |A| = 2 grams → cont_a 500000.
    val dir = tmpDir("q242fix")
    Seq(
      (1L, "t1 t2 t3 t4 t5 t6", "a"),
      (2L, "t1 t2 t3 t4 t5", "b"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.queries.Curation.q242MirrorDirection(spark, dir).collect()
    rows.length shouldBe 1
    rows.head.toSeq shouldBe
      Seq("a", "b", 2L, 1L, 1L, 500000L, 1000000L, "b_in_a", true)
  }

  test("q242 covers the q115 matrix with consistent verdicts at sf0.001") {
    val rows = graft.queries.Curation.q242MirrorDirection(spark, sf).collect()
    rows.length.toLong shouldBe
      graft.queries.Curation.q115SourceOverlap(spark, sf).count()
    rows.foreach { r =>
      val ca = r.getLong(r.fieldIndex("cont_a_e6"))
      val cb = r.getLong(r.fieldIndex("cont_b_e6"))
      ca shouldBe r.getLong(4) * 1000000L / r.getLong(2)
      cb shouldBe r.getLong(4) * 1000000L / r.getLong(3)
      val expected =
        if (ca > cb) "a_in_b" else if (cb > ca) "b_in_a" else "balanced"
      r.getString(r.fieldIndex("direction")) shouldBe expected
      r.getBoolean(r.fieldIndex("is_mirror")) shouldBe
        (math.max(ca, cb) >= 900000L)
    }
  }

  // -- q243: soft-dedup loss weights ------------------------------------------------

  test("q243 weighs a byte-identical pair to one effective document") {
    val dir = tmpDir("q243fix")
    Seq(
      (1L, "w1 w2 w3 w4 w5", "a"), (2L, "w1 w2 w3 w4 w5", "a"),
      (3L, "u1 u2 u3 u4", "b"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.queries.Curation.q243SoftDedupWeights(spark, dir)
      .orderBy("source").collect()
    rows.map(_.toSeq) shouldBe Array(
      Seq("a", 2L, 2L, 1000000L, 10L, 5000000L),
      Seq("b", 1L, 0L, 1000000L, 4L, 4000000L))
  }

  test("q243 effective mass reconciles with the cluster count at sf0.001") {
    val rows = graft.queries.Curation.q243SoftDedupWeights(spark, sf)
      .collect()
    val nDocs = rows.map(_.getLong(1)).sum
    val effSum = rows.map(_.getLong(3)).sum
    val clustered = graft.queries.Graph.q55DupClusters(spark, sf)
      .select("doc_id", "cluster_id").collect()
    val nClusters = clustered.map(_.getLong(1)).distinct.length.toLong
    val singletons = nDocs - clustered.length
    // Σ 1e6 div size over a cluster's members = 1e6 minus a <size ulp
    val ideal = (nClusters + singletons) * 1000000L
    effSum should be <= ideal
    effSum should be > ideal - nDocs
    rows.foreach { r =>
      r.getLong(2) should be <= r.getLong(1)
      r.getLong(3) should be <= r.getLong(1) * 1000000L
    }
  }

  // -- q223: KMV sketch-estimated source overlap ----------------------------

  test("q223 equals exact Jaccard (up to floor-vs-round) on a sub-k fixture") {
    // Source a: 2 distinct 5-grams; source b: 1, shared with a. Both
    // sets fit inside k=64, so the sketches ARE the sets: union size
    // 2, shared 1 → est 500000 = exact (round and floor agree at .5
    // of an even product here).
    val dir = tmpDir("q223fix")
    Seq(
      (1L, "t1 t2 t3 t4 t5 t6", "a"),
      (2L, "t1 t2 t3 t4 t5", "b"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = graft.queries.Curation.q223KmvOverlap(spark, dir).collect()
    r.length shouldBe 1
    r.head.toSeq shouldBe Seq("a", "b", 2L, 1L, 500000L, 500000L, 0L)
  }

  test("q223 sketch rows reconcile with the exact q115 matrix at sf0.001") {
    val est = graft.queries.Curation.q223KmvOverlap(spark, sf).collect()
    est.length should be > 0
    val exact = graft.queries.Curation.q115SourceOverlap(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(5)).toMap
    est.foreach { r =>
      val kUsed = r.getLong(r.fieldIndex("k_used"))
      val shared = r.getLong(r.fieldIndex("n_shared_k"))
      kUsed should be <= 64L
      shared should be <= kUsed
      r.getLong(r.fieldIndex("est_jaccard_e6")) shouldBe shared * 1000000L / kUsed
      // one matrix row per exact pair, err column consistent with q115
      val ex = exact((r.getString(0), r.getString(1)))
      r.getLong(r.fieldIndex("exact_jaccard_e6")) shouldBe ex
      r.getLong(r.fieldIndex("err_e6")) shouldBe
        math.abs(r.getLong(r.fieldIndex("est_jaccard_e6")) - ex)
    }
    est.length shouldBe exact.size
  }
}
