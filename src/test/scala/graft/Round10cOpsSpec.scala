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
}
