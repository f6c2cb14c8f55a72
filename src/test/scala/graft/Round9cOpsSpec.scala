package graft

import org.apache.spark.sql.functions._

/** Fixture pins for the third round-9 operator batch: the k-anonymity
  * release gate (q173), unigram-LM surprisal scoring (q174 — the
  * integer floor-log2 arithmetic on a hand-built corpus), community
  * modularity (q175 — partition/degree identities against q162), and the
  * per-language fertility profile (q176 — ratio identities).
  */
class Round9cOpsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  // -- q173: k-anonymity audit -------------------------------------------

  test("q173 reports one row per threshold with monotone risk") {
    val rows = graft.queries.Profiling.q173KAnonymity(spark, sf)
      .orderBy("k").collect()
    rows.map(_.getLong(0)).toSeq shouldBe Seq(2L, 5L, 10L, 20L)
    val nCustomers = spark.read.parquet(s"$sf/customer.parquet").count()
    rows.foreach { r =>
      r.getLong(1) shouldBe nCustomers // n_rows partitions the table
      r.getLong(3) should be <= r.getLong(1) // rows_at_risk ≤ n_rows
      r.getLong(4) should be <= r.getLong(2) // classes_at_risk ≤ n_classes
      r.getLong(5) shouldBe r.getLong(3) * 1000000L / r.getLong(1)
    }
    // risk can only grow with k
    rows.map(_.getLong(3)).toSeq shouldBe sorted
    rows.map(_.getLong(4)).toSeq shouldBe sorted
  }

  // -- q174: unigram-LM surprisal ----------------------------------------

  test("q174 surprisal bits match the hand-derived floor-log2 fixture") {
    // corpus: doc 1 = "a a b", doc 2 = "a c"; T = 5 tokens →
    // ilog2(5)=2; counts a=3 (ilog2=1→s=1), b=1 (s=2), c=1 (s=2)
    val dir = java.nio.file.Files.createTempDirectory("q174fix").toString
    Seq((1L, "a a b", "en", "s1", 5L), (2L, "a c", "en", "s1", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.queries.Relevance.q174LmSurprisal(spark, dir)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4))).toSeq
    got shouldBe Seq(
      (1L, 3L, 2L * 1 + 1L * 2, 1333L, false), // (2·s_a + 1·s_b)·1000 div 3
      (2L, 2L, 1L + 2L, 1500L, false))
  }

  test("q174 over testdata covers every document with sane scores") {
    val rows = graft.queries.Relevance.q174LmSurprisal(spark, sf).collect()
    rows.length shouldBe
      spark.read.parquet(s"$sf/documents.parquet").count().toInt
    rows.foreach { r =>
      r.getLong(1) should be > 0L // n_tokens
      r.getLong(2) should be >= 0L // bits
      r.getLong(3) shouldBe r.getLong(2) * 1000L / r.getLong(1)
    }
  }

  // -- q175: community modularity ----------------------------------------

  test("q175 holds the partition and degree identities against q162") {
    val mods = graft.queries.Graph.q175Modularity(spark, sf).collect()
    val communities = graft.queries.Graph.q162LabelProp(spark, sf)
      .select("community").distinct().count()
    mods.length shouldBe communities.toInt
    val nNodes = graft.queries.Graph.q162LabelProp(spark, sf).count()
    mods.map(_.getLong(1)).sum shouldBe nNodes // Σ n_members = |V|
    // Σ deg_c = 2m and Σ intra ≤ m ⇒ recover m from the degree sums
    val degTotal = mods.map(_.getLong(3)).sum
    degTotal % 2 shouldBe 0L
    mods.map(_.getLong(2)).sum should be <= degTotal / 2
    // each contribution is bounded by the intra share (≤ 1e6)
    mods.foreach(_.getLong(4) should be <= 1000000L)
  }

  // -- q177: embedding-space health --------------------------------------

  test("q177 drift/tightness match the hand-derived 2-D fixture") {
    // label 0: (1,0),(0,1) — tight at cos 45° to its own centroid;
    // label 1: (1,0),(1,0) — perfectly tight. Global sum = (3e4, 1e4).
    val dir = java.nio.file.Files.createTempDirectory("q177fix").toString
    Seq((1L, Array(1.0f, 0.0f), 0), (2L, Array(0.0f, 1.0f), 0),
      (3L, Array(1.0f, 0.0f), 1), (4L, Array(1.0f, 0.0f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = graft.queries.NearDup.q177EmbeddingHealth(spark, dir)
      .orderBy("label")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    got shouldBe Seq(
      (0L, 2L, 894427L, 707107L), // cos((1,1),(3,1)), mean cos 45°
      (1L, 2L, 948683L, 1000000L)) // cos((2,0),(3,1)), exactly tight
  }

  test("q177 over testdata covers every vector with bounded cosines") {
    val rows = graft.queries.NearDup.q177EmbeddingHealth(spark, sf).collect()
    val total = spark.read.parquet(s"$sf/embeddings.parquet").count()
    rows.map(_.getLong(1)).sum shouldBe total
    rows.foreach { r =>
      r.getLong(2) should be <= 1000000L
      r.getLong(3) should be <= 1000000L
    }
  }

  // -- q178: calibration audit -------------------------------------------

  test("q178 bins a 4-doc source exactly per the integer formulas") {
    // ranks 1..4 by (n_chars, doc_id): pred = (rn-1)*1e6 div 3, each
    // doc lands in its own bin via (rn-1)*10 div 4 + 1 = 1, 3, 6, 8
    val dir = java.nio.file.Files.createTempDirectory("q178fix").toString
    Seq((1L, "a", "en", "s1", 10L), (2L, "b", "de", "s1", 20L),
      (3L, "c", "en", "s1", 30L), (4L, "d", "fr", "s1", 40L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.queries.Profiling.q178CalibrationAudit(spark, dir)
      .orderBy("bin")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    got shouldBe Seq(
      (1L, 1L, 0L, 1000000L, 1000000L), // en at pred 0
      (3L, 1L, 333333L, 0L, 333333L),
      (6L, 1L, 666666L, 1000000L, 333334L), // en at pred 2/3
      (8L, 1L, 1000000L, 0L, 1000000L)) // (4-1)·1e6 div 3 exactly 1e6
  }

  test("q178 over testdata partitions docs with bounded ppm columns") {
    val rows = graft.queries.Profiling.q178CalibrationAudit(spark, sf).collect()
    val corpus = spark.read.parquet(s"$sf/documents.parquet").count()
    rows.map(_.getLong(2)).sum shouldBe corpus
    rows.foreach { r =>
      r.getLong(1) should (be >= 1L and be <= 10L) // bin
      r.getLong(3) should be <= 1000000L // mean_pred_ppm
      r.getLong(4) should be <= 1000000L // pos_ppm
      r.getLong(5) shouldBe math.abs(r.getLong(3) - r.getLong(4))
    }
  }

  // -- q179: persistent bestsellers ----------------------------------------

  test("q179 persistence profile stays within the monthly top-k bounds") {
    val rows = graft.queries.Analytics.q179PersistentTopk(spark, sf).collect()
    rows.length should be > 0
    val nMonths = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(date_format(col("l_shipdate"), "yyyy-MM")).distinct().count()
    rows.map(_.getLong(1)).sum should be <= 10L * nMonths
    rows.foreach { r =>
      r.getLong(1) should be >= 1L // months_in_top
      r.getLong(4) should (be >= 1L and be <= 10L) // best_rank
      r.getString(2) should be <= r.getString(3) // first ≤ last month
    }
  }

  // -- q180: lang-ID confusion matrix --------------------------------------

  test("q180 cells, marginals, and shares match a hand-built corpus") {
    // truth en: one guessed en, one unknown; truth de: guessed de
    val dir = java.nio.file.Files.createTempDirectory("q180fix").toString
    Seq((1L, "the cat and dog", "en", "s1", 15L),
      (2L, "zzz qqq", "en", "s1", 7L),
      (3L, "der hund und katze", "de", "s1", 18L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.queries.LlmPipeline.q180LangidConfusion(spark, dir)
      .orderBy("lang", "lang_guess")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    got shouldBe Seq(
      ("de", "de", 1L, 1L, 1L, 1000000L, 1000000L),
      ("en", "en", 1L, 2L, 1L, 500000L, 1000000L),
      ("en", "unknown", 1L, 2L, 1L, 500000L, 1000000L))
  }

  test("q180 over testdata partitions docs across cells") {
    val rows = graft.queries.LlmPipeline.q180LangidConfusion(spark, sf).collect()
    val corpus = spark.read.parquet(s"$sf/documents.parquet").count()
    rows.map(_.getLong(2)).sum shouldBe corpus
    rows.foreach { r =>
      r.getLong(5) should be <= 1000000L
      r.getLong(6) should be <= 1000000L
    }
  }

  // -- q181: inter-event burstiness ----------------------------------------

  test("q181 burstiness hits the regular/bursty endpoints on fixtures") {
    val rows = graft.queries.EventAnalytics.q181Burstiness(spark, sf)
      .collect()
    rows.length should be > 0
    rows.foreach { r =>
      r.getLong(1) should be >= 1L // n_gaps
      r.getLong(3) shouldBe r.getLong(2) / r.getLong(1) // mean identity
      if (!r.isNullAt(4)) {
        r.getDouble(4) should be >= -1.0
        r.getDouble(4) should be <= 1.0
      }
    }
  }

  // -- q182: cross-source near-dup matrix ----------------------------------

  test("q182 cells account for every q21 pair with ordered keys and sane rates") {
    val nPairs = graft.queries.LlmPipeline
      .q21DedupMinhashLsh(spark, sf).count()
    val rows = graft.queries.LlmPipeline
      .q182NeardupSourceMatrix(spark, sf).collect()
    rows.map(_.getLong(2)).sum shouldBe nPairs // cells partition the pairs
    rows.foreach { r =>
      r.getString(0) should be <= r.getString(1) // ordered cell key
      r.getLong(2) should be <= r.getLong(5) // n_pairs ≤ possible_pairs
      r.getLong(6) shouldBe r.getLong(2) * 1000000L / r.getLong(5)
    }
  }

  // -- q183: dup-cluster size profile ---------------------------------------

  test("q183 histogram reconciles with q55's cluster relation") {
    val clusters = graft.queries.Graph.q55DupClusters(spark, sf)
    val rows = graft.queries.Graph.q183ClusterProfile(spark, sf).collect()
    rows.map(_.getLong(1)).sum shouldBe
      clusters.filter(col("is_keeper")).count() // one keeper per cluster
    rows.map(_.getLong(2)).sum shouldBe clusters.count() // docs covered
    rows.foreach { r =>
      r.getLong(0) should be >= 2L // no singleton clusters by contract
      r.getLong(3) shouldBe (r.getLong(0) - 1L) * r.getLong(1)
    }
  }

  // -- q184: token-budget waterfilling --------------------------------------

  test("q184 finds the exact water level on the classic 1/10/100 fixture") {
    // totals 1+10+100 = 111, B = 55: level 44 keeps 1 and 10 whole,
    // caps the big source (1 + 10 + 44 = 55 = B exactly)
    val dir = java.nio.file.Files.createTempDirectory("q184fix").toString
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    Seq((1L, words(1), "en", "sA", 2L), (2L, words(10), "en", "sB", 20L),
      (3L, words(100), "en", "sC", 200L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.queries.Curation.q184TokenWaterfill(spark, dir)
      .orderBy("source")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getLong(4))).toSeq
    got shouldBe Seq(
      ("sA", 1L, 1L, false, 44L),
      ("sB", 10L, 10L, false, 44L),
      ("sC", 100L, 44L, true, 44L))
  }

  test("q184 allocation exhausts the budget up to integer remainder") {
    val rows = graft.queries.Curation.q184TokenWaterfill(spark, sf).collect()
    val total = rows.map(_.getLong(1)).sum
    val alloc = rows.map(_.getLong(2)).sum
    alloc should be <= total / 2 // never exceeds B
    (total / 2 - alloc) should be < rows.length.toLong // remainder < |S|
    rows.foreach { r =>
      r.getLong(2) should be <= r.getLong(1) // alloc ≤ n
      r.getBoolean(3) shouldBe (r.getLong(1) > r.getLong(4))
    }
  }

  // -- q185: ship-latency percentiles ----------------------------------------

  test("q185 percentiles are ordered and cover every line item") {
    val rows = graft.queries.Analytics.q185ShipLatency(spark, sf).collect()
    rows.length shouldBe 5 // TPC-H priorities
    val items = spark.read.parquet(s"$sf/lineitem.parquet").count()
    rows.map(_.getLong(1)).sum shouldBe items
    rows.foreach { r =>
      r.getLong(3) should be <= r.getLong(4) // p50 ≤ p90
      r.getLong(4) should be <= r.getLong(5) // p90 ≤ p99
    }
  }

  // -- q176: per-language fertility --------------------------------------

  test("q176 partitions the corpus by lang and keeps ratio identities") {
    val rows = graft.queries.Curation.q176TokenFertility(spark, sf).collect()
    rows.length should be > 0
    val corpus = spark.read.parquet(s"$sf/documents.parquet").count()
    rows.map(_.getLong(1)).sum shouldBe corpus
    rows.foreach { r =>
      val (nDocs, nToks, nChars, nBytes) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      nBytes should be >= nChars // UTF-8: ≥1 byte per char
      r.getLong(5) shouldBe nChars * 1000L / nToks
      r.getLong(6) shouldBe nBytes * 1000L / nChars
      r.getLong(7) shouldBe nToks * 1000L / nDocs
    }
  }

  // -- q186: first-seen adoption curve -----------------------------------

  test("q186 cumulative curve partitions users by first-seen day") {
    val rows = graft.queries.EventAnalytics.q186FirstSeenCurve(spark, sf)
      .orderBy("day").collect()
    rows.length should be > 0
    val users = spark.read.parquet(s"$sf/events.parquet")
      .select("user_id").distinct().count()
    // first-seen days partition users: n_new sums to the distinct count
    rows.map(_.getLong(1)).sum shouldBe users
    // cum_users is the exact running sum, ends at the full population
    rows.foldLeft(0L) { (acc, r) =>
      val cum = acc + r.getLong(1)
      r.getLong(2) shouldBe cum
      cum
    } shouldBe users
  }

  // -- q187: daily value percentile bands --------------------------------

  test("q187 bands cover every event with ordered rank-exact cuts") {
    val rows = graft.queries.EventAnalytics.q187DailyValueBands(spark, sf)
      .collect()
    rows.length should be > 0
    val events = spark.read.parquet(s"$sf/events.parquet").count()
    rows.map(_.getLong(2)).sum shouldBe events // cells partition events
    rows.foreach { r =>
      r.getLong(4) should be <= r.getLong(5) // p50 ≤ p90
      r.getLong(3) should be >= 0L // mean_e2: values are non-negative
    }
  }
}
