package graft

import org.apache.spark.sql.functions._

/** Fixture pins for the second round-9 operator batch: the
  * Merkle-guided repair diff (q166 — statuses, bucket pruning, the
  * replica derivation), FD validation g3 arithmetic (q167), and the
  * RRF fusion identity (q168).
  */
class Round9bOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ordersDf(rows: Seq[(Long, Long, String, Double, String)]) =
    rows.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "d")
      .withColumn("o_orderdate", to_date(col("d"))).drop("d")

  // -- q166: merkleRepair -----------------------------------------------

  test("merkleRepair classifies changed/base_only/replica_only and prunes clean buckets") {
    val base = ordersDf(Seq(
      (1L, 10L, "O", 100.00, "2024-01-01"), // bucket 1: cell change
      (2L, 11L, "F", 200.00, "2024-01-02"), // bucket 2: deleted on replica
      (3L, 12L, "O", 300.00, "2024-01-03"), // bucket 3: key rewritten
      (300L, 13L, "O", 400.00, "2024-01-04"))) // bucket 44: identical
    val replica = ordersDf(Seq(
      (1L, 10L, "O", 101.00, "2024-01-01"),
      (259L, 12L, "O", 300.00, "2024-01-03"), // 259 ≡ 3 (mod 256): same bucket
      (300L, 13L, "O", 400.00, "2024-01-04")))
    val got = graft.queries.Profiling.merkleRepair(base, replica)
      .orderBy("bucket", "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    got shouldBe Seq(
      (1L, 1L, "changed"),
      (2L, 2L, "base_only"),
      (3L, 3L, "base_only"),
      (3L, 259L, "replica_only"))
    // the identical bucket never surfaces — the repair pass is pruned
    got.map(_._1).toSet should not contain 44L
  }

  test("replicaOrders applies exactly the three declared perturbations") {
    val base = ordersDf(Seq(
      (257L, 1L, "O", 10.00, "2024-01-01"),
      (514L, 2L, "O", 20.00, "2024-01-02"),
      (771L, 3L, "O", 30.00, "2024-01-03"),
      (100L, 4L, "O", 40.00, "2024-01-04")))
    val got = graft.queries.Profiling.replicaOrders(base)
      .select("o_orderkey", "o_totalprice")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    got shouldBe Set(
      (257L, 11.00), // price bumped
      (1000000771L, 30.00), // key moved, bucket-preserving
      (100L, 40.00)) // untouched; 514 deleted
  }

  test("q166 over testdata finds all three divergence classes in exactly 3 buckets") {
    val got = graft.queries.Profiling
      .q166MerkleRepair(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getString(2))).toSeq
    got.map(_._2).toSet shouldBe Set("changed", "base_only", "replica_only")
    got.map(_._1).toSet shouldBe Set(1L, 2L, 3L)
    // one perturbed key per class at sf0.001; the move contributes a
    // base_only (old key) AND a replica_only (new key)
    got.count(_._2 == "changed") shouldBe 1
    got.count(_._2 == "base_only") shouldBe 2
    got.count(_._2 == "replica_only") shouldBe 1
  }

  // -- q167: FD g3 arithmetic -------------------------------------------

  test("fdProfile computes the g3 identity on a hand-derived fixture") {
    val df = Seq(("a", "1"), ("a", "2"), ("a", "2"), ("b", "3"))
      .toDF("x", "y")
    val r = graft.queries.Profiling.fdProfile(df, "t.x->y", "x", "y").head()
    r.getString(0) shouldBe "t.x->y"
    r.getLong(1) shouldBe 4L // n_rows
    r.getLong(2) shouldBe 2L // n_groups
    r.getLong(3) shouldBe 1L // group 'a' has 2 distinct y
    r.getLong(4) shouldBe 1L // delete one of a→{1,2,2} to repair
    r.getLong(5) shouldBe 250000L // g3_e6 = 1/4
  }

  test("fdProfile reports zero g3 for a dependency that holds") {
    val df = Seq(("a", "1"), ("a", "1"), ("b", "2")).toDF("x", "y")
    val r = graft.queries.Profiling.fdProfile(df, "t.x->y", "x", "y").head()
    r.getLong(3) shouldBe 0L
    r.getLong(4) shouldBe 0L
    r.getLong(5) shouldBe 0L
  }

  test("q167 over testdata: key→attr FDs hold, attr→attr FDs are violated") {
    val rows = graft.queries.Profiling.q167FdCheck(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> r.getLong(5)).toMap
    rows("customer.c_custkey->c_nationkey") shouldBe 0L
    rows("part.p_brand->p_type") should be > 0L
    rows("orders.o_custkey->o_orderpriority") should be > 0L
  }

  // -- q168: RRF fusion identity ----------------------------------------

  test("rrfFuse sums 1e6 div (60 + rank) across present legs only") {
    val lex = Seq((10L, 1L), (20L, 2L)).toDF("id", "lex_rank")
    val sem = Seq((20L, 1L), (30L, 2L)).toDF("id", "sem_rank")
    val got = graft.queries.Relevance.rrfFuse(lex, sem)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSeq
    // 1e6 div 61 = 16393, 1e6 div 62 = 16129
    got shouldBe Seq(
      (10L, 16393L), // lex only, rank 1
      (20L, 16129L + 16393L), // both legs
      (30L, 16129L)) // sem only, rank 2
  }

  // -- q170: referential-integrity audit -----------------------------------

  test("riEdge counts orphans including NULL fks, on a broken fixture") {
    val child = Seq(Some(1L), Some(2L), Some(3L), None, Some(3L))
      .toDF("fk")
    val parent = Seq(1L, 3L).toDF("pk")
    val r = graft.queries.Profiling.riEdge(child, "fk", parent, "pk", "t").head()
    r.getString(0) shouldBe "t"
    r.getLong(1) shouldBe 5L // n_child
    r.getLong(2) shouldBe 3L // distinct non-null fks
    r.getLong(3) shouldBe 2L // fk=2 and the NULL
    r.getLong(4) shouldBe 400000L
  }

  test("q170 over testdata: every declared FK edge is clean") {
    val rows = graft.queries.Profiling.q170RiCheck(spark, "/root/testdata/sf0.001")
      .collect()
    rows.length shouldBe 5
    rows.foreach(r => r.getLong(3) shouldBe 0L)
  }

  // -- q172: per-source data cards -----------------------------------------

  test("q172 data cards partition the corpus and keep ratio identities") {
    val rows = graft.queries.Curation
      .q172SourceDatacard(spark, "/root/testdata/sf0.001").collect()
    rows.length should be > 0
    val corpus = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").count()
    rows.map(_.getLong(1)).sum shouldBe corpus // n_docs partitions docs
    rows.foreach { r =>
      val (nDocs, sumChars, meanChars) = (r.getLong(1), r.getLong(2), r.getLong(3))
      meanChars shouldBe sumChars / nDocs
      r.getLong(7) should be <= 1000000L // top_lang_ppm
      r.getLong(9) should be <= 1000000L // dup_ppm
    }
  }

  // -- q171: memorization scan ---------------------------------------------

  test("q171 reports bounded per-test-doc train coverage") {
    val rows = graft.queries.Curation
      .q171MemorizationScan(spark, "/root/testdata/sf0.001").collect()
    rows.length should be > 0
    rows.foreach { r =>
      val (n, hit, ppm) = (r.getLong(1), r.getLong(2), r.getLong(3))
      n should be > 0L
      hit should be <= n
      ppm shouldBe hit * 1000000L / n
    }
  }

  // -- q169: Misra–Gries heavy hitters ------------------------------------

  test("mgKeys retains every item above the n/m frequency bound") {
    // n=12, m=3: bound is count > 4; 'a' (6 occurrences) must survive
    val stream = Seq("a", "b", "a", "c", "a", "d", "a", "e", "a", "f", "a", "g")
    val keys = graft.queries.LlmPipeline.mgKeys(stream.iterator, 3).toSet
    keys should contain("a")
    keys.size should be <= 3
  }

  test("heavyTokens output is exact and partitioning-independent") {
    val words =
      Seq.fill(50)("the") ++ Seq.fill(20)("of") ++
        (1 to 30).map(i => s"rare$i")
    def run(parts: Int) = {
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(words.map(org.apache.spark.sql.Row(_)), parts),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("tok",
            org.apache.spark.sql.types.StringType))))
      graft.queries.LlmPipeline.heavyTokens(df, 4)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    }
    // N=100, m=4 → threshold 26: only "the" (50) qualifies; "of" (20) not
    val expected = Set(("the", 50L))
    run(2) shouldBe expected
    run(7) shouldBe expected
  }

  test("q168 fuses both legs over testdata with bounded ranks") {
    val rows = graft.queries.Relevance
      .q168RrfFusion(spark, "/root/testdata/sf0.001").collect()
    rows.length should be > 0
    rows.length should be <= 40 // two top-20 lists
    rows.foreach { r =>
      if (!r.isNullAt(1)) r.getLong(1) should be <= 20L
      if (!r.isNullAt(2)) r.getLong(2) should be <= 20L
      r.getLong(3) should be > 0L
    }
    // at least one doc must be ranked by BOTH legs only if the id
    // spaces overlap — assert the structural invariant instead: every
    // row has at least one leg
    rows.foreach(r => (!r.isNullAt(1) || !r.isNullAt(2)) shouldBe true)
  }
}
