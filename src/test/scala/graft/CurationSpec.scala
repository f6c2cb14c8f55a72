package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the curation operators (q46–q52) that the DuckDB
  * oracle gate cannot express: determinism under re-sharding (the core
  * design claim — assignments derive from content-stable hashes, never
  * from partitioning), edge-case documents, and structural invariants
  * of the packing/permutation outputs.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  /** Synthetic documents table matching the testdata schema, with the
    * edge cases the real corpus doesn't cover: a single-token doc (no
    * 2-grams), a doc below the 5-gram width, a maximally repetitive
    * doc, an all-distinct doc, and exact duplicates across the
    * corpus/batch source boundary. */
  private lazy val docsDir: String = {
    val rows = Seq(
      // (doc_id, text, lang, source)
      (1L, "alpha", "en", "src0"),                       // 1 token
      (2L, "a b c d", "en", "src1"),                     // 4 tokens: no 5-gram
      (3L, "x x x x x x x x", "en", "src2"),             // fully repetitive
      (4L, "one two three four five six", "de", "src3"), // all distinct
      (5L, "shared corpus text lives right here ok", "fr", "src4"),
      (6L, "shared corpus text lives right here ok", "fr", "src15"), // dup of 5 in batch
      (7L, "totally novel batch document content words", "es", "src16"),
      (8L, "  spaced   out\ttokens  ", "en", "src5")     // whitespace normalization
    ) ++ (100L to 149L).map { i =>
      (i, s"filler doc $i with some shared words plus token${i % 7} tail", "en", s"src${(i % 20).toInt}")
    }
    val dir = tmpDir("curation-docs")
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", org.apache.spark.sql.functions.length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q46: repetition metrics handle 1-token and fully-repetitive docs") {
    val out = graft.queries.Curation.q46RepetitionStats(spark, docsDir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // single token: zero dup fraction, top share = 100%
    out(1L).getAs[Long]("dup_token_frac_e6") shouldBe 0L
    out(1L).getAs[Long]("dup_2gram_frac_e6") shouldBe 0L // no 2-grams → 0, not NULL
    out(1L).getAs[Long]("top_token_frac_e6") shouldBe 1000000L
    // fully repetitive 8×"x": 7/8 dup tokens, all 2-grams identical
    out(3L).getAs[Long]("dup_token_frac_e6") shouldBe 875000L
    out(3L).getAs[Long]("dup_2gram_frac_e6") shouldBe Math.round(1e6 * 6.0 / 7.0)
    out(3L).getAs[Boolean]("is_repetitive") shouldBe true
    // all-distinct doc: no duplication anywhere
    out(4L).getAs[Long]("dup_token_frac_e6") shouldBe 0L
    out(4L).getAs[Boolean]("is_repetitive") shouldBe false
  }

  test("q46: whitespace runs normalize before counting") {
    val out = graft.queries.Curation.q46RepetitionStats(spark, docsDir)
      .filter(col("doc_id") === 8L).collect().head
    out.getAs[Int]("n_tokens") shouldBe 3 // "spaced out tokens"
    out.getAs[Int]("n_uniq") shouldBe 3
  }

  test("q48: cross-boundary duplicate suppressed, novel batch doc kept") {
    val out = graft.queries.Curation.q48IncrementalDedup(spark, docsDir)
      .select("doc_id").as[Long].collect().toSet
    out should contain(7L)      // novel batch doc survives
    out should not contain 6L   // exact duplicate of corpus doc 5 is dropped
  }

  test("q49: inverse-probability weights match the per-stratum rates") {
    val out = graft.queries.Curation.q49StratifiedSample(spark, docsDir).collect()
    out.foreach { r =>
      val expected = if (r.getAs[String]("lang") == "en") 5000000L else 2000000L
      r.getAs[Long]("weight_e6") shouldBe expected
    }
  }

  test("q50: packing is exhaustive, contiguous, and monotone per stratum") {
    val out = graft.queries.Curation.q50TokenShards(spark, docsDir)
      .orderBy("lang", "cum_chars").collect()
    out.groupBy(_.getAs[String]("lang")).foreach { case (_, rows) =>
      // cumulative chars strictly increase along the packing order
      val cums = rows.map(_.getAs[Long]("cum_chars"))
      cums.zip(cums.tail).foreach { case (a, b) => a should be < b }
      // shard ids start at 0 and never skip or decrease along the order
      val shards = rows.map(_.getAs[Long]("shard"))
      shards.head shouldBe 0L
      shards.zip(shards.tail).foreach { case (a, b) =>
        b should (be >= a and be <= a + 1)
      }
    }
  }

  test("q52: output is a true permutation — (shard, pos) dense and unique") {
    val out = graft.queries.Curation.q52CorpusShuffle(spark, docsDir).collect()
    out.length shouldBe 58 // every doc appears exactly once
    out.map(_.getAs[Long]("doc_id")).distinct.length shouldBe 58
    out.groupBy(_.getAs[Long]("shard")).foreach { case (_, rows) =>
      rows.map(_.getAs[Long]("pos")).sorted shouldBe (1L to rows.length).toArray
    }
  }

  test("split/sample/shard/shuffle assignments survive re-sharding unchanged") {
    // The 100 TB design claim: every assignment is a pure function of
    // content-stable hashes — so physically reorganizing the input
    // (repartition + reversed sort) must not move a single document.
    val base = spark.read.parquet(s"$docsDir/documents.parquet")
    val shuffled = tmpDir("curation-reshard")
    base.repartition(7).sortWithinPartitions(col("doc_id").desc)
      .write.mode("overwrite").parquet(s"$shuffled/documents.parquet")
    for (q <- Seq("q42_train_test_split", "q47_decontaminate", "q48_incremental_dedup",
        "q49_stratified_sample", "q50_token_shards", "q52_corpus_shuffle")) {
      val a = SparkEntry.queries(q)(spark, docsDir)
      val b = SparkEntry.queries(q)(spark, shuffled)
      withClue(s"$q:") {
        a.exceptAll(b).count() shouldBe 0
        b.exceptAll(a).count() shouldBe 0
      }
    }
  }

  test("q47: a train doc sharing no 5-gram with any test doc is absent") {
    // Docs 1 and 2 are below the 5-gram width — they can never be
    // reported, whatever their split bucket.
    val out = graft.queries.Curation.q47Decontaminate(spark, docsDir)
      .select("doc_id").as[Long].collect().toSet
    out should not contain 1L
    out should not contain 2L
  }
}
