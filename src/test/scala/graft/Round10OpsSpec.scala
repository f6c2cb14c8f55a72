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
