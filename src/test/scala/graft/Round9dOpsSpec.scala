package graft

import org.apache.spark.sql.functions._

/** Fixture pins for the fourth round-9 operator batch: the l-diversity
  * release gate (q188 — hand-built homogeneous/diverse classes) and
  * the length-bucketed padding audit (q189 — exact bucket and ppm
  * arithmetic on known token counts).
  */
class Round9dOpsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  // -- q188: l-diversity audit -------------------------------------------

  test("q188 flags homogeneous classes on a hand-built fixture") {
    // class (nation 1, band 0): 3 rows, ALL segment A   → div 1
    // class (nation 2, band 0): 2 rows, segments A and B → div 2
    val dir = tmpDir("q188fix")
    Seq(
      (1L, 1L, 100.0, "A"), (2L, 1L, 200.0, "A"), (3L, 1L, 300.0, "A"),
      (4L, 2L, 100.0, "A"), (5L, 2L, 200.0, "B"))
      .toDF("c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val got = graft.queries.Profiling.q188LDiversity(spark, dir)
      .orderBy("l")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    got shouldBe Seq(
      (2L, 5L, 2L, 3L, 1L, 600000L), // only the homogeneous class < 2
      (3L, 5L, 2L, 5L, 2L, 1000000L), // both classes < 3
      (5L, 5L, 2L, 5L, 2L, 1000000L))
  }

  test("q188 risk is monotone in l and bounded by the population") {
    val rows = graft.queries.Profiling.q188LDiversity(spark, sf)
      .orderBy("l").collect()
    rows.map(_.getLong(0)).toSeq shouldBe Seq(2L, 3L, 5L)
    val n = spark.read.parquet(s"$sf/customer.parquet").count()
    rows.foreach { r =>
      r.getLong(1) shouldBe n // n_rows partitions the table
      r.getLong(3) should be <= r.getLong(1)
      r.getLong(4) should be <= r.getLong(2)
      r.getLong(5) shouldBe r.getLong(3) * 1000000L / r.getLong(1)
    }
    rows.map(_.getLong(3)).toSeq shouldBe sorted
    rows.map(_.getLong(4)).toSeq shouldBe sorted
  }

  // -- q189: padding-efficiency audit ------------------------------------

  test("q189 buckets and ppm match a hand-derived fixture") {
    // 3 tokens → bucket 64; 70 tokens → bucket 128 (also the global max)
    val dir = tmpDir("q189fix")
    Seq((1L, "a b c", "en", "s1", 5L),
      (2L, Seq.fill(70)("w").mkString(" "), "en", "s1", 139L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.queries.Curation.q189PaddingAudit(spark, dir)
      .orderBy("bucket_len")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    got shouldBe Seq(
      (64L, 1L, 3L, 64L, (64L - 3L) * 1000000L / 64L,
        (128L - 3L) * 1000000L / 128L),
      (128L, 1L, 70L, 128L, (128L - 70L) * 1000000L / 128L,
        (128L - 70L) * 1000000L / 128L))
  }

  test("q189 covers the corpus; bucketing never wastes more than naive") {
    val rows = graft.queries.Curation.q189PaddingAudit(spark, sf).collect()
    rows.length should be > 0
    val corpus = spark.read.parquet(s"$sf/documents.parquet").count()
    rows.map(_.getLong(1)).sum shouldBe corpus
    rows.foreach { r =>
      r.getLong(0) % 64L shouldBe 0L // bucket is a multiple of 64
      r.getLong(2) should be <= r.getLong(3) // tokens fit capacity
      r.getLong(4) should be <= r.getLong(5) // pad-to-bucket ≤ pad-to-max
    }
  }
}
