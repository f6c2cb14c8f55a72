package graft

import graft.streaming.StreamingKmv
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Chunked-fold ≡ batch equality for the streaming KMV sketches:
  * bottom-k of a union equals bottom-k of the merged bottom-k's (the
  * KMV mergeable property, with dedup-before-rank making re-seen
  * grams no-ops) and the gram hashes are batch q223's, so the folded
  * state must be BIT-EQUAL to the batch sketch over the same rows —
  * plus replay no-op, chunk-order independence, and a full-table pin
  * of overlapEstimate against q223's estimate columns.
  */
class StreamingKmvSpec extends SparkSpec {
  import spark.implicits._

  // ≥5-token texts (ContamN = 5 grams); the shared trailing sentence
  // gives the two sources overlapping gram sets, and doc 4 repeats
  // doc 1's text in a later chunk so dedup-before-rank is exercised
  private val chunks: Seq[Seq[(Long, String, String)]] = Seq(
    Seq((1L, "the quick brown fox jumps over the lazy dog", "web"),
      (2L, "pack my box with five dozen liquor jugs", "wiki")),
    Seq((3L, "the quick brown fox jumps over the lazy dog today", "wiki")),
    Seq((4L, "the quick brown fox jumps over the lazy dog", "web"),
      (5L, "sphinx of black quartz judge my vow now", "web")))

  private def df(rows: Seq[(Long, String, String)]): DataFrame =
    rows.map { case (id, t, src) => (id, t, "en", src) }
      .toDF("doc_id", "text", "lang", "source")

  private def batchSketch: Set[Seq[Any]] =
    graft.queries.Curation.kmvBottomK(
      graft.queries.Curation.sourceGramRows(df(chunks.flatten)))
      .collect().map(_.toSeq).toSet

  test("chunked fold lands on the bit-equal batch sketch") {
    val dir = tmpDir("kmv")
    chunks.zipWithIndex.foreach { case (c, i) =>
      StreamingKmv.processBatch(spark, df(c), i.toLong, dir) shouldBe true
    }
    StreamingKmv.sketches(spark, dir)
      .collect().map(_.toSeq).toSet shouldBe batchSketch
  }

  test("chunk order does not matter; replay is a no-op") {
    val dir = tmpDir("kmv-order")
    chunks.reverse.zipWithIndex.foreach { case (c, i) =>
      StreamingKmv.processBatch(spark, df(c), i.toLong, dir) shouldBe true
    }
    StreamingKmv.sketches(spark, dir)
      .collect().map(_.toSeq).toSet shouldBe batchSketch
    StreamingKmv.processBatch(spark, df(chunks(0)), 1L, dir) shouldBe false
    StreamingKmv.sketches(spark, dir)
      .collect().map(_.toSeq).toSet shouldBe batchSketch
  }

  test("overlap estimate matches the shared batch arithmetic") {
    val dir = tmpDir("kmv-est")
    chunks.zipWithIndex.foreach { case (c, i) =>
      StreamingKmv.processBatch(spark, df(c), i.toLong, dir)
    }
    val est = StreamingKmv.overlapEstimate(spark, dir, Seq(("web", "wiki")))
      .collect().map(_.toSeq).toSeq
    val want = graft.queries.Curation.kmvPairEstimate(
      graft.queries.Curation.kmvBottomK(
        graft.queries.Curation.sourceGramRows(df(chunks.flatten))),
      Seq(("web", "wiki")).toDF("src_a", "src_b"))
      .collect().map(_.toSeq).toSeq
    est shouldBe want
    est should have size 1
  }

  test("chunked fold of the documents table matches batch q223's estimates") {
    val dir = tmpDir("kmv-full")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("half", (col("doc_id") % 2).cast("int"))
    (0 to 1).foreach { h =>
      StreamingKmv.processBatch(
        spark, docs.filter(col("half") === h).drop("half"), h.toLong,
        dir) shouldBe true
    }
    val batch = graft.queries.Curation
      .q223KmvOverlap(spark, "/root/testdata/sf0.001")
      .select("src_a", "src_b", "k_used", "n_shared_k", "est_jaccard_e6")
      .collect().map(_.toSeq)
    val pairs = batch.map(r => (r(0).toString, r(1).toString)).toSeq
    val est = StreamingKmv.overlapEstimate(spark, dir, pairs)
      .collect().map(_.toSeq).toSet
    est shouldBe batch.toSet
  }
}
