package graft

import graft.streaming.StreamingNearDup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The incremental MinHash-LSH index: streamed micro-batches must keep
  * exactly the documents the BATCH q21 operator would keep over the
  * same corpus (same shingling, same signatures, same ≥0.5 exact
  * verification — literally the same code), with near-dups suppressed
  * both within a batch and across batches via the persisted index.
  */
class StreamingNearDupSpec extends SparkSpec {
  import StreamingCurationSpec.Doc
  import spark.implicits._

  private val baseText =
    "spark engines shuffle data between stages while catalyst optimizes the logical plan before execution begins tonight"
  // one mid-token edit: 3-gram Jaccard vs base ≈ 15/21 ≈ 0.71 ≥ 0.5
  private val nearText = baseText.replace("catalyst", "tungsten")
  private val otherText =
    "completely different words compose this document nothing here resembles the neighbouring texts in any measurable way"

  private def doc(id: Long, text: String) = Doc(id, text, "en", "crawl", text.length.toLong)

  test("streamed batches keep exactly what batch q21 dedup would keep") {
    val indexDir = tmpDir("neardup-idx")
    val outDir = tmpDir("neardup-out") + "/novel"
    val batch1 = Seq(doc(1, baseText), doc(2, nearText), doc(3, otherText))
    val batch2 = Seq(
      doc(4, baseText),  // exact dup of indexed doc 1 → suppressed
      doc(5, otherText.replace("compose", "form")), // near-dup of 3 → suppressed
      doc(6, "brand new tiny"), // sub-shingle width → novel, unindexed
      doc(7, "a second genuinely novel document with plenty of fresh tokens inside it"))

    val stream = MemoryStream[Doc](spark)
    val q = StreamingNearDup.start(spark, stream.toDF(), indexDir, outDir,
      tmpDir("neardup-ckpt"))
    try {
      stream.addData(batch1); q.processAllAvailable()
      stream.addData(batch2); q.processAllAvailable()
    } finally q.stop()

    val novel = spark.read.parquet(outDir).as[Long].collect().toSet
    novel shouldBe Set(1L, 3L, 6L, 7L)

    // cross-check against the BATCH operator over the same corpus:
    // every doc q21 pairs with a smaller-id partner must be suppressed
    val docsDir = tmpDir("neardup-docs")
    (batch1 ++ batch2).toDF().write.parquet(s"$docsDir/documents.parquet")
    val pairs = graft.queries.LlmPipeline.q21DedupMinhashLsh(spark, docsDir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    val dupByBatchRule = pairs.map { case (a, b) => math.max(a, b) }.toSet
    val keepers = (batch1 ++ batch2).map(_.doc_id).toSet -- dupByBatchRule
    novel shouldBe keepers
  }

  test("index holds bands and sigs for ALL shingle-bearing docs; output only novel") {
    val indexDir = tmpDir("neardup-idx2")
    val outDir = tmpDir("neardup-out2") + "/novel"
    StreamingNearDup.processBatch(spark,
      Seq(doc(1, baseText), doc(2, nearText), doc(3, "too small")).toDF(),
      indexDir, outDir) shouldBe 2 // 1 kept, 2 suppressed, 3 novel-but-tiny
    // SUPPRESSED docs are indexed too — a later doc whose only near-dup
    // partner is doc 2 must still be caught (chain preservation); doc 3
    // has no shingles, so no sig rows
    val sigs = spark.read.parquet(s"$indexDir/sigs")
    sigs.select("doc_id").as[Long].collect().toSet shouldBe Set(1L, 2L)
    spark.read.parquet(s"$indexDir/bands")
      .groupBy("doc_id").count().as[(Long, Long)].collect().toMap shouldBe
      Map(1L -> 8L, 2L -> 8L)
    // only novel ids reach the output sink
    spark.read.parquet(outDir).select("doc_id").as[Long].collect().toSet shouldBe
      Set(1L, 3L)
  }

  test("duplicate chains survive through suppressed docs across batches") {
    val indexDir = tmpDir("neardup-idx3")
    val outDir = tmpDir("neardup-out3") + "/novel"
    // batch 1: doc 2 is a near-dup of doc 1 → suppressed but indexed
    StreamingNearDup.processBatch(spark,
      Seq(doc(1, baseText), doc(2, nearText)).toDF(), indexDir, outDir) shouldBe 1
    // batch 2: doc 4 = doc 2's text verbatim — its only partner is the
    // SUPPRESSED doc 2; novel-only indexing would wrongly admit it
    StreamingNearDup.processBatch(spark,
      Seq(doc(4, nearText)).toDF(), indexDir, outDir) shouldBe 0
  }

  test("replaying a batch whose index write committed emits the same novel set") {
    val indexDir = tmpDir("neardup-idx4")
    val outDir = tmpDir("neardup-out4") + "/novel"
    val batch = Seq(doc(1, baseText), doc(2, nearText)).toDF()
    StreamingNearDup.processBatch(spark, batch, indexDir, outDir) shouldBe 1
    // foreachBatch replay after a crash between index write and
    // checkpoint commit: the batch re-runs against an index already
    // holding its own rows — self-pair exclusion must keep doc 1 novel
    StreamingNearDup.processBatch(spark, batch, indexDir, outDir) shouldBe 1
  }
}
