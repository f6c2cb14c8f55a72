package graft

import graft.streaming.StreamingCuration
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Batch-vs-stream equality for the continuous curation stage: the
  * stream-static anti-join over MemoryStream micro-batches must admit
  * exactly the documents the BATCH q48-shaped anti-join admits, and
  * the quality gate must behave identically in both modes (the same
  * function literally runs in both plans).
  */
object StreamingCurationSpec {
  case class Doc(doc_id: Long, text: String, lang: String,
      source: String, n_chars: Long)
}

class StreamingCurationSpec extends SparkSpec {
  import StreamingCurationSpec.Doc
  import spark.implicits._

  private def doc(id: Long, text: String, src: String = "crawl") =
    Doc(id, text, "en", src, text.length.toLong)

  private val corpusDocs = Seq(
    doc(1, "the corpus already holds this exact document text", "src0"),
    doc(2, "another    Corpus document\twith odd   whitespace", "src1"))

  private val incoming = Seq(
    // dup of corpus doc 2 modulo case/whitespace normalization → dropped
    doc(10, "another corpus document with odd whitespace"),
    doc(11, "a genuinely novel incoming document with enough tokens"),
    doc(12, "short junk"), // fails the ≥5-token quality gate
    doc(13, "!!! ??? ### $$$ %%% &&& ((( )))")) // punctuation-dense → gated

  test("stream-static anti-join admits exactly what the batch anti-join admits") {
    val corpus = corpusDocs.toDF()
    val stream = MemoryStream[Doc](spark)
    val q = StreamingCuration.curateStream(stream.toDF(), corpus)
      .writeStream.format("memory").queryName("curated").outputMode("append").start()
    try {
      stream.addData(incoming.take(2))
      q.processAllAvailable()
      stream.addData(incoming.drop(2)) // second micro-batch
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("curated").select("doc_id").as[Long].collect().toSet
    got shouldBe Set(11L)
    // the same composed function over a plain batch DataFrame agrees
    val batch = StreamingCuration.curateStream(incoming.toDF(), corpus)
      .select("doc_id").as[Long].collect().toSet
    batch shouldBe got
  }

  test("corpus hash set uses the exact q20/q48 normalization") {
    val hashes = StreamingCuration.corpusHashes(corpusDocs.toDF())
      .as[String].collect().toSet
    // batch q20 convention computed independently
    val expected = corpusDocs.toDF()
      .select(md5(trim(regexp_replace(lower(col("text")), "\\s+", " "))).as("h"))
      .distinct().as[String].collect().toSet
    hashes shouldBe expected
  }
}
