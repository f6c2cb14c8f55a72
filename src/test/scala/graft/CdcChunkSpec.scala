package graft

import graft.queries.Curation
import org.apache.spark.sql.functions._

/** Pins the properties that make content-defined chunking (q109) the
  * shift-robust dedup primitive — exact coverage of the document, and
  * boundary re-alignment after an inserted prefix (the property a
  * fixed-stride chunker like q59's structurally lacks: there one
  * inserted char shifts every later chunk hash).
  */
class CdcChunkSpec extends SparkSpec {

  import spark.implicits._

  /** Deterministic aperiodic text: concatenated md5 hex blocks (a
    * periodic string would make every gram hash periodic too, cutting
    * everywhere or nowhere). */
  private def blob(seed: String, blocks: Int): String =
    (0 until blocks).map { i =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"$seed-$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }.mkString

  test("chunks tile the document exactly; short docs emit one terminal chunk") {
    val docs = Seq((1L, blob("cover", 40), "web"), (2L, "tiny", "web"))
      .toDF("doc_id", "text", "source")
    val got = Curation.cdcChunks(docs)
      .groupBy("doc_id")
      .agg(sum("ch_len").as("chars"), count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    got(1L)._1 shouldBe 40L * 32 // lengths sum back to the doc length
    got(1L)._2 should be > 1L // a ~1.3k-char doc really cuts
    got(2L) shouldBe ((4L, 1L)) // shorter than W: just the terminal chunk
  }

  test("boundaries realign after an inserted prefix (shift invariance)") {
    val shared = blob("shared", 40) // ~20 expected cuts at div=64
    val shifted = "PREFIX-" + blob("noise", 2) + shared
    val docs = Seq((1L, shared, "w"), (2L, shifted, "w"))
      .toDF("doc_id", "text", "source")
    val chunks = Curation.cdcChunks(docs).collect()
    val hA = chunks.filter(_.getLong(0) == 1L).map(_.getString(2)).toSet
    val hB = chunks.filter(_.getLong(0) == 2L).map(_.getString(2)).toSet
    // Grams are local (W chars), so every cut of doc 1 at position i
    // reappears in doc 2 at prefixLen + i; only doc 1's FIRST chunk
    // (left edge pinned to the doc start) may lack a verbatim twin.
    (hA diff hB).size should be <= 1
    hA.size should be > 5 // the overlap claim is about many chunks, not 1-2
  }
}
