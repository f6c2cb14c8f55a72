package graft

import graft.queries.NearDup

/** Pins q110's maximal-span contract on constructed corpora: a region
  * of length L ≥ 32 shared verbatim by two docs — at DIFFERENT
  * offsets — surfaces in each as exactly ONE span of exactly L chars;
  * clean docs report zeros; intra-doc repetition counts too.
  */
class ExactSubstrSpec extends SparkSpec {

  import spark.implicits._

  private def blob(seed: String, blocks: Int): String =
    (0 until blocks).map { i =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"$seed-$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }.mkString

  private def spansOf(rows: Seq[(Long, String)]): Map[Long, (Long, Long, Long)] =
    NearDup.exactSubstrSpans(
      rows.toDF("doc_id", "text").withColumn(
        "source", org.apache.spark.sql.functions.lit("t")))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("a shared region at different offsets is one exact-length span in each doc") {
    val shared = blob("dup", 4) // L = 128 ≥ W
    val a = blob("left", 8) + shared + blob("right", 8)
    val b = blob("other", 3) + shared // different offset, different tail-less layout
    val clean = blob("clean", 12)
    val got = spansOf(Seq((1L, a), (2L, b), (3L, clean)))
    got(1L) shouldBe ((1L, 128L, 128L)) // one span, exactly the 128 shared chars
    got(2L) shouldBe ((1L, 128L, 128L))
    got(3L) shouldBe ((0L, 0L, 0L))
  }

  test("intra-document repetition is duplicated text too") {
    val piece = blob("twice", 2) // 64 chars, repeated inside ONE doc
    val doc = piece + blob("gap", 4) + piece
    val got = spansOf(Seq((1L, doc), (2L, blob("noise", 6))))
    got(1L)._1 shouldBe 2L // both occurrences surface
    got(1L)._2 shouldBe 128L // 2 × 64 duplicated chars
    got(2L) shouldBe ((0L, 0L, 0L))
  }

  test("docs shorter than the gram width never match") {
    val got = spansOf(Seq((1L, "short text"), (2L, "short text")))
    got(1L) shouldBe ((0L, 0L, 0L))
    got(2L) shouldBe ((0L, 0L, 0L))
  }
}
