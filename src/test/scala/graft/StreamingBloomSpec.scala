package graft

import graft.streaming.StreamingBloom
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Chunked-fold ≡ batch equality for the streaming Bloom filter: bits
  * merge by distinct-union under any chunking (Bloom's OR) and the
  * bit hashes are batch q221's, so the folded bitset must be
  * BIT-EQUAL to the batch bitset over the same rows; membership keeps
  * the one-sided no-false-negative guarantee — plus replay no-op and
  * chunk-order independence.
  */
class StreamingBloomSpec extends SparkSpec {
  import spark.implicits._

  private val chunks: Seq[Seq[(Long, String)]] = Seq(
    Seq((1L, "alpha beta gamma"), (2L, "beta delta")),
    Seq((3L, "epsilon alpha")),
    Seq((4L, "zeta beta eta"), (5L, "theta")))

  private def df(rows: Seq[(Long, String)]): DataFrame =
    rows.map { case (id, t) => (id, t, "en", "w") }
      .toDF("doc_id", "text", "lang", "source")

  private def batchBits: Set[Long] =
    df(chunks.flatten)
      .select(explode(split(trim(regexp_replace(lower(col("text")),
        "\\s+", " ")), " ")).as("t"))
      .distinct()
      .select(explode(graft.queries.Profiling.bloomBitArr(col("t"))).as("bit"))
      .distinct()
      .collect().map(_.getLong(0)).toSet

  test("chunked fold lands on the bit-equal batch bitset") {
    val dir = tmpDir("bloom")
    chunks.zipWithIndex.foreach { case (c, i) =>
      StreamingBloom.processBatch(spark, df(c), i.toLong, dir) shouldBe true
    }
    StreamingBloom.bits(spark, dir)
      .collect().map(_.getLong(0)).toSet shouldBe batchBits
  }

  test("chunk order does not matter; replay is a no-op") {
    val dir = tmpDir("bloom-order")
    chunks.reverse.zipWithIndex.foreach { case (c, i) =>
      StreamingBloom.processBatch(spark, df(c), i.toLong, dir) shouldBe true
    }
    StreamingBloom.bits(spark, dir)
      .collect().map(_.getLong(0)).toSet shouldBe batchBits
    StreamingBloom.processBatch(spark, df(chunks(0)), 1L, dir) shouldBe false
    StreamingBloom.bits(spark, dir)
      .collect().map(_.getLong(0)).toSet shouldBe batchBits
  }

  test("every inserted token hits (one-sided guarantee); fresh token misses") {
    val dir = tmpDir("bloom-q")
    chunks.zipWithIndex.foreach { case (c, i) =>
      StreamingBloom.processBatch(spark, df(c), i.toLong, dir)
    }
    val inserted = Seq("alpha", "beta", "gamma", "delta",
      "epsilon", "zeta", "eta", "theta")
    val answers = StreamingBloom
      .mightContain(spark, dir, inserted :+ "never-seen-token-xyzzy")
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    inserted.foreach(t => answers(t) shouldBe true)
    // 8 tokens × 4 bits in a 65536-bit filter: a specific fresh
    // token's 4 bits all colliding is deterministic-and-false here
    answers("never-seen-token-xyzzy") shouldBe false
  }
}
