package graft

import graft.streaming.StreamingMerkle
import org.apache.spark.sql.functions._

/** Pins the streaming Merkle fingerprint maintenance against batch
  * q164: folding the orders table in chunks (out-of-order, with a
  * replay) must leave [[StreamingMerkle.fingerprints]] EXACTLY equal
  * to batch q164 over the same rows — XOR's group structure makes the
  * fold order-free, and the q164 oracle transitively verifies the
  * shared digest path. */
class StreamingMerkleSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def haveData = new java.io.File(s"$sfDir/orders.parquet").exists()

  private def canon(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.mkString("")).toSet

  test("chunked out-of-order fold + replay equals batch q164") {
    assume(haveData, s"$sfDir not present")
    val stateDir = tmpDir("merkle-state") + "/leaves"
    val orders = Tables.orders(spark, sfDir)
    val chunks = Seq(0, 1, 2).map(i => orders.filter(col("o_orderkey") % 3 === i))

    StreamingMerkle.processBatch(spark, chunks(1), 1L, stateDir) shouldBe true
    StreamingMerkle.processBatch(spark, chunks(2), 2L, stateDir) shouldBe true
    StreamingMerkle.processBatch(spark, chunks(0), 0L, stateDir) shouldBe true
    // replay: provable no-op
    StreamingMerkle.processBatch(spark, chunks(2), 2L, stateDir) shouldBe false

    canon(StreamingMerkle.fingerprints(spark, stateDir)) shouldBe
      canon(graft.queries.Profiling.q164MerkleFingerprint(spark, sfDir))
  }
}
