package graft

import graft.ops.Compaction

/** Pins compaction: file count shrinks to the size target, contents
  * are byte-identical, and missing/empty dirs are no-ops.
  */
class CompactionSpec extends SparkSpec {

  import spark.implicits._

  test("compaction merges many small files without changing contents") {
    val dir = tmpDir("compact") + "/t"
    val df = (1L to 10000L).map(i => (i, s"row-$i")).toDF("id", "s")
    df.repartition(40).write.parquet(dir)

    val before = new java.io.File(dir).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    before shouldBe 40

    val totalBytes = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    val n = Compaction.compactParquet(spark, dir, totalBytes / 4 + 1)
    n should (be >= 1 and be <= 5)

    val after = new java.io.File(dir).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    after shouldBe n

    spark.read.parquet(dir).as[(Long, String)].collect().sorted shouldBe
      (1L to 10000L).map(i => (i, s"row-$i")).toArray
  }

  test("missing directory is a 0-file no-op") {
    Compaction.compactParquet(spark, tmpDir("compact-none") + "/absent", 1024) shouldBe 0
  }
}
