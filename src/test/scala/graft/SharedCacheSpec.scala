package graft

import graft.ops.SharedCache
import org.apache.spark.sql.functions._

/** Pins the shared-cache lifecycle contract: registration persists
  * (MEMORY_AND_DISK), canonically-identical plans share ONE cache
  * entry, and releaseAll() actually frees the blocks — the boundary
  * a pipeline owner draws between stages so the dedup stage's
  * shingle/signature caches don't squat on executor memory while the
  * next stage runs. */
class SharedCacheSpec extends SparkSpec {

  test("persist registers, materializes once, and releaseAll frees the blocks") {
    SharedCache.releaseAll() // isolate from any earlier suite state
    val before = spark.sparkContext.getRDDStorageInfo.length

    val df = SharedCache.persist(
      spark.range(1000).select(col("id"), (col("id") * 2).as("v")))
    df.count() // materialize
    SharedCache.registered should be >= 1
    spark.sparkContext.getRDDStorageInfo.length should be > before

    SharedCache.releaseAll()
    SharedCache.registered shouldBe 0
    // unpersist(blocking=false) is async; poll briefly for drain
    val deadline = System.nanoTime() + 10_000_000_000L
    while (spark.sparkContext.getRDDStorageInfo.length > before &&
      System.nanoTime() < deadline) Thread.sleep(50)
    spark.sparkContext.getRDDStorageInfo.length shouldBe before
  }

  test("canonically-identical plans dedupe to one cache entry (CacheManager)") {
    SharedCache.releaseAll()
    val before = spark.sparkContext.getRDDStorageInfo.length
    def plan = spark.range(500).select((col("id") % 7).as("k"))
    val a = SharedCache.persist(plan)
    val b = SharedCache.persist(plan)
    a.count(); b.count()
    // two handles registered, but Spark holds ONE cached relation
    SharedCache.registered shouldBe 2
    spark.sparkContext.getRDDStorageInfo.length shouldBe (before + 1)
    SharedCache.releaseAll()
  }
}
