package graft

import graft.ops.SharedCache
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Pins the shared-cache lifecycle contract: registration persists
  * (MEMORY_AND_DISK), canonically-identical plans share ONE cache
  * entry, and releaseAll() actually frees the blocks — the boundary
  * a pipeline owner draws between stages so the dedup stage's
  * shingle/signature caches don't squat on executor memory while the
  * next stage runs.
  *
  * Assertions track the RDD ids THIS test creates, never global
  * storage counts: earlier suites release caches with
  * unpersist(blocking=false), whose async drain can change the global
  * count mid-test and made count-based assertions flaky.
  */
class SharedCacheSpec extends SparkSpec {

  private def storedIds: Set[Int] =
    spark.sparkContext.getRDDStorageInfo.map(_.id).toSet

  test("persist registers, materializes once, and releaseAll frees the blocks") {
    SharedCache.releaseAll() // isolate from any earlier suite state
    val before = storedIds

    val df = SharedCache.persist(
      spark.range(1000).select(col("id"), (col("id") * 2).as("v")))
    df.count() // materialize
    SharedCache.registered should be >= 1
    df.storageLevel should not be StorageLevel.NONE // in CacheManager
    val ours = storedIds -- before
    ours should not be empty

    SharedCache.releaseAll()
    SharedCache.registered shouldBe 0
    df.storageLevel shouldBe StorageLevel.NONE // dropped from CacheManager
    // unpersist(blocking=false) is async; poll until OUR blocks drain
    val deadline = System.nanoTime() + 10_000_000_000L
    while ((storedIds & ours).nonEmpty && System.nanoTime() < deadline)
      Thread.sleep(50)
    (storedIds & ours) shouldBe empty
  }

  test("canonically-identical plans dedupe to one cache entry (CacheManager)") {
    SharedCache.releaseAll()
    val before = storedIds
    def plan = spark.range(500).select((col("id") % 7).as("k"))
    val a = SharedCache.persist(plan)
    val b = SharedCache.persist(plan)
    a.count(); b.count()
    // two handles registered, but Spark holds ONE cached relation
    SharedCache.registered shouldBe 2
    (storedIds -- before).size shouldBe 1
    SharedCache.releaseAll()
  }
}
