package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Registry for the engine's SHARED persisted relations (the hashed
  * shingle sets, minhash signatures, scored candidate pairs, …) —
  * the intra-run CTE materializations that several queries probe.
  *
  * Why shared at all: Spark's CacheManager canonicalizes by logical
  * plan, so every query materializing the same relation over the same
  * dir shares ONE cache entry (q39/q71 reuse each other's shingle
  * sets; q100/q101 reuse q21's signatures). That sharing is the
  * design — recomputing the shingle relation per query would scan the
  * corpus once per consumer.
  *
  * Why a registry: a cache with no owner has no end of life. Every
  * shared persist in the query layer routes through [[persist]] so the
  * session owner can draw the boundary:
  *  - [[releaseAll]] unpersists everything registered — called between
  *    queries by `graft.Bench` in isolate mode, and by library users
  *    at pipeline-stage boundaries (after the dedup stage's consumers
  *    have all run, before the next stage wants the memory).
  *  - Storage level is MEMORY_AND_DISK: entries spill rather than
  *    evict-and-recompute, so the worst case under memory pressure is
  *    disk-read, not re-derivation.
  *  - The memory budget is the sum of the registered relations —
  *    hashes and ids only (48-bit shingle hashes, minhash bands,
  *    integer vectors), never document text, so each entry is a small
  *    multiple of the corpus's key space, not of the corpus. Measured
  *    footprint at sf0.1 is printed by `graft.Bench` (stderr, one line
  *    per cached relation) and recorded in README §limits.
  */
object SharedCache {
  private val entries = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]

  /** Persist `df` (MEMORY_AND_DISK) and register it for boundary
    * release. Re-registering a canonically-identical plan is a no-op
    * on the Spark side (CacheManager dedupes); the queue just holds
    * another handle to the same entry. Handles DO accumulate across
    * invocations (each pins its plan until released) — a long-lived
    * service must call [[releaseAll]] at its stage boundaries, which
    * is the registry's entire contract, not an optional nicety. */
  def persist(df: DataFrame): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    entries.add(p)
    p
  }

  /** Unpersist every registered relation and empty the registry.
    * Non-blocking: block eviction proceeds asynchronously. A handle
    * whose session has been stopped is dropped, not fatal — the
    * registry is JVM-global (it may hold entries from several
    * sessions), and one dead session must not strand the rest of the
    * queue registered. */
  def releaseAll(): Unit = {
    var df = entries.poll()
    while (df != null) {
      try df.unpersist(blocking = false)
      catch { case scala.util.control.NonFatal(_) => () }
      df = entries.poll()
    }
  }

  /** Registered handle count (diagnostics; may exceed the number of
    * distinct cache entries when plans canonicalize together). */
  def registered: Int = entries.size
}
