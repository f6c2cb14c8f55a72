package graft

/** Regression pin for the Tables.withMinParallelism probe: forcing
  * `.rdd` on the SAME DataFrame object whose logical plan a caller
  * later composes into a self-join corrupted attribute binding on the
  * FIRST execution in a session (Spark 4
  * INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND, reproduced via q114's
  * index/query two-scan shape; second executions passed because the
  * partition-count memo skipped the probe). The probe now runs on a
  * throwaway re-read — this spec pins exactly the failing shape: the
  * first embedding-table self-join query on a session with an EMPTY
  * partition-count memo must succeed on its first execution.
  * `newSession()` gives fresh session state (and a fresh memo key —
  * the memo is keyed by session) while sharing the test JVM's
  * SparkContext, which must NOT be stopped mid-suite.
  */
class FirstExecutionBindingSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def haveData = new java.io.File(s"$sfDir/embeddings.parquet").exists()

  test("q114 succeeds on its FIRST execution on a fresh session") {
    assume(haveData, s"$sfDir not present")
    val fresh = spark.newSession()
    fresh.conf.set("spark.sql.session.timeZone", "UTC")
    graft.queries.NearDup.defs("q114_ann_ivf_pq")(fresh, sfDir)
      .count() should be > 0L
  }
}
