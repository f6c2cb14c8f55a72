package graft

import graft.queries.Graph

/** The connected-components kernel behind q55: min-label propagation
  * with pointer doubling over an undirected pair list. The gate checks
  * q55 end-to-end against a recursive-CTE oracle; this spec pins the
  * kernel on adversarial topologies the corpus graph may not exhibit —
  * long chains (where pointer doubling earns its keep), reversed and
  * duplicated edges, self-loops, and multiple components.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def cc(pairs: (Long, Long)*): Map[Long, Long] =
    Graph.connectedComponents(pairs.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap

  test("a long chain collapses to its minimum node id") {
    val chain = (1L until 16L).map(i => (i, i + 1))
    cc(chain: _*) shouldBe (1L to 16L).map(_ -> 1L).toMap
  }

  test("multiple components, reversed and duplicate edges, self-loops") {
    val got = cc((5L, 2L), (2L, 5L), (2L, 9L), (9L, 9L), // {2,5,9} -> 2
      (30L, 40L), (40L, 30L), // {30,40} -> 30
      (7L, 7L)) // self-loop only: singleton component
    got shouldBe Map(5L -> 2L, 2L -> 2L, 9L -> 2L, 30L -> 30L, 40L -> 30L, 7L -> 7L)
  }

  test("star and bridge topologies: min label crosses the bridge") {
    // two stars centered at 10 and 50, bridged by (19, 51): one component
    val starA = (11L to 19L).map(i => (10L, i))
    val starB = (51L to 59L).map(i => (50L, i))
    val got = cc(starA ++ starB :+ (19L, 51L): _*)
    got.values.toSet shouldBe Set(10L)
    got.keySet shouldBe ((10L to 19L) ++ (50L to 59L)).toSet
  }

  test("empty pair list yields an empty labeling") {
    cc() shouldBe empty
  }

  test("durable-checkpoint mode (spark.graft.checkpointDir) agrees with local mode") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val local = cc((5L, 2L), (2L, 9L), (30L, 40L))
    spark.conf.set(graft.ops.Checkpoints.DirKey, dir)
    try {
      val durable = cc((5L, 2L), (2L, 9L), (30L, 40L))
      durable shouldBe local
      // reliable checkpoint() actually wrote partitions to the dir
      def files() = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      files() should be > 0L
      // owner-drawn boundary: checkpoint files are not GC'd by Spark,
      // releaseAll reclaims them once no checkpointed DF is still read
      graft.ops.Checkpoints.releaseAll(spark)
      files() shouldBe 0L
    } finally spark.conf.unset(graft.ops.Checkpoints.DirKey)
  }
}
