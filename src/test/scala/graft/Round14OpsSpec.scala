package graft

import org.apache.spark.sql.functions._

/** Round-14 operator pins (r13 verdict items). */
class Round14OpsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def haveData = new java.io.File(s"$sfDir/documents.parquet").exists()

  test("kmCentroidBudget: exact boundary passes, one past it fails loudly") {
    val cap = graft.queries.NearDup.KmCentroidLiteralCap
    // the sf-scale working points are far inside the cap
    noException should be thrownBy
      graft.queries.NearDup.kmCentroidBudget(1000L, 64L)
    // exact boundary is allowed (the cap is a ceiling, not a fence)
    noException should be thrownBy
      graft.queries.NearDup.kmCentroidBudget(cap / 64L, 64L)
    // one centroid past it fails loudly and names the remediation
    val e = the[IllegalStateException] thrownBy
      graft.queries.NearDup.kmCentroidBudget(cap / 64L + 1L, 64L)
    e.getMessage should include("KmCentroidLiteralCap")
    e.getMessage should include("broadcast equi-join")
  }

  test("the cap sits far above every test-scale K·dim working point") {
    // N = 10⁸ vectors (well past sf1.0) → K = ⌈√N⌉ = 10⁴, dim 64 →
    // 6.4×10⁵ literal values: still under the 2²¹ cap. The ceiling
    // binds only at true 100-TB vector counts, as declared.
    val k = math.ceil(math.sqrt(1e8)).toLong
    noException should be thrownBy
      graft.queries.NearDup.kmCentroidBudget(k, 64L)
    (k * 64L) should be < graft.queries.NearDup.KmCentroidLiteralCap
  }

  test("q265 migration manifest: conservation + lcm fan-out structure") {
    assume(haveData, s"$sfDir not present")
    val m = graft.queries.Curation.defs("q265_state_migration")(spark, sfDir)
      .collect()
    m should not be empty
    val migrated = m.filter(_.getString(0) == "m")
    val landed = m.filter(_.getString(0) == "i")
    // entry-count conservation: the manifest's 'm' rows restate the
    // old state exactly (recomputed independently here)
    val stateN = Tables.documents(spark, sfDir)
      .select(md5(trim(regexp_replace(lower(col("text")), "\\s+", " ")))
        .as("ch"), substring(col("source"), 4, 10).cast("int").as("si"))
      .filter(col("si") < 10).select("ch").distinct().count()
    migrated.map(_.getLong(3)).sum shouldBe stateN
    // landed rows are fresh inserts: bucket_old is NULL, buckets in range
    landed.foreach { r =>
      r.isNullAt(1) shouldBe true
      r.getLong(2) should (be >= 0L and be < 24L)
    }
    // modular structure: h%16 and h%24 are both functions of h%48, so
    // an old bucket ships to AT MOST lcm/16 = 3 new buckets and a new
    // bucket receives from at most lcm/24 = 2 old ones
    migrated.groupBy(_.getLong(1)).foreach { case (_, rows) =>
      rows.map(_.getLong(2)).distinct.length should be <= 3
    }
    migrated.groupBy(_.getLong(2)).foreach { case (_, rows) =>
      rows.map(_.getLong(1)).distinct.length should be <= 2
    }
    // fingerprint conservation: XOR over the 'm' cells equals the old
    // state's root fingerprint (order-free, the q164 Merkle identity)
    val root = Tables.documents(spark, sfDir)
      .select(md5(trim(regexp_replace(lower(col("text")), "\\s+", " ")))
        .as("ch"), substring(col("source"), 4, 10).cast("int").as("si"))
      .filter(col("si") < 10).select("ch").distinct()
      .select(conv(substring(col("ch"), 1, 12), 16, 10).cast("long").as("h48"))
      .agg(expr("bit_xor(h48)")).head.getLong(0)
    migrated.map(_.getLong(4)).reduce(_ ^ _) shouldBe root
  }

  test("q266: consistent ring beats modulo exactly where the theory says") {
    assume(haveData, s"$sfDir not present")
    val rows = graft.queries.Curation.defs("q266_reshard_policy")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(4)).toMap
    rows should have size 4
    // +1 node: modulo re-keys nearly everything (~16/17), the ring
    // moves only the new node's share (~1/17). The measured gap is the
    // whole reason consistent hashing exists.
    rows(("modulo", 17L)) should be > 800000L
    rows(("ring", 17L)) should be < 200000L
    // same-factor bump 16→24: modulo moves the 2/3 of keys whose
    // h mod 48 residue is not preserved; the ring moves ~8/24 = 1/3
    rows(("modulo", 24L)) should (be > 550000L and be < 780000L)
    rows(("ring", 24L)) should (be > 200000L and be < 470000L)
    // and the ring never loses to modulo at either size
    rows(("ring", 17L)) should be < rows(("modulo", 17L))
    rows(("ring", 24L)) should be < rows(("modulo", 24L))
  }

  test("q267: more vnodes tighten the arc-share distribution (Karger balance)") {
    assume(haveData, s"$sfDir not present")
    val rows = graft.queries.Curation.defs("q267_ring_balance")(spark, sfDir)
      .collect()
    rows should have size 48 // 24 buckets × {V=8, V=64}
    def arcsOf(cfg: Long) = rows.filter(_.getLong(0) == cfg).map(_.getLong(3))
    val (a8, a64) = (arcsOf(8L), arcsOf(64L))
    // shares are exact ppm of the 2^48 ring: sum to 1e6 minus ≤1 ppm
    // floor loss per bucket
    a8.sum should (be > 999976L - 24L and be <= 1000000L)
    a64.sum should (be > 999976L - 24L and be <= 1000000L)
    // the balance theorem, measured: V=64's worst bucket owns LESS of
    // the ring than V=8's worst, and its best owns more (tighter both
    // ways around the ideal 1/24 ≈ 41667 ppm)
    a64.max should be < a8.max
    a64.min should be > a8.min
    // every point set is complete and the observed keys all route
    rows.filter(_.getLong(0) == 8L).foreach(_.getLong(2) shouldBe 8L)
    rows.filter(_.getLong(0) == 64L).foreach(_.getLong(2) shouldBe 64L)
    val keyTotals = rows.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(4)).sum)
    keyTotals(8L) shouldBe keyTotals(64L)
  }
}
