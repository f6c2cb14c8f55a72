package graft

import org.apache.spark.sql.functions._

/** Fixture pins for the round-8 operator family (q121–q126): each
  * operator's core semantics on a tiny hand-checkable input, written
  * as real parquet table dirs so the gated query functions run
  * unchanged (the oracle gate checks them against DuckDB on the
  * driver testdata; these specs check the MATH on inputs where the
  * expected answer is derivable by hand).
  */
class Round8OpsSpec extends SparkSpec {
  import spark.implicits._

  // -- q121 core: triangle counting ----------------------------------

  test("triangleStats: K4 is fully clustered, a path has no triangles") {
    // K4 on nodes 1..4 (6 edges): every node has deg 3 and sits in 3
    // triangles => clustering_e6 = 2*3*1e6/(3*2) = 1e6 exactly
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("x", "y")
    val r = graft.queries.Graph.triangleStats(k4)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    r.keySet shouldBe Set(1L, 2L, 3L, 4L)
    r.values.foreach(_ shouldBe ((3L, 3L, 1000000L)))

    // path 1-2-3: no triangle anywhere, middle node deg 2
    val path = Seq((1L, 2L), (2L, 3L)).toDF("x", "y")
    val p = graft.queries.Graph.triangleStats(path)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    p(2L) shouldBe ((2L, 0L, 0L))
    p(1L) shouldBe ((1L, 0L, 0L))
  }

  test("triangleStats counts a triangle exactly once per corner") {
    // triangle 1-2-3 plus pendant 3-4: nodes 1,2,3 in exactly one
    // triangle each; 4 in none. Degree ordering must not double-count
    // or drop the wedge at the (deg,id)-lowest corner.
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("x", "y")
    val r = graft.queries.Graph.triangleStats(g)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    r shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 0L)
  }

  // -- q122: EWMA ----------------------------------------------------

  test("q122 EWMA: adaptive head weights and exact integer math") {
    val dir = tmpDir("ewma")
    Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 7L, 1.00, "{}", "a"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), 7L, 3.00, "{}", "a"))
      .toDF("event_id", "ts", "user_id", "value", "props", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = graft.queries.EventAnalytics.q122EwmaSmooth(spark, dir)
      .orderBy("event_id").select("ewma_e2").as[Long].collect()
    // row1: only itself => 100; row2: (128*300 + 64*100) div 192 = 233
    r shouldBe Array(100L, 233L)
  }

  // -- q123: MAD outliers --------------------------------------------

  test("q123 flags the whale the median/MAD cannot be dragged by") {
    val dir = tmpDir("mad")
    Seq(
      (1L, "SEG", 0, 100.00), (2L, "SEG", 0, 110.00), (3L, "SEG", 0, 120.00),
      (4L, "SEG", 0, 130.00), (5L, "SEG", 0, 10000.00))
      .toDF("c_custkey", "c_mktsegment", "c_nationkey", "c_acctbal")
      .withColumn("c_name", concat(lit("c"), col("c_custkey")))
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val rows = graft.queries.Analytics.q123MadOutliers(spark, dir)
      .select("c_custkey", "is_outlier").as[(Long, Boolean)].collect().toMap
    // median = 120e2, adevs (e2) = [2000,1000,0,1000,988000], MAD = 1000
    rows.filter(_._2).keySet shouldBe Set(5L)
  }

  // -- q124: PMI collocations ----------------------------------------

  test("q124 surfaces the bound phrase, drops sub-threshold bigrams") {
    val dir = tmpDir("pmi")
    Seq(
      (1L, "new york new york new york new york new york new york", "en", "s", 1L),
      (2L, "alpha beta gamma delta epsilon zeta eta theta", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = graft.queries.Relevance.q124PmiCollocations(spark, dir)
      .select("w1", "w2", "n_ab").as[(String, String, Long)].collect()
    // only new>york (6) and york>new (5) clear the ≥5 floor; filler
    // bigrams occur once each
    r.map(t => (t._1, t._2)).toSet shouldBe Set(("new", "york"), ("york", "new"))
    r.find(t => t._1 == "new").get._3 shouldBe 6L
  }

  // -- q125: sorted-neighborhood linkage -----------------------------

  test("q125 links same-name neighbors, skips disjoint names and brands") {
    val dir = tmpDir("linkage")
    Seq(
      (1L, "red widget", "Brand#1", "t", 1, 1.0),
      (2L, "red widget", "Brand#1", "t", 1, 1.0),
      (3L, "blue bolt", "Brand#1", "t", 1, 1.0),
      (4L, "red widget", "Brand#2", "t", 1, 1.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val r = graft.queries.NearDup.q125BlockedLinkage(spark, dir)
      .select("part_a", "part_b", "jac_e3").as[(Long, Long, Long)].collect()
    // identical names in Brand#1 pair at jaccard 1000; "blue bolt"
    // shares no word (would be 0 < threshold); Brand#2 never crosses
    // the block boundary
    r.toSet shouldBe Set((1L, 2L, 1000L))
  }

  // -- q127: OHLC bars -----------------------------------------------

  test("q127 endpoints follow (ts, event_id) order, extrema are free") {
    val dir = tmpDir("ohlc")
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:01")
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 10:20:00")
    val t2 = java.sql.Timestamp.valueOf("2024-01-01 10:40:00")
    Seq((1L, t0, 7L, 5.00, "{}", "click"), (2L, t1, 7L, 9.00, "{}", "click"),
      (3L, t2, 7L, 2.00, "{}", "click"))
      .toDF("event_id", "ts", "user_id", "value", "props", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = graft.queries.EventAnalytics.q127OhlcBars(spark, dir)
      .select("open_e2", "high_e2", "low_e2", "close_e2", "n_events")
      .as[(Long, Long, Long, Long, Long)].collect()
    r shouldBe Array((500L, 900L, 200L, 200L, 3L))
  }

  // -- q128: priority sample -----------------------------------------

  test("q128 priorities are the pure hash/weight function, ascending") {
    val r = SparkEntry.queries("q128_priority_sample")(spark, "/root/testdata/sf0.001")
      .select("doc_id", "n_chars", "priority").as[(Long, Long, Long)].collect()
    r.length shouldBe 200
    // recompute each winner's priority from first principles
    val md = java.security.MessageDigest.getInstance("MD5")
    r.foreach { case (id, nc, p) =>
      val hex = md.digest(s"prio$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
      p shouldBe java.lang.Long.parseLong(hex, 16) / math.max(nc, 1L)
    }
    r.map(_._3).toSeq shouldBe r.map(_._3).sorted.toSeq
  }

  // -- q129: HLL -----------------------------------------------------

  test("q129 registers and estimate match a from-scratch replica") {
    val dir = tmpDir("hll")
    val users = (1L to 300L)
    val t = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    users.map(u => (u, t, u, 1.0, "{}", "click")).toSeq
      .toDF("event_id", "ts", "user_id", "value", "props", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val md = java.security.MessageDigest.getInstance("MD5")
    val regs = new Array[Long](16)
    users.foreach { u =>
      val hex = md.digest(s"hll$u".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
      val h = java.lang.Long.parseLong(hex, 16)
      val b = (h >> 44).toInt
      val w = h & ((1L << 44) - 1)
      val rho = if (w == 0) 45L else 45L - java.lang.Long.toBinaryString(w).length
      regs(b) = math.max(regs(b), rho)
    }
    val s45 = regs.map(r => 1L << (45 - r)).sum
    val expected = (673L * 256L * (1L << 45) / 1000L) / s45
    val row = graft.queries.Profiling.q129HllDistinct(spark, dir)
      .select("est_users", "n_users").as[(Long, Long)].head()
    row shouldBe ((expected, 300L))
  }

  // -- q126: Pareto frontier -----------------------------------------

  test("q126 keeps exactly the non-dominated (size, price) points") {
    val dir = tmpDir("pareto")
    Seq(
      (1L, "n", "B#1", "t", 1, 1.00), // dominated: 2 is larger and cheaper
      (2L, "n", "B#1", "t", 2, 0.90), // pareto
      (3L, "n", "B#1", "t", 2, 0.95), // dominated at same size by 2
      (4L, "n", "B#1", "t", 3, 1.20)) // pareto (largest)
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val r = graft.queries.Analytics.q126ParetoFrontier(spark, dir)
      .select("p_partkey", "is_pareto").as[(Long, Boolean)].collect().toMap
    r shouldBe Map(1L -> false, 2L -> true, 3L -> false, 4L -> true)
  }
}
