package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch experiment for the r14-verdict registry-pressure question:
  * does a large SharedCache registry (≈60 live CacheManager entries)
  * measurably tax a plan-heavy query's planning (canonicalization
  * lookups are linear in live entries)? Times q90_pagerank with an
  * EMPTY registry, then with N synthetic cached relations (distinct
  * multi-operator plans over lineitem, materialized), then with 2N.
  * Not a driver surface — run once, record, delete. */
object RegistryProbe {
  private def touch(df: DataFrame): Unit = {
    val h = xxhash64(df.columns.map(col).toSeq: _*)
    df.select(h.as("h")).agg(sum("h")).collect()
    ()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val q90 = SparkEntry.queries("q90_pagerank")
    def timed(): Double = {
      val t0 = System.nanoTime()
      touch(q90(spark, sfDir))
      (System.nanoTime() - t0) / 1e9
    }
    def best3(label: String): Unit = {
      val ts = (1 to 3).map(_ => timed())
      println(f"[probe] $label q90 best=${ts.min}%.3f all=${ts.map(t => f"$t%.3f").mkString(",")} " +
        s"registry=${graft.ops.SharedCache.registered}")
    }

    timed(); timed() // JIT warmup, discard
    graft.ops.SharedCache.releaseAll(); graft.ops.Checkpoints.releaseAll(spark)
    spark.catalog.clearCache()
    best3("empty-registry")

    def dummies(from: Int, until: Int): Unit = (from until until).foreach { i =>
      val d = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .filter(col("l_quantity") > (i % 47))
        .groupBy((col("l_suppkey") + i).as("k"))
        .agg(sum(col("l_extendedprice")).as(s"s$i"), count(lit(1)).as("c"))
        .withColumn("r", col(s"s$i") % (i + 2))
      touch(graft.ops.SharedCache.persist(d))
    }
    dummies(0, 60)
    best3("registry-60")
    dummies(60, 120)
    best3("registry-120")

    graft.ops.SharedCache.releaseAll()
    spark.catalog.clearCache()
    best3("released")
    spark.stop()
  }
}
