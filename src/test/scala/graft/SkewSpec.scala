package graft

import graft.ops.Skew
import org.apache.spark.sql.functions._

/** Pins the skew rewrites against their unsalted equivalents on a
  * deliberately skewed dataset (one key holding half the rows).
  */
class SkewSpec extends SparkSpec {

  import spark.implicits._

  private def skewed = {
    val hot = (1 to 5000).map(i => (1L, i.toLong))
    val tail = (1 to 5000).map(i => ((i % 97 + 2).toLong, i.toLong))
    (hot ++ tail).toDF("k", "v")
  }

  private def dim = (1L to 98L).map(k => (k, s"name$k")).toDF("k", "name")

  test("saltedJoin equals the plain join, inner and left") {
    val plainInner = skewed.join(dim, Seq("k"), "inner")
      .select("k", "v", "name").as[(Long, Long, String)].collect().sorted
    val saltedInner = Skew.saltedJoin(skewed, dim, Seq("k"), 8, "inner")
      .select("k", "v", "name").as[(Long, Long, String)].collect().sorted
    saltedInner shouldBe plainInner

    val missing = dim.filter($"k" =!= 1L) // hot key absent -> left nulls
    val plainLeft = skewed.join(missing, Seq("k"), "left")
      .select($"k", $"v", coalesce($"name", lit("-")))
      .as[(Long, Long, String)].collect().sorted
    val saltedLeft = Skew.saltedJoin(skewed, missing, Seq("k"), 8, "left")
      .select($"k", $"v", coalesce($"name", lit("-")))
      .as[(Long, Long, String)].collect().sorted
    saltedLeft shouldBe plainLeft
  }

  test("saltedJoin rejects small-preserving join types") {
    an[IllegalArgumentException] should be thrownBy
      Skew.saltedJoin(skewed, dim, Seq("k"), 8, "right")
  }

  test("saltedAgg equals the plain aggregate for sum/count/min/max") {
    val plain = skewed.groupBy("k")
      .agg(sum("v").as("s"), count(lit(1)).as("c"), min("v").as("mn"), max("v").as("mx"))
      .as[(Long, Long, Long, Long, Long)].collect().sorted
    val salted = Skew.saltedAgg(skewed, Seq("k"), 8,
      partial = Seq(sum("v").as("s"), count(lit(1)).as("c"),
        min("v").as("mn"), max("v").as("mx")),
      merge = Seq(sum("s").as("s"), sum("c").as("c"),
        min("mn").as("mn"), max("mx").as("mx")))
      .as[(Long, Long, Long, Long, Long)].collect().sorted
    salted shouldBe plain
  }

  test("the salted join actually spreads the hot key across salts") {
    val salts = Skew.saltedJoin(skewed.filter($"k" === 1L), dim, Seq("k"), 8)
      .count()
    salts shouldBe 5000L // all hot rows survive
    // distribution check: phase-1 of the salted agg produces >1 partial
    // row for the hot group (i.e. the salt really partitions it)
    val partials = skewed.filter($"k" === 1L)
      .withColumn("_salt", floor(rand(42) * 8).cast("int"))
      .select("_salt").distinct().count()
    partials should be > 1L
  }
}
