package graft

import graft.functions.{GraftExtensions, VectorFunctions}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Pins the custom Catalyst dot-product expressions against the
  * aggregate(zip_with(...)) composition they replaced — value equality
  * (including IEEE accumulation order for doubles), null propagation,
  * SQL-text invocation, and the extensions injection path.
  */
class VectorExpressionsSpec extends SparkSpec {

  private def composedL = (a: String, b: String) =>
    aggregate(zip_with(col(a), col(b), (x, y) => x * y), lit(0L), (acc, x) => acc + x)
  private def composedD = (a: String, b: String) =>
    aggregate(zip_with(col(a), col(b), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  test("dotLong equals the composed fold, including negatives and empties") {
    import spark.implicits._
    VectorFunctions.register(spark)
    val df = Seq(
      (Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),
      (Seq(-7L, 0L, 9L), Seq(3L, -2L, 11L)),
      (Seq.empty[Long], Seq.empty[Long]),
      (Seq(Long.MaxValue, 1L), Seq(1L, 0L))).toDF("a", "b")
    val got = df.select(VectorFunctions.dotLong($"a", $"b")).as[Long].collect()
    val want = df.select(composedL("a", "b")).as[Long].collect()
    got shouldBe want
    got(0) shouldBe 32L
    got(2) shouldBe 0L
  }

  test("dotDouble matches the composed fold bit-for-bit (same accumulation order)") {
    import spark.implicits._
    VectorFunctions.register(spark)
    // values chosen so a different summation order WOULD change the result
    val df = Seq(
      (Seq(1e16, 1.0, -1e16), Seq(1.0, 1.0, 1.0)),
      (Seq(0.1, 0.2, 0.3), Seq(0.3, 0.2, 0.1))).toDF("a", "b")
    val got = df.select(VectorFunctions.dotDouble($"a", $"b")).as[Double].collect()
    val want = df.select(composedD("a", "b")).as[Double].collect()
    got.map(java.lang.Double.doubleToLongBits) shouldBe
      want.map(java.lang.Double.doubleToLongBits)
  }

  test("mismatched array lengths throw instead of silently truncating") {
    import spark.implicits._
    VectorFunctions.register(spark)
    val df = Seq((Seq(1L, 2L, 3L), Seq(4L, 5L))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(VectorFunctions.dotLong($"a", $"b")).collect()
    }
    e.getMessage should include("lengths differ")
  }

  test("null array yields null; registry path works from SQL text") {
    VectorFunctions.register(spark)
    spark.sql(
      "SELECT graft_dot_long(CAST(NULL AS ARRAY<BIGINT>), array(1L, 2L)) AS d")
      .collect().head.isNullAt(0) shouldBe true
    spark.sql("SELECT graft_dot_long(array(2L, 3L), array(10L, 100L)) AS d")
      .collect().head.getLong(0) shouldBe 320L
  }

  test("GraftExtensions injects the functions at session build") {
    val s2 = SparkSession.builder()
      .master("local[1]")
      .appName("graft-ext-test")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try
      s2.sql("SELECT graft_dot_double(array(1.5d, 2.0d), array(2.0d, 3.0d)) AS d")
        .collect().head.getDouble(0) shouldBe 9.0
    finally () // shared JVM: don't stop the session other specs may hold
  }

  test("DotProductRewrite fuses the declarative fold; non-dot folds are left alone") {
    import spark.implicits._
    val prior = spark.experimental.extraOptimizations
    val priorAnsi = spark.conf.get("spark.sql.ansi.enabled")
    // the rule only fires on LEGACY arithmetic (under ANSI the composed
    // fold throws on overflow, the fused loop wraps — semantics differ)
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.experimental.extraOptimizations = prior :+ graft.functions.DotProductRewrite
    try {
      val df = spark.range(1, 4)
        .select(array(col("id"), col("id") + 1).as("a"),
          array(col("id") * 2, col("id")).as("b"))
        .select(expr(
          "aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (s, x) -> s + x)").as("d"))
      df.queryExecution.optimizedPlan.toString should include("graft_dot_long")
      df.as[Long].collect().sorted shouldBe Array(4L, 14L, 30L)

      val dd = spark.range(1, 3)
        .select(array(col("id").cast("double"), lit(0.5)).as("a"),
          array(lit(2.0), col("id").cast("double")).as("b"))
        .select(expr(
          "aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (s, x) -> s + x)").as("d"))
      dd.queryExecution.optimizedPlan.toString should include("graft_dot_double")
      dd.as[Double].collect().sorted shouldBe Array(2.5, 5.0)

      // zero != 0 is some other fold — must NOT rewrite, must still run
      val other = spark.range(1, 3)
        .select(array(col("id")).as("a"), array(col("id")).as("b"))
        .select(expr(
          "aggregate(zip_with(a, b, (x, y) -> x * y), 1L, (s, x) -> s + x)").as("d"))
      (other.queryExecution.optimizedPlan.toString should not).include("graft_dot_long")
      other.as[Long].collect().sorted shouldBe Array(2L, 5L)
    } finally {
      spark.experimental.extraOptimizations = prior
      spark.conf.set("spark.sql.ansi.enabled", priorAnsi)
    }
  }

  test("the expression is codegen'd (no fallback to interpreted eval)") {
    import spark.implicits._
    VectorFunctions.register(spark)
    // non-foldable input (built from the range value) so the optimizer
    // can't constant-fold the whole query into a LocalTableScan
    val df = spark.range(1, 4)
      .select(array(col("id"), col("id") + 1).as("a"), array(col("id") * 2, col("id")).as("b"))
      .select(VectorFunctions.dotLong($"a", $"b").as("d"))
    // `*(1)` is the WholeStageCodegen stage marker: the Project holding
    // graft_dot_long compiled into generated code, no interpreted fallback
    val plan = df.queryExecution.executedPlan.toString
    plan should include("*(1) Project [graft_dot_long")
    // id=1: [1,2]·[2,1] = 4; id=2: [2,3]·[4,2] = 14; id=3: [3,4]·[6,3] = 30
    df.as[Long].collect().sorted shouldBe Array(4L, 14L, 30L)

    // same through the double codegen path (non-foldable input again)
    val dd = spark.range(1, 3)
      .select(array(col("id").cast("double"), lit(0.5)).as("a"),
        array(lit(2.0), col("id").cast("double")).as("b"))
      .select(VectorFunctions.dotDouble($"a", $"b").as("d"))
    dd.queryExecution.executedPlan.toString should include("*(1) Project [graft_dot_double")
    // id=1: [1,0.5]·[2,1] = 2.5; id=2: [2,0.5]·[2,2] = 5.0
    dd.as[Double].collect().sorted shouldBe Array(2.5, 5.0)
  }
}
