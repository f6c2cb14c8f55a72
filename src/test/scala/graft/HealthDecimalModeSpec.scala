package graft

import java.sql.Timestamp
import java.time.LocalDate

import graft.health.HealthPipeline
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** The opt-in DECIMAL monetary mode (SURVEY §7.4 extension): with
  * `spark.graft.decimalMoney=true` the medallion types every monetary
  * column DECIMAL(18,2) end-to-end — exact, order-independent cents
  * arithmetic — while the DEFAULT stays reference-faithful FLOAT64
  * (silver.sql:218,220,502-508). Values are pinned against an
  * independent decimal restatement straight off the raw seed CSVs, so
  * the mode is verified to change the TYPE and nothing else.
  */
class HealthDecimalModeSpec extends SparkSpec {

  private val fixtures = "/root/reference/data"
  private val configCsv = "/root/reference/configs/load_config.csv"
  private def haveFixtures = new java.io.File(fixtures).isDirectory

  test("decimal mode: DECIMAL(18,2) through silver and gold, values exact vs raw CSVs") {
    assume(haveFixtures, "reference fixtures not present")
    val t1 = Timestamp.valueOf("2025-01-15 05:00:00")
    spark.conf.set(HealthPipeline.DecimalMoneyKey, "true")
    try {
      val pipe = new HealthPipeline(spark, fixtures, configCsv, tmpDir("healthdec"), () => t1)
      val results = pipe.run(LocalDate.of(2025, 1, 15))
      results.map(_.status).distinct shouldBe Seq("SUCCESS")

      // silver: monetary columns are DECIMAL(18,2); keys/dates untouched
      val tx = pipe.silver("transactions")
      tx.schema("Amount").dataType shouldBe DecimalType(18, 2)
      tx.schema("PaidAmount").dataType shouldBe DecimalType(18, 2)
      val cl = pipe.silver("claims")
      Seq("ClaimAmount", "PaidAmount", "Deductible", "Coinsurance", "Copay")
        .foreach(c => cl.schema(c).dataType shouldBe DecimalType(18, 2))

      // values: exact equality with an independent decimal restatement
      // over the raw seed CSVs (staging conciliates but drops no rows —
      // quarantine only flags), proving the mode changes type, not data
      val rawSum = Seq("hospital-a", "hospital-b").map { h =>
        spark.read.option("header", "true")
          .csv(s"$fixtures/emr/$h/transactions.csv")
          .select(sum(expr("try_cast(Amount AS DECIMAL(18,2))")).as("s"))
          .head().getDecimal(0)
      }.reduce(_ add _)
      val silverSum = tx.select(sum(col("Amount")).as("s")).head().getDecimal(0)
      silverSum.compareTo(rawSum) shouldBe 0

      // gold: the marts preserve decimal through COALESCE + SUM/AVG
      // (sum widens precision but stays decimal — never silently double)
      val dp = pipe.gold("department_performance")
      dp.schema("TotalBilledAmount").dataType shouldBe a[DecimalType]
      dp.schema("AvgPaymentPerTransaction").dataType shouldBe a[DecimalType]
      val ph = pipe.gold("patient_history")
      ph.schema("BilledAmount").dataType shouldBe DecimalType(18, 2)
      ph.schema("ClaimAmount").dataType shouldBe DecimalType(18, 2)
    } finally spark.conf.unset(HealthPipeline.DecimalMoneyKey)
  }

  test("default mode stays double; flipping the mode over standing history is refused") {
    assume(haveFixtures, "reference fixtures not present")
    val t1 = Timestamp.valueOf("2025-01-15 05:00:00")
    val pipe = new HealthPipeline(spark, fixtures, configCsv, tmpDir("healthflt"), () => t1)
    pipe.run(LocalDate.of(2025, 1, 15)).map(_.status).distinct shouldBe Seq("SUCCESS")
    pipe.silver("transactions").schema("Amount").dataType shouldBe DoubleType
    pipe.gold("patient_history").schema("BilledAmount").dataType shouldBe DoubleType

    // flip decimalMoney over the float history: the SCD2 merge would
    // silently widen decimal staging back to double — the silver stage
    // must REFUSE instead (type drift is a migration, not a merge)
    spark.conf.set(HealthPipeline.DecimalMoneyKey, "true")
    try {
      val res = pipe.run(LocalDate.of(2025, 1, 16), sleep = _ => ())
      val silverStage = res.find(_.name == "silver").get
      silverStage.status shouldBe "FAILED"
      silverStage.error.get should include("decimalMoney")
      // standing history untouched — still the float-mode schema
      pipe.silver("transactions").schema("Amount").dataType shouldBe DoubleType
    } finally spark.conf.unset(HealthPipeline.DecimalMoneyKey)
  }
}
