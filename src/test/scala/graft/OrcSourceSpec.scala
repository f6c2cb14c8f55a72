package graft

import graft.ingest.OrcSource
import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** Pins the ORC source: typed round-trip through Spark's vectorized
  * ORC reader, incremental watermark semantics identical to the
  * parquet path, and — the scale property — the watermark predicate
  * reaching the ORC scan as a pushed filter (stripe-level min/max
  * skipping at 100 TB).
  */
class OrcSourceSpec extends SparkSpec {

  private def ts(m: Long) = new Timestamp(1700000000000L + m * 60000L)

  private def writeFixture(dir: String): Unit = {
    import spark.implicits._
    Seq(
      (1L, "a", ts(0), 10.5),
      (2L, "b", ts(10), 20.0),
      (3L, "c", ts(20), 30.25))
      .toDF("id", "name", "updated_at", "amount")
      .repartition(1)
      .write.mode("overwrite").orc(s"$dir/t.orc")
  }

  test("typed round-trip: schema and values survive the ORC reader") {
    val dir = tmpDir("orc-src")
    writeFixture(dir)
    val df = new OrcSource(dir).read(spark, "t")
    df.schema.fieldNames.toSeq shouldBe Seq("id", "name", "updated_at", "amount")
    df.schema("updated_at").dataType.typeName shouldBe "timestamp"
    df.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(3)))
      .toSeq shouldBe Seq((1L, "a", 10.5), (2L, "b", 20.0), (3L, "c", 30.25))
  }

  test("incremental read filters strictly after the watermark") {
    val dir = tmpDir("orc-inc")
    writeFixture(dir)
    val got = new OrcSource(dir)
      .readIncremental(spark, "t", "updated_at", ts(10))
      .select("id").collect().map(_.getLong(0)).toSeq
    got shouldBe Seq(3L) // strictly newer than the watermark row
  }

  test("the watermark predicate is pushed to the ORC scan") {
    val dir = tmpDir("orc-push")
    writeFixture(dir)
    val plan = new OrcSource(dir)
      .readIncremental(spark, "t", "updated_at", ts(10))
      .queryExecution.executedPlan.toString
    plan should include("PushedFilters: [")
    plan should include("GreaterThan(updated_at")
  }
}
