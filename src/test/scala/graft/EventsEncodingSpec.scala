package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.sql.Timestamp

/** Pins the dual-encoding contract of `Tables.events` (Tables.scala).
  *
  * The driver has regenerated `events.parquet` with `ts` as parquet
  * TIMESTAMP(NANOS) (rounds ≤6) and TIMESTAMP(MICROS) (round 7+), and
  * may flip again. This spec WRITES fixtures in each resolved
  * encoding the loader branches on and asserts all of them produce
  * the same canonical session-UTC `TimestampType` instants, so a
  * future testdata regen can never silently zero the events family
  * again:
  *
  *  - LongType nanos: the exact dtype a TIMESTAMP(NANOS) file resolves
  *    to under `spark.sql.legacy.parquet.nanosAsLong=true` (Spark
  *    cannot WRITE nanos parquet, so the fixture writes the post-scan
  *    INT64 directly — same resolved schema, same branch).
  *  - TIMESTAMP_NTZ micros: what the round-7+ driver files resolve to.
  *  - TimestampType micros: the passthrough branch.
  *
  * The NTZ→Timestamp cast is value-preserving ONLY under a UTC session
  * time zone (ADVICE r7): the engine mains pin
  * `spark.sql.session.timeZone=UTC`, and this spec enforces that pin
  * as a contract rather than an accident of config.
  */
class EventsEncodingSpec extends SparkSpec {

  // 2024-03-01T12:34:56.789012 UTC and a second-boundary instant
  private val microsA = 1709296496789012L
  private val microsB = 1709300000000000L

  private def writeFixture(dir: String, tsCol: org.apache.spark.sql.Column): Unit = {
    import spark.implicits._
    Seq((microsA, "u1", "click"), (microsB, "u2", "view"))
      .toDF("us", "user_id", "action")
      .withColumn("ts", tsCol)
      .select("ts", "user_id", "action")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  private def loadInstants(dir: String): (DataTypeRef, Seq[Long]) = {
    val df = Tables.events(spark, dir)
    val dt = df.schema("ts").dataType
    val micros = df.select(unix_micros(col("ts"))).orderBy("unix_micros(ts)")
      .collect().map(_.getLong(0)).toSeq
    (DataTypeRef(dt), micros)
  }
  private case class DataTypeRef(dt: DataType)

  test("session time zone is pinned UTC (contract, not accident)") {
    spark.conf.get("spark.sql.session.timeZone") shouldBe "UTC"
  }

  test("LongType nanos encoding loads to canonical UTC TimestampType") {
    val dir = tmpDir("events-nanos")
    writeFixture(dir, (col("us") * 1000L).as("ts")) // nanos as INT64
    val (dt, micros) = loadInstants(dir)
    dt.dt shouldBe TimestampType
    micros shouldBe Seq(microsA, microsB)
  }

  test("TIMESTAMP_NTZ micros encoding loads to canonical UTC TimestampType") {
    val dir = tmpDir("events-ntz")
    writeFixture(dir, timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
    val (dt, micros) = loadInstants(dir)
    dt.dt shouldBe TimestampType
    micros shouldBe Seq(microsA, microsB)
  }

  test("TimestampType micros encoding passes through unchanged") {
    val dir = tmpDir("events-ts")
    writeFixture(dir, timestamp_micros(col("us")).as("ts"))
    val (dt, micros) = loadInstants(dir)
    dt.dt shouldBe TimestampType
    micros shouldBe Seq(microsA, microsB)
  }

  test("all three encodings agree bit-for-bit") {
    val dirs = Map(
      "nanos" -> ((col("us") * 1000L).as("ts")),
      "ntz"   -> timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"),
      "ts"    -> timestamp_micros(col("us")).as("ts"))
    val loaded = dirs.map { case (k, c) =>
      val dir = tmpDir(s"events-$k")
      writeFixture(dir, c)
      k -> loadInstants(dir)._2
    }
    loaded.values.toSet should have size 1
  }

  test("the live driver testdata loads (whatever its current encoding)") {
    val sfDir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$sfDir/events.parquet").exists(), s"$sfDir not present")
    val df = Tables.events(spark, sfDir)
    df.schema("ts").dataType shouldBe TimestampType
    df.limit(1).count() shouldBe 1L
  }
}
