package graft.ingest

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pluggable source abstraction replacing the reference's JDBC extract
  * (SURVEY §2.1 S1, hospitalA_mysqlToLanding.py:155-163). The
  * incremental path reproduces the pushdown sub-select
  * (`WHERE {watermark_col} > '{last_watermark}'`, :149-152) as a
  * `Column` predicate on the scan — for parquet/CSV sources Catalyst
  * pushes it into the reader (PushedFilters), which is the same
  * engine-side pruning the JDBC sub-select achieves; a real JDBC impl
  * would get it via the `dbtable` sub-select automatically.
  */
trait SourceConnector {

  /** Full-table scan (S1 full-load branch). */
  def read(spark: SparkSession, table: String): DataFrame

  /** Incremental scan: rows strictly newer than `since` (P8). */
  def readIncremental(
      spark: SparkSession, table: String, watermarkCol: String, since: Timestamp): DataFrame =
    read(spark, table).filter(col(watermarkCol) > lit(since))
}

/** Header-CSV source — stringly-typed like the reference's claims/CPT
  * reads (S2, claims.py:16, cpt_codes.py:15: `header=True`, no schema).
  */
final class CsvSource(dir: String) extends SourceConnector {
  def read(spark: SparkSession, table: String): DataFrame =
    spark.read.option("header", "true").csv(s"$dir/$table.csv")
}

/** Parquet-backed source (the driver testdata layout). */
final class ParquetSource(dir: String) extends SourceConnector {
  def read(spark: SparkSession, table: String): DataFrame =
    spark.read.parquet(s"$dir/$table.parquet")
}

/** ORC-backed source — the second columnar format Spark ships a
  * vectorized reader for (common in Hive-heritage warehouses). Same
  * contract as [[ParquetSource]]: typed schema from the file footer,
  * and the incremental watermark predicate reaches the ORC scan as a
  * pushed filter + stripe-level min/max skipping (OrcSourceSpec pins
  * `PushedFilters` in the plan), so a 100 TB incremental load reads
  * only post-watermark stripes. */
final class OrcSource(dir: String) extends SourceConnector {
  def read(spark: SparkSession, table: String): DataFrame =
    spark.read.orc(s"$dir/$table.orc")
}

/** Real JDBC source (S1; reference hospitalA_mysqlToLanding.py:155-163,
  * query built :148-152). The incremental path pushes the watermark
  * predicate down as a `dbtable` sub-select, exactly like the
  * reference's `(SELECT * FROM t WHERE wm > '…') AS t` — the database
  * scans only post-watermark rows, nothing streams to Spark first.
  * The watermark literal uses the JDBC `{ts '…'}` escape so the same
  * sub-select runs on MySQL, Derby, Postgres, … (a bare quoted string
  * fails on engines that don't implicitly cast to TIMESTAMP).
  *
  * Tested against embedded Derby (JdbcSourceSpec), including an
  * IngestionRunner run-over-run watermark cycle; the CSV/Parquet
  * connectors remain the driver-testdata substitutes behind the same
  * trait. Derby has no sub-select alias keyword quirks, and Spark
  * wraps `dbtable` as `SELECT * FROM <dbtable> WHERE 1=0` for schema
  * probing, so the alias is mandatory.
  *
  * @param url   JDBC URL, e.g. jdbc:mysql://host:3306/db
  * @param props connection properties (user/password/driver)
  */
final class JdbcSource(url: String, props: java.util.Properties) extends SourceConnector {

  def read(spark: SparkSession, table: String): DataFrame =
    spark.read.jdbc(url, table, props)

  override def readIncremental(
      spark: SparkSession, table: String, watermarkCol: String, since: Timestamp): DataFrame = {
    val sub = s"(SELECT * FROM $table WHERE $watermarkCol > {ts '$since'}) AS ${table}_inc"
    spark.read.jdbc(url, sub, props)
  }
}
