package graft.ingest

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Catalog-backed warehouse sinks (SURVEY §2.1 S5-S7; reference
  * claims.py:28-33 / cpt_codes.py:23-28 bronze writes,
  * silver.sql:6-16 / gold.sql:5-13 DDL + truncate/insert reloads).
  *
  * S7's `TRUNCATE TABLE` + `INSERT INTO … SELECT` pair is replaced by a
  * single atomic `SaveMode.Overwrite` — one job, no window where the
  * table is empty, and at 100 TB no second pass over the data.
  */
final class Warehouse(spark: SparkSession, db: String) {

  def init(): Unit =
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")

  private def qualified(table: String): String = s"$db.$table"

  /** S6: idempotent `CREATE TABLE IF NOT EXISTS` from an explicit schema. */
  def createIfNotExists(table: String, schema: StructType): Boolean = {
    if (spark.catalog.tableExists(qualified(table))) false
    else {
      spark.catalog.createTable(qualified(table), "parquet", schema, Map.empty[String, String])
      true
    }
  }

  /** S5: bronze-style managed-table save (overwrite, like the
    * reference's `mode("overwrite")` BigQuery load). */
  def save(df: DataFrame, table: String): Unit =
    df.write.mode(SaveMode.Overwrite).format("parquet").saveAsTable(qualified(table))

  /** S7: full reload of a type-1 dim / gold mart — atomic overwrite
    * replaces the truncate+insert pair. */
  def reload(df: DataFrame, table: String): Unit = save(df, table)

  /** Bucketed save: pre-shuffles the table into `nBuckets` by
    * `bucketCols` at WRITE time so every later equi-join or aggregate
    * on those columns is exchange-free — the 100 TB play for fact⋈fact
    * joins that would otherwise shuffle both sides every run (pay the
    * shuffle once at ingest, not per query). Joining two tables
    * bucketed the same way produces a zero-Exchange sort-merge join
    * (WarehouseLayoutSpec pins this on the actual plan). */
  def saveBucketed(df: DataFrame, table: String, nBuckets: Int, bucketCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(qualified(table))

  /** Partitioned save: directory-partitions the table by `partCols` so
    * selective reads prune whole partitions at planning time (gold
    * marts read by date/department; the scan shows PartitionFilters,
    * not a full-table pass). Keep partition columns low-cardinality —
    * one directory per value. */
  def savePartitioned(df: DataFrame, table: String, partCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite).format("parquet")
      .partitionBy(partCols: _*)
      .saveAsTable(qualified(table))

  /** SCHEMA EVOLUTION on append: a batch may carry columns the table
    * does not have yet (upstream added a field) or lack columns the
    * table has (old producer). New columns are added to the catalog
    * schema with `ALTER TABLE ADD COLUMNS` — a metadata-only
    * operation, no rewrite of existing files at any scale; rows
    * already on disk read the new column as NULL (parquet scan
    * reconciles files against the wider catalog schema). The batch is
    * then aligned to the evolved schema (missing columns filled with
    * typed NULLs) and appended. Widening only — a type CHANGE on an
    * existing column is refused by the ALTER path loudly, never
    * coerced silently. */
  def appendEvolving(df: DataFrame, table: String): Unit = {
    import org.apache.spark.sql.functions.{col, lit}
    if (!exists(table)) {
      df.write.format("parquet").saveAsTable(qualified(table))
    } else {
      // name matching is case-INSENSITIVE, like Spark's own column
      // resolution — a case-variant column from an upstream producer
      // must route to alignment, not to a doomed ADD COLUMNS
      val existing = spark.table(qualified(table)).schema
      val incoming = df.schema
      def norm(n: String) = n.toLowerCase(java.util.Locale.ROOT)
      val existingByName = existing.map(f => norm(f.name) -> f).toMap
      val drifted = incoming.flatMap { f =>
        existingByName.get(norm(f.name)).collect {
          case e if e.dataType != f.dataType =>
            s"${f.name}: table ${e.dataType.sql}, batch ${f.dataType.sql}"
        }
      }
      require(drifted.isEmpty,
        s"appendEvolving($table): type change on existing column(s) refused — " +
          drifted.mkString("; "))
      val newCols = incoming.filterNot(f => existingByName.contains(norm(f.name)))
      if (newCols.nonEmpty) {
        val ddl = newCols.map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
        spark.sql(s"ALTER TABLE ${qualified(table)} ADD COLUMNS ($ddl)")
      }
      val target = spark.table(qualified(table)).schema
      val incomingNames = incoming.fieldNames.map(norm).toSet
      val aligned = df.select(target.map { f =>
        if (incomingNames.contains(norm(f.name))) col(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      }.toSeq: _*)
      aligned.write.mode(SaveMode.Append).format("parquet").saveAsTable(qualified(table))
    }
  }

  def table(name: String): DataFrame = spark.table(qualified(name))

  def exists(name: String): Boolean = spark.catalog.tableExists(qualified(name))
}
