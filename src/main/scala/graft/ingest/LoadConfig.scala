package graft.ingest

import org.apache.spark.sql.SparkSession

/** Control-plane config read + active-row filter (SURVEY §2.2 P7;
  * reference hospitalA_mysqlToLanding.py:222-231 reads
  * `configs/load_config.csv` with header, then :242 filters
  * `is_active == "1" && datasource == <source>`).
  *
  * The config is O(#tables) rows — a driver-side collect here is the
  * correct plan at any scale (it parameterizes the run; it is not data).
  */
object LoadConfig {

  /** S2: header-CSV read of the load config. */
  def read(spark: SparkSession, path: String): Seq[LoadConfigEntry] =
    spark.read.option("header", "true").csv(path)
      .collect()
      .toSeq
      .map { r =>
        LoadConfigEntry(
          database = r.getAs[String]("database"),
          datasource = r.getAs[String]("datasource"),
          tablename = r.getAs[String]("tablename"),
          loadtype = r.getAs[String]("loadtype"),
          watermark = Option(r.getAs[String]("watermark")).getOrElse(""),
          isActive = r.getAs[String]("is_active") == "1",
          targetpath = Option(r.getAs[String]("targetpath")).getOrElse(""))
      }

  /** P7: the reference's `is_active == "1" and datasource == …` gate. */
  def active(entries: Seq[LoadConfigEntry], datasource: String): Seq[LoadConfigEntry] =
    entries.filter(e => e.isActive && e.datasource == datasource)
}
