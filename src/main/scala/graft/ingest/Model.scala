package graft.ingest

import java.sql.Timestamp

/** Control-plane row: one source table to load. Mirrors the reference's
  * `configs/load_config.csv` columns (database, datasource, tablename,
  * loadtype, watermark, is_active, targetpath), consumed positionally at
  * /root/reference/src/pipelines/ingestion/hospitalA_mysqlToLanding.py:243-245.
  */
final case class LoadConfigEntry(
    database: String,
    datasource: String,
    tablename: String,
    loadtype: String, // "Full" | "Incremental"
    watermark: String, // watermark column name ("" for full loads)
    isActive: Boolean,
    targetpath: String)

/** One row per table-load attempt — the audit trail (SURVEY §2.7 C6;
  * reference schema init_bq_tables.py:65-72 / configs/audit_table_ddl.sql).
  */
final case class AuditRecord(
    data_source: String,
    tablename: String,
    load_type: String,
    record_count: Long,
    load_timestamp: Timestamp,
    status: String) // "SUCCESS" | "FAILED"

/** Structured pipeline log event (SURVEY §2.7 C5; reference
  * hospitalA_mysqlToLanding.py:54-90).
  */
final case class LogEvent(
    log_timestamp: Timestamp,
    event_type: String, // INFO | SUCCESS | WARNING | ERROR | CRITICAL
    message: String,
    step: String,
    tablename: String,
    error_trace: String)
