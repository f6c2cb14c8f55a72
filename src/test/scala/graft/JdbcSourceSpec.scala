package graft

import java.sql.{DriverManager, Timestamp}
import java.time.LocalDate
import java.util.Properties

import graft.ingest._

/** JdbcSource against embedded Derby (the one JDBC engine shipped with
  * Spark's jars): full scans, the incremental `dbtable` sub-select
  * pushing the watermark predicate into the DATABASE (reference
  * hospitalA_mysqlToLanding.py:148-163), and an IngestionRunner
  * run-over-run cycle where the second run extracts only the rows
  * inserted after the first run's watermark.
  */
class JdbcSourceSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftjdbc;create=true"
  private val props = {
    val p = new Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  private def withStatement(f: java.sql.Statement => Unit): Unit = {
    val conn = DriverManager.getConnection(url)
    try { val st = conn.createStatement(); try f(st) finally st.close() }
    finally conn.close()
  }

  private lazy val seeded: Unit = withStatement { st =>
    st.executeUpdate(
      "CREATE TABLE patients (id INT, name VARCHAR(40), last_updated TIMESTAMP)")
    st.executeUpdate(
      "INSERT INTO patients VALUES (1, 'ada', TIMESTAMP('2024-01-15 10:00:00'))")
    st.executeUpdate(
      "INSERT INTO patients VALUES (2, 'lin', TIMESTAMP('2024-02-20 11:30:00'))")
    st.executeUpdate(
      "INSERT INTO patients VALUES (3, 'mo', TIMESTAMP('2024-03-25 09:15:00'))")
  }

  test("full read sees every row through the real JDBC scan") {
    seeded
    val df = new JdbcSource(url, props).read(spark, "patients")
    df.count() shouldBe 3
    df.columns.map(_.toLowerCase).sorted shouldBe Array("id", "last_updated", "name")
  }

  test("incremental read pushes the watermark predicate into the database") {
    seeded
    val src = new JdbcSource(url, props)
    val inc = src.readIncremental(
      spark, "patients", "last_updated", Timestamp.valueOf("2024-02-01 00:00:00"))
    inc.count() shouldBe 2 // the database filters; ids 2 and 3 only
    inc.select("id").collect().map(_.getInt(0)).sorted shouldBe Array(2, 3)
    // the predicate lives in the JDBC relation itself (a sub-select),
    // not in a Spark Filter above a full-table scan
    val scan = inc.queryExecution.optimizedPlan.toString
    scan.toLowerCase should include("patients_inc")
  }

  test("IngestionRunner over JDBC: second run extracts only post-watermark rows") {
    seeded
    val root = tmpDir("jdbc-ing")
    var now = Timestamp.valueOf("2024-03-31 00:00:00")
    val audit = new AuditLog(spark, s"$root/audit")
    val logger = new PipelineLogger(spark, s"$root/logs", () => now)
    val landing = new LandingZone(spark, s"$root/landing")
    val runner = new IngestionRunner(
      spark, new JdbcSource(url, props), landing, audit, logger, () => now)
    val cfg = LoadConfigEntry(
      "hospdb", "hospital_jdbc", "patients", "Incremental", "last_updated", true, "landing")

    // run 1: nothing loaded yet → watermark defaults pre-1900 → all 3 rows
    val r1 = runner.loadTable(cfg, LocalDate.of(2024, 3, 31))
    r1.status shouldBe "SUCCESS"
    r1.records shouldBe 3
    landing.read("hospital_jdbc", "patients").count() shouldBe 3

    // rows arriving between runs…
    withStatement { st =>
      st.executeUpdate(
        "INSERT INTO patients VALUES (4, 'new', TIMESTAMP('2024-04-02 08:00:00'))")
    }
    // …and run 2 extracts ONLY them (watermark = run 1's load_timestamp
    // would miss nothing: the audit watermark is the last SUCCESS
    // load_timestamp, 2024-03-31, so id 4 at 2024-04-02 qualifies)
    now = Timestamp.valueOf("2024-04-05 00:00:00")
    val r2 = runner.loadTable(cfg, LocalDate.of(2024, 4, 5))
    r2.status shouldBe "SUCCESS"
    r2.records shouldBe 1
    landing.read("hospital_jdbc", "patients")
      .select("id").collect().map(_.getLong(0)).sorted shouldBe Array(4L)
  }
}
