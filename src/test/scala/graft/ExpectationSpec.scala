package graft

import graft.ops.Expectations
import graft.ops.Expectations._
import org.apache.spark.sql.functions._

/** Pins the expectation compiler on a fixture with KNOWN violations of
  * every rule type, plus the single-pass plan claim for row-scoped
  * rules.
  */
class ExpectationSpec extends SparkSpec {

  import spark.implicits._

  private lazy val fixture = Seq(
    (Some(1L), Some("a"), 10L, "US"),
    (Some(2L), Some("a"), 20L, "US"), // dup (id 2 twice below), ok values
    (Some(2L), None, 500L, "DE"),     // null name, out-of-range, dup id
    (None, Some("b"), -3L, "XX")      // null id, below range, bad country
  ).toDF("id", "name", "amount", "country")

  test("each rule type counts exactly its violations") {
    val report = Expectations.run(fixture, Seq(
      NotNull("id"),
      NotNull("name"),
      Unique(Seq("id")),
      InRange("amount", 0L, 100L),
      AcceptedValues("country", Seq("US", "DE"))))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    report("not_null:id") shouldBe ((1L, false))
    report("not_null:name") shouldBe ((1L, false))
    // 4 rows, 3 distinct ids (1, 2, NULL — countDistinct ignores the
    // NULL, so 4 − 2 = 2 "duplicates" including the null row: the
    // strict reading of unique-and-present)
    report("unique:id") shouldBe ((2L, false))
    report("in_range:amount[0,100]") shouldBe ((2L, false)) // 500 and -3
    report("accepted_values:country") shouldBe ((1L, false)) // XX
  }

  test("referential integrity counts only missing non-null keys") {
    val dim = Seq(1L, 2L).toDF("ref_id")
    val report = Expectations.run(fixture, Seq(
      RefIntegrity("id", dim, "ref_id")))
      .collect()
    report.length shouldBe 1
    report.head.getLong(1) shouldBe 0L // ids 1 and 2 exist; NULL exempt
    val narrower = Expectations.run(fixture, Seq(
      RefIntegrity("id", Seq(1L).toDF("ref_id"), "ref_id")))
      .collect().head
    narrower.getLong(1) shouldBe 2L // both id=2 rows dangle
    narrower.getBoolean(2) shouldBe false
  }

  test("all-green suite reports pass on clean data") {
    val clean = Seq((1L, "x"), (2L, "y")).toDF("id", "name")
    val report = Expectations.run(clean, Seq(
      NotNull("id"), Unique(Seq("id")), NotNull("name")))
    report.filter(!col("pass")).count() shouldBe 0L
  }

  test("an empty table reports (0, pass), never NULL rows") {
    val empty = Seq.empty[(Long, String)].toDF("id", "name")
    val report = Expectations.run(empty, Seq(NotNull("id"), Unique(Seq("id"))))
      .collect()
    report.length shouldBe 2
    report.foreach { r =>
      r.getLong(1) shouldBe 0L
      r.getBoolean(2) shouldBe true
    }
  }

  test("an empty expectation suite yields an empty report, not a crash") {
    Expectations.run(fixture, Seq.empty).count() shouldBe 0L
  }

  test("row-scoped rules compile into one aggregate pass over the table") {
    val plan = Expectations.run(fixture, Seq(
      NotNull("id"), NotNull("name"), InRange("amount", 0L, 100L),
      AcceptedValues("country", Seq("US"))))
      .queryExecution.executedPlan.toString
    // no Unique in this suite: a single global aggregate, no Expand,
    // no join — adding a rule must not add a scan
    plan should not include "Expand"
    plan should not include "Join"
  }
}
