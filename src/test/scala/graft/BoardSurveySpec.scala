package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Board ↔ SURVEY reconciliation gate (r13 verdict item 3): with 289
  * §2.10 X-rows, 265+ registered queries and 26 streaming twins,
  * drift between the SURVEY §2 inventory, `SparkEntry.queries`, and
  * the driver's CORRECTNESS keys became plausible and SILENT — a new
  * query without a §2.10 row would be graded as undocumented, and a
  * §2.10 row whose query was renamed would claim coverage that no
  * gate executes. This spec fails loudly on either direction:
  *
  *  1. every `qNN` id cited in SURVEY §2 (parity mapping paragraph +
  *     §2.10 X-row table) resolves to a registered query, and
  *  2. every registered query id is cited somewhere in §2.
  *
  * CORRECTNESS keys are exactly `SparkEntry.queries.keys` (the driver
  * enumerates the registry), so gating the registry gates the
  * artifact too. Ids normalize as (numeric part without leading
  * zeros) + optional letter suffix — `q01_pruned_scan` ↔ "q1",
  * `q90b_pagerank_mass` ↔ "q90b".
  */
class BoardSurveySpec extends AnyFunSuite with Matchers {

  private val IdInText = raw"\bq(\d+[a-z]?)\b".r
  private val IdInKey = raw"^q(\d+[a-z]?)_.*$$".r

  private def normalize(id: String): String = {
    val (num, suffix) = id.span(_.isDigit)
    num.dropWhile(_ == '0') + suffix
  }

  private lazy val section2: String = {
    // explicit UTF-8: SURVEY.md carries §/superscript glyphs and the
    // suite must not depend on the JVM's default charset
    val text = java.nio.file.Files.readString(
      java.nio.file.Paths.get("SURVEY.md"),
      java.nio.charset.StandardCharsets.UTF_8)
    val start = text.indexOf("\n## 2. Operator inventory")
    val end = text.indexOf("\n## 3.", start)
    withClue("SURVEY.md must contain §2 and §3 headers") {
      start should be >= 0
      end should be > start
    }
    text.substring(start, end)
  }

  private lazy val surveyIds: Set[String] =
    IdInText.findAllMatchIn(section2).map(m => normalize(m.group(1))).toSet

  private lazy val registeredIds: Map[String, String] =
    SparkEntry.queries.keys.map { k =>
      k match {
        case IdInKey(id) => normalize(id) -> k
        case _ => fail(s"query key '$k' does not match the qNN_name convention")
      }
    }.toMap

  test("every qNN cited in SURVEY §2 is a registered query") {
    val unregistered = surveyIds -- registeredIds.keySet
    withClue("SURVEY §2 cites query ids with no SparkEntry.queries entry " +
      "(renamed or dropped query, stale X-row?): ") {
      unregistered.toSeq.sortBy(id => (id.takeWhile(_.isDigit).toInt, id)) shouldBe empty
    }
  }

  test("every registered query id is cited in SURVEY §2") {
    val undocumented = registeredIds.filterNot { case (id, _) => surveyIds(id) }
    withClue("registered queries with no SURVEY §2 citation " +
      "(new query missing its §2.10 X-row or parity-mapping mention?): ") {
      undocumented.values.toSeq.sorted shouldBe empty
    }
  }

  test("query ids are unique across the registry") {
    // two keys sharing one qNN id would make a CORRECTNESS row ambiguous
    // against its §2.10 citation
    val byId = SparkEntry.queries.keys.toSeq.groupBy {
      case IdInKey(id) => normalize(id); case k => k
    }
    withClue("duplicate qNN ids: ") {
      byId.filter(_._2.size > 1) shouldBe empty
    }
  }
}
