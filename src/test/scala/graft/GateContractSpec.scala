package graft

/** The driver-gate contract, asserted so it cannot silently erode:
  * every query in `SparkEntry.queries` must either carry a DuckDB
  * oracle or be on the EXPLICIT rows-only allowlist (operators whose
  * outputs are approximate by contract, each pinned by its own spec
  * instead). A new query added without an oracle — or an oracle key
  * that doesn't match any query — fails here instead of surfacing as
  * a weak/orphaned check in the next round's CORRECTNESS report.
  */
class GateContractSpec extends SparkSpec {

  /** Emptied in r6 (q41/q91 re-expressed their sketches with
    * engine-exact integer math; q24's planes went integer in r5).
    * Re-populated in r8 with the first genuinely-unrestatable
    * operator: q119's deflate byte counts have no DuckDB equivalent —
    * CompressibilitySpec pins its determinism, ordering contract, and
    * plan shape instead. */
  private val rowsOnlyAllowed = Set("q119_compressibility")

  test("every query has an oracle unless explicitly allowlisted rows-only") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    missing shouldBe rowsOnlyAllowed
  }

  test("no orphaned oracle entries") {
    (SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet) shouldBe empty
  }

  test("un-gated library sketch variants have a pinning spec on the classpath") {
    // profileApprox / slidingHll have no DuckDB oracle (engine-private
    // sketch state); they are honest only while their accuracy spec
    // exists (rowsOnlyAllowed itself is empty — see above)
    Seq("graft.ProfilingSpec").foreach { cls =>
      noException should be thrownBy Class.forName(cls)
    }
  }

  test("oracle SQL references only driver-provided tables") {
    val tables = Set("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    val fromPat = """(?i)(?:from|join)\s+([a-z_][a-z0-9_]*)""".r
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      // strip CTE names declared in this statement; they are legal
      // targets (q138's loop CTEs are AS MATERIALIZED — see its
      // oracle; q163's VALUES CTEs carry a column-alias list)
      val ctePat =
        """(?i)([a-z_][a-z0-9_]*)\s*(?:\([a-z0-9_,\s]*\))?\s+as\s*(?:materialized\s*)?\(""".r
      val ctes = ctePat.findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      val refs = fromPat.findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      withClue(s"$name references unknown relations:") {
        // `lateral` is a join keyword, not a relation name; `range` is
        // DuckDB's table FUNCTION (q266/q267 derive ring points from
        // range(N)), a generator, not external data
        (refs -- ctes -- tables - "lateral" - "range") shouldBe empty
      }
    }
  }
}
