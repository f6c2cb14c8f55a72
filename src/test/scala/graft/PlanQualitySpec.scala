package graft

/** Plan-quality regression gate: the scale properties the engine is
  * designed around, asserted on the ACTUAL physical plans so a future
  * edit that silently breaks pushdown, reintroduces an all-pairs join,
  * or splits a shared window sort fails a test instead of a 100 TB run.
  */
class PlanQualitySpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def haveData = new java.io.File(s"$sfDir/lineitem.parquet").exists()

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.queryExecution.executedPlan.toString
  }

  /** Queries whose plans INTENTIONALLY contain a nested-loop join
    * against a broadcast side that is bounded by design: q23's
    * brute-force baseline (declared quadratic), q33's K=16 centroid
    * assignment, q79's types×hours spine grid (two control-plane
    * relations), and q163's NDCG audit (the q23 scoring pass over the
    * SAMPLED query slice — an audit is a baseline consumer by
    * design). Everything else must be hash/sort-merge equi-joins. */
  private val nestedLoopAllowed =
    Set("q23_ann_brute_force", "q33_ann_ivf", "q79_hourly_spine",
      "q163_ndcg_audit",
      // q191 audits q33's index with EXACTLY q33's K=16 bounded
      // centroid-assignment join — same allowance, same justification
      "q191_ivf_balance",
      // q219 certifies q33 against the q23 brute-force truth — an
      // audit is a baseline consumer by design (the q163 allowance)
      "q219_ivf_recall",
      // q231 rebuilds q33's bounded K=16 centroid-assignment join AND
      // consumes the q23 baseline — both existing allowances
      "q231_two_stage",
      // q241 sweeps q33's probe count — same bounded centroid join,
      // same q23 baseline consumption
      "q241_probe_sweep",
      // q274 scores the corpus against its broadcast 16-row query
      // panel — the q23 brute-force shape with a constant build side
      // (the audit's declared scale; TopK bounds every shuffle)
      "q274_truncation_audit")

  test("no cartesian products anywhere; nested-loop joins only where declared") {
    assume(haveData, s"$sfDir not present")
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      val p = plan(name)
      withClue(s"$name:") {
        p should not include "CartesianProduct"
        if (!nestedLoopAllowed(name))
          p should not include "BroadcastNestedLoopJoin"
      }
    }
  }

  test("q01 scan prunes columns and pushes filters down to parquet") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q01_pruned_scan")
    p should include("PushedFilters: [")
    p should include("IsNotNull")
    // projection reaches the scan: ReadSchema carries only the query's
    // three columns, not all 16 lineitem columns
    val readSchema = p.substring(p.indexOf("ReadSchema:"))
      .takeWhile(_ != '>')
    readSchema.count(_ == ',') should be <= 3 // <= 4 cols read of 16
  }

  test("q08 multiway fan-out runs on broadcast joins, no shuffle joins") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q08_join_multiway_fanout")
    p should include("BroadcastHashJoin")
    p should not include "SortMergeJoin"
    p should not include "ShuffledHashJoin"
  }

  test("q35 sessionization shuffles once: both window frames share one sort") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q35_sessionize")
    p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") shouldBe 1
    // the session aggregate reuses the window's user_id partitioning —
    // no second shuffle between Window and the final HashAggregate
  }

  test("q38 evaluates all three window columns in a single Window node") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q38_moving_window")
    p.linesIterator.count(_.trim.startsWith("Window ")) +
      p.linesIterator.count(_.trim.contains("- Window ")) should be <= 2
    p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") shouldBe 1
  }

  test("q28's distinct counts stay two-phase: no Expand in the plan") {
    assume(haveData, s"$sfDir not present")
    // The three DISTINCT counts share the l_orderkey key, so the
    // aggregate is written as groupBy(provider, order) -> groupBy
    // (provider); a regression to plain countDistinct would resurface
    // as a Catalyst Expand that quadruples fact rows pre-shuffle.
    val p = plan("q28_gold_provider_performance")
    p should not include "Expand"
    p should include("BroadcastHashJoin")
  }

  test("q40 as-of join is one union + one window pass, not a range join") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q40_asof_attribution")
    // no join operator at all — attribution rides a single user_id
    // shuffle, and both attribution columns share one Window node
    p should not include "Join"
    p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") shouldBe 1
    p.linesIterator.count(_.contains("Window ")) shouldBe 1
  }

  test("q42 split assignment is a pure narrow map: zero hash exchanges") {
    assume(haveData, s"$sfDir not present")
    // the only exchange allowed is the guarded round-robin scan
    // repartition (Tables.withMinParallelism — absent at real scale);
    // the OPERATOR itself must add no shuffle
    val p = plan("q42_train_test_split")
    p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") shouldBe 0
  }

  test("q43 curation composes in exactly two shuffles: dedup + final rollup") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q43_curated_corpus")
    p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") shouldBe 2
    p should not include "Join" // dedup keeps keeper stats via min_by, no re-join
  }

  test("q44 top-k lowers to TakeOrderedAndProject, not a global sort") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q44_vocab_top_df")
    p should include("TakeOrderedAndProject")
    p.linesIterator.count(_.trim.contains("Sort ")) shouldBe 0
  }

  test("q49 stratified sample is a pure narrow filter: zero hash exchanges") {
    assume(haveData, s"$sfDir not present")
    // guarded round-robin scan repartition allowed; no operator shuffle
    val p = plan("q49_stratified_sample")
    p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") shouldBe 0
  }

  test("q50/q52 deterministic orderings ride one shuffle + one window sort") {
    assume(haveData, s"$sfDir not present")
    Seq("q50_token_shards", "q52_corpus_shuffle", "q56_sequence_pack").foreach { name =>
      val p = plan(name)
      withClue(s"$name:") {
        p.sliding("Exchange hashpartitioning".length)
          .count(_ == "Exchange hashpartitioning") shouldBe 1
        p.linesIterator.count(_.contains("Window ")) shouldBe 1
        p should not include "Join"
      }
    }
  }

  test("q57 k-means assignment is a pure narrow map: no joins, no exchanges") {
    assume(haveData, s"$sfDir not present")
    // centroids are driver-hosted literals (the MLlib discipline), so
    // the returned assignment plan must be scan + project only — a
    // regression to relational centroids would surface as a join or a
    // K-fold explode ahead of an aggregate here
    val p = plan("q57_kmeans_cluster")
    p should not include "Join"
    // guarded round-robin scan repartition allowed; no operator shuffle
    p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") shouldBe 0
  }

  test("q51 pivot stays two-phase cell aggregates, no Expand, no per-cell pass") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q51_mix_pivot")
    p should not include "Expand"
    // (lang, sg) cell aggregate + PivotFirst rotation — both shuffles
    // carry aggregated cells only, and both phases are map-side partial
    p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") shouldBe 2
    p should include("partial_pivotfirst")
  }

  test("q47 decontamination joins gram hashes, never document text") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q47_decontaminate")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
    // the join keys are the 48-bit gram hashes — no `text`/`g` string
    // column survives into any Exchange above the gram projection
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).mkString("\n")
    exchanges should not include "text"
  }

  test("q39 truth relation is SharedCache-registered for the calibration family") {
    assume(haveData, s"$sfDir not present")
    // r11 verdict item 3: q146/q225/q226/q235/q194/q237 all consume
    // q39's PPJoin-verified pair relation; the registration below is
    // what lets shared mode pay the verification ONCE. storageLevel
    // is the observable contract — NONE here means someone removed
    // the SharedCache.persist and every consumer silently re-verifies.
    val truth = graft.queries.NearDup.q39Truth(spark, sfDir)
    truth.storageLevel.useMemory shouldBe true
    // consumers read it through the cache boundary, not a fresh PPJoin
    val p = plan("q146_lsh_recall")
    p should include("InMemoryTableScan")
  }

  test("q244 bootstrap: all 40 replicates ride one scan, three exchanges total") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q244_poisson_bootstrap")
    // the Poisson-bootstrap point: replicate weights are an IN-ROW
    // 40-way expansion feeding a map-combined (priority, r) aggregate
    // — no per-replicate pass, no resampled data copy. Exchanges:
    // exact leg (priority), replicate sums (priority, r), the window
    // repartition (priority) that the ci rollup then reuses; the
    // 5-row ci side joins broadcast.
    p should include("partial_sum")
    p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") shouldBe 3
    p should include("BroadcastHashJoin")
    p.linesIterator.count(_.contains("Window [")) shouldBe 1
  }

  test("q245 permutation test: replicates expand the cell relation, not the corpus") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q245_permutation_test")
    // the B=64 expansion must sit ABOVE the per-(type, user) cell
    // aggregate: Generate (the explode) appears after a partial_sum
    // collapse, never over the raw event scan, and the two scalar
    // combines are broadcast equi-joins (no literal-key nested loop)
    p should include("partial_sum")
    p should include("Generate explode")
    p.linesIterator.count(_.contains("BroadcastHashJoin")) shouldBe 2
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("q246/q247 rank tests walk value cells, not raw rows, in one window region") {
    assume(haveData, s"$sfDir not present")
    Seq("q246_rank_sum_test", "q247_ks_two_sample").foreach { name =>
      val p = plan(name)
      withClue(s"$name:") {
        // events collapse map-combined to (type, value) cells BEFORE
        // any window: exactly two exchanges (cell aggregate, then the
        // per-type window repartition the final aggregate reuses) and
        // ONE sort — q247's three window specs share the (type, v)
        // order, so Catalyst stacks them in a single region
        p should include("partial_sum")
        p.sliding("Exchange hashpartitioning".length)
          .count(_ == "Exchange hashpartitioning") shouldBe 2
        p.linesIterator.count(_.trim.startsWith("+- Sort")) shouldBe 1
        p should not include "Join"
      }
    }
  }

  test("q249 average precision: distributed rank, no full per-source sort") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q249_average_precision")
    // r13 (r12 verdict watch-grade): the old single Window sorted
    // each source's ENTIRE doc relation in one task. Now the rank is
    // the three-leg cell decomposition — the only Window touching
    // doc-dimension rows is the inner row_number/running-pos node,
    // partitioned by (source, n_chars, ib) so a partition holds ≤2²⁰
    // rows by doc_id uniqueness; the other two windows walk frequency
    // cells. Three Window nodes, cell joins are broadcast equi-joins,
    // document text still pruned at the scan.
    p.linesIterator.count(_.contains("Window [")) shouldBe 3
    p.linesIterator.filter(_.contains("row_number()")).foreach { l =>
      l should include("ib")   // partitioned — never a whole-source sort
    }
    p should not include "SortMergeJoin" // cell sides stay broadcast-able
    val readSchema = p.substring(p.indexOf("ReadSchema:"))
    readSchema should not include "text"
  }

  test("q261 winsorized means: one cell pass, one window region, no join") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q261_winsorized_means")
    // the q246/q247 discipline: cells collapse map-combined, the
    // running count / per-type total / conditional-min cap all share
    // the (type | v) sort (three Window nodes, ONE Sort, two
    // exchanges: cell aggregate + the per-type window repartition the
    // final aggregate reuses), no join anywhere
    p should include("partial_sum")
    p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") shouldBe 2
    p.linesIterator.count(_.trim.startsWith("+- Sort")) shouldBe 1
    p should not include "Join"
  }

  test("q262 Schoenfeld ladder expands ABOVE the scalar aggregate, joins nothing") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q262_schoenfeld_ladder")
    // the q251 convention: the 4-rung explode sits above the 1-row
    // moment aggregate — one map-combined cell exchange, no join, no
    // window, the corpus never meets the ladder
    p should include("partial_sum")
    p should include("Generate explode")
    p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") shouldBe 1
    p should not include "Join"
    p should not include "Window"
  }

  test("q263 QTE: one window region, rung stack above the aggregate, no join") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q263_quantile_effects")
    // q261's cell-window discipline (all six conditional mins share
    // the (type | v) sort — 2 exchanges, 1 Sort) composed with the
    // q251/q262 rung-stack discipline (Generate above the |types|-row
    // aggregate — the rungs never touch the corpus)
    p should include("partial_sum")
    p should include("Generate explode")
    p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") shouldBe 2
    p.linesIterator.count(_.trim.startsWith("+- Sort")) shouldBe 1
    p should not include "Join"
  }

  test("q250 CUPED collapses to user cells before the moment aggregate") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q250_cuped")
    // one map-combined shuffle to (type, user) covariate cells, one
    // |types|-row moment aggregate — no join, no window, the corpus
    // never meets the moment stage
    p should include("partial_sum")
    p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") shouldBe 2
    p should not include "Join"
    p should not include "Window"
  }

  test("q251 MDE ladder expands ABOVE the per-type aggregate, joins nothing") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q251_mde_ladder")
    // the 4-way ladder explode sits above the |types|-row moment
    // aggregate (the q245 Generate-above-partial discipline)
    p should include("partial_sum")
    p should include("Generate explode")
    p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") shouldBe 1
    p should not include "Join"
  }

  test("q254 Kaplan-Meier: two map-combined collapses, the fold joins nothing") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q254_kaplan_meier")
    // one scan -> per-user cells (user key) -> per-day counts (day
    // key); the survival fold runs over the |days|-bounded curve
    // relation (SinglePartition is the declared tiny-relation stage).
    // The curve is SharedCache'd (q257/StreamingSurvival consumers):
    // when an earlier spec already materialized it in this JVM the
    // plan renders through InMemoryTableScan (whose stored build plan
    // repeats the exchange lines in the text) — pin the build shape
    // only on the uncached rendering.
    p should not include "Join"
    p should include("collect_list")
    if (!p.contains("InMemoryTableScan")) {
      p.sliding("Exchange hashpartitioning".length)
        .count(_ == "Exchange hashpartitioning") shouldBe 2
      p should include("partial_min")
    }
    // q256 shares the same un-persisted two-collapse skeleton — pin
    // the build shape there, where no cache wrapper can intervene
    val p256 = plan("q256_logrank_test")
    p256 should not include "Join"
    p256.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") shouldBe 2
    p256 should include("partial_min")
  }

  test("q255 uplift deciles: distributed rank, no single-task user sort") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q255_uplift_deciles")
    // r13 (r12 verdict watch-grade): the global ntile that funneled
    // the whole user dimension through one Window partition is
    // retired — the decile now comes from the three-leg distributed
    // rank (two-level score prefix + uid-bucket prefix + ≤2²⁰-row
    // inner row_number) and the closed-form ntile off the
    // control-plane N. r14 (r13 ADVICE-low): scores are near-unique
    // cent sums, so the score leg is itself two-level — the only
    // SinglePartition windows walk the score-BUCKET total relation
    // (≤ score_domain/2²⁰ rows) and the 10-row decile table; the
    // per-score prefix window partitions by bucket.
    p should not include "ntile("
    p.linesIterator.filter(_.contains("row_number()")).foreach { l =>
      l should include("ub")   // partitioned — never a whole-user sort
    }
    p.linesIterator.count(_.contains("Window [")) shouldBe 5
    // every window whose spec leads with the raw score must carry a
    // bucket partition column (sb for the score-prefix leg, ub for the
    // inner row_number) — never a global sort over the near-unique
    // score relation
    p.linesIterator.filter(_.contains("windowspecdefinition(score"))
      .foreach { l => assert(l.contains("sb") || l.contains("ub"), l) }
    p should not include "SortMergeJoin" // cell sides stay broadcast-able
    p should include("partial_sum")
  }

  test("q259 per-arm KM shares q254's two-collapse skeleton, windows by arm") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q259_km_by_arm")
    // q254's shape with treat carried through: no join, the fold is
    // the in-row aggregate HOF, and every window partitions by the
    // arm (no SinglePartition stage at all — the curve relation is
    // ≤2·|days| rows but even that walks per-arm). Three exchanges:
    // the two map-combined collapses q254 has, plus the per-arm
    // window repartition its pooled SinglePartition windows didn't
    // need.
    // the curve is SharedCache'd (q260 rides it): a cached rendering
    // repeats the build plan's exchange lines inside the
    // InMemoryTableScan wrapper — pin the build shape only on the
    // uncached rendering (the q254 pin's convention)
    p should not include "Join"
    p should include("collect_list")
    p should not include "SinglePartition"
    if (!p.contains("InMemoryTableScan")) {
      p.sliding("Exchange hashpartitioning".length)
        .count(_ == "Exchange hashpartitioning") shouldBe 3
      p should include("partial_min")
    }
  }

  test("q53 exact-k sample rides the TopK aggregator, not a window sort") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q53_exact_k_sample")
    // map-side-combining Aggregator path: two ObjectHashAggregate
    // phases, no Window node, no whole-corpus sort before the shuffle
    p should include("ObjectHashAggregate")
    p should not include "Window"
    p.linesIterator.count(_.trim.contains("Sort ")) shouldBe 0
  }

  test("q54 cube is one Expand into one partial-aggregated shuffle") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q54_cube_composition")
    p should include("Expand")
    p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") shouldBe 1
    p should include("partial_count")
  }

  test("q59 chunk dedup shuffles chunk hashes, never document text") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q59_chunk_dedup")
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).mkString("\n")
    exchanges should not include "text"
    exchanges should not include "ch_txt"
  }

  test("q60 tf-idf ranks its top terms in a single Window node") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q60_tfidf_terms")
    p.linesIterator.count(_.contains("Window ")) shouldBe 1
  }

  test("q62 range frame: both aggregates share one Window over one shuffle") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q62_trailing_window")
    p.linesIterator.count(_.contains("Window ")) shouldBe 1
    p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") shouldBe 1
  }

  test("q63 interval join lowers to an equi-join, not a nested loop") {
    assume(haveData, s"$sfDir not present")
    // the global no-nested-loop test already rejects the naive range
    // join plan; this pins that an equi-join (on event_type, bucket)
    // is what replaced it, with the range predicate as residual
    val p = plan("q63_interval_join")
    p should include("Join")
  }

  test("q64 z-order key derivation is a pure narrow map: zero exchanges") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q64_zorder_layout")
    p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") shouldBe 0
    p should not include "Join"
    p.linesIterator.count(_.trim.contains("Sort ")) shouldBe 0
  }

  test("dimension joins broadcast the dimension, never the fact") {
    assume(haveData, s"$sfDir not present")
    // q19 gold mart: lineitem fact joined to supplier + nation dims
    val p = plan("q19_gold_charge_summary")
    p should include("BroadcastHashJoin")
    p should not include "SortMergeJoin"
  }

  test("q65 funnel: three sequential steps share ONE user_id shuffle") {
    assume(haveData, s"$sfDir not present")
    // the three stacked running-frame windows and the final per-user
    // aggregate all reuse the same user_id partitioning — a regression
    // to self-joins would multiply fact shuffles
    val p = plan("q65_funnel_steps")
    p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") shouldBe 1
    p should not include "Join"
  }

  test("q68 temperature mix: rates broadcast back; document text never read") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q68_temperature_mix")
    p should include("BroadcastHashJoin")
    p should not include "SortMergeJoin"
    p should not include "ShuffledHashJoin"
    // only (doc_id, source) leave the scan — the rate decision needs no text
    val readSchemas = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    readSchemas should not include "text"
  }

  test("q70 stride chunking is a pure narrow map: zero wide exchanges") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q70_stride_chunk")
    p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") shouldBe 0
    p should not include "Join"
  }

  test("q82 latest-per-key is a partial aggregate, not a window sort") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q82_latest_per_key")
    // the whole point vs row_number()=1: no Window node, no sort of the
    // fact stream — one partial-aggregated shuffle
    p.linesIterator.count(_.contains("Window")) shouldBe 0
    p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") shouldBe 1
    p should include("partial_max_by")
  }

  test("q83 trailing distinct: bounded fan-out, no DISTINCT over the expansion") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q83_trailing_distinct")
    // two keyed shuffles (user collapse, per-day count); the final count
    // is plain — a count(DISTINCT) over the exploded rows would show as
    // a third exchange or an Expand
    p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") shouldBe 2
    p should not include "Expand"
  }

  test("q86 nested export assembles arrays in one shuffle, HOFs stay narrow") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q86_nested_export")
    p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") shouldBe 1
    p should not include "Join"
    p.linesIterator.count(_.contains("Window")) shouldBe 0
  }

  test("q106 keyset page: cursor predicate pushes to the scan, top-k avoids a global sort") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q106_keyset_page")
    p should include("TakeOrderedAndProject")
    p should include("PushedFilters: [Or(")
  }

  // -- named pins for the round-9c/9d family (q173–q189): each SURVEY
  // §2.10 plan-shape claim asserted on the executed plan, beyond the
  // global no-cartesian/no-BNLJ sweep --------------------------------

  test("q173/q188 privacy gates are one map-combined aggregate: no joins/windows/Expand") {
    assume(haveData, s"$sfDir not present")
    Seq("q173_k_anonymity", "q188_l_diversity").foreach { name =>
      val p = plan(name)
      withClue(s"$name:") {
        p should not include "Join"
        p.linesIterator.count(_.contains("Window [")) shouldBe 0
        p should not include "Expand" // threshold fold is a stack unpivot, not grouping sets
      }
    }
  }

  test("q174 vocabulary totals join back broadcast, never sort-merge") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q174_lm_surprisal")
    p should include("BroadcastHashJoin")
    p should not include "SortMergeJoin"
    p should not include "ShuffledHashJoin"
  }

  test("q176 fertility is in-row lengths: no explode, no join, one exchange") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q176_token_fertility")
    p should not include "Generate" // token array length computed in-row
    p should not include "Join"
    p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") shouldBe 1
  }

  test("q177 centroid relation broadcasts into the per-vector cosine leg") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q177_embedding_health")
    p should include("BroadcastHashJoin")
    p should not include "SortMergeJoin"
  }

  test("q178 both per-source windows share ONE source shuffle; bin agg reuses it") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q178_calibration_audit")
    p should not include "Join"
    p.linesIterator.count(_.contains("Window [")) shouldBe 2
    // hashpartitioning(source) satisfies the (source, bin) clustering,
    // so the reliability-table aggregate adds NO second exchange
    p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") shouldBe 1
  }

  test("q179 monthly top-k rides the TopK aggregator, not per-month window sorts") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q179_persistent_topk")
    p should include("ObjectHashAggregate")
    p.linesIterator.count(_.contains("Window [")) shouldBe 0
  }

  test("q180/q182/q183 audit relations shuffle cells/hashes, never document text") {
    assume(haveData, s"$sfDir not present")
    Seq("q180_langid_confusion", "q182_neardup_source_matrix",
        "q183_cluster_profile").foreach { name =>
      val p = plan(name)
      withClue(s"$name:") {
        val exchanges = p.linesIterator.filter(_.contains("Exchange")).mkString("\n")
        exchanges should not include "text"
      }
    }
  }

  test("q181 burstiness: per-user lag window and moment aggregate share one shuffle") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q181_burstiness")
    p should not include "Join"
    p.linesIterator.count(_.contains("Window [")) shouldBe 1
    p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") shouldBe 1
  }

  test("q184 waterfill output is the cached |sources|-row relation: no join, no window") {
    assume(haveData, s"$sfDir not present")
    // the boundary scan is driver control plane at construction; the
    // RETURNED plan is a projection over the shared-cached per-source
    // token sums — one map-combined aggregate, nothing else
    val p = plan("q184_token_waterfill")
    p should not include "Join"
    p.linesIterator.count(_.contains("Window [")) shouldBe 0
    p should include("InMemoryTableScan")
  }

  test("q185/q187 rank-exact percentiles run zero full sorts") {
    assume(haveData, s"$sfDir not present")
    Seq("q185_ship_latency", "q187_daily_value_bands").foreach { name =>
      val p = plan(name)
      withClue(s"$name:") {
        p should not include "Exchange rangepartitioning"
        // every Sort is a window-local (global=false) sort over the
        // frequency relation, never a global data sort
        p.linesIterator.filter(_.contains("Sort [")).foreach { l =>
          l should include("], false,")
        }
      }
    }
  }

  test("q186 adoption curve: running sum is a single Window over the day relation") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q186_first_seen_curve")
    p should not include "Join"
    p.linesIterator.count(_.contains("Window [")) shouldBe 1
  }

  test("q189 padding audit: one corpus scan, global max via window — no join node") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q189_padding_audit")
    p should not include "Join" // the crossJoin'd scalar-agg spine would BNLJ + rescan
    p.linesIterator.count(_.contains("Window [")) shouldBe 1
    p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") shouldBe 1
    p.linesIterator.count(_.contains("FileScan parquet")) shouldBe 1
  }

  test("q190 concentration: rank window runs on the vocab relation, no join") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q190_vocab_concentration")
    p should not include "Join"
    p.linesIterator.count(_.contains("Window [")) shouldBe 1
    // (source, tok) partial count → source window → source aggregate:
    // the final groupBy reuses the window's source partitioning
    p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") shouldBe 2
    // raw text never shuffles — exchanges carry token cells only
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).mkString("\n")
    exchanges should not include "text"
  }

  test("q192 context sweep is one scalar map-combined aggregate: no joins/windows") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q192_context_sweep")
    p should not include "Join"
    p.linesIterator.count(_.contains("Window [")) shouldBe 0
    p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") shouldBe 0
  }

  test("q193 yield joins doc ids to the cluster relation, never document text") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q193_dedup_yield")
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).mkString("\n")
    exchanges should not include "text"
  }

  test("q195 double-fire: lag window and (type,user) partial share one fact shuffle") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q195_double_fire")
    p should not include "Join"
    p.linesIterator.count(_.contains("Window [")) shouldBe 1
    // window partitioning (user, type) satisfies the (type, user)
    // partial aggregate; only the |types|-row rollup re-shuffles
    p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") shouldBe 2
  }

  test("q194 agreement audit shuffles labels and cells, never document text") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q194_cluster_agreement")
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).mkString("\n")
    exchanges should not include "text"
  }

  test("q196 funnel latency: q65's one fact shuffle + bounded percentile windows") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q196_funnel_latency")
    p should not include "Join"
    p should not include "Exchange rangepartitioning" // no global data sort
    // one user_id fact shuffle (q65's) + one for the latency frequency
    // relation — the percentile windows run on the bounded relation
    p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") shouldBe 2
  }

  test("q197 mix diversity is a two-level map-combined aggregate: no joins/windows") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q197_mix_diversity")
    p should not include "Join"
    p.linesIterator.count(_.contains("Window [")) shouldBe 0
    p should not include "Expand"
  }

  test("q199 t-closeness: one customer scan, windows only on the cell relation") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q199_t_closeness")
    p should not include "Join" // global distribution rides windows, not a join
    p.linesIterator.count(_.contains("FileScan parquet")) shouldBe 1
    // 3 window passes (sens / empty / class) + class rollup + final
    // fold all run on the domain-bounded cell relation
    p.linesIterator.count(_.contains("Window [")) should be <= 3
  }

  test("q200 BPE curve: cached dictionary feeds every round, one tiny window") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q200_bpe_compression")
    p should not include "Join"
    p should include("InMemoryTableScan") // bpeDict built once, scanned per round
    p.linesIterator.count(_.contains("Window [")) shouldBe 1 // over ≤3 curve rows
  }

  test("q201/q202 multimodal audits: one asset shuffle, bytes never move") {
    assume(haveData, s"$sfDir not present")
    Seq("q201_audio_vad_spans", "q202_shot_boundaries").foreach { name =>
      val p = plan(name)
      withClue(s"$name:") {
        p should not include "Join"
        // the island/lag window's asset_id partitioning satisfies both
        // downstream aggregates — exactly one exchange end-to-end
        p.sliding("Exchange hashpartitioning".length)
          .count(_ == "Exchange hashpartitioning") shouldBe 1
      }
    }
  }

  test("q203 BFS: frontier loop leaves a joined histogram over cached nodes") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q203_bfs_hops")
    // per-round work lives behind checkpoints; the final plan joins the
    // cached node universe to the settled-distance relation and rolls
    // up the |dists|-row histogram — no corpus rescan ABOVE the cache
    // boundary (the plan string embeds each InMemoryRelation's build
    // lineage, so scans below it are descriptions, not executions)
    p should include("InMemoryTableScan")
    p.substring(0, p.indexOf("InMemoryRelation")) should not include "FileScan"
  }

  test("q204 stationary mix: the returned relation is the checkpointed fixpoint") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q204_stationary_mix")
    // all six iterations ran behind localCheckpoints during
    // construction; the surfaced plan is a projection over the final
    // |types|-row checkpoint — zero joins, zero exchanges
    p should not include "Join"
    p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") shouldBe 0
  }

  test("q205 novelty curve: join-free, windows only on grams and the curve") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q205_novelty_curve")
    // rides the SharedCache'd (source, gram-hash) relation; first-seen
    // attribution is a min() window per gram key and the cumulative
    // column a running sum over the |sources|-row rollup — no join in
    // the whole plan, and exactly those two window passes
    p should not include "Join"
    p.linesIterator.count(_.contains("Window [")) shouldBe 2
  }

  test("q206 DP release: one scan, join-free, noise is a narrow projection") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q206_dp_release")
    p should not include "Join"
    p should not include "Window ["
    p should not include "Expand"
    p.linesIterator.count(_.contains("FileScan parquet")) shouldBe 1
  }

  test("q207 split leakage: Expand-free distinct-split flag") {
    assume(haveData, s"$sfDir not present")
    // the straddle flag is a collect_set window + two-level aggregate,
    // NOT a countDistinct (whose Expand doubles the q55 relation)
    plan("q207_split_leakage") should not include "Expand"
  }

  test("q208 silhouette: join-free narrow map over the cached vectors") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q208_silhouette_audit")
    // the K distances are a transform over the centroid literal and
    // top-2 a sort_array — no join, no window, one map-combined agg
    p should not include "Join"
    p should not include "Window ["
    p should include("InMemoryTableScan") // q57's cached vector relation
  }

  test("q209 zone-map audit: both layout rollups ride one cached cell pass") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q209_zonemap_audit")
    p should not include "Join"
    p should include("InMemoryTableScan") // the (fa, fz) composite cells
    // the union's two legs scan the cache, not the fact table: the only
    // FileScan lives inside the InMemoryRelation's build lineage
    p.substring(0, p.indexOf("InMemoryRelation")) should not include "FileScan"
  }

  test("q210 top component: surfaced relation is the driver-held vector") {
    assume(haveData, s"$sfDir not present")
    // the 6 C·v passes run during construction over the cached
    // vectors (one posexplode + map-combined sum each, no D×D
    // anything); what surfaces is the 64-row final component
    val p = plan("q210_top_component")
    p should include("LocalTableScan")
    p should not include "Join"
  }

  test("q211 leak-free splits: doc-keyed equi-join, Expand-free") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q211_leakfree_splits")
    p should not include "Expand"
    // the doc-universe ⟕ cluster join must be a keyed equi-join
    (p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin")) shouldBe true
  }

  test("q212 curve comparison: three rollups ride one cached cell pass") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q212_curve_comparison")
    p should not include "Join"
    p should include("InMemoryTableScan") // the (fs, fm, fh) composite cells
    p.substring(0, p.indexOf("InMemoryRelation")) should not include "FileScan"
  }

  test("q213 split drift: reference and totals ride broadcast joins") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q213_split_drift")
    p should include("BroadcastHashJoin") // 100-row ref + 3-row totals
    p should not include "Expand"
  }

  test("q214 contrastive pairs: banded candidates only, keyed equi-joins") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q214_contrastive_pairs")
    (p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin")) shouldBe true
  }

  test("q215 count-min: bounded sketch state, broadcast probe") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q215_count_min")
    p should include("BroadcastHashJoin") // 32×4 probes vs ≤4096 cells
    p should include("InMemoryTableScan") // the SharedCache'd sketch
    p should not include "Expand"
  }

  test("q216 preference pairs: one aggregate over a doc-keyed margin join") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q216_preference_pairs")
    p should not include "Expand"
    p should not include "Window [" // extremes are min/max structs, not ranks
    (p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin")) shouldBe true
  }

  test("q217 incremental CC: final relabel is keyed joins over cached labels") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q217_incremental_cc")
    p should include("InMemoryTableScan") // baseLbl + merged label caches
    p should not include "Expand"
  }

  test("q218 quality knapsack: one corpus pass, windows on the source relation") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q218_quality_knapsack")
    p should not include "Join"
    p.linesIterator.count(_.contains("FileScan parquet")) shouldBe 1
  }

  test("q220 source ablation: one corpus pass, LOO algebra on the source relation") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q220_source_ablation")
    p should not include "Join"
    p.linesIterator.count(_.contains("FileScan parquet")) shouldBe 1
  }

  // -- named pins for the round-11 family (q221–q230) ------------------

  test("q221 bloom filter broadcasts to the probe leg; exchanges carry tokens, not docs") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q221_bloom_precheck")
    p should include("BroadcastHashJoin") // ≤m-row filter vs probe bits
    p should not include "Expand"
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).mkString("\n")
    exchanges should not include "text"
  }

  test("q222 AMS counters collapse map-side; downstream runs on 16 cached rows") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q222_ams_f2")
    p should include("InMemoryTableScan") // cached toks + 16-row ests
    p should not include "SortMergeJoin"  // only 1-row grp broadcasts
    p.linesIterator.count(_.contains("Window [")) shouldBe 1 // median-of-4 rank
  }

  test("q223 KMV sketches ride the TopK aggregator; exchanges carry hashes, not text") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q223_kmv_overlap")
    p should include("ObjectHashAggregate") // map-side bottom-k
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).mkString("\n")
    exchanges should not include "text"
  }

  test("q224 all three estimates ride ONE cached (bucket, key) pass") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q224_hist_join_card")
    p should include("InMemoryTableScan")
    // the only FileScan lives inside the cache's build lineage
    p.substring(0, p.indexOf("InMemoryRelation")) should not include "FileScan"
    p should not include "SortMergeJoin"
  }

  test("q225 S-curve: keyed equi-joins only; collision test is in-row") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q225_lsh_scurve")
    (p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin")) shouldBe true
    p should include("arrays_overlap") // no band re-explode on the audit path
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).mkString("\n")
    exchanges should not include "text"
  }

  test("q226 sweep is constant-width folds over cached pairs: no Expand, no per-threshold rescan") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q226_threshold_sweep")
    p should not include "Expand"
    p should include("InMemoryTableScan") // q39's cached pair relation
    // 11 thresholds never multiply scans: above the cache boundary only
    // the doc token-mass leg reads parquet (the plan string embeds each
    // InMemoryRelation's build lineage — q203's technique)
    p.substring(0, p.indexOf("InMemoryRelation"))
      .linesIterator.count(_.contains("FileScan parquet")) should be <= 1
  }

  test("q227 balance audit: q50's one window, rollups reuse its lang partitioning") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q227_shard_balance")
    p should not include "Join"
    p.linesIterator.count(_.contains("Window [")) shouldBe 1
    p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") shouldBe 1
  }

  test("q228 SQ audit: 64-row ranges broadcast back onto the cached dim pass") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q228_sq_audit")
    p should include("BroadcastHashJoin")
    p should include("InMemoryTableScan")
    p should not include "SortMergeJoin"
  }

  test("q229 kappa: two narrow gates, one keyed join, no windows, no Expand") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q229_gate_agreement")
    p should not include "Expand"
    p.linesIterator.count(_.contains("Window [")) shouldBe 0
    (p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin")) shouldBe true
  }

  test("q230 JL audit: literal-matrix projection stays narrow; one keyed pair join") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q230_jl_distortion")
    p.linesIterator.count(_.contains("Window [")) shouldBe 0
    p should not include "Generate" // projection is zip_with folds, no explode
    (p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin")) shouldBe true
  }

  test("q231 two-stage: both top-k stages ride the TopK aggregator, no rank windows") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q231_two_stage")
    p should include("ObjectHashAggregate") // coarse top-16 + exact top-5
    p should include("InMemoryTableScan")   // cached proj/cand/survivors
  }

  test("q232 split shift: one cached cell pass, centroid join broadcasts on dim") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q232_split_shift")
    p should include("BroadcastHashJoin") // 64-row corpus centroid
    p should include("InMemoryTableScan") // the shared (split, dim) cells
    p.substring(0, p.indexOf("InMemoryRelation")) should not include "FileScan"
    p should not include "SortMergeJoin"
  }

  test("q233 HLL adoption: dense grid via in-row explode, keyed joins only") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q233_hll_adoption")
    p should include("Generate") // day×16 spine from sequence explode
    p should not include "SortMergeJoin"
    // running register max + exact running count + carry-forward
    p.linesIterator.count(_.contains("Window [")) should be <= 3
  }

  test("q234 spectrum: windows only on the bucket relation, no joins") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q234_freq_spectrum")
    p should not include "Join"
    p.linesIterator.count(_.contains("Window [")) should be <= 2
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).mkString("\n")
    exchanges should not include "text"
  }

  test("q235 weighted jaccard: exchanges carry hashes and counts, never text") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q235_weighted_jaccard")
    p should include("InMemoryTableScan") // q39 pairs + token counts
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).mkString("\n")
    exchanges should not include "text"
  }

  test("q236 budget sweep: one window pass serves all budgets") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q236_shard_budget_sweep")
    p should not include "Join"
    p.linesIterator.count(_.contains("Window [")) shouldBe 1
    p should include("Generate") // the in-row budget explode
    p.linesIterator.count(_.contains("FileScan parquet")) shouldBe 1
  }

  test("q237 banding sweep: one signature pass, collisions in-row, hashes-only exchanges") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q237_banding_sweep")
    p should include("InMemoryTableScan") // shared sig + per-config bands
    p should include("arrays_overlap")    // truth-pair collision is in-row
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).mkString("\n")
    exchanges should not include "text"
  }

  test("q238 SPRT walk and rank share one per-variant window pass") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q238_sprt_test")
    // cum-sum and row_number differ in frame (two Window nodes) but
    // both live INSIDE the cached walk's build lineage; above the
    // cache boundary the consumers are pure aggregates — no window,
    // no re-sort of the fact stream (count above the first
    // InMemoryRelation: the q203 technique, stable whether or not an
    // earlier suite already materialized the walk)
    p should include("InMemoryTableScan")
    p.substring(0, p.indexOf("InMemoryRelation"))
      .linesIterator.count(_.contains("Window [")) shouldBe 0
  }

  test("q239 bloom audit: keyed equi-joins only, shared cached key relation") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q239_file_bloom_audit")
    p should include("InMemoryTableScan") // (file, key) + bits + probes
    p should include("Generate")          // zone buckets via sequence explode
    (p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin")) shouldBe true
  }

  test("q240 removal effect surfaces the driver-held credit rows") {
    assume(haveData, s"$sfDir not present")
    // every scenario's value iterations ran behind localCheckpoints at
    // construction (q204's discipline); what surfaces is the
    // |channels|-row attribution table
    val p = plan("q240_removal_effect")
    p should include("LocalTableScan")
    p should not include "Join"
  }

  test("q241 probe sweep: one shared pair pass feeds all configs via TopK") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q241_probe_sweep")
    p should include("ObjectHashAggregate") // per-config top-5 folds
    p should include("InMemoryTableScan")   // the shared rank-attached pairs
  }

  test("q242 mirror audit is arithmetic over the cached q115 matrix") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q242_mirror_direction")
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).mkString("\n")
    exchanges should not include "text"
  }

  test("q243 soft weights: doc-keyed join, text never shuffles") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q243_soft_dedup_weights")
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).mkString("\n")
    exchanges should not include "text"
    p should not include "Expand"
  }

  test("q85 edit-distance dedup joins neighborhood keys, never all pairs") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q85_edit_distance_dedup")
    // the candidate join must be an equi-join on nkey (hash or SMJ);
    // the global no-cartesian test already bans the quadratic plan
    (p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin")) shouldBe true
  }

  test("q265 migration: anti-join on hashes, map-combined manifest, text pruned early") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q265_state_migration")
    // the state/insert split is q48's own anti-join shape
    p should include("LeftAnti")
    // the ≤72-cell manifest aggregate map-combines before its shuffle
    p should include("partial_count")
    // document TEXT exists only inside the scan-side md5 projection —
    // after the hash it never rides a shuffle (the q48 discipline);
    // every exchange key is a bucket id or the content hash
    p.linesIterator.filter(_.contains("Exchange hashpartitioning"))
      .foreach { l => l should not include "text" }
  }

  test("q270 backtest: recursion fully in-row — no windows, no joins") {
    assume(haveData, s"$sfDir not present")
    val p = plan("q270_forecast_backtest")
    // the state fold, rolling origins, and eval expansion are all
    // array HOFs on the |types|-row relation: the plan must contain
    // no Window (no per-row sort over data-scaled relations) and no
    // join (the oracle's rn+h join is an in-row element_at here)
    p should not include "Window"
    p should not include "Join"
    // the single data-scaled stage (the (type, day) collapse)
    // map-combines before its exchange
    p should include("partial_sum")
  }

  test("ANN hot loops run the r15 fused kernels, not interpreted HOFs") {
    assume(haveData, s"$sfDir not present")
    // a regression back to the array_sort/transform/aggregate
    // compositions would re-interpret the per-row arithmetic (HOF
    // lambda bodies never whole-stage-codegen) — pin the kernels'
    // presence in the real query plans (AnnKernelsSpec pins their
    // values and codegen placement)
    val p114 = plan("q114_ann_ivf_pq")
    Seq("graft_rank_cells_l2", "graft_pq_encode", "graft_pq_lut",
      "graft_pq_adc").foreach(k => p114 should include(k))
    val p33 = plan("q33_ann_ivf")
    p33 should include("graft_rank_cells_cos")
    p33 should include("graft_quant_e4")
    val p231 = plan("q231_two_stage")
    p231 should include("graft_jl_proj")
  }
}
