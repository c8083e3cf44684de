package graft

/** Plan-quality regression tests: the shapes SCALING.md promises must
  * survive refactors. String checks over the optimized/executed plans at
  * sf0.001 — cheap, and they fail loudly if a rewrite silently
  * reintroduces a second scan or loses a broadcast/reuse. */
class PlanShapeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def executedPlan(q: String): String = {
    // Pins assert COLD-session shapes: queries that cache an internal
    // frame (q_dup_clusters_sig's signatures, the curation corpus) leak
    // their InMemoryRelation into the shared test session, and
    // CacheManager then substitutes it into any later query with a
    // canonically identical subtree — tiny cached stats flip joins to
    // broadcast and erase the exchange the pin asserts on.
    spark.catalog.clearCache()
    val df = SparkEntry.queries(q)(spark, dir)
    df.collect()
    // AQE prints "== Final Plan ==" followed by "== Initial Plan ==";
    // assert on what actually ran.
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
  }

  private def countScans(plan: String): Int =
    "FileScan parquet".r.findAllIn(plan).size

  test("q_zip_by_key reads events exactly once (conditional agg, no join)") {
    val plan = executedPlan("q_zip_by_key")
    assert(countScans(plan) == 1, s"expected 1 scan:\n$plan")
    assert(!plan.contains("Join"), s"one-pass plan must not join:\n$plan")
  }

  test("q_pipeline_forex: pivot feed materialized — no event scan in the plan") {
    // The bounded daily pivot is collected to a LocalRelation at query
    // build (the r7 cache-hygiene change): events are read once,
    // EAGERLY, outside the returned plan, and the four downstream
    // consumers read the embedded table — so the executed plan itself
    // scans no files at all.
    val df = SparkEntry.queries("q_pipeline_forex")(spark, dir)
    df.collect()
    val c = PlanAudit.countNodes(df.queryExecution.executedPlan).withDefaultValue(0)
    assert(c("scans") == 0, "event reads must happen in the eager pivot, not the plan")
    assert(c("localReads") >= 2,
      s"expected multiple LocalRelation consumers, got ${c("localReads")}")
  }

  test("q_join_broadcast broadcasts the dimension side") {
    val plan = executedPlan("q_join_broadcast")
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"fact side must not shuffle:\n$plan")
  }

  test("q_range_join is an equi-join, never a nested loop") {
    val plan = executedPlan("q_range_join")
    assert(!plan.contains("NestedLoop"),
      s"bucketed range join must not degrade to a nested loop:\n$plan")
  }

  test("q_curation_pipeline reads documents only through the checkpointed corpus") {
    // The post-filter corpus is an eager localCheckpoint (r7 hygiene
    // change — no CacheManager entry to leak): the documents scan runs
    // once at materialization, and every downstream branch reads the
    // checkpoint's RDD blocks, so the executed plan has zero file scans
    // and multiple RDD reads.
    val df = SparkEntry.queries("q_curation_pipeline")(spark, dir)
    df.collect()
    val c = PlanAudit.countNodes(df.queryExecution.executedPlan).withDefaultValue(0)
    assert(c("scans") == 0, "every documents read must go through the checkpoint")
    assert(c("rddReads") >= 2, s"expected multiple checkpoint consumers, got ${c("rddReads")}")
  }

  test("q_simhash_pairs computes signatures once (pinned checkpoint or exchange reuse)") {
    // The signature aggregation must run once however it is shared:
    // r22 pins it to an eager localCheckpoint (every branch reads RDD
    // blocks, zero file scans in the final plan); the pre-pin shape
    // shared it through AQE exchange reuse. Accept either proof.
    val df = SparkEntry.queries("q_simhash_pairs")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val c = PlanAudit.countNodes(df.queryExecution.executedPlan)
      .withDefaultValue(0)
    assert((c("scans") == 0 && c("rddReads") >= 2) ||
      plan.contains("ReusedQueryStage") || plan.contains("ReusedExchange"),
      s"expected the signature aggregate to run once (pinned blocks or " +
        s"reused exchange): scans=${c("scans")} rddReads=${c("rddReads")}\n$plan")
  }

  test("q_pivot is one scan + conditional aggregation (no discovery job)") {
    val plan = executedPlan("q_pivot")
    assert(countScans(plan) == 1,
      s"explicit pivot values must not add a distinct-values scan:\n$plan")
    assert(!plan.contains("Join"), s"pivot must not plan a join:\n$plan")
  }

  test("q_window_sliding expands buckets map-side over a single scan") {
    val plan = executedPlan("q_window_sliding")
    assert(countScans(plan) == 1, s"expected 1 scan:\n$plan")
    assert(plan.contains("Expand") || plan.contains("explode"),
      s"overlapping windows must expand map-side:\n$plan")
  }

  test("q_winsorize broadcasts the per-group bounds (fact side never shuffles)") {
    val plan = executedPlan("q_winsorize")
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast bounds join:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the clipped side must stream map-side:\n$plan")
  }

  test("q_winsorize_approx broadcasts the sketch bounds like the exact path") {
    val plan = executedPlan("q_winsorize_approx")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"expected broadcast bounds join:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the fact side must stream map-side:\n$plan")
  }

  test("q_contamination broadcasts the capped bench side (train never shuffles for the join)") {
    val plan = executedPlan("q_contamination")
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast shingle join:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"train-side shingles must stream map-side, not shuffle:\n$plan")
  }

  test("q_oov_ratio: top-k vocab via TakeOrdered heap, broadcast membership join") {
    val plan = executedPlan("q_oov_ratio")
    assert(plan.contains("TakeOrderedAndProject"),
      s"global top-k must be a per-partition heap, not a global sort:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"vocab membership must broadcast, the corpus side must not shuffle:\n$plan")
  }

  test("q_weighted_sample: bounded-k draw is a heap, never a full sort") {
    val plan = executedPlan("q_weighted_sample")
    assert(plan.contains("TakeOrderedAndProject"),
      s"A-ES top-k must run as a per-partition k-heap:\n$plan")
  }

  test("q_ann_quantized broadcasts the quantized queries (corpus never shuffles)") {
    val plan = executedPlan("q_ann_quantized")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"quantized query side must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"the corpus codes must stream through one task set:\n$plan")
  }

  test("q_rep_ngram_top: two shuffles total; final agg reuses the window's partitioning") {
    // The claim in TextAnalysis.ngramRepetition: shuffle 1 = the
    // (doc, gram) count agg, shuffle 2 = the doc-key window, and the
    // closing per-doc groupBy must ride the window's hash partitioning
    // (a third exchange would mean the grouping no longer satisfies
    // ClusteredDistribution). The join back to the full doc list must
    // broadcast the narrow per-doc signal side, never shuffle the corpus.
    spark.catalog.clearCache()
    val df = SparkEntry.queries("q_rep_ngram_top")(spark, dir)
    df.collect()
    val c = PlanAudit.countNodes(df.queryExecution.executedPlan).withDefaultValue(0)
    // +1 for the presentation ORDER BY's range exchange (collect() keeps
    // it; Bench's aggregate consumer eliminates it).
    assert(c("shuffles") <= 3,
      s"expected (doc,gram) agg + window + presentation sort only, got ${c("shuffles")} shuffles")
    assert(c("broadcasts") == 1,
      s"per-doc signals must broadcast into the left join, got ${c("broadcasts")}")
  }

  test("q_length_bins broadcasts the percentile boundaries (fact side never shuffles for the join)") {
    val plan = executedPlan("q_length_bins")
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast boundaries join:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the binned side must stream map-side:\n$plan")
    assert(!plan.contains("Window"),
      s"binning must not fall back to an ntile window (global sort in one task):\n$plan")
  }

  test("q_ohlc_bars is one combine-enabled aggregate — no window sort") {
    val plan = executedPlan("q_ohlc_bars")
    assert(!plan.contains("Window"),
      s"bar endpoints must come from min_by/max_by in the agg, not a per-bar window sort:\n$plan")
    assert(plan.contains("partial_min_by") || plan.contains("HashAggregate"),
      s"expected a partial-aggregable hash agg:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"tick resampling must shuffle exactly once, on the bar key:\n$plan")
  }

  test("q_key_skew: bounded top-k is a heap, never a full sort") {
    val plan = executedPlan("q_key_skew")
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected per-partition k-heap + merge:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"the 1-row totals must broadcast:\n$plan")
  }

  test("q_linear_trend: moment aggregate reuses the rank window's partitioning") {
    val plan = executedPlan("q_linear_trend")
    // One exchange feeds the window; the groupBy on the same key must
    // not re-shuffle. (The trailing presentation sort's exchange is
    // eliminated under aggregation — not visible here either way.)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 2,
      s"moment groupBy re-shuffled the ranked rows:\n$plan")
    assert(plan.contains("Window"), s"expected the rank window:\n$plan")
  }

  test("q_corpus_overlap: one fingerprint shuffle, no join, no per-side distinct") {
    val plan = executedPlan("q_corpus_overlap")
    assert(!plan.contains("Join"), s"presence flags come from the agg, never a join:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"per-side distincts would add fp shuffles — the groupBy's partial max is the dedup:\n$plan")
  }

  test("q_ann_ivf_pq: lists scan statically prunes to probed partitions, code column only") {
    // The persisted IVF searches collect the (driver-bounded) probed
    // list ids and filter the partitioned scan with a literal IN —
    // runtime DPP plans as dynamicpruningexpression(true), i.e. NO
    // pruning, for this broadcast shape, so the static filter is the
    // only thing keeping a 100 TB index scan to nProbe/nLists.
    val plan = executedPlan("q_ann_ivf_pq")
    val scan = plan.split("\n")
      .find(l => l.contains("FileScan parquet") && l.contains("__pq"))
      .getOrElse(fail(s"no lists scan found:\n$plan"))
    assert(scan.contains(" IN (") && scan.contains("PartitionFilters"),
      s"expected a static partition IN filter on the lists scan:\n$scan")
    assert(!scan.contains("__codes") && !scan.contains("embedding"),
      s"ADC search must read ONLY the PQ code column of the index:\n$scan")
    assert(plan.contains("BroadcastHashJoin"),
      s"probes must broadcast — the corpus never shuffles:\n$plan")
  }

  test("q_winnow_fp: the selection never leaks into a pushed-down filter") {
    // The r12 InferFiltersFromGenerate hazard (SCALING.md): a plain
    // explode over the selection array let the optimizer push a size()
    // predicate to the scan with the WHOLE pipeline inlined —
    // re-evaluating the native selection per row per reference. The
    // guard: winnow_select appears exactly once in the optimized plan,
    // and the scan's data filters never mention it.
    val df = SparkEntry.queries("q_winnow_fp")(spark, dir)
    val plan = df.queryExecution.optimizedPlan.toString
    val n = "winnow_select".r.findAllIn(plan).size
    assert(n == 1, s"expected exactly one winnow_select, got $n:\n$plan")
    val physical = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val scanSection = physical.split("FileScan parquet").last
    assert(!scanSection.contains("winnow_select"),
      s"selection must not run inside the scan filter:\n$scanSection")
  }

  test("q_semdedup: in-cluster pairs only — the join is keyed on the cluster id") {
    val plan = executedPlan("q_semdedup")
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      s"SemDeDup must never go all-pairs:\n$plan")
    assert(plan.contains("list"), s"pair join keys on the cluster id:\n$plan")
  }

  test("writeZOrdered plans one range shuffle and an in-partition sort") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val grid = (for (x <- 0 until 16; y <- 0 until 16) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val laid = grid
      .withColumn("__z", graft.ext.Export.zorderKey(Seq(col("x"), col("y")), 4))
      .repartitionByRange(4, col("__z"))
      .sortWithinPartitions(col("__z"))
    laid.collect()
    val plan = laid.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("rangepartitioning"),
      s"range shuffle on the Morton key:\n$plan")
    assert(!plan.contains("Sort [__z") || !plan.contains("global=true"),
      s"never a global single-task sort:\n$plan")
  }

  test("q_bm25 broadcasts the query terms (corpus never shuffles for the search)") {
    val plan = executedPlan("q_bm25")
    assert(plan.contains("BroadcastHashJoin"),
      s"query-term join must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"scoring joins stay keyed:\n$plan")
  }

  test("q_dedup_incremental reads the batch through its checkpoint (survivors materialized once)") {
    // The exact-pass survivors are an eager localCheckpoint (r7 hygiene
    // change); the fresh-consuming branches read its RDD blocks while
    // the reference side still streams from parquet, column-pruned.
    val df = SparkEntry.queries("q_dedup_incremental")(spark, dir)
    df.collect()
    val c = PlanAudit.countNodes(df.queryExecution.executedPlan).withDefaultValue(0)
    assert(c("rddReads") >= 2,
      s"the fresh-consuming branches must share the checkpoint, got ${c("rddReads")} RDD reads")
    assert(c("scans") >= 1,
      "the reference side must still stream from storage, never be materialized")
  }

  test("q_quality_classifier: model join is broadcast, corpus shuffles once") {
    val df = SparkEntry.queries("q_quality_classifier")(spark, dir)
    df.collect()
    val c = PlanAudit.countNodes(df.queryExecution.executedPlan).withDefaultValue(0)
    assert(c("broadcasts") >= 1, "the weight table must broadcast")
    // one per-doc agg + the presentation sort = 2 exchanges max
    assert(c("shuffles") <= 2,
      s"corpus must shuffle only for the per-doc agg (+sort), got ${c("shuffles")}")
    assert(c("scans") == 1, "one corpus scan — the model is a Range, not a file")
  }

  test("q_dedup_spans_removed runs ONE gram pass (two doc scans total)") {
    val plan = executedPlan("q_dedup_spans_removed")
    // documents scans: the gram side and the rewrite side — the span
    // detector must NOT re-derive grams per consumer.
    assert(countScans(plan) == 2, s"expected 2 scans: $plan")
  }

  test("q_embed_rp is map-only: one scan, no exchange, no join") {
    val plan = executedPlan("q_embed_rp")
    assert(countScans(plan) == 1, s"expected 1 scan:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"projection must not shuffle the corpus:\n$plan")
    assert(!plan.contains("Join"), s"map-only plan must not join:\n$plan")
  }

  test("q_embed_center: means broadcast back, corpus never hash-shuffles") {
    val plan = executedPlan("q_embed_center")
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"single-row means must ride a broadcast:\n$plan")
    assert(countScans(plan) == 2,
      s"one stats pass + one centering pass:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"corpus must not hash-shuffle (only the single-partition agg):\n$plan")
  }

  test("q_event_funnel: three filtered scans, keyed joins only, no cartesian") {
    val plan = executedPlan("q_event_funnel")
    assert(countScans(plan) == 3, s"one filtered scan per step:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"funnel joins must be keyed:\n$plan")
  }

  test("q_cohort_retention: two event scans, keyed join, no cartesian") {
    val plan = executedPlan("q_cohort_retention")
    assert(countScans(plan) == 2, s"first-day pass + return pass:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
  }

  test("q_pack_boundaries: two exchanges (shard, then pack windows), no join") {
    val plan = executedPlan("q_pack_boundaries")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 2, s"prefix window + pack windows only:\n$plan")
    assert(!plan.contains("Join"), s"boundary table needs no join:\n$plan")
  }

  test("q_tpch_q10 broadcasts the nation dim") {
    val plan = executedPlan("q_tpch_q10")
    assert(plan.contains("BroadcastHashJoin"), s"nation must broadcast:\n$plan")
  }

  test("q_moment_stats is ONE combine-enabled aggregate: single scan, no window, no join") {
    val plan = executedPlan("q_moment_stats")
    assert(countScans(plan) == 1, s"one pass:\n$plan")
    assert(!plan.contains("Window") && !plan.contains("Join"),
      s"power sums need no window or join:\n$plan")
  }

  test("q_json_extract: one scan, extraction stays in codegen, no join") {
    val plan = executedPlan("q_json_extract")
    assert(countScans(plan) == 1 && !plan.contains("Join"), s"map+agg only:\n$plan")
    // codegen stages print as "*(n)" in the simple plan string
    assert(plan.contains("*("), s"extraction must stay in codegen:\n$plan")
  }

  test("q_collocations: count tables meet in joins, top-k is a heap") {
    val plan = executedPlan("q_collocations")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must be a per-partition heap:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
  }

  test("q_domain_cap: PSL rule joins all broadcast, one corpus scan, one shuffle") {
    // The r13→r14 quiet-bench wobble on this query (0.74–1.19 s across
    // runs of IDENTICAL code; url_normalize/domain_block wobble in the
    // same runs) is host variance, not a plan change — this pin makes
    // any REAL regression (a rule join falling to sort-merge, a second
    // corpus scan, an extra shuffle) fail loudly instead of reading as
    // noise. Shape: map-only URL parse → per-width broadcast rule
    // joins → ONE hash shuffle for the per-domain sample window.
    val plan = executedPlan("q_domain_cap")
    assert(!plan.contains("SortMergeJoin"),
      s"PSL rule tables must broadcast:\n$plan")
    assert(countScans(plan) == 1, s"one corpus scan:\n$plan")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles <= 1,
      s"expected at most the window's shuffle, got $shuffles:\n$plan")
  }

  test("q_tpch_q9: selective part dim broadcasts ahead of the orders shuffle") {
    val plan = executedPlan("q_tpch_q9")
    assert(plan.contains("BroadcastHashJoin"),
      s"part/supplier/nation must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
    // lineitem, part, supplier, orders, nation = 5 scans, one each.
    assert(countScans(plan) == 5, s"each table scanned once:\n$plan")
  }

  test("q_attribution: one window over one events scan — never a conversion×touch join") {
    // The naive attribution plan is a per-user range join (conversions
    // × touches); the op's contract is ONE user-partitioned window. A
    // Join or a second events scan here is the Θ(convs·touches)
    // regression.
    val plan = executedPlan("q_attribution")
    assert(countScans(plan) == 1, s"one events scan:\n$plan")
    assert(!plan.contains("Join"), s"window, not a range join:\n$plan")
    assert(plan.contains("Window"), s"the range-frame window:\n$plan")
  }

  test("multi-touch attribution: every model is one window, one scan, zero joins") {
    // The credit-split temptation is a conversion×touch pair join; the
    // operator's contract is that linear, position, AND decay all stay
    // a single user-partitioned range window over one events scan (the
    // bounded channel-list collect happens outside the returned plan).
    for (q <- Seq("q_attr_linear", "q_attr_position", "q_attr_decay",
        "q_attr_shapley")) {
      val plan = executedPlan(q)
      assert(countScans(plan) == 1, s"$q: one events scan:\n$plan")
      assert(!plan.contains("Join"), s"$q: window, not a pair join:\n$plan")
      val windows = "Window".r.findAllIn(plan).size
      assert(windows == 1, s"$q: all aggregates share ONE WindowExec:\n$plan")
    }
  }

  test("q_attr_shapley: weights fold row-locally — no weight-table join, credits conserve value") {
    // The (k, n) weight table is a LITERAL map folded by HOFs, never a
    // join side; and because Σ_k w(k,n) = 1 exactly at the 1e18 fixed
    // point, total credited value must equal total conversion value up
    // to the per-credit 6dp rounding (bounded by #credit cells).
    val plan = executedPlan("q_attr_shapley")
    assert(!plan.contains("Join"), s"weight lookup must not join:\n$plan")
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val credited = SparkEntry.queries("q_attr_shapley")(spark, dir)
      .agg(sum("credit")).head().getDouble(0)
    val total = spark.read.parquet(s"$dir/events.parquet")
      .filter(col("event_type") === "purchase")
      .agg(sum(round(col("value"), 6))).head().getDouble(0)
    assert(math.abs(credited - total) < 5e-3,
      s"credits must conserve conversion value up to 6dp-per-cell " +
        s"rounding: $credited vs $total")
  }

  test("q_tpch_q8: part filter broadcasts ahead of the orders shuffle; no cartesian") {
    val plan = executedPlan("q_tpch_q8")
    assert(plan.contains("BroadcastHashJoin"),
      s"the 1/6 p_type slice must broadcast into lineitem:\n$plan")
    val smj = "SortMergeJoin".r.findAllIn(plan).size
    assert(smj <= 2,
      s"at most the orders and customer joins may shuffle ($smj):\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      s"no quadratic fallback:\n$plan")
  }

  test("q_tpch_q12: one lineitem scan + one orders scan feed a single join and one two-way agg") {
    val plan = executedPlan("q_tpch_q12")
    assert(countScans(plan) == 2, s"lineitem + orders, once each:\n$plan")
    val joins = "SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin"
      .r.findAllIn(plan).size
    assert(joins == 1, s"exactly ONE orderkey join ($joins):\n$plan")
    assert(!plan.contains("Window"),
      s"the severity pivot is a CASE aggregate, not a window:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
  }

  test("q_tpch_q16: dims broadcast, blacklist is an anti join, lineitem scanned once") {
    val plan = executedPlan("q_tpch_q16")
    // ≤ 3: AQE may eliminate the blacklist scan outright when the
    // negative-balance side is empty at this SF — fewer is fine, a
    // SECOND fact scan is what the pin forbids.
    assert(countScans(plan) <= 3, s"lineitem + part + supplier:\n$plan")
    assert("lineitem".r.findAllIn(plan).size <= 1,
      s"the distinct-agg must not re-scan the fact:\n$plan")
    // AQE elides the anti join at runtime when the blacklist side is
    // EMPTY at this SF (empty-relation propagation — keeping every row
    // is exactly the anti join's answer), so the join-shape pin reads
    // the optimized LOGICAL plan: a per-row NOT IN subquery or a
    // cartesian would show up there whatever the runtime data.
    spark.catalog.clearCache()
    val logical = SparkEntry.queries("q_tpch_q16")(spark, dir)
      .queryExecution.optimizedPlan.toString
    assert(logical.contains("LeftAnti"),
      s"the complaint blacklist must be an anti join:\n$logical")
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
  }

  test("q_markov_transitions: one events scan, zero joins — never a journey self-join") {
    // The tempting shape is a journeys×events join to find terminals;
    // the operator's contract is windows over ONE scan plus a bounded
    // (from, to) count agg.
    val plan = executedPlan("q_markov_transitions")
    assert(countScans(plan) == 1, s"one events scan:\n$plan")
    assert(!plan.contains("Join"), s"windows, not a self-join:\n$plan")
    assert(plan.contains("Window"), s"the journey windows:\n$plan")
  }

  test("q_tpch_q4: EXISTS is a semi join; quarter filter pushed to the orders scan") {
    val plan = executedPlan("q_tpch_q4")
    assert(plan.contains("LeftSemi"), s"EXISTS must be a semi join:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
    assert(countScans(plan) == 2, s"orders + lineitem, once each:\n$plan")
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderdate), " +
      "GreaterThanOrEqual(o_orderdate"),
      s"quarter filter must reach the orders scan:\n$plan")
  }

  test("q_tpch_q6: every predicate and the narrow projection reach the scan") {
    val plan = executedPlan("q_tpch_q6")
    assert(countScans(plan) == 1 && !plan.contains("Join"),
      s"single-scan aggregate:\n$plan")
    // PushedFilters renders truncated ("GreaterThanOrEqual(l_shipda...")
    // so assert the pushdown on its stable prefix and the residual
    // Filter node via regex (expr ids vary run to run).
    assert(plan.contains("GreaterThanOrEqual(l_shipda"),
      s"shipdate range must reach PushedFilters:\n$plan")
    assert("l_quantity#\\d+ < 24\\.0".r.findFirstIn(plan).isDefined,
      s"quantity predicate must be in the scan's Filter:\n$plan")
    // ReadSchema must carry ONLY the 4 referenced columns.
    val schema = "ReadSchema: [^\\n]*".r.findFirstIn(plan).getOrElse("")
    assert(Seq("l_shipdate", "l_discount", "l_quantity", "l_extendedprice")
      .forall(schema.contains) && !schema.contains("l_orderkey"),
      s"scan must prune to the 4 used columns: $schema")
  }

  test("q_tpch_q13: outer join preserved — the zero-order bucket is the point") {
    val plan = executedPlan("q_tpch_q13")
    assert(plan.contains("LeftOuter"),
      s"priority term must stay IN the outer join, not demote it:\n$plan")
    assert(countScans(plan) == 2, s"customer + orders, once each:\n$plan")
  }

  test("q_tpch_q17: correlated avg decorrelates to ONE window — no second lineitem scan") {
    val plan = executedPlan("q_tpch_q17")
    assert(countScans(plan) == 2, s"lineitem + part, once each:\n$plan")
    assert(plan.contains("Window"), s"per-part stats via window:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"filtered part dim must broadcast:\n$plan")
  }

  test("q_tpch_q22: scalar threshold broadcasts; NOT EXISTS is an anti join") {
    val plan = executedPlan("q_tpch_q22")
    assert(plan.contains("LeftAnti"),
      s"NOT EXISTS must be an anti join:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"the 1-row threshold must broadcast (BNLJ), never cartesian:\n$plan")
  }

  test("q_tpch_q21: exists/not-exists compile to semi/anti joins, never per-row subqueries") {
    val plan = executedPlan("q_tpch_q21")
    assert(plan.contains("LeftSemi"), s"EXISTS must be a semi join:\n$plan")
    assert(plan.contains("LeftAnti"), s"NOT EXISTS must be an anti join:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      s"no quadratic fallback:\n$plan")
  }

  test("q_tpch_q2: correlated MIN decorrelates to ONE pair agg + window — no self-join re-scan") {
    val plan = executedPlan("q_tpch_q2")
    assert(countScans(plan) == 5,
      s"lineitem, part, supplier, nation, region — once each:\n$plan")
    assert(plan.contains("Window"),
      s"per-part min must be a window over the pair agg:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      s"no quadratic fallback:\n$plan")
  }

  test("q_tpch_q20: two-level nested IN decorrelates to one agg + window + semi joins") {
    val plan = executedPlan("q_tpch_q20")
    assert(countScans(plan) == 4,
      s"lineitem, part, supplier, nation — once each (the part total is a window over the SAME pair agg, never a second lineitem scan):\n$plan")
    assert(plan.contains("Window"),
      s"part total must be a window over the pair agg:\n$plan")
    assert(plan.contains("LeftSemi"),
      s"both INs must compile to semi joins:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
  }

  test("q_tpch_q15: revenue agg pinned once — lineitem never re-scanned for the scalar MAX") {
    val plan = executedPlan("q_tpch_q15")
    val liScans = "lineitem".r.findAllIn(plan).size
    assert(liScans <= 1,
      s"the max side and the filter side must both read the pinned suppkey agg:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"the 1-row max must broadcast, never cartesian:\n$plan")
  }

  test("q_tpch_q11: part-value agg pinned once — the 1/1000 threshold never re-scans lineitem") {
    val plan = executedPlan("q_tpch_q11")
    val liScans = "lineitem".r.findAllIn(plan).size
    assert(liScans <= 1,
      s"the total side and the filter side must both read the pinned partkey agg:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"the 1-row total must broadcast, never cartesian:\n$plan")
  }

  test("q_tpch_q19: disjunctive predicate splits — part side broadcasts pre-filtered") {
    val plan = executedPlan("q_tpch_q19")
    assert(plan.contains("BroadcastHashJoin"),
      s"the brand/size-pruned part dim must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      s"the OR-of-ANDs must stay an equi-join residual, never a cross product:\n$plan")
  }

  test("containment: df-cap is the DEFAULT shape — anti join, pinned explosion, ZERO windows") {
    // The r15 rework: the generous df-cap is ON by default; it compiles
    // to an anti join against the tiny hot-shingle list (AQE picks
    // broadcast vs shuffle — no forced hint, r14 ADVICE), the (doc, na,
    // shingle) explosion is pinned ONCE (localCheckpoint → RDD scan)
    // so tokenize+explode never recomputes, and the |A| denominator is
    // size() of the exploded array — NO window in any shape (r14's
    // count-window re-shuffled the full explosion; measured 2.26 →
    // 1.66-1.72 s isolated at sf0.1). The exact form is opt-in
    // (maxShingleDf = Int.MaxValue) and compiles with no anti join and
    // no pin.
    def windows(p: String) = "Window".r.findAllIn(p).size
    def antis(p: String) = "LeftAnti".r.findAllIn(p).size
    // Join-type pins read the OPTIMIZED LOGICAL plan: at sf0.001 the
    // hot list is EMPTY and AQE (correctly) erases an anti join with
    // an empty build side from the executed plan — the logical shape
    // is what must not regress to a window.
    for (name <- Seq("q_containment_pairs", "q_containment_capped")) {
      val df = SparkEntry.queries(name)(spark, dir)
      val logical = df.queryExecution.optimizedPlan.toString
      assert(antis(logical) >= 1, s"$name cap must be an anti join:\n$logical")
      assert(logical.contains("LogicalRDD") || logical.contains("Scan ExistingRDD"),
        s"$name must read the pinned explosion, not recompute it:\n$logical")
      val p = executedPlan(name)
      assert(windows(p) == 0,
        s"$name must carry NO window (|A| is size() at explode), got ${windows(p)}:\n$p")
    }
    val docs = graft.sources.Tables.table(spark, dir, "documents")
    val uncapped = graft.ext.Dedup.containmentPairs(docs, "doc_id", "text",
      3, 0.6, maxShingleDf = Int.MaxValue)
    uncapped.collect()
    val off = uncapped.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(antis(off) == 0 && windows(off) == 0,
      s"explicit uncap must drop the anti join and carry no window: " +
        s"antis=${antis(off)} windows=${windows(off)}")
    assert(!off.contains("Scan ExistingRDD"),
      "explicit uncap must not pin (pin-free two-branch plan)")
  }
}
