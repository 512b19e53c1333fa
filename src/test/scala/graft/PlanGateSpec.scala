package graft

import org.apache.spark.sql.execution.ExplainMode

/** Plan-shape regression gate: a refactor must not silently lose
  * predicate pushdown, column pruning, or a broadcast decision, and must
  * never introduce an all-pairs join. PlanAudit dumps these plans for
  * humans; this spec pins the load-bearing properties in CI.
  *
  * Plans are built at sf0.001 — plan SHAPE (pushdown, join strategy
  * whitelists) is what is asserted, not size-dependent AQE choices.
  */
class PlanGateSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("q01/q04: filters reach the parquet scan; q01 prunes columns") {
    val p1 = planOf("q01_groupby_agg")
    assert(p1.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      s"q01 lost shipdate pushdown:\n$p1")
    // 4 of 11 lineitem columns are needed; the scan must not read the
    // rest (l_tax rides along with nothing in q01)
    assert(!p1.contains("l_tax"), s"q01 scan stopped pruning columns:\n$p1")
    val p4 = planOf("q04_filter_algebra")
    assert(p4.contains("PushedFilters:") &&
      p4.contains("IsNotNull(c_acctbal)"),
      s"q04 lost predicate pushdown:\n$p4")
  }

  test("q03: sampled key set broadcasts back onto the fact side") {
    val p = planOf("q03_sample_joinback")
    assert(p.contains("BroadcastHashJoin"),
      s"q03 join-back no longer broadcasts:\n$p")
  }

  test("q100: the KMV sketch aggregates map-side — partial sketch " +
    "before the exchange, so the shuffle carries buffers, not grams") {
    val p = planOf("q100_kmv_distinct")
    assert(p.contains("partial_graft_kmv_sketch"),
      s"q100 lost its map-side partial sketch aggregation:\n$p")
    // and the scan reads only the two needed columns
    assert(p.contains("ReadSchema: struct<text:string,source:string>"),
      s"q100 scan stopped pruning columns:\n$p")
  }

  test("q104: the bottom-k sample aggregates map-side — the shuffle " +
    "carries ≤ k-pair buffers per group, not rows") {
    val p = planOf("q104_sample_quantiles")
    assert(p.contains("partial_graft_bottomk"),
      s"q104 lost its map-side partial sample aggregation:\n$p")
  }

  test("q55: the bloom probe survives in the plan (dropping it would be " +
    "row-invisible — only the oracle-blind scale behavior regresses)") {
    val p = planOf("q55_decontaminate_bloom")
    assert(p.contains("graft_bloom_might_contain"),
      s"q55 lost its scan-stage bloom prefilter:\n$p")
  }

  test("two-level prefix sums (q40/q63): the totals branch REUSES the " +
    "level-1 window shuffle — one corpus scan, not two") {
    // the sum(tokens)-over-input formulation silently planned a SECOND
    // full scan + tokenize + shuffle for the per-bucket totals (Catalyst
    // prunes an unreferenced Window and re-derives from the scan); the
    // max(inclusive-prefix) formulation forces the totals to consume the
    // window output, and AQE then reuses the shuffle stage. Reuse is a
    // RUNTIME decision, so assert on the final adaptive plan.
    for (name <- Seq("q40_token_shards", "q63_token_quota",
      "q86_global_shuffle")) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.queryExecution.toRdd.count() // drive AQE to the final plan
      val full = df.queryExecution.executedPlan.toString
      val finalPlan = full.split("== Initial Plan ==").head
      assert(finalPlan.contains("ReusedExchange"),
        s"$name: totals branch no longer reuses the window exchange:\n" +
          finalPlan)
      val scans = "FileScan parquet".r.findAllIn(finalPlan).length
      assert(scans == 1,
        s"$name: $scans corpus scans in the final plan (want 1):\n" +
          finalPlan)
    }
    // the whale-safe sessionizer has the same two-level shape; its
    // offsets branch aggregates window outputs (_lflag), so the shared
    // shuffle must be reused the same way
    import spark.implicits._
    val ev = (0 until 64).map(i => (i.toLong,
      new java.sql.Timestamp(1700000000000L + i * 60000L),
      (i % 4).toLong, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "kind", "value", "payload")
    val sess = graft.streaming.EventOps.sessionizeScalable(ev,
      gapMinutes = 30, bucketMinutes = 120)
    sess.queryExecution.toRdd.count()
    val sessPlan = sess.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(sessPlan.contains("ReusedExchange"),
      s"sessionizeScalable lost its level-1 exchange reuse:\n$sessPlan")
  }

  test("q76/q77: the fit tables are lineage-cut — scoring scans the " +
    "corpus at the algorithm's minimum, not once per derived table") {
    // without the localCheckpoint cuts the B-row marginal/LM tables
    // drag the corpus explode+aggregate into every consumer (audited:
    // 10 scans each); the cut pins DSIR at 2 and the LM scorer at ≤ 4
    // (fit join + score join + ids pass)
    def scans(name: String): Int =
      "Scan parquet".r.findAllIn(planOf(name)).size
    val dsir = scans("q76_dsir")
    assert(dsir <= 2, s"q76 re-derives its fit tables: $dsir scans")
    val lm = scans("q77_lm_score")
    assert(lm <= 4, s"q77 re-derives its LM tables: $lm scans")
  }

  test("q78/q80: retrieval probes the index via a broadcast hash join; " +
    "the skew top-k never plans a global sort") {
    // BM25 serving: the query-term idf slice must BROADCAST into the
    // posting join — a shuffled join there would repartition the whole
    // inverted index per query batch
    val p78 = planOf("q78_bm25")
    assert(p78.contains("BroadcastHashJoin"),
      s"q78 no longer broadcasts the query-term slice:\n$p78")
    // heavy-hitter report: top-k via per-partition heaps
    // (TakeOrderedAndProject), not Sort+Limit over all keys
    val p80 = planOf("q80_key_skew")
    assert(p80.contains("TakeOrderedAndProject"),
      s"q80 lost its heap-based top-k:\n$p80")
  }

  test("q196/q197: dim filters push to the scans, dims broadcast, " +
    "the ordered top-10 is TakeOrdered") {
    val p196 = planOf("q196_shipping_priority")
    assert(p196.contains("BroadcastHashJoin"),
      s"q196 lost its dim broadcast:\n$p196")
    assert(p196.contains("PushedFilters") &&
      p196.contains("IsNotNull(c_mktsegment)"),
      s"q196 lost the segment pushdown:\n$p196")
    assert(p196.contains("TakeOrderedAndProject"),
      s"q196 lost heap top-k:\n$p196")
    val p197 = planOf("q197_local_supplier_volume")
    assert(p197.contains("BroadcastHashJoin"),
      s"q197 lost its dim broadcasts:\n$p197")
    assert("BroadcastHashJoin".r.findAllIn(p197).size >= 3,
      s"q197 should broadcast at least three dim joins:\n$p197")
  }

  test("no gate query plans a partition-less WindowExec — a global " +
    "window funnels its whole input through one reducer") {
    // sanctioned exceptions, both windows over BOUNDED inputs:
    // - q91: unimaxQuotas' waterfill runs a global window over the
    //   PER-CLASS token-count table — G rows (languages/sources:
    //   thousands at most), never the corpus, and its closed form
    //   needs the total order (Relational.scala unimaxQuotas
    //   docstring).
    // - q86: globalShuffle is hashRankedCum with a CONSTANT class, so
    //   Catalyst folds the level-2 offsets window's partition spec to
    //   empty — but that window runs over the bucket-totals table,
    //   16^hashPrefixLen rows (65,536 at the default) regardless of
    //   corpus size, by construction.
    // Everything else must bucket (the two-level prefix-sum
    // discipline: hashRankedCum, percentileBuckets, vocabCoverage).
    // - q241: Kaplan-Meier's at-risk suffix and log-survival prefix
    //   windows run over the DISTINCT-LIFETIME table — ≤ max observed
    //   lifetime rows (days, not users), bounded by construction; the
    //   product-limit estimator needs the total time order.
    // - q250: opqPermutation ranks the PER-DIMENSION residual-energy
    //   table — exactly `dim` (64) rows of model metadata, never the
    //   corpus; the serpentine deal needs the total energy order.
    // - q253: Neyman's largest-remainder rank runs over the
    //   |strata|-row allocation table — bounded model metadata
    //   (languages/sources), never the corpus; the remainder
    //   distribution needs the total fraction order.
    // - q257: Nelson-Aalen shares q241's machinery — suffix/prefix
    //   windows over the bounded distinct-lifetime table.
    // - q259: BH's rank runs over the m-row hypothesis table —
    //   bounded (one row per test), never the corpus; the step-up
    //   rule needs the total p order.
    // - q267: Mann-Whitney's rank window runs over the DISTINCT
    //   cent-value table (value-space-bounded, q264's discipline) —
    //   the rank-sum needs the total value order.
    // - q269: Gini's cumulative window runs over the DISTINCT
    //   per-user-count table — ≤ max user activity rows, bounded by
    //   construction; the Lorenz order is the statistic.
    val globalWindowWhitelist = Set("q91_unimax_sample",
      "q86_global_shuffle", "q241_kaplan_meier", "q250_opq_residual",
      "q253_neyman_sample", "q257_nelson_aalen", "q259_bh_fdr",
      "q264_conformal", // cumulative counts over DISTINCT residual
                        // values — value-space-bounded, q36 discipline
      "q267_mann_whitney", "q269_gini",
      "q277_trimmed_means", // same distinct-cent cumulative table
      "q278_log_rank", // q241's bounded distinct-lifetime suffix windows
      "q281_kruskal_wallis", // MWU's distinct-cent rank window
      "q287_rmst", // q241's bounded distinct-lifetime KM windows
      "q292_quantile_normalize", // pooled distinct-cent cumulative
                                 // window (value-space-bounded, q36)
      "q294_mad", // two distinct-value cumulative medians (q36)
      "q301_by_fdr", // q259's bounded hypothesis-table rank window
      "q319_holm", // the same bounded hypothesis-table rank window
      "q302_hazard_ratio", // q278's bounded distinct-lifetime windows
      "q313_ks", // distinct-cent cumulative CDF window (q36)
      "q314_msprt") // bounded distinct-day cumulative/min windows
    val eager = Set("q26_ingest_roundtrip", "q105_bpe_learn",
      "q125_streaming_funnel_replay", "q129_streaming_retention_replay",
      "q244_streaming_agg_replay", "q248_preflight_artifact",
      "q249_streaming_latency_replay", "q265_pq_index_delete",
      "q272_streaming_sessions_replay", "q290_bm25_index",
      "q291_bm25_index_delete", "q293_signed_index_lifecycle",
      "q296_logistic_fit", "q297_logistic_filter",
      "q300_persisted_hybrid", "q307_ann_index_lifecycle",
      "q309_mondrian", "q318_ipw", "q321_bm25_time_travel",
      "q323_layout_skipping", "q324_bloom_skipping",
      "q325_unigram_learn", "q327_aipw", "q328_takedown",
      "q329_index_drift", "q330_unigram_em2",
      "q331_corpus_takedown", "q332_drift_repair",
      "q333_docpool_upsert")
    val offenders = SparkEntry.queries.keys
      .filterNot(eager.contains)
      .filterNot(globalWindowWhitelist.contains)
      .flatMap { name =>
        // dogfood the public lint (PlanChecks) — the same audit users
        // wire into their own pipelines
        val bad = PlanChecks
          .audit(SparkEntry.queries(name)(spark, sfDir),
            bnljAllowed = true)
          .filter(_.rule == "global-window")
        if (bad.nonEmpty) Some(s"$name: ${bad.size} global window(s)")
        else None
      }
    assert(offenders.isEmpty, offenders.mkString("; "))
  }

  test("no gate query plans a mid-plan GLOBAL SORT — bounded ordered " +
    "output is TakeOrdered (orderBy+limit), everything else must stay " +
    "partition-local") {
    // PlanChecks' global-sort rule already ignores Sort+Limit
    // (TakeOrderedAndProject — q06's shape) and sortWithinPartitions;
    // whitelisted here are queries whose FINAL output is a deliberate
    // bounded total order:
    // - q36/q115 et al. need no entry: their aggregates are unordered.
    // (currently empty — any future entry needs a bounded-input
    // justification like the global-window list above)
    val globalSortWhitelist = Set.empty[String]
    val eager = Set("q26_ingest_roundtrip", "q105_bpe_learn",
      "q125_streaming_funnel_replay", "q129_streaming_retention_replay",
      "q244_streaming_agg_replay", "q248_preflight_artifact",
      "q249_streaming_latency_replay", "q265_pq_index_delete",
      "q272_streaming_sessions_replay", "q290_bm25_index",
      "q291_bm25_index_delete", "q293_signed_index_lifecycle",
      "q296_logistic_fit", "q297_logistic_filter",
      "q300_persisted_hybrid", "q307_ann_index_lifecycle",
      "q309_mondrian", "q318_ipw", "q321_bm25_time_travel",
      "q323_layout_skipping", "q324_bloom_skipping",
      "q325_unigram_learn", "q327_aipw", "q328_takedown",
      "q329_index_drift", "q330_unigram_em2",
      "q331_corpus_takedown", "q332_drift_repair",
      "q333_docpool_upsert")
    val offenders = SparkEntry.queries.keys
      .filterNot(eager.contains)
      .filterNot(globalSortWhitelist.contains)
      .flatMap { name =>
        val bad = PlanChecks
          .audit(SparkEntry.queries(name)(spark, sfDir),
            bnljAllowed = true)
          .filter(_.rule == "global-sort")
        if (bad.nonEmpty) Some(s"$name: ${bad.size} global sort(s)")
        else None
      }
    assert(offenders.isEmpty, offenders.mkString("; "))
  }

  test("no gate query plans a CartesianProduct; BroadcastNestedLoopJoin " +
    "only where the operator is a deliberate tiny-side broadcast") {
    // queries whose SEMANTICS are a non-equi match against a broadcast
    // small side (query sets, k/1-row centroid or scalar tables, banded
    // signature indexes). Anything outside this list planning a nested
    // loop is a regression; CartesianProduct (non-broadcast all-pairs)
    // is never acceptable.
    val bnljWhitelist = Set(
      "q325_unigram_learn",  // model counts × broadcast 1-row Σcnt
      "q330_unigram_em2",    // same final-cost broadcast shape
      "q327_aipw",           // q296's bias-row broadcast, three fits
      "q17_cosine_topk",     // corpus × broadcast query rows (non-equi !=)
      "q27_ivf_topk",        // query rows × broadcast k-row centroids
      "q44_tfidf",           // tf rows × broadcast 1-row corpus size
      "q48_kmeans",          // corpus × broadcast k-row centroids
      "q51_hard_negatives",  // corpus × broadcast query rows (label !=)
      "q65_ann_recall",      // its brute-force baseline side is q17
      "q67_temperature_mix", // class weights × broadcast 1-row Σw
      "q68_temperature_tokens", // same 1-row Σw broadcast
      "q76_dsir",            // B-row buckets × broadcast 1-row totals
      "q78_bm25",            // postings × broadcast 1-row corpus stats
      "q80_key_skew",        // key counts × broadcast 1-row total
      "q84_source_divergence", // G-row classes × broadcast B-row grid/totals
      "q91_unimax_sample",     // G-row classes × broadcast 1-row K/istar
      "q97_semantic_decontaminate", // corpus × broadcast eval probe
      "q101_sketch_overlap", // G-row sketches × broadcast G-row (a < b)
      "q102_cms_freq",       // probe terms × broadcast 1-row sketch
      "q106_pq_encode",      // corpus × broadcast m·k-row codebooks
      "q111_keywords",       // tf rows × broadcast 1-row corpus size (q44's shape)
      "q110_funnel",         // stage counts × broadcast 1-row stage-0 base
      "q116_vocab_coverage", // distinct-count rows × broadcast 1-row octave table
      "q119_fightin_words",  // vocab rows × broadcast 1-row totals
      "q121_ivfpq_refined",  // q27's centroid probe + q106's codebook broadcasts
      "q123_ivfpq_residual", // q121's shapes with residual-frame LUTs
      "q250_opq_residual",   // q123's shapes + the 1-row permutation
                             // broadcast (rotation is model metadata)
      "q253_neyman_sample",  // |strata|-row allocation table ×
                             // broadcast 1-row weight/base totals
      "q256_krippendorff_alpha", // 1-row disagreement moments ×
                                 // broadcast 1-row marginal total
      "q257_nelson_aalen",   // q241's lifetime x broadcast 1-row
                             // horizon/total shapes
      "q259_bh_fdr",         // hypothesis table × broadcast 1-row
                             // m / k* scalars (+ the chi-square
                             // grid's bounded cats × 1-row total)
      "q260_blocking_quality", // per-key counts × broadcast 1-row
                               // n/truth totals
      "q262_linkage_decisions", // pair rows × broadcast 1-row pivoted
                                // weight vector (model metadata)
      "q264_conformal",      // residual rows × broadcast 1-row k /
                             // q-hat / coverage scalars
      "q266_fs_em",          // ≤ 2^3-row pattern table × broadcast
                             // 1-row EM params per iteration (both
                             // sides bounded model metadata)
      "q268_adamic_adar",    // q162's synth-graph 1-row node-count
                             // broadcast (wedge joins are equi)
      "q270_js_divergence",  // category counts × broadcast 1-row
                             // side totals
      "q274_kendall_tau",    // bounded distinct-cell grid × its own
                             // broadcast (non-equi C/D cross products)
                             // + 1-row tie/total scalars
      "q276_bootstrap_ci",   // 1-row moment frame × broadcast 1-row
                             // CI order statistics
      "q277_trimmed_means",  // distinct-cent cells × broadcast 1-row
                             // (n, k) scalars
      "q278_log_rank",       // q241's lifetime × broadcast 1-row
      "q281_kruskal_wallis", // group moments × broadcast 1-row ties
      "q285_mutual_information", // bounded cell grid × broadcast
                                 // margins + 1-row total/entropies
      "q289_calibration_summary", // 1-row Brier moment × broadcast
                                  // 1-row bucket-gap integrals
      "q292_quantile_normalize", // bounded group cells × broadcast
                                 // bounded pooled cells (interval
                                 // containment is non-equi)
      "q294_mad",            // rows × broadcast 1-row median scalars
      "q301_by_fdr",         // q259's hypothesis table × broadcast
                             // 1-row m/harmonic/k* scalars
      "q302_hazard_ratio",   // q278's lifetime × 1-row moment shapes
      "q297_logistic_filter", // scored rows × broadcast 1-row
                              // intercept (training is eager; serving
                              // is the plan)
      "q287_rmst",           // q241's lifetime × broadcast 1-row
                             // horizon/totals/moment shapes
      "q271_cramers_v",      // q228's margin-grid crossJoin (r-row ×
                             // broadcast c-row margins + 1-row N)
      "q126_classifier_train", // vocab rows × broadcast 1-row totals
      "q127_bitext_mine",    // target corpus × broadcast source slice
      "q133_pagerank",       // node/edge synth + per-iteration teleport
                             // term × broadcast 1-row node count
      "q137_harmonic_centrality", // same synth-graph 1-row node-count
                                  // broadcast (sketch rounds are equi)
      "q145_hybrid_rrf",     // its dense side is q17's corpus ×
                             // broadcast query rows (non-equi !=)
      "q146_communities",    // q133's synth-graph 1-row node-count
                             // broadcast (LPA rounds are equi)
      "q162_triangles",      // same synth-graph 1-row node-count
                             // broadcast (wedge/closure joins are equi)
      "q163_kcore",          // same 1-row node-count broadcast (peel
                             // rounds are degree aggs + semi-joins)
      "q164_clustering",     // q162's shape (1-row node-count)
      "q165_reciprocity",    // same 1-row node-count broadcast
      "q283_assortativity",  // same synth 1-row node-count broadcast
                             // + 1-row moment × node-count frames
      "q284_modularity",     // same synth 1-row node-count + 1-row
                             // total-edge-count broadcast
      "q167_pmi_collocations", // bigram rows × broadcast 1-row token
                               // total (q44's shape)
      "q168_hits",           // q163's synth-graph 1-row node-count
                             // broadcast (HITS rounds are equi)
      "q171_matryoshka_recall", // per-tier corpus × broadcast query
                                // rows (q17's non-equi != shape)
      "q177_decay_mix",      // G-row classes × broadcast 1-row Σw
      "q178_gini_concentration", // G-row class table × broadcast
                                 // G-row twin (pairwise |xi−xj|) and
                                 // the 1-row totals
      "q181_association_rules",  // pair counts × broadcast 1-row
                                 // distinct-user total
      "q187_centroid_similarity", // G-row centroid table × broadcast
                                  // G-row twin (a < b pairs)
      "q188_rfm",              // per-user rows × broadcast 1-row
                               // corpus-max anchor
      "q179_calibration",      // q126's NB-training 1-row totals
                               // broadcast inside the served model
      "q194_dedup_recall",     // level meta × broadcast 1-row doc
                               // count (the LSH pairer is equi)
      "q199_revenue_share",    // G-row nation revenue × broadcast
                               // 1-row total
      "q201_join_cardinality", // three broadcast 1-row scalars (two
                               // CMS grids + the exact check) folded
                               // into the single output row
      "q207_cuped",            // 2-row variant table × broadcast
                               // 1-row moment vector
      "q215_dormant_customers", // anti-joined customers × broadcast
                               // 1-row positive-balance totals
      "q224_important_parts",  // per-part values × broadcast 1-row
                               // corpus total (share as v*10⁴ > Σ)
      "q226_mrr",              // 1-row reciprocal-rank sums ×
                               // broadcast 1-row query count
      "q228_chi_square",       // 4-cell contingency table ×
                               // broadcast 1-row N
      "q230_benford",          // 9-digit histogram × broadcast
                               // 1-row total
      "q235_cohen_kappa",      // 1-row (n, agree) × broadcast 1-row
                               // chance-agreement sum (q228's shape;
                               // margin joins are null-safe equi)
      "q241_kaplan_meier",     // per-user lifetimes × broadcast 1-row
                               // horizon; lifetime table × broadcast
                               // 1-row user total
      "q308_stratified_logrank", // q278's lifetime × broadcast 1-row
                               // horizon + 1-row pooled-moment shapes
                               // (the per-stratum risk join is equi)
      "q311_ari",              // 1-row cell-pair sums × broadcast
                               // 1-row margin-pair sums
      "q313_ks",               // distinct-cent CDF rows × broadcast
                               // 1-row side totals
      "q318_ipw",              // q297's serving shape (scored rows ×
                               // broadcast 1-row intercept)
      "q319_holm")             // hypothesis table × broadcast 1-row
                               // m / k-fail scalars (q301's shape)
    // q26 performs its ingest roundtrip at DataFrame-construction time —
    // a real write job, not a plan build — and q105's BPE trainer runs
    // its per-round argmax collect()s eagerly while the DataFrame is
    // BUILT (the returned frame is driver-local metadata), so for both
    // the final plan is just a LocalRelation and auditing it would
    // execute the whole query while gating nothing; their distributed
    // stages are pinned by their oracle rows + their own specs instead
    // q125 joins the eager set: its state-machine replay writes real
    // parquet state per micro-batch at construction time and returns a
    // localCheckpoint'ed report — the distributed stages are pinned by
    // the streaming twins' own specs + its oracle row
    // q248/q249 join it for the same reason: artifact/state writes at
    // construction time, localCheckpoint'ed reports
    val eagerExempt = Set("q26_ingest_roundtrip", "q105_bpe_learn",
      "q125_streaming_funnel_replay", "q129_streaming_retention_replay",
      "q244_streaming_agg_replay", "q248_preflight_artifact",
      "q249_streaming_latency_replay")
    val names = SparkEntry.queries.keys.filterNot(eagerExempt.contains)
    val offenders = names.flatMap { name =>
      // analysis failures are named per query rather than aborting the
      // loop (a testdata dtype drift once hid behind the first throw)
      val plan =
        try planOf(name)
        catch { case e: Throwable =>
          s"CartesianProduct (ANALYSIS FAILED: ${e.getMessage.take(160)})" }
      val cart = plan.contains("CartesianProduct")
      val bnlj = plan.contains("BroadcastNestedLoopJoin") &&
        !bnljWhitelist.contains(name)
      if (cart) Some(s"$name: CartesianProduct")
      else if (bnlj) Some(s"$name: non-whitelisted BroadcastNestedLoopJoin")
      else None
    }
    assert(offenders.isEmpty, offenders.mkString("; "))
  }
}
