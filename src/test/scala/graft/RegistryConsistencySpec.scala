package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry hygiene guards — the invariants the driver's correctness
  * gate assumes but nothing previously enforced at test time:
  *
  *  - every registered query has a DuckDB oracle (the board is 100%
  *    oracle-checked; a new query without an oracle row would silently
  *    land as a weaker rows-only check);
  *  - no oracle exists without its query (a dangling oracle is dead
  *    SQL the gate never exercises);
  *  - names follow the `q_*`/`wc_*` convention the tooling greps on.
  */
class RegistryConsistencySpec extends AnyFunSuite {

  test("every registered query has an oracle; no oracle dangles") {
    val queries = SparkEntry.queries.keySet
    val oracles = SparkEntry.oracleSql.keySet
    val missing = queries -- oracles
    assert(missing.isEmpty,
      s"queries without a DuckDB oracle: ${missing.toSeq.sorted.mkString(", ")}")
    val dangling = oracles -- queries
    assert(dangling.isEmpty,
      s"oracles without a registered query: ${dangling.toSeq.sorted.mkString(", ")}")
  }

  test("query names follow the grep-able conventions") {
    val bad = SparkEntry.queries.keySet
      .filterNot(n => n.startsWith("q_") || n.startsWith("wc_") ||
        n.matches("q\\d+_.*"))
    assert(bad.isEmpty, s"unconventional names: ${bad.toSeq.sorted.mkString(", ")}")
  }

  test("registry is at least the round-7 size (no silent shrinkage)") {
    assert(SparkEntry.queries.size >= 171,
      s"registry shrank to ${SparkEntry.queries.size}")
  }

  /** Categories whose SURVEY row is legitimately suite-evidence-only
    * (the DataFrame→DuckDB harness cannot reach them); every other
    * category row must name at least one registered query. */
  private val SuiteOnlyCategories = Set("Streaming")

  test("SURVEY §2.3 and the registry cannot drift: categories name registered " +
      "queries, and every registered query is documented") {
    val survey = {
      val src = scala.io.Source.fromFile("SURVEY.md", "UTF-8")
      try src.mkString finally src.close()
    }
    val s23 = survey.substring(
      survey.indexOf("### 2.3"),
      survey.indexOf("## 3. Query lifecycle"))
    val nameRe = "`((?:q_|wc_)[a-z0-9_]+|q\\d+_[a-z0-9_]+)`".r
    val rows = s23.linesIterator
      .filter(l => l.startsWith("| ") && !l.startsWith("| Category") &&
        !l.startsWith("|---"))
      .toSeq
    assert(rows.nonEmpty, "SURVEY §2.3 category table not found")
    val registered = SparkEntry.queries.keySet
    // (a) every category row names >= 1 REGISTERED query (or is an
    // allowlisted suite-only row that says so)
    rows.foreach { row =>
      val category = row.stripPrefix("| ").takeWhile(_ != '|').trim
      val named = nameRe.findAllMatchIn(row).map(_.group(1)).toSet
      if (SuiteOnlyCategories(category))
        assert(row.contains("suite"),
          s"suite-only category '$category' must cite its suite evidence")
      else
        assert(named.exists(registered),
          s"SURVEY §2.3 category '$category' names no registered query " +
            s"(orphaned row — mentioned: ${named.toSeq.sorted.mkString(", ")})")
    }
    // (b) no documented query is unregistered (doc rot / typo guard)
    val mentioned = nameRe.findAllMatchIn(s23).map(_.group(1)).toSet
    val rot = mentioned -- registered
    assert(rot.isEmpty,
      s"SURVEY §2.3 mentions unregistered queries: ${rot.toSeq.sorted.mkString(", ")}")
    // (c) every registered query appears in §2.3 — a new query cannot
    // land without its category row
    val undocumented = registered.filterNot(s23.contains)
    assert(undocumented.isEmpty,
      s"registered queries missing from SURVEY §2.3: " +
        s"${undocumented.toSeq.sorted.mkString(", ")}")
  }

  /** PLANS.md family representatives: a registered query without its
    * own `## <name>` audit section must name the query whose audited
    * plan SHAPE it shares — same scan/join/window skeleton, different
    * predicate or aggregate. A NEW query failing both (no section, no
    * entry here) fails the suite: plan audits cannot silently rot as
    * the board grows. The representative must itself carry a section
    * (checked), so a family can never point at thin air. */
  private val PlanFamilies: Map[String, String] = Map(
    // reference word-count pipeline: one tokenize-explode-aggregate
    // skeleton; the per-file/global/topk/DSv2/registry forms change the
    // key or source, not the shape
    "wc_global" -> "wc_per_doc", "wc_top20" -> "wc_per_doc",
    "wc_per_file" -> "wc_per_doc", "wc_v2_source" -> "wc_per_doc",
    "q_registry_pipeline" -> "wc_per_doc",
    // relational agg/join family: selective dims broadcast into fact
    // joins, one aggregation pass (grouping sets add an Expand row
    // multiplier on the same skeleton)
    "q1_pricing" -> "q3_top_revenue", "q7_volume_shipping" -> "q3_top_revenue",
    "q8_market_share" -> "q3_top_revenue", "q11_important_parts" -> "q3_top_revenue",
    "q13_custdist" -> "q3_top_revenue", "q15_top_supplier" -> "q3_top_revenue",
    "q17_small_qty" -> "q3_top_revenue", "q21_waiting_supplier" -> "q3_top_revenue",
    "q22_idle_customers" -> "q3_top_revenue", "q_brand_revenue" -> "q3_top_revenue",
    "q_top_orders" -> "q3_top_revenue", "q_sql_scalar_subquery" -> "q3_top_revenue",
    "q_quality_audit" -> "q3_top_revenue", "q_semi_join" -> "q3_top_revenue",
    "q_anti_join" -> "q3_top_revenue", "q_outer_join" -> "q3_top_revenue",
    "q_rollup" -> "q3_top_revenue", "q_cube" -> "q3_top_revenue",
    "q_grouping_sets" -> "q3_top_revenue", "q_pivot" -> "q3_top_revenue",
    "q_distinct" -> "q3_top_revenue", "q_count_distinct" -> "q3_top_revenue",
    "q_stats_moments" -> "q3_top_revenue", "q_set_ops" -> "q3_top_revenue",
    // window family
    "q_window_lag" -> "q_window_rank", "q_window_running" -> "q_window_rank",
    // sketch family: bounded sketch frames merged map-side
    "q_approx_distinct" -> "q_sketch_hll_merge",
    "q_approx_quantile" -> "q_sketch_hll_merge",
    "q_salted_agg" -> "q_salted_join",
    // events: tumbling/sliding/session windows + self-join funnels on
    // the ts-keyed scan
    "q_events_hourly" -> "q_events_sessions",
    "q_events_sliding" -> "q_events_sessions",
    "q_events_retention" -> "q_events_sessions",
    "q_events_json" -> "q_events_sessions",
    "q_events_daily_share" -> "q_events_sessions",
    "q_events_transitions" -> "q_events_sessions",
    "q_events_scd2" -> "q_events_sessions",
    "q_events_rolling" -> "q_events_sessions",
    "q_events_ohlc" -> "q_events_sessions",
    "q_events_decay" -> "q_events_sessions",
    "q_events_anomaly" -> "q_events_sessions",
    "q_range_join" -> "q_range_join_binned",
    // dedup: hash-group exact family / banded-LSH family / gram-join /
    // survivor policies over the shared component labels
    "q_dedup_exact_stats" -> "q_dedup_keep_set",
    "q_dedup_exact_groups" -> "q_dedup_keep_set",
    "q_dedup_exact_planted" -> "q_dedup_keep_set",
    "q_dedup_incremental" -> "q_dedup_minhash_lsh",
    "q_dedup_forget" -> "q_dedup_minhash_lsh",
    "q_dedup_recall" -> "q_dedup_minhash_lsh",
    "q_dedup_simhash_wide" -> "q_dedup_simhash",
    "q_dedup_containment" -> "q_dedup_ngram_jaccard",
    "q_dedup_embedding" -> "q_ann_brute_force",
    "q_dedup_clusters" -> "q_graph_pagerank",
    "q_dedup_cc_inc" -> "q_graph_pagerank",
    // same materialized power-iteration skeleton; the edge build adds
    // a weight window + transpose self-join in front
    "q_graph_pagerank_knn" -> "q_graph_pagerank",
    "q_graph_pagerank_conv" -> "q_graph_pagerank",
    // same signature-build + pruned-serve skeleton over a patched
    // two-root manifest (the ingest twin's shape with the touched base
    // shards shadowed instead of fresh delta ids appended)
    "q_layout_bloom_forget" -> "q_layout_bloom_ingest",
    "q_zorder_forget" -> "q_zorder_ingest",
    "q_hilbert_ingest" -> "q_zorder_ingest",
    "q_hilbert_forget" -> "q_zorder_ingest",
    "q_dedup_keep_best" -> "q_dedup_keep_set",
    "q_dedup_keep_clustered" -> "q_dedup_keep_set",
    "q_split_leakage_safe" -> "q_dedup_keep_set",
    "q_dedup_span_apply" -> "q_dedup_span_coverage",
    // ANN: broadcast-query scan family / routed family / coded family
    "q_ann_lsh_bucket" -> "q_ann_brute_force",
    "q_ann_multiprobe" -> "q_ann_brute_force",
    "q_ann_topk_agg" -> "q_ann_brute_force",
    "q_ann_recall" -> "q_ann_brute_force",
    "q_ann_ivf_routed" -> "q_ann_ivf_assign",
    "q_ann_kmeans_conv" -> "q_ann_kmeans",
    "q_ann_opq" -> "q_ann_pq",
    "q_ann_quantize_int8" -> "q_ann_pq",
    "q_train_triplets" -> "q_ann_brute_force",
    "q_ann_bq_recall" -> "q_ann_bq_hamming",
    // retraction = the merge chain ± one broadcast anti-join of the
    // erasure list; artifacts, routing and serve identical
    "q_ann_index_forget" -> "q_ann_index_merge",
    "q_text_bm25_forget" -> "q_text_bm25_index_merge",
    "q_sample_kcenter_batch" -> "q_sample_kcenter",
    // samples: content-hash-ordered draw family
    "q_sample_stratified" -> "q_sample_domain_cap",
    "q_sample_weighted" -> "q_sample_domain_cap",
    "q_sample_token_budget" -> "q_sample_domain_cap",
    // mixes: census-sized weight frames + deterministic draw
    "q_mix_temperature" -> "q_mix_doremi",
    "q_mix_unimax" -> "q_mix_doremi",
    "q_merge_ivm" -> "q_merge_upsert",
    // text: row-local transform censuses / gram-frame family / LM
    // scoring family / postings family
    "q_text_lang_id" -> "q_text_pack", "q_text_quality" -> "q_text_pack",
    "q_text_quality_filter" -> "q_text_pack",
    "q_text_token_stats" -> "q_text_pack",
    "q_text_fingerprint" -> "q_text_pack", "q_text_redact" -> "q_text_pack",
    "q_text_chunk" -> "q_text_pack", "q_corpus_composition" -> "q_text_pack",
    "q_text_bigrams" -> "q_text_boilerplate",
    "q_text_collocations" -> "q_text_boilerplate",
    "q_text_bpe_step" -> "q_text_boilerplate",
    "q_text_decontaminate" -> "q_text_boilerplate",
    "q_text_entropy" -> "q_text_lm_score",
    "q_text_repetition" -> "q_text_lm_score",
    "q_text_ppl_buckets" -> "q_text_lm_score",
    "q_text_tfidf" -> "q_text_bm25",
    "q_pipeline_retrieval_capped" -> "q_pipeline_retrieval",
    "q_train_quality_lr_calibration" -> "q_train_quality_lr_apply",
    // profiling: distinct-value-spine aggregation family
    "q_profile_columns" -> "q_profile_skew",
    "q_profile_histogram" -> "q_profile_skew",
    "q_profile_eqdepth" -> "q_profile_skew",
    "q_profile_drift" -> "q_profile_skew",
    "q_zorder_values" -> "q_zorder_pruning",
    // time travel is the bounded read tail over the scd2 intervals
    "q_merge_timetravel" -> "q_merge_scd2",
    // multimodal: decode-once + banded pairing family
    "q_multimodal_stats" -> "q_multimodal_phash",
    "q_multimodal_dedup" -> "q_multimodal_phash",
    "q_multimodal_audio_fp" -> "q_multimodal_phash_pairs",
    "q_multimodal_video_fp" -> "q_multimodal_phash_pairs")

  test("PLANS.md and the registry cannot drift: every registered query has " +
      "its own audit section or a documented family representative") {
    val plans = {
      val src = scala.io.Source.fromFile("PLANS.md", "UTF-8")
      try src.mkString finally src.close()
    }
    // section headers: `## <name>` with an optional parenthetical tag
    val sections = "(?m)^## ((?:q_|wc_)[a-z0-9_]+|q\\d+_[a-z0-9_]+)".r
      .findAllMatchIn(plans).map(_.group(1)).toSet
    assert(sections.nonEmpty, "PLANS.md audit sections not found")
    val registered = SparkEntry.queries.keySet
    // every family representative must itself be audited and registered
    PlanFamilies.values.toSet.foreach { (rep: String) =>
      assert(sections(rep), s"family representative $rep has no PLANS.md section")
      assert(registered(rep), s"family representative $rep is not registered")
    }
    // a query with its own section needs no family entry (and keeping
    // one would shadow the real audit)
    val shadowed = PlanFamilies.keySet.filter(sections)
    assert(shadowed.isEmpty,
      s"PlanFamilies entries shadow real PLANS.md sections: " +
        s"${shadowed.toSeq.sorted.mkString(", ")}")
    val unaudited = registered.filterNot(n => sections(n) || PlanFamilies.contains(n))
    assert(unaudited.isEmpty,
      s"registered queries with neither a PLANS.md section nor a family " +
        s"representative: ${unaudited.toSeq.sorted.mkString(", ")}")
    // dangling family entries rot too
    val dangling = PlanFamilies.keySet -- registered
    assert(dangling.isEmpty,
      s"PlanFamilies names unregistered queries: ${dangling.toSeq.sorted.mkString(", ")}")
  }
}
