"""Query registry: every operator from SURVEY.md §2 as a named query.

Each query is a callable ``(spark, sf_dir) -> DataFrame`` plus (where
SQL-expressible) a DuckDB oracle string — the driver contract in
``__spark_entry__.py``. Modules:

- ``relational``: joins, aggregations, window functions, sorts, set
  ops, scalar functions (SURVEY.md §2.4).
- ``events``: time windows, sessionization, as-of join, JSON, dedup
  on the event stream (SURVEY.md §2.3 batch-equivalents).
- ``llm``: text analysis, dedup families, similarity search, and
  multimodal metadata (north-star extensions).
- ``engine``: the ORC sink and the Structured Streaming runtime
  themselves, value-checked against batch oracles.
"""

from flink_orc_sink_spark.queries import engine, events, llm, relational

# Registry order is part of the driver contract: the driver's
# correctness gate checks the FIRST 50 entries of ``all_queries()``.
# Newest / highest-risk surfaces (engine runtime, this round's new
# event queries, LLM-pipeline, event analytics) come first; the
# long-stable TPC-H-style relational corpus comes last. Anything past
# the cap is covered by the committed ``tools/check_correctness.py``
# run (see CHECKLOG.md).
_MODULE_ORDER = (engine, llm, events, relational)

# The driver's correctness gate checks the FIRST 50 entries of
# ``all_queries()``; _PRIORITY front-loads them. The cap WINDOW
# ROTATES each round to maximize cumulative driver-green coverage —
#   r2: first 50 of the r2 ordering (relational+LLM core)
#   r3: the 50 newest surfaces (engine runtime, round-3 additions)
#   r4: 8 new/changed round-4 surfaces, the 6 lost r3 gate rows,
#       then longest-never-verified
#   r5: the 26 new/changed round-5 surfaces (retraction-join IVM,
#       pyds 2PC sink, BM25/index-forget families, ANN recall
#       evals, skew pair, ...), then longest-never-verified
#   r6: ALL 50 slots to never-driver-verified entries (48 hash-green,
#       2 were no-oracle slots — fixed in r7 by giving both real
#       value oracles).
#   r7: the 24-entry remainder that had NEVER been driver-checked
#       (incl. the newly value-oracled fixed-point PCA/SemDeDup/BPE/
#       ANN trio) + the 26 stalest (last checked r2). After that
#       window, cumulative driver coverage reached 263/263.
#   r8 (this round, round-7 verdict #2): pure FRESHNESS rotation —
#       cumulative coverage is complete, so all 50 slots go to the
#       entries with the OLDEST last-driver-green round, computed
#       from CORRECTNESS_r01..r07 exactly as the r7 verdict did
#       (24 entries last green in r2, then the alphabetical head of
#       the 41 last green in r3). Registry frozen at 263.
# Everything past the cap is covered by the committed full-registry
# gate log (CHECKLOG.md, generated+count-asserted by
# tools/check_correctness.py --checklog).
_PRIORITY = (
    # --- 24 entries last driver-green in r2 ---
    "q1_pricing_summary",
    "q20_heavy_shippers",
    "q21_exclusive_returns",
    "q22_idle_rich_customers",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q4_exists_late_ship",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "q8_promo_share",
    "q9_profit_by_nation",
    "set_except_nations",
    "set_intersect_nations",
    "set_union_all_parties",
    "sort_global_topk",
    "string_funcs_showcase",
    "string_fuzzy_match",
    "window_lag_lead",
    "window_ntile_quartiles",
    "window_range_frame",
    "window_rank_dense",
    "window_running_total",
    "window_topk_per_customer",
    # --- 26 slots from the r3-stale cohort (alphabetical) ---
    "agg_equidepth_histogram",
    "agg_spearman_corr",
    "customer_abc_analysis",
    "docs_bigram_lm_score",
    "docs_dsir_weights",
    "docs_hash_classifier_score",
    "docs_retrieval_eval",
    "dq_benford_audit",
    "emb_filtered_topk",
    "emb_kmeans_cluster",
    "events_best_split",
    "events_cumulative_distinct",
    "events_experiment_lift",
    "events_max_concurrency",
    "events_pattern_match",
    "events_rfm_segments",
    "events_scd2_pointlookup",
    "events_sessionize_dynamic",
    "events_top_paths",
    "events_twap_daily",
    "events_user_similarity_topk",
    "graph_bfs_reachability",
    "orc_gdpr_erase",
    "orc_quarantine_write",
    "orc_snapshot_expire",
    "orders_lead_time_sla",
)


def _ordered(get):
    out = {}
    for name in _PRIORITY:
        for mod in _MODULE_ORDER:
            if name in get(mod):
                out[name] = get(mod)[name]
    for mod in _MODULE_ORDER:
        for name, v in get(mod).items():
            if name not in out:
                out[name] = v
    return out


def all_queries():
    names = set()
    for mod in _MODULE_ORDER:
        overlap = names & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        names |= mod.QUERIES.keys()
    return _ordered(lambda m: m.QUERIES)


def all_oracles():
    return _ordered(lambda m: m.ORACLES)
