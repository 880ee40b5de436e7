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
#   r8: pure FRESHNESS rotation — cumulative coverage complete, so
#       all 50 slots went to the entries with the OLDEST
#       last-driver-green round (24 last green in r2, then the
#       alphabetical head of the 41 last green in r3).
#   r9 (this round, round-8 verdict #2): freshness frontier moves on —
#       the 15-entry r3-stale remainder, then the alphabetical head
#       (35) of the 50 entries last green in r4, computed from
#       CORRECTNESS_r01..r08 exactly as the r8 verdict did. Registry
#       frozen at 263.
# Everything past the cap is covered by the committed full-registry
# gate log (CHECKLOG.md, generated+count-asserted by
# tools/check_correctness.py --checklog).
_PRIORITY = (
    # --- 15-entry remainder last driver-green in r3 ---
    "part_association_rules",
    "part_brand_elasticity",
    "part_fuzzy_name_pairs",
    "part_pareto_frontier",
    "profile_corr_matrix",
    "profile_entropy",
    "profile_ols_regression",
    "pyds_source_agg",
    "sales_share_of_region",
    "sales_yoy_growth",
    "stream_chained_windows",
    "stream_interval_join_full",
    "stream_pyds_source",
    "stream_sessionize_dynamic",
    "stream_topk_per_window",
    # --- 35 slots from the r4-stale cohort (alphabetical) ---
    "agg_mode_per_group",
    "docs_balance_sources",
    "docs_bm25_topk",
    "docs_bpe_pair_counts",
    "docs_index_probe_dedup",
    "docs_lm_quality_buckets",
    "docs_negative_samples",
    "docs_paragraph_dedup",
    "docs_rrf_hybrid",
    "docs_source_divergence",
    "docs_temperature_mix",
    "docs_tfidf_top_terms",
    "docs_token_budget_select",
    "docs_top_tokens_sketch",
    "docs_weighted_sample",
    "emb_int8_topk",
    "emb_knn_label_accuracy",
    "emb_neardup_pairs",
    "events_anomaly_mad",
    "events_cohort_revenue",
    "events_daily_gapfill",
    "events_decay_wma_daily",
    "events_hll_union_rollup",
    "events_theta_audience_overlap",
    "events_windowed_funnel",
    "graph_pagerank_events",
    "graph_triangle_count",
    "join_not_in_nulls",
    "multimodal_audio_features",
    "multimodal_crossformat_neardup",
    "multimodal_decode_stats",
    "multimodal_frame_sample_stats",
    "multimodal_gif_stats",
    "multimodal_jpeg_stats",
    "multimodal_phash_neardup",
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
