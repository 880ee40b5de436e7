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
#   r6 (this round, round-5 verdict #1): ALL 50 slots go to
#       never-driver-verified entries — the registry surface is
#       frozen this round, so no new-surface slots are spent. The
#       window is the 50 hash-capable entries of the 72-entry
#       never-verified pool (engine-runtime stream/ORC tail, the
#       docs_* LLM core, the emb_* value-oracled tier, multimodal
#       metadata, and the oldest events/relational rows). The 22
#       deferred to r7 follow immediately after the cap: the 4
#       permanently rows-only entries (docs_bpe_encode,
#       emb_{ivf,pq,ivf_pq}_topk — recall separately value-oracled
#       via the *_recall_eval quartet) and 18 hash-capable
#       events/relational entries.
# Everything past the cap is covered by the committed full-registry
# gate log (CHECKLOG.md, generated+count-asserted by
# tools/check_correctness.py --checklog).
_PRIORITY = (
    # --- r6 driver window: 50 never-driver-verified entries ---
    # engine runtime tail (streaming + ORC layout)
    "stream_sliding_1h_30m",
    "stream_dedup_events",
    "stream_running_totals",
    "stream_static_enrich",
    "stream_late_data_drop",
    "stream_foreachbatch_orc",
    "stream_cdc_apply",
    "orc_zorder_layout",
    "orc_stats_pruned_read",
    "stream_orc_pipeline_events",
    # docs_* LLM core
    "docs_token_stats",
    "docs_lm_score",
    "docs_lang_distribution",
    "docs_quality_scores",
    "docs_quality_filter",
    "docs_train_test_split",
    "docs_exact_dup_groups",
    "docs_dedup_exact",
    "docs_jaccard_pairs",
    "docs_minhash_pairs",
    "docs_neardup_clusters",
    "docs_neardup_survivors",
    "docs_repetition_ratio",
    "docs_pack_sequences",
    "docs_contamination",
    "docs_hash_sample",
    "docs_stratified_sample",
    "docs_top_tokens",
    "docs_simhash_pairs",
    "docs_winnow_fingerprints",
    "docs_repeated_substrings",
    "docs_chunk_tokens",
    "docs_pii_scrub",
    "docs_url_domains",
    "docs_curation_pipeline",
    "docs_incremental_dedup",
    # emb_* hash-capable tier
    "emb_cosine_topk",
    "emb_centroids_by_label",
    "emb_quantize_int8",
    "emb_pca_project",
    "emb_semantic_dedup",
    # multimodal metadata
    "multimodal_meta",
    "multimodal_dims",
    # events / relational oldest
    "events_asof_orders",
    "events_tumbling_hourly",
    "events_sessionize_10m",
    "events_dedup_latest",
    "udaf_median_price",
    "agg_exact_percentiles",
    "agg_pivot_segments",
    # --- r7 pool (past the 50-cap): 4 rows-only + 18 hash-capable ---
    "docs_bpe_encode",
    "emb_ivf_topk",
    "emb_pq_topk",
    "emb_ivf_pq_topk",
    "events_user_features",
    "events_json_badrecords",
    "events_hourly_anomaly",
    "events_sliding_1h_30m",
    "events_json_extract",
    "events_funnel_3step",
    "events_daily_retention",
    "events_click_attribution",
    "events_rolling_7d_active",
    "case_when_price_tiers",
    "in_subquery_building",
    "scalar_subquery_above_avg",
    "distinct_flag_pairs",
    "null_handling_showcase",
    "unpivot_part_measures",
    "array_funcs_showcase",
    "map_funcs_showcase",
    "agg_approx_distinct_sketch",
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
