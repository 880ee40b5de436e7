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
#   r7 (this round, round-6 verdict #1): the 24-entry remainder that
#       has NEVER been driver-checked goes first — the 19 hash-capable
#       events/relational tail, emb_pca_project + emb_semantic_dedup
#       (NEWLY value-oracled this round: fixed-point power-iteration
#       PCA unrolled in SQL; fixed-point-k-means-celled SemDeDup;
#       docs_bpe_encode's train+encode loop unrolled in SQL; the
#       whole ANN top-k trio re-based on fixed-point quantizers —
#       emb_ivf_topk on fixed cells, emb_pq_topk on fixed subspace
#       codebooks, emb_ivf_pq_topk on both — so ALL 263 registry
#       entries now carry value oracles; the float production tiers
#       stay exercised by the *_recall_eval quartet). The remaining
#       26 slots re-verify the STALEST entries (last driver-checked
#       in r2). After this window every registry entry has been
#       driver-green at least once.
# Everything past the cap is covered by the committed full-registry
# gate log (CHECKLOG.md, generated+count-asserted by
# tools/check_correctness.py --checklog).
_PRIORITY = (
    # --- r7 driver window: the 24 never-driver-verified entries ---
    # newly value-oracled this round
    "emb_pca_project",
    "emb_semantic_dedup",
    # hash-capable events/relational tail
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
    # all four value-oracled in r7 (SQL-unrolled BPE loop;
    # fixed-point-quantizer ANN trio)
    "docs_bpe_encode",
    "emb_ivf_topk",
    "emb_pq_topk",
    "emb_ivf_pq_topk",
    # --- 26 stalest re-verification slots (last checked r2) ---
    "agg_count_distinct",
    "agg_cube",
    "agg_grouping_sets",
    "agg_price_histogram",
    "agg_rollup",
    "date_funcs_showcase",
    "join_anti_no_orders",
    "join_broadcast_dims",
    "join_cross_regions",
    "join_full_outer_nations",
    "join_inner_enrich",
    "join_left_outer_agg",
    "join_range_price_tiers",
    "join_salted_hot_keys",
    "join_semi_with_open_order",
    "math_funcs_showcase",
    "profile_orders",
    "q10_returned_items",
    "q11_part_value_share",
    "q12_priority_by_linestatus",
    "q13_order_count_distribution",
    "q15_top_supplier",
    "q16_supplier_variety",
    "q17_small_quantity_revenue",
    "q18_large_orders",
    "q19_disjunctive_predicates",
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
