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
#   r9: freshness frontier moved on — the 15-entry r3-stale
#       remainder, then the alphabetical head (35) of the 50 entries
#       last green in r4, computed from CORRECTNESS_r01..r08 exactly
#       as the r8 verdict did. Registry frozen at 263.
#   r10 (round-9 verdict #3): CHANGED-SINCE-VERIFIED
#       first — every query whose implementation was reworked after
#       its last driver-green run: the LSM delta-log stateful sinks
#       (retract agg/join family r9 rework, last green r5; CDC/SCD2
#       r5/r6; orc_incremental_agg), the index-ingest/probe families
#       whose appenders were repartitioned in r9 and fixed to
#       partition-column-only in r10, and the r10 distributed-bloom
#       contamination query. Remaining 28 slots: freshness rotation
#       over the r4-stale cohort (from CORRECTNESS_r01..r09).
#   r11 (this round): same discipline. CHANGED first — the round-11
#       broadcast-hint removals (round-10 verdict #3: TPC-H dim
#       hints, per-user cohort/stats tables, dup-id sets, vocab/df
#       tables, triangle-count ranks), the BM25 appender's
#       bucket-count repartition, the contamination-bloom
#       persist-release + null-strict distributed builder, and the
#       forget-lifecycle harness's checkpoint parameter. Remaining
#       19 slots: the stalest cohort — ALL 18 queries last
#       driver-green in r5, then the r6 alphabetical head (computed
#       from CORRECTNESS_r01..r10; round-10 verdict #5).
# Everything past the cap is covered by the committed full-registry
# gate log (CHECKLOG.md, generated+count-asserted by
# tools/check_correctness.py --checklog).
_PRIORITY = (
    # --- changed this round (31) ---
    "q2_min_cost_supplier",
    "q5_local_supplier_volume",
    "q7_nation_volume",
    "q8_promo_share",
    "q9_profit_by_nation",
    "q14_promo_effect",
    "q15_top_supplier",
    "q16_supplier_variety",
    "q18_large_orders",
    "q19_disjunctive_predicates",
    "q20_heavy_shippers",
    "q21_exclusive_returns",
    "dq_audit_orders",
    "part_association_rules",
    "part_brand_elasticity",
    "sales_share_of_region",
    "docs_bm25_topk",
    "docs_rrf_hybrid",
    "docs_lm_score",
    "docs_lm_quality_buckets",
    "docs_bigram_lm_score",
    "docs_tfidf_top_terms",
    "docs_neardup_survivors",
    "docs_incremental_dedup",
    "docs_contamination_bloom",
    "events_daily_retention",
    "events_hourly_anomaly",
    "events_user_similarity_topk",
    "graph_triangle_count",
    "stream_bm25_index_ingest",
    "stream_index_forget_ingest",
    # --- 19 slots: stalest cohort (all 18 last green in r5, then
    # the r6 alphabetical head) ---
    "events_conversion_lag",
    "events_markov_transitions",
    "events_scd2_status",
    "join_skewed_hot_key",
    "join_skewed_salted",
    "multimodal_binaryfile_ingest",
    "orc_roundtrip_events",
    "orc_roundtrip_typeedge",
    "orc_schema_evolution",
    "orc_snapshot_diff",
    "pyds_sink_roundtrip",
    "stream_backfill_live_handoff",
    "stream_dedup_ttl",
    "stream_fanout_atomic",
    "stream_pyds_sink",
    "stream_sessionize_10m",
    "stream_temporal_enrich",
    "stream_tumbling_hourly",
    "agg_exact_percentiles",
)


def _ordered(get):
    # A typo in the hand-rotated 50-entry window must fail loudly —
    # _ordered() skipping an unknown name would silently demote that
    # query out of the driver-verified window (round-10 advice).
    registered = set()
    for mod in _MODULE_ORDER:
        registered |= mod.QUERIES.keys()
    unknown = [n for n in _PRIORITY if n not in registered]
    if unknown:
        raise ValueError(f"_PRIORITY names not in any registry: {unknown}")
    if len(set(_PRIORITY)) != len(_PRIORITY):
        dupes = sorted(
            n for n in set(_PRIORITY) if _PRIORITY.count(n) > 1
        )
        raise ValueError(f"_PRIORITY has duplicates: {dupes}")
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
