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
#   r10 (this round, round-9 verdict #3): CHANGED-SINCE-VERIFIED
#       first — every query whose implementation was reworked after
#       its last driver-green run: the LSM delta-log stateful sinks
#       (retract agg/join family r9 rework, last green r5; CDC/SCD2
#       r5/r6; orc_incremental_agg), the index-ingest/probe families
#       whose appenders were repartitioned in r9 and fixed to
#       partition-column-only in r10, and the r10 distributed-bloom
#       contamination query. Remaining 28 slots: freshness rotation
#       over the r4-stale cohort (from CORRECTNESS_r01..r09).
# Everything past the cap is covered by the committed full-registry
# gate log (CHECKLOG.md, generated+count-asserted by
# tools/check_correctness.py --checklog).
_PRIORITY = (
    # --- changed since last driver verification (22) ---
    "stream_retract_agg",
    "stream_retract_join",
    "stream_retract_join_left",
    "stream_retract_join_agg",
    "stream_cdc_apply",
    "stream_scd2_apply",
    "orc_incremental_agg",
    "stream_minhash_index_ingest",
    "stream_emb_index_ingest",
    "stream_media_index_ingest",
    "stream_gram_index_ingest",
    "stream_bm25_index_ingest",
    "stream_index_forget_ingest",
    "docs_incremental_dedup",
    "docs_index_probe_dedup",
    "docs_index_cut_dedup",
    "docs_bm25_index_topk",
    "docs_bm25_index_forget",
    "docs_index_forget_dedup",
    "emb_index_forget_matches",
    "multimodal_index_forget",
    "docs_contamination_bloom",
    # --- 28 slots from the r4-stale cohort (alphabetical) ---
    "multimodal_resize_stats",
    "orc_bloom_pruned_read",
    "orc_bucketed_join",
    "orc_compact_roundtrip",
    "orc_partition_upsert",
    "orc_time_travel",
    "parts_hierarchy_rollup",
    "q14_promo_effect",
    "stream_interval_join",
    "stream_interval_join_left",
    "stream_pyds_partitioned",
    "stream_quarantine",
    "window_percent_rank",
    # r5-stale continuation (alphabetical head)
    "docs_classifier_train",
    "docs_contamination_spans",
    "docs_cut_dup_spans",
    "docs_dup_ngram_spans",
    "docs_export_shards",
    "docs_pii_tokenize",
    "dq_audit_orders",
    "emb_ivf_recall_eval",
    "emb_ivfpq_recall_eval",
    "emb_lsh_ann_topk",
    "emb_lsh_neardup_pairs",
    "emb_lsh_recall_eval",
    "emb_pq_recall_eval",
    "events_bitmap_distinct_rollup",
    "events_cdc_apply",
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
