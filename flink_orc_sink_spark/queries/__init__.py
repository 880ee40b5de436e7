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
#   r5 (this round): the 17 new/changed round-5 surfaces (4 ANN
#       recall evals, the skew-join pair, the two LSH queries whose
#       oracles upgraded rows-only -> value-hash, the streaming IVF
#       and media index ingests, the backfill->live handoff, the
#       binaryFile media source, the index-deletion triad
#       docs_index_forget_dedup / emb_index_forget_matches /
#       multimodal_index_forget, the in-stream takedown capstone
#       stream_index_forget_ingest, the exact-substring span detector
#       docs_dup_ngram_spans, and the session-2 additions: span
#       excision docs_cut_dup_spans, span-level decontamination
#       docs_contamination_spans, the fixed-point classifier trainer
#       docs_classifier_train, the atomic multi-table fan-out
#       stream_fanout_atomic, the persisted BM25 retrieval index
#       docs_bm25_index_topk and its streaming ingest
#       stream_bm25_index_ingest, and the out-of-order-exact
#       streaming SCD2 maintenance stream_scd2_apply, and the
#       manifest-pruned snapshot change-data-feed orc_snapshot_diff,
#       the retraction-correct streaming aggregation
#       stream_retract_agg, and the retrieval-index takedown
#       docs_bm25_index_forget; session-4 additions, fronted first:
#       the retraction-join IVM family stream_retract_join /
#       _agg / _left, the deterministic shard export
#       docs_export_shards, keyed pseudonymization docs_pii_tokenize,
#       TTL-bounded dedup stream_dedup_ttl, the Python-DataSource
#       two-phase-commit sink pair pyds_sink_roundtrip /
#       stream_pyds_sink, and the temporal table join
#       stream_temporal_enrich),
#       then the
#       longest-never-driver-verified
#       entries in registry order (round-4 verdict #1: engine-runtime,
#       ORC and LLM-core families). The driver takes the first 50;
#       the _PRIORITY tail past the cap and the remaining
#       never-verified entries (docs_neardup_clusters,
#       docs_repetition_ratio, docs_pack_sequences, the
#       emb/multimodal/events tails) rotate into the r6 window.
# Everything past the cap is covered by the committed full-registry
# gate log (CHECKLOG.md, generated+count-asserted by
# tools/check_correctness.py --checklog).
_PRIORITY = (
    "stream_retract_join",
    "stream_retract_join_agg",
    "stream_retract_join_left",
    "docs_export_shards",
    "docs_pii_tokenize",
    "stream_dedup_ttl",
    "pyds_sink_roundtrip",
    "stream_pyds_sink",
    "stream_temporal_enrich",
    "docs_bm25_index_topk",
    "stream_bm25_index_ingest",
    "stream_scd2_apply",
    "orc_snapshot_diff",
    "stream_retract_agg",
    "docs_bm25_index_forget",
    "emb_lsh_recall_eval",
    "emb_ivf_recall_eval",
    "emb_pq_recall_eval",
    "emb_ivfpq_recall_eval",
    "join_skewed_hot_key",
    "join_skewed_salted",
    "emb_lsh_ann_topk",
    "emb_lsh_neardup_pairs",
    "stream_emb_index_ingest",
    "stream_media_index_ingest",
    "stream_backfill_live_handoff",
    "multimodal_binaryfile_ingest",
    "docs_index_forget_dedup",
    "emb_index_forget_matches",
    "multimodal_index_forget",
    "stream_index_forget_ingest",
    "stream_fanout_atomic",
    "stream_gram_index_ingest",
    "docs_dup_ngram_spans",
    "docs_cut_dup_spans",
    "docs_contamination_spans",
    "docs_classifier_train",
    "docs_index_cut_dedup",
    "docs_contamination_bloom",
    "dq_audit_orders",
    "events_cdc_apply",
    "events_scd2_status",
    "events_bitmap_distinct_rollup",
    "events_markov_transitions",
    "events_conversion_lag",
    "orc_roundtrip_events",
    "orc_roundtrip_typeedge",
    "orc_schema_evolution",
    "stream_tumbling_hourly",
    "stream_sessionize_10m",
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
    "docs_bpe_encode",
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
