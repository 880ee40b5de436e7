"""Generate PLANS.md — formatted physical plans of flagship queries
with the scale-relevant properties called out, straight from the live
registry (so the doc can never drift from the code).

For each query we print the `explain("formatted")` output plus a
PROPERTIES line extracted from the plan text: pushed filters, batch
scan column pruning, broadcast joins, dynamic partition pruning,
whole-stage codegen spans, exchange count. This is the "is this the
plan you'd want" evidence for review.

Usage: python tools/gen_plans.py > PLANS.md
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

FLAGSHIPS = {
    "q3_shipping_priority": (
        "filters pushed to every scan; filtered customer side broadcast; "
        "one fact-fact shuffle; TakeOrderedAndProject for the limit"
    ),
    "q9_profit_by_nation": (
        "5-way join: all dimensions broadcast, single lineitem exchange"
    ),
    "events_sessionize_10m": (
        "one user-keyed exchange shared by lag + running-sum windows"
    ),
    "docs_minhash_pairs": (
        "Arrow-batched signatures (spread across the session's "
        "parallelism when the input arrives under-split — round 12), "
        "one bucket-join exchange, candidate-only verification"
    ),
    "emb_cosine_topk": (
        "query side broadcast; corpus scored per partition; per-query "
        "top-k window after a tiny exchange"
    ),
    "emb_pca_project": (
        "the fixed-point PCA's visible plan is ONLY the map-only "
        "projection: pruned 2-column scan, quantize + four "
        "aggregate(zip_with(literal-component)) dot products entirely "
        "inside codegen, one range exchange for the ordered output — "
        "the moments pass (one partial row per partition, no shuffle) "
        "and the O(d^2) driver eigensolve already ran at build time"
    ),
    "graph_triangle_count": (
        "degree table broadcast into both rank attaches (inside the "
        "localCheckpoint boundary, shown as Scan ExistingRDD here); "
        "sorted-adjacency intersection form: the node-sized adjacency "
        "table joins the checkpointed edge stream twice and "
        "array_intersect evaluates inline in codegen — the quadratic "
        "wedge stream is never materialized or shuffled"
    ),
    "events_rfm_segments_approx": (
        "the scale-safe twin of the exact RFM ntile (round-11 verdict "
        "#3): per-user aggregate map-side combined, metrics mapped to "
        "bounded digit buckets, per-bucket histogram (distributed agg, "
        "~hundreds of rows out), the ONLY unpartitioned window runs "
        "over the bucket domain — never O(entities) rows on one task — "
        "and the three tiny score tables broadcast back onto the "
        "per-user stream"
    ),
    "multimodal_jpeg_stats": (
        "plant → Huffman/IDCT decode → stats as ONE fused mapInPandas "
        "chain: zero exchanges anywhere — the codec tier scales purely "
        "with executors"
    ),
    "docs_index_probe_dedup": (
        "new batch signatures map-only; band probe equi-joins the "
        "partitioned persisted index; candidates semi-join-prune the "
        "shingle store; exact Jaccard runs as JVM array_intersect — "
        "corpus text absent from every scan in the plan"
    ),
    "part_pareto_frontier": (
        "per-size aggregate broadcast back; skyline is one filter — "
        "no self-join"
    ),
    "events_max_concurrency": (
        "two-phase prefix scan: day-partitioned running sums + "
        "a window over per-day partials only"
    ),
    "orc_stats_pruned_read": (
        "file list fixed at plan time by the external min/max index; "
        "residual filter pushed into the ORC scan"
    ),
    "join_skewed_hot_key": (
        "forced sort-merge join on the 50%-hot key (broadcast would "
        "dissolve the skew being exercised); AQE splits the oversized "
        "partition at runtime by mapper ranges — plan-asserted in "
        "tests/test_plan_budgets.py; salted twin shuffles on (k, salt)"
    ),
    "emb_lsh_recall_eval": (
        "planted clones through the real LSH path: Arrow-batched "
        "signatures, OR-ed bucket join, exact re-scoring; broadcast of "
        "the 50-row found-set back onto the planted enumeration"
    ),
    "sales_yoy_growth": (
        "map-side-combined monthly aggregate; lag partitioned by "
        "calendar month — no global sort"
    ),
    "docs_dup_ngram_spans": (
        "linear gram stream (transform+posexplode, no Python), one "
        "count agg + semi join — occurrence rows survive once, no "
        "pairwise blowup; per-doc partitioned islands window"
    ),
    "stream_gram_index_ingest": (
        "per-trigger: batch-sized cut (index scan map-only, tag "
        "filter = replay self-match guard), idempotent result "
        "overwrite by batch_id, presence-no-op gram append"
    ),
    "docs_index_cut_dedup": (
        "batch gram hashes BROADCAST onto the map-only index scan "
        "(index never shuffles; matched set is batch-bounded); "
        "within-batch keep-first rides the count agg; excision is "
        "batch-sized"
    ),
    "docs_classifier_train": (
        "sparse (doc, bucket, count) features — never a dense vector; "
        "per gradient step one broadcast of <=65 weight rows, one "
        "groupBy(doc), one map-side-combined groupBy(j<=65), one "
        "65-row driver collect; all integer fixed point"
    ),
    "stream_fanout_atomic": (
        "one localCheckpoint per batch feeds N table writes (batch "
        "read once, released after commit); marker appended strictly "
        "after all tables — readers semi-join the broadcast marker "
        "set, so the visibility filter costs nothing vs the scan"
    ),
    "docs_cut_dup_spans": (
        "keep-first selection rides the duplicate-count agg (min "
        "struct, map-side partials — no per-gram sort under hot "
        "boilerplate); removal volume bounded by n x duplicated "
        "region; reassembly collect_list bounded by doc length"
    ),
    "docs_contamination_spans": (
        "eval gram hashes distinct + BROADCAST (eval sets are small "
        "by nature); training gram stream map-only through the semi "
        "join; per-doc islands window — nothing corpus-pairwise"
    ),
    "docs_index_forget_dedup": (
        "merge-on-read tombstone anti-join BROADCAST on the probe "
        "side; forget is O(deleted); compaction preserves band "
        "partition layout"
    ),
}


def props(plan: str) -> list[str]:
    out = []
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    real = [p for p in pushed if p.strip()]
    if real:
        out.append(f"pushed filters on {len(real)} scan(s)")
    bcasts = plan.count("BroadcastHashJoin")
    if bcasts:
        out.append(f"{bcasts} broadcast hash join(s)")
    smj = plan.count("SortMergeJoin")
    if smj:
        out.append(f"{smj} sort-merge join(s)")
    if "dynamicpruning" in plan.lower():
        out.append("dynamic partition pruning")
    ex = len(re.findall(r"\(\d+\) Exchange", plan))
    out.append(f"{ex} exchange(s)")
    ws = len(re.findall(r"WholeStageCodegen", plan))
    if ws:
        out.append(f"{ws} whole-stage codegen span(s)")
    if "TakeOrderedAndProject" in plan:
        out.append("TakeOrderedAndProject (distributed top-k)")
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    if schemas:
        widths = [s.count(",") + 1 if s else 0 for s in schemas]
        out.append(f"scan widths {widths} cols (pruned)")
    return out


def main() -> None:
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import __spark_entry__ as entry
    from flink_orc_sink_spark.session import get_spark

    spark = get_spark("gen-plans")
    qs = entry.queries()
    sf = "/root/testdata/sf0.01"
    print("# PLANS — flagship physical plans\n")
    print(
        "Generated by tools/gen_plans.py from the live registry at"
        " sf0.01 (AQE on; runtime re-plans can only improve these)."
        " Each entry: why this plan is the one you'd want at 100 TB,"
        " extracted properties, then the formatted plan.\n"
    )
    for name, why in FLAGSHIPS.items():
        df = qs[name](spark, sf)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        print(f"## {name}\n")
        print(f"**Design**: {why}\n")
        print(f"**Extracted**: {'; '.join(props(plan))}\n")
        print("```")
        # the tree section only — the per-node detail is reproducible
        tree = plan.split("\n\n")[0]
        print(tree[:4000])
        print("```\n")


if __name__ == "__main__":
    main()
