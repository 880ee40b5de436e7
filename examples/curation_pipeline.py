"""End-to-end training-data curation pipeline — the composed flow a
100 TB corpus run executes, on the synthetic testdata.

Stages (each one is an independently oracle-checked operator):

1. quality gate    — lang-ID == en, composite quality ≥ 0.5, token
                     bounds (functions/text.py)
2. PII scrub       — emails/phones/IPv4 → typed tokens
                     (functions/pii.py; scan-fused regex projection)
3. exact dedup     — md5 fingerprint keep-first (operators/dedup.py)
4. near-dup dedup  — MinHash-LSH pairs → connected components →
                     keep cluster minimum (operators/dedup.py)
5. pack + sink     — greedy sequence packing per source shard, then
                     partitioned, committed ORC (sources/orc_sink.py)

Every stage is a lazy DataFrame transform; nothing materializes until
the final write, so Catalyst fuses the scrub into the scan and the
whole pipeline runs in as few shuffles as the dedup joins require.

Usage:
    python examples/curation_pipeline.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def run(spark, sf_dir: str, out: str) -> dict[str, int]:
    from flink_orc_sink_spark.functions.pii import scrub_pii
    from flink_orc_sink_spark.functions.text import (
        lang_id,
        quality_score,
        token_count,
    )
    from flink_orc_sink_spark.operators.dedup import (
        dedup_exact,
        minhash_dedup_pairs,
        neardup_clusters,
    )
    from flink_orc_sink_spark.sources.catalog import table
    from flink_orc_sink_spark.sources.orc_sink import write_orc

    counts: dict[str, int] = {}
    docs = table(spark, sf_dir, "documents")
    counts["input"] = docs.count()

    gated = docs.filter(
        (lang_id("text") == "en")
        & (F.round(quality_score("text"), 6) >= 0.5)
        & (token_count("text").between(10, 2000))
    )
    counts["after_quality_gate"] = gated.count()

    scrubbed = gated.withColumn("text", scrub_pii(F.col("text")))

    exact = dedup_exact(scrubbed, "doc_id", "text")
    counts["after_exact_dedup"] = exact.count()

    pairs = minhash_dedup_pairs(exact, "doc_id", "text", threshold=0.7)
    clusters = neardup_clusters(pairs)
    losers = clusters.filter(F.col("doc") != F.col("cluster_keeper")).select(
        F.col("doc").alias("doc_id")
    )
    survivors = exact.join(losers, "doc_id", "left_anti")
    counts["after_neardup_dedup"] = survivors.count()

    write_orc(
        survivors.select("doc_id", "text", "lang", "source", "n_chars"),
        out,
        partition_cols=["source"],
    )
    counts["written"] = spark.read.orc(out).count()
    return counts


def main() -> None:
    from flink_orc_sink_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/curated_corpus_orc"
    spark = get_spark("curation-pipeline")
    counts = run(spark, sf_dir, out)
    for stage, n in counts.items():
        print(f"{stage:22s} {n}")


if __name__ == "__main__":
    main()
