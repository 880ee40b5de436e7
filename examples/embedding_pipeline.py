"""Embedding-corpus pipeline — the VECTOR half of a training-data run
(the text half is ``curation_pipeline.py``), composed from the
independently oracle-checked operators:

1. semantic dedup — SemDeDup cluster-then-dedup: fixed-point k-means
                    cells + within-cell cosine >= threshold, keep the
                    lowest id per duplicate group
                    (``operators/similarity.py::semantic_dedup``)
2. PCA audit      — fixed-point power-iteration projection of the
                    SURVIVORS onto 4 principal axes (the
                    compression / visualization signal a curation
                    run logs; ``operators/linalg.py``)
3. ANN index      — persisted, cell-partitioned IVF index over the
                    survivors; every later search reads only the
                    probed cell directories
                    (``operators/similarity.py::build_ivf_index``)
4. probe          — top-k neighbors for a query batch through the
                    index (partition-pruned scan, exact re-score)
5. sink           — the deduped vector catalog (id + projections) as
                    committed ORC

Cost shape at 100 TB: one shuffle for the cell grouping (stage 1),
one scan for the integer moments (stage 2), one cell-partitioned
write (stage 3); the probe reads nprobe directories regardless of
corpus size. Nothing is ever all-pairs.

Usage:
    python examples/embedding_pipeline.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def run(spark: SparkSession, sf_dir: str, out: str) -> dict:
    from flink_orc_sink_spark.operators.linalg import (
        pca_project_fixedpoint,
    )
    from flink_orc_sink_spark.operators.similarity import (
        build_ivf_index,
        ivf_search,
        semantic_dedup,
    )
    from flink_orc_sink_spark.session import release_local_checkpoint
    from flink_orc_sink_spark.sources.catalog import table
    from flink_orc_sink_spark.sources.orc_sink import write_orc

    counts: dict = {}
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda v: v.cast("double")).alias("embedding")
    )
    counts["corpus"] = emb.count()

    flags = semantic_dedup(
        emb, "vec_id", "embedding", threshold=0.95, nlist=16
    )
    # checkpoint: every downstream stage (PCA moments, index build,
    # query selection, probe) would otherwise re-execute the dedup
    # shuffle + join — 5 corpus-scale recomputes instead of 1
    survivors = (
        emb.join(
            flags.filter(~F.col("is_dup")).select("vec_id"), "vec_id"
        )
        .localCheckpoint(eager=True)
    )
    counts["after_semantic_dedup"] = survivors.count()

    proj = pca_project_fixedpoint(
        survivors, "vec_id", "embedding", dim=64, k=4
    )

    idx = os.path.join(out, "ivf_index")
    build_ivf_index(
        survivors, "vec_id", "embedding", idx, nlist=16, seed=7
    )
    queries = survivors.orderBy("vec_id").limit(5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    hits = ivf_search(
        spark, queries, idx, "qid", "qvec", k=3, nprobe=4
    )
    counts["probe_hits"] = hits.count()

    catalog = os.path.join(out, "catalog")
    write_orc(proj, catalog)
    counts["written"] = spark.read.orc(catalog).count()
    release_local_checkpoint(survivors)
    return counts


def main() -> None:
    from flink_orc_sink_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/embedding_pipeline"
    spark = get_spark("embedding-pipeline")
    for stage, n in run(spark, sf_dir, out).items():
        print(f"{stage:24s} {n}")


if __name__ == "__main__":
    main()
