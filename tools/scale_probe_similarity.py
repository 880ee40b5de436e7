"""Similarity-tier scale probe: do LSH near-dup and IVF search stay
sublinear/bounded as the corpus grows? (round-2 verdict item 7 — the
dedup tier already has this evidence in scale_probe.py.)

Generates seeded CLUSTERED vector corpora at 1x / 5x / 10x (clustered
is the distribution where ANN is possible; isotropic random admits no
sublinear index) with planted near-duplicate pairs (every 50th vector
is a tiny perturbation of its predecessor), then measures:

- **LSH near-dup** (`lsh_neardup_pairs`): candidate-pair count and
  wall time per size. The claim under test: candidates grow ~linearly
  in corpus size (bucket density is set by the cluster structure, not
  by n²) and planted-pair recall stays 1.0. A quadratic candidate
  count is the classic LSH failure (degenerate buckets).
- **IVF persisted index** (`build_ivf_index` + `ivf_search`): number
  of distinct index files the probed search actually reads (via
  ``input_file_name()``) vs the total file count. The claim: files
  read is bounded by the probed cells — it does NOT grow with corpus
  size — while planted-neighbor recall stays high. This is partition
  pruning doing its job at the file listing.

Prints one JSON line per (tier, size); paste the table into SCALE.md.

Usage: python tools/scale_probe_similarity.py [sizes ...]
       (default: 10000 50000 100000)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

DIMS = 64
# Cluster SIZE is held constant as the corpus grows (a real corpus
# grows by adding new content/topics, not by densifying the same
# ones), so intra-cluster pair mass — the candidate-generation load —
# stays LINEAR in n. A fixed cluster COUNT would make it quadratic in
# any index, which says nothing about the index.
CLUSTER_SIZE = 100


def make_vectors(spark, n: int, path: str, seed: int = 11) -> None:
    """Clustered vectors + planted near-dups: every 50th vector is its
    predecessor plus 1% noise (cosine ~0.999). Written directly with
    pyarrow (driver-side createDataFrame of n×64 Python lists is the
    probe's own bottleneck at 100k, not the thing under test)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    n_clusters = max(50, n // CLUSTER_SIZE)
    centers = rng.standard_normal((n_clusters, DIMS))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.integers(0, n_clusters, size=n)
    # Noise sized so intra-cluster cosine ~0.78 — clustered enough for
    # ANN structure, loose enough that ONLY planted pairs clear the
    # 0.95 near-dup threshold (keeps ground truth linear in n, so the
    # candidate/pair counts isolate the INDEX's scaling behavior).
    vecs = centers[assign] + 0.6 * rng.standard_normal((n, DIMS)) / np.sqrt(DIMS)
    for i in range(49, n, 50):
        vecs[i] = vecs[i - 1] + 0.01 * rng.standard_normal(DIMS) / np.sqrt(DIMS)
    os.makedirs(path, exist_ok=True)
    emb = pa.FixedSizeListArray.from_arrays(
        pa.array(vecs.astype(np.float32).ravel()), DIMS
    ).cast(pa.list_(pa.float32()))
    tbl = pa.table({"vec_id": pa.array(range(n), pa.int64()), "embedding": emb})
    pq.write_table(tbl, os.path.join(path, "part-0.parquet"), row_group_size=n // 32 + 1)


def probe_lsh(spark, path: str, n: int) -> dict:
    from flink_orc_sink_spark.operators.similarity import lsh_neardup_pairs

    df = spark.read.parquet(path)
    # Planes must scale with log2(n) to hold BUCKET OCCUPANCY constant
    # (~n/2^planes rows per table-bucket): the banded self-join costs
    # sum(|bucket|^2), so fixed planes means occupancy — and join cost —
    # grows linearly with n per bucket → quadratic overall. With
    # occupancy pinned, cost is linear in n. (Measured here: fixed
    # b=8 gave 17 s → 191 s for 10k → 50k; scaled planes restore the
    # linear profile.) At cosine ≥ 0.95 the OR-16 construction keeps
    # recall ≈ 1 up to b ≈ 16.
    n_planes = max(8, int(np.ceil(np.log2(n))) - 3)
    t0 = time.time()
    pairs = lsh_neardup_pairs(
        df, "vec_id", "embedding", threshold=0.95, dims=DIMS,
        n_planes=n_planes,
    )
    found = {(r.id_a, r.id_b) for r in pairs.collect()}
    wall = time.time() - t0
    planted = {(i - 1, i) for i in range(49, n, 50)}
    recall = len(planted & found) / len(planted)
    return {
        "tier": "lsh_neardup",
        "n": n,
        "n_planes": n_planes,
        "wall_sec": round(wall, 2),
        "pairs_found": len(found),
        "planted": len(planted),
        "planted_recall": round(recall, 4),
    }


def probe_ivf(spark, path: str, n: int, work: str) -> dict:
    from pyspark.sql import functions as F

    from flink_orc_sink_spark.operators.similarity import (
        build_ivf_index,
        ivf_search,
    )

    df = spark.read.parquet(path)
    idx = os.path.join(work, f"ivf_{n}")
    t0 = time.time()
    build_ivf_index(
        df, "vec_id", "embedding", idx, nlist=64, sample_size=20_000
    )
    build_sec = time.time() - t0

    # Queries = a FIXED 200-clone set at every corpus size (their true
    # nearest neighbor is the predecessor vector). Fixing the query
    # batch isolates the per-query scan cost — n/50 queries would grow
    # the batch linearly and read quadratic-looking totals that say
    # nothing about the index.
    queries = df.filter(
        (F.col("vec_id") % 50 == 49) & (F.col("vec_id") < 10_000)
    )
    t0 = time.time()
    res = ivf_search(
        spark, queries, idx, "vec_id", "embedding", k=5, nprobe=8
    )
    hits = {}
    for r in res.collect():
        hits.setdefault(r.qid, set()).add(r.cid)
    search_sec = time.time() - t0
    recall = sum(
        1 for q, cids in hits.items() if q - 1 in cids
    ) / max(len(hits), 1)

    data = os.path.join(idx, "data")
    total_files = sum(
        1
        for _, _, files in os.walk(data)
        for f in files
        if f.endswith(".parquet")
    )
    # Files ONE query's probed scan actually reads: derive its probed
    # cells exactly the way ivf_search does, then count distinct
    # ``input_file_name()`` on the pruned reader. The claim: bounded by
    # nprobe cell directories, independent of corpus size.
    from flink_orc_sink_spark.operators.similarity import make_cell_udfs

    cent_pdf = (
        spark.read.parquet(os.path.join(idx, "centroids"))
        .orderBy("cell")
        .toPandas()
    )
    centroids = np.asarray(cent_pdf["centroid"].tolist(), dtype=np.float64)
    _, probe_cells = make_cell_udfs(centroids, nprobe=8)
    probed = sorted(
        int(r.cell)
        for r in queries.limit(1)
        .select(F.explode(probe_cells(F.col("embedding"))).alias("cell"))
        .distinct()
        .collect()
    )
    files_read = (
        spark.read.parquet(data)
        .filter(F.col("cell").isin(probed))
        .select(F.input_file_name())
        .distinct()
        .count()
    )
    return {
        "tier": "ivf",
        "n": n,
        "build_sec": round(build_sec, 2),
        "search_sec": round(search_sec, 2),
        "planted_recall": round(recall, 4),
        "index_files_total": total_files,
        "files_read_8probe": files_read,
    }


def probe_pq(spark, path: str, n: int) -> dict:
    """PQ tier: one LUT-gather pass over the encoded corpus. Claims
    under test: wall time grows ~LINEARLY in n (it is a single
    map-only corpus pass — no join, no candidate blowup), and
    planted-clone recall stays high because ADC ranks the clone's
    codes at the top and exact re-rank fixes any residual order."""
    from pyspark.sql import functions as F

    from flink_orc_sink_spark.operators.similarity import pq_topk

    df = spark.read.parquet(path)
    queries = df.filter(
        (F.col("vec_id") % 50 == 49) & (F.col("vec_id") < 10_000)
    )
    t0 = time.time()
    res = pq_topk(
        queries, df, "vec_id", "vec_id", "embedding", "embedding",
        k=5, m=8, ksub=16, shortlist=32,
    )
    hits = {}
    for r in res.collect():
        hits.setdefault(r.qid, set()).add(r.cid)
    wall = time.time() - t0
    recall = sum(
        1 for q, cids in hits.items() if q - 1 in cids
    ) / max(len(hits), 1)
    return {
        "tier": "pq",
        "n": n,
        "wall_sec": round(wall, 2),
        "n_queries": len(hits),
        "planted_recall": round(recall, 4),
    }


def main() -> None:
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from flink_orc_sink_spark.session import get_spark

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    tiers = [a[2:] for a in sys.argv[1:] if a.startswith("--")] or [
        "lsh",
        "ivf",
        "pq",
    ]
    sizes = [int(a) for a in args] or [10_000, 50_000, 100_000]
    spark = get_spark("scale-probe-similarity")
    work = tempfile.mkdtemp(prefix="scale_probe_sim_")
    try:
        for n in sizes:
            path = os.path.join(work, f"vecs_{n}")
            make_vectors(spark, n, path)
            if "lsh" in tiers:
                print(json.dumps(probe_lsh(spark, path, n)), flush=True)
            if "ivf" in tiers:
                print(json.dumps(probe_ivf(spark, path, n, work)), flush=True)
            if "pq" in tiers:
                print(json.dumps(probe_pq(spark, path, n)), flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
