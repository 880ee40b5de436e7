"""Distributed graph operators over edge DataFrames.

The reference has no graph surface (SURVEY.md §2.4 — NOT PRESENT);
this extends the engine with the iterative-algorithm family that
training-data pipelines use on link/citation/co-occurrence graphs.
Connected components (min-label propagation) lives in
``operators/dedup.py::neardup_clusters``; this module adds PageRank.

Determinism contract: ranks are FIXED-POINT int64 ("parts per
``scale``", default 1e12) and every update uses integer multiply /
truncated integer division only — Spark ``DIV`` and DuckDB ``//``
agree bit-for-bit on non-negative operands, so a fixed-iteration run
hashes identically on both engines regardless of partitioning or
shuffle order (float PageRank cannot: addition order changes the last
ulps). The truncation leaks O(outdeg) parts per node per iteration —
a defined semantics, not an approximation error.

Scale shape (per iteration): one equi-join of the rank vector with
the edge list on ``src`` (both sides partitionable by the same key —
co-located after the first exchange), one map-side-combined groupBy
on ``dst``. Lineage is cut with ``localCheckpoint`` every
``checkpoint_every`` iterations, mirroring
``dedup.py::neardup_clusters``; nothing is collected to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 5,
) -> DataFrame:
    """Minimum-hop distance from a seed set via frontier expansion
    (distributed BFS) — the reachability / k-hop-neighbourhood family
    the reference lacks (SURVEY.md §2.4 — NOT PRESENT).

    ``seeds`` is a DataFrame with one column ``node``. Returns
    ``(node, hops)`` for every node reachable within ``max_hops``,
    where ``hops`` is the MINIMUM hop count (0 for seeds). Exact, so
    it is value-checkable against a depth-bounded ``WITH RECURSIVE``
    oracle.

    Scale shape (per hop): one equi-join of the current frontier with
    the edge list on ``src`` (frontier is the small side — broadcast
    once it shrinks below the AQE threshold), one ``distinct`` on the
    new frontier, one left-anti join against the visited set. The
    iteration count is the FIXED ``max_hops`` — no driver-side
    convergence read — and lineage is cut with ``localCheckpoint``
    every ``checkpoint_every`` hops, mirroring ``pagerank_fixed``.
    At 100 TB the visited set stays partitioned on ``node`` across
    iterations, so the anti-join reuses the exchange.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    visited = seeds.select("node").distinct().withColumn("hops", F.lit(0))
    frontier = visited.select("node")
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier.node == e.src)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("hops", F.lit(h))
        )
        visited = visited.unionByName(nxt)
        frontier = nxt.select("node")
        if h % checkpoint_every == 0:
            visited = visited.localCheckpoint(eager=False)
            frontier = frontier.localCheckpoint(eager=False)
    return visited


def pagerank_fixed(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping_pct: int = 85,
    scale: int = 10**12,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Fixed-point PageRank over a distinct directed edge list.

    Update rule (all int64):
    ``rank'(v) = (scale*(100-damping_pct)) DIV (100*N)
    + (damping_pct * Σ_{u→v} (rank(u) DIV outdeg(u))) DIV 100``.
    Dangling-node mass is dropped (documented; the graphs this serves
    — co-occurrence / transition graphs — have none).

    Returns ``(node, rank_ppt)`` with ranks in parts-per-``scale``.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    n = nodes.agg(F.count("*").alias("n_nodes"))
    ranks = nodes.crossJoin(F.broadcast(n)).select(
        "node",
        "n_nodes",
        F.expr(f"{scale}L DIV n_nodes").alias("rank_ppt"),
    )
    for i in range(iterations):
        contribs = (
            ranks.join(e, ranks.node == e.src)
            .join(outdeg, "src")
            .select("dst", F.expr("rank_ppt DIV outdeg").alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("in_sum"))
        )
        ranks = (
            nodes.crossJoin(F.broadcast(n))
            .join(contribs, nodes.node == contribs.dst, "left")
            .select(
                "node",
                "n_nodes",
                F.expr(
                    f"({scale}L * {100 - damping_pct}) DIV (100 * n_nodes)"
                    f" + ({damping_pct} * coalesce(in_sum, 0L)) DIV 100"
                ).alias("rank_ppt"),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select("node", "rank_ppt")
