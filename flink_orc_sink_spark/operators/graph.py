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


def triangle_count(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Exact global triangle count via DEGREE-ORDERED edge
    orientation (the standard distributed formulation: Suri &
    Vassilvitskii's MR triangle counting / GraphX's approach).

    Each undirected edge is oriented from its lower-(degree, id)
    endpoint to the higher one, so every triangle is counted exactly
    once at its lowest-ranked vertex, and — the 100 TB point — the
    wedge-generation join fans out by ORIENTED out-degree, which is
    O(sqrt(m)) per node even for power-law graphs where raw degree is
    O(n). Two shuffles: one self-join on the wedge pivot, one semi
    join back onto the oriented edge set. No driver-side data path.

    Returns a single row ``(n_nodes, n_edges, n_triangles)``.
    """
    # Canonical undirected edge set: x < y, deduped, no self-loops.
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("x"),
            F.greatest(F.col(src), F.col(dst)).alias("y"),
        )
        .filter(F.col("x") < F.col("y"))
        .distinct()
        # the canonical edge set feeds degrees, orientation, and the
        # edge count — materialize once (eagerly: three consumers
        # would otherwise each trigger the dedup on first touch)
        .localCheckpoint(eager=True)
    )
    deg = (
        e.select(F.col("x").alias("node"))
        .unionAll(e.select(F.col("y").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    # Total order on vertices: (degree, id) as a STRUCT — struct
    # comparison is lexicographic, so this is safe for any id range
    # (arithmetic packing would silently corrupt the order for ids
    # ≥ the shift base or negative ids).
    rank = F.struct(F.col("deg").alias("d"), F.col("node").alias("n")).alias(
        "rank"
    )
    # The degree table is node-sized (orders of magnitude below the
    # edge set); broadcasting it keeps BOTH rank-attach joins
    # shuffle-free — the edge stream never moves until the wedge join.
    ranked = deg.select("node", rank)
    er = (
        e.join(F.broadcast(ranked.withColumnRenamed("node", "x")), "x")
        .withColumnRenamed("rank", "rank_x")
        .join(F.broadcast(ranked.withColumnRenamed("node", "y")), "y")
        .withColumnRenamed("rank", "rank_y")
    )
    oriented = er.select(
        F.when(F.col("rank_x") < F.col("rank_y"), F.col("x"))
        .otherwise(F.col("y"))
        .alias("u"),
        F.when(F.col("rank_x") < F.col("rank_y"), F.col("rank_x"))
        .otherwise(F.col("rank_y"))
        .alias("rank_u"),
        F.when(F.col("rank_x") < F.col("rank_y"), F.col("y"))
        .otherwise(F.col("x"))
        .alias("v"),
        F.when(F.col("rank_x") < F.col("rank_y"), F.col("rank_y"))
        .otherwise(F.col("rank_x"))
        .alias("rank_v"),
    )
    # Consumed 3× (both wedge sides + the close probe). Pre-partition
    # on the wedge pivot THEN checkpoint eagerly: LogicalRDD keeps the
    # hash partitioning, so the wedge self-join needs no exchange on
    # either side, and the eager materialization means the orientation
    # pipeline runs once instead of once per consumer.
    oriented = oriented.repartition("u").localCheckpoint(eager=True)
    a = oriented.select(
        F.col("u"), F.col("v").alias("w1"), F.col("rank_v").alias("rw1")
    )
    b = oriented.select(
        F.col("u"), F.col("v").alias("w2"), F.col("rank_v").alias("rw2")
    )
    # Wedges at the pivot u: two out-neighbours ordered by rank; the
    # triangle closes iff the oriented edge w1->w2 exists.
    wedges = a.join(b, "u").filter(F.col("rw1") < F.col("rw2"))
    closed = wedges.join(
        oriented.select(
            F.col("u").alias("w1"), F.col("v").alias("w2")
        ),
        ["w1", "w2"],
        "left_semi",
    )
    n_nodes = deg.agg(F.count("*").alias("n_nodes"))
    n_edges = e.agg(F.count("*").alias("n_edges"))
    n_tri = closed.agg(F.count("*").alias("n_triangles"))
    return n_nodes.crossJoin(n_edges).crossJoin(n_tri)
