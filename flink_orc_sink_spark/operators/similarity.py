"""Similarity search over embedding columns.

Two tiers (SURVEY.md §7.2 step 5):

- **brute-force top-k** — exact; query side broadcast, corpus side
  streamed, per-group top-k via window. Correctness baseline and
  perfectly adequate when |queries| · |corpus| per partition is small.
- **hyperplane-LSH ANN** — the 100 TB path: sign-random-projection
  signatures bucket the corpus; queries probe only their bucket
  (plus optional multi-probe neighbors), turning all-pairs into
  per-bucket micro-joins. Planes are derived deterministically from
  md5 so runs are reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_orc_sink_spark.functions.vector import cosine

# Deterministic pseudo-random hyperplanes: component c of plane p is
# derived from md5(f"{p}_{c}") mapped into [-1, 1). Reproducible in any
# engine with md5; no RNG state to ship.
_HASH_RANGE = float(1 << 32)


def _plane_component(p: int, c: int) -> F.Column:
    key = F.lit(f"{p}_{c}")
    h = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
    return (h.cast("double") / F.lit(_HASH_RANGE)) * 2.0 - 1.0


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    query_vec: str,
    corpus_vec: str,
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-``k`` corpus neighbors for each query vector.

    The query side is broadcast (it is the small side by definition of
    the problem); each corpus partition scores its rows against all
    queries locally, then a window keeps k per query. No corpus
    shuffle until the final (tiny) top-k exchange.
    """
    q = F.broadcast(
        queries.select(
            F.col(query_id).alias("qid"), F.col(query_vec).alias("qvec")
        )
    )
    c = corpus.select(F.col(corpus_id).alias("cid"), F.col(corpus_vec).alias("cvec"))
    scored = (
        q.crossJoin(c)
        .filter(F.col("qid") != F.col("cid"))
        .select(
            "qid",
            "cid",
            F.round(cosine("qvec", "cvec"), 6).alias("cos_sim"),
        )
    )
    from flink_orc_sink_spark.operators.relational import topk_per_group

    return topk_per_group(
        scored,
        ["qid"],
        [F.col("cos_sim").desc(), F.col("cid").asc()],
        k,
        rank_col="rank",
    ).select("qid", "cid", "cos_sim", "rank")


def hyperplane_signature(vec_col: str, n_planes: int, dims: int) -> F.Column:
    """Sign-random-projection LSH signature as an integer bucket id:
    bit p = 1 iff dot(vec, plane_p) >= 0. Pure Catalyst expressions —
    the dot product unrolls to ``dims`` multiply-adds per plane."""
    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        dot = None
        for c in range(dims):
            term = F.element_at(F.col(vec_col), c + 1).cast("double") * _plane_component(p, c)
            dot = term if dot is None else dot + term
        bit = F.when(dot >= 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
        sig = sig + bit
    return sig


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    query_vec: str,
    corpus_vec: str,
    k: int = 5,
    n_planes: int = 8,
    dims: int = 64,
) -> DataFrame:
    """Approximate top-``k``: score only corpus rows whose hyperplane
    bucket matches the query's. 2^n_planes buckets shrink candidate
    sets ~2^n_planes-fold; recall is tunable via n_planes (fewer
    planes = bigger buckets = higher recall, more work).

    The join is an equi-join on the bucket id — shuffle-partitioned,
    skew handled by AQE. This is the plan that survives a 100 TB
    corpus; exactness is traded consciously (use
    :func:`brute_force_topk` as the small-scale oracle).
    """
    q = queries.select(
        F.col(query_id).alias("qid"),
        F.col(query_vec).alias("qvec"),
        hyperplane_signature(query_vec, n_planes, dims).alias("bucket"),
    )
    c = corpus.select(
        F.col(corpus_id).alias("cid"),
        F.col(corpus_vec).alias("cvec"),
        hyperplane_signature(corpus_vec, n_planes, dims).alias("bucket"),
    )
    scored = (
        q.join(c, "bucket")
        .filter(F.col("qid") != F.col("cid"))
        .select("qid", "cid", F.round(cosine("qvec", "cvec"), 6).alias("cos_sim"))
    )
    from flink_orc_sink_spark.operators.relational import topk_per_group

    return topk_per_group(
        scored,
        ["qid"],
        [F.col("cos_sim").desc(), F.col("cid").asc()],
        k,
        rank_col="rank",
    ).select("qid", "cid", "cos_sim", "rank")


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
) -> DataFrame:
    """Exact embedding near-duplicate pairs: cosine >= threshold,
    ``id_a < id_b``. All-pairs formulation — the correctness oracle
    for :func:`lsh_neardup_pairs`; at scale use the LSH variant."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b", F.round(cosine("va", "vb"), 6).alias("cos_sim")
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def lsh_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    n_planes: int = 8,
    dims: int = 64,
) -> DataFrame:
    """Approximate embedding near-dup pairs via shared LSH bucket +
    exact cosine verification — the embedding-cosine dedup path for a
    100 TB corpus."""
    sigs = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        hyperplane_signature(vec_col, n_planes, dims).alias("bucket"),
    )
    a = sigs.select(
        F.col("id").alias("id_a"), F.col("v").alias("va"), "bucket"
    )
    b = sigs.select(
        F.col("id").alias("id_b"), F.col("v").alias("vb"), "bucket"
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cosine("va", "vb"), 6).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
        .distinct()
    )
