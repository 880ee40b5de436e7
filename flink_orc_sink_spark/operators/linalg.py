"""Distributed linear algebra over embedding columns: moments + PCA.

The pattern is the one MLlib's ``RowMatrix`` uses for
``computePrincipalComponents`` (public Spark source,
``mllib/linalg/distributed/RowMatrix.scala``): the *data* stays
distributed and only *fixed-size* summaries (a d-vector mean and a
d×d second-moment matrix) travel to the driver, where the trailing
O(d³) eigendecomposition is trivially cheap because d is the
embedding dimension (64–4096), not the row count.

Scale shape at 100 TB:

- ``moments`` is one ``mapInPandas`` pass — each Arrow batch folds
  into a running ``(count, sum, Xᵀ·X)`` with a single NumPy matmul;
  each *partition* emits exactly one partial row. No shuffle at all:
  the p partial rows (p = #partitions, each d²+d+1 doubles) are
  reduced driver-side, the same contract as ``treeAggregate`` with
  depth 1. For d=4096 a partial is ~128 MB — at that width switch
  ``partials_per_batch`` down so batches stay Arrow-sized; for the
  d≤1024 regime this is single-digit MB and a non-issue.
- ``pca_project`` broadcasts the (k×d) component matrix inside a
  pandas UDF closure — one matmul per Arrow batch, map-only.

Determinism: eigenvectors are sign-ambiguous; ``pca`` fixes each
component's sign so its largest-|magnitude| coordinate is positive,
making the output reproducible across runs/partitionings (the same
convention scikit-learn's ``svd_flip`` uses, described in its public
docs). Eigendecomposition itself is not SQL-expressible, so the
registered query is rows-only checked; exactness vs a single-node
NumPy PCA is asserted in ``tests/test_linalg.py``.
"""

from __future__ import annotations

from typing import Iterator, NamedTuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_orc_sink_spark.session import local_df


class PCAModel(NamedTuple):
    mean: np.ndarray           # (d,)
    components: np.ndarray     # (k, d) rows = principal axes
    explained_variance: np.ndarray  # (k,) eigenvalues (sample covariance)
    n: int


def moments(df: DataFrame, vec_col: str, dim: int):
    """One-pass distributed ``(n, mean, covariance)`` of a vector column.

    Returns ``(n, mean (d,), cov (d,d))`` with the *sample* covariance
    (n-1 denominator). One partial row per partition, no shuffle.
    """
    partial_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("s", T.ArrayType(T.DoubleType())),
            T.StructField("g", T.ArrayType(T.DoubleType())),
        ]
    )

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = np.zeros(dim)
        g = np.zeros((dim, dim))
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            n += x.shape[0]
            s += x.sum(axis=0)
            g += x.T @ x
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "g": [g.ravel().tolist()]}
            )

    rows = (
        df.select(vec_col)
        .mapInPandas(partials, schema=partial_schema)
        .collect()
    )
    if not rows:
        raise ValueError("moments() of an empty DataFrame")
    n = sum(r["n"] for r in rows)
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    g = np.sum([np.asarray(r["g"]).reshape(dim, dim) for r in rows], axis=0)
    mean = s / n
    # sample covariance from raw second moment: (G - n·μμᵀ) / (n-1)
    cov = (g - n * np.outer(mean, mean)) / max(n - 1, 1)
    return n, mean, cov


def pca(df: DataFrame, vec_col: str, dim: int, k: int) -> PCAModel:
    """Fit a k-component PCA of ``df[vec_col]`` (see module docstring)."""
    n, mean, cov = moments(df, vec_col, dim)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # (k, d)
    # svd_flip-style sign fix: largest-|coord| of each component > 0
    flip = np.sign(comps[np.arange(len(order)), np.abs(comps).argmax(axis=1)])
    flip[flip == 0] = 1.0
    comps = comps * flip[:, None]
    return PCAModel(mean, comps, evals[order], n)


def pca_project(
    df: DataFrame, id_col: str, vec_col: str, model: PCAModel, round_dp: int = 6
) -> DataFrame:
    """Map-only projection onto the fitted components.

    Output: ``(id_col, proj array<double> length k)`` — centered,
    rotated, rounded to ``round_dp`` for cross-run reproducibility.
    """
    mean, comps = model.mean, model.components
    schema = T.StructType(
        [
            next(f for f in df.schema.fields if f.name == id_col),
            T.StructField("proj", T.ArrayType(T.DoubleType())),
        ]
    )

    def proj(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            p = np.round((x - mean) @ comps.T, round_dp)
            yield pd.DataFrame({id_col: pdf[id_col], "proj": list(p)})

    return df.select(id_col, vec_col).mapInPandas(proj, schema=schema)


def _fd(a: int, b: int) -> int:
    """Exact floor division via the non-negative-remainder form — the
    portable construction engines agree on (DuckDB's ``//`` truncates
    toward zero on negatives; Python's floors). ``b`` must be > 0.
    Written identically in the SQL oracle (``_pca_fd_sql``)."""
    return (a - ((a % b) + b) % b) // b


def int_moments(df: DataFrame, vec_col: str, dim: int, scale: int = 1000):
    """One-pass distributed INTEGER moments of a quantized vector
    column: ``(n, s, g)`` with ``qv = floor(x·scale + 0.5)``,
    ``s_i = Σ qv_i``, ``g_ij = Σ qv_i·qv_j`` — all exact int sums, so
    the distributed result is BIT-IDENTICAL to any sequential engine
    regardless of partitioning/reduction order (the property float
    moments can never have). Same shuffle shape as :func:`moments`:
    one partial row per partition, no shuffle; partials are int64
    (safe while n·(scale·|x|)² < 2⁶³ per partition — comfortable up
    to ~10⁹ rows/partition at unit-range data), the driver reduce is
    arbitrary-precision Python."""
    partial_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("s", T.ArrayType(T.LongType())),
            T.StructField("g", T.ArrayType(T.LongType())),
        ]
    )

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        max_abs_q = 0
        s = np.zeros(dim, dtype=np.int64)
        g = np.zeros((dim, dim), dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            qf = np.floor(x * scale + 0.5)
            # bound BEFORE the int64 cast: an out-of-range float→int64
            # cast wraps to INT64_MIN silently (numpy emits at most a
            # RuntimeWarning), which would corrupt max_abs_q itself and
            # let the n·max|q|² check below pass on garbage
            if qf.size:
                mf = float(np.abs(qf).max())
                if not np.isfinite(mf) or mf >= float(1 << 62):
                    raise ValueError(
                        f"int_moments: quantized value |x*scale| = {mf}"
                        f" exceeds the int64-exact range (needs NaN-free"
                        f" input and |x|*{scale} < 2^62) — lower `scale`"
                        f" or normalize the vectors"
                    )
                max_abs_q = max(max_abs_q, int(mf))
            q = qf.astype(np.int64)
            n += q.shape[0]
            # np.int64 accumulation wraps SILENTLY on overflow; the
            # worst-case |g_ij| is n·max|q|², so enforce the documented
            # n·(scale·|x|)² < 2⁶³ bound LOUDLY (exact Python-int math —
            # the check itself cannot overflow)
            if n * max_abs_q * max_abs_q >= (1 << 63):
                raise ValueError(
                    f"int_moments: partition partial would overflow "
                    f"int64 (rows={n}, max|q|={max_abs_q}, bound "
                    f"n*max|q|^2 < 2^63) — lower `scale`, normalize the "
                    f"vectors, or repartition to smaller partitions"
                )
            s += q.sum(axis=0)
            g += q.T @ q
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "g": [g.ravel().tolist()]}
            )

    rows = (
        df.select(vec_col)
        .mapInPandas(partials, schema=partial_schema)
        .collect()
    )
    if not rows:
        raise ValueError("int_moments() of an empty DataFrame")
    n = sum(int(r["n"]) for r in rows)
    s = [sum(int(r["s"][i]) for r in rows) for i in range(dim)]
    g = [
        [sum(int(r["g"][i * dim + j]) for r in rows) for j in range(dim)]
        for i in range(dim)
    ]
    return n, s, g


def power_pca_components(
    n: int,
    s: list,
    g: list,
    dim: int,
    k: int = 4,
    iters: int = 8,
    c_scale: int = 1_000_000,
    v_scale: int = 10_000,
):
    """Driver-side fixed-point power iteration with Hotelling
    deflation over the integer moments — every step is integer
    multiply / add / max / floor-div, so ANY engine replaying the
    same recipe produces bit-identical components (the k-means /
    quality-classifier playbook applied to the eigenproblem; float
    eigensolves can never hash stably and SQL has no ``eigh``).

    The centered scatter ``M_ij = n·g_ij − s_i·s_j`` (an exact
    positive multiple of the covariance — same eigenvectors) is
    normalized to ``c_scale`` fixed point; each component runs
    ``iters`` matvec+renormalize passes from the all-ones vector,
    gets its sign fixed (first coordinate attaining max |v| made
    positive — svd_flip's convention, deterministically tie-broken),
    and is deflated out. O(k·iters·d²) driver work on d²+d+1 ints —
    trivially cheap for embedding dims; the corpus never leaves the
    executors (see :func:`int_moments`).

    Returns ``(mu, comps)``: ``mu_i = fd(s_i·1000, n)`` (the mean in
    milli-quantum units, used by the projection) and ``k`` integer
    component vectors in ``v_scale`` fixed point."""
    m = [[n * g[i][j] - s[i] * s[j] for j in range(dim)] for i in range(dim)]
    m0 = max(abs(x) for row in m for x in row)
    c = [[_fd(x * c_scale, max(m0, 1)) for x in row] for row in m]
    comps = []
    for ci in range(k):
        v = [v_scale] * dim
        for _t in range(iters):
            w = [sum(c[i][j] * v[j] for j in range(dim)) for i in range(dim)]
            mw = max(max(abs(x) for x in w), 1)
            v = [_fd(x * v_scale, mw) for x in w]
        mv = max(abs(x) for x in v)
        lead = next(i for i in range(dim) if abs(v[i]) == mv)
        if v[lead] < 0:
            v = [-x for x in v]
        comps.append(v)
        if ci == k - 1:
            # no deflation after the FINAL component — matches the SQL
            # oracle (_pca_sql skips it for c == k-1) and avoids the
            # one den==0 crash path the oracle doesn't have
            break
        w = [sum(c[i][j] * v[j] for j in range(dim)) for i in range(dim)]
        # Hotelling deflation C -= λ·uuᵀ with u = v/‖v‖, λ = vᵀCv/vᵀv:
        # the subtracted entry is num·v_i·v_j / den² (v is MAX-normed,
        # so den = ‖v‖² ≠ v_scale² — dividing by v_scale² leaves the
        # top eigenpair in the matrix and component 2+ collapses)
        num = sum(v[i] * w[i] for i in range(dim))
        den = sum(x * x for x in v)
        if den == 0:
            # rank-deficient input (constant/duplicate vectors, or
            # k > effective rank): the deflated scatter is all-zero and
            # the iterate collapsed. Fail with a diagnosable message
            # instead of ZeroDivisionError deep in _fd.
            raise ValueError(
                f"power_pca_components: component {ci + 1} collapsed to "
                f"the zero vector — input is rank-deficient (effective "
                f"rank < k={k}); reduce k or de-duplicate the corpus"
            )
        c = [
            [
                c[i][j] - _fd(num * v[i] * v[j], den * den)
                for j in range(dim)
            ]
            for i in range(dim)
        ]
    mu = [_fd(x * 1000, n) for x in s]
    return mu, comps


def pca_project_fixedpoint(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int = 64,
    k: int = 4,
    iters: int = 8,
    scale: int = 1000,
) -> DataFrame:
    """Fixed-point power-iteration PCA of a vector column, end to end
    VALUE-CHECKABLE: :func:`int_moments` (distributed, exact) →
    :func:`power_pca_components` (driver, integer recipe) → a
    MAP-ONLY projection built from Spark built-ins (the component
    vector becomes a literal array; one ``aggregate(zip_with(...))``
    dot product per component — whole-stage codegen, no Python in
    the row path).

    Output: ``(id_col, pc1..pck)`` — integers: ``pc_c = Σ_i
    (qv_i·1000 − mu_i)·v_ci``, i.e. the centered projection in
    (milli-quantum × v_scale) fixed point. Exact under any value
    hash; divide by ``1000·1000·v_scale`` for float coordinates."""
    n, s, g = int_moments(df, vec_col, dim, scale)
    mu, comps = power_pca_components(n, s, g, dim, k, iters)
    qv = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * scale + F.lit(0.5)).cast(
            "long"
        ),
    )
    out = df.select(F.col(id_col), qv.alias("_qv"))
    for ci, v in enumerate(comps):
        # Σ qv_i·(1000·v_ci)  −  Σ mu_i·v_ci  (the constant folds
        # driver-side — exact integer identity with Σ(qv·1000−mu)·v)
        wlit = F.array(*[F.lit(int(1000 * x)) for x in v])
        const = sum(mu[i] * v[i] for i in range(dim))
        out = out.withColumn(
            f"pc{ci + 1}",
            F.aggregate(
                F.zip_with(F.col("_qv"), wlit, lambda a, b: a * b),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
            - F.lit(int(const)),
        )
    return out.drop("_qv")


def kmeans_fixedpoint(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 4,
    iterations: int = 2,
    scale: int = 1000,
    shift: int = 10_000,
    return_centroids: bool = False,
):
    """Distributed Lloyd's k-means with BIT-EXACT integer arithmetic —
    the iterative-ML-training-loop family (like ``pagerank_fixed``)
    as a value-checkable operator: float k-means can never hash
    stably across engines, so quantize (``floor(x·scale + 0.5)``),
    SHIFT non-negative (floor division == truncation on both
    engines), keep centroids in fixed point (``Σ·scale div n``), and
    break distance ties toward the lowest centroid id. Every
    iteration then produces identical assignments in any engine —
    the distributed run hash-matches an unrolled SQL oracle.

    Plan shape per iteration: one broadcast of the k centroids onto
    the vector stream (assignment is map-side — ``min(struct(dist,
    cid))`` needs no window), one explode + map-side-combined
    groupBy(cluster, dim) for the update. Centroid count is the
    broadcast bound; vectors never shuffle. Init = the first ``k``
    vectors by id (deterministic seeding; k-means++ would sample).

    Returns final ``(id, cluster)`` assignments after ``iterations``
    assignment passes (``iterations − 1`` centroid updates); with
    ``return_centroids`` also the final fixed-point centroid table
    ``(cid int, cv array<bigint>)`` — the coarse quantizer the
    fixed-cells IVF tier probes against. The centroids are collected
    (k rows — bounded metadata) and re-emitted via ``local_df`` so
    the returned frame owns no lineage into the released vector
    checkpoint.

    The quantized vectors are localCheckpoint-ed for the loop — the
    iterations would otherwise re-derive them from the SOURCE twice
    per pass (4 corpus scans for the default 2 iterations; measured
    2.4 s → 1.5 s at sf0.1, and at 100 TB the scan count is the whole
    cost). The returned assignments are themselves checkpointed
    (16 B/row, freed by Spark's ContextCleaner when the caller drops
    the frame) so the loop's big vector blocks can be released
    eagerly before returning.
    """
    from flink_orc_sink_spark.session import release_local_checkpoint

    q = vectors.select(
        F.col(id_col).alias("vid"),
        F.transform(
            F.col(vec_col),
            lambda x: (
                F.floor(x.cast("double") * scale + F.lit(0.5)).cast("long")
                + shift
            ),
        ).alias("qv"),
    ).localCheckpoint(eager=True)
    centroids = (
        q.orderBy("vid")
        .limit(k)
        .select(
            F.col("vid").cast("int").alias("cid"),
            F.transform(F.col("qv"), lambda v: v * scale).alias("cv"),
        )
    )

    def dist(qv, cv):
        return F.aggregate(
            F.zip_with(
                qv, cv, lambda a, b: (a * scale - b) * (a * scale - b)
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    try:
        assign = None
        for it in range(iterations):
            assign = (
                q.crossJoin(F.broadcast(centroids))
                .groupBy("vid")
                .agg(
                    F.min(
                        F.struct(
                            dist(F.col("qv"), F.col("cv")).alias("d"),
                            F.col("cid").alias("cid"),
                        )
                    ).alias("best")
                )
                .select("vid", F.col("best.cid").alias("cluster"))
            )
            if it == iterations - 1:
                break
            members = q.join(assign, "vid")
            upd = (
                members.select(
                    "cluster", F.posexplode("qv").alias("i", "val")
                )
                .groupBy("cluster", "i")
                .agg(F.sum("val").alias("s"), F.count("*").alias("n"))
                .withColumn("cvi", F.expr(f"(s * {scale}) DIV n"))
                .groupBy("cluster")
                .agg(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("i", "cvi"))
                        ),
                        lambda x: x.getField("cvi"),
                    ).alias("cv_new")
                )
            )
            # empty clusters keep their previous centroid
            centroids = (
                centroids.join(
                    upd.withColumnRenamed("cluster", "cid"), "cid", "left"
                )
                .select(
                    "cid", F.coalesce("cv_new", "cv").alias("cv")
                )
                .localCheckpoint(eager=False)
            )
        out = assign.select(
            F.col("vid"), F.col("cluster")
        ).localCheckpoint(eager=True)
        if not return_centroids:
            return out
        cent_rows = [
            (int(r.cid), [int(x) for x in r.cv])
            for r in centroids.collect()
        ]
        cents = local_df(
            vectors.sparkSession, cent_rows, "cid int, cv array<bigint>"
        )
        return out, cents
    finally:
        release_local_checkpoint(q)


def train_quality_classifier(
    df: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
    dim: int = 64,
    iterations: int = 2,
    w_scale: int = 1_000_000,
    p_scale: int = 10_000,
    lr_inv: int = 10,
) -> DataFrame:
    """DISTRIBUTED TRAINING of a fastText-style quality classifier —
    the filter stage of every web-scale pretraining pipeline (train a
    linear model to recognize a reference corpus, score the crawl) —
    with BIT-EXACT integer arithmetic so the whole training loop is
    value-checkable across engines (same trick as
    :func:`kmeans_fixedpoint`: float GD can never hash stably).

    Model: logistic-style regression over hashed bag-of-words counts
    (portable md5 bucket hash, ``dim`` buckets + bias) with a HARD
    sigmoid ``p = clamp(1/2 + z/4, 0, 1)`` — piecewise-linear, so
    every step is integer multiply / add / clamp / floor-div (the
    explicit ``(a - pmod(a, b)) div b`` form: engines disagree on
    negative ``//``), and gradient sums are order-independent.
    Full-batch gradient descent, ``err = p − y`` in ``p_scale`` fixed
    point, weights in ``w_scale`` fixed point clamped to ±4 (the hard
    sigmoid saturates past that anyway), mean-gradient divided by n
    BEFORE the learning-rate scaling so magnitudes stay bounded at
    any corpus size.

    100 TB shape: features stay SPARSE ``(doc, j, x)`` — never a
    dense per-doc vector; per iteration one broadcast join of the
    ≤ dim+1 weight rows onto the feature stream, one groupBy(doc) for
    z, one groupBy(j) for the gradient (≤ dim+1 keys, map-side
    combine absorbs hot buckets), and a ``dim+1``-row collect to
    update weights on the driver (bounded metadata, like the k-means
    centroid bound). Vectors never shuffle wider than their sparse
    postings.

    Returns ``(doc, score_q, pred, label)``: final hard-sigmoid score
    in ``p_scale`` fixed point, thresholded prediction, and the
    training label (ints — exact under any value hash).
    """
    from flink_orc_sink_spark.functions.text import hash32, tokens
    from flink_orc_sink_spark.session import release_local_checkpoint

    q = p_scale
    w_cap = 4 * w_scale

    def fd(a, b):  # exact floor division via non-negative remainder
        return F.expr(f"({a} - pmod({a}, {b})) DIV {b}")

    base = df.select(
        F.col(id_col).alias("doc"),
        tokens(text_col).alias("tk"),
        F.col(label_col).cast("long").alias("y"),
    )
    def features(src: DataFrame) -> DataFrame:
        counts = (
            src.select("doc", F.explode("tk").alias("t"))
            .select(
                "doc", F.pmod(hash32(F.col("t")), F.lit(dim)).alias("j")
            )
            .groupBy("doc", "j")
            .agg(F.count("*").alias("x"))
        )
        return counts.unionByName(
            src.select(
                "doc",
                F.lit(dim).cast("long").alias("j"),
                F.lit(1).cast("long").alias("x"),
            )
        )

    def scores(feats: DataFrame, labels: DataFrame, weights: dict) -> DataFrame:
        w_df = local_df(
            df.sparkSession,
            [(int(j), int(v)) for j, v in weights.items()] or [(0, 0)],
            "j long, w long",
        )
        z = (
            feats.join(F.broadcast(w_df), "j", "left")
            .groupBy("doc")
            .agg(F.sum(F.col("x") * F.coalesce("w", F.lit(0))).alias("z"))
        )
        return z.join(labels, "doc").select(
            "doc",
            "y",
            F.greatest(
                F.lit(0),
                F.least(
                    F.lit(q),
                    F.lit(q // 2) + fd(f"(z * {q})", f"(4 * {w_scale})"),
                ),
            ).alias("p"),
        )

    def pyfd(a: int, b: int) -> int:  # mirror of fd for driver ints
        return (a - ((a % b) + b) % b) // b

    # training reads the feature stream 2x per iteration: checkpoint
    # once, release before the (source-recomputed) final scoring pass
    feats_ck = features(base).localCheckpoint(eager=True)
    labels_ck = base.select("doc", "y").localCheckpoint(eager=True)
    w = {}  # j -> weight (int, w_scale fixed point); absent = 0
    try:
        n = labels_ck.count()
        for _ in range(iterations):
            err = scores(feats_ck, labels_ck, w).select(
                "doc", (F.col("p") - F.col("y") * q).alias("err")
            )
            grad = (
                feats_ck.join(err, "doc")
                .groupBy("j")
                .agg(F.sum(F.col("x") * F.col("err")).alias("s"))
                .collect()
            )
            for r in grad:  # dim+1 rows: bounded driver metadata
                delta = pyfd(pyfd(r.s, n) * w_scale, lr_inv * q)
                nw = w.get(r.j, 0) - delta
                w[r.j] = max(-w_cap, min(w_cap, nw))
    finally:
        release_local_checkpoint(feats_ck)
        release_local_checkpoint(labels_ck)
    # final scoring recomputes from source: the returned plan owns no
    # checkpointed blocks (they are already released above)
    return scores(features(base), base.select("doc", "y"), w).select(
        "doc",
        F.col("p").cast("int").alias("score_q"),
        F.when(F.col("p") * 2 >= q, 1).otherwise(0).cast("int").alias("pred"),
        F.col("y").cast("int").alias("label"),
    )
