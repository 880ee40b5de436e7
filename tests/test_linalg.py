"""Distributed moments/PCA agree exactly with single-node NumPy."""

from __future__ import annotations

import numpy as np
import pytest

from flink_orc_sink_spark.operators.linalg import (
    moments,
    pca,
    pca_project,
)
from flink_orc_sink_spark.sources.catalog import table

DIM = 64


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return table(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def emb_np(emb):
    rows = emb.select("vec_id", "embedding").orderBy("vec_id").collect()
    return np.asarray([r["embedding"] for r in rows], dtype=np.float64)


def test_moments_match_numpy(emb, emb_np):
    n, mean, cov = moments(emb.repartition(7), "embedding", DIM)
    assert n == len(emb_np)
    np.testing.assert_allclose(mean, emb_np.mean(axis=0), rtol=0, atol=1e-9)
    np.testing.assert_allclose(
        cov, np.cov(emb_np, rowvar=False, ddof=1), rtol=0, atol=1e-8
    )


def test_pca_matches_numpy_and_is_orthonormal(emb, emb_np):
    model = pca(emb, "embedding", DIM, k=4)
    # orthonormal components
    np.testing.assert_allclose(
        model.components @ model.components.T, np.eye(4), atol=1e-9
    )
    # variance sorted descending
    assert all(np.diff(model.explained_variance) <= 1e-12)
    # same answer as a single-node eigensolve with the same sign fix
    cov = np.cov(emb_np, rowvar=False, ddof=1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:4]
    comps = evecs[:, order].T
    flip = np.sign(comps[np.arange(4), np.abs(comps).argmax(axis=1)])
    comps *= flip[:, None]
    np.testing.assert_allclose(model.components, comps, atol=1e-7)
    np.testing.assert_allclose(
        model.explained_variance, evals[order], rtol=1e-9
    )


def test_projection_reproducible_across_partitionings(emb):
    model = pca(emb, "embedding", DIM, k=2)
    a = {
        r["vec_id"]: tuple(r["proj"])
        for r in pca_project(emb.repartition(3), "vec_id", "embedding", model).collect()
    }
    b = {
        r["vec_id"]: tuple(r["proj"])
        for r in pca_project(emb.repartition(11), "vec_id", "embedding", model).collect()
    }
    assert a == b
    assert len(a) == emb.count()


def test_projection_variance_is_eigenvalue(emb, emb_np):
    """Projected coordinate 0 has sample variance = top eigenvalue."""
    model = pca(emb, "embedding", DIM, k=1)
    p = pca_project(emb, "vec_id", "embedding", model, round_dp=9)
    pc1 = np.asarray(
        [r["proj"][0] for r in p.collect()], dtype=np.float64
    )
    assert pc1.var(ddof=1) == pytest.approx(
        float(model.explained_variance[0]), rel=1e-6
    )


def test_kmeans_fixedpoint_matches_numpy(spark):
    """The distributed fixed-point Lloyd iteration must reproduce a
    NumPy reference bit-for-bit (quantize → shift → integer
    distances → floor-division centroid updates → lowest-id ties)."""
    import numpy as np

    from flink_orc_sink_spark.operators.linalg import kmeans_fixedpoint

    rng = np.random.RandomState(3)
    X = np.vstack(
        [rng.normal(c, 0.3, size=(40, 8)) for c in (-2.0, 0.0, 2.0)]
    )
    # seed rows (ids 0..2) must come from distinct planted clusters —
    # the operator seeds centroids from the first k ids
    perm = np.concatenate([[0, 40, 80], np.delete(np.arange(120), [0, 40, 80])])
    X = X[perm]
    planted = np.repeat([0, 1, 2], 40)[perm]
    ids = np.arange(len(X))
    df = spark.createDataFrame(
        [(int(i), [float(v) for v in row]) for i, row in zip(ids, X)],
        "vec_id long, embedding array<double>",
    )
    got = {
        r.vid: r.cluster
        for r in kmeans_fixedpoint(
            df, "vec_id", "embedding", k=3, iterations=3
        ).collect()
    }

    qv = np.floor(X * 1000 + 0.5).astype(np.int64) + 10_000
    C = qv[:3] * 1000
    assign = None
    for it in range(3):
        d = ((qv[:, None, :] * 1000 - C[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        if it == 2:
            break
        for j in range(3):
            m = assign == j
            if m.sum():
                C[j] = (qv[m].sum(axis=0) * 1000) // m.sum()
    want = dict(zip(ids.tolist(), assign.tolist()))
    assert got == want
    # the planted structure is actually recovered: three pure clusters
    for p in (0, 1, 2):
        members = [int(i) for i in ids[planted == p]]
        assert len({got[i] for i in members}) == 1


def test_train_quality_classifier_learns_separable_classes(spark):
    """Two fixed-point gradient steps fully separate two disjoint
    vocabularies (the reference-vs-crawl shape): 100% accuracy,
    scores saturating to the hard-sigmoid rails. Exactness vs the
    unrolled-SQL oracle is the docs_classifier_train gate; this pins
    that the integer arithmetic actually LEARNS."""
    import random

    from flink_orc_sink_spark.operators.linalg import (
        train_quality_classifier,
    )

    random.seed(7)
    rows = []
    for i in range(300):
        good = i % 2 == 0
        vocab = (
            [f"ga{k}" for k in range(30)]
            if good
            else [f"bb{k}" for k in range(30)]
        ) + ["shared1", "shared2"]
        rows.append(
            (i, " ".join(random.choice(vocab) for _ in range(40)),
             1 if good else 0)
        )
    df = spark.createDataFrame(rows, "doc_id long, text string, y int")
    out = train_quality_classifier(
        df, "doc_id", "text", "y", iterations=2
    ).collect()
    assert len(out) == 300
    assert all(r.pred == r.label for r in out)
    # not just threshold-lucky: a wide score margin between classes
    lo_good = min(r.score_q for r in out if r.label == 1)
    hi_bad = max(r.score_q for r in out if r.label == 0)
    assert lo_good - hi_bad > 2_000, (lo_good, hi_bad)


def test_train_quality_classifier_empty_and_tiny_docs(spark):
    """Empty and sub-feature docs still get scored (bias-only rows);
    the classifier falls back to the bias prior for them."""
    from flink_orc_sink_spark.operators.linalg import (
        train_quality_classifier,
    )

    df = spark.createDataFrame(
        [(1, "alpha beta gamma", 1), (2, "", 0), (3, "alpha", 1),
         (4, "delta epsilon zeta", 0)],
        "doc_id long, text string, y int",
    )
    out = train_quality_classifier(
        df, "doc_id", "text", "y", iterations=2
    ).collect()
    assert {r.doc for r in out} == {1, 2, 3, 4}


def test_int_moments_exact_and_partition_invariant(emb, emb_np):
    from flink_orc_sink_spark.operators.linalg import int_moments

    q = np.floor(emb_np * 1000 + 0.5).astype(np.int64)
    n, s, g = int_moments(emb.repartition(7), "embedding", DIM)
    assert n == len(q)
    assert s == [int(x) for x in q.sum(axis=0)]
    assert g == [[int(x) for x in row] for row in (q.T @ q)]
    n2, s2, g2 = int_moments(emb.coalesce(1), "embedding", DIM)
    assert (n2, s2, g2) == (n, s, g)  # bit-identical at any layout


def test_pca_fixedpoint_is_pca(spark):
    """The fixed-point power iteration recovers the true principal
    axes on data with a well-separated spectrum: each integer
    component must be near-collinear with the matching NumPy float
    eigenvector, and the projections must correlate ~1 with the
    float PCA projections."""
    from flink_orc_sink_spark.operators.linalg import (
        pca_project_fixedpoint,
        power_pca_components,
    )

    rng = np.random.default_rng(7)
    # anisotropic Gaussian with a well-separated spectrum (2x sigma
    # gaps; a degenerate pair would make eigvec identity ambiguous)
    basis = np.linalg.qr(rng.standard_normal((DIM, DIM)))[0]
    scales = np.ones(DIM) * 0.02
    scales[:4] = [0.4, 0.2, 0.1, 0.05]
    x = (rng.standard_normal((800, DIM)) * scales) @ basis.T
    q = np.floor(x * 1000 + 0.5).astype(np.int64)

    n = len(q)
    s = [int(v) for v in q.sum(axis=0)]
    g = [[int(v) for v in row] for row in (q.T @ q)]
    mu, comps = power_pca_components(n, s, g, DIM, k=4)

    centered = q - np.asarray(q, dtype=np.float64).mean(axis=0)
    _, evecs = np.linalg.eigh(np.cov(centered, rowvar=False))
    for c in range(4):
        v = np.asarray(comps[c], dtype=np.float64)
        v /= np.linalg.norm(v)
        truth = evecs[:, DIM - 1 - c]
        assert abs(float(v @ truth)) > 0.99, c

    df = spark.createDataFrame(
        [(i, [float(v) for v in x[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    out = pca_project_fixedpoint(df, "vec_id", "embedding", DIM, k=4)
    got = {r.vec_id: (r.pc1, r.pc2, r.pc3, r.pc4) for r in out.collect()}
    proj_float = centered @ evecs[:, DIM - 1 : DIM - 5 : -1]
    for c in range(4):
        ours = np.asarray([got[i][c] for i in range(n)], dtype=np.float64)
        rho = abs(np.corrcoef(ours, proj_float[:, c])[0, 1])
        assert rho > 0.999, (c, rho)


def test_pca_fixedpoint_partition_invariant(emb):
    from flink_orc_sink_spark.operators.linalg import (
        pca_project_fixedpoint,
    )

    a = {
        r.vec_id: (r.pc1, r.pc2, r.pc3, r.pc4)
        for r in pca_project_fixedpoint(
            emb.repartition(13), "vec_id", "embedding", DIM
        ).collect()
    }
    b = {
        r.vec_id: (r.pc1, r.pc2, r.pc3, r.pc4)
        for r in pca_project_fixedpoint(
            emb.coalesce(1), "vec_id", "embedding", DIM
        ).collect()
    }
    assert a == b and len(a) == emb.count()


def test_power_pca_rank_deficient_raises_valueerror():
    """Rank-deficient input (duplicate rows => rank 1) must fail with
    a diagnosable ValueError when k exceeds the effective rank, not a
    ZeroDivisionError from deep inside the fixed-point div — and must
    SUCCEED at k=1 (no deflation runs after the final component,
    matching the SQL oracle's unroll)."""
    from flink_orc_sink_spark.operators.linalg import (
        power_pca_components,
    )

    dim = 8
    # NOT symmetric around 0: the iteration starts from all-ones, so
    # the direction must have a nonzero component along it
    u = np.floor(np.linspace(0.1, 1, dim) * 1000 + 0.5).astype(np.int64)
    # 5 points on one line => centered scatter has rank exactly 1
    q = np.outer(np.array([1, 2, 3, 5, 8], dtype=np.int64), u)
    n = len(q)
    s = [int(v) for v in q.sum(axis=0)]
    g = [[int(v) for v in row] for row in (q.T @ q)]
    # k=1: the single component is fine — deflation never runs
    mu, comps = power_pca_components(n, s, g, dim, k=1)
    assert len(comps) == 1 and any(comps[0])
    # k=2: the collapsed component is LAST, so deflation is skipped
    # (oracle-matching) and the zero vector is returned, not a crash
    _, comps2 = power_pca_components(n, s, g, dim, k=2)
    assert comps2[0] == comps[0] and not any(comps2[1])
    # k=3: the zero component sits mid-sequence — its deflation would
    # divide by zero; the failure must be a diagnosable ValueError
    with pytest.raises(ValueError, match="rank-deficient"):
        power_pca_components(n, s, g, dim, k=3)


def test_int_moments_overflow_guard_raises(spark):
    """A partition whose accumulated n*max|q|^2 would overflow int64
    must raise loudly instead of silently wrapping the int64 partial
    (the documented exactness bound, now enforced)."""
    from flink_orc_sink_spark.operators.linalg import int_moments

    big = 4.0e9  # q = 4e12 at scale=1000; one row already breaks 2^63
    df = spark.createDataFrame(
        [(0, [big, big]), (1, [big, big])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(Exception, match="overflow int64"):
        int_moments(df.coalesce(1), "embedding", 2)

    # the sneakier case: x*scale itself exceeds int64, where the
    # float->int64 CAST would wrap to INT64_MIN before the n*max|q|^2
    # check could see it — must be caught on the FLOAT side
    huge = 1.0e16  # q_float = 1e19 > 2^63-1
    df2 = spark.createDataFrame(
        [(0, [huge, 1.0]), (1, [1.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(Exception, match="int64-exact range"):
        int_moments(df2.coalesce(1), "embedding", 2)
