"""Vector (embedding) column expressions.

Dot products, norms, and cosine similarity over ``array<float>``
columns as pure Catalyst higher-order functions (``zip_with`` +
``aggregate``) — JVM-side, no Python in the hot path. For very wide
vectors or batched model scoring, a Pandas-UDF variant is provided;
at 64–1024 dims the expression form is competitive and avoids Arrow
transfer entirely.

The reference has no vector operators (SURVEY.md §2.4 — NOT PRESENT);
this is north-star similarity-search surface.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dot(a: Column | str, b: Column | str) -> Column:
    """Sum of elementwise products, accumulated in double in array
    order (so an external engine computing left-to-right agrees
    bit-for-bit before rounding)."""
    prods = F.zip_with(_col(a), _col(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column | str) -> Column:
    """Euclidean (L2) norm."""
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm."""
    denom = norm(a) * norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def cosine_with_norms(
    a: Column | str, b: Column | str, norm_a: Column, norm_b: Column
) -> Column:
    """Cosine similarity with PRECOMPUTED per-side norms — bit-identical
    to :func:`cosine` (same multiply/divide ordering), but the two
    self-dot-products are evaluated once per ROW before the join
    instead of once per PAIR inside it. On an n×m scoring join that
    removes 2·n·m of the 3·n·m interpreted higher-order aggregations —
    the dominant cost of the exact scoring tier."""
    denom = norm_a * norm_b
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


@F.pandas_udf(T.DoubleType())
def cosine_pandas(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-batched cosine for wide vectors / the Python fallback path.

    Same semantics as :func:`cosine`; used when dims are large enough
    that per-element Catalyst expressions lose to NumPy batch math.
    """
    import numpy as np

    av = np.array(a.tolist(), dtype="float64")
    bv = np.array(b.tolist(), dtype="float64")
    num = (av * bv).sum(axis=1)
    den = np.sqrt((av * av).sum(axis=1)) * np.sqrt((bv * bv).sum(axis=1))
    out = np.where(den > 0, num / np.where(den == 0, 1.0, den), 0.0)
    return pd.Series(out)
