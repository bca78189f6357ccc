"""Dense-vector column expressions.

Spark-native translations of the reference's ``src/similarity.rs``:

* ``dot(a, b)``              — src/similarity.rs:13-16
* ``cosine_similarity(a,b)`` — src/similarity.rs:18-26 (zero-norm guard → 0.0)
* ``normalize`` (L2 + eps)   — src/common.rs:159-165

All are built from higher-order array functions (``zip_with`` /
``aggregate`` / ``transform``), so they stay JVM-side inside whole-stage
codegen — no Python worker in the hot path. Math is carried out in DOUBLE
regardless of the input element type so results are reproducible against a
DOUBLE-math SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: epsilon used by the reference's normalize() (src/common.rs:163)
NORM_EPS = 1e-12


def _to_double(v: Column | str) -> Column:
    c = F.col(v) if isinstance(v, str) else v
    return c.cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ over the common prefix (reference stops at the shorter slice,
    src/similarity.rs:14 — ``zip_with`` pads with NULL instead, so we coalesce
    missing products to 0.0 to match)."""
    prods = F.zip_with(_to_double(a), _to_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + F.coalesce(x, F.lit(0.0)))


def l2_norm(v: Column | str) -> Column:
    """sqrt(Σ vᵢ²)."""
    vd = _to_double(v)
    return F.sqrt(F.aggregate(vd, F.lit(0.0), lambda acc, x: acc + x * x))


def l2_normalize(v: Column | str) -> Column:
    """v / (‖v‖ + 1e-12), elementwise — reference normalize(), src/common.rs:159-165.

    Returns array<double>; cast to array<float> at the edge if the caller
    wants the reference's f32 representation.
    """
    vd = _to_double(v)
    denom = l2_norm(vd) + F.lit(NORM_EPS)
    return F.transform(vd, lambda x: x / denom)


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """dot/(‖a‖·‖b‖) with the reference's explicit zero-vector guard: if either
    norm is 0 the score is 0.0, never NaN (src/similarity.rs:22-25)."""
    na, nb = l2_norm(a), l2_norm(b)
    return F.when((na == 0.0) | (nb == 0.0), F.lit(0.0)).otherwise(dot(a, b) / (na * nb))
