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


# ---------------------------------------------------------------------------
# Fixed-dimension variants: flat getItem chains instead of lambda folds.
#
# Spark's higher-order functions (zip_with/aggregate/transform) are
# CodegenFallback — every element evaluation goes through the interpreted
# expression path, ~50× slower than whole-stage codegen. When the vector
# dimension is known (it always is for a given embedding model — `dim` in the
# registry), an unrolled a[0]*b[0] + a[1]*b[1] + ... chain compiles into the
# generated Java of the enclosing stage. Addition is left-associative, i.e.
# the same sequential fold order as the lambda version and the DuckDB
# oracle's list_sum, so results are bit-identical.
# ---------------------------------------------------------------------------

def _chain_sum(terms: list[Column]) -> Column:
    # starts from literal 0.0 so the addition sequence is bit-identical to
    # the lambda fold / DuckDB list_sum (matters for -0.0 products)
    s = F.lit(0.0)
    for term in terms:
        s = s + term
    return s


def dot_fixed(a: Column | str, b: Column | str, dim: int) -> Column:
    """Σ aᵢ·bᵢ over a known dimension, codegen-friendly. Arrays shorter than
    ``dim`` contribute 0.0 for the missing tail (common-prefix semantics of
    the reference, src/similarity.rs:14)."""
    ad, bd = _to_double(a), _to_double(b)
    # F.get (not getItem): ANSI mode throws on out-of-bounds indexing,
    # get() returns NULL which the coalesce folds to 0.0
    return _chain_sum([
        F.coalesce(F.get(ad, i) * F.get(bd, i), F.lit(0.0)) for i in range(dim)
    ])


def l2_norm_fixed(v: Column | str, dim: int) -> Column:
    """sqrt(Σ vᵢ²) over a known dimension, codegen-friendly."""
    vd = _to_double(v)
    return F.sqrt(_chain_sum([
        F.coalesce(F.get(vd, i) * F.get(vd, i), F.lit(0.0)) for i in range(dim)
    ]))


def cosine_similarity_fixed(a: Column | str, b: Column | str, dim: int) -> Column:
    """cosine_similarity with a known dimension — stays inside whole-stage
    codegen; use on hot paths (pair joins over millions of rows)."""
    na, nb = l2_norm_fixed(a, dim), l2_norm_fixed(b, dim)
    return F.when((na == 0.0) | (nb == 0.0), F.lit(0.0)).otherwise(
        dot_fixed(a, b, dim) / (na * nb)
    )


def jl_sign_project(v: Column | str, in_dim: int, out_dim: int) -> Column:
    """Johnson–Lindenstrauss-style ±1 sign projection to ``out_dim`` dims:
    ``out_j = Σ_i v_i · sign(i, j)`` with a DETERMINISTIC sign matrix
    ``sign(i,j) = +1 iff ((37·i + 101·j + 7)² mod 1009) is even``.

    The quadratic breaks the linear structure a plain ``(a·i + b·j) mod 2``
    parity would have (that collapses to a checkerboard, projecting every
    vector onto 2 directions); all intermediate integers stay < 2^53, so
    DuckDB evaluates the identical expression bit-for-bit (oracle parity).
    Production would draw Rademacher signs from a seeded RNG or a proper
    hash; the projection here is the ENGINE shape — an embarrassingly
    parallel per-row map (no shuffle), the standard pre-reduction in front
    of brute-force / ANN search when the raw dimension is the scan cost.

    Returns ``array<double>`` of length ``out_dim``."""
    vd = _to_double(v)

    def sign(i: Column, j: Column) -> Column:
        h = 37 * i + 101 * j + F.lit(7)
        return F.when((h * h) % 1009 % 2 == 0, F.lit(1.0)).otherwise(F.lit(-1.0))

    return F.transform(
        F.sequence(F.lit(0), F.lit(out_dim - 1)),
        lambda j: F.aggregate(
            F.sequence(F.lit(0), F.lit(in_dim - 1)),
            F.lit(0.0),
            lambda acc, i: acc + F.coalesce(F.get(vd, i), F.lit(0.0)) * sign(i, j),
        ),
    )
