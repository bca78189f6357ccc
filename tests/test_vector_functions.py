"""Similarity math parity with the reference (src/similarity.rs) and
bit-equality between the lambda-fold and fixed-dim formulations."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from fastembed_rs_spark.functions.vector import (
    cosine_similarity,
    cosine_similarity_fixed,
    dot,
    dot_fixed,
    l2_norm,
    l2_normalize,
)

VECS = [
    ([1.0, 2.0, 3.0], [4.0, 5.0, 6.0]),
    ([0.0, 0.0, 0.0], [1.0, 1.0, 1.0]),   # zero-vector guard → 0.0
    ([0.0, 0.0, 0.0], [0.0, 0.0, 0.0]),
    ([1.0, -1.0, 2.5], [-1.0, 1.0, 0.5]),
    ([1e-8, 2e-8, 0.0], [3e8, -1e8, 1.0]),
]


def _df(spark, pairs=VECS):
    return spark.createDataFrame([(a, b) for a, b in pairs], ["a", "b"])


def test_dot_matches_numpy(spark):
    got = [r[0] for r in _df(spark).select(dot("a", "b")).collect()]
    want = [float(np.dot(a, b)) for a, b in VECS]
    assert got == pytest.approx(want, rel=1e-12)


def test_dot_common_prefix(spark):
    # reference stops at the shorter slice (src/similarity.rs:14)
    df = spark.createDataFrame([([1.0, 2.0, 3.0], [10.0, 10.0])], ["a", "b"])
    assert df.select(dot("a", "b")).collect()[0][0] == 30.0


def test_cosine_zero_guard(spark):
    got = [r[0] for r in _df(spark).select(cosine_similarity("a", "b")).collect()]
    assert got[1] == 0.0 and got[2] == 0.0
    assert not any(math.isnan(x) for x in got)
    a, b = VECS[0]
    want = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert got[0] == pytest.approx(want, rel=1e-12)


def test_fixed_dim_bit_identical_to_fold(spark):
    df = _df(spark)
    fold = df.select(dot("a", "b"), cosine_similarity("a", "b"), l2_norm("a")).collect()
    fixed = df.select(
        dot_fixed("a", "b", 3), cosine_similarity_fixed("a", "b", 3),
    ).collect()
    for fr, xr in zip(fold, fixed):
        assert fr[0] == xr[0]  # exact, not approx: same fold order
        assert fr[1] == xr[1]


def test_fixed_dim_short_array_tail_is_zero(spark):
    df = spark.createDataFrame([([1.0, 2.0], [3.0, 4.0])], ["a", "b"])
    assert df.select(dot_fixed("a", "b", 5)).collect()[0][0] == 11.0


def test_l2_normalize_unit_norm(spark):
    df = spark.createDataFrame([([3.0, 4.0],)], ["v"])
    out = df.select(l2_normalize("v")).collect()[0][0]
    assert out == pytest.approx([0.6, 0.8], rel=1e-9)


def test_nan_score_ranks_first_like_total_cmp(spark):
    """SURVEY §2.4 semantics corner: the reference's top_k sorts with
    f32::total_cmp, which places NaN above +inf — a NaN score ranks FIRST
    in descending order (src/similarity.rs:37-39). Spark SQL happens to
    agree (NaN is greater than any double in its ordering), so the engine
    matches the reference here BY CONSTRUCTION, not by accident — this
    test pins that.

    A NaN cosine can only arise from non-finite inputs (the zero-norm
    guard returns 0.0, never NaN): we inject an inf component."""
    import math

    from pyspark.sql import functions as F

    from fastembed_rs_spark.operators.topk import cosine_top_k

    inf = float("inf")
    corpus = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),        # exact match, score 1.0
            (1, [inf, 0.0]),        # inf/inf -> NaN score
            (2, [0.0, 1.0]),        # orthogonal, score 0.0
        ],
        "vec_id long, embedding array<float>",
    )
    qs = spark.createDataFrame(
        [(9, [1.0, 0.0])], "query_id long, query_vec array<float>"
    )
    got = sorted(
        cosine_top_k(qs, corpus, k=3).collect(), key=lambda r: r["rank"]
    )
    assert got[0]["vec_id"] == 1 and math.isnan(got[0]["score"])
    assert got[1]["vec_id"] == 0 and got[1]["score"] == 1.0
    assert got[2]["vec_id"] == 2


def test_jl_kernel_bit_identical_to_expression(spark):
    """jl_project_fast (NumPy left fold) must equal jl_sign_project
    (Catalyst aggregate fold) bit-for-bit — same summation order."""
    from fastembed_rs_spark.functions.vector import jl_sign_project
    from fastembed_rs_spark.operators.fast_vector import jl_project_fast

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    expr = {
        r.vec_id: list(r.p)
        for r in emb.select(
            "vec_id", jl_sign_project("embedding", 64, 16).alias("p")
        ).collect()
    }
    kern = {
        r.vec_id: list(r.p)
        for r in jl_project_fast(emb, "vec_id", "embedding", 64, 16).collect()
    }
    assert kern == expr  # exact equality, not approx


def test_jl_kernel_matches_expression_on_malformed_rows(spark):
    """ADVICE r5: the NumPy kernel must tolerate the same malformed rows
    the expression path tolerates (F.get + coalesce(0.0)) — short vectors,
    null elements, null vectors, over-long vectors — with equal output."""
    from fastembed_rs_spark.functions.vector import jl_sign_project
    from fastembed_rs_spark.operators.fast_vector import jl_project_fast

    rows = [
        (0, [float(i) for i in range(8)]),          # exact length
        (1, [1.0, 2.0, 3.0]),                        # short -> zero-padded
        (2, [1.0, None, 3.0, None, 5.0]),            # null elements -> 0.0
        (3, None),                                   # null vector -> zeros
        (4, [float(i) for i in range(12)]),          # long -> truncated
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    expr = {
        r.vec_id: list(r.p)
        for r in df.select(
            "vec_id", jl_sign_project("embedding", 8, 4).alias("p")
        ).collect()
    }
    kern = {
        r.vec_id: list(r.p)
        for r in jl_project_fast(df, "vec_id", "embedding", 8, 4).collect()
    }
    assert kern == expr


def test_gram_kernel_partition_invariant_and_exact(spark):
    """gram_fixed_fast must be BIT-exact under any partitioning (the whole
    point of fixed-point-before-summation) and equal a direct per-element
    half-away-rounded recompute; the matrix must be symmetric."""
    import numpy as np

    from fastembed_rs_spark.operators.fast_vector import gram_fixed_fast

    rng = np.random.default_rng(7)
    dim = 6
    X = np.round(rng.normal(size=(403, dim)), 3)  # odd count -> ragged chunks
    X[17] = 0.0
    df = spark.createDataFrame(
        [(x.tolist(),) for x in X], "embedding array<double>"
    )

    def collect_gram(d):
        out = (
            gram_fixed_fast(d, "embedding", dim)
            .groupBy("i", "j").agg(F.sum("g_fixed").alias("g"))
            .collect()
        )
        m = np.zeros((dim, dim), dtype=np.int64)
        for r in out:
            m[r["i"], r["j"]] = r["g"]
        return m

    g1 = collect_gram(df.repartition(1))
    g13 = collect_gram(df.repartition(13))
    assert (g1 == g13).all()
    P = X[:, :, None] * X[:, None, :] * 1e8
    ref = np.copysign(np.floor(np.abs(P) + 0.5), P).astype(np.int64).sum(axis=0)
    assert (g1 == ref).all()
    assert (g1 == g1.T).all()


def test_gram_kernel_tolerates_malformed_rows(spark):
    """Null vectors, null elements, short and long rows must contribute
    zeros (pad/truncate) instead of aborting the aggregate — the same
    tolerance contract jl_project_fast has (ADVICE r5)."""
    import numpy as np

    from fastembed_rs_spark.operators.fast_vector import gram_fixed_fast

    dim = 4
    rows = [
        (0, [1.0, 2.0, 3.0, 4.0]),
        (1, [1.0, 2.0]),                   # short -> zero-padded
        (2, [1.0, None, 3.0, None]),       # null elements -> 0.0
        (3, None),                         # null vector -> zeros
        (4, [1.0, 1.0, 1.0, 1.0, 9.0]),    # long -> truncated
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = (
        gram_fixed_fast(df, "embedding", dim)
        .groupBy("i", "j").agg(F.sum("g_fixed").alias("g"))
        .collect()
    )
    got = np.zeros((dim, dim), dtype=np.int64)
    for r in out:
        got[r["i"], r["j"]] = r["g"]
    clean = np.array([
        [1.0, 2.0, 3.0, 4.0],
        [1.0, 2.0, 0.0, 0.0],
        [1.0, 0.0, 3.0, 0.0],
        [0.0, 0.0, 0.0, 0.0],
        [1.0, 1.0, 1.0, 1.0],
    ])
    P = clean[:, :, None] * clean[:, None, :] * 1e8
    ref = np.copysign(np.floor(np.abs(P) + 0.5), P).astype(np.int64).sum(axis=0)
    assert (got == ref).all()
