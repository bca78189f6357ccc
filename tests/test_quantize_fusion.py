"""Quantized-search + rank-fusion operators: exactness pinned against NumPy
replications of the same algorithms, fusion against a hand-computed example."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

DIM = 64
N = 200


@pytest.fixture(scope="module")
def vec_df(spark):
    rng = np.random.default_rng(42)
    vecs = rng.normal(size=(N, DIM)).astype(np.float32)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(N)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df, vecs


def _np_pack(vecs: np.ndarray) -> np.ndarray:
    """NumPy replication of pack_sign_bits: two 32-bit words per vector."""
    bits = (vecs >= 0).astype(np.int64)
    words = np.zeros((vecs.shape[0], 2), dtype=np.int64)
    for d in range(DIM):
        words[:, d // 32] += bits[:, d] << (d % 32)
    return words


def test_pack_sign_bits_matches_numpy(spark, vec_df):
    from fastembed_rs_spark.operators.quantize import binary_quantize

    df, vecs = vec_df
    got = {
        r["vec_id"]: (r["bq0"], r["bq1"])
        for r in binary_quantize(df, "embedding", DIM).collect()
    }
    want = _np_pack(vecs)
    for i in range(N):
        assert got[i] == (int(want[i, 0]), int(want[i, 1]))


def test_hamming_topk_matches_numpy(spark, vec_df):
    from fastembed_rs_spark.operators.quantize import binary_hamming_top_k

    df, vecs = vec_df
    qs = df.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = binary_hamming_top_k(qs, df, k=5, dim=DIM).collect()

    bits = (vecs >= 0)
    for q in range(3):
        sims = (bits[q] == bits).sum(axis=1)  # sign-agreement count
        order = sorted(range(N), key=lambda i: (-sims[i], i))[:5]
        mine = [(r["vec_id"], r["hamming_sim"]) for r in got if r["query_id"] == q]
        mine.sort(key=lambda t: (-t[1], t[0]))
        assert [v for v, _ in mine] == order
        assert all(s == int(sims[v]) for v, s in mine)


def test_binary_rescore_matches_numpy_pipeline(spark, vec_df):
    """The oversample+rescore path must equal the same two-stage algorithm
    run in NumPy (not merely 'decent recall' — the operator is deterministic)."""
    from fastembed_rs_spark.operators.quantize import binary_hamming_top_k

    df, vecs = vec_df
    qs = df.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = binary_hamming_top_k(qs, df, k=5, dim=DIM, rescore_factor=4).collect()

    bits = (vecs >= 0)
    v64 = vecs.astype(np.float64)
    norms = np.linalg.norm(v64, axis=1)
    for q in range(3):
        sims = (bits[q] == bits).sum(axis=1)
        cand = sorted(range(N), key=lambda i: (-sims[i], i))[:20]
        cos = {
            i: round(float(v64[q] @ v64[i] / (norms[q] * norms[i])), 6)
            for i in cand
        }
        order = sorted(cand, key=lambda i: (-cos[i], i))[:5]
        mine = sorted(
            [r for r in got if r["query_id"] == q], key=lambda r: r["rank"]
        )
        assert [r["vec_id"] for r in mine] == order
        for r in mine:
            assert r["score"] == pytest.approx(cos[r["vec_id"]], abs=1e-9)


def test_int8_quant_topk_matches_numpy(spark, vec_df):
    from fastembed_rs_spark.operators.quantize import int8_quant_top_k

    df, vecs = vec_df
    qs = df.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = int8_quant_top_k(qs, df, k=5).collect()

    v64 = vecs.astype(np.float64)
    norms = np.linalg.norm(v64, axis=1)
    norms = np.where(norms == 0, 1.0, norms)
    codes = np.floor(v64 / norms[:, None] * 127.0).astype(np.int64)
    for q in range(3):
        dots = codes @ codes[q]
        order = sorted(range(N), key=lambda i: (-dots[i], i))[:5]
        mine = sorted([r for r in got if r["query_id"] == q], key=lambda r: r["rank"])
        assert [r["vec_id"] for r in mine] == order
        assert [r["qdot"] for r in mine] == [int(dots[i]) for i in order]


def test_mrl_truncate_prefix(spark, vec_df):
    from fastembed_rs_spark.operators.quantize import mrl_truncate

    df, vecs = vec_df
    row = (
        df.filter(F.col("vec_id") == 7)
        .select(mrl_truncate("embedding", 16).alias("p"))
        .first()
    )
    assert row["p"] == pytest.approx(list(vecs[7][:16]), abs=0)


def test_rrf_fuse_hand_computed(spark):
    from fastembed_rs_spark.operators.fusion import rrf_fuse

    a = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (0, 12, 3)], "query_id long, doc_id long, rank long"
    )
    b = spark.createDataFrame(
        [(0, 11, 1), (0, 13, 2), (0, 10, 3)], "query_id long, doc_id long, rank long"
    )
    got = {r["doc_id"]: r for r in rrf_fuse([a, b]).collect()}
    # doc 11: 1/62 + 1/61 ; doc 10: 1/61 + 1/63 ; doc 12: 1/63 ; doc 13: 1/62
    exp = {
        11: round(1 / 62 + 1 / 61, 6),
        10: round(1 / 61 + 1 / 63, 6),
        12: round(1 / 63, 6),
        13: round(1 / 62, 6),
    }
    for d, s in exp.items():
        assert got[d]["rrf_score"] == pytest.approx(s, abs=1e-9)
    assert got[11]["rank"] == 1 and got[10]["rank"] == 2
    assert got[11]["n_lists"] == 2 and got[12]["n_lists"] == 1
    # ties in rrf_score (12 vs 13 differ) — 13 (1/62) beats 12 (1/63)
    assert got[13]["rank"] == 3 and got[12]["rank"] == 4


def test_rrf_three_lists_order_independent(spark):
    """3+ lists: the sorted-array fold must make the double sum independent
    of list order (shuffle-delivery order at scale)."""
    from fastembed_rs_spark.operators.fusion import rrf_fuse

    lists = [
        spark.createDataFrame(
            [(0, 1, r)], "query_id long, doc_id long, rank long"
        )
        for r in (1, 5, 9)
    ]
    s1 = rrf_fuse(lists).collect()[0]["rrf_score"]
    s2 = rrf_fuse(list(reversed(lists))).collect()[0]["rrf_score"]
    assert s1 == s2 == round(1 / 61 + 1 / 65 + 1 / 69, 6)
