"""MaxSim late-interaction semantics against a NumPy oracle."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from fastembed_rs_spark.operators.colbert import colbert_top_k, maxsim

RNG = np.random.default_rng(11)


def _tm(n_tokens, dim=4):
    return RNG.normal(size=(n_tokens, dim)).round(3).tolist()


def test_maxsim_matches_numpy(spark):
    q = _tm(3)
    d = _tm(5)
    df = spark.createDataFrame([(q, d)], ["q", "d"])
    got = df.select(maxsim("q", "d").alias("s")).collect()[0]["s"]
    want = float(sum((np.array(q) @ np.array(d).T).max(axis=1)))
    assert got == pytest.approx(want, rel=1e-9)


def test_maxsim_empty_doc_is_zero(spark):
    df = spark.createDataFrame(
        [(_tm(3), [])], "q array<array<double>>, d array<array<double>>"
    )
    assert df.select(maxsim("q", "d").alias("s")).collect()[0]["s"] == 0.0


def test_colbert_topk_self_match_first(spark):
    corpus = spark.createDataFrame(
        [(i, _tm(4)) for i in range(10)], ["doc_id", "colbert"]
    )
    queries = corpus.filter(F.col("doc_id") < 2).select(
        F.col("doc_id").alias("query_id"), F.col("colbert").alias("query_tokens")
    )
    out = colbert_top_k(queries, corpus, k=3).collect()
    best = {r["query_id"]: r["doc_id"] for r in out if r["rank"] == 1}
    assert best == {0: 0, 1: 1}  # MaxSim(Q,Q) dominates (sum of self-max dots)
