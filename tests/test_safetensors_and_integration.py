"""safetensors round-trip + bgem3 → MaxSim integration (the reference's
embedded-weights path and the late-interaction glue, end-to-end)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from fastembed_rs_spark.models.safetensors_io import (
    bgem3_sparse_linear,
    load_safetensors,
    save_safetensors,
)


def test_safetensors_roundtrip():
    rng = np.random.default_rng(1)
    tensors = {
        "a": rng.normal(size=(3, 4)).astype(np.float32),
        "b": np.arange(10, dtype=np.int64),
        "c": rng.normal(size=(2,)).astype(np.float64),
    }
    blob = save_safetensors(tensors)
    back = load_safetensors(blob)
    assert set(back) == set(tensors)
    for k in tensors:
        assert back[k].dtype == tensors[k].dtype
        assert np.array_equal(back[k], tensors[k])


def test_safetensors_error_paths():
    with pytest.raises(ValueError, match="shorter than"):
        load_safetensors(b"\x01")
    with pytest.raises(ValueError, match="header length exceeds"):
        load_safetensors(b"\xff\xff\xff\xff\xff\xff\xff\x7f" + b"{}")


def test_bgem3_sparse_linear_extraction_and_scoring():
    rng = np.random.default_rng(2)
    w = rng.normal(size=(1, 16)).astype(np.float32)
    b = np.asarray([0.1], dtype=np.float32)
    blob = save_safetensors({"sparse_linear.weight": w, "sparse_linear.bias": b})
    weight, bias = bgem3_sparse_linear(blob)
    assert weight.shape == (16,) and isinstance(float(bias), float)
    # token weight = relu(hidden · w + b)  (impl.rs:256-304)
    hidden = rng.normal(size=(5, 16)).astype(np.float32)
    scores = np.maximum(hidden @ weight + bias, 0.0)
    assert (scores >= 0).all()
    with pytest.raises(KeyError, match="missing tensor"):
        bgem3_sparse_linear(save_safetensors({"other": w}))


def test_bgem3_colbert_feeds_maxsim(spark):
    """Row 11 output → late-interaction retrieval: the colbert token
    matrices produced by embed_bgem3 are directly scoreable by
    colbert_top_k, and a doc queried with its own tokens ranks first."""
    from fastembed_rs_spark.operators.colbert import colbert_top_k
    from fastembed_rs_spark.operators.embed import embed_bgem3

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate([
            "alpha beta gamma delta",
            "completely different words here",
            "numbers one two three four five",
        ])],
        ["doc_id", "text"],
    )
    trip = embed_bgem3(docs, "text").select(
        "doc_id", F.col("bgem3.colbert").cast("array<array<double>>").alias("colbert")
    )
    queries = trip.filter(F.col("doc_id") < 2).select(
        F.col("doc_id").alias("query_id"), F.col("colbert").alias("query_tokens")
    )
    out = colbert_top_k(queries, trip, k=2).collect()
    best = {r["query_id"]: r["doc_id"] for r in out if r["rank"] == 1}
    assert best == {0: 0, 1: 1}
