"""Pinned golden checksums for the deterministic stub-model paths —
the engine analogue of the reference's golden-sum suite
(tests/text-embeddings.rs:34-111): four fixed documents, one expected
per-vector sum each. Unlike the artifact-gated real-ONNX goldens
(test_golden_parity.py), these always run, so ANY numeric drift in the
tokenize -> forward -> pool -> normalize pipeline (or the NumPy kernels
under it) fails CI, not just shape/invariance changes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

DOCS = [
    "Hello, World!",
    "The quick brown fox jumps over the lazy dog.",
    "fastembed is a library for generating vector embeddings.",
    "",
]

DENSE_GOLDEN = {
    "stub-dense-mean": [-0.073716, 0.697897, -0.268031, 0.083365],
    # cls/last are content-dependent (sequence context mix in the stub);
    # mean is invariant to the mix: mean(tok + 0.25·mean(tok)) is collinear
    # with mean(tok), and L2 normalization removes the scale
    "stub-dense-cls": [0.066547, 0.144439, 0.059203, 0.083365],
    "stub-dense-last": [-0.082374, 0.135927, -0.060097, 0.083365],
}
SPARSE_GOLDEN = {
    "stub-sparse": [3.826147, 5.323154, 7.244038, 1.784696],
    "stub-sparse-bgem3": [0.0, 0.886976, 1.190173, 0.0],
}
BGEM3_GOLDEN = {
    "dense": [-0.073716, 0.697897, -0.268031, 0.083365],
    "sparse": [1.253471, 3.936182, 6.090029, 0.0],
    "colbert": [-0.87301, 10.339435, -3.620479, 0.0],
}
RERANK_GOLDEN = [0.0, 0.25, 0.0, 0.0]

EPS = 1e-4  # stub path is deterministic f32; reference uses 1e-2 for real models


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(list(enumerate(DOCS)), ["doc_id", "text"])


@pytest.mark.parametrize("model", sorted(DENSE_GOLDEN))
def test_dense_golden_sums(spark, docs, model):
    from fastembed_rs_spark.operators.embed import embed_text

    rows = embed_text(docs, "text", model=model).orderBy("doc_id").collect()
    sums = [float(sum(r["embedding"])) for r in rows]
    assert sums == pytest.approx(DENSE_GOLDEN[model], abs=EPS)


@pytest.mark.parametrize("model", sorted(SPARSE_GOLDEN))
def test_sparse_golden_sums(spark, docs, model):
    from fastembed_rs_spark.operators.embed import embed_sparse

    rows = embed_sparse(docs, "text", model=model).orderBy("doc_id").collect()
    sums = [float(sum(r["sparse_embedding"]["values"])) for r in rows]
    assert sums == pytest.approx(SPARSE_GOLDEN[model], abs=EPS)


def test_bgem3_triple_golden_sums(spark, docs):
    from fastembed_rs_spark.operators.embed import embed_bgem3

    rows = embed_bgem3(docs, "text").orderBy("doc_id").collect()
    dense = [float(sum(r["bgem3"]["dense"])) for r in rows]
    sparse = [float(sum(r["bgem3"]["sparse"]["values"])) for r in rows]
    colbert = [float(sum(sum(t) for t in r["bgem3"]["colbert"])) for r in rows]
    assert dense == pytest.approx(BGEM3_GOLDEN["dense"], abs=EPS)
    assert sparse == pytest.approx(BGEM3_GOLDEN["sparse"], abs=EPS)
    assert colbert == pytest.approx(BGEM3_GOLDEN["colbert"], abs=EPS)


def test_rerank_golden_scores(spark, docs):
    from fastembed_rs_spark.operators.embed import rerank_score

    pairs = docs.select(
        F.lit("quick fox").alias("q"), F.col("text").alias("d"), "doc_id"
    )
    rows = rerank_score(pairs, "q", "d").orderBy("doc_id").collect()
    scores = [float(r["score"]) for r in rows]
    assert scores == pytest.approx(RERANK_GOLDEN, abs=EPS)


def test_cls_pooling_is_content_dependent(spark, docs):
    """The CLS hidden state mixes sequence context — distinct documents
    must embed differently under cls pooling (a constant-CLS stub once
    made this test family blind to operators that ignore their input)."""
    from fastembed_rs_spark.operators.embed import embed_text

    rows = embed_text(docs, "text", model="stub-dense-cls").orderBy("doc_id").collect()
    vecs = [tuple(r["embedding"]) for r in rows]
    assert len(set(vecs[:3])) == 3  # three non-empty docs, three embeddings
