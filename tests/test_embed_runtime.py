"""Model-runtime pipeline tests against the deterministic stub sessions —
the engine analogue of the reference's golden/invariance suite
(tests/text-embeddings.rs:494-523 batch invariance, :604-622 determinism,
:180-210 sparse invariants)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from fastembed_rs_spark.operators.embed import (
    DynamicQuantizationError,
    build_feeds,
    embed_bgem3,
    embed_image,
    embed_sparse,
    embed_text,
    max_by_token_id,
    rerank_score,
    session_input_names,
)

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "pack my box with five dozen liquor jugs",
    "a tiny doc",
    "",
    "the quick brown fox jumps over the lazy dog",  # exact dup of row 0
    "numbers 123 and symbols !!!",
    "short",
    "yet another document about foxes and dogs",
    "completely unrelated text regarding spacecraft telemetry",
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], ["doc_id", "text"]
    )


def _emb_map(df, col="embedding"):
    return {r["doc_id"]: list(r[col]) for r in df.collect()}


def test_dense_norm_and_dim(spark, docs):
    out = embed_text(docs, "text", model="stub-dense-mean")
    rows = out.collect()
    assert len(rows) == len(TEXTS)
    for r in rows:
        assert len(r["embedding"]) == 32
        norm = math.sqrt(sum(x * x for x in r["embedding"]))
        assert norm == pytest.approx(1.0, abs=1e-3)


def test_dense_batch_invariance(spark, docs):
    # reference: embed(batch=None) == embed(batch=3) (text-embeddings.rs:494-523)
    a = _emb_map(embed_text(docs, "text", batch_size=256))
    b = _emb_map(embed_text(docs, "text", batch_size=3))
    assert a == b


def test_dense_partition_invariance(spark, docs):
    a = _emb_map(embed_text(docs.repartition(1), "text"))
    b = _emb_map(embed_text(docs.repartition(7), "text"))
    assert a == b


def test_dense_determinism(spark, docs):
    a = _emb_map(embed_text(docs, "text"))
    b = _emb_map(embed_text(docs, "text"))
    assert a == b


def test_identical_texts_identical_embeddings(spark, docs):
    m = _emb_map(embed_text(docs, "text"))
    assert m[0] == m[4]


def test_pooling_strategies_differ(spark, docs):
    mean = _emb_map(embed_text(docs, "text", model="stub-dense-mean"))
    cls = _emb_map(embed_text(docs, "text", model="stub-dense-cls"))
    last = _emb_map(embed_text(docs, "text", model="stub-dense-last"))
    assert mean[0] != cls[0] and mean[0] != last[0] and cls[0] != last[0]


def test_dynamic_quant_guard(spark, docs):
    with pytest.raises(DynamicQuantizationError):
        embed_text(docs.repartition(4), "text", model="stub-dense-dynamic")
    out = embed_text(
        docs.repartition(4).coalesce(1), "text",
        model="stub-dense-dynamic", batch_size=10_000,
    )
    assert out.count() == len(TEXTS)


def test_sparse_invariants(spark, docs):
    # all values > 0, indices ascending, len(indices) == len(values)
    # (reference sparse invariants, tests/text-embeddings.rs:180-210)
    rows = embed_sparse(docs, "text", model="stub-sparse").collect()
    assert len(rows) == len(TEXTS)
    nonempty = 0
    for r in rows:
        se = r["sparse_embedding"]
        assert len(se["indices"]) == len(se["values"])
        assert all(v > 0.0 for v in se["values"])
        assert list(se["indices"]) == sorted(se["indices"])
        nonempty += bool(se["indices"])
    assert nonempty > 0


def test_sparse_partition_invariance(spark, docs):
    def m(df):
        return {
            r["doc_id"]: (list(r["sparse_embedding"]["indices"]),
                          list(r["sparse_embedding"]["values"]))
            for r in df.collect()
        }
    assert m(embed_sparse(docs.repartition(1), "text")) == m(
        embed_sparse(docs.repartition(5), "text")
    )


def test_bgem3_triple_shapes(spark, docs):
    rows = embed_bgem3(docs, "text", model="stub-bgem3").collect()
    for r in rows:
        trip = r["bgem3"]
        assert len(trip["dense"]) == 32
        assert len(trip["sparse"]["indices"]) == len(trip["sparse"]["values"])
        # colbert keeps exactly the non-pad tokens minus CLS
        n_tokens = len([t for t in TEXTS[r["doc_id"]].lower().split() if t])
        assert len(trip["colbert"]) <= max(n_tokens + 2, 1)
        for tok_vec in trip["colbert"]:
            assert len(tok_vec) == 32


def test_image_embed_shapes(spark):
    df = spark.createDataFrame(
        [(0, bytearray(b"fake-png-bytes-0")), (1, bytearray(b"other-bytes-1"))],
        ["doc_id", "content"],
    )
    rows = embed_image(df, "content", model="stub-image").collect()
    assert len(rows) == 2
    for r in rows:
        assert len(r["embedding"]) == 32
        norm = math.sqrt(sum(x * x for x in r["embedding"]))
        assert norm == pytest.approx(1.0, abs=1e-3)
    # determinism across runs
    again = embed_image(df, "content", model="stub-image").collect()
    assert [list(r["embedding"]) for r in rows] == [list(r["embedding"]) for r in again]


def test_rerank_self_match_ranks_first(spark, docs):
    # reference: query ≈ doc[0] must rank first (text-embeddings.rs:389-395)
    query = TEXTS[0]
    pairs = docs.select(
        F.col("doc_id"), F.col("text").alias("document"), F.lit(query).alias("query")
    )
    scored = rerank_score(pairs, "query", "document", model="stub-rerank")
    best = scored.orderBy(F.desc("score"), F.asc("doc_id")).first()
    assert best["doc_id"] == 0
    assert best["score"] == pytest.approx(1.0, abs=1e-6)


class _NamedInput:
    def __init__(self, name):
        self.name = name


class _ProbeSession:
    """ORT-like session that declares its inputs and enforces the exact feed
    set at run() — mirrors onnxruntime, which raises on missing *or* unknown
    input names (reference probe: src/text_embedding/impl.rs:131-134)."""

    def __init__(self, names):
        self.names = list(names)

    def get_inputs(self):
        return [_NamedInput(n) for n in self.names]

    def run(self, _out, feeds):
        assert set(feeds) == set(self.names), (set(feeds), set(self.names))
        return {"last_hidden_state": np.zeros((feeds["input_ids"].shape[0], 2, 4))}


def test_build_feeds_adds_token_type_ids_when_declared():
    ids = np.array([[1, 5, 0]], dtype=np.int64)
    mask = np.array([[1, 1, 0]], dtype=np.int64)
    sess = _ProbeSession(["input_ids", "attention_mask", "token_type_ids"])
    feeds = build_feeds(sess, ids, mask)
    assert set(feeds) == {"input_ids", "attention_mask", "token_type_ids"}
    assert feeds["token_type_ids"].shape == ids.shape
    assert feeds["token_type_ids"].dtype == ids.dtype
    assert not feeds["token_type_ids"].any()
    sess.run(None, feeds)  # would raise on a feed-set mismatch


def test_build_feeds_drops_undeclared_token_type_ids():
    ids = np.array([[1, 5]], dtype=np.int64)
    mask = np.ones_like(ids)
    tt = np.array([[0, 1]], dtype=np.int64)
    sess = _ProbeSession(["input_ids", "attention_mask"])
    feeds = build_feeds(sess, ids, mask, tt)
    assert set(feeds) == {"input_ids", "attention_mask"}
    sess.run(None, feeds)


def test_build_feeds_passthrough_without_probe():
    # stub sessions expose no get_inputs → feeds pass through untouched
    ids = np.array([[1]], dtype=np.int64)
    mask = np.ones_like(ids)

    class NoProbe:
        pass

    assert session_input_names(NoProbe()) is None
    feeds = build_feeds(NoProbe(), ids, mask)
    assert set(feeds) == {"input_ids", "attention_mask"}
    tt = np.zeros_like(ids)
    assert set(build_feeds(NoProbe(), ids, mask, tt)) == {
        "input_ids", "attention_mask", "token_type_ids"
    }


def test_max_by_token_id_matches_naive():
    rng = np.random.default_rng(7)
    special = np.array([0, 1, 2, 3], dtype=np.int64)
    for _ in range(20):
        tids = rng.integers(0, 40, size=64).astype(np.int64)
        w = rng.normal(size=64).astype(np.float32)
        idx, vals = max_by_token_id(tids, w, special)
        agg: dict[int, float] = {}
        for tid, wt in zip(tids.tolist(), w.astype(np.float64).tolist()):
            if tid in (0, 1, 2, 3):
                continue
            if wt > agg.get(tid, 0.0):
                agg[tid] = wt
        want = sorted((k, v) for k, v in agg.items() if v > 0.0)
        assert list(zip(idx.tolist(), vals.tolist())) == want


def test_sparse_bgem3_method(spark, docs):
    # bgem3-style sparse: linear head on hidden states, max per token id,
    # special ids skipped, indices ascending (impl.rs:256-304)
    rows = embed_sparse(docs, "text", model="stub-sparse-bgem3").collect()
    assert len(rows) == len(TEXTS)
    nonempty = 0
    for r in rows:
        se = r["sparse_embedding"]
        assert len(se["indices"]) == len(se["values"])
        assert all(v > 0.0 for v in se["values"])
        assert list(se["indices"]) == sorted(se["indices"])
        assert all(i not in (0, 1, 2, 3) for i in se["indices"])
        nonempty += bool(se["indices"])
    assert nonempty > 0
    # duplicate texts → identical sparse vectors; partition invariance
    m = {r["doc_id"]: (tuple(r["sparse_embedding"]["indices"]),
                       tuple(r["sparse_embedding"]["values"])) for r in rows}
    assert m[0] == m[4]
    again = {r["doc_id"]: (tuple(r["sparse_embedding"]["indices"]),
                           tuple(r["sparse_embedding"]["values"]))
             for r in embed_sparse(docs.repartition(5), "text",
                                   model="stub-sparse-bgem3").collect()}
    assert m == again


def test_qwen_vl_embed_shapes_and_grid(spark):
    from fastembed_rs_spark.operators.embed import embed_qwen_vl

    df = spark.createDataFrame(
        [(0, bytearray(b"fake-img-a")), (1, bytearray(b"fake-img-bb"))],
        ["doc_id", "content"],
    )
    # fake decode yields 16x16; patch 4 + merge 2 -> factor 8 -> 16x16 kept,
    # grid 4x4, 4 merge blocks pooled into one vector
    rows = embed_qwen_vl(
        df, "content", model="stub-qwen-vl", patch_size=4, merge_size=2
    ).collect()
    assert len(rows) == 2
    for r in rows:
        assert len(r["embedding"]) == 32
        norm = math.sqrt(sum(x * x for x in r["embedding"]))
        assert norm == pytest.approx(1.0, abs=1e-3)
        assert (r["grid"]["t"], r["grid"]["h"], r["grid"]["w"]) == (1, 4, 4)
    # determinism + partition invariance
    a = {r["doc_id"]: list(r["embedding"]) for r in rows}
    b = {r["doc_id"]: list(r["embedding"]) for r in embed_qwen_vl(
        df.repartition(2), "content", model="stub-qwen-vl",
        patch_size=4, merge_size=2).collect()}
    assert a == b
    # distinct inputs -> distinct embeddings
    assert a[0] != a[1]
