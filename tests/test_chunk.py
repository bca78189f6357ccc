"""Chunking operators (operators/chunk.py) vs a plain-Python reference."""

from __future__ import annotations

import math

import pytest

from fastembed_rs_spark.operators.chunk import chunk_by_chars, chunk_by_tokens

DOCS = [
    (0, "a" * 500),
    (1, "short"),
    (2, ""),
    (3, "x" * 200),          # exactly one window
    (4, "y" * 201),          # one char over -> 2 chunks
    (5, "many words " * 40), # token-mode fodder
]


def _py_char_chunks(text, size, overlap):
    stride = size - overlap
    n = max(1, math.ceil((len(text) - overlap) / stride))
    return [(i, n, text[i * stride: i * stride + size]) for i in range(n)]


def _py_token_chunks(text, size, overlap):
    toks = [t for t in text.split() if t]
    stride = size - overlap
    n = max(1, math.ceil((len(toks) - overlap) / stride))
    return [(i, n, " ".join(toks[i * stride: i * stride + size])) for i in range(n)]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_chunk_by_chars_matches_python(spark, docs):
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["n_chunks"], r["chunk_text"])
        for r in chunk_by_chars(docs, size=200, overlap=50).collect()
    }
    for doc_id, text in DOCS:
        for i, n, chunk in _py_char_chunks(text, 200, 50):
            assert got[(doc_id, i)] == (n, chunk), (doc_id, i)
    assert len(got) == sum(len(_py_char_chunks(t, 200, 50)) for _, t in DOCS)


def test_chunk_by_tokens_matches_python(spark, docs):
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["n_chunks"], r["chunk_text"])
        for r in chunk_by_tokens(docs, size=16, overlap=4).collect()
    }
    for doc_id, text in DOCS:
        for i, n, chunk in _py_token_chunks(text, 16, 4):
            assert got[(doc_id, i)] == (n, chunk), (doc_id, i)
    assert len(got) == sum(len(_py_token_chunks(t, 16, 4)) for _, t in DOCS)


def test_chunk_reassembly_roundtrip(spark, docs):
    """Dropping each chunk's overlap prefix and concatenating restores the
    document — the no-gap/no-dup window property."""
    rows = sorted(
        (r["doc_id"], r["chunk_idx"], r["chunk_text"])
        for r in chunk_by_chars(docs, size=200, overlap=50).collect()
    )
    rebuilt = {}
    for doc_id, idx, chunk in rows:
        rebuilt[doc_id] = rebuilt.get(doc_id, "") + (chunk if idx == 0 else chunk[50:])
    assert rebuilt == {d: t for d, t in DOCS}


def test_chunk_rejects_bad_overlap(spark, docs):
    with pytest.raises(ValueError):
        chunk_by_chars(docs, size=100, overlap=100)
    with pytest.raises(ValueError):
        chunk_by_tokens(docs, size=8, overlap=-1)


def test_chunk_plan_has_no_shuffle(spark, docs):
    plan = chunk_by_chars(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Generate explode" in plan  # codegen explode, no Python eval
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_chunk_randomized_configs_match_python(spark):
    """200 random-length docs × 3 (size, overlap) configs, one Spark call
    per config, each compared to the Python reference."""
    import random

    rng = random.Random(7)
    docs_py = [
        (i, "".join(rng.choice("ab cd\tef  g") for _ in range(rng.randrange(0, 400))))
        for i in range(200)
    ]
    docs = spark.createDataFrame(docs_py, ["doc_id", "text"])
    for size, overlap in [(50, 0), (64, 16), (37, 36)]:
        got = {
            (r["doc_id"], r["chunk_idx"]): (r["n_chunks"], r["chunk_text"])
            for r in chunk_by_chars(docs, size=size, overlap=overlap).collect()
        }
        want = {}
        for doc_id, text in docs_py:
            for i, n, chunk in _py_char_chunks(text, size, overlap):
                want[(doc_id, i)] = (n, chunk)
        assert got == want, (size, overlap)


def test_chunk_tokens_randomized_matches_python(spark):
    import random

    rng = random.Random(11)
    words = ["alpha", "b", "gamma7", "Δδ", "x" * 30]
    docs_py = [
        (i, " ".join(rng.choice(words) for _ in range(rng.randrange(0, 120))))
        for i in range(120)
    ]
    docs = spark.createDataFrame(docs_py, ["doc_id", "text"])
    for size, overlap in [(16, 4), (8, 7)]:
        got = {
            (r["doc_id"], r["chunk_idx"]): (r["n_chunks"], r["chunk_text"])
            for r in chunk_by_tokens(docs, size=size, overlap=overlap).collect()
        }
        want = {}
        for doc_id, text in docs_py:
            for i, n, chunk in _py_token_chunks(text, size, overlap):
                want[(doc_id, i)] = (n, chunk)
        assert got == want, (size, overlap)
