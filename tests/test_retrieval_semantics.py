"""Semantic ranking checks for the composed retrieval pipelines, mirroring
the reference's rerank self-match test (tests/text-embeddings.rs:389-395):
a query drawn from the corpus must rank its own document first."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def catalog():
    from fastembed_rs_spark.queries import all_queries

    return all_queries()


def _rank1(rows):
    return {r["query_id"]: r["doc_id"] for r in rows if r["rank"] == 1}


def test_retrieve_then_rerank_self_match_ranks_first(spark, catalog):
    rows = catalog["retrieve_then_rerank"].spark(spark, SF).collect()
    assert _rank1(rows) == {0: 0, 1: 1, 2: 2}


def test_rag_passage_topk_self_doc_ranks_first(spark, catalog):
    """Queries are whole documents; their own passages must win MaxP."""
    rows = catalog["rag_passage_topk"].spark(spark, SF).collect()
    assert _rank1(rows) == {0: 0, 1: 1, 2: 2}


def test_two_stage_agrees_with_pure_rerank_on_shared_candidates(spark, catalog):
    """Where stage-1 retrieval kept a doc that pure rerank also scored,
    the rerank scores must be identical (stage composition changes the
    candidate set, never the scorer)."""
    two = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in catalog["retrieve_then_rerank"].spark(spark, SF).collect()
    }
    pure = {
        (r["query_id"], r["doc_id"]): round(r["score"], 6)
        for r in catalog["rerank_overlap"].spark(spark, SF).collect()
    }
    shared = set(two) & set(pure)
    assert shared  # the fixtures guarantee some overlap (self-docs at least)
    for k in shared:
        assert two[k] == pytest.approx(pure[k], abs=1e-9), k
