"""Semantics tests for cohort_retention and training_triples (r6)."""

from __future__ import annotations

import numpy as np
import pytest

SF_DIR = "/root/testdata/sf0.001"


def test_cohort_retention_invariants(spark):
    from fastembed_rs_spark.queries import QUERIES

    rows = QUERIES["cohort_retention"].spark(spark, SF_DIR).collect()
    assert rows
    by_cohort: dict[int, dict[int, tuple[int, int]]] = {}
    for r in rows:
        by_cohort.setdefault(r["cohort_wk"], {})[r["offset_wk"]] = (
            r["n_active"],
            r["cohort_size"],
        )
        assert r["retention"] == pytest.approx(
            r["n_active"] / r["cohort_size"], abs=1e-6
        )
        assert 0 < r["n_active"] <= r["cohort_size"]
        assert r["offset_wk"] >= 0
    for offsets in by_cohort.values():
        # week 0 = the cohort-defining week: everyone is active
        assert 0 in offsets
        n, size = offsets[0]
        assert n == size


def test_training_triples_match_bruteforce(spark):
    from fastembed_rs_spark.queries import QUERIES, t

    out = QUERIES["training_triples"].spark(spark, SF_DIR).collect()
    emb, lab = {}, {}
    for r in t(spark, SF_DIR, "embeddings").collect():
        emb[r["vec_id"]] = np.asarray(r["embedding"], dtype=np.float64)
        lab[r["vec_id"]] = r["label"]

    def cos(a, b):
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        return 0.0 if na == 0 or nb == 0 else float(a @ b / (na * nb))

    by_query: dict[int, list] = {}
    for r in out:
        by_query.setdefault(r["query_id"], []).append(r)
    assert set(by_query) == {q for q in emb if q < 20}
    for qid, rs in by_query.items():
        same = sorted(
            ((round(cos(emb[qid], emb[v]), 6), -v) for v in emb
             if v != qid and lab[v] == lab[qid]),
            reverse=True,
        )
        diff = sorted(
            ((round(cos(emb[qid], emb[v]), 6), -v) for v in emb
             if v != qid and lab[v] != lab[qid]),
            reverse=True,
        )
        assert len(rs) == 5
        assert all(r["pos_id"] == -same[0][1] for r in rs)
        assert all(
            r["pos_score"] == pytest.approx(same[0][0], abs=1e-9) for r in rs
        )
        for r in rs:
            s, nv = diff[r["neg_rank"] - 1]
            assert r["neg_id"] == -nv
            assert r["neg_score"] == pytest.approx(s, abs=1e-9)
            assert lab[r["neg_id"]] != lab[qid]
            assert lab[r["pos_id"]] == lab[qid]
