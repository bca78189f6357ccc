"""Semantics tests for containment_neardup, grouped_linregress,
reciprocal_nn, margin_mining (r6)."""

from __future__ import annotations

import numpy as np
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _grams(text: str, n: int = 3) -> set[str]:
    import re

    toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def test_containment_catches_subset_that_jaccard_misses(spark):
    from fastembed_rs_spark.operators.dedup import containment_pairs

    para = "the quick brown fox jumps over the lazy dog near the river bank"
    filler = " ".join(f"word{i} token{i} item{i}" for i in range(60))
    rows = [
        (1, para),
        (2, filler + " " + para + " " + filler),  # contains doc 1 verbatim
        (3, "entirely different content with no shared phrases at all here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r["id_a"], r["id_b"]): r
        for r in containment_pairs(df, "doc_id", "text", threshold=0.6).collect()
    }
    assert set(out) == {(1, 2)}
    g1, g2 = _grams(rows[0][1]), _grams(rows[1][1])
    expected = len(g1 & g2) / min(len(g1), len(g2))
    r = out[(1, 2)]
    assert r["containment"] == pytest.approx(expected, abs=1e-6)
    assert r["grams_a"] == len(g1) and r["grams_b"] == len(g2)
    # the same pair is invisible to symmetric Jaccard at any useful cutoff
    assert len(g1 & g2) / len(g1 | g2) < 0.2


def test_grouped_linregress_matches_numpy(spark):
    from fastembed_rs_spark.queries import QUERIES, t
    from fastembed_rs_spark.functions.text import tokens
    from pyspark.sql import functions as F

    out = {r["lang"]: r for r in
           QUERIES["grouped_linregress"].spark(spark, SF_DIR).collect()}
    feats = (
        t(spark, SF_DIR, "documents")
        .select("lang", F.size(tokens(F.col("text"))).alias("x"),
                F.length("text").alias("y"))
        .collect()
    )
    by_lang: dict[str, list] = {}
    for r in feats:
        by_lang.setdefault(r["lang"], []).append((r["x"], r["y"]))
    assert set(out) == set(by_lang)
    for lang, pts in by_lang.items():
        x = np.array([p[0] for p in pts], dtype=np.float64)
        y = np.array([p[1] for p in pts], dtype=np.float64)
        row = out[lang]
        assert row["n"] == len(pts)
        if np.var(x) == 0:
            assert row["slope"] == 0.0
            continue
        slope, intercept = np.polyfit(x, y, 1)
        assert row["slope"] == pytest.approx(slope, rel=1e-4, abs=1e-5)
        assert row["intercept"] == pytest.approx(intercept, rel=1e-4, abs=1e-3)
        if np.var(y) > 0:
            r2 = np.corrcoef(x, y)[0, 1] ** 2
            assert row["r2"] == pytest.approx(r2, abs=1e-5)


def _load_emb(spark):
    from fastembed_rs_spark.queries import t

    return {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in t(spark, SF_DIR, "embeddings").collect()
    }


def _cos6(a, b):
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    return 0.0 if na == 0 or nb == 0 else round(float(a @ b / (na * nb)), 6)


def test_reciprocal_nn_matches_bruteforce(spark):
    from fastembed_rs_spark.queries import QUERIES

    emb = _load_emb(spark)
    top3: dict[int, list[tuple[int, float, int]]] = {}
    for src in emb:
        cands = sorted(
            ((_cos6(emb[src], emb[d]), -d) for d in emb
             if d != src and _cos6(emb[src], emb[d]) >= 0.2),
            reverse=True,
        )[:3]
        top3[src] = [(-nd, s, i + 1) for i, (s, nd) in enumerate(cands)]
    expected = {}
    for a in emb:
        for (b, s, rab) in top3[a]:
            if a < b:
                back = [(d, r) for (d, _, r) in [(x, y, z) for x, y, z in top3[b]] if d == a]
                if back:
                    expected[(a, b)] = (s, rab, back[0][1])
    got = {
        (r["id_a"], r["id_b"]): (r["score"], r["rank_ab"], r["rank_ba"])
        for r in QUERIES["reciprocal_nn"].spark(spark, SF_DIR).collect()
    }
    assert set(got) == set(expected)
    for k, (s, rab, rba) in expected.items():
        gs, grab, grba = got[k]
        assert gs == pytest.approx(s, abs=1e-9)
        assert (grab, grba) == (rab, rba)


def test_margin_mining_matches_bruteforce(spark):
    """NumPy replay of the r7 distributed shape: candidate pairs from the
    symmetric trained-IVF overfetch (top-2 probes per vector, pair kept
    when either side's rank-1 bucket is among the other's probes), then
    ratio margins over the candidate set. Trusts the (separately pinned)
    k-means trainer; everything downstream is verified brute-force."""
    from fastembed_rs_spark.operators.topk import train_ivf_centroids
    from fastembed_rs_spark.queries import QUERIES, t

    emb = _load_emb(spark)
    cents = {
        r["centroid_id"]: np.asarray(r["centroid_vec"], dtype=np.float64)
        for r in train_ivf_centroids(
            t(spark, SF_DIR, "embeddings"), k=8, iters=3
        ).collect()
    }

    def probes(v):
        ranked = sorted(
            ((_cos6(v, cv), -cid) for cid, cv in cents.items()), reverse=True
        )
        return [-nc for _, nc in ranked[:2]]  # [assigned, second probe]

    pr = {vid: probes(v) for vid, v in emb.items()}
    anchors = sorted(v for v in emb if v % 2 == 0)
    pool = sorted(v for v in emb if v % 2 == 1)
    cand = {
        (a, c)
        for a in anchors
        for c in pool
        if pr[c][0] in pr[a] or pr[a][0] in pr[c]
    }

    def raw(a, c):
        va, vc = emb[a], emb[c]
        na, nc = np.linalg.norm(va), np.linalg.norm(vc)
        return 0.0 if na == 0 or nc == 0 else float(va @ vc / (na * nc))

    si = {(a, c): int(round(raw(a, c) * 1_000_000)) for (a, c) in cand}
    suma = {
        a: sum(
            s for s, _ in sorted(
                ((si[(a, c)], -c) for (aa, c) in cand if aa == a),
                reverse=True,
            )[:4]
        )
        for a in {a for a, _ in cand}
    }
    sumc = {
        c: sum(
            s for s, _ in sorted(
                ((si[(a, c)], -a) for (a, cc) in cand if cc == c),
                reverse=True,
            )[:4]
        )
        for c in {c for _, c in cand}
    }
    out = {r["anchor_id"]: r for r in
           QUERIES["margin_mining"].spark(spark, SF_DIR).collect()}
    assert set(out) == {a for a, _ in cand}
    # candidate set must be a strict subset of the dense pool x pool grid
    # (the whole point of the overfetch), yet every anchor keeps a row
    assert len(cand) < len(anchors) * len(pool)
    for a in out:
        margins = {}
        for (aa, c) in cand:
            if aa != a:
                continue
            den = suma[a] + sumc[c]
            margins[c] = 0.0 if den <= 0 else round(8.0 * si[(a, c)] / den, 6)
        best = max(margins, key=lambda c: (margins[c], -c))
        r = out[a]
        assert r["candidate_id"] == best
        assert r["margin"] == pytest.approx(margins[best], abs=1e-9)
        assert r["score"] == pytest.approx(si[(a, best)] / 1e6, abs=1e-9)
