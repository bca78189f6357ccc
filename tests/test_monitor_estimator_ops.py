"""Semantics tests for robust_value_outliers, event_transitions,
join_size_estimate (r6)."""

from __future__ import annotations

import numpy as np
import pytest

SF_DIR = "/root/testdata/sf0.001"


def test_robust_value_outliers_match_numpy(spark):
    from fastembed_rs_spark.queries import QUERIES, t

    out = {r["event_type"]: r for r in
           QUERIES["robust_value_outliers"].spark(spark, SF_DIR).collect()}
    rows = t(spark, SF_DIR, "events").select("event_type", "value").collect()
    vals: dict[str, list[float]] = {}
    for r in rows:
        vals.setdefault(r["event_type"], []).append(r["value"])
    assert set(out) == set(vals)
    for et, xs in vals.items():
        a = np.array(xs, dtype=np.float64)
        med = float(np.percentile(a, 50, method="linear"))
        mad = float(np.percentile(np.abs(a - med), 50, method="linear"))
        r = out[et]
        assert r["n"] == len(xs)
        assert r["med"] == pytest.approx(med, abs=1e-6)
        assert r["mad"] == pytest.approx(mad, abs=1e-6)
        if mad > 0:
            n_out = int(np.sum(np.abs(0.6745 * (a - med) / mad) > 3.5))
        else:
            n_out = 0
        assert r["n_outliers"] == n_out
        # the whole point vs mean/std z-scores: flags are a small minority
        assert r["n_outliers"] < r["n"] * 0.1


def test_event_transitions_match_pandas_reference(spark):
    from fastembed_rs_spark.queries import QUERIES, t

    out = QUERIES["event_transitions"].spark(spark, SF_DIR).collect()
    ev = (
        t(spark, SF_DIR, "events")
        .select("user_id", "event_type", "ts", "event_id")
        .collect()
    )
    seqs: dict[int, list] = {}
    for r in ev:
        seqs.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_id"], r["event_type"])
        )
    cnt: dict[tuple[str, str], int] = {}
    for s in seqs.values():
        s.sort()
        for (_, _, a), (_, _, b) in zip(s, s[1:]):
            cnt[(a, b)] = cnt.get((a, b), 0) + 1
    tot: dict[str, int] = {}
    for (a, _), c in cnt.items():
        tot[a] = tot.get(a, 0) + c
    got = {(r["prev"], r["next"]): r for r in out}
    assert set(got) == set(cnt)
    for (a, b), r in got.items():
        assert r["cnt"] == cnt[(a, b)]
        assert r["prob"] == pytest.approx(cnt[(a, b)] / tot[a], abs=1e-6)
    # per-state ranks are a permutation of 1..n_successors
    by_prev: dict[str, list[int]] = {}
    for r in out:
        by_prev.setdefault(r["prev"], []).append(r["rnk"])
    for ranks in by_prev.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    # probabilities per state sum to ~1
    for a, t_ in tot.items():
        s = sum(r["cnt"] for (p, _), r in got.items() if p == a)
        assert s == t_


def test_join_size_estimate_is_accurate_and_consistent(spark):
    from fastembed_rs_spark.queries import QUERIES

    r = QUERIES["join_size_estimate"].spark(spark, SF_DIR).collect()[0]
    assert r["kk"] <= 256
    assert 0 <= r["n_both"] <= r["kk"]
    assert 0.0 <= r["est_jaccard"] <= 1.0
    assert r["est_union"] >= r["est_overlap"] >= 0.0
    # k=256 KMV: relative error on the overlap well under 20% at this scale
    assert r["est_overlap"] == pytest.approx(
        r["actual_overlap"], rel=0.2
    )


def test_split_leakage_report_consistency(spark):
    from fastembed_rs_spark.queries import QUERIES

    out = QUERIES["split_leakage_report"].spark(spark, SF_DIR).collect()
    assert out
    valid = {"train", "val", "test"}
    total = 0
    for r in out:
        assert r["split_a"] in valid and r["split_b"] in valid
        assert r["split_a"] <= r["split_b"]
        if r["split_a"] == r["split_b"]:
            assert r["n_leaking"] == 0
        else:
            assert r["n_leaking"] == r["n_pairs"]
        total += r["n_pairs"]
    n_pairs = QUERIES["jaccard_adaptive_neardup"].spark(spark, SF_DIR).count()
    assert total == n_pairs  # every near-dup pair lands in exactly one cell


def test_quality_percent_rank_matches_reference(spark):
    from fastembed_rs_spark.queries import QUERIES

    out = QUERIES["quality_percent_rank"].spark(spark, SF_DIR).collect()
    by_lang: dict[str, list] = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append((r["quality"], r["doc_id"], r["pr"]))
    for rows in by_lang.values():
        qs = sorted(q for q, _, _ in rows)
        n = len(qs)
        for q, _, pr in rows:
            # percent_rank = (min-rank - 1) / (n - 1)
            expected = 0.0 if n == 1 else qs.index(q) / (n - 1)
            assert pr == pytest.approx(expected, abs=1e-6)
        assert min(pr for _, _, pr in rows) == 0.0
        assert max(pr for _, _, pr in rows) <= 1.0
