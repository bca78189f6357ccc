"""Semantics tests for the warehouse/monitoring operators added late in
round 6 — SCD2 history build, SymSpell fuzzy vocab join, daily anomaly
z-scores, chi-squared feature selection. Each test re-derives the expected
result from the raw parquet with plain Python, independent of both the
Spark plan and the DuckDB oracle."""

from __future__ import annotations

import math

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def catalog():
    from fastembed_rs_spark.queries import all_queries

    return all_queries()


def test_scd2_versions_tile_each_users_timeline(spark, catalog):
    """Versions are the run-length encoding of each user's state sequence:
    contiguous valid intervals, n_events summing to the user's event count,
    exactly one open (is_current) version per user."""
    out = catalog["scd2_history"].spark(spark, SF).collect()
    from fastembed_rs_spark.queries import t

    raw = (
        t(spark, SF, "events")
        .filter("user_id % 10 = 0")
        .select("user_id", "event_type", "ts", "event_id")
        .collect()
    )
    seq: dict[int, list] = {}
    for r in sorted(raw, key=lambda r: (r["user_id"], r["ts"], r["event_id"])):
        seq.setdefault(r["user_id"], []).append((r["event_type"], r["ts"]))
    # expected run-length encoding per user
    expect: dict[int, list] = {}
    for u, evs in seq.items():
        runs = []
        for state, ts in evs:
            if runs and runs[-1][0] == state:
                runs[-1][2] += 1
            else:
                runs.append([state, ts, 1])
        expect[u] = runs
    by_user: dict[int, list] = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    assert set(by_user) == set(expect)
    for u, rows in by_user.items():
        rows.sort(key=lambda r: r["version"])
        assert [r["version"] for r in rows] == list(range(1, len(rows) + 1))
        assert [(r["state"], r["valid_from"], r["n_events"]) for r in rows] == [
            tuple(x) for x in expect[u]
        ]
        # intervals tile: valid_to(k) == valid_from(k+1); last one open
        for a, b in zip(rows, rows[1:]):
            assert a["valid_to"] == b["valid_from"]
            assert a["is_current"] == 0
        assert rows[-1].valid_to == -1 and rows[-1].is_current == 1
        assert sum(r["n_events"] for r in rows) == len(seq[u])


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_fuzzy_vocab_join_is_exactly_the_lev1_pairs(spark, catalog):
    """The deletion-neighborhood join must be COMPLETE (every edit-distance-1
    vocab pair appears — the SymSpell guarantee) and SOUND (nothing else)."""
    import re

    out = catalog["fuzzy_vocab_join"].spark(spark, SF).collect()
    parts = spark.read.parquet(f"{SF}/part.parquet").collect()
    counts: dict[str, int] = {}
    for r in parts:
        for tok in re.split("[^a-z0-9]+", r["p_name"].lower()):
            if len(tok) >= 3:
                counts[tok] = counts.get(tok, 0) + 1
    vocab = sorted(counts)
    expect = {
        (a, b)
        for i, a in enumerate(vocab)
        for b in vocab[i + 1 :]
        if abs(len(a) - len(b)) <= 1 and _lev(a, b) == 1
    }
    got = {(r["tok_a"], r["tok_b"]) for r in out}
    assert got == expect and expect  # non-vacuous: the testdata has pairs
    for r in out:
        assert r["cnt_a"] == counts[r["tok_a"]]
        assert r["cnt_b"] == counts[r["tok_b"]]


def test_events_anomaly_days_zscores_match_reference(spark, catalog):
    """z-scores equal a direct trailing-7 mean/std recomputation; days
    without a complete 7-day baseline are absent."""
    out = catalog["events_anomaly_days"].spark(spark, SF).collect()
    from fastembed_rs_spark.queries import t

    raw = t(spark, SF, "events").select("event_type", "ts").collect()
    daily: dict[str, dict[int, int]] = {}
    for r in raw:
        day = r["ts"] // 86400000000000
        daily.setdefault(r["event_type"], {})[day] = (
            daily.setdefault(r["event_type"], {}).get(day, 0) + 1
        )
    expect = {}
    for et, dmap in daily.items():
        days = sorted(dmap)
        for i, day in enumerate(days):
            base = [dmap[d] for d in days[max(0, i - 7) : i]]
            if len(base) != 7:
                continue
            mean = sum(base) / 7.0
            var = sum((x - mean) ** 2 for x in base) / 6.0
            std = math.sqrt(var)
            z = 0.0 if std == 0.0 else (dmap[day] - mean) / std
            expect[(et, day)] = (dmap[day], round(mean, 6), round(z, 6))
    assert {(r["event_type"], r["day"]) for r in out} == set(expect)
    for r in out:
        n, mean, z = expect[(r["event_type"], r["day"])]
        assert r["n"] == n
        assert abs(r["baseline_avg"] - mean) < 1e-6
        assert abs(r["zscore"] - z) < 1e-6
        assert r["is_anomaly"] == (1 if abs(r["zscore"]) > 2.0 else 0)


def test_chi2_token_select_matches_contingency_reference(spark, catalog):
    """chi2 equals the 2x2 contingency formula on doc-frequency counts;
    ranking is (chi2 desc, token asc)."""
    import re

    out = catalog["chi2_token_select"].spark(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    np_ = sum(1 for r in docs if r["lang"] == "en")
    nn = len(docs) - np_
    a: dict[str, int] = {}
    b: dict[str, int] = {}
    for r in docs:
        toks = {t for t in re.split("[^a-z0-9]+", r["text"].lower()) if t}
        for tok in toks:
            if r["lang"] == "en":
                a[tok] = a.get(tok, 0) + 1
            else:
                b[tok] = b.get(tok, 0) + 1
    expect = {}
    for tok in set(a) | set(b):
        aa, bb = a.get(tok, 0), b.get(tok, 0)
        cc, dd = np_ - aa, nn - bb
        if cc + dd == 0:
            chi2 = 0.0
        else:
            num = aa * dd - bb * cc
            chi2 = ((np_ + nn) * float(num) * num) / (
                float(aa + bb) * (cc + dd) * np_ * nn
            )
        expect[tok] = (aa, bb, round(chi2, 6))
    ranked = sorted(expect.items(), key=lambda kv: (-kv[1][2], kv[0]))[:50]
    got = sorted(out, key=lambda r: r["rnk"])
    assert [(r["tok"], r["a"], r["b"]) for r in got] == [
        (tok, aa, bb) for tok, (aa, bb, _) in ranked
    ]
    for r, (_, (_, _, chi2)) in zip(got, ranked):
        assert abs(r["chi2"] - chi2) < 1e-6


def test_table_profile_matches_pandas(spark, catalog):
    """Per-column nulls / exact distincts / fill rate must equal a pandas
    recompute over the raw parquet, and the internal identity
    fill_permille == (n_rows - n_nulls) * 1000 // n_rows must hold."""
    import pandas as pd

    out = {r["column_name"]: r
           for r in catalog["table_profile"].spark(spark, SF).collect()}
    raw = pd.read_parquet(f"{SF}/orders.parquet")
    assert set(out) == set(raw.columns)
    for c, r in out.items():
        assert r["n_rows"] == len(raw)
        assert r["n_nulls"] == int(raw[c].isna().sum())
        assert r["n_distinct"] == int(raw[c].nunique(dropna=True))
        filled = r["n_rows"] - r["n_nulls"]
        assert r["fill_permille"] == filled * 1000 // r["n_rows"]


def test_label_coherence_matches_numpy(spark, catalog):
    """Centroid norm and mean member-cosine must match a NumPy replay with
    the same round-6 -> micro-unit discipline, and every class coherence
    must beat scoring the same members against a WRONG class's centroid
    (the value of the statistic: it separates own-class from cross-class)."""
    import numpy as np

    out = {r["label"]: r
           for r in catalog["label_coherence"].spark(spark, SF).collect()}
    rows = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    by_label: dict[int, list] = {}
    for r in rows:
        by_label.setdefault(int(r["label"]), []).append(
            np.asarray(r["embedding"], dtype=np.float64))
    assert set(out) == set(by_label)

    def cos_micro(v, c):
        nv, nc = np.sqrt(v @ v), np.sqrt(c @ c)
        raw = 0.0 if nv == 0 or nc == 0 else float(v @ c) / (nv * nc)
        return int(np.round(np.round(raw, 6) * 1_000_000))

    cents = {lb: np.round(np.stack(vs).mean(axis=0), 6)
             for lb, vs in by_label.items()}
    for lb, r in out.items():
        vs, c = by_label[lb], cents[lb]
        assert r["n_vecs"] == len(vs)
        assert r["centroid_norm_micro"] == int(
            np.round(np.round(np.sqrt(c @ c), 6) * 1_000_000))
        s = sum(cos_micro(v, c) for v in vs)
        # engines' integer division truncates toward zero
        assert r["mean_cos_micro"] == (
            s // len(vs) if s >= 0 else -((-s) // len(vs)))
    # own-centroid coherence > mean cosine against any OTHER class centroid
    labels = sorted(by_label)
    for lb in labels:
        for other in labels:
            if other == lb:
                continue
            cross = np.mean([cos_micro(v, cents[other])
                             for v in by_label[lb]])
            assert out[lb]["mean_cos_micro"] > cross
