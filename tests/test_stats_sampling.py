"""Tests for operators/stats.py and operators/scale.py::hash_sample."""

from __future__ import annotations

import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from fastembed_rs_spark.operators.scale import hash_sample
from fastembed_rs_spark.operators.stats import equiwidth_histogram, heavy_hitter_tokens


def test_histogram_counts_match_numpy(spark):
    import numpy as np

    rng = random.Random(31)
    vals = [round(rng.uniform(10, 500), 2) for _ in range(5000)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = {r.bin: r for r in equiwidth_histogram(df, "x", bins=10).collect()}
    counts, edges = np.histogram(vals, bins=10, range=(min(vals), max(vals)))
    for b in range(10):
        n = got[b].n if b in got else 0
        assert n == counts[b], b
    # cumulative reaches the total; edges agree to rounding
    assert max(r.cum_n for r in got.values()) == len(vals)
    assert got[0].lo == pytest.approx(min(vals), abs=1e-4)
    assert got[9].hi == pytest.approx(max(vals), abs=1e-4)


def test_histogram_max_value_clamped_into_last_bin(spark):
    df = spark.createDataFrame([(float(i),) for i in range(11)], "x double")
    rows = {r.bin: r.n for r in equiwidth_histogram(df, "x", bins=5).collect()}
    assert sum(rows.values()) == 11
    assert max(rows) == 4  # x=10.0 lands in bin 4, not a phantom bin 5


def test_heavy_hitters_match_counter(spark):
    rng = random.Random(32)
    words = [f"w{rng.randrange(40)}" for _ in range(3000)]
    docs = spark.createDataFrame(
        [(i, " ".join(words[i * 30 : (i + 1) * 30])) for i in range(100)],
        "doc_id long, text string",
    )
    got = heavy_hitter_tokens(docs, "text", k=10).collect()
    ref = Counter(words)
    # rank order: count desc, token asc
    expected = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r.token, r.n) for r in sorted(got, key=lambda r: r.rank)] == expected


def test_hash_sample_deterministic_and_partition_stable(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    a = sorted(r.k for r in hash_sample(df, "k", 100).collect())
    b = sorted(r.k for r in hash_sample(df.repartition(13), "k", 100).collect())
    assert a == b
    # roughly 10%: binomial(2000, .1) — allow 5 sigma (~67)
    assert abs(len(a) - 200) < 70


def test_hash_sample_join_consistent_across_tables(spark):
    left = spark.range(0, 1000).withColumnRenamed("id", "k")
    right = spark.range(0, 1000).selectExpr("id as k", "id * 2 as v")
    ls = {r.k for r in hash_sample(left, "k", 150).collect()}
    rs = {r.k for r in hash_sample(right, "k", 150).collect()}
    assert ls == rs  # same keys survive in both tables


def test_hash_sample_salt_draws_independent_sample(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    a = {r.k for r in hash_sample(df, "k", 100).collect()}
    b = {r.k for r in hash_sample(df, "k", 100, salt="x").collect()}
    assert a != b
    # overlap ~ 10% of each sample, far below identity
    assert len(a & b) < len(a) * 0.5


def test_cms_never_underestimates_and_is_exact_for_unique_buckets(spark):
    """CMS point estimates must be >= true counts (the sketch's one-sided
    error guarantee); with w >> distinct items, collisions are rare and
    most estimates are exact."""
    from collections import Counter

    from pyspark.sql import functions as F

    from fastembed_rs_spark.functions.text import token_hash
    from fastembed_rs_spark.operators.sketch import cms_counters, cms_estimate

    words = ["alpha", "beta", "gamma", "delta"] * 25 + ["rare", "once"]
    df = spark.createDataFrame([(w,) for w in words], "token string")
    toks = df.select("token", token_hash("token").alias("h"))
    counters = cms_counters(toks, "h")
    items = toks.groupBy("token", "h").agg(F.count("*").cast("long").alias("true_n"))
    est = {r["token"]: (r["true_n"], r["cms_n"])
           for r in cms_estimate(items, counters, "h").collect()}
    truth = Counter(words)
    for tok, (true_n, cms_n) in est.items():
        assert true_n == truth[tok]
        assert cms_n >= true_n
    # sanity: the heavy tokens' estimates equal truth here (w=1024 >> 6 keys)
    assert est["alpha"][1] == 25 and est["once"][1] >= 1


def test_approx_percentiles_track_exact_within_rank_error(spark):
    """value_percentiles_approx (GK sketch, accuracy 10^4) vs the exact
    ordered-set aggregate: the returned value's true rank must be within
    eps = 1/accuracy (x n) of the requested rank — the GK guarantee."""
    from fastembed_rs_spark.queries import all_queries

    sf = "/root/testdata/sf0.001"
    catalog = all_queries()
    exact = {r["event_type"]: r for r in
             catalog["value_percentiles"].spark(spark, sf).collect()}
    approx = {r["event_type"]: r for r in
              catalog["value_percentiles_approx"].spark(spark, sf).collect()}
    assert set(exact) == set(approx)
    ev = catalog["value_percentiles"].spark  # reuse t() path
    from fastembed_rs_spark.queries import t

    vals = (
        t(spark, sf, "events").groupBy("event_type")
        .agg(F.sort_array(F.collect_list("value")).alias("vs")).collect()
    )
    for r in vals:
        et, vs = r["event_type"], r["vs"]
        n = len(vs)
        assert approx[et]["n"] == exact[et]["n"] == n
        for q_, col in ((0.5, "p50"), (0.9, "p90")):
            got = approx[et][col]
            # rank window: GK with eps guarantees rank in [qn - eps n, qn + eps n]
            eps = 1.0 / 10000 + 1e-9
            lo_i = max(0, int((q_ - eps) * n) - 1)
            hi_i = min(n - 1, int((q_ + eps) * n) + 1)
            assert vs[lo_i] - 1e-6 <= got <= vs[hi_i] + 1e-6, (et, col)


def test_user_journey_is_single_hash_aggregate(spark):
    """The journey endpoints must plan as ONE map-side-combinable hash
    aggregate — no window, no distinct re-shuffle."""
    from fastembed_rs_spark.queries import all_queries

    df = all_queries()["user_journey"].spark(spark, "/root/testdata/sf0.001")
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in p
    assert "partial_min_by" in p or "partial_min" in p  # map-side partials
    assert p.count("Exchange") == 1  # one shuffle on user_id, nothing else
