"""Bloom-filter pre-filter (operators/bloom.py): no false negatives,
real pruning, exact end-to-end semi-join, and the filter-below-join plan
shape that makes the prune actually reduce the scan."""

from __future__ import annotations

from pyspark.sql import functions as F

from fastembed_rs_spark.operators.bloom import (
    bloom_build,
    bloom_prune,
    bloom_semi_join,
)


def _sets(spark, n_build=500, n_probe=5000):
    build = spark.range(n_build).select((F.col("id") * 7 + 3).alias("k"))
    probe = spark.range(n_probe).select(F.col("id").alias("k"))
    return build, probe


def test_no_false_negatives(spark):
    """Every true member must survive the bitmap prune."""
    build, probe = _sets(spark)
    bitmap = bloom_build(build, "k")
    kept = {r["k"] for r in bloom_prune(probe, "k", bitmap).collect()}
    members = {r["k"] for r in build.filter(F.col("k") < 5000).collect()}
    assert members <= kept


def test_prune_rate(spark):
    """With m=2^16 bits and 500 keys, fpp is well under 5%: of the ~4286
    non-members in the probe, almost all must be pruned."""
    build, probe = _sets(spark)
    bitmap = bloom_build(build, "k")
    kept = bloom_prune(probe, "k", bitmap).count()
    members = build.filter(F.col("k") < 5000).count()
    false_pos = kept - members
    non_members = 5000 - members
    assert false_pos / non_members < 0.05


def test_semi_join_is_exact(spark):
    """bloom_semi_join == plain left-semi join, bit for bit."""
    build, probe = _sets(spark)
    got = sorted(r["k"] for r in bloom_semi_join(probe, build, "k", "k").collect())
    want = sorted(
        r["k"]
        for r in probe.join(
            build.withColumnRenamed("k", "bk"),
            F.col("k") == F.col("bk"),
            "left_semi",
        ).collect()
    )
    assert got == want


def test_prune_is_a_scan_filter_below_the_join(spark):
    """The bloom must be a plain Filter (array-literal bit test) with NO
    join of its own, and in bloom_semi_join it must sit BELOW the exact
    semi-join — i.e. the semi-join's probe child contains the xxhash64
    filter. A broadcast-bitmap formulation failed this: Catalyst reordered
    the exact join underneath the bloom condition, making the prune a
    no-op (see module docstring)."""
    build, probe = _sets(spark)
    bitmap = bloom_build(build, "k")
    pruned = bloom_prune(probe, "k", bitmap)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Exchange" not in plan  # pure scan+filter
    assert "xxhash64" in plan

    joined = bloom_semi_join(probe, build, "k", "k")
    jplan = joined._jdf.queryExecution().executedPlan().toString()
    # probe leg = everything below the semi join's left child: the bloom
    # filter must appear there (below the join), not above it
    above, below = jplan.split("LeftSemi", 1)
    assert "xxhash64" in below
    assert "xxhash64" not in above


def test_catalog_bloom_query_matches_plain_semijoin(spark):
    sf = "/root/testdata/sf0.001"
    from fastembed_rs_spark.queries import all_queries, t

    got = {
        r["l_returnflag"]: (r["revenue"], r["n_items"])
        for r in all_queries()["bloom_semijoin_revenue"].spark(spark, sf).collect()
    }
    li = t(spark, sf, "lineitem")
    big = t(spark, sf, "orders").filter(F.col("o_totalprice") > 450000)
    want = {
        r["l_returnflag"]: (r["revenue"], r["n_items"])
        for r in li.join(
            big, li.l_orderkey == big.o_orderkey, "left_semi"
        )
        .groupBy("l_returnflag")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").cast("long").alias("n_items"),
        )
        .collect()
    }
    assert got == want


def test_no_false_negatives_extreme_keys(spark):
    """Negative and near-overflow keys hash into range (pmod, not %)."""
    keys = [(-(2**62) + 13,), (-1,), (0,), (2**62 + 7,), (999_999_999_999,)]
    build = spark.createDataFrame(keys, ["k"])
    probe = spark.createDataFrame(keys + [(12345,)], ["k"])
    bitmap = bloom_build(build, "k")
    kept = {r["k"] for r in bloom_prune(probe, "k", bitmap).collect()}
    assert {k for (k,) in keys} <= kept
