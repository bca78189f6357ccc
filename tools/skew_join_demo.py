"""Measured evidence for the salted-join recipe (VERDICT r7 #7): on the
skew shape ``skew_report`` flags — one key owning half the fact side — time
the plain shuffle join vs ``salted_join`` and show the per-partition row
distribution that explains the difference.

AQE and auto-broadcast are disabled for the probe (AQE's skew split handles
moderate skew; salted_join is the recipe for extreme skew where the small
side can't broadcast), matching tests/test_scale_patterns.py::
test_salted_join_spreads_hot_key_over_buckets, which pins the distribution
property in CI. This script adds wall-clock at a size where the straggler
is visible on local[32].

Usage: python tools/skew_join_demo.py [n_rows] [hot_share_pct]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    hot_pct = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    from pyspark.sql import functions as F

    from fastembed_rs_spark.operators.scale import salted_join
    from fastembed_rs_spark.session import get_spark

    spark = get_spark("skew-demo")
    spark.sparkContext.setLogLevel("ERROR")
    for c, v in (
        ("spark.sql.autoBroadcastJoinThreshold", "-1"),
        ("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"),
        ("spark.sql.adaptive.enabled", "false"),
    ):
        spark.conf.set(c, v)

    n_keys = 100_000
    big = spark.range(n).select(
        F.when(F.col("id") % 100 < hot_pct, F.lit(0))
        .otherwise(F.col("id") % (n_keys - 1) + 1).alias("k"),
        F.col("id").alias("payload"),
    ).localCheckpoint()
    # small side: too many rows to broadcast comfortably, wide payload
    small = spark.range(n_keys).select(
        F.col("id").alias("sk"),
        F.concat(F.lit("dim_" * 16), F.col("id").cast("string")).alias("attr"),
    ).localCheckpoint()

    def run(df, label):
        t0 = time.time()
        cnt = df.select(
            # xor-fold checksum: order-independent and overflow-free
            # (ANSI mode makes sum() of xxhash64 values a long-overflow)
            F.expr("bit_xor(xxhash64(payload, attr))").alias("chk"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        sec = time.time() - t0
        dist = (
            df.withColumn("__pid", F.spark_partition_id())
            .groupBy("__pid").count()
            .agg(F.max("count"), F.count(F.lit(1))).collect()[0]
        )
        print(f"{label}: {sec:.2f}s  rows={cnt['n']}  chk={cnt['chk']}  "
              f"max_partition_rows={dist[0]}  partitions={dist[1]}")
        return sec, cnt["n"], cnt["chk"], dist[0]

    plain = big.join(small, big.k == small.sk)
    salted = salted_join(big, small, "k", "sk", salt_buckets=32)

    # run each twice, report second (warm) pass
    run(plain, "plain (warmup)")
    p = run(plain, "plain shuffle join")
    run(salted, "salted (warmup)")
    s = run(salted, "salted_join B=32")
    assert p[1] == s[1] and p[2] == s[2], "result mismatch!"
    print(f"speedup: {p[0] / s[0]:.2f}x   "
          f"straggler shrink: {p[3]} -> {s[3]} rows "
          f"({p[3] / max(s[3], 1):.1f}x)")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
