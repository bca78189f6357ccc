"""Phase-level wall-clock profile of the orchestration-bound catalog
queries (the IVF lifecycle trio + curation_store_audit): wraps the Spark
job-submission path with a listener-free timer by monkeypatching the
DataFrame actions the queries drive, so each query's fixed job-count
overhead is attributed to named phases. Read-only: no repo state changes.

Usage: python tools/profile_lifecycle.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fastembed_rs_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or [
        "index_lifecycle_audit",
        "index_repair_audit",
        "index_retrain_compact_audit",
        "curation_store_audit",
    ]
    from fastembed_rs_spark.queries import all_queries

    spark = get_spark("profile-lifecycle")
    spark.sparkContext.setLogLevel("ERROR")
    catalog = all_queries()

    # count Spark jobs per query via the status tracker
    tracker = spark.sparkContext.statusTracker()

    spark.range(1000).selectExpr("sum(id)").collect()  # warm

    for name in names:
        spec = catalog[name]
        for run in (1, 2):
            ids0 = tracker.getJobIdsForGroup(None) or []
            t0 = time.time()
            spec.spark(spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            dt = time.time() - t0
            ids1 = tracker.getJobIdsForGroup(None) or []
            print(
                f"{name} run{run}: {dt:.2f}s  jobs={len(set(ids1) - set(ids0))}",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
