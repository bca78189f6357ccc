"""Dump `.explain("formatted")` for named catalog queries into plan files.

Usage: python tools/dump_plan_files.py <out_dir> <suffix> <query> [query ...]

Writes <out_dir>/<query>_<suffix>.txt for each query — the round-10
optimization deliverable (`plans/r10/<query>_before.txt` / `_after.txt`).
The formatted plan is the INITIAL plan (AdaptiveSparkPlan isFinalPlan=false)
of the DataFrame the catalog query returns; for orchestration queries
(lifecycle audits) constructing that DataFrame runs the build steps first,
exactly as the bench does.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    os.makedirs(out_dir, exist_ok=True)

    from fastembed_rs_spark.queries import all_queries
    from fastembed_rs_spark.session import get_spark

    spark = get_spark("plan-files")
    spark.sparkContext.setLogLevel("ERROR")
    catalog = all_queries()
    for name in names:
        df = catalog[name].spark(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — explain('formatted') at {sf_dir}\n\n")
            f.write(plan)
        print(f"wrote {path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
