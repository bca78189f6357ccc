"""Per-query regression report between two bench JSON files.

The headline set GROWS across rounds, so comparing `value` totals is
meaningless; this compares per-query times and flags regressions.

Usage::

    python tools/compare_bench.py BENCH_r02.json /tmp/bench_out.json [ratio]

Exit 1 if any shared query slowed by more than ``ratio`` (default 1.5)
AND by more than 0.3 s absolute (sub-second jitter on fixed-cost queries
is not a regression signal).
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    old_path, new_path = sys.argv[1], sys.argv[2]
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    def queries_of(path: str) -> dict[str, float]:
        obj = json.load(open(path))
        if "queries" not in obj and "parsed" in obj:
            obj = obj["parsed"]  # driver BENCH_r{N}.json wraps bench's line
        return obj["queries"]

    old = queries_of(old_path)
    new = queries_of(new_path)

    shared = sorted(set(old) & set(new))
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    regressions = []
    for q in shared:
        o, n = old[q], new[q]
        r = n / o if o > 0 else float("inf")
        flag = ""
        if r > ratio and (n - o) > 0.3:
            flag = "  <-- REGRESSION"
            regressions.append(q)
        elif r < 1 / ratio and (o - n) > 0.3:
            flag = "  (improved)"
        if flag:
            print(f"{q}: {o:.2f}s -> {n:.2f}s ({r:.2f}x){flag}")
    so, sn = sum(old[q] for q in shared), sum(new[q] for q in shared)
    print(f"shared {len(shared)} queries: {so:.1f}s -> {sn:.1f}s ({sn/so:.2f}x)")
    if added:
        print(f"added ({len(added)}): " + ", ".join(f"{q}={new[q]:.2f}s" for q in added))
    if removed:
        print(f"removed ({len(removed)}): " + ", ".join(removed))
    if regressions:
        print(f"FAIL: {len(regressions)} regression(s): {', '.join(regressions)}")
        return 1
    print("OK: no per-query regression")
    return 0


if __name__ == "__main__":
    sys.exit(main())
