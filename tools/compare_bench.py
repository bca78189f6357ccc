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
import os
import re
import sys


def full_obj(path: str) -> dict:
    m = re.search(r"BENCH_r(\d+)\.json$", path)
    if m:
        local = os.path.join(
            os.path.dirname(path), f"BENCH_LOCAL_r{int(m.group(1)):02d}.json"
        )
        if os.path.exists(local):
            return json.load(open(local))
    obj = json.load(open(path))
    if "queries" not in obj and "parsed" in obj:
        obj = obj["parsed"] or {}
    return obj


def queries_of(path: str) -> dict[str, float]:
    """Per-query timing map for a bench artifact.

    Prefers the committed ``BENCH_LOCAL_r{N}.json`` side file when ``path``
    is a driver ``BENCH_r{N}.json`` (the driver's tail capture truncates
    long lines — bench.py writes the full map to the side file), then falls
    back to the artifact's own ``queries`` / ``parsed.queries``.
    """
    obj = full_obj(path)
    if obj.get("detail_file") and obj.get("queries_truncated_to_slowest"):
        local = os.path.join(os.path.dirname(path) or ".", obj["detail_file"])
        if os.path.exists(local):
            return json.load(open(local))["queries"]
    if "queries" not in obj:
        raise SystemExit(f"{path}: no per-query timings (truncated artifact?)")
    return obj["queries"]


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__.strip())
        return 2
    old_path, new_path = sys.argv[1], sys.argv[2]
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5

    old = queries_of(old_path)
    new = queries_of(new_path)

    # host-speed calibration: rounds run on whatever VM they get, and hosts
    # have differed by >1.5x — print the ratio so per-query ratios are read
    # relative to it (only available when both artifacts carry `calib`)
    co = full_obj(old_path).get("calib") or {}
    cn = full_obj(new_path).get("calib") or {}
    if co.get("single_core_loop_s") and cn.get("single_core_loop_s"):
        r = cn["single_core_loop_s"] / co["single_core_loop_s"]
        print(f"host calibration: new/old single-core = {r:.2f}x "
              f"({co.get('cpu','?')} -> {cn.get('cpu','?')})")

    # MULTICORE calibration: the single-core loop (and the one-thread
    # matmul) sat at their floors through three rounds of noisy-neighbor
    # throttling while the whole 32-thread query set shifted ~1.2x — they
    # cannot see CPU steal that leaves one core untouched. mt_matmul_s is
    # bench.py's 32-thread probe of the same resource a local[32] stage
    # competes for; per-query ratios are NORMALIZED by its ratio and each
    # flag is labeled code vs host. Clamped to [0.5, 4]: a wild probe value
    # means the probe itself got descheduled, and an unbounded normalizer
    # would silently absolve (or invent) arbitrary regressions.
    host_mc = 1.0
    norm = 1.0
    mc_known = bool(co.get("mt_matmul_s") and cn.get("mt_matmul_s"))
    if mc_known:
        host_mc = cn["mt_matmul_s"] / co["mt_matmul_s"]
        host_mc = min(4.0, max(0.5, host_mc))
        # normalize only in the EXONERATING direction (new host slower):
        # dividing by host_mc < 1 would inflate the times of queries that
        # are not multicore-bound and mint phantom "code" flags on a
        # faster host — the mirror image of the throttle blindness this
        # exists to fix. A faster host keeps raw flagging and gets an
        # advisory for possibly-masked regressions instead.
        norm = max(1.0, host_mc)
        bw = ""
        if co.get("mt_membw_s") and cn.get("mt_membw_s"):
            bw = (f", 32-thread membw = "
                  f"{cn['mt_membw_s'] / co['mt_membw_s']:.2f}x")
        print(f"host calibration: new/old 32-thread matmul = {host_mc:.2f}x"
              f"{bw} — flags normalized by {norm:.2f}")
    else:
        print("host calibration: no mt_matmul_s in one/both artifacts "
              "(pre-r8 bench) — raw ratios, host-vs-code NOT adjudicable")

    # testdata fingerprint: a regeneration between runs (the cause of r4's
    # phantom simhash 3x "regression") makes per-query ratios meaningless
    to = full_obj(old_path).get("testdata")
    tn = full_obj(new_path).get("testdata")
    if to and tn:
        changed = [
            t for t in sorted(set(to) & set(tn))
            if (to[t].get("rows"), to[t].get("sha"))
            != (tn[t].get("rows"), tn[t].get("sha"))
        ]
        if changed:
            print(f"WARNING: testdata changed between runs ({', '.join(changed)}) "
                  "— per-query ratios are NOT comparable")

    shared = sorted(set(old) & set(new))
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    regressions = []
    host_flags = []
    masked = []
    for q in shared:
        o, n = old[q], new[q]
        r = n / o if o > 0 else float("inf")
        # host-normalized view: what the new time WOULD be at the old
        # host's effective 32-thread speed (exonerating direction only)
        n_adj = n / norm
        r_adj = n_adj / o if o > 0 else float("inf")
        flag = ""
        if r_adj > ratio and (n_adj - o) > 0.3:
            flag = "  <-- REGRESSION (code)"
            regressions.append(q)
        elif r > ratio and (n - o) > 0.3:
            # raw flag that the multicore normalization absorbs
            flag = "  <-- host (throttle-adjusted {:.2f}x)".format(r_adj)
            host_flags.append(q)
        elif r_adj < 1 / ratio and (o - n_adj) > 0.3:
            flag = "  (improved)"
        elif (
            mc_known and host_mc < 0.9
            and (n / host_mc) / o > ratio and (n / host_mc - o) > 0.3
        ):
            # advisory only: at the old host's slower multicore speed this
            # query WOULD flag — a faster host may be masking a code
            # regression; not a failure, but worth a look
            flag = "  (possible regression masked by faster host: {:.2f}x at old-host speed)".format((n / host_mc) / o)
            masked.append(q)
        if flag:
            print(f"{q}: {o:.2f}s -> {n:.2f}s ({r:.2f}x){flag}")
    so, sn = sum(old[q] for q in shared), sum(new[q] for q in shared)
    if shared and so > 0:
        adj = f", host-adjusted {sn / norm / so:.2f}x" if mc_known else ""
        print(f"shared {len(shared)} queries: {so:.1f}s -> {sn:.1f}s "
              f"({sn/so:.2f}x{adj})")
    else:
        print(f"shared {len(shared)} queries (no comparable total)")
    if host_flags:
        print(f"host-attributed ({len(host_flags)}): {', '.join(host_flags)}")
    if masked:
        print(f"masked-candidates ({len(masked)}): {', '.join(masked)}")
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
