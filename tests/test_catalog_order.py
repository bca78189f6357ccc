"""Catalog ordering + driver-contract invariants.

The driver's correctness gate only covers the first ~50 entries of
``__spark_entry__.queries()`` per round, so ``all_queries()`` ordering is
the coverage lever (VERDICT.md r3 §"What's wrong" 1). Rotation is
AUTOMATIC: never-driver-checked queries order first, then ascending by
the last round that checked them (from the committed CORRECTNESS_r*.json
artifacts), with the static ``_DRIVER_PRIORITY`` snapshot as the
no-artifacts fallback. These tests pin the rotation law, the fallback,
catalog preservation, and the ``__spark_entry__`` adapters.
"""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _checked_rounds() -> dict[str, int]:
    """Mirror of queries._last_driver_round: last round per query, with a
    query whose LATEST row is red (failed match or non-no_oracle error)
    keyed as -1 so it re-enters the driver window right after its fix."""
    import re

    last: dict[str, int] = {}
    latest: dict[str, tuple[int, dict]] = {}
    for fn in os.listdir(REPO):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", fn)
        if m:
            rnd = int(m.group(1))
            for name, row in json.load(open(os.path.join(REPO, fn))).items():
                last[name] = max(last.get(name, -2), rnd)
                if name not in latest or rnd > latest[name][0]:
                    latest[name] = (rnd, row if isinstance(row, dict) else {})
    for name, (_, row) in latest.items():
        err = row.get("err")
        if (err is not None and err != "no_oracle") or any(
            row.get(k) is False
            for k in ("rows_match", "schema_match", "hash_match")
        ):
            last[name] = -1
    return last


def test_rotation_orders_least_recently_checked_first():
    from fastembed_rs_spark.queries import all_queries

    from fastembed_rs_spark.queries import _CHANGED_THIS_ROUND

    last = _checked_rounds()
    names = list(all_queries().keys())
    if not last:  # fresh clone: fallback covered by the test below
        return
    # changed-this-round queries jump the queue (key -3): the driver must
    # re-verify an edited query/oracle in the same round it changed
    for n in _CHANGED_THIS_ROUND:
        last[n] = -3
    seen_rounds = [last.get(n, -2) for n in names]
    # the rotation law: rotation keys are non-decreasing down the dict
    # (-3 changed-this-round, -2 never-checked, -1 red-in-latest-row,
    # else last-checked round)
    assert seen_rounds == sorted(seen_rounds)
    # and every changed/never-checked query precedes every checked one
    if -2 in seen_rounds:
        first_checked = next(i for i, r in enumerate(seen_rounds) if r >= -1)
        assert all(r in (-3, -2) for r in seen_rounds[:first_checked])


def test_fallback_uses_static_priority(monkeypatch):
    import fastembed_rs_spark.queries as Q

    monkeypatch.setattr(Q, "_last_driver_round", lambda: {})
    names = list(Q.all_queries().keys())
    assert names[: len(Q._DRIVER_PRIORITY)] == Q._DRIVER_PRIORITY


def test_priority_snapshot_names_resolve():
    from fastembed_rs_spark.queries import _DRIVER_PRIORITY, QUERIES

    missing = [n for n in _DRIVER_PRIORITY if n not in QUERIES]
    assert not missing, f"_DRIVER_PRIORITY has stale names: {missing}"
    assert len(set(_DRIVER_PRIORITY)) == len(_DRIVER_PRIORITY)


def test_priority_snapshot_covers_never_checked():
    """The fallback snapshot must include every query with no driver row in
    any committed artifact — otherwise a fresh clone would push exactly the
    never-verified queries out of the driver's window."""
    from fastembed_rs_spark.queries import _DRIVER_PRIORITY, QUERIES

    last = _checked_rounds()
    never = [n for n in QUERIES if n not in last]
    missing = [n for n in never if n not in _DRIVER_PRIORITY]
    assert not missing, f"add to _DRIVER_PRIORITY: {missing}"


def test_reorder_preserves_catalog():
    from fastembed_rs_spark.queries import QUERIES, all_queries

    ordered = all_queries()
    assert set(ordered) == set(QUERIES)
    assert len(ordered) == len(QUERIES)
    for name, spec in ordered.items():
        assert spec is QUERIES[name]


def test_bench_headline_covers_full_catalog():
    """Every catalog query is benched (and bench never names a dead query),
    so a new operator can't silently skip the perf feedback loop."""
    import bench
    from fastembed_rs_spark.queries import all_queries

    assert set(bench.HEADLINE) == set(all_queries())
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))


def test_entry_adapters_match_catalog():
    import __spark_entry__ as entry_mod
    from fastembed_rs_spark.queries import all_queries

    catalog = all_queries()
    qs = entry_mod.queries()
    assert list(qs.keys()) == list(catalog.keys())
    oracles = entry_mod.oracle_sql()
    assert set(oracles) == {n for n, s in catalog.items() if s.oracle is not None}
    for sql in oracles.values():
        assert isinstance(sql, str) and sql.strip()


def test_plans_md_covers_full_catalog():
    """PLANS.md (regenerated by tools/dump_plans.py) must have one plan
    header per catalog query — a new query without a committed plan dump
    is invisible to the design-for-scale review (r9 judge finding)."""
    import os

    from fastembed_rs_spark.queries import all_queries

    path = os.path.join(os.path.dirname(__file__), "..", "PLANS.md")
    with open(path) as f:
        headers = {ln[3:].strip() for ln in f if ln.startswith("## ")}
    assert headers == set(all_queries()), (
        f"PLANS.md out of date — rerun tools/dump_plans.py; "
        f"missing={sorted(set(all_queries()) - headers)} "
        f"stale={sorted(headers - set(all_queries()))}"
    )
