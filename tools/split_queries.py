"""One-shot refactoring script: split the monolithic queries.py into the
queries/ package (per-family modules re-exported through __init__.py).

Mechanics: top-level statements are assigned to contiguous line-range
modules (so @q registration order is preserved exactly by sequential
imports), each module gets an explicit generated import prelude for every
name it uses that an earlier module defines, and __init__.py re-exports
every top-level name of every module so ALL existing imports — public and
the tests' private-helper imports — keep working unchanged.

Safety analysis before writing anything:
- refuses on any top-level name defined in two modules (cross-module
  shadowing would silently change runtime resolution), and
- refuses on any forward reference (a module using a name only a LATER
  module defines).

Checked in for the record; not imported by anything.
"""

from __future__ import annotations

import ast
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(REPO, "fastembed_rs_spark", "queries.py")
PKG = os.path.join(REPO, "fastembed_rs_spark", "queries")

# (module_name, first_source_line).  The tail (rotation logic) goes into
# __init__.py.  Boundaries sit on section comments between top-level
# statements; verified below.
CUTS = [
    ("_core", 1),
    ("similarity", 154),          # §1 dense similarity + trained PQ
    ("relational", 1087),         # §6 relational glue + §6b coverage
    ("model_stubs", 1788),        # §7 model-runtime (rows-only) queries
    ("timeseries_sketches", 2101),  # §8 asof/range joins, LSH, BM25, sketches + §9 quantized
    ("relational_events", 2857),  # §10 more relational/events (r2)
    ("curation", 3584),           # r3 curation + r4 relational shapes
    ("lm_tokenizer", 5349),       # tokenizer training / LM scoring / shuffling
    ("graph_mining", 6844),       # graph + mining + split/leakage ops
    ("monitoring", 8440),         # eval/calibration + warehouse monitors
    ("tpch_synth", 10372),        # synthesized-partsupp TPC-H shapes + spectrum
    ("__tail__", None),           # _fill_sketch_oracles + rotation -> __init__
]

MODULE_DOC = {
    "similarity": "Dense similarity family: brute-force / IVF / PQ top-k "
    "(SURVEY §2.1 rows 14-16) plus the SQL-analogue hash embedders, rerank "
    "and the first dedup/text-analysis queries.",
    "relational": "Relational engine glue: TPC-H-style joins, aggregates, "
    "windows, sessionization, plus near-dup and text coverage (§6/§6b).",
    "model_stubs": "Model-runtime queries (pandas-UDF inference path; "
    "rows-only driver check) — dense/sparse/BGE-M3/image/VL stubs.",
    "timeseries_sketches": "Time-series joins (as-of / range), LSH ANN, "
    "BM25, distinct sketches (KMV/HLL/CMS) and quantized vector search.",
    "relational_events": "More relational / events coverage: rollups, "
    "cubes, bloom semi-joins, JSON props, chunking, RAG passages.",
    "curation": "Training-data curation: LM quality, decontamination, PII, "
    "MMR, DSIR, packing, funnels, plus round-4 relational shapes.",
    "lm_tokenizer": "Tokenizer training (BPE merge/apply), LM scoring, "
    "epoch shuffling, splits, winsorize, RQ codebooks, skew report.",
    "graph_mining": "Graph algorithms (pagerank, triangles, k-core, label "
    "propagation) and mining ops (medoids, triples, margins, reciprocal NN).",
    "monitoring": "Eval / calibration / warehouse monitoring: recall evals, "
    "sweeps, drift, contamination, profiles, shard planning.",
    "tpch_synth": "TPC-H shapes over the synthesized partsupp/shipmode "
    "world (Q2/Q9/Q11/Q12/Q16/Q20/Q21) and the embedding spectrum monitor.",
}


def stmt_span(node: ast.stmt) -> tuple[int, int]:
    start = node.lineno
    for dec in getattr(node, "decorator_list", []):
        start = min(start, dec.lineno)
    return start, node.end_lineno


def defined_names(node: ast.stmt) -> set[str]:
    out: set[str] = set()
    if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
        out.add(node.name)
    elif isinstance(node, ast.Assign):
        for tgt in node.targets:
            for n in ast.walk(tgt):
                if isinstance(n, ast.Name):
                    out.add(n.id)
    elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
        out.add(node.target.id)
    elif isinstance(node, (ast.Import, ast.ImportFrom)):
        for alias in node.names:
            out.add((alias.asname or alias.name).split(".")[0])
    return out


def used_names(node: ast.stmt) -> set[str]:
    return {
        n.id for n in ast.walk(node)
        if isinstance(n, ast.Name) and isinstance(n.ctx, ast.Load)
    }


def main() -> int:
    src = open(SRC).read()
    lines = src.splitlines(keepends=True)
    tree = ast.parse(src)
    spans = [stmt_span(s) for s in tree.body]

    # locate the tail start: def _fill_sketch_oracles
    tail_start = None
    for s in tree.body:
        if isinstance(s, ast.FunctionDef) and s.name == "_fill_sketch_oracles":
            tail_start = stmt_span(s)[0]
    assert tail_start, "tail anchor not found"
    cuts = [(n, (l if l is not None else tail_start)) for n, l in CUTS]

    # every cut must fall between top-level statements
    for name, cut in cuts:
        for a, b in spans:
            assert not (a < cut <= b), f"cut {name}@{cut} splits stmt {a}-{b}"

    # assign statements to modules
    mod_of: list[str] = []
    for s in tree.body:
        a, _ = stmt_span(s)
        owner = cuts[0][0]
        for name, cut in cuts:
            if a >= cut:
                owner = name
        mod_of.append(owner)

    order = [n for n, _ in cuts]
    defined: dict[str, set[str]] = {n: set() for n in order}
    used: dict[str, set[str]] = {n: set() for n in order}
    for s, owner in zip(tree.body, mod_of):
        defined[owner] |= defined_names(s)
        used[owner] |= used_names(s)

    # safety: duplicates and forward refs
    seen: dict[str, str] = {}
    dups = []
    for m in order:
        for nm in defined[m]:
            if nm in seen:
                dups.append((nm, seen[nm], m))
            seen[nm] = m
    if dups:
        print("DUPLICATE top-level names (would change shadowing):")
        for nm, a, b in dups:
            print(f"  {nm}: {a} and {b}")
        return 1
    fwd = []
    for i, m in enumerate(order):
        later = set().union(*(defined[n] for n in order[i + 1:])) if i + 1 < len(order) else set()
        for nm in used[m] & later - defined[m]:
            # only a problem if no earlier module defines it either
            earlier = set().union(*(defined[n] for n in order[:i]))
            if nm not in earlier:
                fwd.append((m, nm))
    if fwd:
        print("FORWARD references (use before defining module):")
        for m, nm in fwd:
            print(f"  {m} uses {nm}")
        return 1

    os.makedirs(PKG, exist_ok=True)

    # per-module source slices (contiguous, comments preserved)
    bounds = [cut for _, cut in cuts] + [len(lines) + 1]
    for i, m in enumerate(order):
        a, b = bounds[i], bounds[i + 1]
        body = "".join(lines[a - 1:b - 1])
        if m == "_core":
            open(os.path.join(PKG, "_core.py"), "w").write(body)
            continue
        earlier = order[:i]
        need: dict[str, list[str]] = {}
        for nm in sorted(used[m] - defined[m]):
            for e in reversed(earlier):  # latest earlier definer wins
                if nm in defined[e]:
                    need.setdefault(e, []).append(nm)
                    break
        prelude = ["from __future__ import annotations\n\n"]
        for e in order:
            if e in need:
                names = ", ".join(sorted(need[e]))
                line = f"from fastembed_rs_spark.queries.{e} import {names}\n"
                if len(line) > 79:
                    line = (
                        f"from fastembed_rs_spark.queries.{e} import (\n    "
                        + ",\n    ".join(sorted(need[e]))
                        + ",\n)\n"
                    )
                prelude.append(line)
        fname = "__init__.py" if m == "__tail__" else f"{m}.py"
        if m == "__tail__":
            continue  # handled below
        doc = MODULE_DOC.get(m, "")
        header = f'"""{doc}\n\nSplit out of the monolithic queries.py (r8); registration order is\npreserved by the sequential imports in queries/__init__.py.\n"""\n\n'
        open(os.path.join(PKG, fname), "w").write(header + "".join(prelude) + "\n" + body)

    # __init__.py: original module docstring + family imports in order +
    # full re-export of every top-level name + the tail source
    i_tail = order.index("__tail__")
    a, b = bounds[i_tail], bounds[i_tail + 1]
    tail_body = "".join(lines[a - 1:b - 1])
    # package __init__ is one level deeper than the old queries.py: the
    # repo root is THREE dirnames up, not two
    tail_body = tail_body.replace(
        "os.path.dirname(os.path.dirname(os.path.abspath(__file__)))",
        "os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))",
    )
    docstring = ast.get_docstring(tree)
    fams = [m for m in order if m not in ("__tail__",)]
    out = ['"""' + docstring + '\n"""\n\n', "from __future__ import annotations\n\nimport os\n\n"]
    out.append(
        "# Family modules in REGISTRATION ORDER — importing each module runs\n"
        "# its @q decorators against the shared QUERIES registry in _core, so\n"
        "# this import sequence IS the catalog order (ties in the rotation\n"
        "# sort keep it). Every top-level name is then re-exported so all\n"
        "# pre-split imports (`from fastembed_rs_spark.queries import X`,\n"
        "# including the tests' private helpers) resolve unchanged.\n"
    )
    for m in fams:
        exports = sorted(defined[m])
        if not exports:
            continue
        out.append(
            f"from fastembed_rs_spark.queries.{m} import (  # noqa: F401\n    "
            + ",\n    ".join(exports)
            + ",\n)\n"
        )
    # tail needs from its own analysis too (names used by tail defined in fams)
    need_tail: dict[str, list[str]] = {}
    for nm in sorted(used["__tail__"] - defined["__tail__"]):
        for e in reversed(fams):
            if nm in defined[e]:
                need_tail.setdefault(e, []).append(nm)
                break
    # (already imported above via the re-export block — no extra imports)
    out.append("\n\n" + tail_body)
    open(os.path.join(PKG, "__init__.py"), "w").write("".join(out))

    os.remove(SRC)
    print("split OK:", ", ".join(order))
    for m in order:
        f = os.path.join(PKG, "__init__.py" if m == "__tail__" else f"{m}.py")
        print(f"  {f.split('/')[-1]}: {sum(1 for _ in open(f))} lines")
    return 0


if __name__ == "__main__":
    sys.exit(main())
