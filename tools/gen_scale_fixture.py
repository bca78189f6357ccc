#!/usr/bin/env python
"""Generate a local ~10x sf0.1 ("sf1") documents + embeddings fixture for
the scale-proof run (VERDICT r5 "Next round" #9) — the first evidence
point beyond the driver's sf0.1 that the dedup/ANN scaling curves hold.

The driver testdata is read-only and tops out at sf0.1 (5k docs / 2k
vectors), so this synthesizes 50k docs / 20k vectors into
``.localdata/sf1/`` (gitignored) by replicating each sf0.1 row 10x with
deterministic perturbation:

* documents: copy 0 is verbatim (preserving the corpus's exact-dup
  fraction); copies 1..9 get one token swapped per ~25 tokens and a
  copy-tag token appended — every replica family is a NEAR-dup cluster,
  so near-dedup work (the thing being scale-tested) grows with the data
  instead of degenerating to all-exact-dups or all-unrelated.
* embeddings: copy 0 verbatim; copies 1..9 are renormalized
  ``e + 0.05 * unit_noise`` (seeded per vec_id) — neighbor structure
  persists across copies, zero vectors stay zero (the cosine guard row).

Usage: python tools/gen_scale_fixture.py  (writes ~40 MB, a few seconds)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   ".localdata", "sf1")
COPIES = 10


def gen_documents() -> None:
    t = pq.read_table(f"{SRC}/documents.parquet").to_pandas()
    n = len(t)
    rng = np.random.default_rng(42)
    out = {c: [] for c in ("doc_id", "text", "lang", "source", "n_chars")}
    for k in range(COPIES):
        for row in t.itertuples(index=False):
            text = row.text
            if k > 0 and text:
                toks = text.split(" ")
                # one deterministic swap per ~25 tokens + a copy tag
                for j in range(0, len(toks), 25):
                    toks[(j + k) % len(toks)] = f"cp{k}tok{j}"
                toks.append(f"copytag{k}")
                text = " ".join(toks)
            out["doc_id"].append(row.doc_id + n * k)
            out["text"].append(text)
            out["lang"].append(row.lang)
            out["source"].append(row.source)
            out["n_chars"].append(len(text))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(out["doc_id"], pa.int64()),
                "text": pa.array(out["text"], pa.string()),
                "lang": pa.array(out["lang"], pa.string()),
                "source": pa.array(out["source"], pa.string()),
                "n_chars": pa.array(out["n_chars"], pa.int64()),
            }
        ),
        f"{DST}/documents.parquet",
    )
    _ = rng  # seeded API kept symmetrical with embeddings


def gen_embeddings() -> None:
    t = pq.read_table(f"{SRC}/embeddings.parquet").to_pandas()
    n = len(t)
    dim = len(t.embedding.iloc[0])
    V = np.stack(t.embedding.to_numpy()).astype(np.float64)
    ids, vecs, labels = [], [], []
    for k in range(COPIES):
        if k == 0:
            P = V
        else:
            rng = np.random.default_rng(1000 + k)
            noise = rng.standard_normal((n, dim))
            noise /= np.linalg.norm(noise, axis=1, keepdims=True)
            P = V + 0.05 * noise
            norms = np.linalg.norm(P, axis=1, keepdims=True)
            # zero source vectors stay zero (guard row); others renormalize
            zero = np.linalg.norm(V, axis=1) == 0.0
            P = np.where(zero[:, None], 0.0, P / np.where(norms == 0, 1, norms))
        ids.extend((t.vec_id.to_numpy() + n * k).tolist())
        vecs.extend(P.astype(np.float32).tolist())
        labels.extend(t.label.tolist())
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
                "label": pa.array(labels, pa.int32()),
            }
        ),
        f"{DST}/embeddings.parquet",
    )


def gen_lineitem() -> None:
    """10 disjoint copies of the co-purchase graph: every copy offsets
    BOTH l_orderkey and l_partkey past the original key ranges, so each
    copy contributes an isomorphic, node-disjoint replica of the basket
    graph — 10x edges, 10x components, identical degree distribution
    (the honest way to scale graph queries: replicating rows verbatim
    would only multiply each pair's support, leaving the graph
    unchanged, and replicating only orders would densify it). Columns
    other than the two keys are copied verbatim (graph queries read only
    the keys; the full schema keeps the sf1 table read-compatible)."""
    t = pq.read_table(f"{SRC}/lineitem.parquet")
    okey = t.column("l_orderkey").to_numpy()
    pkey = t.column("l_partkey").to_numpy()
    o_span = int(okey.max()) + 1
    p_span = int(pkey.max()) + 1
    chunks = []
    for k in range(COPIES):
        c = t.set_column(
            t.schema.get_field_index("l_orderkey"), "l_orderkey",
            pa.array(okey + o_span * k, pa.int64()),
        )
        c = c.set_column(
            c.schema.get_field_index("l_partkey"), "l_partkey",
            pa.array(pkey + p_span * k, pa.int64()),
        )
        chunks.append(c)
    pq.write_table(pa.concat_tables(chunks), f"{DST}/lineitem.parquet")


def main() -> int:
    os.makedirs(DST, exist_ok=True)
    gen_documents()
    gen_embeddings()
    gen_lineitem()
    for f in ("documents", "embeddings", "lineitem"):
        p = f"{DST}/{f}.parquet"
        print(f"{p}: {pq.read_metadata(p).num_rows} rows, "
              f"{os.path.getsize(p) / 1e6:.1f} MB")
    return 0


if __name__ == "__main__":
    sys.exit(main())
