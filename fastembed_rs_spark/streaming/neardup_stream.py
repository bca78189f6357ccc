"""Streaming MinHash-LSH near-duplicate detection.

The incremental form of the batch ``minhash_lsh_neardup`` pipeline
(operators/dedup.py): every arriving document is minhash-signed
row-locally, exploded into its LSH band keys, and matched against the
documents previously seen in the same band bucket via
``applyInPandasWithState`` — one state entry per active bucket.

Why this shape:

* The signature must be row-local (``minhash_signature_array``) — the
  batch explode→groupBy signature would be a second stateful operator in
  the same streaming query.
* Keying the state by ``(band_idx, band_key)`` makes the state store the
  LSH index itself: a new doc only ever compares against its own bucket's
  residents, the streaming equivalent of the batch band self-join. Band
  keys are uniform hashes → no hot state partitions.
* Match scoring uses the signature-agreement fraction (the unbiased
  estimator of Jaccard a minhash signature exists to provide) — no
  document text is kept in state, so a state row costs
  O(bucket_size · num_hashes · 8 B).

State bounding: each bucket keeps at most ``max_bucket`` resident
signatures (first-come residency — later arrivals still match against
the residents but stop being added). At production scale add a TTL
(ProcessingTimeTimeout) so cold buckets evict; residency capping already
bounds the worst case.

Emission: one row per (band, matching pair). The same pair can collide
in several bands — dedupe downstream with ``dropDuplicates(["id_a",
"id_b"])`` (bounded: ≤ bands rows per pair) or accept per-band evidence.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from fastembed_rs_spark.operators.dedup import minhash_signature_array

_OUTPUT_SCHEMA = StructType([
    StructField("band_idx", IntegerType()),
    StructField("id_a", LongType()),
    StructField("id_b", LongType()),
    StructField("est_jaccard", DoubleType()),
])

_STATE_SCHEMA = StructType([
    StructField("ids", ArrayType(LongType())),
    StructField("sigs", ArrayType(ArrayType(LongType()))),
])


def band_key_col(sig_col: str, band: int, rows_per_band: int) -> Column:
    """Band key: the band's signature slice joined into one string (same
    construction as the batch ``lsh_candidate_pairs`` band key)."""
    lo = band * rows_per_band
    return F.concat_ws(
        "_", *[F.get(F.col(sig_col), lo + r).cast("string")
               for r in range(rows_per_band)]
    )


def _make_update(num_hashes: int, threshold: float, max_bucket: int):
    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        band_idx = int(key[0])
        if state.exists:
            ids, sigs = state.get
            ids, sigs = list(ids), [list(s) for s in sigs]
        else:
            ids, sigs = [], []
        out_a, out_b, out_j = [], [], []
        for pdf in pdfs:
            # deterministic intra-batch order: by doc id
            pdf = pdf.sort_values("__id")
            for _, row in pdf.iterrows():
                new_id = int(row["__id"])
                new_sig = [int(x) for x in row["__sig"]]
                for old_id, old_sig in zip(ids, sigs):
                    if old_id == new_id:
                        continue
                    agree = sum(1 for x, y in zip(old_sig, new_sig) if x == y)
                    est = agree / num_hashes
                    if est >= threshold:
                        out_a.append(min(old_id, new_id))
                        out_b.append(max(old_id, new_id))
                        out_j.append(round(est, 6))
                if len(ids) < max_bucket:
                    ids.append(new_id)
                    sigs.append(new_sig)
        state.update((ids, sigs))
        if out_a:
            yield pd.DataFrame({
                "band_idx": band_idx, "id_a": out_a, "id_b": out_b,
                "est_jaccard": out_j,
            })

    return update


def neardup_stream(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_shingle: int = 5,
    bands: int = 4,
    rows_per_band: int = 4,
    threshold: float = 0.5,
    max_bucket: int = 64,
) -> DataFrame:
    """Near-duplicate pairs over an unbounded document stream.

    Returns (band_idx int, id_a long, id_b long, est_jaccard double) with
    id_a < id_b; ``est_jaccard`` is the signature-agreement Jaccard
    estimate (``agree / num_hashes``), emitted when ≥ ``threshold``.
    Pair with output mode ``append``.
    """
    num_hashes = bands * rows_per_band
    sig = docs.select(
        F.col(id_col).alias("__id"),
        minhash_signature_array(text_col, k_shingle, num_hashes).alias("__sig"),
    ).filter(~F.array_contains(F.transform("__sig", lambda x: x.isNull()), True))
    banded = sig.select(
        "__id", "__sig",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).cast("int").alias("band_idx"),
                band_key_col("__sig", b, rows_per_band).alias("band_key"),
            )
            for b in range(bands)
        ])).alias("__band"),
    ).select("__id", "__sig", "__band.band_idx", "__band.band_key")
    return banded.groupBy("band_idx", "band_key").applyInPandasWithState(
        _make_update(num_hashes, threshold, max_bucket),
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
