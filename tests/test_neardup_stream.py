"""Streaming MinHash-LSH near-dup: row-local signature parity with the batch
aggregation, single-batch equivalence to a batch replication of the same
bucket algorithm, and state carry across micro-batches."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def stream_dir():
    d = tempfile.mkdtemp(prefix="neardup_stream_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog!"),   # near-dup of 0
    (2, "completely different content about spark engines"),
    (3, "completely different content about spark engine"),  # near-dup of 2
    (4, "unrelated text that matches nothing else at all"),
    (5, "the quick brown fox jumps over the lazy cat"),     # near 0/1
]


def test_signature_array_matches_aggregation(spark):
    from fastembed_rs_spark.operators.dedup import (
        minhash_signature_array, minhash_signatures,
    )

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    agg = {
        r["doc_id"]: [r[f"mh_{i}"] for i in range(16)]
        for r in minhash_signatures(df, "doc_id", "text").collect()
    }
    arr = {
        r["doc_id"]: list(r["sig"])
        for r in df.select(
            "doc_id", minhash_signature_array("text").alias("sig")
        ).collect()
    }
    assert agg == arr


def _batch_expected(spark, rows, bands=4, rows_per_band=4, threshold=0.5):
    """Replicate the stream's algorithm in batch: band collision → signature
    agreement ≥ threshold, distinct over bands."""
    from fastembed_rs_spark.operators.dedup import minhash_signature_array
    from fastembed_rs_spark.streaming.neardup_stream import band_key_col

    df = spark.createDataFrame(rows, "doc_id long, text string")
    sig = df.select(
        F.col("doc_id").alias("id"),
        minhash_signature_array("text", 5, bands * rows_per_band).alias("sig"),
    )
    banded = sig.select(
        "id", "sig",
        F.explode(F.array(*[
            F.struct(F.lit(b).cast("int").alias("band_idx"),
                     band_key_col("sig", b, rows_per_band).alias("band_key"))
            for b in range(bands)
        ])).alias("bb"),
    ).select("id", "sig", "bb.band_idx", "bb.band_key")
    j = banded.alias("l").join(
        banded.alias("r"),
        (F.col("l.band_idx") == F.col("r.band_idx"))
        & (F.col("l.band_key") == F.col("r.band_key"))
        & (F.col("l.id") < F.col("r.id")),
    ).select(
        F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"),
        (F.size(F.filter(F.zip_with("l.sig", "r.sig", lambda x, y: x == y),
                         lambda v: v)) / (bands * rows_per_band)).alias("est"),
    ).filter(F.col("est") >= threshold).select("id_a", "id_b").distinct()
    return {(r["id_a"], r["id_b"]) for r in j.collect()}


def test_neardup_stream_single_batch_matches_batch_replication(spark, stream_dir):
    from fastembed_rs_spark.streaming.neardup_stream import neardup_stream

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    df.coalesce(1).write.mode("overwrite").parquet(stream_dir + "/docs")

    src = spark.readStream.schema(df.schema).parquet(stream_dir + "/docs")
    q = (
        neardup_stream(src).writeStream.format("memory")
        .queryName("neardup_out").outputMode("append")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    q.stop()
    got = {
        (r["id_a"], r["id_b"])
        for r in spark.sql("select distinct id_a, id_b from neardup_out").collect()
    }
    expected = _batch_expected(spark, DOCS)
    assert got == expected
    assert (0, 1) in got  # the engineered near-dup must surface


def test_neardup_stream_state_carries_across_batches(spark, stream_dir):
    """A near-dup arriving in micro-batch 2 must match the batch-1 resident."""
    from fastembed_rs_spark.streaming.neardup_stream import neardup_stream

    schema = "doc_id long, text string"
    b1 = spark.createDataFrame([DOCS[0], DOCS[2], DOCS[4]], schema)
    b2 = spark.createDataFrame([DOCS[1], DOCS[3]], schema)
    b1.coalesce(1).write.mode("overwrite").parquet(stream_dir + "/docs")

    src = spark.readStream.schema(b1.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(stream_dir + "/docs")
    q = (
        neardup_stream(src).writeStream.format("memory")
        .queryName("neardup_cross").outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        n_after_b1 = spark.sql("select count(*) c from neardup_cross").first()["c"]
        b2.coalesce(1).write.mode("append").parquet(stream_dir + "/docs")
        q.processAllAvailable()
        got = {
            (r["id_a"], r["id_b"])
            for r in spark.sql(
                "select distinct id_a, id_b from neardup_cross"
            ).collect()
        }
    finally:
        q.stop()
    assert n_after_b1 == 0  # batch 1 has no near-dups among residents
    assert (0, 1) in got and (2, 3) in got


def test_neardup_stream_bucket_cap(spark, stream_dir):
    """Residency capping: with max_bucket=1 only the first resident per
    bucket is retained, but later arrivals still match against it."""
    from fastembed_rs_spark.streaming.neardup_stream import neardup_stream

    rows = [DOCS[0], DOCS[1], DOCS[5]]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.coalesce(1).write.mode("overwrite").parquet(stream_dir + "/docs")
    src = spark.readStream.schema(df.schema).parquet(stream_dir + "/docs")
    q = (
        neardup_stream(src, max_bucket=1, threshold=0.25)
        .writeStream.format("memory").queryName("neardup_cap")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    q.stop()
    got = {
        (r["id_a"], r["id_b"])
        for r in spark.sql("select distinct id_a, id_b from neardup_cap").collect()
    }
    # doc 0 is the sole resident of its buckets; 1 and 5 compare against it
    # but never against each other (1 was not admitted)
    assert all(a == 0 for a, _ in got)


def test_minhash_coeffs_extend_beyond_pinned_16(spark):
    from fastembed_rs_spark.operators.dedup import (
        HASH_MOD, MINHASH_COEFFS, minhash_coeffs, minhash_signature_array,
    )

    cfs = minhash_coeffs(40)
    assert cfs[:16] == MINHASH_COEFFS  # pinned prefix untouched
    assert len(cfs) == 40
    assert len(set(cfs)) == 40
    for a, b in cfs:
        assert 1 <= a < HASH_MOD and 0 <= b < HASH_MOD
    assert minhash_coeffs(40) == cfs  # deterministic

    # bands*rows_per_band > 16 now yields a full-width, NULL-free signature
    # whose first 16 slots match the pinned coefficients (regression for the
    # silent [:16] truncation that collapsed higher band keys)
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = df.select(
        "doc_id",
        minhash_signature_array("text", 5, 16).alias("s16"),
        minhash_signature_array("text", 5, 32).alias("s32"),
    ).collect()
    for r in rows:
        assert len(r["s32"]) == 32
        assert all(v is not None for v in r["s32"])
        assert list(r["s32"][:16]) == list(r["s16"])


def test_neardup_stream_wide_signature_matches_batch_replication(spark, stream_dir):
    """bands*rows_per_band = 32 > the 16 pinned coefficients — the exact
    configuration that silently truncated before minhash_coeffs extended
    the pairs (higher bands all shared an empty key and est_jaccard used a
    16-hash denominator). Stream output must now equal the 32-hash batch
    replication."""
    from fastembed_rs_spark.streaming.neardup_stream import neardup_stream

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    df.coalesce(1).write.mode("overwrite").parquet(stream_dir + "/docs")

    src = spark.readStream.schema(df.schema).parquet(stream_dir + "/docs")
    q = (
        neardup_stream(src, bands=8, rows_per_band=4, threshold=0.5)
        .writeStream.format("memory")
        .queryName("neardup_wide").outputMode("append")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    q.stop()
    got = {
        (r["id_a"], r["id_b"])
        for r in spark.sql("select distinct id_a, id_b from neardup_wide").collect()
    }
    expected = _batch_expected(spark, DOCS, bands=8, rows_per_band=4, threshold=0.5)
    assert got == expected
    assert (0, 1) in got
    # est_jaccard uses the full 32-hash denominator: all estimates in (0, 1]
    ests = [r["est_jaccard"] for r in spark.sql(
        "select est_jaccard from neardup_wide").collect()]
    assert ests and all(0.0 < e <= 1.0 for e in ests)
