"""Structured Streaming pipelines driven end-to-end with the in-memory sink:
a real streaming query runs (micro-batch engine, state store, watermark) and
its output is compared against the equivalent batch computation."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType, TimestampType,
)

from fastembed_rs_spark.streaming import (
    embed_stream,
    sessionize_stream,
    windowed_event_counts,
)


@pytest.fixture()
def stream_dir(spark):
    d = tempfile.mkdtemp(prefix="stream_src_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _run_to_memory(stream, name):
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append" if name == "embeds" else "complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


EVENT_SCHEMA = StructType([
    StructField("event_id", LongType()),
    StructField("user_id", LongType()),
    StructField("ts", TimestampType()),
    StructField("event_type", StringType()),
    StructField("value", LongType()),
])


def _write_events(spark, path):
    rows = [
        (1, 1, "2024-01-01 00:00:00", "click", 1),
        (2, 1, "2024-01-01 00:10:00", "click", 2),
        (3, 1, "2024-01-01 00:50:00", "view", 3),   # same hour, new session? gap 40m>30m
        (4, 2, "2024-01-01 01:05:00", "click", 4),
        (5, 2, "2024-01-01 01:10:00", "view", 5),
    ]
    df = spark.createDataFrame(
        [(e, u, t, ty, v) for e, u, t, ty, v in rows],
        ["event_id", "user_id", "ts_s", "event_type", "value"],
    ).select(
        "event_id", "user_id",
        F.to_timestamp("ts_s").alias("ts"), "event_type", "value",
    )
    df.coalesce(1).write.mode("overwrite").parquet(path)


def test_windowed_event_counts_stream_matches_batch(spark, stream_dir):
    _write_events(spark, stream_dir)
    src = spark.readStream.schema(EVENT_SCHEMA).parquet(stream_dir)
    q = _run_to_memory(windowed_event_counts(src, window="1 hour"), "win_counts")
    got = {
        (str(r["window_start"]), r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    q.stop()
    assert got[("2024-01-01 00:00:00", "click")] == (2, 3)
    assert got[("2024-01-01 00:00:00", "view")] == (1, 3)
    assert got[("2024-01-01 01:00:00", "click")] == (1, 4)
    assert got[("2024-01-01 01:00:00", "view")] == (1, 5)


def test_sessionize_stream(spark, stream_dir):
    _write_events(spark, stream_dir)
    src = spark.readStream.schema(EVENT_SCHEMA).parquet(stream_dir)
    q = _run_to_memory(sessionize_stream(src, gap="30 minutes"), "sessions")
    rows = spark.sql("SELECT * FROM sessions").collect()
    q.stop()
    got = {(r["user_id"], str(r["session_start"])): r["n_events"] for r in rows}
    # user 1: events at 00:00/00:10 merge (gap<30m), 00:50 starts a new session
    assert got[(1, "2024-01-01 00:00:00")] == 2
    assert got[(1, "2024-01-01 00:50:00")] == 1
    assert got[(2, "2024-01-01 01:05:00")] == 2


def test_embed_stream_matches_batch(spark, stream_dir):
    texts = [(i, t) for i, t in enumerate(
        ["streaming doc one", "another streaming document", "third", ""]
    )]
    spark.createDataFrame(texts, ["doc_id", "text"]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(stream_dir)
    schema = StructType([
        StructField("doc_id", LongType()), StructField("text", StringType()),
    ])
    src = spark.readStream.schema(schema).parquet(stream_dir)
    q = _run_to_memory(embed_stream(src), "embeds")
    stream_rows = {
        r["doc_id"]: list(r["embedding"])
        for r in spark.sql("SELECT * FROM embeds").collect()
    }
    q.stop()
    from fastembed_rs_spark.operators.embed import embed_text

    batch_rows = {
        r["doc_id"]: list(r["embedding"])
        for r in embed_text(
            spark.read.parquet(stream_dir), "text"
        ).collect()
    }
    assert stream_rows == batch_rows  # micro-batch == batch, bit-for-bit


def test_dedup_stream(spark, stream_dir):
    from fastembed_rs_spark.streaming import dedup_stream

    rows = [
        (0, "the same document text", "2024-01-01 00:00:00"),
        (1, "THE SAME   document, text!", "2024-01-01 00:01:00"),  # dup fingerprint
        (2, "a different document", "2024-01-01 00:02:00"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "ts_s"]).select(
        "doc_id", "text", F.to_timestamp("ts_s").alias("ts")
    )
    df.coalesce(1).write.mode("overwrite").parquet(stream_dir)
    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("ts", TimestampType()),
    ])
    src = spark.readStream.schema(schema).parquet(stream_dir)
    q = (
        dedup_stream(src, "text", "ts", watermark="1 hour")
        .writeStream.format("memory").queryName("dedup_out")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT doc_id FROM dedup_out").collect()
    q.stop()
    ids = sorted(r["doc_id"] for r in out)
    assert len(ids) == 2 and 2 in ids and (0 in ids or 1 in ids)


def test_embed_to_parquet_stream_resumes(spark, stream_dir):
    import os
    from fastembed_rs_spark.streaming import embed_to_parquet_stream

    src_dir = os.path.join(stream_dir, "src")
    out_dir = os.path.join(stream_dir, "out")
    ckpt = os.path.join(stream_dir, "ckpt")
    schema = StructType([
        StructField("doc_id", LongType()), StructField("text", StringType()),
    ])
    spark.createDataFrame([(0, "first doc"), (1, "second doc")], schema) \
        .coalesce(1).write.mode("append").parquet(src_dir)
    stream = spark.readStream.schema(schema).parquet(src_dir)
    q = embed_to_parquet_stream(stream, out_dir, ckpt)
    q.awaitTermination(120); q.stop()
    assert spark.read.parquet(out_dir).count() == 2

    # new files arrive; a RESTARTED query embeds only them (offsets in ckpt)
    spark.createDataFrame([(2, "third doc")], schema) \
        .coalesce(1).write.mode("append").parquet(src_dir)
    stream2 = spark.readStream.schema(schema).parquet(src_dir)
    q2 = embed_to_parquet_stream(stream2, out_dir, ckpt)
    q2.awaitTermination(120); q2.stop()
    back = spark.read.parquet(out_dir)
    assert back.count() == 3  # 2 + 1, no re-embedding of the first batch
    assert sorted(r["doc_id"] for r in back.select("doc_id").collect()) == [0, 1, 2]


def test_asof_stream_single_batch_matches_batch_operator(spark, stream_dir):
    """One micro-batch == the batch asof_join bit-for-bit."""
    import random

    from fastembed_rs_spark.operators.asof import asof_join
    from fastembed_rs_spark.streaming.asof_stream import asof_stream

    rng = random.Random(41)
    rows = [
        (i, rng.randrange(5), rng.randrange(0, 100_000),
         "view" if rng.random() < 0.5 else "click", float(i))
        for i in range(400)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts long, event_type string, value double"
    )
    df.coalesce(1).write.mode("overwrite").parquet(stream_dir + "/ev")

    src = spark.readStream.schema(df.schema).parquet(stream_dir + "/ev")
    got_q = asof_stream(
        src.filter(F.col("event_type") == "click"),
        src.filter(F.col("event_type") == "view"),
    )
    q = (
        got_q.writeStream.format("memory").queryName("asof_out")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    q.stop()
    got = {
        r.event_id: (r.matched_event_id, r.matched_ts, r.matched_value)
        for r in spark.sql("select * from asof_out").collect()
    }

    batch = asof_join(
        df.filter(F.col("event_type") == "click"),
        df.filter(F.col("event_type") == "view"),
        on="user_id", left_ts="ts", right_ts="ts",
        payload_cols=["event_id", "value"],
    ).collect()
    expected = {
        r.event_id: (r.matched.event_id, r.matched_ts, r.matched.value)
        for r in batch
    }
    assert got == expected
    assert len(got) == sum(1 for r in rows if r[3] == "click")


def test_asof_stream_state_survives_restart(spark, stream_dir):
    """The per-key last-right-row STATE (not just source offsets) must come
    back from the checkpoint: a view ingested before the kill must match a
    click that arrives only after the restart. An offsets-only recovery
    would re-emit nothing (the view's file is already committed) and the
    click would find empty state -> no match."""
    from fastembed_rs_spark.streaming.asof_stream import asof_stream

    schema = "event_id long, user_id long, ts long, event_type string, value double"
    ckpt = stream_dir + "/ckpt"
    out = stream_dir + "/out"

    def run():
        # memory sink refuses checkpoint recovery; foreachBatch->parquet is
        # the fault-tolerant sink a real pipeline uses
        src = spark.readStream.schema(schema).parquet(stream_dir + "/ev")
        q = (
            asof_stream(
                src.filter(F.col("event_type") == "click"),
                src.filter(F.col("event_type") == "view"),
            )
            .writeStream.foreachBatch(
                lambda df, _bid: df.write.mode("append").parquet(out)
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        q.stop()

    spark.createDataFrame([(1, 7, 100, "view", 1.5)], schema) \
        .coalesce(1).write.mode("overwrite").parquet(stream_dir + "/ev")
    run()  # ingests the view into state; no clicks yet

    spark.createDataFrame([(2, 7, 200, "click", 0.0)], schema) \
        .coalesce(1).write.mode("append").parquet(stream_dir + "/ev")
    run()  # RESTART: click must match the pre-kill view

    rows = spark.read.parquet(out).collect()
    assert len(rows) == 1
    assert rows[0].matched_event_id == 1 and rows[0].matched_ts == 100


def test_asof_stream_state_carries_across_batches(spark, stream_dir):
    """A right event in batch 1 matches left events in batch 2."""
    from fastembed_rs_spark.streaming.asof_stream import asof_stream

    schema = "event_id long, user_id long, ts long, event_type string, value double"
    b1 = spark.createDataFrame([(1, 7, 100, "view", 1.5)], schema)
    b2 = spark.createDataFrame([(2, 7, 200, "click", 0.0)], schema)
    b1.coalesce(1).write.mode("overwrite").parquet(stream_dir + "/ev")

    src = spark.readStream.schema(b1.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(stream_dir + "/ev")
    q = (
        asof_stream(
            src.filter(F.col("event_type") == "click"),
            src.filter(F.col("event_type") == "view"),
        )
        .writeStream.format("memory").queryName("asof_cross")
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        b2.coalesce(1).write.mode("append").parquet(stream_dir + "/ev")
        q.processAllAvailable()
        rows = spark.sql("select * from asof_cross").collect()
    finally:
        q.stop()
    assert len(rows) == 1
    assert rows[0].matched_event_id == 1 and rows[0].matched_ts == 100


def test_windowed_hll_stream_matches_batch_sketch(spark, stream_dir):
    """Streamed per-window registers, finalized, == batch hll_sketch run
    window-by-window over the same rows (bit-identical estimates)."""
    import random

    from fastembed_rs_spark.functions.text import token_hash
    from fastembed_rs_spark.operators.sketch import hll_finalize, hll_sketch
    from fastembed_rs_spark.streaming.pipelines import windowed_hll_registers

    rng = random.Random(71)
    base = 1704067200  # 2024-01-01 00:00 UTC
    rows = [
        (i, rng.randrange(400), base + rng.randrange(4 * 3600))
        for i in range(3000)
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts_s long") \
        .select("event_id", "user_id", F.to_timestamp(F.col("ts_s").cast("timestamp")).alias("ts"))
    df.coalesce(1).write.mode("overwrite").parquet(stream_dir + "/hll")

    src = spark.readStream.schema(df.schema).parquet(stream_dir + "/hll")
    regs = windowed_hll_registers(src, key_col="user_id", window="1 hour", p=9)
    q = (
        regs.writeStream.format("memory").queryName("hll_regs")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    q.stop()
    streamed = hll_finalize(
        spark.sql("select w.start as ws, bucket, rho from hll_regs")
        .withColumnRenamed("ws", "w"),
        keys=["w"], p=9,
    ).collect()
    got = {r.w: r.hll_est for r in streamed}

    batch = df.withColumn("__h", token_hash(F.col("user_id").cast("string")))
    for w_start, est in got.items():
        import datetime

        w_end = w_start + datetime.timedelta(hours=1)
        rows_in = batch.filter((F.col("ts") >= w_start) & (F.col("ts") < w_end))
        expected = hll_sketch(rows_in.select("__h"), "__h", p=9).collect()[0].hll_est
        assert est == expected, w_start
    assert len(got) == 4


def test_stream_stream_interval_join_matches_batch(spark, stream_dir):
    """Stream-stream inner interval join (view->click attribution) over
    one availableNow run == the equivalent batch range join."""
    from fastembed_rs_spark.streaming import view_click_attribution

    rows = [
        # user 1: view at 00:00, clicks at 00:05 (attributed) and 00:30 (not)
        (10, 1, "2024-01-01 00:00:00", "view", 0),
        (11, 1, "2024-01-01 00:05:00", "click", 7),
        (12, 1, "2024-01-01 00:30:00", "click", 9),
        # user 2: two views before one click -> two attribution rows
        (20, 2, "2024-01-01 01:00:00", "view", 0),
        (21, 2, "2024-01-01 01:10:00", "view", 0),
        (22, 2, "2024-01-01 01:12:00", "click", 3),
        # user 3: click with no prior view -> inner join drops it
        (30, 3, "2024-01-01 02:00:00", "click", 5),
    ]
    _write = spark.createDataFrame(
        [(e, u, t, ty, v) for e, u, t, ty, v in rows],
        ["event_id", "user_id", "ts_s", "event_type", "value"],
    ).select(
        "event_id", "user_id", F.to_timestamp("ts_s").alias("ts"),
        "event_type", "value",
    )
    _write.coalesce(1).write.mode("overwrite").parquet(stream_dir)

    src = spark.readStream.schema(EVENT_SCHEMA).parquet(stream_dir)
    joined = view_click_attribution(
        src.filter(F.col("event_type") == "view"),
        src.filter(F.col("event_type") == "click"),
        max_delay="15 minutes",
    )
    q = (
        joined.writeStream.format("memory").queryName("attrib")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["click_event_id"], r["view_event_id"], r["lag_s"])
        for r in spark.sql("SELECT * FROM attrib").collect()
    )
    q.stop()
    assert got == [(11, 10, 300.0), (22, 20, 720.0), (22, 21, 120.0)]


def test_stream_static_enrichment_matches_batch(spark, stream_dir):
    """Stream-static left join == the batch join; unmatched keys keep NULL."""
    from fastembed_rs_spark.streaming import enrich_stream

    _write_events(spark, stream_dir)
    dim = spark.createDataFrame(
        [(1, "alice"), (3, "carol")], ["uid", "name"]  # user 2 unmatched
    )
    src = spark.readStream.schema(EVENT_SCHEMA).parquet(stream_dir)
    q = (
        enrich_stream(src, dim, "user_id", "uid")
        .select("event_id", "user_id", "name")
        .writeStream.format("memory").queryName("enriched")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        r["event_id"]: (r["user_id"], r["name"])
        for r in spark.sql("SELECT * FROM enriched").collect()
    }
    q.stop()
    want = {
        r["event_id"]: (r["user_id"], r["name"])
        for r in enrich_stream(
            spark.read.parquet(stream_dir), dim, "user_id", "uid"
        ).select("event_id", "user_id", "name").collect()
    }
    assert got == want
    assert got[4] == (2, None)  # unmatched user survives the left join


def test_dedup_to_store_stream_restarts_without_duplicates(spark, stream_dir):
    """The persisted fingerprint store stays duplicate-free across a
    second run that adds new files (offsets committed) and across
    batch-content overlap (anti-join vs the store)."""
    import os

    from fastembed_rs_spark.streaming import dedup_to_store_stream

    src_dir = os.path.join(stream_dir, "src")
    store = os.path.join(stream_dir, "store")
    ckpt = os.path.join(stream_dir, "ckpt")
    schema = StructType([
        StructField("doc_id", LongType()), StructField("text", StringType()),
    ])
    spark.createDataFrame(
        [(0, "alpha doc"), (1, "ALPHA   doc!"), (2, "beta doc")], schema
    ).coalesce(1).write.mode("append").parquet(src_dir)
    q = dedup_to_store_stream(
        spark.readStream.schema(schema).parquet(src_dir), store, ckpt
    )
    q.awaitTermination(120); q.stop()
    first = spark.read.parquet(store).collect()
    assert len(first) == 2  # alpha (0/1 same fingerprint) + beta

    # second batch: one repeat of alpha, one novel doc
    spark.createDataFrame(
        [(3, "alpha doc"), (4, "gamma doc")], schema
    ).coalesce(1).write.mode("append").parquet(src_dir)
    q2 = dedup_to_store_stream(
        spark.readStream.schema(schema).parquet(src_dir), store, ckpt
    )
    q2.awaitTermination(120); q2.stop()
    rows = spark.read.parquet(store).collect()
    fps = [r["fingerprint"] for r in rows]
    assert len(fps) == len(set(fps)) == 3  # alpha, beta, gamma — no dupes
    assert sorted(r["doc_id"] for r in rows) == [0, 2, 4]


def test_kmv_quantile_store_matches_batch(spark, stream_dir):
    """Streaming KMV bottom-k store == the batch bottom-k over everything
    seen, after every prefix of micro-batches AND across a restart — the
    sketch's min-union merge law, exercised as streaming state."""
    import os

    from pyspark.sql import functions as F

    from fastembed_rs_spark.functions.text import token_hash
    from fastembed_rs_spark.streaming import kmv_quantile_store_stream

    src_dir = os.path.join(stream_dir, "kmv_src")
    store = os.path.join(stream_dir, "kmv_store")
    ckpt = os.path.join(stream_dir, "kmv_ckpt")
    schema = StructType([
        StructField("event_id", LongType()), StructField("value", DoubleType()),
    ])
    K = 16

    def batch_bottom_k(rows):
        df = spark.createDataFrame(rows, schema)
        hashed = df.select(
            "value",
            token_hash(
                F.concat(F.col("event_id").cast("string"), F.lit("#pctl"))
            ).alias("__h"),
        )
        return sorted(
            (r["__h"], r["value"])
            for r in hashed.orderBy("__h", "value").limit(K).collect()
        )

    all_rows = [(i, float((i * 37) % 101)) for i in range(60)]
    first, second = all_rows[:35], all_rows[35:]

    spark.createDataFrame(first, schema).coalesce(1).write.mode("append").parquet(src_dir)
    q = kmv_quantile_store_stream(
        spark.readStream.schema(schema).parquet(src_dir), store, ckpt, k=K
    )
    q.awaitTermination(120); q.stop()
    got1 = sorted((r["__h"], r["value"]) for r in spark.read.parquet(store).collect())
    assert got1 == batch_bottom_k(first)

    # restart with more data: store must equal batch over the union
    spark.createDataFrame(second, schema).coalesce(1).write.mode("append").parquet(src_dir)
    q2 = kmv_quantile_store_stream(
        spark.readStream.schema(schema).parquet(src_dir), store, ckpt, k=K
    )
    q2.awaitTermination(120); q2.stop()
    got2 = sorted((r["__h"], r["value"]) for r in spark.read.parquet(store).collect())
    assert got2 == batch_bottom_k(all_rows)
    assert len(got2) == K

    # replay: a fresh checkpoint re-delivers EVERY batch against the
    # already-merged store (the at-least-once crash-replay case) — the
    # (hash, value) dedup must keep the store bit-identical
    q3 = kmv_quantile_store_stream(
        spark.readStream.schema(schema).parquet(src_dir), store,
        os.path.join(stream_dir, "kmv_ckpt_replay"), k=K,
    )
    q3.awaitTermination(120); q3.stop()
    got3 = sorted((r["__h"], r["value"]) for r in spark.read.parquet(store).collect())
    assert got3 == got2


def test_embedding_drift_stream_matches_batch(spark, stream_dir):
    """Streamed per-window drift registers, finalized, == the batch
    embedding_stats expression over the same rows; the reference
    comparison flags exactly the deliberately shifted dims."""
    import random

    from fastembed_rs_spark.streaming.pipelines import (
        drift_against_reference,
        drift_finalize,
        embedding_drift_registers,
    )

    rng = random.Random(97)
    base = 1704067200  # 2024-01-01 00:00 UTC
    dim = 8
    rows = []
    for i in range(600):
        hour = i % 3
        # dims 0/1 drift upward in hour 2; others stay ~N(0,1)-ish uniform
        vec = [
            rng.uniform(-1, 1) + (5.0 if hour == 2 and d < 2 else 0.0)
            for d in range(dim)
        ]
        rows.append((i, base + hour * 3600 + rng.randrange(3600), vec))
    df = spark.createDataFrame(
        rows, "vec_id long, ts_s long, embedding array<double>"
    ).select(
        "vec_id",
        F.to_timestamp(F.col("ts_s").cast("timestamp")).alias("ts"),
        "embedding",
    )
    df.coalesce(1).write.mode("overwrite").parquet(stream_dir + "/drift")

    src = spark.readStream.schema(df.schema).parquet(stream_dir + "/drift")
    regs = embedding_drift_registers(src, window="1 hour")
    q = (
        regs.writeStream.format("memory").queryName("drift_regs")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    q.stop()
    streamed = {
        (r.w, r.dim): (r.n, r.mean, r.std, r.min_x, r.max_x)
        for r in drift_finalize(spark.table("drift_regs")).collect()
    }

    # batch over the same rows, same expression, window derived from ts
    x = df.select(
        F.window("ts", "1 hour").alias("w"),
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "x"),
    )
    agg = x.groupBy("w", "dim").agg(
        F.count("*").cast("long").alias("n"), F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("ss"),
        F.min("x").alias("mn"), F.max("x").alias("mx"),
    )
    batch = {
        (r.w, r.dim): (r.n, r.mean, r.std, r.min_x, r.max_x)
        for r in drift_finalize(agg).collect()
    }
    assert streamed == batch
    assert len(streamed) == 3 * dim  # 3 windows x dims

    # reference = hour-0 stats; hour-2 must flag exactly dims 0 and 1
    fin = drift_finalize(agg)
    h0 = fin.filter(F.col("w.start") == F.to_timestamp(F.lit(base).cast("timestamp")))
    ref = h0.select(
        "dim", F.col("mean").alias("ref_mean"), F.col("std").alias("ref_std")
    )
    h2_start = base + 2 * 3600
    h2 = fin.filter(
        F.col("w.start") == F.to_timestamp(F.lit(h2_start).cast("timestamp"))
    )
    flagged = {
        r.dim
        for r in drift_against_reference(h2, ref, tau=3.0)
        .filter("is_drifted").collect()
    }
    assert flagged == {0, 1}


def test_psi_stream_matches_batch_reference(spark, stream_dir):
    """Streamed per-window histogram registers + reference finalize == the
    batch PSI formula over the same rows; the deliberately shifted window
    crosses the 0.2 alert threshold, the in-distribution one does not."""
    import math
    import random

    from fastembed_rs_spark.streaming.pipelines import (
        psi_against_reference,
        psi_histogram_registers,
    )

    rng = random.Random(53)
    base = 1704067200  # 2024-01-01 00:00 UTC
    rows = []
    for i in range(800):
        hour = i % 2
        # hour 0 matches the reference distribution; hour 1 shifts long
        n_chars = rng.randrange(0, 800) if hour == 0 else rng.randrange(1200, 2000)
        rows.append((i, base + hour * 3600 + rng.randrange(3600), n_chars))
    df = spark.createDataFrame(rows, "doc_id long, ts_s long, n_chars int").select(
        "doc_id",
        F.to_timestamp(F.col("ts_s").cast("timestamp")).alias("ts"),
        "n_chars",
    )
    df.coalesce(1).write.mode("overwrite").parquet(stream_dir + "/psi")

    ref_hist = [0] * 10
    for _ in range(1000):
        ref_hist[min(rng.randrange(0, 800) // 200, 9)] += 1
    reference = spark.createDataFrame(
        [(b, c) for b, c in enumerate(ref_hist)], "bucket int, ref_cnt long"
    )

    src = spark.readStream.schema(df.schema).parquet(stream_dir + "/psi")
    regs = psi_histogram_registers(src, window="1 hour")
    q = (
        regs.writeStream.format("memory").queryName("psi_regs")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    q.stop()
    out = {
        r["w"]["start"].hour: r
        for r in psi_against_reference(spark.table("psi_regs"), reference).collect()
    }
    assert set(out) == {0, 1}

    # python twin of the batch psi_drift integer-nano formula
    def psi_nano(window_hour):
        cnts = [0] * 10
        for i, (_, ts_s, n_chars) in enumerate(rows):
            if (ts_s - base) // 3600 == window_hour:
                cnts[min(n_chars // 200, 9)] += 1
        wtot, rtot = sum(cnts), sum(ref_hist)
        nano = 0
        for b in range(10):
            p = (ref_hist[b] + 1) / (rtot + 10)
            q_ = (cnts[b] + 1) / (wtot + 10)
            nano += int(round((p - q_) * math.log(p / q_) * 1e9))
        return nano

    for hour in (0, 1):
        assert out[hour]["psi_nano"] == psi_nano(hour)
    assert out[0]["drifted"] == 0 and out[0]["psi"] < 0.05
    assert out[1]["drifted"] == 1 and out[1]["psi"] > 0.2


def test_index_ingest_stream_appends_and_dedupes(spark, stream_dir):
    """Streamed vector batches land in the persisted IVF index with
    existing-centroid assignment, the index answers queries for appended
    ids, and a second run (restart + id overlap) appends only novelty."""
    import os

    from fastembed_rs_spark.operators.ivf_index import (
        build_ivf_index,
        load_ivf_index,
        query_ivf_index,
    )
    from fastembed_rs_spark.streaming import index_ingest_stream

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    base = emb.filter(F.col("vec_id") < 400)
    idx = os.path.join(stream_dir, "ivf")
    src = os.path.join(stream_dir, "vecs")
    ckpt = os.path.join(stream_dir, "ckpt")
    build_ivf_index(base, idx, k=8, iters=2)
    cent_before = sorted(
        map(tuple, spark.read.parquet(f"{idx}/centroids").collect())
    )

    batch1 = emb.filter((F.col("vec_id") >= 400) & (F.col("vec_id") < 450))
    batch1.coalesce(1).write.mode("append").parquet(src)
    schema = batch1.schema
    q = index_ingest_stream(
        spark.readStream.schema(schema).parquet(src), idx, ckpt
    )
    q.awaitTermination(120); q.stop()
    corpus, _, manifest = load_ivf_index(spark, idx)
    assert manifest["n_vectors"] == corpus.count() == 450

    # second run: 10 replayed ids + 50 novel ones in a new file
    emb.filter((F.col("vec_id") >= 440) & (F.col("vec_id") < 500)) \
        .coalesce(1).write.mode("append").parquet(src)
    q2 = index_ingest_stream(
        spark.readStream.schema(schema).parquet(src), idx, ckpt
    )
    q2.awaitTermination(120); q2.stop()
    corpus, centroids, manifest = load_ivf_index(spark, idx)
    assert manifest["n_vectors"] == corpus.count() == 500
    ids = [r["vec_id"] for r in corpus.select("vec_id").collect()]
    assert len(ids) == len(set(ids))  # the 440..449 overlap was dropped
    # centroids were never retrained by the stream
    assert sorted(
        map(tuple, spark.read.parquet(f"{idx}/centroids").collect())
    ) == cent_before
    # a streamed-in vector is findable (top-1 = itself)
    probe = emb.filter(F.col("vec_id") == 470).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    top = query_ivf_index(spark, idx, probe, k=1, nprobe=2).collect()
    assert top and top[0]["vec_id"] == 470


def test_windowed_profile_stream_matches_batch(spark, stream_dir):
    """Streamed per-window column-profile registers, finalized, must give
    EXACT row/null counts and the bit-identical HLL distinct estimate of a
    batch recompute window-by-window — the streaming table_profile."""
    import datetime
    import random

    from fastembed_rs_spark.functions.text import token_hash
    from fastembed_rs_spark.operators.sketch import hll_sketch
    from fastembed_rs_spark.streaming.pipelines import (
        profile_finalize,
        windowed_profile_registers,
    )

    rng = random.Random(13)
    base = 1704067200  # 2024-01-01 00:00 UTC
    rows = [
        (
            i,
            None if rng.random() < 0.15 else rng.randrange(300),
            None if rng.random() < 0.05 else f"t{rng.randrange(7)}",
            base + rng.randrange(3 * 3600),
        )
        for i in range(2500)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, etype string, ts_s long"
    ).select(
        "event_id", "user_id", "etype",
        F.to_timestamp(F.col("ts_s").cast("timestamp")).alias("ts"),
    )
    df.coalesce(1).write.mode("overwrite").parquet(stream_dir + "/prof")

    src = spark.readStream.schema(df.schema).parquet(stream_dir + "/prof")
    regs = windowed_profile_registers(
        src, cols=["event_id", "user_id", "etype"], window="1 hour", p=9
    )
    q = (
        regs.writeStream.format("memory").queryName("prof_regs")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    q.stop()
    out = {
        (r["w"], r["column_name"]): r
        for r in profile_finalize(
            spark.sql(
                "select w.start as w, column_name, bucket, rho, cnt"
                " from prof_regs"
            ),
            p=9,
        ).collect()
    }
    assert {c for _, c in out} == {"event_id", "user_id", "etype"}
    assert len(out) == 9  # 3 windows x 3 columns
    for (w_start, col), r in out.items():
        w_end = w_start + datetime.timedelta(hours=1)
        win = df.filter((F.col("ts") >= w_start) & (F.col("ts") < w_end))
        n = win.count()
        n_null = win.filter(F.col(col).isNull()).count()
        assert r["n_rows"] == n
        assert r["n_nulls"] == n_null
        assert r["fill_permille"] == (n - n_null) * 1000 // n
        expected = hll_sketch(
            win.filter(F.col(col).isNotNull()).select(
                token_hash(F.col(col).cast("string")).alias("__h")
            ),
            "__h", p=9,
        ).collect()[0]["hll_est"]
        assert r["distinct_est"] == expected, (w_start, col)


def test_windowed_profile_handles_hostile_column_names(spark):
    """The melt must survive names needing quoting in BOTH positions: the
    backticked column reference (space) and the single-quoted label
    literal (quote, backslash — escaped backslash-first or a trailing
    backslash eats the closing quote)."""
    from fastembed_rs_spark.streaming.pipelines import (
        windowed_profile_registers,
    )

    cols = ["weird col", "it's", "a\\b", "select"]
    df = spark.range(5).select(
        F.col("id").alias("weird col"),
        F.lit("x").alias("it's"),
        F.col("id").alias("a\\b"),
        F.lit("kw").alias("select"),
        F.current_timestamp().alias("ts"),
    )
    got = {
        r["column_name"]
        for r in windowed_profile_registers(df, cols=cols)
        .select("column_name").distinct().collect()
    }
    assert got == set(cols)


def test_windowed_profile_stream_restart_exactly_once(spark, stream_dir):
    """Crash-recovery for the streaming profiler: run on a first file with a
    checkpoint, STOP, land a second file, restart against the SAME
    checkpoint — the final registers must equal a batch recompute over the
    union. A restart that re-delivered file 1 would double n_rows/n_nulls
    (count registers, unlike HLL max-merges, are NOT idempotent under
    replay — this is the property the checkpointed state store provides and
    the one a parity-only test cannot see)."""
    import random

    from fastembed_rs_spark.streaming.pipelines import (
        profile_finalize,
        windowed_profile_registers,
    )

    rng = random.Random(29)
    base = 1704067200  # 2024-01-01 00:00 UTC
    schema = "event_id long, user_id long, ts_s long"

    def mk(n0, n1):
        return [
            (i, None if rng.random() < 0.2 else rng.randrange(50),
             base + rng.randrange(2 * 3600))
            for i in range(n0, n1)
        ]

    def write(rows):
        (
            spark.createDataFrame(rows, schema)
            .select(
                "event_id", "user_id",
                F.to_timestamp(F.col("ts_s").cast("timestamp")).alias("ts"),
            )
            .coalesce(1).write.mode("append").parquet(stream_dir + "/src")
        )

    rows1, rows2 = mk(0, 800), mk(800, 1300)
    write(rows1)
    ckpt = stream_dir + "/ckpt"
    read_schema = "event_id long, user_id long, ts timestamp"

    def run(qname):
        src = spark.readStream.schema(read_schema).parquet(stream_dir + "/src")
        regs = windowed_profile_registers(
            src, cols=["event_id", "user_id"], window="1 hour", p=9
        )
        q = (
            regs.writeStream.format("memory").queryName(qname)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        q.stop()

    run("prof_rt1")
    write(rows2)
    run("prof_rt2")  # restart: file 1 must come from STATE, not re-read

    got = {
        (r["w"], r["column_name"]): r
        for r in profile_finalize(
            spark.sql(
                "select w.start as w, column_name, bucket, rho, cnt"
                " from prof_rt2"
            ),
            p=9,
        ).collect()
    }
    both = spark.read.parquet(stream_dir + "/src")
    assert sum(r["n_rows"] for (w, c), r in got.items() if c == "event_id") \
        == both.count() == 1300
    for (w_start, col), r in got.items():
        import datetime

        w_end = w_start + datetime.timedelta(hours=1)
        win = both.filter((F.col("ts") >= w_start) & (F.col("ts") < w_end))
        assert r["n_rows"] == win.count(), (w_start, col)
        assert r["n_nulls"] == win.filter(F.col(col).isNull()).count()
