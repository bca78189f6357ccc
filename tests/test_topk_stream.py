"""Streaming cosine top-k: one-batch equivalence to the batch operator and
running-state refinement across micro-batches."""

from __future__ import annotations

import shutil
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

DIM = 16


@pytest.fixture()
def stream_dir():
    d = tempfile.mkdtemp(prefix="topk_stream_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _vec_rows(n, seed):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, DIM)).astype(np.float32)
    return [(i, [float(x) for x in v[i]]) for i in range(n)]


def test_topk_stream_single_batch_matches_batch(spark, stream_dir):
    from fastembed_rs_spark.operators.topk import cosine_top_k
    from fastembed_rs_spark.streaming.topk_stream import topk_stream

    rows = _vec_rows(150, seed=3)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qs = df.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    df.coalesce(1).write.mode("overwrite").parquet(stream_dir + "/vecs")

    src = spark.readStream.schema(df.schema).parquet(stream_dir + "/vecs")
    q = (
        topk_stream(src, qs, k=5, dim=DIM)
        .writeStream.format("memory").queryName("topk_out")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    q.stop()
    got = {
        (r["query_id"], r["rank"]): (r["vec_id"], r["score"])
        for r in spark.sql("select * from topk_out").collect()
    }
    batch = cosine_top_k(qs, df, k=5, round_to=6, dim=DIM).collect()
    expected = {
        (r["query_id"], r["rank"]): (r["vec_id"], r["score"]) for r in batch
    }
    assert got == expected


def test_topk_stream_refines_across_batches(spark, stream_dir):
    from fastembed_rs_spark.streaming.topk_stream import topk_stream

    qs = spark.createDataFrame(
        [(0, [1.0] + [0.0] * (DIM - 1))], "query_id long, query_vec array<float>"
    )
    # batch 1: a weak match; batch 2: a perfect match arrives
    weak = [(1, [1.0, 1.0] + [0.0] * (DIM - 2))]
    perfect = [(2, [2.0] + [0.0] * (DIM - 1))]
    schema = "vec_id long, embedding array<float>"
    b1 = spark.createDataFrame(weak, schema)
    b1.coalesce(1).write.mode("overwrite").parquet(stream_dir + "/vecs")

    src = spark.readStream.schema(b1.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(stream_dir + "/vecs")
    q = (
        topk_stream(src, qs, k=2, dim=DIM)
        .writeStream.format("memory").queryName("topk_refine")
        .outputMode("update").start()
    )
    try:
        q.processAllAvailable()
        first = {(r["rank"]): r["vec_id"] for r in spark.sql(
            "select * from topk_refine").collect()}
        spark.createDataFrame(perfect, schema).coalesce(1).write.mode(
            "append"
        ).parquet(stream_dir + "/vecs")
        q.processAllAvailable()
        rows = spark.sql("select * from topk_refine").collect()
    finally:
        q.stop()
    assert first == {1: 1}
    # after batch 2 the latest emission ranks the perfect match first
    latest = {r["rank"]: (r["vec_id"], r["score"]) for r in rows[-2:]}
    assert latest[1][0] == 2 and latest[1][1] == pytest.approx(1.0)
    assert latest[2][0] == 1


def test_topk_stream_state_survives_restart(spark, stream_dir):
    """The per-query running top-k STATE must come back from the
    checkpoint: a weak match ingested before the kill must still rank
    (below the newcomer) after a restart in which only the perfect match
    arrives. Offsets-only recovery would leave the restarted state empty
    and the final emission would hold just one row."""
    from fastembed_rs_spark.streaming.topk_stream import topk_stream

    qs = spark.createDataFrame(
        [(0, [1.0] + [0.0] * (DIM - 1))], "query_id long, query_vec array<float>"
    )
    schema = "vec_id long, embedding array<float>"
    ckpt = stream_dir + "/ckpt"

    def run(out):
        # memory sink refuses checkpoint recovery; foreachBatch is the
        # fault-tolerant sink shape (each run writes its emissions to its
        # own dir so the restarted run's output is inspectable alone)
        src = spark.readStream.schema(schema).parquet(stream_dir + "/vecs")
        q = (
            topk_stream(src, qs, k=2, dim=DIM)
            .writeStream.foreachBatch(
                lambda df, _bid: df.write.mode("append").parquet(out)
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        q.stop()

    weak = [(1, [1.0, 1.0] + [0.0] * (DIM - 2))]
    spark.createDataFrame(weak, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(stream_dir + "/vecs")
    run(stream_dir + "/out1")  # weak match enters the per-query state

    perfect = [(2, [2.0] + [0.0] * (DIM - 1))]
    spark.createDataFrame(perfect, schema).coalesce(1).write.mode(
        "append"
    ).parquet(stream_dir + "/vecs")
    run(stream_dir + "/out2")  # RESTART: merged emission must still hold the weak row

    got = {r["rank"]: r["vec_id"]
           for r in spark.read.parquet(stream_dir + "/out2").collect()}
    assert got == {1: 2, 2: 1}
