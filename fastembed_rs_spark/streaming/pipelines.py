"""Structured Streaming wrappers around the batch operators.

The reference is a synchronous batch library ("No dependency on Tokio",
README.md:9) — streaming is a beyond-reference capability of this engine:
the same embedding/dedup/analytics operators applied to unbounded input.

Design: all transformations here are *expressed once* against the batch
DataFrame API and reused — ``embed_stream`` applies the identical
``mapInPandas`` embedding stage to a streaming DataFrame (Spark plans it
incrementally; the per-worker session singleton amortizes across
micro-batches exactly as it does across tasks), and the stateful pieces
(windowed counts, sessionization) use event-time watermarks so state is
bounded at 100 TB/day rates.

At scale: watermark + window state lives in the state store keyed by
(window, event_type) / (user_id, session window) — both uniform keys, no
hot partitions; ``foreachBatch`` sinks let each micro-batch reuse the full
batch writer (idempotent by batch id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def embed_stream(
    stream_df: DataFrame,
    text_col: str = "text",
    model: str = "stub-dense-mean",
    out_col: str = "embedding",
    batch_size: int = 256,
) -> DataFrame:
    """Streaming dense embedding: identical plan to operators.embed.embed_text,
    applied to an unbounded DataFrame. Stateless → any output mode works."""
    from fastembed_rs_spark.operators.embed import embed_text

    return embed_text(stream_df, text_col, model=model, out_col=out_col,
                      batch_size=batch_size)


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window counts + value sums per key with a late-data watermark —
    the streaming form of the batch ``events_hourly`` query.

    ``ts_col`` must be a timestamp column. State per (window, key) is dropped
    once the watermark passes the window end, bounding memory forever."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(key_col))
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n_events",
            "total_value",
        )
    )


def embed_to_parquet_stream(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    text_col: str = "text",
    model: str = "stub-dense-mean",
    partition_by: str | None = None,
):
    """Continuously embed a document stream and append to a parquet dataset
    via ``foreachBatch`` — each micro-batch reuses the full batch writer
    (``sources.io.write_embeddings`` shape), idempotent per batch id.

    Returns the started StreamingQuery; caller owns stop/await. The
    checkpoint dir carries the source offsets, so a restart resumes exactly
    where the last committed batch ended — the incremental ingest pattern
    for a growing 100 TB corpus."""
    from fastembed_rs_spark.operators.embed import embed_text

    embedded = embed_text(stream_df, text_col, model=model)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        writer = batch_df.write.mode("append")
        if partition_by is not None:
            writer = writer.partitionBy(partition_by)
        writer.parquet(path)

    return (
        embedded.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def dedup_stream(
    stream_df: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: drop documents whose content fingerprint was
    already seen within the watermark horizon — the incremental form of the
    batch ``exact_dedup`` operator.

    ``dropDuplicates`` keeps one state-store entry per fingerprint and evicts
    it once the watermark passes, so state is bounded; fingerprints are
    uniform hashes → no hot state-store partitions."""
    from fastembed_rs_spark.functions.text import doc_fingerprint

    return (
        stream_df.withColumn("fingerprint", doc_fingerprint(text_col))
        .withWatermark(ts_col, watermark)
        .dropDuplicates(["fingerprint"])
    )


def sessionize_stream(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming sessionization via Spark's native session window (gap-based,
    merging) — the incremental form of the batch ``events_sessionize`` query.

    ``session_window`` keeps one merged window per (user, active session) in
    the state store and finalizes it when the watermark passes; this is the
    scalable replacement for the batch lag()+running-sum formulation."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("w"), F.col(user_col))
        .agg(F.count("*").cast("long").alias("n_events"))
        .select(
            F.col(user_col),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def windowed_hll_registers(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    p: int = 9,
) -> DataFrame:
    """Streaming distinct-count sketch: HLL registers per tumbling window —
    (window, bucket, rho) with rho = max over the window's events.

    The register merge is max(), which is exactly what a streaming
    aggregation maintains incrementally: state is at most 2^p rows per
    open window regardless of event volume, evicted at the watermark.
    Finalize with ``operators.sketch.hll_finalize(regs, ["w"], p)`` —
    batch-stream equivalence is pinned by test. Keys hash through the
    canonical rolling hash, so the registers (and the finalized estimate)
    are bit-identical to the batch ``hll_sketch`` over the same rows.
    """
    from fastembed_rs_spark.functions.text import token_hash
    from fastembed_rs_spark.operators.sketch import hll_bucket_cols

    hashed = events.withColumn(
        "__h", token_hash(F.col(key_col).cast("string"))
    )
    bucket, rho = hll_bucket_cols("__h", p)
    return (
        hashed.withWatermark(ts_col, watermark)
        .select(F.col(ts_col), bucket, rho)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col("bucket"))
        .agg(F.max("rho").alias("rho"))
    )


def dedup_to_store_stream(
    stream_df: DataFrame,
    store_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Continuously grow a persisted fingerprint store: per micro-batch,
    fingerprint the batch, anti-join against the CURRENT store (and dedup
    within the batch, min-id canonical), and append only novel
    fingerprints — the streaming form of the ``incremental_dedup`` /
    ``incremental_embed`` catalog queries.

    The store re-reads per batch (stream-static joins re-resolve file
    sources), so novelty is judged against everything committed by prior
    batches. Offsets live in ``checkpoint``: a restart never replays a
    committed batch, which is what keeps the append-only store
    duplicate-free. At scale, write the store bucketed by fingerprint so
    the per-batch anti-join co-locates.

    Returns the started StreamingQuery; caller owns stop/await.
    """
    from fastembed_rs_spark.operators.fast_text import doc_fingerprints_fast
    from fastembed_rs_spark.sources.io import fs_exists

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        fp = doc_fingerprints_fast(batch_df, id_col, text_col)
        fresh = (
            fp.groupBy("fingerprint")
            .agg(F.min(id_col).alias(id_col))
            .select(id_col, "fingerprint")
        )
        # Hadoop-FS existence check (not os.path.exists): works on HDFS/S3
        # too, where a local check would silently skip the anti-join and
        # corrupt the store's dedup invariant
        if fs_exists(spark, store_path):
            store = spark.read.parquet(store_path).select("fingerprint")
            fresh = fresh.join(store, "fingerprint", "left_anti")
        fresh.write.mode("append").parquet(store_path)

    return (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def kmv_quantile_store_stream(
    stream_df: DataFrame,
    store_path: str,
    checkpoint: str,
    value_col: str = "value",
    key_col: str = "event_id",
    k: int = 512,
):
    """Maintain a persisted KMV bottom-k sample across micro-batches — the
    streaming form of the ``value_percentiles_sampled`` catalog query, and
    the live demonstration of the sketch's merge law: ``bottom_k(A ∪ B) =
    bottom_k(bottom_k(A) ∪ B)`` for a total order, so per batch it suffices
    to min-union the batch with the current store and keep the k smallest
    (by the engine-shared rolling hash of the key, ties by value).

    After ANY prefix of batches, percentiles computed from the store are
    bit-identical to running the batch query over every row seen so far
    (pinned by test). The store rewrite is k rows (localCheckpoint-ed
    before overwrite so no task reads a file the commit replaces).

    Replay safety: foreachBatch is at-least-once — a crash between the
    store overwrite and the offset commit replays the batch into a store
    that already absorbed it. The store carries the KEY alongside each
    sampled row and the min-union deduplicates on it, so a replayed row
    (same key → identical hash and value) collapses exactly, while
    genuinely distinct events always survive — even under token_hash
    collisions, where a (hash, value)-pair dedup could drop a real row.
    Returns the started StreamingQuery; caller owns stop/await."""
    from fastembed_rs_spark.functions.text import token_hash
    from fastembed_rs_spark.sources.io import fs_exists

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        hashed = batch_df.select(
            F.col(key_col).cast("string").alias("key"),
            F.col(value_col).alias("value"),
            token_hash(
                F.concat(F.col(key_col).cast("string"), F.lit("#pctl"))
            ).alias("__h"),
        )
        if fs_exists(spark, store_path):
            hashed = hashed.unionByName(spark.read.parquet(store_path))
        merged = (
            hashed.dropDuplicates(["key"])  # replay idempotence, exact
            .orderBy("__h", "value").limit(k).localCheckpoint()
        )
        merged.write.mode("overwrite").parquet(store_path)

    return (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def embedding_drift_registers(
    vectors: DataFrame,
    vec_col: str = "embedding",
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming embedding drift monitor: per tumbling window and per
    dimension, the MERGEABLE moment registers (n, Σx, Σx², min, max) of
    the embedding values — the streaming counterpart of the batch
    ``embedding_stats`` catalog query.

    Sum/count/min/max are exactly what a streaming aggregation maintains
    incrementally, so state is bounded by dims × open windows regardless
    of vector volume, evicted at the watermark. Finalize with
    ``drift_finalize`` (same sum-of-squares identity as the batch query, so
    the numbers are identical over the same rows — pinned by test); compare
    windows against a published baseline with ``drift_against_reference``.
    """
    x = vectors.select(
        F.col(ts_col),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("dim", "x"),
    )
    return (
        x.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col("dim"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("x").alias("s"),
            F.sum(F.col("x") * F.col("x")).alias("ss"),
            F.min("x").alias("mn"),
            F.max("x").alias("mx"),
        )
    )


def drift_finalize(regs: DataFrame) -> DataFrame:
    """(w, dim, n, s, ss, mn, mx) registers → per-window per-dim stats
    (mean/std/min/max) via the explicit sum-of-squares identity — the
    same expression as the batch ``embedding_stats`` query, so streamed
    windows and a batch run over the same rows agree exactly."""
    return regs.select(
        "w",
        F.col("dim").cast("long").alias("dim"),
        "n",
        F.round(F.col("s") / F.col("n"), 6).alias("mean"),
        F.round(
            F.sqrt(
                (F.col("ss") - F.col("s") * F.col("s") / F.col("n"))
                / (F.col("n") - 1)
            ),
            6,
        ).alias("std"),
        F.round("mn", 6).alias("min_x"),
        F.round("mx", 6).alias("max_x"),
    )


def drift_against_reference(
    current: DataFrame,
    reference: DataFrame,
    tau: float = 3.0,
) -> DataFrame:
    """Flag drifted dimensions: join finalized window stats against a
    published per-dim baseline (dim, ref_mean, ref_std) and flag where
    the window mean moved more than ``tau`` reference-stds. The baseline
    is tiny (dims rows) — broadcast; zero-variance reference dims never
    flag (guard, not NaN)."""
    z = F.when(
        F.col("ref_std") > 0,
        F.abs(F.col("mean") - F.col("ref_mean")) / F.col("ref_std"),
    )
    return (
        current.join(F.broadcast(reference), "dim")
        .withColumn("drift_z", F.round(z, 6))
        .withColumn(
            "is_drifted", F.coalesce(F.col("drift_z") > tau, F.lit(False))
        )
    )


def psi_histogram_registers(
    docs: DataFrame,
    len_col: str = "n_chars",
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    bucket_width: int = 200,
    n_buckets: int = 10,
) -> DataFrame:
    """Streaming PSI drift monitor, register stage: per tumbling window,
    the fixed-bucket length histogram (w, bucket, cnt) — the streaming
    counterpart of the batch ``psi_drift`` catalog query.

    A histogram COUNT is the canonical mergeable register: state is
    bounded by n_buckets × open windows however large the stream, evicted
    at the watermark. Buckets use the same exact integer floor-division
    edges as the batch query (``len div width``, capped), so a streamed
    window finalized against a reference equals the batch PSI over the
    same rows — pinned by test. Finalize with ``psi_against_reference``.
    """
    b = docs.select(
        F.col(ts_col),
        F.least(
            F.expr(f"{len_col} div {bucket_width}"), F.lit(n_buckets - 1)
        ).alias("bucket"),
    )
    return (
        b.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col("bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def psi_against_reference(
    regs: DataFrame,
    reference: DataFrame,
    n_buckets: int = 10,
) -> DataFrame:
    """(w, bucket, cnt) histogram registers + a published reference
    histogram (bucket, ref_cnt) → one row per window: the population
    stability index in exact integer nano-units (same Laplace smoothing
    and (p−q)·ln(p/q) per-bucket terms as the batch ``psi_drift`` query;
    the per-window total is an integer sum, never an order-dependent
    float fold) plus the standard >0.2 alert flag.

    The reference histogram is tiny (n_buckets rows) — broadcast; empty
    buckets on either side are restored via the window × bucket grid so
    smoothing sees all ``n_buckets`` cells exactly like the batch query.
    """
    # grid/wtot derive from regs, so the joins below are self-joins —
    # rename the grid's columns to fresh names to avoid attribute conflicts
    grid = (
        regs.select(F.col("w").alias("__gw"))
        .distinct()
        .crossJoin(
            F.broadcast(
                regs.sparkSession.range(n_buckets).select(
                    F.col("id").cast("int").alias("__gb")
                )
            )
        )
    )
    wtot = regs.groupBy("w").agg(F.sum("cnt").cast("long").alias("wtot")).select(
        F.col("w").alias("__tw"), "wtot"
    )
    rtot = reference.agg(F.sum("ref_cnt").cast("long").alias("rtot"))
    p = (F.coalesce(F.col("ref_cnt"), F.lit(0)) + 1).cast("double") / (
        F.col("rtot") + n_buckets
    ).cast("double")
    q = (F.coalesce(F.col("cnt"), F.lit(0)) + 1).cast("double") / (
        F.col("wtot") + n_buckets
    ).cast("double")
    terms = (
        grid.join(
            regs,
            (F.col("__gw") == F.col("w")) & (F.col("__gb") == F.col("bucket")),
            "left",
        )
        .join(
            F.broadcast(reference), F.col("__gb") == reference["bucket"], "left"
        )
        .join(F.broadcast(wtot), F.col("__gw") == F.col("__tw"))
        .crossJoin(F.broadcast(rtot))
        .select(
            F.col("__gw").alias("w"),
            F.round((p - q) * F.log(p / q) * 1000000000)
            .cast("long")
            .alias("nano"),
        )
    )
    return (
        terms.groupBy("w")
        .agg(F.sum("nano").cast("long").alias("psi_nano"))
        .select(
            "w",
            "psi_nano",
            F.round(F.col("psi_nano").cast("double") / 1e9, 6).alias("psi"),
            (F.col("psi_nano") > 200_000_000).cast("int").alias("drifted"),
        )
    )


def index_ingest_stream(
    stream_df: DataFrame,
    index_path: str,
    checkpoint: str,
    dedupe_ids: bool = True,
):
    """Continuous ANN-index ingest: per micro-batch, append the batch's
    vectors into a persisted IVF index via
    ``operators.ivf_index.append_ivf_index`` — assignment runs against the
    EXISTING centroids (one kernel scan over the batch, the index corpus
    is never read), new rows land as appended files in their hive bucket
    directories, and the manifest count advances. The index stays
    queryable (and dynamic-partition-prunable) throughout; retraining is a
    separate, rare batch decision driven by ``ann_recall_eval`` /
    ``embedding_bucket_drift``.

    Exactly-once-by-id: ``foreachBatch`` is at-least-once — a crash
    between the corpus append and the checkpoint commit replays the
    batch. ``dedupe_ids=True`` anti-joins each batch against the ids
    already in the index, so a replay (or an upstream duplicate) appends
    nothing. That re-reads the index's id column per batch; at serving
    scale swap it for a Bloom-filter sidecar updated in the same sink
    (the ``operators.bloom`` primitive), trading a rare false-drop-never /
    false-keep-possible for the O(index) scan.

    Returns the started StreamingQuery; caller owns stop/await. The index
    at ``index_path`` must already exist (``build_ivf_index``): streams
    append, they never train — training on a half-arrived stream would
    bake a skewed codebook into every later probe.
    """
    from fastembed_rs_spark.operators.ivf_index import append_ivf_index

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        append_ivf_index(batch_df, index_path, check_ids=dedupe_ids)

    return (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def windowed_profile_registers(
    stream_df: DataFrame,
    cols: list[str],
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    p: int = 9,
) -> DataFrame:
    """Streaming data-quality profile: per tumbling window and column,
    mergeable registers for row count, null count and distinct estimate —
    the streaming sibling of the ``table_profile`` catalog query, built
    the way its docstring prescribes for 100 TB: exact distincts become
    HLL registers, everything else is a sum.

    Each input row melts into one register row per profiled column:
    ``bucket = -1`` carries the null population (rho 0), non-null values
    hash through the canonical rolling hash into HLL (bucket, rho). ONE
    streaming aggregation keyed (window, column, bucket) then maintains
    ``rho = max`` and ``cnt = count`` — the same max/sum merges a register
    store does, so state is at most ``cols x (2^p + 1)`` rows per open
    window regardless of event volume, evicted at the watermark. Finalize
    with ``profile_finalize`` (batch-stream equivalence pinned by test);
    registers are bit-identical to the batch ``hll_sketch`` over the same
    rows, so estimates match exactly.
    """
    from fastembed_rs_spark.functions.text import token_hash
    from fastembed_rs_spark.operators.sketch import hll_bucket_cols

    # backtick-quote the column reference (escaping embedded backticks):
    # user column names with spaces/hyphens/reserved words must melt, not
    # misparse inside the stack() SQL expression; the label literal
    # escapes backslashes BEFORE quotes or a trailing backslash would
    # escape the closing quote
    stack_args = ", ".join(
        "'{label}', CAST(`{ref}` AS STRING)".format(
            label=c.replace("\\", "\\\\").replace("'", "\\'"),
            ref=c.replace("`", "``"),
        )
        for c in cols
    )
    melted = stream_df.select(
        F.col(ts_col),
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS (column_name, __v)"
        ),
    )
    hashed = melted.withColumn("__h", token_hash(F.col("__v")))
    bucket, rho = hll_bucket_cols("__h", p)
    return (
        hashed.withWatermark(ts_col, watermark)
        .select(
            F.col(ts_col), "column_name",
            F.when(F.col("__v").isNull(), F.lit(-1)).otherwise(bucket)
            .alias("bucket"),
            F.when(F.col("__v").isNull(), F.lit(0)).otherwise(rho)
            .alias("rho"),
        )
        .groupBy(
            F.window(F.col(ts_col), window).alias("w"),
            F.col("column_name"), F.col("bucket"),
        )
        .agg(
            F.max("rho").alias("rho"),
            F.count(F.lit(1)).cast("long").alias("cnt"),
        )
    )


def profile_finalize(regs: DataFrame, p: int = 9) -> DataFrame:
    """Collapse profile registers to the per-(window, column) health row:
    n_rows, n_nulls, fill_permille (exact integer counts) and the HLL
    distinct estimate over the non-null population. Pure batch math over
    register-sized input — run it on the streamed register table or on
    registers persisted by a ``foreachBatch`` store."""
    from fastembed_rs_spark.operators.sketch import hll_finalize

    counts = regs.groupBy("w", "column_name").agg(
        F.sum("cnt").cast("long").alias("n_rows"),
        F.sum(F.when(F.col("bucket") == -1, F.col("cnt")).otherwise(0))
        .cast("long").alias("n_nulls"),
    )
    # both sides derive from ``regs`` — alias the estimate's keys to fresh
    # names so the left join doesn't trip Spark's conflicting-reference
    # check on a self-derived join
    est = hll_finalize(
        regs.filter(F.col("bucket") >= 0).select("w", "column_name", "bucket", "rho"),
        keys=["w", "column_name"], p=p,
    ).select(
        F.col("w").alias("__ew"), F.col("column_name").alias("__ec"),
        "hll_est",
    )
    return counts.join(
        est,
        (counts["w"] == est["__ew"]) & (counts["column_name"] == est["__ec"]),
        "left",
    ).select(
        counts["w"], counts["column_name"], "n_rows", "n_nulls",
        F.expr("CAST((n_rows - n_nulls) * 1000 div n_rows AS BIGINT)")
        .alias("fill_permille"),
        F.coalesce(F.col("hll_est"), F.lit(0.0)).alias("distinct_est"),
    )
