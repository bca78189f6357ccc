"""Sources and sinks for the embedding engine.

The reference reads texts from memory and images from file paths or raw
bytes (src/image_embedding/impl.rs:119-186); model artifacts come from HF
Hub with a local cache (src/common.rs:171-192). On Spark the equivalents are
table-format readers + the ``binaryFile`` source, all with pushdown:

* ``read_documents``  — parquet/json/csv/text into the canonical
  (doc_id, text) shape; column pruning and predicate pushdown come free
  from the declarative scan.
* ``read_images``     — ``binaryFile`` datasource (path, modificationTime,
  length, content) with a glob filter; ``pathGlobFilter`` prunes at
  listing time, never reading non-matching bytes.
* ``write_embeddings``— parquet sink partitioned/sized for downstream
  similarity joins at 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_TEXT_FORMATS = {"parquet", "orc", "json", "csv", "text"}


def fs_exists(spark: SparkSession, path: str) -> bool:
    """Filesystem-agnostic existence check via the Hadoop FileSystem API.

    ``os.path.exists`` only sees the driver's local disk; on HDFS/S3 (the
    lake-scale target) it would report every store as absent — silently
    skipping anti-joins that keep append-only stores duplicate-free. The
    Hadoop ``Path.getFileSystem(conf)`` resolves whatever scheme the path
    carries (file://, hdfs://, s3a://, ...), same pattern
    ``compact_parquet`` uses for byte sizing.
    """
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()).exists(p)


def read_documents(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    id_col: str = "doc_id",
    text_col: str = "text",
    **options,
) -> DataFrame:
    """Read a document corpus into the canonical (doc_id, text, ...) shape.

    ``text`` format has no id column — a stable one is synthesized from the
    file name + line offset would require input_file_name bookkeeping; we use
    ``monotonically_increasing_id`` (unique, not dense — fine as a dedup /
    join key, do NOT use it as an ordinal)."""
    if fmt not in _TEXT_FORMATS:
        raise ValueError(f"unsupported document format {fmt!r}; use one of {_TEXT_FORMATS}")
    reader = spark.read.format(fmt)
    if fmt == "csv":
        options.setdefault("header", "true")
    df = reader.options(**options).load(path)
    if fmt == "text":
        df = df.select(
            F.monotonically_increasing_id().alias(id_col),
            F.col("value").alias(text_col),
        )
    return df


def read_images(
    spark: SparkSession,
    path: str,
    glob: str = "*.{png,jpg,jpeg,gif}",
    id_from_path: bool = True,
) -> DataFrame:
    """Read images via the ``binaryFile`` datasource →
    (path, content binary, length, modificationTime) — the Spark form of the
    reference's path/bytes image inputs (src/image_embedding/impl.rs:119-159).

    ``pathGlobFilter`` prunes non-matching files during listing (no bytes
    read); pair with ``operators.embed.embed_image`` downstream."""
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )
    if id_from_path:
        df = df.withColumn("image_id", F.regexp_extract(F.col("path"), r"([^/]+)$", 1))
    return df


def write_embeddings(
    df: DataFrame,
    path: str,
    partition_by: str | None = None,
    target_file_rows: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write an embedding table as parquet, shaped for downstream reads.

    * ``partition_by``: hive-partition column (e.g. a date or corpus shard) —
      enables partition pruning for incremental pipelines.
    * ``target_file_rows``: coalesce/repartition so output files hold roughly
      this many rows — embedding tables are wide (dim × 4 bytes per row), and
      the default tiny-task output of a big shuffle produces file counts that
      crush the driver/namenode at 100 TB.
    """
    out = df
    if target_file_rows is not None:
        n = max(1, df.count() // target_file_rows)
        out = df.repartition(n)
    writer = out.write.mode(mode)
    if partition_by is not None:
        writer = writer.partitionBy(partition_by)
    writer.parquet(path)


def zorder_column(df: DataFrame, cols: list[str], bits: int = 8):
    """Z-order (Morton) key over ``cols`` as a Catalyst column.

    Each column is bucketed into ``2^bits`` equal-width bins over its
    observed [min, max] (two scalars per column, one aggregate scan), and
    the bucket bits are interleaved — round-robin, column 0 in the lowest
    bit — so locality in the Z value implies locality in EVERY input
    column at once. Pure bit arithmetic (shiftleft / bitwise or), fully
    codegen; the only driver-side data is the 2·k min/max scalars.
    """
    if len(cols) * bits > 62:
        # shiftleft masks shift amounts mod 64 on the JVM — beyond 62 the
        # interleave would silently wrap high bits onto positions owned by
        # other columns (and 63 is the long sign bit)
        raise ValueError(
            f"len(cols)*bits = {len(cols) * bits} exceeds the 62-bit Z-key "
            f"budget; lower bits (e.g. bits={62 // len(cols)}) or cluster "
            "fewer columns"
        )
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__mn_{c}"), F.max(c).alias(f"__mx_{c}")]
    stats = df.agg(*aggs).collect()[0]
    nbuckets = 1 << bits
    z = F.lit(0).cast("long")
    for ci, c in enumerate(cols):
        if stats[f"__mn_{c}"] is None or stats[f"__mx_{c}"] is None:
            raise ValueError(
                f"cannot Z-order by {c!r}: dataset is empty or the column is "
                "entirely null (no min/max). Rows with SOME nulls are fine — "
                "their Z key is null and range partitioning groups them "
                "together."
            )
        mn, mx = float(stats[f"__mn_{c}"]), float(stats[f"__mx_{c}"])
        span = (mx - mn) or 1.0
        bucket = F.least(
            F.lit(nbuckets - 1),
            F.floor((F.col(c).cast("double") - F.lit(mn)) / F.lit(span) * nbuckets),
        ).cast("long")
        for bi in range(bits):
            bit = F.shiftright(bucket, bi).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, bi * len(cols) + ci))
    return z


def _require_distinct_paths(src_path: str, dst_path: str) -> None:
    """In-place rewrite is unsupported: dst is written with
    mode("overwrite") while src is still being read lazily, so dst == src
    would delete the source mid-scan and destroy the dataset. Rewrite to a
    fresh directory and swap (rename) afterwards."""
    def norm(p: str) -> str:
        # Strip both URI spellings Hadoop accepts ("file:///x" and
        # "file:/x"), then resolve symlinks so an aliased source dir
        # can't slip past the guard.
        for scheme in ("file://", "file:"):
            if p.startswith(scheme):
                p = p[len(scheme):]
                break
        return os.path.realpath(os.path.abspath(p))

    if norm(src_path) == norm(dst_path):
        raise ValueError(
            f"src_path and dst_path resolve to the same location "
            f"({src_path!r}): in-place rewrite would overwrite the source "
            "while it is being read. Write to a new directory, then rename."
        )


def zorder_parquet(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    cols: list[str],
    target_file_mb: int = 128,
    bits: int = 8,
    n_files: int | None = None,
) -> int:
    """Rewrite a parquet dataset clustered by the Z-order of ``cols`` —
    multi-dimensional file/row-group pruning (the lakehouse OPTIMIZE
    ZORDER BY). A 1-D sort (``compact_parquet(sort_col=...)``) gives each
    file a tight min/max range on ONE column and the full span on every
    other; Z-order clustering gives every listed column a fractional span
    per file, so parquet statistics prune scans filtered on ANY of them.
    Sized from the real source byte size like ``compact_parquet``.
    Returns the output file count."""
    _require_distinct_paths(src_path, dst_path)
    df = spark.read.parquet(src_path)
    if n_files is not None:
        n = n_files
    else:
        jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        total = 0
        for uri in df.inputFiles():
            p = jvm.org.apache.hadoop.fs.Path(uri)
            total += p.getFileSystem(conf).getFileStatus(p).getLen()
        n = max(1, -(-total // (target_file_mb * 1024 * 1024)))  # ceil div
    z = zorder_column(df, cols, bits=bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(dst_path)
    )
    return n


def compact_parquet(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_file_mb: int = 128,
    sort_col: str | None = None,
) -> int:
    """Small-file compaction: rewrite a parquet dataset into files of
    roughly ``target_file_mb``. Returns the output file count.

    Streaming sinks and fine-grained incremental writes accumulate
    thousands of KB-sized files; at lake scale, listing + footer reads
    then dominate scan time and crush the namenode. Compaction sizes the
    rewrite from the REAL byte size of the source (Hadoop FileSystem
    stat, so it works on any supported filesystem), not a row-count
    guess. With ``sort_col`` the rewrite range-partitions by that column,
    so each output file covers a tight min/max range and parquet
    row-group statistics prune reads on it.
    """
    _require_distinct_paths(src_path, dst_path)
    df = spark.read.parquet(src_path)
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    total = 0
    for uri in df.inputFiles():
        p = jvm.org.apache.hadoop.fs.Path(uri)
        total += p.getFileSystem(conf).getFileStatus(p).getLen()
    n = max(1, -(-total // (target_file_mb * 1024 * 1024)))  # ceil div
    out = (
        df.repartitionByRange(n, F.col(sort_col))
        if sort_col is not None
        else df.repartition(n)
    )
    out.write.mode("overwrite").parquet(dst_path)
    return n


def upsert_embeddings(
    spark: SparkSession,
    store_path: str,
    new_df: DataFrame,
    key_col: str,
    n_buckets: int = 64,
) -> None:
    """Partition-scoped upsert into a hash-bucketed parquet store: rows in
    ``new_df`` replace same-key rows; only the bucket partitions that
    contain touched keys are rewritten.

    The store is hive-partitioned by ``__bucket = pmod(xxhash64(key),
    n_buckets)``. The merge reads ONLY the affected buckets (partition
    pruning on the read), anti-joins the old rows against the new keys,
    unions the new rows, and writes back under
    ``partitionOverwriteMode=dynamic`` — untouched bucket directories are
    not listed, read, or rewritten. At a 100 TB store with a 1 GB daily
    delta this is the difference between rewriting ~1/64th of the store
    and rewriting all of it (the MERGE pattern, without a table format).

    First call creates the store. Keys must be unique within ``new_df``.
    """
    bucketed = new_df.withColumn(
        "__bucket", F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)).cast("int")
    )
    if not fs_exists(spark, store_path):
        bucketed.write.partitionBy("__bucket").parquet(store_path)
        return
    affected = [r["__bucket"] for r in bucketed.select("__bucket").distinct().collect()]
    old = spark.read.parquet(store_path).filter(F.col("__bucket").isin(affected))
    keep = old.join(bucketed.select(key_col), key_col, "left_anti")
    # materialize before the overwrite so no task reads a file the commit
    # is about to replace; bounded by the affected buckets + the delta
    merged = keep.unionByName(bucketed).localCheckpoint()
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy("__bucket").parquet(store_path)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        else:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def write_training_shards(
    docs: DataFrame,
    out_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokens_per_shard: int = 1 << 20,
    pack_shards: int = 8,
    buckets_per_stream: int = 1 << 40,
) -> list[int]:
    """Pack documents into training shards of ~``tokens_per_shard`` tokens
    and write hive-partitioned by ``shard_id`` — the export sink at the end
    of a curation pipeline (each shard is one trainer input file group).

    Packing follows the ``sequence_packing`` catalog query: docs hash into
    ``pack_shards`` independent streams (``id % pack_shards``), each stream
    concatenates in id order via a per-stream window cumsum, and a doc's
    shard is the ``tokens_per_shard`` bucket its FIRST token lands in, so
    no shard exceeds ``tokens_per_shard`` by more than one document. The
    cumsum window partitions by the pack stream — no global sort exists at
    scale, and stream count scales the max window partition down
    independently of corpus size. Docs with zero tokens are dropped.

    Shard ids are ``stream * buckets_per_stream + bucket``; the default
    bound (2^40 buckets ~ 2^60 tokens/stream at the default
    ``tokens_per_shard``) cannot be exceeded by real data, and a stream
    that somehow does exceed it raises at write time rather than silently
    colliding with the next stream's id range.

    Returns the sorted shard ids written (from the partition directory
    listing, not a second scan)."""
    from pyspark.sql import Window

    from fastembed_rs_spark.functions.text import tokens

    d = (
        docs.withColumn("__nt", F.size(tokens(text_col)).cast("long"))
        .filter(F.col("__nt") > 0)
        .withColumn("__pack", F.pmod(F.col(id_col), F.lit(pack_shards)))
    )
    if pack_shards * buckets_per_stream >= 1 << 62:
        raise ValueError(
            "pack_shards * buckets_per_stream must fit in a signed 64-bit "
            f"shard_id; got {pack_shards} * {buckets_per_stream}"
        )
    w = Window.partitionBy("__pack").orderBy(id_col)
    start = F.sum("__nt").over(w) - F.col("__nt")
    bucket = F.floor(start / F.lit(tokens_per_shard)).cast("long")
    lim = F.lit(int(buckets_per_stream)).cast("long")
    shard = (
        F.when(
            bucket >= lim,
            F.raise_error(
                F.format_string(
                    "write_training_shards: pack-stream bucket %s >= "
                    "buckets_per_stream %s — shard ids would collide across "
                    "streams; raise buckets_per_stream or tokens_per_shard",
                    bucket.cast("string"),
                    lim.cast("string"),
                )
            ).cast("long"),
        )
        .otherwise(F.col("__pack").cast("long") * lim + bucket)
        .cast("long")
    )
    (
        d.withColumn("shard_id", shard)
        .drop("__pack", "__nt")
        .write.partitionBy("shard_id")
        .mode("overwrite")
        .parquet(out_path)
    )
    jvm = docs.sparkSession._jvm
    conf = docs.sparkSession._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(out_path)
    fs = p.getFileSystem(conf)
    ids = []
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if name.startswith("shard_id="):
            ids.append(int(name.split("=", 1)[1]))
    return sorted(ids)
