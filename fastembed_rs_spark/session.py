"""SparkSession factory with engine defaults.

Local testing runs ``local[$SPARK_GRAFT_CPUS]``; the same configs are the
ones we'd set on a real cluster (AQE, Arrow batching, sane shuffle
parallelism). The Arrow batch size mirrors the reference's default inference
batch size of 256 (``src/text_embedding/mod.rs:5``) so a pandas-UDF batch is
one "model batch".
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: reference DEFAULT_BATCH_SIZE (src/text_embedding/mod.rs:5)
DEFAULT_BATCH_SIZE = 256
#: reference DEFAULT_MAX_LENGTH (src/text_embedding/mod.rs:6)
DEFAULT_MAX_LENGTH = 512


def get_spark(app_name: str = "fastembed-rs-spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # One shuffle partition per core locally; on a cluster you would size
        # this to ~2-3x total cores and let AQE coalesce.
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(DEFAULT_BATCH_SIZE))
        # Embedding UDFs keep a model session per Python worker; reuse is
        # what makes the per-executor singleton pattern work.
        .config("spark.python.worker.reuse", "true")
        # events.parquet timestamps: unit varies across testdata generations.
        # NANOS parquet is read as long epoch-nanos (legacy flag); MICROS is
        # read as timestamp and normalized to epoch-nanos in queries.t().
        # Session tz pinned to UTC so naive-timestamp → epoch conversion is
        # zone-independent (matches DuckDB epoch_us/epoch_ns semantics).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
