"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual catalog lives in ``fastembed_rs_spark.queries``; this file
only adapts it to the driver's signature.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: embed every document with
    the hashing embedder (the engine's SQL-verifiable dense model), take 3
    documents as queries, and return their cosine top-5 neighbours —
    embedding generation + similarity top-k, the reference's two core
    capabilities (src/text_embedding/impl.rs:432-449, src/similarity.rs:31-40)
    in one DataFrame plan."""
    from pyspark.sql import functions as F

    from fastembed_rs_spark.operators.embed_hash import hash_embedding
    from fastembed_rs_spark.operators.topk import cosine_top_k

    docs = spark.read.parquet(f"{SMOKE_SF_DIR}/documents.parquet")
    embedded = docs.select(
        F.col("doc_id"), hash_embedding("text", dim=64).alias("embedding")
    )
    queries = embedded.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return cosine_top_k(
        queries, embedded, k=5, id_col="doc_id", round_to=6
    ).select("query_id", "doc_id", "score", "rank")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (and the
    beyond-reference pipeline operators). Each callable takes
    (spark, sf_dir) and returns a DataFrame whose column names match the
    oracle SQL exactly."""
    from fastembed_rs_spark.queries import all_queries

    return {name: spec.spark for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query. Model-runtime (pandas-UDF)
    queries are intentionally absent → the driver records a rows-only
    check; their numeric semantics are covered by tests/."""
    from fastembed_rs_spark.queries import all_queries

    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
