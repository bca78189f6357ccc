"""Query catalog: every operator from SURVEY.md §2 wired to the driver test
tables, each paired with its DuckDB oracle SQL.

Contract (driver): each Spark callable takes (spark, sf_dir) and returns a
DataFrame whose row set, column names and types exactly match the oracle SQL
run by DuckDB over the same parquet files. Floats are computed in DOUBLE and
rounded (6 decimals for unit-scale scores, 2 for money) **before ranking**,
so rankings and hashes are reproducible across engines; ties break on ids.

Model-backed (pandas-UDF) queries have no oracle — the driver records a
rows-only check for them; their numerical semantics are covered by the unit
tests instead (tests/test_embed_runtime.py).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fastembed_rs_spark.functions.text import (
    HASH_MOD,
    duck_doc_fingerprint,
    duck_split_80_10_10,
    duck_token_hash,
    duck_tokens,
    split_80_10_10,
)
from fastembed_rs_spark.functions.vector import cosine_similarity, dot
from fastembed_rs_spark.operators import dedup as D
from fastembed_rs_spark.operators import embed_hash as EH
from fastembed_rs_spark.operators import textstats as TS
from fastembed_rs_spark.operators.rerank import rerank, token_overlap_score
from fastembed_rs_spark.operators.topk import (
    assign_ivf_buckets,
    assign_ivf_buckets_fast,
    cosine_top_k,
    ivf_top_k,
)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

#: dimension of the testdata `embeddings.embedding` column (all SFs); known
#: dims let the cosine math run as flat codegen chains instead of
#: interpreted lambda folds (functions.vector.cosine_similarity_fixed)
EMB_DIM = 64


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.parquet carries a physical timestamp whose unit has varied
        # across testdata generations (TIMESTAMP(NANOS) → read as long via
        # legacy.parquet.nanosAsLong; TIMESTAMP(MICROS) → read as
        # timestamp_ntz/timestamp). Normalize to ONE engine-internal shape:
        # `ts` as epoch-nanoseconds bigint, so every downstream window /
        # sessionize / as-of computation is exact int64 arithmetic that
        # hash-matches DuckDB's epoch_ns()/epoch_us() regardless of zone.
        # session.py pins legacy.parquet.nanosAsLong=true for the NANOS case;
        # sessions built elsewhere get a one-time, documented conf repair
        # ONLY if the read actually fails on a NANOS file (the flag has no
        # per-read scope, so there is no narrower place to set it).
        try:
            df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
            df.schema  # force analysis so a NANOS type error surfaces here
        except Exception as e:
            # repair ONLY the NANOS-decode failure ("Illegal Parquet type:
            # INT64 (TIMESTAMP(NANOS,...))"); any other read error (missing
            # path, corrupt file, OTHER illegal types like INT96) re-raises
            # untouched — a session-global conf flip must not mask
            # unrelated failures
            if "NANOS" not in str(e):
                raise
            if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true":
                raise  # flag already on → not the NANOS issue; re-raise
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        dt = dict(df.dtypes).get("ts", "")
        if dt == "timestamp_ntz":
            # naive wall times are UTC by convention (matches DuckDB
            # epoch_*); timestampdiff between NTZ values is exact integer
            # math independent of the session time zone — no conf mutation
            df = df.withColumn(
                "ts",
                (F.expr(
                    "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
                ) * F.lit(1000)).cast("long"),
            )
        elif dt != "bigint":
            # instant-typed micros: unix_micros reads the underlying epoch
            # directly, also zone-independent
            df = df.withColumn(
                "ts",
                (F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000)).cast("long"),
            )
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


@dataclass(frozen=True)
class QuerySpec:
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    description: str = ""


QUERIES: dict[str, QuerySpec] = {}


def q(name: str, oracle: str | None, description: str = ""):
    def deco(fn):
        QUERIES[name] = QuerySpec(spark=fn, oracle=oracle, description=description)
        return fn
    return deco


# ---------------------------------------------------------------------------
# DuckDB SQL fragment builders (mirrors of functions.vector / functions.text)
# ---------------------------------------------------------------------------

def _dk_dot(a: str, b: str) -> str:
    return (
        f"coalesce(list_sum(list_transform(generate_series(1, least(len({a}), len({b}))), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), 0.0)"
    )


def _dk_norm(a: str) -> str:
    return (
        f"sqrt(coalesce(list_sum(list_transform({a}, "
        f"x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 0.0))"
    )


def _dk_cos(a: str, b: str) -> str:
    return (
        f"CASE WHEN {_dk_norm(a)} = 0.0 OR {_dk_norm(b)} = 0.0 THEN 0.0 "
        f"ELSE {_dk_dot(a, b)} / ({_dk_norm(a)} * {_dk_norm(b)}) END"
    )


def _dk_shingles(s: str, k: int = 5) -> str:
    return (
        f"CASE WHEN length(lower({s})) >= {k} THEN "
        f"list_transform(generate_series(1, length(lower({s})) - {k - 1}), "
        f"i -> substr(lower({s}), i, {k})) ELSE [] END"
    )


