"""Feature-hashing embeddings — the engine's SQL-verifiable "model".

A deterministic hashing-trick embedder (HashingTF + L2 normalization): bucket
= token_hash % dim, weight = tf, vector L2-normalized — the classic feature
hashing baseline. It plays the role the reference's tiny test models play in
its test suite: a model whose output every engine can agree on exactly.

Two physical shapes:

* ``hash_embedding`` — dense array<double> built entirely in array-land:
  a single map stage, no shuffle at all. This is what you want in front of a
  similarity join at 100 TB.
* ``hash_embed_coords`` — (id, bucket, weight) coordinate rows via
  posexplode of the dense vector (still shuffle-free) — the SPLADE-like
  sparse coordinate form, and the shape the DuckDB oracle verifies.

The sparse lexical variant ``splade_like_coords`` max/log-saturates term
frequencies into (id, term_bucket, value) over a large vocab — the Spark
translation of the reference's SPLADE post-processing shape
(log(1+relu(x)), strictly-positive pairs — src/sparse_text_embedding/impl.rs:225-254).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fastembed_rs_spark.operators.scale import spread_if_narrow

from fastembed_rs_spark.functions.text import token_hashes

DEFAULT_DIM = 64
SPLADE_VOCAB = 30000


def hash_embedding(text: Column | str, dim: int = DEFAULT_DIM) -> Column:
    """Dense L2-normalized hashing-trick embedding, array<double>, all in one
    map stage (no shuffle, no UDF). All-zero (token-less) docs stay all-zero
    (mirroring the reference's zero-vector guard downstream).

    Single-pass: ONE aggregate over the token hashes carrying the tf array —
    a per-bucket filter loop would inline the rolling hash ``dim``× into the
    expression tree (codegen blowup measured at ~100× slowdown)."""
    buckets = F.transform(token_hashes(text), lambda h: h % dim)
    tf = F.aggregate(
        buckets,
        F.array_repeat(F.lit(0.0), dim),
        lambda acc, b: F.transform(
            acc, lambda x, i: F.when(i.cast("long") == b, x + 1.0).otherwise(x)
        ),
    )
    ss = F.aggregate(tf, F.lit(0.0), lambda acc, x: acc + x * x)
    return F.when(ss == 0.0, tf).otherwise(F.transform(tf, lambda x: x / F.sqrt(ss)))


def hash_embed_coords(
    df: DataFrame, id_col: str, text_col: str, dim: int = DEFAULT_DIM,
    round_to: int = 6,
) -> DataFrame:
    """(id, bucket long, weight double): non-zero coordinates of the dense
    hashing embedding — tf per (doc, bucket) over explode + groupBy (map-side
    combined), L2 norm per doc, weight = tf / norm.

    Mirrors the oracle SQL shape exactly; the norm join is keyed by doc id so
    both shuffles are uniform at scale."""
    exploded = spread_if_narrow(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col),
        F.explode(F.transform(token_hashes(text_col), lambda h: h % dim)).alias("bucket"),
    )
    tf = exploded.groupBy(id_col, "bucket").agg(F.count("*").cast("double").alias("tf"))
    norm = tf.groupBy(id_col).agg(F.sqrt(F.sum(F.col("tf") * F.col("tf"))).alias("__nrm"))
    return (
        tf.join(norm, on=id_col)
        .select(
            F.col(id_col),
            F.col("bucket").cast("long").alias("bucket"),
            F.round(F.col("tf") / F.col("__nrm"), round_to).alias("weight"),
        )
    )


def splade_like_coords(
    df: DataFrame, id_col: str, text_col: str, vocab: int = SPLADE_VOCAB,
    round_to: int | None = 6,
) -> DataFrame:
    """Sparse lexical embedding in SPLADE coordinate shape:
    (id, term_bucket long, value double = ln(1+tf) > 0).

    explode → groupBy(id, bucket) with map-side combine — one shuffle keyed by
    (doc, term), uniform by construction (hash buckets), skew-safe.
    """
    exploded = spread_if_narrow(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col),
        F.explode(F.transform(token_hashes(text_col), lambda h: h % vocab)).alias("term_bucket"),
    )
    value = F.log(F.lit(1.0) + F.col("tf").cast("double"))
    if round_to is not None:
        value = F.round(value, round_to)
    return (
        exploded.groupBy(id_col, "term_bucket")
        .agg(F.count("*").alias("tf"))
        .select(
            F.col(id_col),
            F.col("term_bucket").cast("long").alias("term_bucket"),
            value.alias("value"),
        )
    )


def sparse_dot_coords(
    a: DataFrame, b: DataFrame, id_a: str, id_b: str,
    bucket_col: str = "term_bucket", value_col: str = "value",
    round_to: int = 6,
) -> DataFrame:
    """Sparse dot product between two coordinate-form embedding sets:
    equi-join on the term bucket, multiply, sum per pair — the distributed
    form of sparse lexical scoring (shuffle keyed by term bucket, then by
    pair)."""
    aa = a.select(F.col(id_a), F.col(bucket_col), F.col(value_col).alias("__va"))
    bb = b.select(F.col(id_b), F.col(bucket_col), F.col(value_col).alias("__vb"))
    return (
        aa.join(bb, on=bucket_col)
        .groupBy(id_a, id_b)
        .agg(F.round(F.sum(F.col("__va") * F.col("__vb")), round_to).alias("dot"))
    )
