"""Embedding compression / quantized-search operators.

The reference ships INT8 and 4-bit quantized *model* variants
(src/models/quantization.rs:1-8, src/text_embedding/impl.rs:233-283) but
searches in f32. At 100 TB the vectors themselves dominate storage and
shuffle width, so this module adds the two standard vector-compression
search paths plus Matryoshka truncation, all as pure DataFrame algebra
(JVM-side, whole-stage codegen — no Python in the hot path):

* **Binary quantization** — one sign bit per dimension packed into 32-bit
  words inside BIGINT columns. A 64-dim f32 vector (256 B) becomes two
  longs (16 B); Hamming similarity is two XOR+popcount instructions.
  Ranking by Hamming is the 100 TB scan path; an optional exact-cosine
  rescore over an oversampled candidate set recovers accuracy.
* **Scalar (int8) quantization** — per-dimension min/max over the corpus
  (a 64-row aggregate), then codes in 0..255; similarity is an integer
  dot product (exact arithmetic — no float nondeterminism in the rank).
* **Matryoshka (MRL) truncation** — keep the first ``d`` dimensions and
  re-rank with cosine on the prefix; the cheap-first stage of a
  coarse-to-fine funnel.

All score columns that feed a ranking are integers or rounded doubles so
rankings hash-match a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from fastembed_rs_spark.functions.vector import cosine_similarity
from fastembed_rs_spark.operators.topk import _ranked_topk

#: bits packed per BIGINT word (kept at 32 so 1<<i never touches the sign
#: bit — the same packing is reproducible in any engine with 64-bit ints)
WORD_BITS = 32


def pack_sign_bits(vec: Column | str, dim: int) -> list[Column]:
    """Pack the sign bits of a ``dim``-length float array into
    ``ceil(dim/32)`` BIGINT words (bit i of word w = 1 iff v[32w+i] >= 0).

    The >= 0 convention matches "binarize around zero" for L2-normalized
    embeddings (symmetric distributions); zero maps to 1 so the code of a
    zero vector is well-defined.
    """
    v = F.col(vec) if isinstance(vec, str) else vec
    words = []
    for w in range((dim + WORD_BITS - 1) // WORD_BITS):
        # flat (bool→long) << i sum: same value as a CASE WHEN chain but a
        # 3-node term instead of 7, which halves the Catalyst/janino
        # compile time of the packed expression (the dominant cost of this
        # operator on small corpora; at index-build scale it amortizes)
        bits = F.lit(0).cast("long")
        for i in range(WORD_BITS):
            d = w * WORD_BITS + i
            if d >= dim:
                break
            bits = bits + F.shiftleft((F.get(v, d) >= 0).cast("long"), i)
        words.append(bits)
    return words


def binary_quantize(
    df: DataFrame, vec_col: str, dim: int, prefix: str = "bq"
) -> DataFrame:
    """Add packed sign-bit columns ``{prefix}0..{prefix}{n-1}`` to ``df``."""
    words = pack_sign_bits(vec_col, dim)
    for i, wcol in enumerate(words):
        df = df.withColumn(f"{prefix}{i}", wcol)
    return df


def hamming_similarity(dim: int, a_prefix: str, b_prefix: str) -> Column:
    """``dim - popcount(a XOR b)`` over the packed words — the number of
    dimensions whose signs agree. Integer-valued: rankings are exact."""
    n_words = (dim + WORD_BITS - 1) // WORD_BITS
    dist = F.lit(0).cast("long")
    for w in range(n_words):
        dist = dist + F.bit_count(
            F.col(f"{a_prefix}{w}").bitwiseXOR(F.col(f"{b_prefix}{w}"))
        )
    return (F.lit(dim).cast("long") - dist).alias("hamming_sim")


def binary_hamming_top_k(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    dim: int,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rescore_factor: int | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Top-k by packed-sign Hamming similarity, with optional exact-cosine
    rescoring of an oversampled candidate set (qdrant-style oversampling).

    Without ``rescore_factor``: returns (query_id, id_col, hamming_sim,
    rank). With it: the top ``k*rescore_factor`` Hamming candidates per
    query are re-scored with exact cosine (rounded to ``round_to`` before
    ranking) and the final (query_id, id_col, score, rank) top-k returned.

    Scale shape: corpus is scanned once through codegen XOR+popcount on
    16 B/vector; only candidates carry the full float vector into the
    rescore. The queries side is broadcast.
    """
    q = binary_quantize(queries, query_vec, dim, prefix="qb").select(
        query_id, query_vec, *[f"qb{w}" for w in range((dim + 31) // 32)]
    )
    c = binary_quantize(corpus, vec_col, dim, prefix="cb")
    scored = c.crossJoin(F.broadcast(q)).withColumn(
        "hamming_sim", hamming_similarity(dim, "qb", "cb")
    )
    n_cand = k if rescore_factor is None else k * rescore_factor
    cands = _ranked_topk(scored, query_id, id_col, n_cand, score_col="hamming_sim")
    if rescore_factor is None:
        return cands.select(query_id, id_col, "hamming_sim", "rank")
    # interpreted (lambda-fold) cosine, deliberately NOT the unrolled
    # fixed-dim chain: the rescore touches only k·factor rows per query,
    # where the ~10·dim-node codegen chain costs far more to compile than
    # interpreted evaluation costs to run — the inverse of the corpus-scan
    # tradeoff. Fold order matches the fixed chain, so scores are
    # bit-identical (functions/vector.py).
    rescored = cands.drop("rank").withColumn(
        "score", F.round(cosine_similarity(query_vec, vec_col), round_to)
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("score"), F.asc(id_col))
    return (
        rescored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(query_id, id_col, "score", "rank")
    )


def scalar_quantize_codes(vec_col: str) -> Column:
    """Symmetric int8 codes of an L2-normalized vector:
    ``floor(x / (‖v‖) * 127)`` per dimension, i.e. codes in −127..127.

    Symmetry matters: a min/max-shifted (asymmetric) code adds a large
    per-dimension offset, and the integer dot of two offset codes is
    dominated by code magnitudes rather than direction — its ranking is
    uncorrelated with cosine. Normalizing first and scaling around zero
    makes ``Σ code_q·code_c ≈ 127² · cosine(q, c)``, so the integer-dot
    ranking approximates the cosine ranking with ~1/127 quantization
    error and needs NO calibration pass at all.

    Zero vectors code to all-zero. All math in DOUBLE then floored to
    BIGINT — bit-reproducible across engines."""
    v = F.col(vec_col).cast("array<double>")
    nrm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))
    safe = F.when(nrm == 0.0, F.lit(1.0)).otherwise(nrm)
    return F.transform(v, lambda x: F.floor(x / safe * F.lit(127.0)))


def int8_dot(a: Column | str, b: Column | str) -> Column:
    """Integer dot product of two code arrays — exact (no float order
    sensitivity), so rankings need no rounding discipline at all."""
    ac = F.col(a) if isinstance(a, str) else a
    bc = F.col(b) if isinstance(b, str) else b
    prods = F.zip_with(ac, bc, lambda x, y: x * y)
    return F.aggregate(
        prods, F.lit(0).cast("long"), lambda acc, x: acc + F.coalesce(x, F.lit(0).cast("long"))
    )


def int8_quant_top_k(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scalar-quantized top-k: symmetric int8 codes of the L2-normalized
    vectors on both sides, ranked by exact integer dot (≈ 127²·cosine).

    Returns (query_id, id_col, qdot long, rank long). 4× narrower
    vectors than f32 and integer arithmetic in the scan; no calibration
    pass (normalization bounds every component to [−1, 1])."""
    c = corpus.select(id_col, scalar_quantize_codes(vec_col).alias("__ccode"))
    q = queries.select(query_id, scalar_quantize_codes(query_vec).alias("__qcode"))
    # the interpreted zip_with/aggregate fold is deliberately KEPT (r10
    # A/B): a flat 64-term codegen chain of per-element get()+coalesce
    # measured 1.7x SLOWER (fold 1.2-1.4s vs chain 2.0-2.5s, min-of-4
    # same-session) — array-element codegen pays bounds/null checks per
    # get that the fold's single array traversal does not
    scored = c.crossJoin(F.broadcast(q)).select(
        query_id, id_col, int8_dot("__qcode", "__ccode").alias("qdot")
    )
    return _ranked_topk(scored, query_id, id_col, k, score_col="qdot").select(
        query_id, id_col, "qdot", "rank"
    )


def mrl_truncate(vec_col: str, d: int) -> Column:
    """First ``d`` dimensions of an embedding (Matryoshka prefix). Cosine
    over the prefix needs no re-normalization — norms are recomputed by the
    scorer."""
    return F.slice(F.col(vec_col), 1, d)
