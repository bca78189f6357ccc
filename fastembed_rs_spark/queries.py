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


# ===========================================================================
# 1. Dense similarity family (SURVEY §2.1 rows 14-16)
# ===========================================================================

@q(
    "cosine_topk",
    f"""
WITH qv AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
scored AS (
  SELECT qv.query_id, e.vec_id,
         round({_dk_cos('qv.qe', 'e.embedding')}, 6) AS score
  FROM qv CROSS JOIN embeddings e
)
SELECT query_id, vec_id, score,
       row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id ASC) AS rank
FROM scored
QUALIFY rank <= 10
""",
    "brute-force cosine top-10, 5 query vectors vs whole corpus (src/similarity.rs:31-40)",
)
def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    # dim=EMB_DIM deliberately NOT passed: at this corpus size the unrolled
    # codegen chain costs more in stage compilation than it saves; the
    # fixed-dim path wins only on multi-million-row pair joins
    return cosine_top_k(queries, emb, k=10, round_to=6).select(
        "query_id", "vec_id", "score", "rank"
    )


@q(
    "cosine_topk_filtered",
    f"""
WITH qv AS (SELECT vec_id AS query_id, embedding AS qe, label AS want
            FROM embeddings WHERE vec_id < 8),
cand AS (SELECT vec_id, embedding, label FROM embeddings WHERE label IS NOT NULL),
scored AS (
  SELECT qv.query_id, c.vec_id, c.label,
         round({_dk_cos('qv.qe', 'c.embedding')}, 6) AS score
  FROM qv JOIN cand c ON c.label = qv.want
)
SELECT query_id, vec_id, label, score,
       row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id ASC) AS rank
FROM scored
QUALIFY rank <= 5
""",
    "filtered vector search (the vector-DB staple): top-5 by cosine among "
    "ONLY the candidates whose metadata matches each query's predicate "
    "(label equality here) — PRE-filtering as a broadcast equi-join on the "
    "metadata key, so scoring touches the matching slice instead of "
    "scoring everything and discarding (post-filter, which also "
    "under-fills k). The label filter reaches the candidate scan",
)
def q_cosine_topk_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        F.col("label").alias("__want"),
    )
    cand = emb.filter(F.col("label").isNotNull())
    scored = cand.join(
        F.broadcast(queries), cand["label"] == F.col("__want")
    ).select(
        "query_id", "vec_id", "label",
        F.round(cosine_similarity("query_vec", "embedding"), 6).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
    )


@q(
    "dot_pairs",
    f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round({_dk_dot('a.embedding', 'b.embedding')}, 6) AS dot
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE a.vec_id < 20 AND b.vec_id < 20
""",
    "pairwise dot product (src/similarity.rs:13-16)",
)
def q_dot_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 20)
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("__va"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("__vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(dot("__va", "__vb"), 6).alias("dot"))
    )


@q(
    "embedding_neardup",
    f"""
SELECT * FROM (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         round({_dk_cos('a.embedding', 'b.embedding')}, 6) AS score
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
) WHERE score >= 0.4
""",
    "embedding-cosine near-duplicate pairs (beyond-reference dedup operator)",
)
def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # blocked tile variant: B(B+1)/2 NumPy tile products instead of n²/2
    # row-level expressions; bit-identical scores (see the operator docstring)
    return D.embedding_near_dups_blocked(t(spark, sf_dir, "embeddings"), threshold=0.4)


#: sample id bound for ANN codebooks / coarse-centroid samples: modulo
#: samples take only ids below this, so centroid and code counts are
#: CONSTANT (the faiss shape — k centroids / 2^nbits codes are fixed at
#: index build, not corpus-proportional) and the corpus × books scoring
#: scans stay LINEAR in the corpus. A no-op at the driver SFs (every
#: vec_id < 2048 there) — the bound exists for the 10x+ regimes, where
#: unbounded books made encode/assign quadratic (sf1 proof: 20x/10x on
#: RQ, 14x/10x on IVF-PQ before bounding). NOT applied to the bucketed
#: dedup/outlier family (semantic_dedup etc.), whose 1-in-50 centroid
#: DENSITY is what keeps bucket sizes — and the within-bucket pair work —
#: constant per row.
_ANN_ID_BOUND = 2048

_IVF_ORACLE = f"""
WITH cent AS (
  SELECT vec_id AS centroid_id, embedding AS ce FROM embeddings
  WHERE vec_id % 50 = 0 AND vec_id < {_ANN_ID_BOUND}
),
assign AS (
  SELECT e.vec_id, e.embedding, c.centroid_id,
         round({_dk_cos('e.embedding', 'c.ce')}, 6) AS cscore
  FROM embeddings e CROSS JOIN cent c
  QUALIFY row_number() OVER (PARTITION BY e.vec_id ORDER BY cscore DESC, c.centroid_id ASC) = 1
),
qv AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
probes AS (
  SELECT qv.query_id, qv.qe, c.centroid_id,
         round({_dk_cos('qv.qe', 'c.ce')}, 6) AS pscore
  FROM qv CROSS JOIN cent c
  QUALIFY row_number() OVER (PARTITION BY qv.query_id ORDER BY pscore DESC, c.centroid_id ASC) <= 3
),
scored AS (
  SELECT p.query_id, a.vec_id, round({_dk_cos('p.qe', 'a.embedding')}, 6) AS score
  FROM probes p JOIN assign a ON p.centroid_id = a.centroid_id
)
SELECT query_id, vec_id, score,
       row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id ASC) AS rank
FROM scored
QUALIFY rank <= 5
"""


@q(
    "ann_ivf_topk",
    _IVF_ORACLE,
    "IVF-style ANN: bucket corpus by nearest coarse centroid (deterministic "
    "1-in-50 sample CAPPED to a fixed id bound — constant centroid count "
    "like a faiss coarse quantizer, so assignment stays linear in the "
    "corpus and the driver-collected centroid set is constant), probe 3 "
    "buckets (beyond-reference scale path for top-k)",
)
def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    centroids = emb.filter(
        (F.col("vec_id") % 50 == 0) & (F.col("vec_id") < _ANN_ID_BOUND)
    ).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centroid_vec")
    )
    bucketed = assign_ivf_buckets_fast(emb, centroids)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = ivf_top_k(queries, bucketed, centroids, k=5, nprobe=3, round_to=6)
    return out.select("query_id", "vec_id", "score", "rank")


_PQ_M, _PQ_DSUB, _PQ_EVERY = 8, 8, 125

_PQ_SLICE = (
    "list_transform(generate_series(1, {dsub}), i -> "
    "CAST({v}[subspace * {dsub} + i] AS DOUBLE))"
)

_PQ_ORACLE = f"""
WITH subs AS (SELECT unnest(generate_series(0, {_PQ_M - 1})) AS subspace),
cb AS (
  SELECT s.subspace, e.vec_id AS code_id,
         {_PQ_SLICE.format(dsub=_PQ_DSUB, v='e.embedding')} AS code_vec
  FROM embeddings e CROSS JOIN subs s
  WHERE e.vec_id % {_PQ_EVERY} = 0 AND e.vec_id < {_ANN_ID_BOUND}
),
sv AS (
  SELECT e.vec_id, s.subspace,
         {_PQ_SLICE.format(dsub=_PQ_DSUB, v='e.embedding')} AS subvec
  FROM embeddings e CROSS JOIN subs s
),
enc AS (
  SELECT sv.vec_id, sv.subspace, cb.code_id,
         round(coalesce(list_sum(list_transform(generate_series(1, {_PQ_DSUB}),
           i -> (sv.subvec[i] - cb.code_vec[i]) * (sv.subvec[i] - cb.code_vec[i]))), 0.0), 6) AS d2
  FROM sv JOIN cb ON sv.subspace = cb.subspace
  QUALIFY row_number() OVER (PARTITION BY sv.vec_id, sv.subspace
                             ORDER BY d2 ASC, cb.code_id ASC) = 1
),
qsub AS (
  SELECT vec_id AS query_id, subspace, subvec AS qsubvec FROM sv WHERE vec_id < 5
),
lut AS (
  SELECT q.query_id, q.subspace, cb.code_id,
         round(coalesce(list_sum(list_transform(generate_series(1, {_PQ_DSUB}),
           i -> q.qsubvec[i] * cb.code_vec[i])), 0.0), 6) AS pdot
  FROM qsub q JOIN cb ON q.subspace = cb.subspace
),
scored AS (
  SELECT l.query_id, enc.vec_id,
         round(coalesce(list_sum(list(l.pdot ORDER BY l.subspace)), 0.0), 6) AS score
  FROM enc JOIN lut l ON enc.subspace = l.subspace AND enc.code_id = l.code_id
  GROUP BY l.query_id, enc.vec_id
)
SELECT query_id, vec_id, score,
       row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id ASC) AS rank
FROM scored
QUALIFY rank <= 10
"""


@q(
    "ann_pq_adc_topk",
    _PQ_ORACLE,
    "product-quantization ANN: 8x8 subvector codebooks (deterministic "
    "1-in-125 sample capped to a fixed id bound — CONSTANT book size like "
    "faiss's 2^nbits, keeping the corpus × codebook encode scan linear), "
    "L2 encoding, asymmetric-distance top-10 via broadcast LUT join "
    "(compressed-domain scale path; Jégou et al. 2011)",
)
def q_ann_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators import pq

    emb = t(spark, sf_dir, "embeddings")
    books = pq.sample_pq_codebooks(
        emb, "vec_id", "embedding", m=_PQ_M, dsub=_PQ_DSUB, every=_PQ_EVERY,
        id_bound=_ANN_ID_BOUND,
    )
    codes = pq.pq_encode(emb, books, "vec_id", "embedding", m=_PQ_M, dsub=_PQ_DSUB)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = pq.pq_adc_topk(queries, codes, books, k=10, m=_PQ_M, dsub=_PQ_DSUB)
    return out.select("query_id", "vec_id", "score", "rank")


_IVF_PQ_ORACLE = f"""
WITH cent AS (
  SELECT vec_id AS centroid_id, embedding AS ce FROM embeddings
  WHERE vec_id % 50 = 0 AND vec_id < {_ANN_ID_BOUND}
),
assign AS (
  SELECT e.vec_id, c.centroid_id,
         round({_dk_cos('e.embedding', 'c.ce')}, 6) AS cscore
  FROM embeddings e CROSS JOIN cent c
  QUALIFY row_number() OVER (PARTITION BY e.vec_id ORDER BY cscore DESC, c.centroid_id ASC) = 1
),
qv AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
probes AS (
  SELECT qv.query_id, c.centroid_id,
         round({_dk_cos('qv.qe', 'c.ce')}, 6) AS pscore
  FROM qv CROSS JOIN cent c
  QUALIFY row_number() OVER (PARTITION BY qv.query_id ORDER BY pscore DESC, c.centroid_id ASC) <= 3
),
subs AS (SELECT unnest(generate_series(0, {_PQ_M - 1})) AS subspace),
cb AS (
  SELECT s.subspace, e.vec_id AS code_id,
         {_PQ_SLICE.format(dsub=_PQ_DSUB, v='e.embedding')} AS code_vec
  FROM embeddings e CROSS JOIN subs s
  WHERE e.vec_id % {_PQ_EVERY} = 0 AND e.vec_id < {_ANN_ID_BOUND}
),
sv AS (
  SELECT e.vec_id, s.subspace,
         {_PQ_SLICE.format(dsub=_PQ_DSUB, v='e.embedding')} AS subvec
  FROM embeddings e CROSS JOIN subs s
),
enc AS (
  SELECT sv.vec_id, sv.subspace, cb.code_id,
         round(coalesce(list_sum(list_transform(generate_series(1, {_PQ_DSUB}),
           i -> (sv.subvec[i] - cb.code_vec[i]) * (sv.subvec[i] - cb.code_vec[i]))), 0.0), 6) AS d2
  FROM sv JOIN cb ON sv.subspace = cb.subspace
  QUALIFY row_number() OVER (PARTITION BY sv.vec_id, sv.subspace
                             ORDER BY d2 ASC, cb.code_id ASC) = 1
),
qsub AS (
  SELECT vec_id AS query_id, subspace, subvec AS qsubvec FROM sv WHERE vec_id < 5
),
lut AS (
  SELECT q.query_id, q.subspace, cb.code_id,
         round(coalesce(list_sum(list_transform(generate_series(1, {_PQ_DSUB}),
           i -> q.qsubvec[i] * cb.code_vec[i])), 0.0), 6) AS pdot
  FROM qsub q JOIN cb ON q.subspace = cb.subspace
),
scored AS (
  SELECT l.query_id, enc.vec_id,
         round(coalesce(list_sum(list(l.pdot ORDER BY l.subspace)), 0.0), 6) AS score
  FROM enc
  JOIN assign a ON enc.vec_id = a.vec_id
  JOIN probes p ON p.centroid_id = a.centroid_id
  JOIN lut l ON enc.subspace = l.subspace AND enc.code_id = l.code_id
            AND l.query_id = p.query_id
  GROUP BY l.query_id, enc.vec_id
)
SELECT query_id, vec_id, score,
       row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id ASC) AS rank
FROM scored
QUALIFY rank <= 5
"""


@q(
    "ann_ivf_pq_topk",
    _IVF_PQ_ORACLE,
    "IVF-PQ (FAISS IVFADC shape; Jégou et al. 2011 §IV): coarse 1-in-50 "
    "centroids prune to 3 probed buckets per query, then asymmetric-"
    "distance scoring through 8x8 PQ codes WITHIN those buckets only — "
    "raw vectors are never read at query time. The probe table and ADC "
    "LUT both broadcast; the code table joins on the bucket id (at scale: "
    "hive-partitioned by it, so the probe join prunes partitions) and the "
    "only shuffle is the per-(query,vector) fold over candidates",
)
def q_ann_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators import pq

    emb = t(spark, sf_dir, "embeddings")
    centroids = emb.filter(
        (F.col("vec_id") % 50 == 0) & (F.col("vec_id") < _ANN_ID_BOUND)
    ).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centroid_vec")
    )
    bucketed = assign_ivf_buckets_fast(emb, centroids)
    books = pq.sample_pq_codebooks(
        emb, "vec_id", "embedding", m=_PQ_M, dsub=_PQ_DSUB, every=_PQ_EVERY,
        id_bound=_ANN_ID_BOUND,
    )
    codes = pq.pq_encode(emb, books, "vec_id", "embedding", m=_PQ_M, dsub=_PQ_DSUB)
    codes_bucketed = codes.join(bucketed.select("vec_id", "centroid_id"), "vec_id")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = pq.ivf_pq_topk(
        queries, codes_bucketed, centroids, books, k=5, nprobe=3,
        m=_PQ_M, dsub=_PQ_DSUB,
    )
    return out.select("query_id", "vec_id", "score", "rank")


def _pq_train_enc_ctes(
    m: int, dsub: int, k: int, iters: int, seed: int = 42,
) -> tuple[str, str]:
    """Chained-CTE replay of ``pq.train_pq_codebooks`` + ``pq.pq_encode``,
    ending in ``enc`` (vec_id, subspace, code_id, d2 rounded to 6) with
    ``sv`` (per-vector subvectors) also in scope. Returns
    ``(cte_sql, final_codebook_cte_name)``; callers append further CTEs
    with a leading comma. Shared by the trained-PQ searcher oracles and
    ``pq_reconstruction_error`` so the training replay is pinned once."""
    h = duck_token_hash(f"(sv.vec_id::VARCHAR || '#pq{seed}')")
    sq = (
        "coalesce(list_sum(list_transform(generate_series(1, {dsub}), "
        "i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i]))), 0.0)"
    )
    parts = [f"""
WITH subs AS (SELECT unnest(generate_series(0, {m - 1})) AS subspace),
sdims AS (SELECT unnest(generate_series(1, {dsub})) AS d),
sv AS (
  SELECT e.vec_id, s.subspace,
         {_PQ_SLICE.format(dsub=dsub, v='e.embedding')} AS subvec
  FROM embeddings e CROSS JOIN subs s
),
c0 AS (
  SELECT subspace,
         CAST(row_number() OVER (PARTITION BY subspace ORDER BY hh, vec_id) - 1 AS INT) AS code_id,
         subvec AS code_vec
  FROM (SELECT sv.vec_id, sv.subspace, sv.subvec, {h} AS hh FROM sv)
  QUALIFY row_number() OVER (PARTITION BY subspace ORDER BY hh, vec_id) <= {k}
)"""]
    prev = "c0"
    for it in range(1, iters + 1):
        d2 = sq.format(dsub=dsub, a="sv.subvec", b="c.code_vec")
        parts.append(f""",
a{it} AS (
  SELECT sv.vec_id, sv.subspace, sv.subvec, c.code_id, {d2} AS d2
  FROM sv JOIN {prev} c ON sv.subspace = c.subspace
  QUALIFY row_number() OVER (PARTITION BY sv.vec_id, sv.subspace
                             ORDER BY d2 ASC, c.code_id ASC) = 1
),
c{it} AS (
  SELECT subspace, code_id, list(mu ORDER BY d) AS code_vec FROM (
    SELECT a.subspace, a.code_id, sdims.d, round(avg(a.subvec[sdims.d]), 9) AS mu
    FROM a{it} a CROSS JOIN sdims
    GROUP BY a.subspace, a.code_id, sdims.d
  ) GROUP BY subspace, code_id
)""")
        prev = f"c{it}"
    enc_d2 = sq.format(dsub=dsub, a="sv.subvec", b="c.code_vec")
    parts.append(f""",
enc AS (
  SELECT sv.vec_id, sv.subspace, c.code_id, round({enc_d2}, 6) AS d2
  FROM sv JOIN {prev} c ON sv.subspace = c.subspace
  QUALIFY row_number() OVER (PARTITION BY sv.vec_id, sv.subspace
                             ORDER BY d2 ASC, c.code_id ASC) = 1
)""")
    return "".join(parts), prev


def _pq_trained_oracle(
    m: int, dsub: int, k: int, iters: int, nq: int, topk: int, seed: int = 42,
    rescore_factor: int | None = None,
) -> str:
    """Replay of ``pq.train_pq_codebooks`` + encode + ADC as chained CTEs:
    iterations are fixed and seeded, init orders by the shared rolling hash,
    and per-iteration means are rounded to 9 decimals on both engines, so
    Lloyd's is DuckDB-expressible. ``rescore_factor`` appends the
    ``pq.pq_adc_rescore_topk`` tier: shortlist topk·factor by ADC score,
    exact-cosine rescore of only that shortlist, re-rank to topk."""
    dot = (
        "coalesce(list_sum(list_transform(generate_series(1, {dsub}), "
        "i -> {a}[i] * {b}[i])), 0.0)"
    )
    ctes, prev = _pq_train_enc_ctes(m, dsub, k, iters, seed=seed)
    lut_dot = dot.format(dsub=dsub, a="q.qsubvec", b="c.code_vec")
    parts = [ctes]
    parts.append(f""",
qsub AS (SELECT vec_id AS query_id, subspace, subvec AS qsubvec FROM sv WHERE vec_id < {nq}),
lut AS (
  SELECT q.query_id, q.subspace, c.code_id, round({lut_dot}, 6) AS pdot
  FROM qsub q JOIN {prev} c ON q.subspace = c.subspace
),
scored AS (
  SELECT l.query_id, enc.vec_id,
         round(coalesce(list_sum(list(l.pdot ORDER BY l.subspace)), 0.0), 6) AS score
  FROM enc JOIN lut l ON enc.subspace = l.subspace AND enc.code_id = l.code_id
  GROUP BY l.query_id, enc.vec_id
)""")
    if rescore_factor is None:
        parts.append(f"""
SELECT query_id, vec_id, score,
       row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id ASC) AS rank
FROM scored
QUALIFY rank <= {topk}""")
    else:
        parts.append(f""",
short AS (
  SELECT query_id, vec_id FROM scored
  QUALIFY row_number() OVER (PARTITION BY query_id
                             ORDER BY score DESC, vec_id ASC)
          <= {topk * rescore_factor}
),
resc AS (
  SELECT s.query_id, s.vec_id,
         round({_dk_cos('qe.embedding', 'e.embedding')}, 6) AS score
  FROM short s
  JOIN embeddings e ON e.vec_id = s.vec_id
  JOIN embeddings qe ON qe.vec_id = s.query_id
)
SELECT query_id, vec_id, score,
       row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id ASC) AS rank
FROM resc
QUALIFY rank <= {topk}""")
    return "".join(parts)


@q(
    "ann_pq_trained",
    _pq_trained_oracle(m=_PQ_M, dsub=_PQ_DSUB, k=8, iters=2, nq=3, topk=5),
    "PQ with k-means-trained codebooks: all 8 subspaces trained in one DataFrame "
    "pipeline (Lloyd's, stage count independent of m); seeded fixed-iteration "
    "training replayed by the oracle as chained CTEs",
)
def q_ann_pq_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators import pq

    emb = t(spark, sf_dir, "embeddings")
    books = pq.train_pq_codebooks(
        emb, "vec_id", "embedding", m=_PQ_M, dsub=_PQ_DSUB, k=8, iters=2
    )
    codes = pq.pq_encode(emb, books, "vec_id", "embedding", m=_PQ_M, dsub=_PQ_DSUB)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = pq.pq_adc_topk(queries, codes, books, k=5, m=_PQ_M, dsub=_PQ_DSUB)
    return out.select("query_id", "vec_id", "score", "rank")


@q(
    "ann_pq_rescore",
    _pq_trained_oracle(
        m=_PQ_M, dsub=_PQ_DSUB, k=8, iters=2, nq=3, topk=5, rescore_factor=4
    ),
    "PQ-ADC shortlist + exact cosine rescore (the quantized-search recall-"
    "recovery tier, ANN_RECALL.md): trained codebooks score ALL vectors "
    "through the compressed codes, the top k*4 per query get re-scored "
    "against raw vectors — full-precision reads stay proportional to "
    "k*factor per query, never corpus size. Oracle replays training + "
    "encode + ADC + shortlist + rescore as chained CTEs",
)
def q_ann_pq_rescore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators import pq

    emb = t(spark, sf_dir, "embeddings")
    books = pq.train_pq_codebooks(
        emb, "vec_id", "embedding", m=_PQ_M, dsub=_PQ_DSUB, k=8, iters=2
    )
    codes = pq.pq_encode(emb, books, "vec_id", "embedding", m=_PQ_M, dsub=_PQ_DSUB)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = pq.pq_adc_rescore_topk(
        queries, codes, books, emb, k=5, rescore_factor=4,
        m=_PQ_M, dsub=_PQ_DSUB,
    )
    return out.select("query_id", "vec_id", "score", "rank")


# ===========================================================================
# 2. Hashing embedder (SQL-verifiable model; SURVEY §2.1 rows 1,7,9 analogues)
# ===========================================================================

_HASH_EMBED_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest(list_transform({duck_tokens('text')}, tk -> {duck_token_hash('tk')} % 64)) AS bucket
  FROM documents
),
tf AS (SELECT doc_id, bucket, CAST(COUNT(*) AS DOUBLE) AS tf FROM toks GROUP BY doc_id, bucket),
norm AS (SELECT doc_id, sqrt(SUM(tf * tf)) AS nrm FROM tf GROUP BY doc_id)
SELECT tf.doc_id, CAST(tf.bucket AS BIGINT) AS bucket, round(tf.tf / norm.nrm, 6) AS weight
FROM tf JOIN norm ON tf.doc_id = norm.doc_id
"""


@q(
    "dense_hash_embed",
    _HASH_EMBED_ORACLE,
    "feature-hashing dense embedding, L2-normalized, coordinate form "
    "(SQL-verifiable analogue of TextEmbedding::embed, src/text_embedding/impl.rs:432-449)",
)
def q_dense_hash_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NumPy kernel (exact integer hash math — bit-identical to the
    # expression path, see operators/fast_text.py's exactness argument)
    from fastembed_rs_spark.operators.fast_text import hash_embed_coords_fast

    return hash_embed_coords_fast(t(spark, sf_dir, "documents"), "doc_id", "text", dim=64)


_SPLADE_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest(list_transform({duck_tokens('text')}, tk -> {duck_token_hash('tk')} % 30000)) AS term_bucket
  FROM documents
)
SELECT doc_id, CAST(term_bucket AS BIGINT) AS term_bucket,
       round(ln(1.0 + CAST(COUNT(*) AS DOUBLE)), 6) AS value
FROM toks GROUP BY doc_id, term_bucket
"""


@q(
    "splade_hash_sparse",
    _SPLADE_ORACLE,
    "sparse lexical embedding, SPLADE coordinate shape: ln(1+tf) > 0 per term bucket "
    "(src/sparse_text_embedding/impl.rs:225-254 analogue)",
)
def q_splade_hash_sparse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.fast_text import splade_like_coords_fast

    return splade_like_coords_fast(t(spark, sf_dir, "documents"), "doc_id", "text", vocab=30000)


_SPARSE_DOT_ORACLE = f"""
WITH coords AS (
  SELECT doc_id, term_bucket, ln(1.0 + CAST(COUNT(*) AS DOUBLE)) AS value
  FROM (
    SELECT doc_id, unnest(list_transform({duck_tokens('text')}, tk -> {duck_token_hash('tk')} % 30000)) AS term_bucket
    FROM documents
  ) GROUP BY doc_id, term_bucket
),
qc AS (SELECT doc_id AS query_id, term_bucket, value FROM coords WHERE doc_id < 3),
dots AS (
  SELECT qc.query_id, c.doc_id, round(SUM(qc.value * c.value), 6) AS dot
  FROM qc JOIN coords c ON qc.term_bucket = c.term_bucket
  GROUP BY qc.query_id, c.doc_id
)
SELECT query_id, doc_id, dot,
       row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, doc_id ASC) AS rank
FROM dots
QUALIFY rank <= 10
"""


@q(
    "sparse_dot_topk",
    _SPARSE_DOT_ORACLE,
    "sparse lexical top-k: distributed sparse dot via term-bucket equi-join "
    "(lexical search parity for sparse embeddings)",
)
def q_sparse_dot_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.fast_text import splade_like_coords_fast

    docs = t(spark, sf_dir, "documents")
    # un-rounded coordinate values; only the final dot is rounded
    coords = splade_like_coords_fast(docs, "doc_id", "text", vocab=30000, round_to=None)
    qc = coords.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"), "term_bucket", "value"
    )
    dots = EH.sparse_dot_coords(qc, coords, "query_id", "doc_id")
    w = Window.partitionBy("query_id").orderBy(F.desc("dot"), F.asc("doc_id"))
    return (
        dots.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 10)
        .select("query_id", "doc_id", "dot", "rank")
    )


# ===========================================================================
# 3. Rerank (SURVEY §2.1 row 13)
# ===========================================================================

_RERANK_ORACLE = f"""
WITH qs AS (
  SELECT doc_id AS query_id, list_distinct({duck_tokens('text')}) AS qt
  FROM documents WHERE doc_id < 3
),
cand AS (
  SELECT doc_id, list_distinct({duck_tokens('text')}) AS dt
  FROM documents WHERE doc_id % 5 = 0
),
scored AS (
  SELECT qs.query_id, cand.doc_id,
         round(
           CASE WHEN (len(qt) = 0 AND len(dt) = 0) THEN 0.0 ELSE
             CAST(len(list_intersect(qt, dt)) AS DOUBLE)
             / (CAST(len(qt) AS DOUBLE) + CAST(len(dt) AS DOUBLE)
                - CAST(len(list_intersect(qt, dt)) AS DOUBLE))
           END, 6) AS score
  FROM qs CROSS JOIN cand
)
SELECT query_id, doc_id, score,
       row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank
FROM scored
QUALIFY rank <= 10
"""


@q(
    "rerank_overlap",
    _RERANK_ORACLE,
    "multi-query rerank with lexical pair scorer + per-query ranking "
    "(TextRerank::rerank shape, src/reranking/impl.rs:109-196)",
)
def q_rerank_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    qs = docs.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("__qtext")
    )
    cand = docs.filter(F.col("doc_id") % 5 == 0).select("doc_id", F.col("text").alias("__dtext"))
    pairs = cand.crossJoin(F.broadcast(qs))
    out = rerank(pairs, token_overlap_score(F.col("__qtext"), F.col("__dtext")), k=10)
    return out.select("query_id", "doc_id", "score", "rank")


# ===========================================================================
# 4. Dedup family (beyond-reference pipeline operators)
# ===========================================================================

@q(
    "exact_dedup",
    f"""
SELECT {duck_doc_fingerprint('text')} AS fingerprint,
       CAST(COUNT(*) AS BIGINT) AS n_docs, MIN(doc_id) AS canonical_id
FROM documents GROUP BY fingerprint
""",
    "exact dedup by token-stream fingerprint (hash groupBy)",
)
def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.fast_text import exact_dedup_fast

    return exact_dedup_fast(t(spark, sf_dir, "documents"), "doc_id", "text")


@q(
    "doc_fingerprint",
    f"SELECT doc_id, {duck_doc_fingerprint('text')} AS fingerprint FROM documents",
    "rolling-hash document fingerprint (whitespace/punct-insensitive)",
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.fast_text import doc_fingerprints_fast

    return doc_fingerprints_fast(t(spark, sf_dir, "documents"), "doc_id", "text")


def _minhash_cand_ctes() -> str:
    """MinHash(16) + LSH(4×4) candidate generation + exact-Jaccard verify
    as chained CTEs, ending in ``verified`` (id_a, id_b, jaccard rounded 6,
    unthresholded). Shared by ``minhash_lsh_neardup`` (threshold filter) and
    ``minhash_band_curve`` (S-curve planning over the measured pairs) so the
    candidate semantics are pinned once."""
    sig_cols = ",\n    ".join(
        f"MIN((hs * {a} + {b}) % {HASH_MOD}) AS mh_{i}"
        for i, (a, b) in enumerate(D.MINHASH_COEFFS)
    )
    bands = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, {bnum} AS band_idx, concat_ws('_', "
        + ", ".join(f"mh_{bnum * 4 + r}" for r in range(4))
        + ") AS band_key FROM sig"
        for bnum in range(4)
    )
    inter = "CAST(len(list_intersect(sa, sb)) AS DOUBLE)"
    return f"""
WITH sh AS (
  SELECT doc_id, unnest(list_distinct({_dk_shingles('text', 5)})) AS s
  FROM documents
),
h AS (SELECT doc_id, {duck_token_hash('s')} AS hs FROM sh),
sig AS (SELECT doc_id, {sig_cols} FROM h GROUP BY doc_id),
bands AS (
{bands}
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
shingle_sets AS (
  SELECT doc_id, list_distinct({_dk_shingles('text', 5)}) AS ss FROM documents
),
verified AS (
  SELECT cand.id_a, cand.id_b,
         round(
           CASE WHEN (len(sa) = 0 AND len(sb) = 0) THEN 0.0 ELSE
             {inter} / (CAST(len(sa) AS DOUBLE) + CAST(len(sb) AS DOUBLE) - {inter})
           END, 6) AS jaccard
  FROM cand
  JOIN (SELECT doc_id, ss AS sa FROM shingle_sets) A ON cand.id_a = A.doc_id
  JOIN (SELECT doc_id, ss AS sb FROM shingle_sets) B ON cand.id_b = B.doc_id
)"""


def _minhash_oracle() -> str:
    return f"""{_minhash_cand_ctes()}
SELECT id_a, id_b, jaccard FROM verified WHERE jaccard >= 0.2
"""


@q(
    "minhash_lsh_neardup",
    _minhash_oracle(),
    "MinHash(16)+LSH(4 bands x 4 rows) candidate pairs over 5-char shingles, "
    "verified by exact Jaccard >= 0.2 (canonical 100TB near-dedup)",
)
def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.fast_text import (
        minhash_signatures_fast,
        verify_candidates_fast,
    )

    docs = t(spark, sf_dir, "documents")
    sigs = minhash_signatures_fast(docs, "doc_id", "text", k_shingle=5)
    cand = D.lsh_candidate_pairs(sigs, "doc_id", bands=4, rows_per_band=4)
    return verify_candidates_fast(cand, docs, "doc_id", "text", k_shingle=5, threshold=0.2)


def _simhash_sql(hashes_expr: str) -> str:
    """DuckDB expression: 32-bit simhash from a BIGINT-list expression."""
    terms = []
    for j in range(32):
        p = 1 << j
        bit = f"(CAST(((h - (h % {p})) / {p}) AS BIGINT) % 2)"
        terms.append(
            f"CASE WHEN coalesce(list_sum(list_transform({hashes_expr}, "
            f"h -> {bit} * 2 - 1)), 0) > 0 THEN CAST({p} AS BIGINT) ELSE 0 END"
        )
    return "(" + " + ".join(terms) + ")"


_SIMHASH_ORACLE = f"""
SELECT doc_id,
       CASE WHEN len({duck_tokens('text')}) = 0 THEN 0
            ELSE {_simhash_sql(f"list_transform({duck_tokens('text')}, tk -> {duck_token_hash('tk')})")}
       END AS simhash
FROM documents
"""


@q(
    "simhash",
    _SIMHASH_ORACLE,
    "32-bit simhash over the token multiset (near-dup fingerprint)",
)
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.scale import spread_if_narrow

    docs = spread_if_narrow(t(spark, sf_dir, "documents").select("doc_id", "text"))
    return docs.select("doc_id", D.simhash("text").alias("simhash"))


# ===========================================================================
# 5. Text analysis (beyond-reference pipeline operators)
# ===========================================================================

def _lang_hits(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in TS.STOPWORDS[lang])
    return (
        f"CAST(len(list_filter({duck_tokens('text')}, tk -> list_contains([{words}], tk))) AS BIGINT)"
    )


_LANG_ORACLE = f"""
WITH hits AS (
  SELECT doc_id,
         {_lang_hits('en')} AS en_hits,
         {_lang_hits('fr')} AS fr_hits,
         {_lang_hits('es')} AS es_hits,
         {_lang_hits('de')} AS de_hits
  FROM documents
)
SELECT doc_id,
       CASE WHEN greatest(en_hits, fr_hits, es_hits, de_hits) = 0 THEN 'und'
            WHEN en_hits = greatest(en_hits, fr_hits, es_hits, de_hits) THEN 'en'
            WHEN fr_hits = greatest(en_hits, fr_hits, es_hits, de_hits) THEN 'fr'
            WHEN es_hits = greatest(en_hits, fr_hits, es_hits, de_hits) THEN 'es'
            ELSE 'de' END AS pred_lang,
       en_hits, fr_hits, es_hits, de_hits
FROM hits
"""


@q(
    "lang_id",
    _LANG_ORACLE,
    "stopword-hit language identification with deterministic argmax",
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.fast_text import text_stat_counts_fast

    docs = t(spark, sf_dir, "documents")
    counts = text_stat_counts_fast(docs, "doc_id", "text")
    return counts.select(
        "doc_id",
        TS.predicted_lang_from_counts().alias("pred_lang"),
        F.col("hits_en").alias("en_hits"),
        F.col("hits_fr").alias("fr_hits"),
        F.col("hits_es").alias("es_hits"),
        F.col("hits_de").alias("de_hits"),
    )


_ALL_SW = ", ".join(f"'{w}'" for w in sorted({w for ws in TS.STOPWORDS.values() for w in ws}))


def _duck_stats_ctes(carry: str = "") -> str:
    """``base``/``m`` CTE chain — the ONE source of truth for the per-doc
    text statistics in oracle SQL (mirror of text_stat_counts_fast +
    textstats *_from_counts). ``m`` exposes doc_id{carry}, n_tokens,
    avg_token_len, stopword_ratio, punct_ratio; ``carry`` threads extra
    document columns through (e.g. ", source"). Every quality-consuming
    oracle composes this — never a second copy of the formulas."""
    return f"""base AS (
  SELECT doc_id{carry},
         CAST(len({duck_tokens('text')}) AS BIGINT) AS n_tokens,
         CAST(coalesce(list_sum(list_transform({duck_tokens('text')}, tk -> length(tk))), 0) AS DOUBLE) AS tok_chars,
         CAST(len(list_filter({duck_tokens('text')}, tk -> list_contains([{_ALL_SW}], tk))) AS DOUBLE) AS sw_hits,
         CAST(length(text) AS DOUBLE) AS n_chars,
         CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS DOUBLE) AS n_punct
  FROM documents
),
m AS (
  SELECT doc_id{carry}, n_tokens,
         CASE WHEN n_tokens = 0 THEN 0.0 ELSE tok_chars / CAST(n_tokens AS DOUBLE) END AS avg_token_len,
         CASE WHEN n_tokens = 0 THEN 0.0 ELSE sw_hits / CAST(n_tokens AS DOUBLE) END AS stopword_ratio,
         CASE WHEN n_chars = 0.0 THEN 0.0 ELSE n_punct / n_chars END AS punct_ratio
  FROM base
)"""


#: the quality-score formula over m's columns (twin of
#: textstats.quality_score_from_counts) — shared by every oracle below
_DUCK_QUALITY_EXPR = """round(
           (0.4 * least(CAST(n_tokens AS DOUBLE) / 50.0, 1.0)
            + 0.3 * (CASE WHEN avg_token_len >= 3.0 AND avg_token_len <= 10.0 THEN 1.0 ELSE 0.5 END)
            + 0.3 * least(stopword_ratio * 4.0, 1.0))
           * (1.0 - punct_ratio), 6)"""


def _duck_quality_ctes(carry: str = "", keep: str = ", n_tokens",
                       alias: str = "quality") -> str:
    """base/m/qual chain ending in qual(doc_id{carry}{keep}, {alias})."""
    return f"""{_duck_stats_ctes(carry)},
qual AS (
  SELECT doc_id{carry}{keep},
         {_DUCK_QUALITY_EXPR} AS {alias}
  FROM m
)"""


_QUALITY_ORACLE = f"""
WITH {_duck_stats_ctes()}
SELECT doc_id, n_tokens,
       round(avg_token_len, 6) AS avg_token_len,
       round(stopword_ratio, 6) AS stopword_ratio,
       round(punct_ratio, 6) AS punct_ratio,
       {_DUCK_QUALITY_EXPR} AS quality
FROM m
"""


@q(
    "text_quality",
    _QUALITY_ORACLE,
    "token counting + quality scoring (length/punct/stopword heuristics)",
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.fast_text import text_stat_counts_fast

    docs = t(spark, sf_dir, "documents")
    counts = text_stat_counts_fast(docs, "doc_id", "text")
    return counts.select(
        "doc_id",
        F.col("n_tokens"),
        F.round(TS.avg_token_len_from_counts(), 6).alias("avg_token_len"),
        F.round(TS.stopword_ratio_from_counts(), 6).alias("stopword_ratio"),
        F.round(TS.punct_ratio_from_counts(), 6).alias("punct_ratio"),
        F.round(TS.quality_score_from_counts(), 6).alias("quality"),
    )


# ===========================================================================
# 6. Relational engine glue (joins / aggregation / windows / sessionization)
# ===========================================================================

@q(
    "pricing_summary",
    """
SELECT l_returnflag, l_linestatus,
       round(SUM(l_quantity), 2) AS sum_qty,
       round(SUM(l_extendedprice), 2) AS sum_base_price,
       round(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(AVG(l_quantity), 6) AS avg_qty,
       round(AVG(l_discount), 6) AS avg_disc,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    "TPC-H Q1-shaped pricing summary (scan → filter-pushdown → partial agg)",
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").cast("long").alias("count_order"),
        )
    )


@q(
    "top_customers_by_nation",
    """
WITH rev AS (
  SELECT c.c_custkey, c.c_name, n.n_name,
         round(SUM(o.o_totalprice), 2) AS revenue
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY c.c_custkey, c.c_name, n.n_name
)
SELECT n_name, c_custkey, c_name, revenue,
       row_number() OVER (PARTITION BY n_name ORDER BY revenue DESC, c_custkey ASC) AS rank
FROM rev
QUALIFY rank <= 5
""",
    "join + agg + per-group top-N (broadcast dims, shuffle only on custkey)",
)
def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    customer = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    rev = (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    w = Window.partitionBy("n_name").orderBy(F.desc("revenue"), F.asc("c_custkey"))
    return (
        rev.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
        .select("n_name", "c_custkey", "c_name", "revenue", "rank")
    )


@q(
    "brand_revenue",
    """
SELECT p.p_brand,
       round(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand
""",
    "fact-dim broadcast join + aggregation (column pruning + pushdown showcase)",
)
def q_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count("*").cast("long").alias("n_items"),
        )
    )


# events.parquet's physical timestamp unit varies across testdata
# generations; t() normalizes `ts` to epoch-nanos BIGINT whatever the
# physical type (see t()), and the oracles use epoch_ns(). All time math
# below is exact int64 nanosecond arithmetic on both engines (`div` / `//`),
# so no timezone or float issue can creep into the hashes.
_NS_PER_S = 1_000_000_000

@q(
    "events_sessionize",
    f"""
WITH l AS (
  SELECT user_id, event_id, epoch_ns(ts) AS tns,
         lag(epoch_ns(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id) AS pns
  FROM events
),
n AS (
  SELECT *, CASE WHEN pns IS NULL OR (tns - pns) > {1800 * _NS_PER_S} THEN 1 ELSE 0 END AS is_new
  FROM l
),
s AS (
  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY tns, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_id
  FROM n
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST((MAX(tns) - MIN(tns)) // {_NS_PER_S} AS BIGINT) AS duration_s
FROM s GROUP BY user_id, session_id
""",
    "sessionization: 30-min-gap sessions via lag + running sum (stateful streaming analogue)",
)
def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")  # ts: long (epoch nanos)
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    l = ev.select(
        "user_id", "event_id", "ts", F.lag("ts").over(wo).alias("pts")
    )
    n = l.withColumn(
        "is_new",
        F.when(
            F.col("pts").isNull()
            | ((F.col("ts") - F.col("pts")) > 1800 * _NS_PER_S),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    s = n.withColumn(
        "session_id",
        F.sum("is_new").over(wo.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
    return s.groupBy("user_id", "session_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.expr(f"(max(ts) - min(ts)) div {_NS_PER_S}").cast("long").alias("duration_s"),
    )


@q(
    "events_hourly",
    f"""
SELECT CAST((epoch_ns(ts) // {3600 * _NS_PER_S}) * 3600 AS BIGINT) AS hour_epoch, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       round(SUM(value), 4) AS total_value
FROM events GROUP BY hour_epoch, event_type
""",
    "tumbling 1-hour windowed aggregation per event type (streaming window analogue)",
)
def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")  # ts: long (epoch nanos)
    return (
        ev.groupBy(
            (F.expr(f"ts div {3600 * _NS_PER_S}") * 3600).cast("long").alias("hour_epoch"),
            "event_type",
        )
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )


# ===========================================================================
# 6b. More dedup / text analysis / relational coverage
# ===========================================================================

def _ngram_allpairs_oracle(threshold: float) -> str:
    """All-pairs word-3-gram Jaccard ground truth at ``threshold`` — the
    oracle for BOTH the inverted-index and the prefix-filtered variants
    (each is exact, so each must equal the brute-force answer)."""
    return f"""
WITH g AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len({duck_tokens('text')}) >= 3 THEN
           list_transform(generate_series(1, len({duck_tokens('text')}) - 2),
             i -> concat_ws(' ', {duck_tokens('text')}[i], {duck_tokens('text')}[i+1], {duck_tokens('text')}[i+2]))
         ELSE [] END) AS grams
  FROM documents
)
SELECT * FROM (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         round(CASE WHEN (len(a.grams) = 0 AND len(b.grams) = 0) THEN 0.0 ELSE
           CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
           / (CAST(len(a.grams) AS DOUBLE) + CAST(len(b.grams) AS DOUBLE)
              - CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)) END, 6) AS jaccard
  FROM g a JOIN g b ON a.doc_id < b.doc_id
) WHERE jaccard >= {threshold}
"""


_NGRAM_ORACLE = _ngram_allpairs_oracle(0.5)


@q(
    "ngram_jaccard_neardup",
    _NGRAM_ORACLE,
    "word-3-gram Jaccard near-duplicate pairs, full corpus, threshold 0.5 "
    "(n-gram variant of the dedup family)",
)
def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.dedup import ngram_jaccard_pairs

    docs = t(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5)


@q(
    "jaccard_prefix_neardup",
    _ngram_allpairs_oracle(0.5),
    "PPJoin-style prefix-filtered Jaccard near-dup pairs, threshold 0.5 "
    "(same t as ngram_jaccard_neardup for head-to-head comparison): "
    "rarest-first global gram order, index only each set's "
    "|s|-ceil(t*|s|)+1 prefix (candidate recall exactly 1), exact verify "
    "on candidates — the high-threshold scale path where hot boilerplate "
    "grams never enter the index (operators/dedup.py::jaccard_prefix_pairs)",
)
def q_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.dedup import jaccard_prefix_pairs

    docs = t(spark, sf_dir, "documents")
    return jaccard_prefix_pairs(docs, "doc_id", "text", n=3, threshold=0.5)


@q(
    "jaccard_adaptive_neardup",
    _ngram_allpairs_oracle(0.5),
    "ADAPTIVE Jaccard near-dup pairs, threshold 0.5: picks the inverted "
    "index or the PPJoin prefix index from the gram-df histogram the plan "
    "computes anyway (Sigma C(df,2) candidate pairs vs postings volume — "
    "boilerplate pushes the ratio to ~d/2, near-unique grams keep it <1) — "
    "VERDICT r4 #8's honest-cost docstring made executable. Same oracle as "
    "jaccard_prefix_neardup / ngram_jaccard_neardup: both shapes are exact "
    "at t>0 (operators/dedup.py::jaccard_pairs_adaptive; crossover pinned "
    "at two df-skew profiles in tests)",
)
def q_jaccard_adaptive(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.dedup import jaccard_pairs_adaptive

    docs = t(spark, sf_dir, "documents")
    return jaccard_pairs_adaptive(docs, "doc_id", "text", n=3, threshold=0.5)


_MIX_CAP = 10  # per-cluster sample cap


@q(
    "cluster_balanced_sample",
    f"""
WITH cent AS (
  SELECT vec_id AS centroid_id, embedding AS ce FROM embeddings
  WHERE vec_id % 50 = 0
),
assign AS (
  SELECT e.vec_id, c.centroid_id,
         round({_dk_cos('e.embedding', 'c.ce')}, 6) AS cscore
  FROM embeddings e CROSS JOIN cent c
  QUALIFY row_number() OVER (PARTITION BY e.vec_id
                             ORDER BY cscore DESC, c.centroid_id ASC) = 1
),
sizes AS (
  SELECT centroid_id, CAST(count(*) AS BIGINT) AS cluster_size
  FROM assign GROUP BY centroid_id
),
ranked AS (
  SELECT vec_id, centroid_id,
         CAST(row_number() OVER (
           PARTITION BY centroid_id
           ORDER BY (CAST(vec_id AS BIGINT) * 2654435761) % 2147483647,
                    vec_id) AS BIGINT) AS rank
  FROM assign
)
SELECT r.vec_id, r.centroid_id, r.rank, s.cluster_size
FROM ranked r JOIN sizes s USING (centroid_id)
WHERE r.rank <= {_MIX_CAP}
""",
    f"cluster-balanced sampling for data mixing (DoReMi/cluster-resample "
    f"shape): assign each embedding to its nearest coarse centroid "
    f"(broadcast argmax — the IVF assign kernel), then keep a "
    f"DETERMINISTIC per-cluster sample of at most {_MIX_CAP} rows ranked "
    f"by a multiplicative id hash — equalizing cluster contributions "
    f"regardless of raw cluster skew. The rank window is "
    f"WindowGroupLimit-capped (only the top-{_MIX_CAP} heap per cluster "
    f"materializes, never a full per-cluster sort at scale); cluster "
    f"sizes join back via a broadcast of k rows.",
)
def q_cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centroid_vec"),
    )
    assigned = assign_ivf_buckets_fast(emb, centroids).select(
        "vec_id", "centroid_id"
    )
    sizes = assigned.groupBy("centroid_id").agg(
        F.count("*").cast("long").alias("cluster_size")
    )
    h = F.pmod(
        F.col("vec_id").cast("long") * F.lit(2654435761), F.lit(2147483647)
    )
    w = Window.partitionBy("centroid_id").orderBy("__h", "vec_id")
    return (
        assigned.withColumn("__h", h)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= _MIX_CAP)
        .drop("__h")
        .join(F.broadcast(sizes), "centroid_id")
        .select("vec_id", "centroid_id", "rank", "cluster_size")
    )


_JL_OUT = 16


def _dk_jl(a: str, out_dim: int, in_dim: int) -> str:
    """DuckDB mirror of functions.vector.jl_sign_project (same quadratic
    sign hash, same fold order — all intermediates exact < 2^53)."""
    sign = ("CASE WHEN ((37*i + 101*j + 7)*(37*i + 101*j + 7)) % 1009 % 2 = 0 "
            "THEN 1.0 ELSE -1.0 END")
    return (
        f"list_transform(generate_series(0, {out_dim - 1}), j -> "
        f"coalesce(list_sum(list_transform(generate_series(0, {in_dim - 1}), "
        f"i -> CAST({a}[i+1] AS DOUBLE) * {sign})), 0.0))"
    )


@q(
    "jl_project_topk",
    f"""
WITH proj AS (
  SELECT vec_id, {_dk_jl('embedding', _JL_OUT, EMB_DIM)} AS p FROM embeddings
),
qv AS (SELECT vec_id AS query_id, p AS qp FROM proj WHERE vec_id < 5),
scored AS (
  SELECT qv.query_id, proj.vec_id,
         round({_dk_cos('qv.qp', 'proj.p')}, 6) AS score
  FROM qv CROSS JOIN proj
)
SELECT query_id, vec_id, score,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY score DESC, vec_id ASC) AS rank
FROM scored
QUALIFY rank <= 10
""",
    f"dimensionality-reduced search: Johnson-Lindenstrauss ±1 sign "
    f"projection {EMB_DIM}->{_JL_OUT} dims (deterministic quadratic sign "
    f"hash — functions/vector.py::jl_sign_project), then brute-force "
    f"cosine top-10 in the PROJECTED space. The standard pre-reduction "
    f"when raw dimension is the scan cost: the projection is a "
    f"shuffle-free per-row map, and every downstream scan/shuffle moves "
    f"{_JL_OUT}/{EMB_DIM} of the bytes.",
)
def q_jl_project_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.fast_vector import jl_project_fast
    from fastembed_rs_spark.operators.topk import cosine_top_k

    emb = t(spark, sf_dir, "embeddings")
    # NumPy kernel, bit-identical to the jl_sign_project expression path
    # (exact left fold — pinned by test); checkpointed because both the
    # query side and the corpus side consume it
    proj = jl_project_fast(
        emb, "vec_id", "embedding", EMB_DIM, _JL_OUT
    ).localCheckpoint()
    queries = proj.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("p").alias("query_vec")
    )
    return cosine_top_k(
        queries, proj, k=10, vec_col="p", round_to=6
    ).select("query_id", "vec_id", "score", "rank")


@q(
    "embedding_outliers",
    f"""
WITH cent AS (
  SELECT vec_id AS centroid_id, embedding AS ce FROM embeddings
  WHERE vec_id % 50 = 0
),
assign AS (
  SELECT e.vec_id, c.centroid_id,
         round({_dk_cos('e.embedding', 'c.ce')}, 6) AS cscore
  FROM embeddings e CROSS JOIN cent c
  QUALIFY row_number() OVER (PARTITION BY e.vec_id
                             ORDER BY cscore DESC, c.centroid_id ASC) = 1
),
stats AS (
  SELECT centroid_id, count(*) AS n, sum(cscore) AS s,
         sum(cscore * cscore) AS ss
  FROM assign GROUP BY centroid_id
),
scored AS (
  SELECT a.vec_id, a.centroid_id, a.cscore,
         CASE WHEN st.n >= 2 AND (st.ss - st.s * st.s / st.n) > 0
              THEN round((a.cscore - st.s / st.n)
                         / sqrt((st.ss - st.s * st.s / st.n) / (st.n - 1)), 6)
         END AS z
  FROM assign a JOIN stats st USING (centroid_id)
)
SELECT vec_id, centroid_id, cscore, z,
       coalesce(z < -2.0, false) AS is_outlier
FROM scored
""",
    "embedding-space outlier filter (curation: drop garbage/noise vectors "
    "before training): assign each vector to its nearest coarse centroid, "
    "then z-score its cosine-to-centroid within the cluster — z < -2 flags "
    "vectors unusually far from their own cluster. Mean/std via the "
    "explicit sum-of-squares identity (same expression both engines, like "
    "embedding_stats); broadcast argmax assign + one keyed agg + a "
    "k-row broadcast join back — no per-row window, no all-pairs.",
)
def q_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.functions.vector import cosine_similarity

    emb = t(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centroid_vec"),
    )
    # scored feeds two plan branches (per-cluster stats and the output
    # join) — checkpoint so the assign kernel runs once
    scored = (
        assign_ivf_buckets_fast(emb, centroids)
        .join(F.broadcast(centroids), "centroid_id")
        .select(
            "vec_id", "centroid_id",
            F.round(
                cosine_similarity("embedding", "centroid_vec"), 6
            ).alias("cscore"),
        )
        .localCheckpoint()
    )
    stats = scored.groupBy("centroid_id").agg(
        F.count("*").alias("n"),
        F.sum("cscore").alias("s"),
        F.sum(F.col("cscore") * F.col("cscore")).alias("ss"),
    )
    var = F.col("ss") - F.col("s") * F.col("s") / F.col("n")
    z = F.when(
        (F.col("n") >= 2) & (var > 0),
        F.round(
            (F.col("cscore") - F.col("s") / F.col("n"))
            / F.sqrt(var / (F.col("n") - 1)),
            6,
        ),
    )
    return (
        scored.join(F.broadcast(stats), "centroid_id")
        .withColumn("z", z)
        .withColumn(
            "is_outlier", F.coalesce(F.col("z") < -2.0, F.lit(False))
        )
        .select("vec_id", "centroid_id", "cscore", "z", "is_outlier")
    )


_SPAN_N = 8


@q(
    "repeated_spans",
    f"""
WITH toks AS (SELECT doc_id, {duck_tokens('text')} AS tk FROM documents),
w AS (
  SELECT doc_id, array_to_string(tk[i:i + {_SPAN_N - 1}], ' ') AS g
  FROM (SELECT doc_id, tk, unnest(range(1, len(tk) - {_SPAN_N} + 2)) AS i
        FROM toks WHERE len(tk) >= {_SPAN_N})
),
dfq AS (SELECT g, count(DISTINCT doc_id) AS df FROM w GROUP BY g)
SELECT w.doc_id,
       CAST(count(*) AS BIGINT) AS n_windows,
       CAST(sum(CASE WHEN dfq.df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_repeated,
       round(sum(CASE WHEN dfq.df >= 2 THEN 1 ELSE 0 END)::DOUBLE
             / count(*), 6) AS repeated_frac
FROM w JOIN dfq USING (g)
GROUP BY w.doc_id
""",
    f"exact substring-level dedup signal (Lee et al. 'Deduplicating "
    f"Training Data Makes Language Models Better'-style): per doc, the "
    f"fraction of its {_SPAN_N}-token sliding windows that also occur in "
    f"at least one OTHER document — the span-removal statistic a "
    f"training-data pipeline thresholds to cut duplicated passages. "
    f"Windows + per-doc occurrence counts come from ONE NumPy kernel pass "
    f"(fast_text.word_window_counts_fast — the expression-tree windowing "
    f"re-evaluates split() per element once Catalyst inlines it: 53 s vs "
    f"~2 s at sf0.1); doc frequency is a groupBy over the per-doc-distinct "
    f"rows, then a 1:1 lookup join back (no fan-out). This is the EXACT "
    f"variant (string keys); at 100 TB swap the key for the rolling-hash "
    f"fingerprint (chunk_exact_dedup's shape) so only 8-byte keys shuffle, "
    f"at the cost of hash-collision overcounts.",
)
def q_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.fast_text import word_window_counts_fast

    docs = t(spark, sf_dir, "documents")
    g = word_window_counts_fast(docs, "doc_id", "text", _SPAN_N)
    # rows are distinct per (doc, window) by construction → df = row count
    dfq = g.groupBy("__g").agg(F.count("*").alias("df"))
    return (
        g.join(dfq, "__g")
        .groupBy("doc_id")
        .agg(
            F.max("__nw").cast("long").alias("n_windows"),
            F.sum(F.when(F.col("df") >= 2, F.col("__cnt")).otherwise(0))
            .cast("long").alias("n_repeated"),
        )
        .withColumn(
            "repeated_frac",
            F.round(F.col("n_repeated") / F.col("n_windows"), 6),
        )
    )


_BPE_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"

@q(
    "bpe_token_count",
    f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(lower(text), '{_BPE_RE}')) AS BIGINT) AS n_bpe_tokens,
       CAST(len({duck_tokens('text')}) AS BIGINT) AS n_ws_tokens
FROM documents
""",
    "token counting: BPE-ish regex pieces vs whitespace tokens",
)
def q_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.functions.text import tokens

    docs = t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(_BPE_RE), F.lit(0)))
        .cast("long").alias("n_bpe_tokens"),
        F.size(tokens("text")).cast("long").alias("n_ws_tokens"),
    )


@q(
    "shipping_priority",
    """
WITH rev AS (
  SELECT l.l_orderkey,
         round(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
         CAST(epoch(o.o_orderdate) AS BIGINT) AS orderdate_epoch
  FROM customer c
  JOIN orders o ON c.c_custkey = o.o_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE c.c_mktsegment = 'BUILDING'
    AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    AND l.l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l.l_orderkey, orderdate_epoch
)
SELECT l_orderkey, revenue, orderdate_epoch,
       row_number() OVER (ORDER BY revenue DESC, l_orderkey ASC) AS rank
FROM rev
QUALIFY rank <= 10
""",
    "TPC-H Q3-shaped shipping priority: selective 3-way join + agg + global top-N",
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    # o_orderdate is TIMESTAMP_NTZ; timestampdiff between NTZ values is exact
    # integer math independent of the session time zone (matches DuckDB
    # epoch() on the naive ts) — no session-conf mutation needed
    orderdate_epoch = F.expr(
        "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
        "cast(o_orderdate as timestamp_ntz))"
    ).cast("long").alias("orderdate_epoch")
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", orderdate_epoch)
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("revenue")
        )
    )
    # distributed global top-10 (TakeOrderedAndProject), then rank the 10
    # survivors — a bare global row_number window would single-task the
    # whole aggregated order set (no WindowGroupLimit in the executed plan)
    top = rev.orderBy(F.desc("revenue"), F.asc("l_orderkey")).limit(10)
    w = Window.orderBy(F.desc("revenue"), F.asc("l_orderkey"))
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .select("l_orderkey", "revenue", "orderdate_epoch", "rank")
    )


@q(
    "local_supplier_volume",
    """
SELECT n.n_name,
       round(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
""",
    "TPC-H Q5-shaped local supplier volume: 6-way star join, dims broadcast",
)
def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("revenue")
        )
    )


_COLBERT_TOKENS = (
    "list_transform(generate_series(0, 7), t -> "
    "list_transform(generate_series(1, 8), i -> CAST({v}[t*8 + i] AS DOUBLE)))"
)

_MAXSIM = (
    "list_sum(list_transform({q}, qt -> coalesce(list_max(list_transform({d}, dt -> "
    "list_sum(list_transform(generate_series(1, 8), i -> qt[i] * dt[i])))), 0.0)))"
)

_COLBERT_ORACLE = f"""
WITH toks AS (
  SELECT vec_id, {_COLBERT_TOKENS.format(v='embedding')} AS tm FROM embeddings
),
qv AS (SELECT vec_id AS query_id, tm AS qtm FROM toks WHERE vec_id < 3),
scored AS (
  SELECT qv.query_id, t.vec_id,
         round({_MAXSIM.format(q='qv.qtm', d='t.tm')}, 6) AS score
  FROM qv CROSS JOIN toks t
)
SELECT query_id, vec_id, score,
       row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id ASC) AS rank
FROM scored
QUALIFY rank <= 5
"""


@q(
    "colbert_maxsim_topk",
    _COLBERT_ORACLE,
    "late-interaction MaxSim top-k over multi-vector token matrices "
    "(completes the reference's ColBERT output, src/bgem3_embedding/impl.rs:272-295; "
    "token matrices sliced 8x8 from the dense embeddings so the oracle can mirror)",
)
def q_colbert_maxsim(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.colbert import colbert_top_k

    emb = t(spark, sf_dir, "embeddings")
    token_matrix = F.transform(
        F.sequence(F.lit(0), F.lit(7)),
        lambda tk: F.slice(F.col("embedding").cast("array<double>"), tk * 8 + 1, 8),
    )
    toks = emb.select(F.col("vec_id"), token_matrix.alias("colbert"))
    queries = toks.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("colbert").alias("query_tokens")
    )
    return colbert_top_k(
        queries, toks, k=5, id_col="vec_id", tokens_col="colbert", round_to=6
    ).select("query_id", "vec_id", "score", "rank")


# ===========================================================================
# 7. Model-runtime queries (pandas-UDF path; rows-only driver check)
# ===========================================================================

def _ivf_train_ctes(
    k: int, iters: int, dim: int = EMB_DIM, seed: int = 42,
    prefix: str = "", standalone: bool = True,
) -> tuple[str, str]:
    """Chained-CTE replay of ``operators.topk.train_ivf_centroids`` over the
    embeddings table: seeded deterministic init via the shared rolling hash,
    raw-cosine argmax assignment per Lloyd's iteration (bit-identical fold
    order on both engines), means rounded to 9 decimals per iteration.

    Returns ``(cte_sql, final_centroid_cte_name)`` — the SQL opens its own
    ``WITH`` and also defines ``pts`` (vec_id, v double-list) and ``dims``;
    callers append further CTEs with a leading comma. Shared by every oracle
    whose Spark side trains k-means centroids (ann_ivf_trained,
    cluster_medoids, margin_mining) so the replay semantics are pinned once.

    ``prefix`` renames the per-train CTEs (``{prefix}c0`` …) and
    ``standalone=False`` emits a fragment (leading comma, no WITH/pts/dims)
    that reuses an earlier train's ``pts``/``dims`` — together they let one
    oracle chain SEVERAL trainings at different k (kmeans_distortion_ladder)
    with identical per-train semantics. Same seed ⇒ nested inits: the k=2
    init is the first two rows of the k=8 init ordering.
    """
    h = duck_token_hash(f"(vec_id::VARCHAR || '#ivf{seed}')")
    head = f"""
WITH pts AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
),
dims AS (SELECT unnest(generate_series(1, {dim})) AS d),
""" if standalone else ",\n"
    parts = [head + f"""{prefix}c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY hh, vec_id) - 1 AS INT) AS centroid_id, v AS cv
  FROM (SELECT vec_id, v, {h} AS hh FROM pts)
  QUALIFY row_number() OVER (ORDER BY hh, vec_id) <= {k}
)"""]
    prev = f"{prefix}c0"
    for it in range(1, iters + 1):
        parts.append(f""",
{prefix}a{it} AS (
  SELECT p.vec_id, p.v, c.centroid_id, {_dk_cos('p.v', 'c.cv')} AS s
  FROM pts p CROSS JOIN {prev} c
  QUALIFY row_number() OVER (PARTITION BY p.vec_id ORDER BY s DESC, c.centroid_id ASC) = 1
),
{prefix}c{it} AS (
  SELECT centroid_id, list(mu ORDER BY d) AS cv FROM (
    SELECT a.centroid_id, dims.d, round(avg(a.v[dims.d]), 9) AS mu
    FROM {prefix}a{it} a CROSS JOIN dims
    GROUP BY a.centroid_id, dims.d
  ) GROUP BY centroid_id
)""")
        prev = f"{prefix}c{it}"
    return "".join(parts), prev


def _ivf_trained_oracle(
    k: int, iters: int, nq: int, nprobe: int, topk: int,
    dim: int = EMB_DIM, seed: int = 42,
) -> str:
    """Trained-centroid replay (``_ivf_train_ctes``) + final assign + probe
    + within-bucket exact top-k — the full ``ann_ivf_trained`` pipeline."""
    ctes, prev = _ivf_train_ctes(k, iters, dim=dim, seed=seed)
    parts = [ctes]
    parts.append(f""",
assign AS (
  SELECT p.vec_id, p.v AS embedding, c.centroid_id,
         round({_dk_cos('p.v', 'c.cv')}, 6) AS cscore
  FROM pts p CROSS JOIN {prev} c
  QUALIFY row_number() OVER (PARTITION BY p.vec_id ORDER BY cscore DESC, c.centroid_id ASC) = 1
),
qv AS (SELECT vec_id AS query_id, v AS qe FROM pts WHERE vec_id < {nq}),
probes AS (
  SELECT qv.query_id, qv.qe, c.centroid_id,
         round({_dk_cos('qv.qe', 'c.cv')}, 6) AS pscore
  FROM qv CROSS JOIN {prev} c
  QUALIFY row_number() OVER (PARTITION BY qv.query_id ORDER BY pscore DESC, c.centroid_id ASC) <= {nprobe}
),
scored AS (
  SELECT p.query_id, a.vec_id, round({_dk_cos('p.qe', 'a.embedding')}, 6) AS score
  FROM probes p JOIN assign a ON p.centroid_id = a.centroid_id
)
SELECT query_id, vec_id, score,
       row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id ASC) AS rank
FROM scored
QUALIFY rank <= {topk}""")
    return "".join(parts)


@q(
    "ann_ivf_trained",
    _ivf_trained_oracle(k=8, iters=3, nq=3, nprobe=2, topk=5),
    "k-means-trained IVF: Lloyd's iterations as DataFrame algebra, then probe; "
    "seeded fixed-iteration training replayed by the oracle as chained CTEs",
)
def q_ann_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.topk import train_ivf_centroids

    emb = t(spark, sf_dir, "embeddings")
    centroids = train_ivf_centroids(emb, k=8, iters=3)
    bucketed = assign_ivf_buckets_fast(emb, centroids)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = ivf_top_k(queries, bucketed, centroids, k=5, nprobe=2, round_to=6)
    return out.select("query_id", "vec_id", "score", "rank")


@q(
    "embed_text_stub",
    None,
    "mapInPandas dense embedding (stub session) THROUGH the public API "
    "handle (api.TextEmbedding — same plan as operators.embed.embed_text, "
    "so the facade wiring is driver-verified too); returns (doc_id, dim, "
    "norm) — norm must be 1.0 after L2 normalization",
)
def q_embed_text_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.api import TextEmbedding
    from fastembed_rs_spark.functions.vector import l2_norm

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    out = TextEmbedding.try_new("stub-dense-mean").embed(docs, "text")
    return out.select(
        "doc_id",
        F.size("embedding").cast("long").alias("dim"),
        F.round(l2_norm("embedding"), 4).alias("norm"),
    )


@q(
    "embed_text_stub_packed",
    None,
    "embed_text_stub with pack_by_length=True (SURVEY §4's deliberate "
    "physical optimization): range-repartition by text length so each "
    "padded inference batch holds similar-length docs — benched against "
    "the unpacked variant to measure the padding-waste win; embeddings "
    "are bit-identical either way (tests/test_scale_patterns.py pins "
    "packed-vs-plain equality on this same documents table)",
)
def q_embed_text_stub_packed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.functions.vector import l2_norm
    from fastembed_rs_spark.operators.embed import embed_text

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    out = embed_text(docs, "text", model="stub-dense-mean", pack_by_length=True)
    return out.select(
        "doc_id",
        F.size("embedding").cast("long").alias("dim"),
        F.round(l2_norm("embedding"), 4).alias("norm"),
    )


@q(
    "embed_sparse_stub",
    None,
    "mapInPandas SPLADE-style sparse embedding (stub): struct<indices,values> invariants",
)
def q_embed_sparse_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.embed import embed_sparse

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    out = embed_sparse(docs, "text", model="stub-sparse")
    return out.select(
        "doc_id",
        F.size("sparse_embedding.indices").cast("long").alias("nnz"),
        F.round(
            F.aggregate(
                F.col("sparse_embedding.values").cast("array<double>"),
                F.lit(0.0),
                lambda a, x: a + x,
            ),
            4,
        ).alias("value_sum"),
    )


@q(
    "embed_bgem3_stub",
    None,
    "mapInPandas joint dense/sparse/colbert triple (stub bge-m3 shape)",
)
def q_embed_bgem3_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.embed import embed_bgem3

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    out = embed_bgem3(docs, "text", model="stub-bgem3")
    return out.select(
        "doc_id",
        F.size("bgem3.dense").cast("long").alias("dense_dim"),
        F.size("bgem3.sparse.indices").cast("long").alias("sparse_nnz"),
        F.size("bgem3.colbert").cast("long").alias("colbert_tokens"),
    )


@q(
    "embed_image_stub",
    None,
    "mapInPandas image embedding over a binary column (deterministic fake decode; "
    "real PIL decode is the marked swap-in point)",
)
def q_embed_image_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.functions.vector import l2_norm
    from fastembed_rs_spark.operators.embed import embed_image

    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("content")
    )
    out = embed_image(docs, "content", model="stub-image")
    return out.select(
        "doc_id",
        F.size("embedding").cast("long").alias("dim"),
        F.round(l2_norm("embedding"), 4).alias("norm"),
    )


_CROSSMODAL_ORACLE = f"""
WITH ttoks AS (
  SELECT doc_id, unnest(list_transform({duck_tokens('text')}, tk -> {duck_token_hash('tk')} % 64)) AS bucket
  FROM documents WHERE doc_id < 4 AND text <> ''
),
ttf AS (SELECT doc_id, bucket, CAST(count(*) AS DOUBLE) AS tf FROM ttoks GROUP BY doc_id, bucket),
tnorm AS (SELECT doc_id, sqrt(sum(tf * tf)) AS nrm FROM ttf GROUP BY doc_id),
tcoord AS (SELECT ttf.doc_id AS query_id, bucket, round(tf / nrm, 6) AS w
           FROM ttf JOIN tnorm ON ttf.doc_id = tnorm.doc_id),
ibytes AS (
  -- true UTF-8 BYTES via hex pairs (ord(char) would diverge from the
  -- Spark kernel's np.frombuffer on any non-ASCII text: 'é' is one
  -- codepoint 233 but two bytes 0xC3 0xA9)
  SELECT doc_id,
         unnest(list_transform(generate_series(1, octet_length(encode(text))),
                i -> (('0x' || substr(hex(encode(text)), 2*i-1, 2))::INT % 64))) AS bucket
  FROM documents WHERE doc_id % 7 = 0 AND text <> ''
),
itf AS (SELECT doc_id, bucket, CAST(count(*) AS DOUBLE) AS tf FROM ibytes GROUP BY doc_id, bucket),
inorm AS (SELECT doc_id, sqrt(sum(tf * tf)) AS nrm FROM itf GROUP BY doc_id),
icoord AS (SELECT itf.doc_id AS image_id, bucket, round(tf / nrm, 6) AS w
           FROM itf JOIN inorm ON itf.doc_id = inorm.doc_id),
scored AS (
  SELECT t.query_id, i.image_id, round(sum(t.w * i.w), 6) AS score
  FROM tcoord t JOIN icoord i ON t.bucket = i.bucket
  GROUP BY t.query_id, i.image_id
)
SELECT query_id, image_id, score,
       row_number() OVER (PARTITION BY query_id ORDER BY score DESC, image_id ASC) AS rank
FROM scored
QUALIFY rank <= 3
"""


@q(
    "crossmodal_similarity",
    _CROSSMODAL_ORACLE,
    "text-vs-image cosine top-3 in a shared 64-dim embedding space "
    "(mirrors the reference's cross-modal test, tests/image-embeddings.rs:24-79). "
    "Both towers are SQL-verifiable hash embeddings (the dense_hash_embed "
    "trick): text = token-hash tf tower, image = byte-histogram tower over "
    "the BINARY column (multimodal.byte_hash_coords — the image bytes here "
    "are the utf-8 encoding of the doc text, so DuckDB rebuilds them from "
    "char codes). Real/stub model towers swap in via embed_text/embed_image "
    "(covered by embed_text_stub / embed_image_stub). Both sides are "
    "L2-normalized so the bucket-join dot IS the cosine; the 4-query text "
    "side broadcasts, one shuffle for the pair aggregation",
)
def q_crossmodal_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.fast_text import hash_embed_coords_fast
    from fastembed_rs_spark.operators.multimodal import byte_hash_coords

    docs = t(spark, sf_dir, "documents")
    texts = docs.filter(F.col("doc_id") < 4).select("doc_id", "text")
    tcoord = hash_embed_coords_fast(texts, "doc_id", "text", dim=64).select(
        F.col("doc_id").alias("query_id"), "bucket", "weight"
    )
    images = docs.filter(F.col("doc_id") % 7 == 0).select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("content")
    )
    icoord = byte_hash_coords(images, "doc_id", "content", dim=64).select(
        F.col("doc_id").alias("image_id"), "bucket", "weight"
    )
    # the shared coordinate-form sparse dot (same op as sparse_dot_topk) —
    # text side broadcast (few queries), image side streams
    scored = EH.sparse_dot_coords(
        F.broadcast(tcoord), icoord,
        "query_id", "image_id", bucket_col="bucket", value_col="weight",
    ).withColumnRenamed("dot", "score")
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("image_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select("query_id", "image_id", "score", "rank")
    )


@q(
    "rerank_model_stub",
    None,
    "mapInPandas cross-encoder pair scoring (stub) + per-query ranking",
)
def q_rerank_model_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.embed import rerank_score

    docs = t(spark, sf_dir, "documents")
    qs = docs.filter(F.col("doc_id") < 2).select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("query")
    )
    cand = docs.filter(F.col("doc_id") % 10 == 0).select(
        "doc_id", F.col("text").alias("document")
    )
    pairs = cand.crossJoin(F.broadcast(qs))
    scored = rerank_score(pairs, "query", "document", model="stub-rerank")
    return rerank(scored, F.col("score"), k=5).select("query_id", "doc_id", "score", "rank")


# ===========================================================================
# 8. Time-series joins, LSH ANN, BM25, distinct sketches
# ===========================================================================

@q(
    "events_asof_join",
    f"""
WITH c AS (SELECT * FROM events WHERE event_type = 'click'),
     v AS (SELECT * FROM events WHERE event_type = 'view')
SELECT event_id, user_id, ts_us, view_event_id, view_value, lag_s FROM (
  SELECT c.event_id, c.user_id,
         CAST(epoch_us(c.ts) AS BIGINT) AS ts_us,
         v.event_id AS view_event_id,
         round(v.value, 4) AS view_value,
         (CAST(epoch_us(c.ts) AS BIGINT) - CAST(epoch_us(v.ts) AS BIGINT))
           // 1000000 AS lag_s,
         row_number() OVER (
           PARTITION BY c.event_id
           ORDER BY epoch_us(v.ts) DESC NULLS LAST, v.event_id DESC NULLS LAST
         ) AS rn
  FROM c LEFT JOIN v
    ON c.user_id = v.user_id AND epoch_us(v.ts) <= epoch_us(c.ts)
) WHERE rn = 1
""",
    "as-of join: each click matched to the user's most recent view at-or-"
    "before it (union + carry-forward window — one shuffle, no pair blow-up)",
)
def q_events_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.asof import asof_join

    # work in MICROseconds on both sides: DuckDB reads the nano parquet at
    # micro precision, so nano-resolution matching could disagree with the
    # oracle on same-microsecond pairs
    ev = t(spark, sf_dir, "events").withColumn("ts_us", F.expr("ts div 1000"))
    clicks = ev.filter(F.col("event_type") == "click")
    views = ev.filter(F.col("event_type") == "view")
    j = asof_join(
        clicks, views, on="user_id", left_ts="ts_us", right_ts="ts_us",
        payload_cols=["event_id", "value"],
    )
    return j.select(
        "event_id",
        "user_id",
        "ts_us",
        F.col("matched.event_id").alias("view_event_id"),
        F.round(F.col("matched.value"), 4).alias("view_value"),
        F.expr("(ts_us - matched_ts) div 1000000").alias("lag_s"),
    )


@q(
    "events_range_join",
    f"""
WITH e AS (SELECT event_id, CAST(epoch_us(ts) AS BIGINT) AS tus FROM events
           WHERE event_type = 'error'),
     c AS (SELECT CAST(epoch_us(ts) AS BIGINT) AS tus, value FROM events
           WHERE event_type = 'click')
SELECT e.event_id, CAST(count(*) AS BIGINT) AS n_clicks,
       round(sum(c.value), 2) AS click_value
FROM e JOIN c ON abs(e.tus - c.tus) <= {60 * 1_000_000}
GROUP BY e.event_id
""",
    "banded range join: clicks within ±60s of each error, equi-joinified "
    "via band-width buckets (3× left fan-out instead of a theta cross join)",
)
def q_events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.asof import banded_range_join

    # microseconds both sides (oracle precision — see events_asof_join)
    ev = t(spark, sf_dir, "events").withColumn("ts_us", F.expr("ts div 1000"))
    errors = ev.filter(F.col("event_type") == "error").select("event_id", "ts_us")
    clicks = ev.filter(F.col("event_type") == "click").select("ts_us", "value")
    j = banded_range_join(errors, clicks, "ts_us", "ts_us", band=60 * 1_000_000)
    return j.groupBy("event_id").agg(
        F.count("*").cast("long").alias("n_clicks"),
        F.round(F.sum("value"), 2).alias("click_value"),
    )


def _lsh_planes() -> list[list[float]]:
    from fastembed_rs_spark.operators.lsh import hyperplanes

    return hyperplanes(dim=EMB_DIM, n_bits=16, seed=7)


_LSH_BANDS = 4  # 4 bands x 4 bits


def _lsh_oracle() -> str:
    planes = _lsh_planes()
    r = len(planes) // _LSH_BANDS

    def dot_plane(p: list[float]) -> str:
        lit = "[" + ", ".join(repr(w) for w in p) + "]"
        return (
            f"list_sum(list_transform(generate_series(1, {EMB_DIM}), "
            f"i -> CAST(embedding[i] AS DOUBLE) * ({lit}::DOUBLE[])[i]))"
        )

    def band_key(b: int) -> str:
        key = "CAST(0 AS BIGINT)"
        for i in range(r):
            bit = f"(CASE WHEN {dot_plane(planes[b * r + i])} >= 0 THEN 1 ELSE 0 END)"
            key = f"({key} * 2 + {bit})"
        return key

    keys = ", ".join(
        f"{band_key(b)} AS k{b}" for b in range(_LSH_BANDS)
    )
    band_match = " OR ".join(f"q.k{b} = e.k{b}" for b in range(_LSH_BANDS))
    return f"""
WITH sig AS (SELECT vec_id, embedding, {keys} FROM embeddings),
     q AS (SELECT vec_id AS query_id, embedding AS qe,
                  {', '.join(f'k{b}' for b in range(_LSH_BANDS))}
           FROM sig WHERE vec_id < 5),
     cand AS (
       SELECT q.query_id, q.qe, e.vec_id, e.embedding
       FROM q JOIN sig e ON {band_match}
     )
SELECT query_id, vec_id, score, rank FROM (
  SELECT query_id, vec_id,
         round({_dk_cos('qe', 'embedding')}, 6) AS score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round({_dk_cos('qe', 'embedding')}, 6) DESC,
                                     vec_id ASC) AS rank
  FROM cand
) WHERE rank <= 10
"""


@q(
    "ann_lsh_topk",
    _lsh_oracle(),
    "random-hyperplane LSH ANN: 4 bands x 4 bits -> band-bucket equi-join "
    "candidates -> exact cosine verify -> top-10 (the LSH scale path beside "
    "IVF and PQ; seeded hyperplanes inlined into both engines)",
)
def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.lsh import lsh_top_k

    emb = t(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return lsh_top_k(
        qs, emb, planes=_lsh_planes(), bands=_LSH_BANDS, k=10, id_col="vec_id",
    ).select("query_id", "vec_id", "score", "rank")


def _bm25_oracle() -> str:
    from fastembed_rs_spark.operators.lexical import B, K1

    return f"""
WITH tf AS (
  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest({duck_tokens('text')}) AS token FROM documents)
  GROUP BY doc_id, token
),
dl AS (SELECT doc_id, SUM(tf) AS doclen FROM tf GROUP BY doc_id),
stats AS (SELECT CAST(SUM(doclen) AS DOUBLE) / COUNT(*) AS avgdl,
                 COUNT(*) AS n FROM dl),
df AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY token),
qt AS (SELECT doc_id AS query_id, unnest(list_distinct({duck_tokens('text')})) AS token
       FROM documents WHERE doc_id < 3),
scored AS (
  SELECT qt.query_id, tf.doc_id,
         round(SUM(
           ln(1.0 + (stats.n - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf * ({K1} + 1))
           / (tf.tf + {K1} * (1 - {B} + {B} * dl.doclen / stats.avgdl))
         ), 6) AS score
  FROM tf
  JOIN qt ON tf.token = qt.token
  JOIN df ON tf.token = df.token
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  GROUP BY qt.query_id, tf.doc_id
)
SELECT query_id, doc_id, score,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY score DESC, doc_id ASC) AS rank
FROM scored
QUALIFY rank <= 10
"""


@q(
    "bm25_topk",
    _bm25_oracle(),
    "BM25 lexical retrieval: corpus tf/df/avgdl statistics + per-query "
    "top-10 (exact-statistics counterpart of the SPLADE sparse scorer)",
)
def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.lexical import bm25_top_k

    docs = t(spark, sf_dir, "documents")
    qs = docs.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("query_text")
    )
    return bm25_top_k(docs, qs, k=10)


_TOKEN_HASH_ROWS = (
    "SELECT " + duck_token_hash("token") + " AS h FROM "
    "(SELECT unnest(" + duck_tokens("text") + ") AS token FROM documents)"
)


@q(
    "kmv_distinct",
    None,  # filled below (needs operator import at module load)
    "KMV distinct-token sketch: 256 minimum hash values -> estimate "
    "(per-partition top-k, no full shuffle of the distinct set)",
)
def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.fast_text import token_hash_rows_fast
    from fastembed_rs_spark.operators.sketch import kmv_sketch

    docs = t(spark, sf_dir, "documents")
    hashes = token_hash_rows_fast(docs, "text")  # per-batch-distinct is safe: KMV re-distincts
    return kmv_sketch(hashes, "h", k=256)


@q(
    "hll_distinct",
    None,  # filled below
    "HLL-style distinct-token sketch: 512 integer registers, exact integer "
    "harmonic sum (order-independent), linear-counting small-range path",
)
def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.fast_text import token_hash_rows_fast
    from fastembed_rs_spark.operators.sketch import hll_sketch

    docs = t(spark, sf_dir, "documents")
    # per-batch-distinct is safe: registers are max-merged
    hashes = token_hash_rows_fast(docs, "text")
    return hll_sketch(hashes, "h", p=9)


@q(
    "small_quantity_revenue",
    """
WITH pa AS (
  SELECT l_partkey, 0.2 * avg(l_quantity) AS qty_cut
  FROM lineitem GROUP BY l_partkey
)
SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN pa ON pa.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#13' AND l.l_quantity < pa.qty_cut
""",
    "TPC-H Q17-shaped small-quantity revenue: correlated per-part average "
    "as a self-agg join (l_quantity is integer-valued -> exact avg, "
    "engine-independent threshold)",
)
def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    pa = li.groupBy("l_partkey").agg(
        (0.2 * F.avg("l_quantity")).alias("qty_cut")
    )
    return (
        li.join(F.broadcast(part.filter(F.col("p_brand") == "Brand#13")),
                li["l_partkey"] == part["p_partkey"])
        .join(pa, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count("*").cast("long").alias("n_lines"),
        )
    )


@q(
    "large_order_customers",
    """
WITH big AS (
  SELECT l_orderkey, sum(l_quantity) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 280
)
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       CAST(epoch(o.o_orderdate) AS BIGINT) AS orderdate_epoch,
       round(o.o_totalprice, 2) AS o_totalprice, big.total_qty
FROM big
JOIN orders o ON o.o_orderkey = big.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
""",
    "TPC-H Q18-shaped large-volume orders: group-HAVING on the fact table "
    "first (map-side combine), then dimension joins on the tiny survivor "
    "set (exact integer quantity sums -> engine-independent HAVING)",
)
def q_large_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 280)
    )
    # NTZ timestampdiff is exact integer math independent of the session
    # time zone (matches DuckDB epoch() on the naive ts) — the LTZ cast it
    # replaces shifted by the zone offset on non-UTC sessions
    od_epoch = F.expr(
        "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
        "cast(o_orderdate as timestamp_ntz))"
    ).cast("long").alias("orderdate_epoch")
    return (
        big.join(orders, big["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .select(
            "c_name", "c_custkey", "o_orderkey", od_epoch,
            F.round("o_totalprice", 2).alias("o_totalprice"), "total_qty",
        )
    )


@q(
    "price_histogram",
    """
WITH mm AS (SELECT min(l_extendedprice) AS mn, max(l_extendedprice) AS mx
            FROM lineitem),
binned AS (
  SELECT least(19, CAST(floor((l_extendedprice - mm.mn)
                              / ((mm.mx - mm.mn) / 20)) AS INT)) AS bin,
         mm.mn AS mn, mm.mx AS mx
  FROM lineitem CROSS JOIN mm
),
counts AS (
  SELECT bin, mn, mx, CAST(count(*) AS BIGINT) AS n
  FROM binned GROUP BY bin, mn, mx
)
SELECT bin,
       round(mn + bin * ((mx - mn) / 20), 4) AS lo,
       round(mn + (bin + 1) * ((mx - mn) / 20), 4) AS hi,
       n,
       CAST(sum(n) OVER (ORDER BY bin
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n
FROM counts
""",
    "equi-width price histogram with cumulative counts (reproducible "
    "approximate-quantile building block; two narrow passes, no sort)",
)
def q_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.stats import equiwidth_histogram

    return equiwidth_histogram(t(spark, sf_dir, "lineitem"), "l_extendedprice", bins=20)


@q(
    "heavy_hitters",
    f"""
WITH counts AS (
  SELECT token, CAST(count(*) AS BIGINT) AS n
  FROM (SELECT unnest({duck_tokens('text')}) AS token FROM documents)
  GROUP BY token
)
SELECT token, n,
       row_number() OVER (ORDER BY n DESC, token ASC) AS rank
FROM counts
QUALIFY rank <= 50
""",
    "exact top-50 corpus tokens (map-side combine + TakeOrdered; the "
    "heavy-hitter primitive for stopword/df cutoffs)",
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.stats import heavy_hitter_tokens

    return heavy_hitter_tokens(t(spark, sf_dir, "documents"), "text", k=50)


@q(
    "deterministic_sample",
    f"""
WITH sampled AS (
  SELECT lang FROM documents
  WHERE (({duck_token_hash("CAST(doc_id AS VARCHAR)")} * 2654435761)
         % 4294967296) * 1000 // 4294967296 < 100
)
SELECT d.lang, CAST(count(*) AS BIGINT) AS n_total,
       coalesce(s.n_sampled, 0) AS n_sampled
FROM documents d
LEFT JOIN (SELECT lang, CAST(count(*) AS BIGINT) AS n_sampled
           FROM sampled GROUP BY lang) s USING (lang)
GROUP BY d.lang, s.n_sampled
""",
    "deterministic 10% hash sample keyed on doc_id (reproducible across "
    "engines/runs, join-consistent across tables), counted per language",
)
def q_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.scale import hash_sample

    docs = t(spark, sf_dir, "documents")
    sampled = (
        hash_sample(docs, "doc_id", pct_mille=100)
        .groupBy("lang")
        .agg(F.count("*").cast("long").alias("n_sampled"))
    )
    totals = docs.groupBy("lang").agg(F.count("*").cast("long").alias("n_total"))
    return totals.join(sampled, "lang", "left").select(
        "lang", "n_total", F.coalesce("n_sampled", F.lit(0).cast("long")).alias("n_sampled")
    )


_EDGE_SQL = f"""
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE round({_dk_cos('a.embedding', 'b.embedding')}, 6) >= 0.4
"""


@q(
    "neardup_components",
    f"""
WITH RECURSIVE edges AS ({_EDGE_SQL}),
sym AS (SELECT id_a AS a, id_b AS b FROM edges
        UNION SELECT id_b, id_a FROM edges),
reach(node, r) AS (
  SELECT DISTINCT a, a FROM sym
  UNION
  SELECT s.b, reach.r FROM reach JOIN sym s ON s.a = reach.node
),
comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node),
sizes AS (SELECT component, CAST(count(*) AS BIGINT) AS cluster_size
          FROM comp GROUP BY component)
SELECT comp.node, comp.component, sizes.cluster_size
FROM comp JOIN sizes ON comp.component = sizes.component
""",
    "connected components over embedding near-dup pairs (min-label "
    "propagation; turns dedup PAIRS into CLUSTERS with a canonical min-id "
    "representative) — oracle = transitive closure via WITH RECURSIVE",
)
def q_neardup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.components import (
        component_summary,
        connected_components,
    )

    edges = QUERIES["embedding_neardup"].spark(spark, sf_dir).select("id_a", "id_b")
    return component_summary(connected_components(edges))


# quality CTE shared by the curation pipeline oracle (same formula as
# _QUALITY_ORACLE, carrying lang and keeping the filterable rounded score)
_CURATION_ORACLE = f"""
WITH RECURSIVE {_duck_quality_ctes(", lang, text", keep="", alias="q")},
q_ok AS (SELECT * FROM qual WHERE q >= 0.5),
fp AS (SELECT doc_id, lang, text,
              {duck_doc_fingerprint('text')} AS fingerprint FROM q_ok),
exact_keep AS (
  SELECT doc_id, lang, text FROM (
    SELECT doc_id, lang, text,
           min(doc_id) OVER (PARTITION BY fingerprint) AS canon
    FROM fp
  ) WHERE doc_id = canon
),
g AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len({duck_tokens('text')}) >= 3 THEN
           list_transform(generate_series(1, len({duck_tokens('text')}) - 2),
             i -> concat_ws(' ', {duck_tokens('text')}[i], {duck_tokens('text')}[i+1], {duck_tokens('text')}[i+2]))
         ELSE [] END) AS grams
  FROM exact_keep
),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM g a JOIN g b ON a.doc_id < b.doc_id
  WHERE round(CASE WHEN (len(a.grams) = 0 AND len(b.grams) = 0) THEN 0.0 ELSE
      CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
      / (CAST(len(a.grams) AS DOUBLE) + CAST(len(b.grams) AS DOUBLE)
         - CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)) END, 6) >= 0.5
),
sym AS (SELECT id_a AS a, id_b AS b FROM pairs
        UNION SELECT id_b, id_a FROM pairs),
reach(node, r) AS (
  SELECT DISTINCT a, a FROM sym
  UNION
  SELECT s.b, reach.r FROM reach JOIN sym s ON s.a = reach.node
),
drops AS (
  SELECT node FROM (SELECT node, min(r) AS component FROM reach GROUP BY node)
  WHERE node <> component
),
final AS (
  SELECT * FROM exact_keep WHERE doc_id NOT IN (SELECT node FROM drops)
),
raw_counts AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_raw
               FROM documents GROUP BY lang)
SELECT rc.lang, rc.n_raw,
       coalesce(qc.n, 0) AS n_quality,
       coalesce(ec.n, 0) AS n_exact,
       coalesce(fc.n, 0) AS n_final
FROM raw_counts rc
LEFT JOIN (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM q_ok GROUP BY lang) qc USING (lang)
LEFT JOIN (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM exact_keep GROUP BY lang) ec USING (lang)
LEFT JOIN (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM final GROUP BY lang) fc USING (lang)
"""


@q(
    "corpus_curation",
    _CURATION_ORACLE,
    "end-to-end curation pipeline: quality filter (rounded threshold) -> "
    "exact dedup (fingerprint, keep min id) -> 3-gram Jaccard near-dup "
    "clustering via connected components (keep canonical) -> per-language "
    "funnel counts. The composite form of the engine's core operators.",
)
def q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.components import connected_components
    from fastembed_rs_spark.operators.dedup import ngram_jaccard_pairs
    from fastembed_rs_spark.operators.fast_text import text_stat_counts_fast

    docs = t(spark, sf_dir, "documents")
    # one kernel pass: quality counts AND the dedup fingerprint
    counts = text_stat_counts_fast(
        docs, "doc_id", "text", keep_cols=("lang", "text"), with_fingerprint=True
    )
    scored = counts.select(
        "doc_id", "lang", "text", "fingerprint",
        F.round(TS.quality_score_from_counts(), 6).alias("q"),
    )
    q_ok = scored.filter(F.col("q") >= 0.5).localCheckpoint()

    wfp = Window.partitionBy("fingerprint")
    exact_keep = (
        q_ok
        .withColumn("canon", F.min("doc_id").over(wfp))
        .filter(F.col("doc_id") == F.col("canon"))
        .select("doc_id", "lang", "text")
        .localCheckpoint()  # feeds the pair join twice + the CC edge set
    )
    pairs = ngram_jaccard_pairs(exact_keep, "doc_id", "text", n=3, threshold=0.5)
    # small-graph tier: the near-dup pair set post-filtering is tiny, so
    # driver union-find beats several fixed-overhead distributed rounds
    # (neardup_components keeps the distributed loop as the scale-path demo)
    drops = connected_components(
        pairs.select("id_a", "id_b"), collect_threshold=1_000_000
    ).filter(
        F.col("node") != F.col("comp")
    ).select(F.col("node").alias("doc_id"), F.lit(1).alias("__dropped"))

    # funnel as per-row flags -> ONE aggregation per side of the final join
    flags = (
        exact_keep.join(drops, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_exact"),
            F.sum(F.when(F.col("__dropped").isNull(), 1).otherwise(0))
            .cast("long").alias("n_final"),
        )
    )
    qcounts = q_ok.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_quality")
    )
    raw = docs.groupBy("lang").agg(F.count("*").cast("long").alias("n_raw"))
    return (
        raw.join(qcounts, "lang", "left")
        .join(flags, "lang", "left")
        .select(
            "lang", "n_raw",
            F.coalesce("n_quality", F.lit(0).cast("long")).alias("n_quality"),
            F.coalesce("n_exact", F.lit(0).cast("long")).alias("n_exact"),
            F.coalesce("n_final", F.lit(0).cast("long")).alias("n_final"),
        )
    )


# ===========================================================================
# 9. Quantized / truncated vector search + hybrid fusion (round 2)
# ===========================================================================

def _dk_pack_bits(vec: str, lo: int, hi: int) -> str:
    """DuckDB mirror of operators.quantize.pack_sign_bits for dims lo..hi-1
    (0-based) into one BIGINT word."""
    return (
        f"CAST(list_sum(list_transform(generate_series({lo + 1}, {hi}), "
        f"i -> CASE WHEN {vec}[i] >= 0 THEN (CAST(1 AS BIGINT) << (i - {lo + 1})) "
        f"ELSE 0 END)) AS BIGINT)"
    )


@q(
    "binary_quant_topk",
    f"""
WITH packed AS (
  SELECT vec_id, embedding,
         {_dk_pack_bits('embedding', 0, 32)} AS b0,
         {_dk_pack_bits('embedding', 32, 64)} AS b1
  FROM embeddings
),
qv AS (SELECT vec_id AS query_id, embedding AS qe, b0 AS q0, b1 AS q1
       FROM packed WHERE vec_id < 5),
scored AS (
  SELECT qv.query_id, p.vec_id, p.embedding, qv.qe,
         64 - (bit_count(xor(qv.q0, p.b0)) + bit_count(xor(qv.q1, p.b1))) AS hamming_sim
  FROM qv CROSS JOIN packed p
),
cand AS (
  SELECT * FROM (
    SELECT query_id, vec_id, embedding, qe,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY hamming_sim DESC, vec_id ASC) AS hr
    FROM scored) WHERE hr <= 40
),
rescored AS (
  SELECT query_id, vec_id, round({_dk_cos('qe', 'embedding')}, 6) AS score
  FROM cand
)
SELECT query_id, vec_id, score,
       row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id ASC) AS rank
FROM rescored
QUALIFY rank <= 10
""",
    "binary-quantization search: sign bits packed into 2 longs (16B/vector), "
    "Hamming scan via XOR+popcount, 4x-oversampled exact-cosine rescore "
    "(the 100TB scan path: 16x narrower than f32)",
)
def q_binary_quant_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.quantize import binary_hamming_top_k

    emb = t(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return binary_hamming_top_k(
        qs, emb, k=10, dim=EMB_DIM, rescore_factor=4
    ).select("query_id", "vec_id", "score", "rank")


@q(
    "int8_quant_topk",
    f"""
WITH codes AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(floor(
           CAST(x AS DOUBLE)
           / (CASE WHEN {_dk_norm('embedding')} = 0.0 THEN 1.0
              ELSE {_dk_norm('embedding')} END)
           * 127.0) AS BIGINT)) AS code
  FROM embeddings
),
qc AS (SELECT vec_id AS query_id, code AS qcode FROM codes WHERE vec_id < 5),
dots AS (
  SELECT qc.query_id, c.vec_id,
         CAST(list_sum(list_transform(generate_series(1, 64),
           i -> qc.qcode[i] * c.code[i])) AS BIGINT) AS qdot
  FROM qc CROSS JOIN codes c
)
SELECT query_id, vec_id, qdot,
       row_number() OVER (PARTITION BY query_id ORDER BY qdot DESC, vec_id ASC) AS rank
FROM dots
QUALIFY rank <= 10
""",
    "scalar int8 quantization search: symmetric -127..127 codes of the "
    "L2-normalized vectors, integer-dot ranking (~127^2 * cosine; exact "
    "integer arithmetic, 4x narrower vectors, no calibration pass)",
)
def q_int8_quant_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.quantize import int8_quant_top_k

    emb = t(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return int8_quant_top_k(qs, emb, k=10)


@q(
    "mrl_truncate_topk",
    f"""
WITH qv AS (SELECT vec_id AS query_id, embedding[1:16] AS qe
            FROM embeddings WHERE vec_id < 5),
cv AS (SELECT vec_id, embedding[1:16] AS ce FROM embeddings),
scored AS (
  SELECT qv.query_id, cv.vec_id, round({_dk_cos('qv.qe', 'cv.ce')}, 6) AS score
  FROM qv CROSS JOIN cv
)
SELECT query_id, vec_id, score,
       row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id ASC) AS rank
FROM scored
QUALIFY rank <= 10
""",
    "Matryoshka (MRL) truncation search: cosine over the first 16 of 64 dims "
    "— the cheap-first stage of a coarse-to-fine funnel (4x less compute/IO)",
)
def q_mrl_truncate_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.quantize import mrl_truncate

    emb = t(spark, sf_dir, "embeddings")
    corpus = emb.select("vec_id", mrl_truncate("embedding", 16).alias("embedding"))
    qs = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        mrl_truncate("embedding", 16).alias("query_vec"),
    )
    return cosine_top_k(qs, corpus, k=10, round_to=6, dim=16).select(
        "query_id", "vec_id", "score", "rank"
    )


def _hybrid_rrf_oracle() -> str:
    return f"""
WITH bm AS ({_bm25_oracle()}),
sp AS ({_SPARSE_DOT_ORACLE}),
u AS (
  SELECT query_id, doc_id, 1.0 / (60 + rank) AS c FROM bm
  UNION ALL
  SELECT query_id, doc_id, 1.0 / (60 + rank) AS c FROM sp
),
fused AS (
  SELECT query_id, doc_id, round(SUM(c), 6) AS rrf_score,
         CAST(COUNT(*) AS BIGINT) AS n_lists
  FROM u GROUP BY query_id, doc_id
)
SELECT query_id, doc_id, rrf_score, n_lists,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY rrf_score DESC, doc_id ASC) AS rank
FROM fused
QUALIFY rank <= 10
"""


@q(
    "hybrid_rrf_topk",
    _hybrid_rrf_oracle(),
    "hybrid retrieval: Reciprocal Rank Fusion (K=60) of BM25 top-10 and "
    "sparse hash-embedding dot top-10 per query — the standard score-free "
    "dense+lexical combiner (Cormack et al., SIGIR 2009)",
)
def q_hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.fast_text import splade_like_coords_fast
    from fastembed_rs_spark.operators.fusion import rrf_fuse
    from fastembed_rs_spark.operators.lexical import bm25_top_k

    docs = t(spark, sf_dir, "documents")
    qs = docs.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("query_text")
    )
    bm = bm25_top_k(docs, qs, k=10).select("query_id", "doc_id", "rank")

    coords = splade_like_coords_fast(docs, "doc_id", "text", vocab=30000, round_to=None)
    qc = coords.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"), "term_bucket", "value"
    )
    dots = EH.sparse_dot_coords(qc, coords, "query_id", "doc_id")
    wsp = Window.partitionBy("query_id").orderBy(F.desc("dot"), F.asc("doc_id"))
    sp = (
        dots.withColumn("rank", F.row_number().over(wsp).cast("long"))
        .filter(F.col("rank") <= 10)
        .select("query_id", "doc_id", "rank")
    )
    return rrf_fuse([bm, sp], k=10).select(
        "query_id", "doc_id", "rrf_score", "n_lists", "rank"
    )


# ===========================================================================
# 10. More relational / events coverage (round 2)
# ===========================================================================

@q(
    "events_props_json",
    """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(k) AS BIGINT) AS k_sum,
       CAST(MIN(k) AS BIGINT) AS k_min,
       CAST(MAX(k) AS BIGINT) AS k_max,
       round(CAST(SUM(k) AS DOUBLE) / COUNT(*), 6) AS k_avg
FROM (SELECT event_type, CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events)
GROUP BY event_type
""",
    "semi-structured JSON props column: per-type stats over an extracted "
    "field (JSON scalar-function coverage; pushdown-friendly projection)",
)
def q_events_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    agg = ev.select("event_type", k.alias("k")).groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("k").cast("long").alias("k_sum"),
        F.min("k").cast("long").alias("k_min"),
        F.max("k").cast("long").alias("k_max"),
    )
    return agg.select(
        "event_type", "n", "k_sum", "k_min", "k_max",
        F.round(F.col("k_sum").cast("double") / F.col("n"), 6).alias("k_avg"),
    )


@q(
    "revenue_rollup",
    """
SELECT r_name, n_name,
       round(SUM(o_totalprice), 2) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
""",
    "hierarchical ROLLUP (region -> nation -> grand total) over order revenue "
    "— multi-level aggregate coverage (GROUPING SETS family)",
)
def q_revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    customer = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")
    j = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return j.rollup("r_name", "n_name").agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.count("*").cast("long").alias("n_orders"),
    )


@q(
    "revenue_cube",
    """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
       CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
       round(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
    "full CUBE over (returnflag, linestatus) with GROUPING markers — "
    "completes the GROUPING SETS family next to revenue_rollup; one scan, "
    "Expand + single partial-aggregated hash aggregate",
)
def q_revenue_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("long").alias("g_flag"),
        F.grouping("l_linestatus").cast("long").alias("g_status"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.count("*").cast("long").alias("n_items"),
    )


@q(
    "bloom_semijoin_revenue",
    """
SELECT l_returnflag,
       round(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 450000)
GROUP BY l_returnflag
""",
    "bloom-accelerated semi-join: 8 KiB broadcast bitmap (operators/bloom.py)"
    " prunes the lineitem scan with a codegen bit-test before the exact "
    "semi-join removes false positives — the explicit runtime-filter "
    "pattern; result is exact, the bloom is only a scan-reduction lever",
)
def q_bloom_semijoin_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.bloom import bloom_semi_join

    li = t(spark, sf_dir, "lineitem")
    big = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    kept = bloom_semi_join(li, big, "l_orderkey", "o_orderkey")
    return kept.groupBy("l_returnflag").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.count("*").cast("long").alias("n_items"),
    )


@q(
    "order_items_array",
    """
SELECT o_orderkey,
       array_to_string(list_sort(list(CAST(l_quantity AS BIGINT))), ',')
         AS quantities,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(MAX(l_quantity) AS BIGINT) AS max_qty
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
WHERE o_totalprice > 450000
GROUP BY o_orderkey
""",
    "array aggregation: per high-value order, the sorted quantity list "
    "(collect_list -> sort_array) — nested-type agg coverage; bounded "
    "per-group size (<= 7 lineitems/order) so collect_list is scale-safe. "
    "The list is emitted as a canonical comma-joined string so the "
    "driver's pandas value canonicalizer (which cannot factorize list "
    "columns) can sort and hash it; same information, driver-hashable.",
)
def q_order_items_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    li = t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey")
        .agg(
            F.array_join(
                F.sort_array(
                    F.collect_list(F.col("l_quantity").cast("long"))
                ).cast("array<string>"),
                ",",
            ).alias("quantities"),
            F.count("*").cast("long").alias("n_items"),
            F.max("l_quantity").cast("long").alias("max_qty"),
        )
    )


@q(
    "chunk_documents",
    """
WITH d AS (
  SELECT doc_id, text,
         greatest(1, CAST(ceil((length(text) - 50) / 150.0) AS INT)) AS n_chunks
  FROM documents
), e AS (
  SELECT doc_id, text, n_chunks,
         CAST(unnest(range(0, n_chunks)) AS INT) AS chunk_idx
  FROM d
)
SELECT doc_id, chunk_idx, n_chunks,
       substr(text, chunk_idx * 150 + 1, 200) AS chunk_text,
       CAST(length(substr(text, chunk_idx * 150 + 1, 200)) AS BIGINT) AS chunk_len
FROM e
""",
    "RAG-style passage chunking: 200-char sliding windows with 50-char "
    "overlap (operators/chunk.py) — sequence -> explode -> substring, all "
    "codegen, no shuffle; the stage that feeds embed_text in a retrieval "
    "pipeline",
)
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.chunk import chunk_by_chars

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    return chunk_by_chars(docs, "text", size=200, overlap=50).select(
        "doc_id", "chunk_idx", "n_chunks", "chunk_text",
        F.length("chunk_text").cast("long").alias("chunk_len"),
    )


@q(
    "chunk_documents_tokens",
    """
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS tk
  FROM documents
), d AS (
  SELECT doc_id, tk, greatest(1, CAST(ceil((len(tk) - 16) / 48.0) AS INT)) AS n_chunks
  FROM toks
), e AS (
  SELECT doc_id, tk, n_chunks, CAST(unnest(range(0, n_chunks)) AS INT) AS chunk_idx FROM d
)
SELECT doc_id, chunk_idx, n_chunks,
       array_to_string(list_slice(tk, chunk_idx * 48 + 1, chunk_idx * 48 + 64), ' ') AS chunk_text,
       CAST(least(64, len(tk) - chunk_idx * 48) AS INT) AS n_tokens
FROM e
""",
    "token-budget passage chunking: 64-token sliding windows with 16-token "
    "overlap (operators/chunk.py::chunk_by_tokens) — the chunk size LLM "
    "pipelines actually control; split/slice/array_join, codegen-only",
)
def q_chunk_documents_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.chunk import chunk_by_tokens

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    return chunk_by_tokens(docs, "text", size=64, overlap=16).select(
        "doc_id", "chunk_idx", "n_chunks", "chunk_text",
        # empty chunk (blank doc): split('') yields [''], not [] — guard to 0
        F.when(F.col("chunk_text") == "", F.lit(0))
        .otherwise(F.size(F.split("chunk_text", " ")))
        .cast("int")
        .alias("n_tokens"),
    )


_RAG_MAXP_ORACLE = f"""
WITH d AS (
  SELECT doc_id, text,
         greatest(1, CAST(ceil((length(text) - 50) / 150.0) AS INT)) AS n_chunks
  FROM documents
), e AS (
  SELECT doc_id, text, CAST(unnest(range(0, n_chunks)) AS INT) AS chunk_idx FROM d
), chunks AS (
  SELECT doc_id, chunk_idx, substr(text, chunk_idx * 150 + 1, 200) AS ctext FROM e
), ctoks AS (
  SELECT doc_id, chunk_idx,
         unnest(list_transform({duck_tokens('ctext')}, tk -> {duck_token_hash('tk')} % 64)) AS bucket
  FROM chunks
), ctf AS (
  SELECT doc_id, chunk_idx, bucket, CAST(COUNT(*) AS DOUBLE) AS tf
  FROM ctoks GROUP BY doc_id, chunk_idx, bucket
), cnorm AS (
  SELECT doc_id, chunk_idx, sqrt(SUM(tf * tf)) AS nrm
  FROM ctf GROUP BY doc_id, chunk_idx
), cc AS (
  SELECT ctf.doc_id, ctf.chunk_idx, ctf.bucket, round(ctf.tf / cnorm.nrm, 6) AS w
  FROM ctf JOIN cnorm ON ctf.doc_id = cnorm.doc_id AND ctf.chunk_idx = cnorm.chunk_idx
), qtoks AS (
  SELECT doc_id AS query_id,
         unnest(list_transform({duck_tokens('text')}, tk -> {duck_token_hash('tk')} % 64)) AS bucket
  FROM documents WHERE doc_id < 3
), qtf AS (
  SELECT query_id, bucket, CAST(COUNT(*) AS DOUBLE) AS tf FROM qtoks GROUP BY query_id, bucket
), qnorm AS (SELECT query_id, sqrt(SUM(tf * tf)) AS nrm FROM qtf GROUP BY query_id),
qc AS (
  SELECT qtf.query_id, qtf.bucket, round(qtf.tf / qnorm.nrm, 6) AS w
  FROM qtf JOIN qnorm ON qtf.query_id = qnorm.query_id
), dots AS (
  SELECT qc.query_id, cc.doc_id, cc.chunk_idx, round(SUM(qc.w * cc.w), 6) AS dot
  FROM qc JOIN cc ON qc.bucket = cc.bucket
  GROUP BY qc.query_id, cc.doc_id, cc.chunk_idx
), maxp AS (
  SELECT query_id, doc_id, MAX(dot) AS maxp_score,
         CAST(COUNT(*) AS BIGINT) AS n_chunks_scored
  FROM dots GROUP BY query_id, doc_id
)
SELECT query_id, doc_id, maxp_score, n_chunks_scored,
       row_number() OVER (PARTITION BY query_id ORDER BY maxp_score DESC, doc_id ASC) AS rank
FROM maxp QUALIFY rank <= 5
"""

# chunk ids pack (doc_id, chunk_idx) into one key for the embedding kernel;
# 2^20 chunks/doc = 150 MB of text per document before overflow
_CHUNK_KEY = 1 << 20


@q(
    "rag_passage_topk",
    _RAG_MAXP_ORACLE,
    "end-to-end RAG retrieval pipeline: chunk (200/50 sliding windows) -> "
    "hash-embed passages -> bucket equi-join dot vs query embeddings -> "
    "per-document MaxP aggregation -> top-5 docs per query. The full "
    "chunk/embed/score/aggregate composition in one oracle-checked plan",
)
def q_rag_passage_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.chunk import chunk_by_chars
    from fastembed_rs_spark.operators.fast_text import hash_embed_coords_fast

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    chunks = chunk_by_chars(docs, "text", size=200, overlap=50).select(
        (F.col("doc_id") * _CHUNK_KEY + F.col("chunk_idx")).alias("chunk_id"),
        F.col("chunk_text").alias("text"),
    )
    cc = hash_embed_coords_fast(chunks, "chunk_id", "text", dim=64).select(
        "chunk_id", "bucket", F.col("weight").alias("cw")
    )
    qc = hash_embed_coords_fast(
        docs.filter(F.col("doc_id") < 3), "doc_id", "text", dim=64
    ).select(F.col("doc_id").alias("query_id"), "bucket", F.col("weight").alias("qw"))
    dots = (
        cc.join(F.broadcast(qc), "bucket")
        .groupBy("query_id", "chunk_id")
        .agg(F.round(F.sum(F.col("qw") * F.col("cw")), 6).alias("dot"))
    )
    maxp = (
        dots.select(
            "query_id",
            (F.col("chunk_id") / _CHUNK_KEY).cast("long").alias("doc_id"),
            "dot",
        )
        .groupBy("query_id", "doc_id")
        .agg(
            F.max("dot").alias("maxp_score"),
            F.count("*").cast("long").alias("n_chunks_scored"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("maxp_score"), F.asc("doc_id"))
    return (
        maxp.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
        .select("query_id", "doc_id", "maxp_score", "n_chunks_scored", "rank")
    )


@q(
    "customers_without_orders",
    """
SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
""",
    "anti-join: customers with no high-value (>300k) order (NOT EXISTS / "
    "left_anti physical coverage; the filter pushes below the join build side)",
)
def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = t(spark, sf_dir, "customer")
    big = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return (
        customer.join(
            big, customer.c_custkey == big.o_custkey, "left_anti"
        ).select(
            "c_custkey", "c_name", F.round("c_acctbal", 2).alias("acctbal")
        )
    )


@q(
    "user_rolling_value",
    """
SELECT user_id, event_id,
       round(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS roll_avg,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS seq
FROM events
""",
    "per-user rolling 3-event average + event sequence number (sliding "
    "window-frame coverage; the batch form of a streaming rolling metric)",
)
def q_user_rolling_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id", "event_id",
        F.round(F.avg("value").over(wo.rowsBetween(-2, 0)), 6).alias("roll_avg"),
        F.row_number().over(wo).cast("long").alias("seq"),
    )


@q(
    "value_percentiles",
    """
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.9), 6) AS p90,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY event_type
""",
    "exact interpolated percentiles (median / p90) per event type — "
    "ordered-set aggregate coverage",
)
def q_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        F.count("*").cast("long").alias("n"),
    )


@q(
    "value_percentiles_approx",
    None,  # sketch algorithms differ per engine — accuracy pinned by unit
           # test against the exact form instead (tests/test_stats_sampling)
    "Greenwald-Khanna approximate percentiles (median / p90) per event type "
    "— the 100 TB form of value_percentiles: the exact ordered-set aggregate "
    "buffers and sorts every group in memory, while the GK sketch is a "
    "bounded-size mergeable summary (relative rank error ≤ 1/accuracy = "
    "10^-4) with map-side partials",
)
def q_value_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("approx_percentile(value, 0.5, 10000)"), 6).alias("p50"),
        F.round(F.expr("approx_percentile(value, 0.9, 10000)"), 6).alias("p90"),
        F.count("*").cast("long").alias("n"),
    )


@q(
    "brand_buyers_setops",
    """
WITH a AS (SELECT DISTINCT o_custkey AS ck FROM orders
           JOIN lineitem ON l_orderkey = o_orderkey
           JOIN part ON p_partkey = l_partkey WHERE p_brand = 'Brand#11'),
b AS (SELECT DISTINCT o_custkey AS ck FROM orders
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN part ON p_partkey = l_partkey WHERE p_brand = 'Brand#22')
SELECT CAST((SELECT COUNT(*) FROM a) AS BIGINT) AS n_a,
       CAST((SELECT COUNT(*) FROM b) AS BIGINT) AS n_b,
       CAST((SELECT COUNT(*) FROM (SELECT ck FROM a INTERSECT SELECT ck FROM b)) AS BIGINT) AS n_both,
       CAST((SELECT COUNT(*) FROM (SELECT ck FROM a EXCEPT SELECT ck FROM b)) AS BIGINT) AS n_only_a
""",
    "market-basket set ops: customers who bought Brand#11, Brand#22, both "
    "(INTERSECT) and exclusively the first (EXCEPT) — set-operator coverage",
)
def q_brand_buyers_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")

    def buyers(brand: str) -> DataFrame:
        return (
            li.join(F.broadcast(part.filter(F.col("p_brand") == brand)),
                    li.l_partkey == part.p_partkey)
            .join(orders, li.l_orderkey == orders.o_orderkey)
            .select(F.col("o_custkey").alias("ck"))
            .distinct()
        )

    a, b = buyers("Brand#11"), buyers("Brand#22")
    # one lazy plan: four scalar aggregates cross-joined into a single row
    # (no driver-side action; each side is a 1-row broadcast)
    na = a.agg(F.count("*").cast("long").alias("n_a"))
    nb = b.agg(F.count("*").cast("long").alias("n_b"))
    nboth = a.intersect(b).agg(F.count("*").cast("long").alias("n_both"))
    nonly = a.exceptAll(b).agg(F.count("*").cast("long").alias("n_only_a"))
    return na.crossJoin(nb).crossJoin(nboth).crossJoin(nonly)


@q(
    "orders_by_month",
    """
SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       round(SUM(o_totalprice), 2) AS revenue,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
FROM orders GROUP BY month
""",
    "monthly order rollup: date_trunc + count distinct per month "
    "(date-function and distinct-aggregate coverage)",
)
def q_orders_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.trunc("o_orderdate", "month").alias("month"))
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.countDistinct("o_custkey").cast("long").alias("n_customers"),
        )
    )


@q(
    "tfidf_top_terms",
    f"""
WITH tf AS (
  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest({duck_tokens('text')}) AS token FROM documents)
  GROUP BY doc_id, token
),
n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n_docs FROM tf),
df AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY token),
scored AS (
  SELECT tf.doc_id, tf.token,
         round(tf.tf * ln(n.n_docs / df.df), 6) AS tfidf
  FROM tf JOIN df ON tf.token = df.token CROSS JOIN n
)
SELECT doc_id, token, tfidf,
       row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token ASC) AS rank
FROM scored
QUALIFY rank <= 3
""",
    "TF-IDF: corpus document frequencies -> per-document top-3 terms "
    "(the classic text-analysis keyword extractor; df join is broadcast)",
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.functions.text import tokens

    docs = t(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(tokens("text")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    tf = tf.localCheckpoint()  # feeds n, df and the final join — scan once
    n_docs = tf.select(F.countDistinct("doc_id").cast("double").alias("n_docs"))
    df = tf.groupBy("token").agg(F.count("*").cast("long").alias("df"))
    scored = (
        tf.join(df, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id", "token",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "token", "tfidf", "rank")
    )


@q(
    "multimodal_probe",
    """
SELECT doc_id,
       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'image' ELSE 'audio' END AS kind,
       CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'gif' ELSE 'wav' END AS format,
       CAST(octet_length(encode(text)) + 4 AS BIGINT) AS n_bytes,
       CAST(CASE doc_id % 3 WHEN 0 THEN 153 WHEN 1 THEN 343 ELSE NULL END AS INTEGER) AS width,
       CAST(CASE doc_id % 3 WHEN 0 THEN 932 WHEN 1 THEN 418 ELSE NULL END AS INTEGER) AS height,
       CAST(CASE doc_id % 3 WHEN 2 THEN (octet_length(encode(text)) + 4) * 8
            ELSE NULL END AS BIGINT) AS duration_ms,
       CAST(CASE doc_id % 3 WHEN 2 THEN 16000 ELSE NULL END AS INTEGER) AS sample_rate
FROM documents
""",
    "multimodal typed-metadata probe: synthesize media bytes (PNG/GIF/WAV "
    "magic + utf-8 payload) as an opaque binary column, run the real "
    "mapInPandas probe_media operator, verify kind/format routing and the "
    "deterministic stub metadata against SQL — the decode swap-in point "
    "stays a stub, the Spark plumbing (binary schema, Arrow batches, "
    "magic-byte sniff) is the thing under test",
)
def q_multimodal_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.multimodal import probe_media

    docs = t(spark, sf_dir, "documents")
    magic = (
        F.when(F.col("doc_id") % 3 == 0, F.expr("X'89504E47'"))
        .when(F.col("doc_id") % 3 == 1, F.expr("X'47494638'"))
        .otherwise(F.expr("X'52494646'"))
    )
    media = docs.select(
        "doc_id",
        F.concat(magic, F.encode("text", "UTF-8")).alias("content"),
    )
    probed = probe_media(media, "content")
    return probed.select(
        "doc_id",
        F.col("media_meta.kind").alias("kind"),
        F.col("media_meta.format").alias("format"),
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.col("media_meta.width").alias("width"),
        F.col("media_meta.height").alias("height"),
        F.col("media_meta.duration_ms").alias("duration_ms"),
        F.col("media_meta.sample_rate").alias("sample_rate"),
    )


@q(
    "cms_heavy_estimate",
    None,  # filled below (needs operator import at module load)
    "Count-Min Sketch: d=4 x w=1024 integer counter table over all tokens, "
    "point estimates for the exact top-20 tokens (cms_n >= true_n always; "
    "the sketch shuffle is O(d*w), not O(distinct tokens))",
)
def q_cms_heavy_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.functions.text import token_hash, tokens
    from fastembed_rs_spark.operators.sketch import cms_counters, cms_estimate

    docs = t(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens("text")).alias("token")).select(
        "token", token_hash("token").alias("h")
    )
    toks = toks.localCheckpoint()  # feeds counters AND the exact top-k
    counters = cms_counters(toks, "h")
    exact = toks.groupBy("token", "h").agg(
        F.count("*").cast("long").alias("true_n")
    )
    # distributed top-k (TakeOrderedAndProject), then rank only the k rows —
    # same shape as heavy_hitter_tokens; a global row_number window here
    # would sort the whole vocabulary in one task
    top = exact.orderBy(F.desc("true_n"), F.asc("token")).limit(20)
    w = Window.orderBy(F.desc("true_n"), F.asc("token"))
    topk = top.withColumn("rank", F.row_number().over(w).cast("long"))
    est = cms_estimate(topk, counters, "h")
    return est.select("token", "true_n", "cms_n", "rank")


@q(
    "stratified_sample",
    f"""
SELECT lang, doc_id, rank FROM (
  SELECT lang, doc_id,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY {duck_token_hash("CAST(doc_id AS VARCHAR)")} ASC, doc_id ASC
         ) AS rank
  FROM documents
) WHERE rank <= 5
""",
    "stratified sampling: 5 docs per language by smallest seeded hash — "
    "per-stratum deterministic sample, reproducible across engines/runs "
    "(the grouped form of the flat hash sample)",
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.functions.text import token_hash

    docs = t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        token_hash(F.col("doc_id").cast("string")).asc(), F.col("doc_id").asc()
    )
    return (
        docs.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
        .select("lang", "doc_id", "rank")
    )


@q(
    "value_quartiles",
    """
SELECT event_type, quartile,
       CAST(COUNT(*) AS BIGINT) AS n,
       round(MIN(value), 6) AS lo,
       round(MAX(value), 6) AS hi
FROM (
  SELECT event_type, value,
         CAST(ntile(4) OVER (PARTITION BY event_type
                             ORDER BY value, event_id) AS BIGINT) AS quartile
  FROM events
)
GROUP BY event_type, quartile
""",
    "ntile quartile bucketing of event values per type with per-bucket "
    "ranges (rank-window family coverage; tie-broken on event_id so the "
    "bucketing is engine-reproducible)",
)
def q_value_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return (
        ev.select(
            "event_type", "value",
            F.ntile(4).over(w).cast("long").alias("quartile"),
        )
        .groupBy("event_type", "quartile")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.min("value"), 6).alias("lo"),
            F.round(F.max("value"), 6).alias("hi"),
        )
    )


@q(
    "clean_text",
    """
SELECT doc_id,
       trim(regexp_replace(regexp_replace(lower(text), '[^ -~]', '', 'g'),
                           ' +', ' ', 'g')) AS cleaned,
       CAST(length(trim(regexp_replace(regexp_replace(lower(text), '[^ -~]', '', 'g'),
                                       ' +', ' ', 'g'))) AS BIGINT) AS n_chars,
       CAST(length(text) AS BIGINT) AS n_chars_raw
FROM documents
""",
    "text normalization for training corpora: lowercase, strip non-printable-"
    "ASCII, collapse runs of spaces, trim — pure string-function coverage "
    "(full cleaned strings are hash-compared, not just lengths)",
)
def q_clean_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^ -~]", ""), " +", " "
        )
    )
    return docs.select(
        "doc_id",
        cleaned.alias("cleaned"),
        F.length(cleaned).cast("long").alias("n_chars"),
        F.length("text").cast("long").alias("n_chars_raw"),
    )


@q(
    "user_journey",
    """
SELECT DISTINCT user_id,
       first_value(event_type) OVER w AS first_event,
       last_value(event_type) OVER w AS last_event,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_events
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
    "per-user journey endpoints: first/last event type over the full "
    "ordered history (first_value/last_value window-frame coverage)",
)
def q_user_journey(spark: SparkSession, sf_dir: str) -> DataFrame:
    # one hash aggregate with map-side partials — min_by/max_by on the
    # (ts, event_id) struct replaces the full-frame window + distinct
    # (which shuffled the whole event log twice); (ts, event_id) is unique,
    # so the endpoints are deterministic
    ev = t(spark, sf_dir, "events")
    key = F.struct(F.col("ts"), F.col("event_id"))
    return ev.groupBy("user_id").agg(
        F.min_by("event_type", key).alias("first_event"),
        F.max_by("event_type", key).alias("last_event"),
        F.count("*").cast("long").alias("n_events"),
    )


# ===========================================================================
# 8. Round-3 curation operators: LM quality, decontamination, PII, MMR,
#    semantic dedup — the pieces a 100 TB training-data pipeline runs after
#    near-dedup (all shapes broadcast/bucket-bounded, no all-pairs work)
# ===========================================================================

@q(
    "unigram_surprisal",
    f"""
WITH tok AS (SELECT doc_id, unnest({duck_tokens('text')}) AS token FROM documents),
lm AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY token),
tot AS (SELECT CAST(count(*) AS DOUBLE) AS total FROM tok)
SELECT tok.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       round(avg(-ln(lm.cnt / tot.total)), 6) AS surprisal
FROM tok JOIN lm USING (token) CROSS JOIN tot
GROUP BY tok.doc_id
""",
    "unigram-LM quality score: train token frequencies on the corpus itself, "
    "score each doc by mean token surprisal -ln p(token) — the classic "
    "perplexity-proxy quality filter. LM table is vocabulary-sized -> "
    "broadcast; both aggregations map-side combine.",
)
def q_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.functions.text import tokens

    docs = t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(tokens("text")).alias("token")
    ).localCheckpoint()  # feeds the LM, the total and the scoring join
    lm = tok.groupBy("token").agg(F.count("*").cast("long").alias("cnt"))
    total = tok.select(F.count("*").cast("double").alias("total"))
    scored = (
        tok.join(F.broadcast(lm), "token")
        .crossJoin(F.broadcast(total))
        .select("doc_id", (-F.log(F.col("cnt") / F.col("total"))).alias("nll"))
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.round(F.avg("nll"), 6).alias("surprisal"),
    )


_DK_GRAM5 = (
    "CASE WHEN len(tk) >= 5 THEN list_transform(generate_series(1, len(tk) - 4), "
    "i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3] || ' ' || tk[i+4]) "
    "ELSE [] END"
)


@q(
    "benchmark_decontam",
    f"""
WITH toks AS (SELECT doc_id, {duck_tokens('text')} AS tk FROM documents),
grams AS (
  SELECT doc_id, unnest(list_distinct({_DK_GRAM5})) AS gram FROM toks
),
bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 50 = 0)
SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_shared_grams
FROM grams g JOIN bench USING (gram)
WHERE g.doc_id % 50 <> 0
GROUP BY g.doc_id
""",
    "benchmark decontamination: flag training docs sharing any 5-gram with "
    "the eval slice (doc_id % 50 = 0 stands in for the benchmark set). The "
    "eval gram set is small by nature -> broadcast hash join against the "
    "corpus postings; the corpus itself never shuffles.",
)
def q_benchmark_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.fast_text import word_ngram_postings_fast

    docs = t(spark, sf_dir, "documents")
    # string-exact NumPy/regex gram kernel — the interpreted
    # transform/concat_ws chain measured ~10x slower on this stage
    grams = word_ngram_postings_fast(docs, "doc_id", "text", 5).select(
        "doc_id", F.col("__g").alias("gram")
    ).localCheckpoint()  # feeds both the bench set and the corpus side
    bench = grams.filter(F.col("doc_id") % 50 == 0).select("gram").distinct()
    return (
        grams.filter(F.col("doc_id") % 50 != 0)
        .join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_shared_grams"))
    )


_PII_EMAIL = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
_PII_NUM = "[0-9]{6,}"


@q(
    "pii_redact",
    f"""
WITH aug AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN text || ' contact user' || doc_id || '@example.com now'
              WHEN doc_id % 11 = 0 THEN text || ' ref 99' || doc_id || '0042'
              ELSE text END AS txt
  FROM documents
),
e AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(txt, '{_PII_EMAIL}')) AS BIGINT) AS n_emails,
         regexp_replace(txt, '{_PII_EMAIL}', '<EMAIL>', 'g') AS txt1
  FROM aug
)
SELECT doc_id, n_emails,
       CAST(len(regexp_extract_all(txt1, '{_PII_NUM}')) AS BIGINT) AS n_longnums,
       regexp_replace(txt1, '{_PII_NUM}', '<NUM>', 'g') AS redacted
FROM e
""",
    "PII scrubbing: count + redact emails then long digit runs (synthetic "
    "PII is injected deterministically since the test corpus carries none; "
    "both engines construct identical inputs). Pure per-row regex -> "
    "embarrassingly parallel, no shuffle at all.",
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    aug = (
        F.when(did % 7 == 0,
               F.concat(F.col("text"), F.lit(" contact user"),
                        did.cast("string"), F.lit("@example.com now")))
        .when(did % 11 == 0,
              F.concat(F.col("text"), F.lit(" ref 99"),
                       did.cast("string"), F.lit("0042")))
        .otherwise(F.col("text"))
    )
    step = docs.select(
        "doc_id",
        F.regexp_count(aug, F.lit(_PII_EMAIL)).cast("long").alias("n_emails"),
        F.regexp_replace(aug, _PII_EMAIL, "<EMAIL>").alias("txt1"),
    )
    return step.select(
        "doc_id", "n_emails",
        F.regexp_count(F.col("txt1"), F.lit(_PII_NUM)).cast("long").alias("n_longnums"),
        F.regexp_replace(F.col("txt1"), _PII_NUM, "<NUM>").alias("redacted"),
    )


@q(
    "repetition_signals",
    f"""
WITH tf AS (
  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest({duck_tokens('text')}) AS token FROM documents)
  GROUP BY doc_id, token
)
SELECT doc_id,
       CAST(sum(tf) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_distinct,
       round(CAST(count(*) AS DOUBLE) / sum(tf), 6) AS ttr,
       round(CAST(max(tf) AS DOUBLE) / sum(tf), 6) AS top_token_frac
FROM tf GROUP BY doc_id
""",
    "Gopher-style repetition quality signals: type-token ratio and "
    "most-frequent-token mass per document (low TTR / high top-token mass "
    "flags degenerate repetitive text). One explode + two map-side-"
    "combinable aggregations.",
)
def q_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.functions.text import tokens

    docs = t(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(tokens("text")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    total = F.sum("tf")
    return tf.groupBy("doc_id").agg(
        total.cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_distinct"),
        F.round(F.count("*").cast("double") / total, 6).alias("ttr"),
        F.round(F.max("tf").cast("double") / total, 6).alias("top_token_frac"),
    )


_SEMDEDUP_TAU = 0.35

_SEMDEDUP_ORACLE = f"""
WITH RECURSIVE cent AS (
  SELECT vec_id AS centroid_id, embedding AS ce FROM embeddings WHERE vec_id % 50 = 0
),
assign AS (
  SELECT e.vec_id, e.embedding, c.centroid_id,
         round({_dk_cos('e.embedding', 'c.ce')}, 6) AS cscore
  FROM embeddings e CROSS JOIN cent c
  QUALIFY row_number() OVER (PARTITION BY e.vec_id ORDER BY cscore DESC, c.centroid_id ASC) = 1
),
edges AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM assign a JOIN assign b
    ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
  WHERE round({_dk_cos('a.embedding', 'b.embedding')}, 6) >= {_SEMDEDUP_TAU!r}
),
sym AS (SELECT id_a AS a, id_b AS b FROM edges
        UNION SELECT id_b, id_a FROM edges),
reach(node, r) AS (
  SELECT DISTINCT a, a FROM sym
  UNION
  SELECT s.b, reach.r FROM reach JOIN sym s ON s.a = reach.node
),
comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node),
sizes AS (SELECT component, CAST(count(*) AS BIGINT) AS cluster_size
          FROM comp GROUP BY component)
SELECT comp.node AS vec_id, comp.component, sizes.cluster_size,
       comp.node = comp.component AS is_canonical
FROM comp JOIN sizes ON comp.component = sizes.component
"""


@q(
    "semantic_dedup",
    _SEMDEDUP_ORACLE,
    "SemDeDup-style semantic dedup (Abbas et al. 2023 shape): bucket vectors "
    "by nearest coarse centroid, find cosine near-dup pairs WITHIN buckets "
    "only (never all-pairs), cluster them via connected components, keep the "
    "min-id member as canonical. Composition of the IVF assign + pair + CC "
    "operators; per-bucket pair work replaces the O(n^2) global join.",
)
def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.components import (
        component_summary,
        connected_components,
    )

    emb = t(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centroid_vec")
    )
    bucketed = assign_ivf_buckets_fast(emb, centroids)

    # Within-bucket pair scoring as ONE NumPy tile per bucket instead of a
    # per-pair expression join — the same sequential-dim fold (and margin
    # pre-filter + Spark-side HALF_UP rounding) as
    # dedup.embedding_near_dups_blocked, so scores stay bit-identical to
    # the oracle's list_sum. Tile memory is bucket_size^2 doubles; bucket
    # sizes are ~n/centroids by construction.
    margin = _SEMDEDUP_TAU - 1e-6

    def bucket_pairs(pdf):
        import numpy as np
        import pandas as pd

        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "score": []}).astype(
                {"id_a": "int64", "id_b": "int64", "score": "float64"}
            )
        ids = pdf["vec_id"].to_numpy()
        V = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
        d = V.shape[1]
        sq = np.zeros(n)
        for i in range(d):
            sq += V[:, i] * V[:, i]
        norms = np.sqrt(sq)
        dots = np.zeros((n, n))
        for i in range(d):
            dots += np.outer(V[:, i], V[:, i])
        denom = np.outer(norms, norms)
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = np.where(denom == 0.0, 0.0, dots / denom)
        aa, bb = np.meshgrid(ids, ids, indexing="ij")
        keep = (aa < bb) & (cos >= margin)
        return pd.DataFrame({"id_a": aa[keep], "id_b": bb[keep], "score": cos[keep]})

    pairs = (
        bucketed.select("centroid_id", "vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
        .groupBy("centroid_id")
        .applyInPandas(bucket_pairs, schema="id_a long, id_b long, score double")
        .withColumn("score", F.round("score", 6))
        .filter(F.col("score") >= _SEMDEDUP_TAU)
        .select("id_a", "id_b")
    )
    cc = component_summary(connected_components(pairs))
    return cc.select(
        F.col("node").alias("vec_id"), "component", "cluster_size",
        (F.col("node") == F.col("component")).alias("is_canonical"),
    )


_DSIR_B = 1024  # hashed feature buckets (Xie et al. 2023 use 10^4; scaled down)


@q(
    "dsir_importance",
    f"""
WITH tok AS (
  SELECT doc_id, {duck_token_hash('token')} % {_DSIR_B} AS b
  FROM (SELECT doc_id, unnest({duck_tokens('text')}) AS token FROM documents)
),
tgt AS (SELECT b, CAST(count(*) AS BIGINT) AS c FROM tok WHERE doc_id % 50 = 0 GROUP BY b),
raw AS (SELECT b, CAST(count(*) AS BIGINT) AS c FROM tok WHERE doc_id % 50 <> 0 GROUP BY b),
tots AS (
  SELECT CAST((SELECT coalesce(sum(c), 0) FROM tgt) AS DOUBLE) AS tgt_tot,
         CAST((SELECT coalesce(sum(c), 0) FROM raw) AS DOUBLE) AS raw_tot
),
scored AS (
  SELECT tok.doc_id,
         ln((coalesce(tgt.c, 0) + 1) / (tots.tgt_tot + {_DSIR_B}))
         - ln((coalesce(raw.c, 0) + 1) / (tots.raw_tot + {_DSIR_B})) AS lr
  FROM tok LEFT JOIN tgt ON tok.b = tgt.b LEFT JOIN raw ON tok.b = raw.b
  CROSS JOIN tots
  WHERE tok.doc_id % 50 <> 0
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       round(avg(lr), 6) AS dsir_weight
FROM scored GROUP BY doc_id
""",
    "DSIR importance weights (Xie et al. 2023 shape): hashed-unigram "
    "log-likelihood ratio of a target (eval-slice) LM vs the raw-corpus LM, "
    "averaged per doc — the data-selection score for matching a target "
    "distribution. Both LMs are bucket-count tables (size B=1024) -> "
    "broadcast joins; everything else map-side combines.",
)
def q_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.functions.text import token_hash, tokens

    docs = t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(tokens("text")).alias("token")
    ).select(
        "doc_id", (token_hash("token") % _DSIR_B).alias("b")
    ).localCheckpoint()  # feeds both LMs and the scoring pass
    tgt = tok.filter(F.col("doc_id") % 50 == 0).groupBy("b").agg(
        F.count("*").cast("long").alias("tc"))
    raw = tok.filter(F.col("doc_id") % 50 != 0).groupBy("b").agg(
        F.count("*").cast("long").alias("rc"))
    tots = tgt.agg(F.sum("tc").cast("double").alias("tgt_tot")).crossJoin(
        raw.agg(F.sum("rc").cast("double").alias("raw_tot")))
    lr = (
        F.log((F.coalesce(F.col("tc"), F.lit(0)) + 1) / (F.col("tgt_tot") + _DSIR_B))
        - F.log((F.coalesce(F.col("rc"), F.lit(0)) + 1) / (F.col("raw_tot") + _DSIR_B))
    )
    scored = (
        tok.filter(F.col("doc_id") % 50 != 0)
        .join(F.broadcast(tgt), "b", "left")
        .join(F.broadcast(raw), "b", "left")
        .crossJoin(F.broadcast(tots))
        .select("doc_id", lr.alias("lr"))
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.round(F.avg("lr"), 6).alias("dsir_weight"),
    )


_PACK_C = 256  # chunk capacity in tokens
_PACK_SHARDS = 8


@q(
    "sequence_packing",
    f"""
WITH d AS (
  SELECT doc_id, doc_id % {_PACK_SHARDS} AS shard,
         CAST(len({duck_tokens('text')}) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, shard, n_tokens,
         sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - n_tokens AS start_tok
  FROM d WHERE n_tokens > 0
)
SELECT doc_id, shard, CAST(start_tok AS BIGINT) AS start_tok,
       CAST(shard * 1000000 + start_tok // {_PACK_C} AS BIGINT) AS chunk_id,
       CAST((start_tok + n_tokens - 1) // {_PACK_C} - start_tok // {_PACK_C} + 1
            AS BIGINT) AS n_chunks
FROM c
""",
    "pretraining sequence packing (concat-and-chunk): per shard, docs "
    "concatenate in id order into a virtual token stream cut into fixed "
    f"{_PACK_C}-token chunks; each doc gets its starting chunk and span "
    "count. The cumulative sum is a per-shard window — shards bound window "
    "partition size, so no global sort exists at scale.",
)
def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.functions.text import tokens

    docs = t(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        (F.col("doc_id") % _PACK_SHARDS).alias("shard"),
        F.size(tokens("text")).cast("long").alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)
    w = Window.partitionBy("shard").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    c = d.withColumn("start_tok", F.sum("n_tokens").over(w) - F.col("n_tokens"))
    return c.select(
        "doc_id", "shard", "start_tok",
        (F.col("shard") * 1000000 + F.floor(F.col("start_tok") / _PACK_C))
        .cast("long").alias("chunk_id"),
        (F.floor((F.col("start_tok") + F.col("n_tokens") - 1) / _PACK_C)
         - F.floor(F.col("start_tok") / _PACK_C) + 1).cast("long").alias("n_chunks"),
    )


@q(
    "embedding_stats",
    f"""
WITH dims AS (SELECT unnest(generate_series(1, {EMB_DIM})) AS i),
x AS (
  SELECT dims.i - 1 AS dim, CAST(e.embedding[dims.i] AS DOUBLE) AS x
  FROM embeddings e CROSS JOIN dims
),
agg AS (
  SELECT dim, CAST(count(*) AS BIGINT) AS n, sum(x) AS s, sum(x * x) AS ss,
         min(x) AS mn, max(x) AS mx
  FROM x GROUP BY dim
)
SELECT dim, n, round(s / n, 6) AS mean,
       round(sqrt((ss - s * s / n) / (n - 1)), 6) AS std,
       round(mn, 6) AS min_x, round(mx, 6) AS max_x
FROM agg
""",
    "per-dimension embedding distribution stats (mean/std/min/max) — the "
    "drift-monitoring table a production embedding pipeline publishes per "
    "batch. One posexplode + one map-side-combinable aggregation keyed by "
    "dim; variance via the explicit sum-of-squares identity so both engines "
    "compute the same expression.",
)
def q_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    x = emb.select(F.posexplode(F.col("embedding").cast("array<double>"))
                   .alias("dim", "x"))
    agg = x.groupBy("dim").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("ss"),
        F.min("x").alias("mn"),
        F.max("x").alias("mx"),
    )
    return agg.select(
        F.col("dim").cast("long").alias("dim"), "n",
        F.round(F.col("s") / F.col("n"), 6).alias("mean"),
        F.round(F.sqrt((F.col("ss") - F.col("s") * F.col("s") / F.col("n"))
                       / (F.col("n") - 1)), 6).alias("std"),
        F.round("mn", 6).alias("min_x"),
        F.round("mx", 6).alias("max_x"),
    )


def _mmr_oracle(nq: int, ncand: int, k: int, lam: float) -> str:
    """Greedy MMR replayed as chained CTEs (one select per step): candidate
    relevance is rounded to 6 before ranking, pairwise cosines stay raw
    (bit-identical fold order both engines), objective = lam*rel -
    (1-lam)*maxsim in exact double arithmetic, ties to the lowest vec_id."""
    one_minus = 1.0 - lam
    parts = [f"""
WITH cand AS (
  SELECT q.vec_id AS query_id, e.vec_id,
         round({_dk_cos('q.embedding', 'e.embedding')}, 6) AS relevance,
         list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM (SELECT vec_id, embedding FROM embeddings WHERE vec_id < {nq}) q
  CROSS JOIN embeddings e
  QUALIFY row_number() OVER (PARTITION BY q.vec_id
                             ORDER BY relevance DESC, e.vec_id ASC) <= {ncand}
),
s1 AS (
  SELECT query_id, vec_id, relevance, v,
         {lam!r} * relevance - {one_minus!r} * 0.0 AS objective,
         CAST(1 AS BIGINT) AS mmr_rank
  FROM cand
  QUALIFY row_number() OVER (PARTITION BY query_id
                             ORDER BY {lam!r} * relevance - {one_minus!r} * 0.0 DESC,
                                      vec_id ASC) = 1
),
sel1 AS (SELECT * FROM s1)"""]
    for step in range(2, k + 1):
        prev = f"sel{step - 1}"
        parts.append(f""",
rem{step} AS (
  SELECT c.query_id, c.vec_id, c.relevance, c.v,
         {lam!r} * c.relevance - {one_minus!r} * max({_dk_cos('c.v', 's.v')}) AS objective
  FROM cand c JOIN {prev} s ON c.query_id = s.query_id
  WHERE NOT EXISTS (SELECT 1 FROM {prev} p
                    WHERE p.query_id = c.query_id AND p.vec_id = c.vec_id)
  GROUP BY c.query_id, c.vec_id, c.relevance, c.v
),
s{step} AS (
  SELECT query_id, vec_id, relevance, v, objective, CAST({step} AS BIGINT) AS mmr_rank
  FROM rem{step}
  QUALIFY row_number() OVER (PARTITION BY query_id
                             ORDER BY objective DESC, vec_id ASC) = 1
),
sel{step} AS (SELECT * FROM {prev} UNION ALL SELECT * FROM s{step})""")
    parts.append(f"""
SELECT query_id, vec_id, relevance, round(objective, 6) AS objective, mmr_rank
FROM sel{k}""")
    return "".join(parts)


@q(
    "mmr_diversify",
    _mmr_oracle(nq=3, ncand=20, k=5, lam=0.7),
    "Maximal Marginal Relevance diversification: cosine top-20 candidates "
    "per query re-ranked greedily to 5 diverse exemplars (lambda=0.7). The "
    "corpus is touched only by the bounded top-k stage; MMR itself runs as "
    "one applyInPandas over |queries| x 20 rows.",
)
def q_mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.mmr import mmr_rerank

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    cands = cosine_top_k(
        queries, emb, k=20, round_to=6, dim=EMB_DIM
    ).select("query_id", "vec_id", F.col("score").alias("relevance"))
    cands = cands.join(
        emb.select("vec_id", F.col("embedding").cast("array<double>").alias("vec")),
        "vec_id",
    )
    out = mmr_rerank(cands, k=5, lam=0.7)
    return out.select("query_id", "vec_id", "relevance", "objective", "mmr_rank")


@q(
    "hll_distinct_per_lang",
    None,  # filled in _fill_sketch_oracles (needs the sketch module)
    "per-group HLL: distinct-token estimate per language — the per-group "
    "sketch shape production metrics use. Register table is |groups| x 2^p "
    "rows max (map-side combined); merging across datasets stays a max().",
)
def q_hll_distinct_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.fast_text import token_hash_rows_fast
    from fastembed_rs_spark.operators.sketch import hll_bucket_cols, hll_finalize

    docs = t(spark, sf_dir, "documents")
    hashes = token_hash_rows_fast(docs, "text", key_col="lang")
    bucket, rho = hll_bucket_cols("h", p=9)
    regs = hashes.select("lang", bucket, rho).groupBy("lang", "bucket").agg(
        F.max("rho").alias("rho")
    )
    return hll_finalize(regs, keys=["lang"], p=9)


@q(
    "customers_with_returns",
    """
SELECT c.c_custkey, c.c_name, c.c_acctbal
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE o.o_custkey = c.c_custkey AND l.l_returnflag = 'R'
)
""",
    "customers with at least one returned line item — LEFT SEMI join "
    "coverage (EXISTS): the probe side reduces to distinct custkeys before "
    "the join, so the semi join carries no duplicate fan-out",
)
def q_customers_with_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    returned = (
        li.filter(F.col("l_returnflag") == "R")
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select("o_custkey")
    )
    return cust.join(
        returned, cust["c_custkey"] == returned["o_custkey"], "left_semi"
    ).select("c_custkey", "c_name", "c_acctbal")


@q(
    "user_event_pivot",
    """
SELECT user_id,
       CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
       CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view,
       CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
       CAST(count(*) FILTER (WHERE event_type NOT IN ('click','view','purchase')
            OR event_type IS NULL) AS BIGINT) AS other
FROM events GROUP BY user_id
""",
    "per-user event-type matrix — PIVOT coverage expressed as conditional "
    "aggregation (one map-side-combinable pass; a literal pivot on an "
    "unbounded key space would need a driver-side distinct first)",
)
def q_user_event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    known = ("click", "view", "purchase")
    aggs = [
        F.count(F.when(F.col("event_type") == k, 1)).cast("long").alias(k)
        for k in known
    ]
    other = F.count(
        F.when(~F.col("event_type").isin(*known) | F.col("event_type").isNull(), 1)
    ).cast("long").alias("other")
    return ev.groupBy("user_id").agg(*aggs, other)


@q(
    "value_by_type_salted",
    """
SELECT event_type, round(sum(value), 2) AS total_value,
       CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY event_type
""",
    "skew-safe two-stage aggregation (operators/scale.salted_aggregate): a "
    "hot group key's rows spread over 32 salt buckets before the true-key "
    "merge — value-identical to the plain GROUP BY (the oracle), which is "
    "the point: salting is a physical rewrite, not a semantic one",
)
def q_value_by_type_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.scale import salted_aggregate

    ev = t(spark, sf_dir, "events")
    out = salted_aggregate(
        ev, ["event_type"],
        {"total_value": ("value", "sum"), "n": ("value", "count")},
        salt_buckets=32,
    )
    return out.select(
        "event_type", F.round("total_value", 2).alias("total_value"),
        F.col("n").cast("long").alias("n"),
    )


@q(
    "incremental_dedup",
    f"""
WITH fp AS (
  SELECT doc_id, {duck_doc_fingerprint('text')} AS fingerprint FROM documents
),
known AS (SELECT DISTINCT fingerprint FROM fp WHERE doc_id % 10 < 8),
new_batch AS (SELECT * FROM fp WHERE doc_id % 10 >= 8)
SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, fingerprint,
       CAST(count(*) AS BIGINT) AS n_in_batch
FROM new_batch
WHERE fingerprint NOT IN (SELECT fingerprint FROM known)
GROUP BY fingerprint
""",
    "incremental dedup — the shape a production ingest actually runs: a NEW "
    "batch (doc_id % 10 >= 8) dedups against the persisted fingerprint store "
    "of the existing corpus (anti-join on fingerprint) and then within "
    "itself (min-id per fingerprint). At scale the store is bucketed by "
    "fingerprint so the anti-join is co-located; the batch side is small.",
)
def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.fast_text import doc_fingerprints_fast

    docs = t(spark, sf_dir, "documents")
    fp = doc_fingerprints_fast(docs, "doc_id", "text").localCheckpoint()
    known = fp.filter(F.col("doc_id") % 10 < 8).select("fingerprint").distinct()
    new_batch = fp.filter(F.col("doc_id") % 10 >= 8)
    return (
        new_batch.join(known, "fingerprint", "left_anti")
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").cast("long").alias("doc_id"),
            F.count("*").cast("long").alias("n_in_batch"),
        )
        .select("doc_id", "fingerprint", "n_in_batch")
    )


@q(
    "events_funnel",
    """
WITH v AS (
  SELECT user_id, MIN(ts) AS vts FROM events WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, MIN(e.ts) AS cts
  FROM events e JOIN v ON e.user_id = v.user_id
   AND e.ts > v.vts AND e.ts <= v.vts + INTERVAL 24 HOUR
  WHERE e.event_type = 'click' GROUP BY e.user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS pts
  FROM events e JOIN c ON e.user_id = c.user_id
   AND e.ts > c.cts AND e.ts <= c.cts + INTERVAL 24 HOUR
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
), u AS (SELECT DISTINCT user_id FROM events),
staged AS (
  SELECT u.user_id,
         CASE WHEN p.user_id IS NOT NULL THEN 3
              WHEN c.user_id IS NOT NULL THEN 2
              WHEN v.user_id IS NOT NULL THEN 1
              ELSE 0 END AS stage
  FROM u
  LEFT JOIN v ON u.user_id = v.user_id
  LEFT JOIN c ON u.user_id = c.user_id
  LEFT JOIN p ON u.user_id = p.user_id
)
SELECT stage, CAST(COUNT(*) AS BIGINT) AS n_users
FROM staged GROUP BY stage
""",
    "ordered funnel conversion (view -> click within 24h -> purchase "
    "within 24h, strictly increasing event times): three "
    "map-side-combinable min aggregations chained by user equi-joins — "
    "no window over full history, no per-user sort; the "
    "sequential-pattern family next to sessionize/journey",
)
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    day_ns = 24 * 3600 * 1_000_000_000  # ts is epoch nanos (see t())
    ev = t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id").agg(F.min("ts").alias("vts"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter((F.col("ts") > F.col("vts")) & (F.col("ts") <= F.col("vts") + day_ns))
        .groupBy("user_id").agg(F.min("ts").alias("cts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter((F.col("ts") > F.col("cts")) & (F.col("ts") <= F.col("cts") + day_ns))
        .groupBy("user_id").agg(F.min("ts").alias("pts"))
    )
    u = ev.select("user_id").distinct()
    staged = (
        u.join(v.select("user_id", F.lit(1).alias("__v")), "user_id", "left")
        .join(c.select("user_id", F.lit(1).alias("__c")), "user_id", "left")
        .join(p.select("user_id", F.lit(1).alias("__p")), "user_id", "left")
        .select(
            F.when(F.col("__p").isNotNull(), 3)
            .when(F.col("__c").isNotNull(), 2)
            .when(F.col("__v").isNotNull(), 1)
            .otherwise(0)
            .alias("stage")
        )
    )
    return staged.groupBy("stage").agg(F.count("*").cast("long").alias("n_users"))


_RETRIEVE_RERANK_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest(list_transform({duck_tokens('text')}, tk -> {duck_token_hash('tk')} % 64)) AS bucket
  FROM documents
),
tf AS (SELECT doc_id, bucket, CAST(COUNT(*) AS DOUBLE) AS tf FROM toks GROUP BY doc_id, bucket),
nrm AS (SELECT doc_id, sqrt(SUM(tf * tf)) AS nrm FROM tf GROUP BY doc_id),
coords AS (
  SELECT tf.doc_id, tf.bucket, round(tf.tf / nrm.nrm, 6) AS weight
  FROM tf JOIN nrm ON tf.doc_id = nrm.doc_id
),
qc AS (SELECT doc_id AS query_id, bucket, weight FROM coords WHERE doc_id < 3),
dots AS (
  SELECT qc.query_id, c.doc_id, round(SUM(qc.weight * c.weight), 6) AS dot
  FROM qc JOIN coords c ON qc.bucket = c.bucket
  GROUP BY qc.query_id, c.doc_id
),
cands AS (
  SELECT query_id, doc_id, dot,
         row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, doc_id ASC) AS rr
  FROM dots QUALIFY rr <= 20
),
qt AS (SELECT doc_id AS query_id, list_distinct({duck_tokens('text')}) AS qtk
       FROM documents WHERE doc_id < 3),
dt AS (SELECT doc_id, list_distinct({duck_tokens('text')}) AS dtk FROM documents),
scored AS (
  SELECT c.query_id, c.doc_id, c.dot,
         round(
           CASE WHEN (len(qtk) = 0 AND len(dtk) = 0) THEN 0.0 ELSE
             CAST(len(list_intersect(qtk, dtk)) AS DOUBLE)
             / (CAST(len(qtk) AS DOUBLE) + CAST(len(dtk) AS DOUBLE)
                - CAST(len(list_intersect(qtk, dtk)) AS DOUBLE))
           END, 6) AS score
  FROM cands c
  JOIN qt ON c.query_id = qt.query_id
  JOIN dt ON c.doc_id = dt.doc_id
)
SELECT query_id, doc_id, dot, score,
       row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank
FROM scored QUALIFY rank <= 5
"""


@q(
    "retrieve_then_rerank",
    _RETRIEVE_RERANK_ORACLE,
    "two-stage retrieval, the production search stack: dense hash-embed "
    "retrieval (bucket equi-join dot) takes top-20 candidates per query, "
    "a pairwise rerank scorer (cross-encoder analogue) re-orders ONLY "
    "those candidates to a final top-5 — rerank cost bounded by "
    "queries x 20, never the corpus",
)
def q_retrieve_then_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.fast_text import hash_embed_coords_fast
    from fastembed_rs_spark.operators.rerank import token_overlap_score

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    coords = hash_embed_coords_fast(docs, "doc_id", "text", dim=64).localCheckpoint()
    qc = coords.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"), "bucket", F.col("weight").alias("qw")
    )
    dots = (
        coords.join(F.broadcast(qc), "bucket")
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum(F.col("qw") * F.col("weight")), 6).alias("dot"))
    )
    w_retrieve = Window.partitionBy("query_id").orderBy(F.desc("dot"), F.asc("doc_id"))
    cands = (
        dots.withColumn("__rr", F.row_number().over(w_retrieve))
        .filter(F.col("__rr") <= 20)
        .drop("__rr")
    )
    qs = docs.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("__qtext")
    )
    pairs = (
        cands.join(docs.select("doc_id", F.col("text").alias("__dtext")), "doc_id")
        .join(F.broadcast(qs), "query_id")
    )
    scored = pairs.withColumn(
        "score", F.round(token_overlap_score(F.col("__qtext"), F.col("__dtext")), 6)
    )
    w_final = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w_final).cast("long"))
        .filter(F.col("rank") <= 5)
        .select("query_id", "doc_id", "dot", "score", "rank")
    )


@q(
    "order_rank_profile",
    """
SELECT o_orderkey, o_orderpriority,
       round(o_totalprice, 2) AS price,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume,
       round(coalesce(lag(o_totalprice) OVER w, 0.0), 2) AS prev_price,
       round(coalesce(lead(o_totalprice) OVER w, 0.0), 2) AS next_price
FROM orders
WHERE o_totalprice > 480000
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
""",
    "rank-window completeness: percent_rank / cume_dist / lag / lead in one "
    "pass over a single window spec — one sort per partition, four "
    "functions share it",
)
def q_order_rank_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 480000)
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey", "o_orderpriority",
        F.round("o_totalprice", 2).alias("price"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.round(F.coalesce(F.lag("o_totalprice").over(w), F.lit(0.0)), 2).alias(
            "prev_price"
        ),
        F.round(F.coalesce(F.lead("o_totalprice").over(w), F.lit(0.0)), 2).alias(
            "next_price"
        ),
    )


@q(
    "incremental_embed",
    f"""
WITH fp AS (
  SELECT doc_id, {duck_doc_fingerprint('text')} AS fingerprint FROM documents
),
known AS (SELECT DISTINCT fingerprint FROM fp WHERE doc_id % 10 < 8),
todo AS (
  SELECT min(doc_id) AS doc_id FROM fp
  WHERE doc_id % 10 >= 8 AND fingerprint NOT IN (SELECT fingerprint FROM known)
  GROUP BY fingerprint
),
docs2 AS (SELECT d.doc_id, d.text FROM documents d JOIN todo USING (doc_id)),
toks AS (
  SELECT doc_id, unnest(list_transform({duck_tokens('text')}, tk -> {duck_token_hash('tk')} % 64)) AS bucket
  FROM docs2
),
tf AS (SELECT doc_id, bucket, CAST(COUNT(*) AS DOUBLE) AS tf FROM toks GROUP BY doc_id, bucket),
nrm AS (SELECT doc_id, sqrt(SUM(tf * tf)) AS nrm FROM tf GROUP BY doc_id)
SELECT tf.doc_id, CAST(tf.bucket AS BIGINT) AS bucket,
       round(tf.tf / nrm.nrm, 6) AS weight
FROM tf JOIN nrm ON tf.doc_id = nrm.doc_id
""",
    "cache-aware embedding: a new batch (doc_id % 10 >= 8) embeds ONLY "
    "content whose fingerprint is absent from the persisted store (docs "
    "% 10 < 8) and not duplicated within the batch — at 100 TB the "
    "anti-join on the bucketed store is what keeps re-ingest from "
    "re-paying the GPU bill; one canonical embed per new fingerprint",
)
def q_incremental_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.fast_text import (
        doc_fingerprints_fast,
        hash_embed_coords_fast,
    )

    docs = t(spark, sf_dir, "documents")
    fp = doc_fingerprints_fast(docs, "doc_id", "text").localCheckpoint()
    known = fp.filter(F.col("doc_id") % 10 < 8).select("fingerprint").distinct()
    todo = (
        fp.filter(F.col("doc_id") % 10 >= 8)
        .join(known, "fingerprint", "left_anti")
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    to_embed = docs.join(todo, "doc_id").select("doc_id", "text")
    return hash_embed_coords_fast(to_embed, "doc_id", "text", dim=64)


@q(
    "embed_qwen_vl_stub",
    None,
    "Qwen3-VL image embedding through the REAL smart-resize + merge-block "
    "patch pipeline (src/models/qwen3.rs:193-336) and the per-worker vision "
    "tower session (stub offline); returns (doc_id, dim, norm, grid) — "
    "rows-only check, numeric semantics pinned by tests",
)
def q_embed_qwen_vl_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.functions.vector import l2_norm
    from fastembed_rs_spark.operators.embed import embed_qwen_vl

    from fastembed_rs_spark.operators.scale import spread_if_narrow

    docs = t(spark, sf_dir, "documents")
    media = spread_if_narrow(docs.select(
        "doc_id", F.encode("text", "UTF-8").alias("content")
    ))
    out = embed_qwen_vl(media, "content", model="stub-qwen-vl",
                        patch_size=4, merge_size=2, keep_content=False)
    return out.select(
        "doc_id",
        F.size("embedding").cast("long").alias("dim"),
        F.round(l2_norm("embedding"), 4).alias("norm"),
        F.col("grid.h").cast("long").alias("grid_h"),
        F.col("grid.w").cast("long").alias("grid_w"),
    )


# ---------------------------------------------------------------------------
# round-4 additions: remaining classic relational shapes (outer-join
# distribution, scalar-subquery + anti-join, conditional-aggregate ratio,
# semi-join with inequality residual) + three training-data pipeline steps
# (passage-level exact dedup, domain mixing weights, vocabulary coverage)
# ---------------------------------------------------------------------------


@q(
    "customer_order_distribution",
    """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN (SELECT * FROM orders WHERE o_orderpriority <> '1-URGENT') o
    ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
)
GROUP BY c_count
""",
    "TPC-H Q13-shaped order-count distribution: left outer join (customers "
    "with zero orders kept at count 0) -> per-customer count -> histogram; "
    "both aggs shuffle on their key, the second over at most max(c_count) "
    "rows",
)
def q_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer").select("c_custkey")
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@q(
    "sales_opportunity_segments",
    """
SELECT c_mktsegment, count(*) AS numcust,
       round(sum(c_acctbal), 2) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
  AND c_custkey NOT IN (SELECT o_custkey FROM orders
                        WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
GROUP BY c_mktsegment
""",
    "TPC-H Q22-shaped sales opportunity: scalar-subquery threshold "
    "(broadcast single-row cross join) + anti join against a filtered order-"
    "key set, grouped by segment — high-balance customers with no "
    "high-priority order; the priority filter is pushed to the orders scan",
)
def q_sales_opportunity_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ).select("o_custkey")
    # scalar threshold: one-row aggregate, broadcast into every partition
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("__ab")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__ab"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@q(
    "promo_revenue_share",
    """
SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0.0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_share,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01'
""",
    "TPC-H Q14-shaped promo revenue share: conditional-aggregate ratio over "
    "a fact x broadcast-dim join; the shipdate filter is pushed to the "
    "lineitem scan and part never shuffles",
)
def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    part = t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_share"),
            F.round(F.sum(rev), 2).alias("total_revenue"),
        )
    )


@q(
    "order_priority_pending",
    """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate <  TIMESTAMP '1997-07-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
""",
    "TPC-H Q4-shaped priority count: EXISTS with an inequality residual "
    "(any line shipped after the order date) planned as a left-semi join "
    "on the order key with the date comparison as join residual — "
    "the lineitem side is never aggregated or deduplicated",
)
def q_order_priority_pending(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


_CHUNK_DEDUP_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS tk
  FROM documents
), d AS (
  SELECT doc_id, tk, greatest(1, CAST(ceil((len(tk) - 16) / 48.0) AS INT)) AS n_chunks
  FROM toks
), e AS (
  SELECT doc_id, tk, CAST(unnest(range(0, n_chunks)) AS INT) AS chunk_idx FROM d
), chunks AS (
  SELECT doc_id,
         array_to_string(list_slice(tk, chunk_idx * 48 + 1, chunk_idx * 48 + 64), ' ') AS chunk_text
  FROM e
), fps AS (
  SELECT doc_id, {duck_token_hash('chunk_text')} AS fingerprint FROM chunks
)
SELECT fingerprint,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_occurrences,
       min(doc_id) AS canonical_doc_id
FROM fps
GROUP BY fingerprint
HAVING count(DISTINCT doc_id) >= 2
"""


@q(
    "chunk_exact_dedup",
    _CHUNK_DEDUP_ORACLE,
    "passage-level exact dedup (the 'deduplicating training data' substring "
    "step at chunk granularity): 64-token windows -> rolling-hash "
    "fingerprint -> cross-document duplicate groups. Explode is shuffle-"
    "free; the only shuffle groups 8-byte fingerprints, never chunk text",
)
def q_chunk_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.functions.text import token_hash
    from fastembed_rs_spark.operators.chunk import chunk_by_tokens

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    chunks = chunk_by_tokens(docs, "text", size=64, overlap=16)
    fps = chunks.select(
        "doc_id", token_hash(F.col("chunk_text")).alias("fingerprint")
    )
    return (
        fps.groupBy("fingerprint")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
        .filter(F.col("n_docs") >= 2)
    )


@q(
    "domain_mix_weights",
    """
WITH stats AS (
  SELECT source, CAST(count(*) AS BIGINT) AS docs,
         CAST(sum(n_chars) AS BIGINT) AS chars
  FROM documents GROUP BY source
), tot AS (
  SELECT sum(chars) AS tc, count(*) AS n_dom FROM stats
)
SELECT source, docs, chars,
       round(chars / tc, 6) AS char_share,
       round((1.0 / n_dom) / (chars / tc), 4) AS mix_weight
FROM stats, tot
""",
    "domain mixing weights (the sampling-ratio step of corpus assembly): "
    "per-source character mass -> share of corpus -> weight that would "
    "rebalance sampling to a uniform target mix. One groupBy over the "
    "corpus + a broadcast single-row total; at 100 TB the per-source stats "
    "table is KB-sized regardless of corpus size",
)
def q_domain_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    stats = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("docs"), F.sum("n_chars").alias("chars")
    )
    tot = stats.agg(
        F.sum("chars").alias("__tc"), F.count(F.lit(1)).alias("__nd")
    )
    share = F.col("chars") / F.col("__tc")
    return stats.crossJoin(F.broadcast(tot)).select(
        "source", "docs", "chars",
        F.round(share, 6).alias("char_share"),
        F.round((1.0 / F.col("__nd")) / share, 4).alias("mix_weight"),
    )


_VOCAB_ORACLE = f"""
WITH toks AS (
  SELECT unnest({duck_tokens('text')}) AS token FROM documents
), counts AS (
  SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM toks GROUP BY token
), tot AS (SELECT sum(cnt) AS total FROM counts),
ranked AS (
  SELECT token, cnt,
         CAST(row_number() OVER (ORDER BY cnt DESC, token) AS BIGINT) AS rnk
  FROM counts QUALIFY rnk <= 256
)
SELECT token, cnt, rnk,
       round(sum(cnt) OVER (ORDER BY rnk
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             / total, 6) AS coverage
FROM ranked, tot
"""


@q(
    "token_vocab_coverage",
    _VOCAB_ORACLE,
    "vocabulary building with coverage curve (the tokenizer-training "
    "precursor): global token counts -> top-256 vocabulary -> cumulative "
    "share of total token mass each prefix covers. Distributed TakeOrdered "
    "picks the vocab; the cumsum window runs over the 256 survivors only",
)
def q_token_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.functions.text import tokens as sp_tokens

    docs = t(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(sp_tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # total token mass == sum of all counts, but computed as a shuffle-free
    # per-doc size sum (one partial-agg scan) instead of re-running the
    # whole token groupBy a second time
    total = docs.agg(
        F.sum(F.size(sp_tokens("text"))).alias("__total")
    )
    # distributed global top-256 (TakeOrderedAndProject), THEN rank/cumsum
    # windows over the 256 survivors — never a corpus-wide single partition
    top = counts.orderBy(F.desc("cnt"), F.asc("token")).limit(256)
    w = Window.orderBy(F.desc("cnt"), F.asc("token"))
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        top.withColumn("rnk", F.row_number().over(w).cast("long"))
        .withColumn("__cum", F.sum("cnt").over(wc))
        .crossJoin(F.broadcast(total))
        .select(
            "token", "cnt", "rnk",
            F.round(F.col("__cum") / F.col("__total"), 6).alias("coverage"),
        )
    )


_SAMPLED_PCTL_ORACLE = f"""
WITH h AS (
  SELECT value,
         {duck_token_hash("CAST(event_id AS VARCHAR) || '#pctl'")} AS hh
  FROM events
), s AS (
  SELECT value FROM h ORDER BY hh, value LIMIT 512
)
SELECT round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.9), 6) AS p90,
       round(quantile_cont(value, 0.99), 6) AS p99,
       CAST(count(*) AS BIGINT) AS sample_n
FROM s
"""


@q(
    "value_percentiles_sampled",
    _SAMPLED_PCTL_ORACLE,
    "deterministic-sample quantile sketch: the 512 rows with the smallest "
    "engine-shared hash form a uniform sample (a KMV-style bottom-k set — "
    "constant memory, mergeable by min-union across partitions/streams), "
    "exact interpolated percentiles over it. Unlike approx_percentile this "
    "IS cross-engine replayable, so it oracle-checks; the sample is picked "
    "by distributed TakeOrdered, never a full sort",
)
def q_value_percentiles_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.functions.text import token_hash

    ev = t(spark, sf_dir, "events")
    hashed = ev.select(
        "value",
        token_hash(
            F.concat(F.col("event_id").cast("string"), F.lit("#pctl"))
        ).alias("__h"),
    )
    samp = hashed.orderBy("__h", "value").limit(512)
    return samp.agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
        F.count(F.lit(1)).alias("sample_n"),
    )


@q(
    "nation_trade_volume",
    """
WITH flows AS (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS BIGINT) AS l_year,
         CAST(round(l_extendedprice * (1 - l_discount) * 10000)
              AS BIGINT) AS vol_e4
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE n1.n_name <> n2.n_name
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
)
SELECT supp_nation, cust_nation, l_year,
       ((sum(vol_e4) + 50) // 100) / 100.0 AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM flows GROUP BY supp_nation, cust_nation, l_year
""",
    "TPC-H Q7-shaped international trade volume: revenue flow between "
    "every (supplier nation -> customer nation) pair per ship year, "
    "cross-border only. Fact table joins four broadcastable dims "
    "(supplier/customer/nation x2) — one shuffle total (the final "
    "group-by); the shipdate range is pushed to the scan. Per-item "
    "revenue is an exact 4-decimal value, so it sums as INTEGER "
    "ten-thousandths and rounds to cents via integer half-up division — "
    "fully order-independent across engines. A double sum+round(2) flips "
    "last cents at half-cent boundaries (454 groups make a hit "
    "near-certain at sf0.01), and even an exact integer sum divided to a "
    "double breaks on Spark's shortest-decimal-string rounding vs "
    "DuckDB's binary rounding at .xx5.",
)
def q_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    sup = t(spark, sf_dir, "supplier")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = t(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    * 10000
                ).cast("long")
            ).alias("__vol_e4"),
            F.count("*").cast("long").alias("n_items"),
        )
        .select(
            "supp_nation", "cust_nation", "l_year",
            (F.expr("(__vol_e4 + 50) div 100") / 100.0).alias("revenue"),
            "n_items",
        )
    )


@q(
    "promo_market_share",
    """
WITH base AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
)
SELECT o_year,
       round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
             / sum(volume), 6) AS mkt_share
FROM base GROUP BY o_year
""",
    "TPC-H Q8-shaped market share: NATION_3 suppliers' slice of PROMO-part "
    "volume sold to AMERICA-region customers, per order year. Six "
    "broadcastable dims around the fact scan, conditional-aggregate ratio "
    "(promo_revenue_share's verified rounding pattern) — one shuffle.",
)
def q_promo_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    sup = t(spark, sf_dir, "supplier")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(0.0)
                )
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
    )


@q(
    "returned_items_top_customers",
    """
WITH rev AS (
  SELECT c_custkey, c_name, n_name,
         round(c_acctbal, 2) AS acctbal,
         ((sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                    AS BIGINT)) + 50) // 100) / 100.0 AS revenue
  FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation ON c_nationkey = n_nationkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
  GROUP BY c_custkey, c_name, n_name, acctbal
)
SELECT c_custkey, c_name, n_name, acctbal, revenue,
       row_number() OVER (ORDER BY revenue DESC, c_custkey ASC) AS rank
FROM rev
QUALIFY rank <= 20
""",
    "TPC-H Q10-shaped returned-item reporting: top-20 customers by revenue "
    "lost to returns in a 6-month window (adapted to available columns). "
    "Revenue sums as INTEGER ten-thousandths and rounds to cents via "
    "integer half-up division (the nation_trade_volume pattern), so the "
    "ranking key is bit-identical across engines — a double sum+round(2) "
    "flips last cents at .xx5 boundaries and reorders the top-20. The "
    "global top-20 runs as TakeOrderedAndProject over the aggregated "
    "(bounded) customer set, rank window on 20 survivors.",
)
def q_returned_items_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(
            "c_custkey", "c_name", "n_name",
            F.round("c_acctbal", 2).alias("acctbal"),
        )
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    * 10000
                ).cast("long")
            ).alias("__rev_e4")
        )
        .withColumn(
            "revenue", F.expr("(__rev_e4 + 50) div 100") / 100.0
        )
    )
    top = rev.orderBy(F.desc("revenue"), F.asc("c_custkey")).limit(20)
    w = Window.orderBy(F.desc("revenue"), F.asc("c_custkey"))
    return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "c_custkey", "c_name", "n_name", "acctbal", "revenue", "rank"
    )


@q(
    "top_supplier_revenue",
    """
WITH rev AS (
  SELECT l_suppkey,
         ((sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                    AS BIGINT)) + 50) // 100) / 100.0 AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN rev ON s_suppkey = l_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
""",
    "TPC-H Q15-shaped top supplier: quarterly revenue view + scalar-max "
    "subquery equality. Revenue sums as INTEGER ten-thousandths and "
    "rounds to cents via integer half-up division (nation_trade_volume "
    "pattern), so the equality-with-max filter compares bit-identical "
    "doubles across engines. The scalar max broadcasts as a one-row "
    "crossJoin; the supplier dim broadcasts; only the fact aggregation "
    "shuffles.",
)
def q_top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    sup = t(spark, sf_dir, "supplier")
    rev = (
        li.groupBy("l_suppkey")
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    * 10000
                ).cast("long")
            ).alias("__rev_e4")
        )
        .select(
            "l_suppkey",
            (F.expr("(__rev_e4 + 50) div 100") / 100.0).alias("total_revenue"),
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("__mx"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@q(
    "brand_bracket_revenue",
    """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 10 AND 35)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
       AND l_quantity BETWEEN 20 AND 50)
""",
    "TPC-H Q19-shaped disjunctive-predicate revenue (adapted to available "
    "columns): three brand/size/quantity brackets OR-ed across a fact x "
    "broadcast-dim join — the disjunction can only be evaluated post-join, "
    "but each side's half of the predicates (quantity brackets on "
    "lineitem, brand/size on part) still prunes its own scan.",
)
def q_brand_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    q, s, b = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    pred = (
        ((b == "Brand#1") & s.between(1, 15) & q.between(1, 20))
        | ((b == "Brand#2") & s.between(10, 30) & q.between(10, 35))
        | ((b == "Brand#3") & s.between(20, 50) & q.between(20, 50))
    )
    return j.filter(pred).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.count("*").cast("long").alias("n_items"),
    )


@q(
    "daily_activity_reconcile",
    """
WITH ev AS (
  SELECT epoch_ns(ts) // 86400000000000 AS day,
         CAST(count(*) AS BIGINT) AS event_count,
         round(sum(value), 2) AS event_value
  FROM events GROUP BY 1
), ord AS (
  SELECT epoch_us(o_orderdate) // 86400000000 AS day,
         CAST(count(*) AS BIGINT) AS order_count,
         round(sum(o_totalprice), 2) AS order_total
  FROM orders GROUP BY 1
)
SELECT coalesce(ev.day, ord.day) AS day,
       coalesce(ev.event_count, 0) AS event_count,
       coalesce(ev.event_value, 0.0) AS event_value,
       coalesce(ord.order_count, 0) AS order_count,
       coalesce(ord.order_total, 0.0) AS order_total
FROM ev FULL OUTER JOIN ord ON ev.day = ord.day
""",
    "FULL OUTER JOIN reconciliation: daily event activity vs daily order "
    "volume, days present on either side kept with zero-filled gaps — the "
    "one join type the catalog lacked. Day keys are exact integer "
    "epoch-day division on both engines (no zone-dependent date casts); "
    "both sides aggregate before the join, so the join input is "
    "days-sized, not row-sized",
)
def q_daily_activity_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        t(spark, sf_dir, "events")
        .select(F.expr("ts div 86400000000000").alias("day"), "value")
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.round(F.sum("value"), 2).alias("event_value"),
        )
    )
    ords = (
        t(spark, sf_dir, "orders")
        .select(
            F.expr(
                "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
                "cast(o_orderdate as timestamp_ntz)) div 86400"
            ).alias("day"),
            "o_totalprice",
        )
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            F.round(F.sum("o_totalprice"), 2).alias("order_total"),
        )
    )
    e, o = ev.alias("e"), ords.alias("o")
    return (
        e.join(o, F.col("e.day") == F.col("o.day"), "full_outer")
        .select(
            F.coalesce(F.col("e.day"), F.col("o.day")).alias("day"),
            F.coalesce("event_count", F.lit(0).cast("long")).alias("event_count"),
            F.coalesce("event_value", F.lit(0.0)).alias("event_value"),
            F.coalesce("order_count", F.lit(0).cast("long")).alias("order_count"),
            F.coalesce("order_total", F.lit(0.0)).alias("order_total"),
        )
    )


_SAMPLED_PCTL_GROUPED_ORACLE = f"""
WITH h AS (
  SELECT event_type, value,
         {duck_token_hash("CAST(event_id AS VARCHAR) || '#pctl'")} AS hh
  FROM events
), r AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY hh, value) AS rn
  FROM h QUALIFY rn <= 256
)
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.9), 6) AS p90,
       CAST(count(*) AS BIGINT) AS sample_n
FROM r GROUP BY event_type
"""


@q(
    "value_percentiles_sampled_by_type",
    _SAMPLED_PCTL_GROUPED_ORACLE,
    "grouped KMV quantile sketch: per-group bottom-256-by-hash sample via a "
    "rank-limited window (WindowGroupLimit caps every partition's buffer at "
    "256 — the grouped counterpart of the global TakeOrdered form), exact "
    "interpolated percentiles per group. One shuffle on the group key; "
    "per-group state is constant-size regardless of group cardinality skew",
)
def q_value_percentiles_sampled_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.functions.text import token_hash

    ev = t(spark, sf_dir, "events")
    hashed = ev.select(
        "event_type", "value",
        token_hash(
            F.concat(F.col("event_id").cast("string"), F.lit("#pctl"))
        ).alias("__h"),
    )
    w = Window.partitionBy("event_type").orderBy(F.asc("__h"), F.asc("value"))
    samp = (
        hashed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 256)
    )
    return samp.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        F.count(F.lit(1)).alias("sample_n"),
    )


_BIGRAM_LIFT_ORACLE = f"""
WITH toks AS (
  SELECT {duck_tokens('text')} AS tk FROM documents
), big AS (
  SELECT list_extract(tk, i) AS w1, list_extract(tk, i + 1) AS w2
  FROM toks, unnest(range(1, len(tk))) AS t(i)
), bc AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM big GROUP BY w1, w2
), uni AS (
  SELECT w1 AS w, CAST(count(*) AS BIGINT) AS c FROM big GROUP BY w1
), nb AS (SELECT sum(c12) AS n12 FROM bc),
scored AS (
  SELECT bc.w1, bc.w2, bc.c12,
         round((bc.c12 / n12) / ((u1.c / n12) * (u2.c / n12)), 6) AS lift
  FROM bc JOIN uni u1 ON bc.w1 = u1.w JOIN uni u2 ON bc.w2 = u2.w, nb
  WHERE bc.c12 >= 5
)
SELECT w1, w2, c12, lift,
       CAST(row_number() OVER (ORDER BY lift DESC, w1, w2) AS BIGINT) AS rnk
FROM scored QUALIFY rnk <= 30
"""


@q(
    "bigram_lift",
    _BIGRAM_LIFT_ORACLE,
    "collocation / phrase mining: adjacent-token bigram lift "
    "(observed/expected co-occurrence under independence — the log-free "
    "PMI ranking, kept log-free so the oracle is exact integer-ratio "
    "arithmetic). Bigrams via zipped slices (codegen, shuffle-free "
    "explode), unigram table broadcast into the scoring join, global "
    "top-30 by TakeOrdered before the rank window",
)
def q_bigram_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.functions.text import tokens as sp_tokens

    docs = t(spark, sf_dir, "documents")
    tk = sp_tokens("text")
    # adjacent pairs: zip(tk[0:n-1], tk[1:n]) — first-word position i also
    # drives the unigram counts below, so both stats share ONE explode
    pairs = docs.select(
        F.explode(
            F.arrays_zip(
                F.slice(tk, 1, F.greatest(F.size(tk) - 1, F.lit(0))).alias("w1"),
                F.slice(tk, 2, F.greatest(F.size(tk) - 1, F.lit(0))).alias("w2"),
            )
        ).alias("p")
    ).select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    # ONE corpus scan: bigram counts are materialized once, and the unigram
    # marginal (sum over second words) + grand total both derive from them —
    # without this the corpus would be scanned and exploded 4x
    bc = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12")).localCheckpoint()
    uni = bc.groupBy("w1").agg(F.sum("c12").alias("c")).withColumnRenamed("w1", "w")
    nb = bc.agg(F.sum("c12").alias("__n12"))
    scored = (
        bc.filter(F.col("c12") >= 5)
        .join(F.broadcast(uni.withColumnRenamed("c", "__c1")), F.col("w1") == F.col("w"))
        .drop("w")
        .join(F.broadcast(uni.withColumnRenamed("c", "__c2")), F.col("w2") == F.col("w"))
        .drop("w")
        .crossJoin(F.broadcast(nb))
        .select(
            "w1", "w2", "c12",
            F.round(
                (F.col("c12") / F.col("__n12"))
                / ((F.col("__c1") / F.col("__n12")) * (F.col("__c2") / F.col("__n12"))),
                6,
            ).alias("lift"),
        )
    )
    top = scored.orderBy(F.desc("lift"), F.asc("w1"), F.asc("w2")).limit(30)
    w = Window.orderBy(F.desc("lift"), F.asc("w1"), F.asc("w2"))
    return top.withColumn("rnk", F.row_number().over(w).cast("long"))


# ===========================================================================
# 10. Tokenizer training / LM scoring / epoch shuffling / model-as-data
#     (beyond-reference pipeline operators, round 6)
# ===========================================================================

_BPE_ORACLE = f"""
WITH w AS (SELECT unnest({duck_tokens('text')}) AS word FROM documents),
wf AS (SELECT word, CAST(count(*) AS BIGINT) AS wfreq FROM w GROUP BY word),
p AS (
  SELECT wfreq,
         unnest(list_transform(generate_series(1, length(word) - 1),
                i -> substr(word, i, 2))) AS pair
  FROM wf WHERE length(word) >= 2
),
pc AS (SELECT pair, CAST(sum(wfreq) AS BIGINT) AS cnt FROM p GROUP BY pair),
top AS (SELECT pair, cnt FROM pc ORDER BY cnt DESC, pair LIMIT 20)
SELECT pair, cnt,
       CAST(row_number() OVER (ORDER BY cnt DESC, pair) AS BIGINT) AS rnk
FROM top
"""


@q(
    "bpe_merge_step",
    _BPE_ORACLE,
    "one distributed BPE-training iteration (the tokenizer-training inner "
    "loop): corpus -> word-frequency table (ONE scan; vocabulary-sized, "
    "orders of magnitude smaller than the corpus) -> adjacent symbol-pair "
    "counts weighted by word frequency -> global top-20 merge candidates "
    "via TakeOrdered. Classic BPE counts pairs over the word-frequency "
    "table, not the raw token stream, so each extra merge iteration "
    "re-scans only the vocab — at 100 TB the corpus is read once per "
    "vocab rebuild, not once per merge",
)
def q_bpe_merge_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.functions.text import tokens as sp_tokens

    docs = t(spark, sf_dir, "documents")
    wf = (
        docs.select(F.explode(sp_tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wfreq"))
    )
    # adjacent character pairs per distinct word, weighted by wfreq —
    # codegen-only transform over the (small) vocabulary table
    pc = (
        wf.filter(F.length("word") >= 2)
        .select(
            "wfreq",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length("word") - 1),
                    lambda i: F.substring(F.col("word"), i, F.lit(2)),
                )
            ).alias("pair"),
        )
        .groupBy("pair")
        .agg(F.sum("wfreq").cast("long").alias("cnt"))
    )
    top = pc.orderBy(F.desc("cnt"), F.asc("pair")).limit(20)
    wn = Window.orderBy(F.desc("cnt"), F.asc("pair"))
    return top.withColumn("rnk", F.row_number().over(wn).cast("long"))


_BIGRAM_SURPRISAL_ORACLE = f"""
WITH toks AS (SELECT doc_id, {duck_tokens('text')} AS tk FROM documents),
big AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(tk) - 1),
                i -> tk[i] || ' ' || tk[i + 1])) AS bg
  FROM toks WHERE len(tk) >= 2
),
bper AS (SELECT doc_id, bg, CAST(count(*) AS BIGINT) AS k FROM big GROUP BY doc_id, bg),
c2 AS (SELECT bg, CAST(sum(k) AS DOUBLE) AS c2 FROM bper GROUP BY bg),
c1m AS (SELECT split_part(bg, ' ', 1) AS w1, CAST(sum(k) AS DOUBLE) AS c1
        FROM bper GROUP BY 1),
c2m AS (SELECT split_part(bg, ' ', 2) AS w2, CAST(sum(k) AS DOUBLE) AS cm
        FROM bper GROUP BY 1),
n2 AS (SELECT CAST(sum(k) AS DOUBLE) AS n FROM bper),
s AS (
  SELECT c2.bg, -ln(0.7 * c2.c2 / c1m.c1 + 0.3 * c2m.cm / n2.n) AS s
  FROM c2
  JOIN c1m ON split_part(c2.bg, ' ', 1) = c1m.w1
  JOIN c2m ON split_part(c2.bg, ' ', 2) = c2m.w2
  CROSS JOIN n2
)
SELECT bper.doc_id, CAST(sum(bper.k) AS BIGINT) AS n_bigrams,
       round(sum(bper.k * s.s) / sum(bper.k), 6) AS surprisal
FROM bper JOIN s USING (bg)
GROUP BY bper.doc_id
"""


@q(
    "bigram_surprisal",
    _BIGRAM_SURPRISAL_ORACLE,
    "interpolated bigram-LM quality score (unigram_surprisal's stronger "
    "sibling): train bigram stats on the corpus itself, score each doc by "
    "mean -ln(0.7*P(w2|w1) + 0.3*P(w2)) over its bigrams. The bigram "
    "stream is materialized ONCE (per-doc bigram counts, checkpointed); "
    "the conditional's denominator and the backoff unigram are both "
    "marginals of that table, so no second corpus scan. Type scores join "
    "vocab-sized marginals broadcast; the per-doc join keys on the bigram "
    "(shuffle join — at 100 TB the bigram-type table outgrows broadcast "
    "by design, unlike the unigram case)",
)
def q_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.functions.text import tokens as sp_tokens

    docs = t(spark, sf_dir, "documents")
    tk = sp_tokens("text")
    n1 = F.greatest(F.size(tk) - 1, F.lit(0))
    big = docs.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice(tk, 1, n1).alias("w1"), F.slice(tk, 2, n1).alias("w2")
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    bper = (
        big.groupBy("doc_id", "w1", "w2")
        .agg(F.count(F.lit(1)).alias("k"))
        .localCheckpoint()  # feeds the LM marginals AND the scoring join
    )
    c2 = bper.groupBy("w1", "w2").agg(F.sum("k").cast("double").alias("c2"))
    c1m = bper.groupBy("w1").agg(F.sum("k").cast("double").alias("c1"))
    c2m = bper.groupBy("w2").agg(F.sum("k").cast("double").alias("cm"))
    n2 = bper.agg(F.sum("k").cast("double").alias("n"))
    scored = (
        c2.join(F.broadcast(c1m), "w1")
        .join(F.broadcast(c2m), "w2")
        .crossJoin(F.broadcast(n2))
        .select(
            "w1", "w2",
            (-F.log(
                0.7 * F.col("c2") / F.col("c1") + 0.3 * F.col("cm") / F.col("n")
            )).alias("s"),
        )
    )
    return (
        bper.join(scored, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.sum("k").cast("long").alias("n_bigrams"),
            F.round(
                F.sum(F.col("k") * F.col("s")) / F.sum("k"), 6
            ).alias("surprisal"),
        )
    )


_EPOCH_SHUFFLE_ORACLE = f"""
WITH h AS (
  SELECT doc_id,
         {duck_token_hash("CAST(doc_id AS VARCHAR) || '#epoch0'")} AS hh
  FROM documents
),
sharded AS (
  SELECT doc_id, hh, hh % 32 AS shard,
         CAST(row_number() OVER (PARTITION BY hh % 32 ORDER BY hh, doc_id)
              AS BIGINT) AS pos
  FROM h
)
SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(hh) AS BIGINT) AS first_hh,
       CAST(sum((pos * (doc_id % 1000003)) % 1000000007) AS BIGINT)
         AS perm_checksum
FROM sharded GROUP BY shard
"""


@q(
    "epoch_shuffle",
    _EPOCH_SHUFFLE_ORACLE,
    "deterministic training-epoch shuffle: every doc gets a seeded "
    "engine-shared hash, shard = hash % 32, position-in-shard by "
    "rank-within-shard — a full-corpus random permutation with NO global "
    "sort (each shard ranks independently; at 100 TB that is 32+ "
    "independent sorts of corpus/32 each, the partitionBy write shape of "
    "write_training_shards). Output pins the permutation itself via a "
    "per-shard modular checksum of (pos, doc_id), so a different epoch "
    "seed or a broken rank is a hash mismatch, not a silent reshuffle",
)
def q_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.functions.text import token_hash

    docs = t(spark, sf_dir, "documents").select("doc_id")
    hh = token_hash(F.concat(F.col("doc_id").cast("string"), F.lit("#epoch0")))
    sharded = docs.select("doc_id", hh.alias("hh"), (hh % 32).alias("shard"))
    w = Window.partitionBy("shard").orderBy("hh", "doc_id")
    per = sharded.withColumn("pos", F.row_number().over(w).cast("long"))
    return per.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.min("hh").alias("first_hh"),
        F.sum(
            (F.col("pos") * (F.col("doc_id") % 1000003)) % 1000000007
        ).cast("long").alias("perm_checksum"),
    )


# classifier weights are DATA (a tiny broadcast table), not code — the
# fasttext-style "train a small quality classifier, score the corpus"
# deployment pattern. Same literals on both engines.
_QC_WEIGHTS = (
    ("bias", -1.5), ("f_len", 1.2), ("f_sw", 2.0),
    ("f_punct", -4.0), ("f_atl", 0.05),
)

_QC_ORACLE = f"""
WITH {_duck_stats_ctes()},
feats AS (
  SELECT doc_id,
         least(CAST(n_tokens AS DOUBLE) / 50.0, 1.0) AS f_len,
         least(stopword_ratio * 4.0, 1.0) AS f_sw,
         punct_ratio AS f_punct,
         avg_token_len AS f_atl
  FROM m
),
wts AS (
  SELECT * FROM (VALUES {", ".join(f"('{f}', {w})" for f, w in _QC_WEIGHTS)})
  AS t(feature, w)
),
wrow AS (
  SELECT max(CASE WHEN feature = 'bias' THEN w END) AS w_bias,
         max(CASE WHEN feature = 'f_len' THEN w END) AS w_len,
         max(CASE WHEN feature = 'f_sw' THEN w END) AS w_sw,
         max(CASE WHEN feature = 'f_punct' THEN w END) AS w_punct,
         max(CASE WHEN feature = 'f_atl' THEN w END) AS w_atl
  FROM wts
),
z AS (
  SELECT doc_id,
         round(w_bias + w_len * f_len + w_sw * f_sw + w_punct * f_punct
               + w_atl * f_atl, 6) AS z
  FROM feats CROSS JOIN wrow
)
SELECT doc_id, z,
       round(1.0 / (1.0 + exp(-z)), 6) AS score,
       CAST(CASE WHEN z >= 0.0 THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM z
"""


@q(
    "quality_classifier",
    _QC_ORACLE,
    "linear quality classifier scoring (fasttext-style deploy pattern): "
    "features from the one-pass text-stats kernel, weights as a tiny "
    "broadcast table pivoted to one row (model-as-data — retraining swaps "
    "the table, not the plan), sigmoid score + keep decision per doc. "
    "Logit is rounded to 6 BEFORE the sigmoid so the one transcendental "
    "runs on bit-identical inputs in both engines; keep tests z >= 0 "
    "(exactly the 0.5 boundary) on the rounded logit. Pure codegen over "
    "one corpus scan — no shuffle at all",
)
def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.fast_text import text_stat_counts_fast

    docs = t(spark, sf_dir, "documents")
    counts = text_stat_counts_fast(docs, "doc_id", "text")
    feats = counts.select(
        "doc_id",
        F.least(F.col("n_tokens").cast("double") / 50.0, F.lit(1.0)).alias("f_len"),
        F.least(TS.stopword_ratio_from_counts() * 4.0, F.lit(1.0)).alias("f_sw"),
        TS.punct_ratio_from_counts().alias("f_punct"),
        TS.avg_token_len_from_counts().alias("f_atl"),
    )
    wts = spark.createDataFrame(list(_QC_WEIGHTS), "feature string, w double")
    # long-form weights -> one row of w_* columns (renamed so they can't
    # collide with the feature columns after the cross join)
    wrow = (
        wts.groupBy()
        .pivot("feature", [f for f, _ in _QC_WEIGHTS])
        .agg(F.first("w"))
        .select(
            F.col("bias").alias("w_bias"),
            F.col("f_len").alias("w_len"),
            F.col("f_sw").alias("w_sw"),
            F.col("f_punct").alias("w_punct"),
            F.col("f_atl").alias("w_atl"),
        )
    )
    scored = feats.crossJoin(F.broadcast(wrow))
    # same left-to-right addition order as the oracle: double addition is
    # not associative, identical order => identical bits => identical round
    z = F.round(
        F.col("w_bias")
        + F.col("w_len") * F.col("f_len")
        + F.col("w_sw") * F.col("f_sw")
        + F.col("w_punct") * F.col("f_punct")
        + F.col("w_atl") * F.col("f_atl"),
        6,
    )
    return scored.withColumn("z", z).select(
        "doc_id",
        "z",
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("z"))), 6).alias("score"),
        F.when(F.col("z") >= 0.0, F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("keep"),
    )


# shared quality CTE chain (base/m/qual via the single-source builders
# next to _QUALITY_ORACLE) carrying source — feeds the corpus-assembly
# oracles below
_QUAL_SRC_CTE = _duck_quality_ctes(", source")


def _scored_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, n_tokens, quality) — Spark twin of _QUAL_SRC_CTE's
    qual CTE, through the one-pass text-stats kernel."""
    from fastembed_rs_spark.operators.fast_text import text_stat_counts_fast

    docs = t(spark, sf_dir, "documents")
    counts = text_stat_counts_fast(docs, "doc_id", "text", keep_cols=("source",))
    return counts.select(
        "doc_id",
        "source",
        F.col("n_tokens"),
        F.round(TS.quality_score_from_counts(), 6).alias("quality"),
    )


_MIX_BUDGET = 800  # tokens per source (absolute, like a real mixing recipe)


@q(
    "token_budget_mix",
    f"""
WITH {_QUAL_SRC_CTE},
r AS (
  SELECT source, doc_id, quality, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (
           PARTITION BY source ORDER BY quality DESC, doc_id ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS tokens_before
  FROM qual
)
SELECT source, doc_id, quality, n_tokens, tokens_before
FROM r WHERE tokens_before < {_MIX_BUDGET}
""",
    "token-budget corpus mixing (the selection step of corpus assembly, "
    "complementing domain_mix_weights' ratio step): per source, take docs "
    "best-quality-first until the source's token budget is spent — a doc is "
    "taken iff ANY budget remains before it, so the greedy fill is "
    "deterministic and order-stable (rank on the ROUNDED quality, ties by "
    "doc_id). One window per source: sources partition independently, so at "
    "100 TB this is n_sources parallel sorts of corpus/n_sources each; a "
    "heavily skewed source would two-level it (per-shard budget split) — "
    "same shape as write_training_shards' per-stream cumsum",
)
def q_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = _scored_docs(spark, sf_dir)
    w = (
        Window.partitionBy("source")
        .orderBy(F.desc("quality"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        scored.withColumn(
            "tokens_before",
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long"),
        )
        .filter(F.col("tokens_before") < _MIX_BUDGET)
        .select("source", "doc_id", "quality", "n_tokens", "tokens_before")
    )


_WS_K = 64  # sample size


@q(
    "weighted_sample",
    f"""
WITH {_QUAL_SRC_CTE},
keyed AS (
  SELECT doc_id, quality,
         round(ln(({duck_token_hash("CAST(doc_id AS VARCHAR) || '#ws'")} + 1.0)
                  / {HASH_MOD + 1}.0)
               / greatest(quality, 0.001), 6) AS skey
  FROM qual
)
SELECT doc_id, quality, skey,
       CAST(row_number() OVER (ORDER BY skey DESC, doc_id ASC) AS BIGINT) AS rank
FROM keyed
QUALIFY rank <= {_WS_K}
""",
    "deterministic weighted sampling without replacement (Efraimidis-"
    "Spirakis A-ES, 2006): key = u^(1/w) with u a seeded engine-shared "
    "hash-uniform in (0,1] and w the doc quality score, computed in log "
    "space (ln(u)/w is the same ordering with one transcendental and no "
    "pow), top-k by key. Inclusion probability is proportional-to-weight "
    "without replacement, yet fully replayable: same seed string, same "
    "sample, on any engine. Shuffle-free key map + distributed TakeOrdered "
    "— the 100 TB shape is one scan, never a global sort; ranking uses the "
    "ROUNDED key (ties by doc_id) per the catalog determinism policy",
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.functions.text import token_hash

    scored = _scored_docs(spark, sf_dir)
    hh = token_hash(F.concat(F.col("doc_id").cast("string"), F.lit("#ws")))
    u = (hh + F.lit(1.0)) / F.lit(float(HASH_MOD + 1))
    skey = F.round(
        F.log(u) / F.greatest(F.col("quality"), F.lit(0.001)), 6
    )
    keyed = scored.select("doc_id", "quality", skey.alias("skey"))
    top = keyed.orderBy(F.desc("skey"), F.asc("doc_id")).limit(_WS_K)
    w = Window.orderBy(F.desc("skey"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


@q(
    "dedup_keep_best",
    f"""
WITH RECURSIVE {_QUAL_SRC_CTE},
g AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len({duck_tokens('text')}) >= 3 THEN
           list_transform(generate_series(1, len({duck_tokens('text')}) - 2),
             i -> concat_ws(' ', {duck_tokens('text')}[i], {duck_tokens('text')}[i+1], {duck_tokens('text')}[i+2]))
         ELSE [] END) AS grams
  FROM documents
),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM g a JOIN g b ON a.doc_id < b.doc_id
  WHERE round(CASE WHEN (len(a.grams) = 0 AND len(b.grams) = 0) THEN 0.0 ELSE
      CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
      / (CAST(len(a.grams) AS DOUBLE) + CAST(len(b.grams) AS DOUBLE)
         - CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)) END, 6) >= 0.5
),
sym AS (SELECT id_a AS a, id_b AS b FROM pairs
        UNION SELECT id_b, id_a FROM pairs),
reach(node, r) AS (
  SELECT DISTINCT a, a FROM sym
  UNION
  SELECT s.b, reach.r FROM reach JOIN sym s ON s.a = reach.node
),
comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node),
labeled AS (
  SELECT q.doc_id, q.quality, coalesce(c.component, q.doc_id) AS component
  FROM qual q LEFT JOIN comp c ON q.doc_id = c.node
)
SELECT doc_id, component,
       CAST(count(*) OVER (PARTITION BY component) AS BIGINT) AS cluster_size,
       quality,
       CAST(CASE WHEN row_number() OVER (
              PARTITION BY component ORDER BY quality DESC, doc_id ASC) = 1
            THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM labeled
""",
    "quality-aware dedup survivor selection (RefinedWeb-style keep policy): "
    "3-gram Jaccard near-dup pairs -> connected components -> within every "
    "cluster keep the argmax-quality doc (ties: min id) instead of the "
    "min-id canonical that semantic_dedup/corpus_curation use — WHICH "
    "duplicate survives is a curation decision, not an arbitrary one. "
    "Singletons (docs in no pair) survive unchanged via a left join against "
    "the label table, which stays pair-bounded (broadcast-able when dups "
    "are sparse). operators/dedup.py::keep_best_representative; the argmax "
    "window partitions by component — near-dup clusters, bounded fan-in, "
    "never corpus-sized partitions",
)
def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    # ADAPTIVE pair generator: identical pairs to the inverted index at any
    # threshold > 0, but flips to the prefix-filtered shape when boilerplate
    # grams make ΣC(df,2) explode — the composition inherits the jaccard
    # family's scale behavior instead of pinning the worst shape
    pairs = D.jaccard_pairs_adaptive(docs, "doc_id", "text", n=3, threshold=0.5)
    scored = _scored_docs(spark, sf_dir)
    return D.keep_best_representative(
        scored, pairs.select("id_a", "id_b"), "doc_id", "quality"
    )


_BACKOFF_ORACLE = f"""
WITH toks AS (SELECT doc_id, {duck_tokens('text')} AS tk FROM documents),
tri AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(tk) - 2),
                i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS tg
  FROM toks WHERE len(tk) >= 3
),
c3g AS (SELECT tg, CAST(count(*) AS DOUBLE) AS c123 FROM tri
        WHERE doc_id % 2 = 0 GROUP BY tg),
big AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(tk) - 1),
                i -> tk[i] || ' ' || tk[i+1])) AS bg
  FROM toks WHERE len(tk) >= 2
),
c2g AS (SELECT bg, CAST(count(*) AS DOUBLE) AS c FROM big
        WHERE doc_id % 2 = 0 GROUP BY bg),
uni AS (SELECT doc_id, unnest(tk) AS w FROM toks),
c1g AS (SELECT w, CAST(count(*) AS DOUBLE) AS c FROM uni
        WHERE doc_id % 2 = 0 GROUP BY w),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM uni WHERE doc_id % 2 = 0),
per AS (SELECT doc_id, tg, CAST(count(*) AS BIGINT) AS k FROM tri
        WHERE doc_id % 2 = 1 GROUP BY doc_id, tg),
sc AS (
  SELECT per.doc_id, per.k,
         -ln(CASE WHEN coalesce(c3g.c123, 0.0) > 0.0 THEN c3g.c123 / c12.c
                  WHEN coalesce(c23.c, 0.0) > 0.0 THEN 0.4 * c23.c / cu2.c
                  ELSE 0.4 * 0.4 * (coalesce(cu3.c, 0.0) + 0.5) / (nn.n + 0.5)
             END) AS s
  FROM per
  LEFT JOIN c3g ON per.tg = c3g.tg
  LEFT JOIN c2g c12 ON split_part(per.tg, ' ', 1) || ' ' || split_part(per.tg, ' ', 2) = c12.bg
  LEFT JOIN c2g c23 ON split_part(per.tg, ' ', 2) || ' ' || split_part(per.tg, ' ', 3) = c23.bg
  LEFT JOIN c1g cu2 ON split_part(per.tg, ' ', 2) = cu2.w
  LEFT JOIN c1g cu3 ON split_part(per.tg, ' ', 3) = cu3.w
  CROSS JOIN nn
)
SELECT doc_id, CAST(sum(k) AS BIGINT) AS n_trigrams,
       round(sum(k * s) / sum(k), 6) AS surprisal
FROM sc GROUP BY doc_id
"""


@q(
    "backoff_trigram_score",
    _BACKOFF_ORACLE,
    "held-out stupid-backoff trigram LM scoring (Brants et al. 2007, the "
    "web-scale LM quality filter): train raw trigram/bigram/unigram counts "
    "on the even-doc_id half of the corpus, score each odd-doc_id doc by "
    "mean -ln S(w3|w1,w2) where S backs off c123/c12 -> 0.4*c23/c2 -> "
    "0.4*0.4*(c3+0.5)/(N+0.5) (add-half floor so OOV words score finitely). "
    "Held-out split makes backoff REAL — unlike self-scoring, unseen "
    "trigrams actually occur. Unlike bigram_surprisal's interpolation this "
    "is the sparse-count regime: the trigram/bigram type tables join the "
    "per-doc types by key (shuffle joins — at 100 TB they outgrow "
    "broadcast by design); unigram marginal + N broadcast. Per-doc trigram "
    "types materialize ONCE (localCheckpoint) and feed nothing else — the "
    "LM side derives from the train split only",
)
def q_backoff_trigram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.functions.text import tokens as sp_tokens

    docs = t(spark, sf_dir, "documents")
    tk = sp_tokens("text")
    n3 = F.greatest(F.size(tk) - 2, F.lit(0))
    tri = docs.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice(tk, 1, n3).alias("w1"),
                F.slice(tk, 2, n3).alias("w2"),
                F.slice(tk, 3, n3).alias("w3"),
            )
        ).alias("p"),
    ).select(
        "doc_id",
        F.col("p.w1").alias("w1"),
        F.col("p.w2").alias("w2"),
        F.col("p.w3").alias("w3"),
    )
    n2 = F.greatest(F.size(tk) - 1, F.lit(0))
    big = docs.filter(F.col("doc_id") % 2 == 0).select(
        F.explode(
            F.arrays_zip(F.slice(tk, 1, n2).alias("wa"), F.slice(tk, 2, n2).alias("wb"))
        ).alias("p")
    ).select(F.col("p.wa").alias("wa"), F.col("p.wb").alias("wb"))
    uni = docs.filter(F.col("doc_id") % 2 == 0).select(
        F.explode(tk).alias("w")
    )

    c3g = (
        tri.filter(F.col("doc_id") % 2 == 0)
        .groupBy("w1", "w2", "w3")
        .agg(F.count(F.lit(1)).cast("double").alias("c123"))
    )
    c2g = big.groupBy("wa", "wb").agg(F.count(F.lit(1)).cast("double").alias("c"))
    c1g = uni.groupBy("w").agg(F.count(F.lit(1)).cast("double").alias("c"))
    nn = uni.agg(F.count(F.lit(1)).cast("double").alias("n"))

    per = (
        tri.filter(F.col("doc_id") % 2 == 1)
        .groupBy("doc_id", "w1", "w2", "w3")
        .agg(F.count(F.lit(1)).alias("k"))
        .localCheckpoint()
    )
    c12 = c2g.select(F.col("wa").alias("w1"), F.col("wb").alias("w2"), F.col("c").alias("c12"))
    c23 = c2g.select(F.col("wa").alias("w2"), F.col("wb").alias("w3"), F.col("c").alias("c23"))
    cu2 = c1g.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    cu3 = c1g.select(F.col("w").alias("w3"), F.col("c").alias("c3"))
    joined = (
        per.join(c3g, ["w1", "w2", "w3"], "left")
        .join(c12, ["w1", "w2"], "left")
        .join(c23, ["w2", "w3"], "left")
        .join(F.broadcast(cu2), "w2", "left")
        .join(F.broadcast(cu3), "w3", "left")
        .crossJoin(F.broadcast(nn))
    )
    s = -F.log(
        F.when(F.coalesce(F.col("c123"), F.lit(0.0)) > 0.0, F.col("c123") / F.col("c12"))
        .when(
            F.coalesce(F.col("c23"), F.lit(0.0)) > 0.0,
            F.lit(0.4) * F.col("c23") / F.col("c2"),
        )
        .otherwise(
            F.lit(0.4) * F.lit(0.4) * (F.coalesce(F.col("c3"), F.lit(0.0)) + F.lit(0.5))
            / (F.col("n") + F.lit(0.5))
        )
    )
    return (
        joined.select("doc_id", "k", s.alias("s"))
        .groupBy("doc_id")
        .agg(
            F.sum("k").cast("long").alias("n_trigrams"),
            F.round(F.sum(F.col("k") * F.col("s")) / F.sum("k"), 6).alias("surprisal"),
        )
    )


# deterministic snapshot mutation shared by both engines: the "new" table
# is derived from orders, so the diff has a known ground truth without a
# second physical table. Deletes, reclassifications and inserts all hit.
_DIFF_DEL, _DIFF_CHG, _DIFF_ADD = 97, 11, 131
_DIFF_ADD_OFFSET = 10_000_000


@q(
    "snapshot_diff",
    f"""
WITH old AS (
  SELECT o_orderkey AS k, o_custkey, o_orderstatus,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         o_orderpriority AS prio
  FROM orders
),
new AS (
  SELECT k, o_custkey, o_orderstatus, cents,
         CASE WHEN k % {_DIFF_CHG} = 0 THEN '9-RECLASS' ELSE prio END AS prio
  FROM old WHERE k % {_DIFF_DEL} <> 0
  UNION ALL
  SELECT k + {_DIFF_ADD_OFFSET}, o_custkey, o_orderstatus, cents, prio
  FROM old WHERE k % {_DIFF_ADD} = 0
),
j AS (
  SELECT coalesce(o.k, n.k) AS k,
         CASE WHEN o.k IS NULL THEN 'added'
              WHEN n.k IS NULL THEN 'removed'
              WHEN o.o_custkey <> n.o_custkey
                   OR o.o_orderstatus <> n.o_orderstatus
                   OR o.cents <> n.cents OR o.prio <> n.prio THEN 'changed'
              ELSE 'unchanged' END AS change_class
  FROM old o FULL OUTER JOIN new n ON o.k = n.k
)
SELECT change_class, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(k) AS BIGINT) AS key_checksum
FROM j GROUP BY change_class
""",
    "CDC-style snapshot diff (the lakehouse table-maintenance primitive): "
    "full outer join of two snapshot versions on the key, rows classified "
    "added/removed/changed/unchanged by direct codegen column comparison "
    "on exact values (money as integer cents so no float formatting is "
    "compared). The 'new' snapshot is a deterministic mutation of orders "
    "(delete k%97, reclassify k%11, insert k%131 under an offset), giving "
    "the diff a known ground truth without a second table. Output pins "
    "per-class membership via a key checksum. Scale shape: ONE "
    "co-partitioned full outer join on the key — with both snapshots "
    "bucketed by key (sources/io.py) it runs shuffle-free. Column-compare "
    "measured 12x faster than a row-digest variant at sf0.1 (the rolling "
    "hash costs per-char per row); a WIDE table would pre-digest each row "
    "once at write time instead — never per-diff",
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    old = orders.select(
        F.col("o_orderkey").alias("k"),
        "o_custkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.col("o_orderpriority").alias("prio"),
    )
    new = old.filter(F.col("k") % _DIFF_DEL != 0).withColumn(
        "prio",
        F.when(F.col("k") % _DIFF_CHG == 0, F.lit("9-RECLASS")).otherwise(
            F.col("prio")
        ),
    ).unionAll(
        old.filter(F.col("k") % _DIFF_ADD == 0).withColumn(
            "k", F.col("k") + F.lit(_DIFF_ADD_OFFSET)
        )
    )

    nd = new.select(
        F.col("k").alias("nk"),
        F.col("o_custkey").alias("nc"),
        F.col("o_orderstatus").alias("ns"),
        F.col("cents").alias("ncents"),
        F.col("prio").alias("nprio"),
    )
    j = old.join(nd, old["k"] == F.col("nk"), "full_outer")
    changed = (
        (F.col("o_custkey") != F.col("nc"))
        | (F.col("o_orderstatus") != F.col("ns"))
        | (F.col("cents") != F.col("ncents"))
        | (F.col("prio") != F.col("nprio"))
    )
    cls = (
        F.when(F.col("k").isNull(), F.lit("added"))
        .when(F.col("nk").isNull(), F.lit("removed"))
        .when(changed, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.select(F.coalesce("k", "nk").alias("k"), cls.alias("change_class"))
        .groupBy("change_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("k").cast("long").alias("key_checksum"),
        )
    )


# learned BPE merge ranking as DATA (model-as-data, like _QC_WEIGHTS): the
# apply step is Sennrich et al. 2016's procedure — each merge applied
# globally, in rank order. Literals shared verbatim with the oracle.
_BPE_MERGES: tuple[tuple[str, str], ...] = (
    ("t", "h"), ("th", "e"), ("a", "n"), ("an", "d"),
    ("i", "n"), ("e", "r"), ("o", "n"), ("r", "e"),
)


def _duck_bpe_apply(var: str) -> str:
    s = f"trim(regexp_replace({var}, '(.)', '\\1 ', 'g'))"
    for a, b in _BPE_MERGES:
        s = f"replace({s}, '{a} {b}', '{a}{b}')"
    return s


@q(
    "bpe_apply",
    f"""
WITH toks AS (
  SELECT doc_id, unnest({duck_tokens('text')}) AS tok FROM documents
),
pieces AS (
  SELECT doc_id,
         CAST(len(string_split({_duck_bpe_apply('tok')}, ' ')) AS BIGINT) AS np
  FROM toks
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(np) AS BIGINT) AS n_pieces,
       round(CAST(sum(np) AS DOUBLE) / count(*), 6) AS pieces_per_token
FROM pieces GROUP BY doc_id
""",
    "BPE tokenizer APPLICATION (the deploy half of bpe_merge_step's "
    "training half): each word becomes its character sequence, then the "
    "learned merge table — a broadcast model-as-data literal list — is "
    "applied globally in rank order, exactly Sennrich et al. 2016's apply "
    "procedure (left-to-right non-overlapping replace per rank, identical "
    "on both engines). Per-doc piece counts and pieces-per-token "
    "(the fertility metric that decides if a tokenizer fits a corpus). "
    "Pure codegen string ops over one corpus scan — no shuffle except the "
    "final per-doc agg; merges travel in the plan, not in a join",
)
def q_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.functions.text import tokens as sp_tokens

    docs = t(spark, sf_dir, "documents")

    def apply_merges(tok: F.Column) -> F.Column:
        cur = F.trim(F.regexp_replace(tok, "(.)", "$1 "))
        for a, b in _BPE_MERGES:
            cur = F.replace(cur, F.lit(f"{a} {b}"), F.lit(f"{a}{b}"))
        return cur

    per_tok = docs.select(
        "doc_id", F.explode(sp_tokens("text")).alias("tok")
    ).select(
        "doc_id",
        F.size(F.split(apply_merges(F.col("tok")), " ")).cast("long").alias("np"),
    )
    return per_tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum("np").cast("long").alias("n_pieces"),
        F.round(
            F.sum("np").cast("double") / F.count(F.lit(1)), 6
        ).alias("pieces_per_token"),
    )


@q(
    "group_winsorize",
    f"""
WITH h AS (
  SELECT event_type, value,
         {duck_token_hash("CAST(event_id AS VARCHAR) || '#wins'")} AS hh
  FROM events
),
s AS (
  SELECT event_type, value FROM h
  QUALIFY row_number() OVER (PARTITION BY event_type
                             ORDER BY hh, value) <= 256
),
b AS (
  SELECT event_type,
         round(quantile_cont(value, 0.05), 6) AS lo,
         round(quantile_cont(value, 0.95), 6) AS hi
  FROM s GROUP BY event_type
)
SELECT e.event_type, CAST(count(*) AS BIGINT) AS n, b.lo, b.hi,
       round(avg(least(greatest(e.value, b.lo), b.hi)), 6) AS winsorized_mean,
       CAST(sum(CASE WHEN e.value < b.lo THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clipped_low,
       CAST(sum(CASE WHEN e.value > b.hi THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clipped_high
FROM events e JOIN b USING (event_type)
GROUP BY e.event_type, b.lo, b.hi
""",
    "per-group winsorized statistics (the robust-feature-engineering "
    "staple): p05/p95 clip bounds come from the replayable bottom-k-by-"
    "hash sample (same KMV machinery as value_percentiles_sampled_by_type "
    "— WindowGroupLimit caps every group's buffer, exact interpolated "
    "percentiles over 256 rows), then one clamp-and-aggregate pass over "
    "the full table with the KB-sized bounds broadcast. Unlike a true "
    "per-group percentile this never sorts the corpus: sample is rank-"
    "limited, clip pass is a broadcast join + codegen least/greatest",
)
def q_group_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.functions.text import token_hash

    ev = t(spark, sf_dir, "events")
    hashed = ev.select(
        "event_type", "value",
        token_hash(
            F.concat(F.col("event_id").cast("string"), F.lit("#wins"))
        ).alias("__h"),
    )
    w = Window.partitionBy("event_type").orderBy(F.asc("__h"), F.asc("value"))
    samp = hashed.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= 256
    )
    bounds = samp.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.05)"), 6).alias("lo"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("hi"),
    )
    cv = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    return (
        ev.join(F.broadcast(bounds), "event_type")
        .groupBy("event_type", "lo", "hi")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.avg(cv), 6).alias("winsorized_mean"),
            F.sum((F.col("value") < F.col("lo")).cast("long"))
            .cast("long").alias("n_clipped_low"),
            F.sum((F.col("value") > F.col("hi")).cast("long"))
            .cast("long").alias("n_clipped_high"),
        )
        .select(
            "event_type", "n", "lo", "hi",
            "winsorized_mean", "n_clipped_low", "n_clipped_high",
        )
    )


@q(
    "stratified_split",
    f"""
WITH s AS (
  SELECT doc_id, source,
         {duck_split_80_10_10("CAST(doc_id AS VARCHAR) || '#split'")} AS split
  FROM documents
)
SELECT source, split, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(doc_id) AS BIGINT) AS id_checksum
FROM s GROUP BY source, split
""",
    "deterministic stratified train/val/test split (80/10/10): every doc's "
    "split comes from the seeded engine-shared hash pushed through the "
    "same multiplicative scramble as hash_sample, so the assignment is "
    "reproducible across engines/runs/epochs and join-consistent with any "
    "other keyed artifact. Output pins per-(source, split) membership via "
    "an id checksum. Pure codegen map + one partial-agg groupBy — no "
    "shuffle of the corpus itself, ever",
)
def q_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.functions.text import token_hash

    docs = t(spark, sf_dir, "documents")
    hh = token_hash(F.concat(F.col("doc_id").cast("string"), F.lit("#split")))
    return (
        docs.withColumn("__sg_h", hh)
        .select("doc_id", "source", split_80_10_10("__sg_h").alias("split"))
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("doc_id").cast("long").alias("id_checksum"),
        )
    )


_RQ_E1, _RQ_E2 = 50, 37
#: RQ codebooks share the ANN sample id bound (see _ANN_ID_BOUND): each
#: level holds ≤ bound/every codes — constant like faiss's 2^nbits —
#: keeping the (corpus × codebook) encode scan linear in the corpus
#: (unbounded books measured 20x/10x at the sf1 proof)
_RQ_ID_BOUND = _ANN_ID_BOUND


def _dk_sqdist(a: str, b: str) -> str:
    return (
        f"coalesce(list_sum(list_transform(generate_series(1, least(len({a}), len({b}))), "
        f"i -> (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)) "
        f"* (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)))), 0.0)"
    )


#: Chained-CTE replay of ``pq.rq_encode`` (sampled 2-level residual
#: quantization, id-bounded constant codebooks), ending in ``a2``
#: (vec_id, c1_id, c2_id, d2) with ``a1`` (level-1 winner + its d2),
#: ``ev`` (double-cast corpus) and both codebooks in scope. Shared by
#: ``ann_rq_adc_topk`` today (and any future RQ-family oracle) so the
#: encode replay is pinned once.
_RQ_ENC_CTES = f"""
WITH b1 AS (
  SELECT vec_id AS c1_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS c1_vec
  FROM embeddings WHERE vec_id % {_RQ_E1} = 0 AND vec_id < {_RQ_ID_BOUND}
),
ev AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
a1 AS (
  SELECT e.vec_id, e.v, b.c1_id, b.c1_vec,
         round({_dk_sqdist('e.v', 'b.c1_vec')}, 6) AS d2
  FROM ev e CROSS JOIN b1 b
  QUALIFY row_number() OVER (PARTITION BY e.vec_id ORDER BY d2 ASC, b.c1_id ASC) = 1
),
resid AS (
  SELECT vec_id, c1_id,
         list_transform(generate_series(1, least(len(v), len(c1_vec))),
                        i -> v[i] - c1_vec[i]) AS r
  FROM a1
),
b2 AS (SELECT vec_id AS c2_id, r AS c2_vec FROM resid
       WHERE vec_id % {_RQ_E2} = 0 AND vec_id < {_RQ_ID_BOUND}),
a2 AS (
  SELECT resid.vec_id, resid.c1_id, b.c2_id,
         round({_dk_sqdist('resid.r', 'b.c2_vec')}, 6) AS d2
  FROM resid CROSS JOIN b2 b
  QUALIFY row_number() OVER (PARTITION BY resid.vec_id ORDER BY d2 ASC, b.c2_id ASC) = 1
)"""


@q(
    "ann_rq_adc_topk",
    f"""{_RQ_ENC_CTES},
qv AS (
  SELECT vec_id AS query_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qe
  FROM embeddings WHERE vec_id < 5
),
l1 AS (
  SELECT q.query_id, b.c1_id, round({_dk_dot('q.qe', 'b.c1_vec')}, 6) AS dot1
  FROM qv q CROSS JOIN b1 b
),
l2 AS (
  SELECT q.query_id, b.c2_id, round({_dk_dot('q.qe', 'b.c2_vec')}, 6) AS dot2
  FROM qv q CROSS JOIN b2 b
),
scored AS (
  SELECT l1.query_id, a2.vec_id, round(l1.dot1 + l2.dot2, 6) AS score
  FROM a2
  JOIN l1 ON a2.c1_id = l1.c1_id
  JOIN l2 ON a2.c2_id = l2.c2_id AND l2.query_id = l1.query_id
)
SELECT query_id, vec_id, score,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY score DESC, vec_id ASC) AS BIGINT) AS rank
FROM scored QUALIFY rank <= 10
""",
    "residual-quantization ADC search (2-level RQ, the faiss "
    "ResidualQuantizer shape; completes the quantized-search family next "
    "to PQ subspace codes): L1 codebook quantizes the vector, L2 codebook "
    "quantizes what L1 missed, score = dot(q, c1) + dot(q, c2) — two LUT "
    "lookups and one add per candidate, the scan never touches a full "
    "vector. Both codebooks are deterministic samples CAPPED to a fixed "
    "id bound (≤ bound/every codes per level — constant like faiss's "
    "2^nbits, so the corpus × codebook encode scan stays LINEAR in the "
    "corpus; SQL-mirrorable like sample_pq_codebooks): broadcast "
    "constants; encoding is two broadcast argmin scans, no shuffle; the "
    "searched codes table is TWO ints per vector. "
    "operators/pq.py::rq_encode / rq_adc_topk",
)
def q_ann_rq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators import pq

    emb = t(spark, sf_dir, "embeddings")
    codes, b1, b2 = pq.rq_encode(
        emb, "vec_id", "embedding", dim=EMB_DIM, every1=_RQ_E1, every2=_RQ_E2,
        id_bound=_RQ_ID_BOUND,
    )
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = pq.rq_adc_topk(queries, codes, b1, b2, k=10, dim=EMB_DIM)
    return out.select("query_id", "vec_id", "score", "rank")


@q(
    "skew_report",
    """
WITH g AS (
  SELECT o_custkey AS key, CAST(count(*) AS BIGINT) AS n
  FROM orders GROUP BY o_custkey
),
s AS (
  SELECT CAST(sum(n) AS BIGINT) AS total_rows,
         CAST(count(*) AS BIGINT) AS n_keys,
         CAST(max(n) AS BIGINT) AS max_group,
         round(quantile_cont(n, 0.5), 6) AS p50_group,
         round(quantile_cont(n, 0.99), 6) AS p99_group
  FROM g
)
SELECT g.key, g.n,
       CAST(row_number() OVER (ORDER BY g.n DESC, g.key ASC) AS BIGINT) AS rnk,
       round(CAST(g.n AS DOUBLE) / s.total_rows, 6) AS share,
       s.total_rows, s.n_keys, s.max_group, s.p50_group, s.p99_group
FROM g, s
QUALIFY rnk <= 5
""",
    "join-key skew diagnostic (the report that decides between a plain "
    "shuffle join, AQE skew splitting, and scale.salted_join): per-key "
    "group sizes -> top-5 heavy hitters with their share of the table, "
    "plus global distribution stats (p50/p99/max group size, key count) "
    "on every row. One keyed partial-agg scan; the percentile runs over "
    "the key-count table (keys, not rows); heavy keys come from a "
    "distributed TakeOrdered, stats ride a broadcast single-row join",
)
def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    g = orders.groupBy(F.col("o_custkey").alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    s = g.agg(
        F.sum("n").cast("long").alias("total_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.max("n").cast("long").alias("max_group"),
        F.round(F.expr("percentile(n, 0.5)"), 6).alias("p50_group"),
        F.round(F.expr("percentile(n, 0.99)"), 6).alias("p99_group"),
    )
    top = g.orderBy(F.desc("n"), F.asc("key")).limit(5)
    w = Window.orderBy(F.desc("n"), F.asc("key"))
    return (
        top.withColumn("rnk", F.row_number().over(w).cast("long"))
        .crossJoin(F.broadcast(s))
        .select(
            "key", "n", "rnk",
            F.round(F.col("n").cast("double") / F.col("total_rows"), 6).alias("share"),
            "total_rows", "n_keys", "max_group", "p50_group", "p99_group",
        )
    )


def _minhash_eval_oracle() -> str:
    sig_cols = ",\n    ".join(
        f"MIN((hs * {a} + {b}) % {HASH_MOD}) AS mh_{i}"
        for i, (a, b) in enumerate(D.MINHASH_COEFFS)
    )
    bands = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, {bnum} AS band_idx, concat_ws('_', "
        + ", ".join(f"mh_{bnum * 4 + r}" for r in range(4))
        + ") AS band_key FROM sig"
        for bnum in range(4)
    )
    n_h = len(D.MINHASH_COEFFS)
    est = " + ".join(
        f"(CASE WHEN sa.mh_{i} = sb.mh_{i} THEN 1 ELSE 0 END)" for i in range(n_h)
    )
    inter = "CAST(len(list_intersect(A.ss, B.ss)) AS DOUBLE)"
    return f"""
WITH sh AS (
  SELECT doc_id, unnest(list_distinct({_dk_shingles('text', 5)})) AS s
  FROM documents
),
h AS (SELECT doc_id, {duck_token_hash('s')} AS hs FROM sh),
sig AS (SELECT doc_id, {sig_cols} FROM h GROUP BY doc_id),
bands AS (
{bands}
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
shingle_sets AS (
  SELECT doc_id, list_distinct({_dk_shingles('text', 5)}) AS ss FROM documents
)
SELECT cand.id_a, cand.id_b,
       round(
         CASE WHEN (len(A.ss) = 0 AND len(B.ss) = 0) THEN 0.0 ELSE
           {inter} / (CAST(len(A.ss) AS DOUBLE) + CAST(len(B.ss) AS DOUBLE) - {inter})
         END, 6) AS jaccard,
       round(({est}) / {n_h}.0, 6) AS est,
       round(abs(round(({est}) / {n_h}.0, 6) -
         round(
           CASE WHEN (len(A.ss) = 0 AND len(B.ss) = 0) THEN 0.0 ELSE
             {inter} / (CAST(len(A.ss) AS DOUBLE) + CAST(len(B.ss) AS DOUBLE) - {inter})
           END, 6)), 6) AS abs_err
FROM cand
JOIN shingle_sets A ON cand.id_a = A.doc_id
JOIN shingle_sets B ON cand.id_b = B.doc_id
JOIN sig sa ON cand.id_a = sa.doc_id
JOIN sig sb ON cand.id_b = sb.doc_id
"""


@q(
    "minhash_estimate_eval",
    _minhash_eval_oracle(),
    "sketch-accuracy monitoring for the dedup pipeline: on every LSH "
    "candidate pair, the MinHash-estimated Jaccard (fraction of matching "
    "signature components — the unbiased estimator the banding math "
    "assumes) next to the EXACT shingle Jaccard and the absolute error. "
    "This is how a production pipeline validates its sketch parameters "
    "(k hashes, band shape) on its own corpus before trusting them at "
    "100 TB: error is inspected on the bounded candidate set only — no "
    "all-pairs work; signatures join by id (16 longs/doc), the exact "
    "verify is the same candidate-only pass minhash_lsh_neardup runs",
)
def q_minhash_estimate_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.fast_text import (
        minhash_signatures_fast,
        verify_candidates_fast,
    )

    docs = t(spark, sf_dir, "documents")
    sigs = minhash_signatures_fast(docs, "doc_id", "text", k_shingle=5)
    sigs = sigs.localCheckpoint()  # feeds banding AND the estimate join
    cand = D.lsh_candidate_pairs(sigs, "doc_id", bands=4, rows_per_band=4)
    exact = verify_candidates_fast(
        cand, docs, "doc_id", "text", k_shingle=5, threshold=0.0
    )
    n_h = len(D.MINHASH_COEFFS)
    sa = sigs.select(
        F.col("doc_id").alias("id_a"),
        *[F.col(f"mh_{i}").alias(f"__a{i}") for i in range(n_h)],
    )
    sb = sigs.select(
        F.col("doc_id").alias("id_b"),
        *[F.col(f"mh_{i}").alias(f"__b{i}") for i in range(n_h)],
    )
    match_terms = None
    for i in range(n_h):
        term = (F.col(f"__a{i}") == F.col(f"__b{i}")).cast("int")
        match_terms = term if match_terms is None else match_terms + term
    est = F.round(match_terms / F.lit(float(n_h)), 6)
    return (
        exact.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a", "id_b", "jaccard",
            est.alias("est"),
            F.round(F.abs(est - F.col("jaccard")), 6).alias("abs_err"),
        )
    )


@q(
    "scd2_history",
    """
WITH e AS (
  SELECT user_id, event_type, epoch_ns(ts) AS ts, event_id
  FROM events WHERE user_id % 10 = 0
),
r AS (
  SELECT user_id, event_type, ts,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM e
),
runs AS (
  SELECT user_id, event_type, ts, rn,
         CAST(sum(CASE WHEN prev IS NULL OR prev <> event_type THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY rn) AS BIGINT) AS version
  FROM r
),
v AS (
  SELECT user_id, version, min(event_type) AS state,
         CAST(min(ts) AS BIGINT) AS valid_from,
         CAST(count(*) AS BIGINT) AS n_events
  FROM runs GROUP BY user_id, version
)
SELECT user_id, version, state, valid_from,
       coalesce(lead(valid_from) OVER (PARTITION BY user_id ORDER BY version),
                CAST(-1 AS BIGINT)) AS valid_to,
       CAST(CASE WHEN lead(valid_from)
                      OVER (PARTITION BY user_id ORDER BY version) IS NULL
                 THEN 1 ELSE 0 END AS BIGINT) AS is_current,
       n_events
FROM v
""",
    "SCD type-2 dimension build from an event stream (the warehouse "
    "pattern behind every `dim_*_history` table): per user, consecutive "
    "runs of the same state collapse into one version row with "
    "valid_from/valid_to nanos (valid_to = next version's start, -1 "
    "sentinel = current — an open NULL would go float64 in the driver's "
    "pandas canon), version number, is_current flag and the run's event "
    "count. All three windows and the run groupBy share ONE partitioning "
    "(user_id), so the whole build is a single shuffle; per-user history "
    "fits a partition because versions are change-compressed, not "
    "per-event. Deterministic under ts ties via the event_id tiebreak",
)
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        t(spark, sf_dir, "events")
        .filter(F.col("user_id") % 10 == 0)
        .select("user_id", "event_type", "ts", "event_id")
    )
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    r = ev.withColumn("rn", F.row_number().over(wo)).withColumn(
        "prev", F.lag("event_type").over(wo)
    )
    wv = Window.partitionBy("user_id").orderBy("rn")
    runs = r.withColumn(
        "version",
        F.sum(
            F.when(
                F.col("prev").isNull() | (F.col("prev") != F.col("event_type")), 1
            ).otherwise(0)
        )
        .over(wv)
        .cast("long"),
    )
    v = runs.groupBy("user_id", "version").agg(
        F.min("event_type").alias("state"),
        F.min("ts").cast("long").alias("valid_from"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    ws = Window.partitionBy("user_id").orderBy("version")
    nxt = F.lead("valid_from").over(ws)
    return v.select(
        "user_id",
        "version",
        "state",
        "valid_from",
        F.coalesce(nxt, F.lit(-1).cast("long")).alias("valid_to"),
        F.when(nxt.isNull(), 1).otherwise(0).cast("long").alias("is_current"),
        "n_events",
    )


_FUZZY_DELETE_KEYS = (
    "list_distinct(list_transform(generate_series(0, length({t})), "
    "i -> CASE WHEN i = 0 THEN {t} "
    "ELSE substr({t}, 1, i - 1) || substr({t}, i + 1) END))"
)


@q(
    "fuzzy_vocab_join",
    f"""
WITH tk AS (
  SELECT unnest({duck_tokens('p_name')}) AS tok FROM part
),
v AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS cnt
  FROM tk WHERE length(tok) >= 3 GROUP BY tok
),
keys AS (
  SELECT tok, unnest({_FUZZY_DELETE_KEYS.format(t='tok')}) AS k FROM v
),
cand AS (
  SELECT DISTINCT a.tok AS tok_a, b.tok AS tok_b
  FROM keys a JOIN keys b ON a.k = b.k AND a.tok < b.tok
)
SELECT tok_a, tok_b, va.cnt AS cnt_a, vb.cnt AS cnt_b
FROM cand
JOIN v va ON cand.tok_a = va.tok
JOIN v vb ON cand.tok_b = vb.tok
WHERE levenshtein(tok_a, tok_b) = 1
""",
    "fuzzy vocabulary self-join via the SymSpell deletion neighborhood "
    "(Garbe's symmetric-delete algorithm): every vocab token emits itself "
    "plus its length single-character deletions as join keys; two tokens "
    "at edit distance 1 PROVABLY share a key (substitution -> both delete "
    "the differing position; insert/delete -> the longer's deletion equals "
    "the shorter), so candidates come from a plain EQUI-join on an 8-byte-"
    "ish key — never the O(V^2) blocked cross-join — and the exact "
    "levenshtein verify runs on candidates only. This is the typo/variant "
    "normalization step of a corpus vocab pipeline; at 100 TB the vocab "
    "is Heaps-law sublinear in the corpus, keys fan out x(len+1), and "
    "both the key join and the count joins stay key-partitioned",
)
def q_fuzzy_vocab_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.functions.text import tokens as sp_tokens

    part = t(spark, sf_dir, "part")
    v = (
        part.select(F.explode(sp_tokens("p_name")).alias("tok"))
        .filter(F.length("tok") >= 3)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    del_keys = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.length("tok")),
            lambda i: F.when(i == 0, F.col("tok")).otherwise(
                F.concat(
                    F.substring(F.col("tok"), F.lit(1), i - 1),
                    F.substring(F.col("tok"), i + 1, F.length("tok")),
                )
            ),
        )
    )
    keys = v.select("tok", F.explode(del_keys).alias("k"))
    a = keys.select(F.col("tok").alias("tok_a"), "k")
    b = keys.select(F.col("tok").alias("tok_b"), "k")
    cand = (
        a.join(b, "k")
        .filter(F.col("tok_a") < F.col("tok_b"))
        .select("tok_a", "tok_b")
        .distinct()
        .filter(F.levenshtein("tok_a", "tok_b") == 1)
    )
    va = v.select(F.col("tok").alias("tok_a"), F.col("cnt").alias("cnt_a"))
    vb = v.select(F.col("tok").alias("tok_b"), F.col("cnt").alias("cnt_b"))
    return cand.join(va, "tok_a").join(vb, "tok_b").select(
        "tok_a", "tok_b", "cnt_a", "cnt_b"
    )


@q(
    "events_anomaly_days",
    """
WITH d AS (
  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
w AS (
  SELECT event_type, day, n,
         CAST(sum(n) OVER tw AS BIGINT) AS s1,
         CAST(sum(n * n) OVER tw AS BIGINT) AS s2,
         CAST(count(*) OVER tw AS BIGINT) AS c
  FROM d
  WINDOW tw AS (PARTITION BY event_type ORDER BY day
                ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, day, n,
       round(s1 / 7.0, 6) AS baseline_avg,
       round(sqrt(greatest((s2 - s1 * s1 / 7.0) / 6.0, 0.0)), 6) AS baseline_std,
       round(CASE WHEN sqrt(greatest((s2 - s1 * s1 / 7.0) / 6.0, 0.0)) = 0.0
                  THEN 0.0
                  ELSE (n - s1 / 7.0)
                       / sqrt(greatest((s2 - s1 * s1 / 7.0) / 6.0, 0.0)) END,
             6) AS zscore,
       CAST(CASE WHEN abs(round(CASE
                  WHEN sqrt(greatest((s2 - s1 * s1 / 7.0) / 6.0, 0.0)) = 0.0
                  THEN 0.0
                  ELSE (n - s1 / 7.0)
                       / sqrt(greatest((s2 - s1 * s1 / 7.0) / 6.0, 0.0)) END,
             6)) > 2.0 THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
FROM w WHERE c = 7
""",
    "time-series anomaly detection on ingest volume (the data-quality "
    "monitor a 100 TB pipeline runs before trusting a day's partition): "
    "per event-type daily counts, a trailing 7-day baseline (current day "
    "EXCLUDED, only complete baselines emit), and a z-score flagging "
    "|z| > 2 days. The baseline is computed from exact integer window "
    "sums (sum n, sum n^2 — Welford-free) so both engines derive "
    "bit-identical doubles from identical int64 inputs; the window runs "
    "over the DAYS table (types x days rows, partial-agg'd map-side from "
    "the raw events), so the sort inside the window is trivially small "
    "no matter the corpus size",
)
def q_events_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    d = (
        ev.select("event_type", F.expr("ts div 86400000000000").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    tw = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-7, -1)
    )
    w = (
        d.withColumn("s1", F.sum("n").over(tw).cast("long"))
        .withColumn("s2", F.sum(F.col("n") * F.col("n")).over(tw).cast("long"))
        .withColumn("c", F.count(F.lit(1)).over(tw).cast("long"))
        .filter(F.col("c") == 7)
    )
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.lit(7.0)) / F.lit(6.0)
    std = F.sqrt(F.greatest(var, F.lit(0.0)))
    z = F.when(std == 0.0, F.lit(0.0)).otherwise(
        (F.col("n") - F.col("s1") / F.lit(7.0)) / std
    )
    zr = F.round(z, 6)
    return w.select(
        "event_type",
        "day",
        "n",
        F.round(F.col("s1") / F.lit(7.0), 6).alias("baseline_avg"),
        F.round(std, 6).alias("baseline_std"),
        zr.alias("zscore"),
        F.when(F.abs(zr) > 2.0, 1).otherwise(0).cast("long").alias("is_anomaly"),
    )


@q(
    "chi2_token_select",
    f"""
WITH tk AS (
  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
         unnest(list_distinct({duck_tokens('text')})) AS tok
  FROM documents
),
j AS (
  SELECT tok, CAST(sum(pos) AS BIGINT) AS a,
         CAST(sum(1 - pos) AS BIGINT) AS b
  FROM tk GROUP BY tok
),
tot AS (
  SELECT CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS np,
         CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT) AS nn
  FROM documents
),
scored AS (
  SELECT tok, a, b,
         round(CASE WHEN np + nn - a - b = 0 THEN 0.0 ELSE
           (CAST(np + nn AS DOUBLE)
            * CAST(a * (nn - b) - b * (np - a) AS DOUBLE)
            * CAST(a * (nn - b) - b * (np - a) AS DOUBLE))
           / (CAST(a + b AS DOUBLE) * CAST(np + nn - a - b AS DOUBLE)
              * CAST(np AS DOUBLE) * CAST(nn AS DOUBLE))
         END, 6) AS chi2
  FROM j, tot
)
SELECT tok, a, b, chi2,
       CAST(row_number() OVER (ORDER BY chi2 DESC, tok ASC) AS BIGINT) AS rnk
FROM scored
QUALIFY rnk <= 50
""",
    "chi-squared feature selection for the quality/language classifier "
    "(the 2x2-contingency test every bag-of-words spam/domain filter "
    "starts from): per token, document frequency inside vs outside the "
    "lang='en' class, chi2 = N(ad-bc)^2/((a+b)(c+d)(a+c)(b+d)), top-50 "
    "tokens by score. The label travels ON the token row (lang and text "
    "come from the same record — no corpus-sized join), the contingency "
    "cells are one partial-agg'd groupBy over distinct (doc, token) "
    "pairs, class totals ride a broadcast single-row crossJoin, and the "
    "final ranking is a distributed TakeOrdered over the vocab with the "
    "row_number window touching only the 50 survivors",
)
def q_chi2_token_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.functions.text import tokens as sp_tokens

    docs = t(spark, sf_dir, "documents")
    pos = F.when(F.col("lang") == "en", 1).otherwise(0)
    tk = docs.select(
        pos.alias("pos"), F.explode(F.array_distinct(sp_tokens("text"))).alias("tok")
    )
    j = tk.groupBy("tok").agg(
        F.sum("pos").cast("long").alias("a"),
        F.sum(F.lit(1) - F.col("pos")).cast("long").alias("b"),
    )
    tot = docs.agg(
        F.sum(pos).cast("long").alias("np"),
        F.sum(F.lit(1) - pos).cast("long").alias("nn"),
    )
    num = (
        F.col("a") * (F.col("nn") - F.col("b"))
        - F.col("b") * (F.col("np") - F.col("a"))
    ).cast("double")
    cd = F.col("np") + F.col("nn") - F.col("a") - F.col("b")
    chi2 = F.when(cd == 0, F.lit(0.0)).otherwise(
        ((F.col("np") + F.col("nn")).cast("double") * num * num)
        / (
            (F.col("a") + F.col("b")).cast("double")
            * cd.cast("double")
            * F.col("np").cast("double")
            * F.col("nn").cast("double")
        )
    )
    scored = j.crossJoin(F.broadcast(tot)).select(
        "tok", "a", "b", F.round(chi2, 6).alias("chi2")
    )
    top = scored.orderBy(F.desc("chi2"), F.asc("tok")).limit(50)
    wr = Window.orderBy(F.desc("chi2"), F.asc("tok"))
    return top.withColumn("rnk", F.row_number().over(wr).cast("long"))


# shared edge-list CTEs for the graph-analytics family: distinct undirected
# co-purchase pairs of parts appearing in the same order (mirror of
# operators/graph.py::copurchase_edges), plus symmetric form and degrees
_GRAPH_EDGE_CTES = """li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS i FROM lineitem),
edges AS (SELECT DISTINCT a.i AS a, b.i AS b
          FROM li a JOIN li b ON a.o = b.o AND a.i < b.i),
sym AS (SELECT a AS src, b AS dst FROM edges
        UNION ALL SELECT b AS src, a AS dst FROM edges),
deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS outdeg
        FROM sym GROUP BY src)"""


def _pagerank_oracle(iters: int, scale: int, damping_pct: int) -> str:
    """Unrolled fixed-point PageRank: one CTE per iteration, every step
    integer multiply + floor division (DuckDB `//` == Spark `div` on
    positives) — bit-identical to operators/graph.py::pagerank_fixedpoint
    with NO float rounding policy at all."""
    d, r = damping_pct, 100 - damping_pct
    parts = [
        "nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM deg)",
        f"""r0 AS (SELECT node, outdeg, CAST({scale} // nn.n AS BIGINT) AS rank_units
      FROM deg CROSS JOIN nn)""",
    ]
    for k in range(1, iters + 1):
        parts.append(f"""r{k} AS (
  SELECT d.node, d.outdeg,
         CAST(({r} * {scale}) // (100 * nn.n) AS BIGINT)
         + CAST(sum(({d} * r.rank_units) // (100 * r.outdeg)) AS BIGINT) AS rank_units
  FROM deg d JOIN sym s ON s.dst = d.node
  JOIN r{k - 1} r ON s.src = r.node CROSS JOIN nn
  GROUP BY d.node, d.outdeg, nn.n)""")
    return (
        "WITH " + _GRAPH_EDGE_CTES + ",\n" + ",\n".join(parts)
        + f"\nSELECT node, rank_units FROM r{iters}"
    )


@q(
    "graph_pagerank",
    None,  # filled below — needs graph.PR_SCALE without a circular import
    "PageRank centrality over the part co-purchase graph (items appearing "
    "in the same order), 5 iterations, damping 0.85 — INTEGER FIXED-POINT: "
    "ranks are int64 mass units (1e12 total) and every step is integer "
    "multiply + floor division, so the result is bit-identical across "
    "engines/runs with no float rounding policy (per-node in-edge float "
    "sums are order-dependent and iterations amplify the drift — the same "
    "reason production graph engines fix-point incremental PageRank). "
    "Plan: rank⋈edge join + map-side-combined integer sum per iteration, "
    "lineage checkpoint-truncated every 2 rounds, node count as the one "
    "plan-time scalar; this is the join-based Pregel shape that survives "
    "a 100 TB edge list (persist sym bucketed by src and only ranks move)",
)
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators import graph as G

    edges = G.copurchase_edges(t(spark, sf_dir, "lineitem"))
    return G.pagerank_fixedpoint(edges, iters=5).select("node", "rank_units")


def _fill_graph_pagerank_oracle() -> None:
    from fastembed_rs_spark.operators.graph import PR_SCALE

    QUERIES["graph_pagerank"] = QuerySpec(
        spark=QUERIES["graph_pagerank"].spark,
        oracle=_pagerank_oracle(iters=5, scale=PR_SCALE, damping_pct=85),
        description=QUERIES["graph_pagerank"].description,
    )


_fill_graph_pagerank_oracle()


_GRAPH_EDGE2_CTES = """li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS i FROM lineitem),
edges AS (SELECT a.i AS a, b.i AS b
          FROM li a JOIN li b ON a.o = b.o AND a.i < b.i
          GROUP BY a.i, b.i HAVING count(*) >= 2),
sym AS (SELECT a AS src, b AS dst FROM edges
        UNION ALL SELECT b AS src, a AS dst FROM edges),
deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS outdeg
        FROM sym GROUP BY src)"""


@q(
    "graph_triangles",
    f"""
WITH {_GRAPH_EDGE2_CTES},
o AS (
  SELECT CASE WHEN da.outdeg < db.outdeg
                OR (da.outdeg = db.outdeg AND e.a < e.b)
              THEN e.a ELSE e.b END AS src,
         CASE WHEN da.outdeg < db.outdeg
                OR (da.outdeg = db.outdeg AND e.a < e.b)
              THEN e.b ELSE e.a END AS dst,
         CASE WHEN da.outdeg < db.outdeg
                OR (da.outdeg = db.outdeg AND e.a < e.b)
              THEN db.outdeg ELSE da.outdeg END AS dd
  FROM edges e JOIN deg da ON e.a = da.node JOIN deg db ON e.b = db.node
),
wedges AS (
  SELECT e1.src AS u, e1.dst AS v, e2.dst AS w
  FROM o e1 JOIN o e2 ON e1.src = e2.src
  WHERE e1.dd < e2.dd OR (e1.dd = e2.dd AND e1.dst < e2.dst)
),
tri AS (
  SELECT wedges.u AS x, wedges.v AS y, wedges.w AS z
  FROM wedges JOIN o ON o.src = wedges.v AND o.dst = wedges.w
),
corners AS (
  SELECT x AS node FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri
)
SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
FROM corners GROUP BY node
""",
    "per-node triangle counts over the SUPPORTED part co-purchase graph "
    "(pairs co-occurring in >= 2 orders — the standard noise cut: a single "
    "chance co-occurrence carries no signal, and without it a uniformly "
    "random basket corpus densifies toward a complete graph as it grows, "
    "which no triangle algorithm survives) — the local "
    "clustering signal that separates genuine near-dup/co-occurrence "
    "cliques from chance pair collisions. Degree-ordered enumeration: "
    "edges oriented low→high by (degree, id) so every node's oriented "
    "out-degree is O(sqrt(E)) and the wedge self-join never explodes on a "
    "hub (celebrity item with 1e6 co-purchases builds wedges only through "
    "its low-degree neighbors); each triangle has exactly one minimal "
    "apex, so it is counted once with no dedup pass. Two equi-joins total",
)
def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators import graph as G

    edges = G.copurchase_edges(t(spark, sf_dir, "lineitem"), min_support=2)
    return G.triangle_counts(edges).select("node", "n_triangles")


@q(
    "pareto_front",
    """
WITH vol AS (
  SELECT l_partkey, CAST(sum(l_quantity) AS BIGINT) AS volume
  FROM lineitem GROUP BY l_partkey
),
pts AS (
  SELECT p.p_partkey,
         CAST(round(p.p_retailprice * 100) AS BIGINT) AS price_cents,
         v.volume
  FROM part p JOIN vol v ON p.p_partkey = v.l_partkey
),
sky AS (
  SELECT p_partkey, price_cents, volume,
         max(volume) OVER (ORDER BY price_cents
             RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mx_lt,
         max(volume) OVER (PARTITION BY price_cents) AS mx_eq
  FROM pts
)
SELECT p_partkey, price_cents, volume
FROM sky
WHERE (mx_lt IS NULL OR volume > mx_lt) AND volume = mx_eq
""",
    "2-D skyline (Pareto front) of parts: cheapest-for-the-volume — rows "
    "no other part dominates on (retail price ↓, units sold ↑). The "
    "sort-sweep formulation (gain vs running max over strictly-cheaper "
    "rows, two window maxes) is O(n log n), never the O(n²) NOT-EXISTS "
    "self-join; the Spark side runs an exact hash-bucketed LOCAL skyline "
    "first (dominance in a subset implies global dominance, transitivity "
    "keeps a dominator among survivors) so the single-partition global "
    "sweep touches only near-skyline candidates. Integer cents/units "
    "comparisons — no float ordering anywhere",
)
def q_pareto_front(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.scale import pareto_front_2d

    li = t(spark, sf_dir, "lineitem")
    vol = li.groupBy("l_partkey").agg(
        F.sum("l_quantity").cast("long").alias("volume")
    )
    pts = (
        t(spark, sf_dir, "part")
        .join(vol, F.col("p_partkey") == F.col("l_partkey"))
        .select(
            "p_partkey",
            F.round(F.col("p_retailprice") * 100).cast("long").alias("price_cents"),
            "volume",
        )
    )
    return pareto_front_2d(pts, "price_cents", "volume").select(
        "p_partkey", "price_cents", "volume"
    )


#: the ONE k=8/iters=3 training replay every trained-centroid oracle
#: shares (cluster_medoids, margin_mining, and the ann_recall/bucket-
#: drift builders call _ivf_train_ctes with the same args) — a single
#: constant makes 'these oracles replay the SAME training' explicit
_TRAIN8_CTES, _TRAIN8_CENT = _ivf_train_ctes(k=8, iters=3)

@q(
    "cluster_medoids",
    f"""{_TRAIN8_CTES},
assign AS (
  SELECT p.vec_id, CAST(c.centroid_id AS BIGINT) AS centroid_id,
         round({_dk_cos('p.v', 'c.cv')}, 6) AS cscore
  FROM pts p CROSS JOIN {_TRAIN8_CENT} c
  QUALIFY row_number() OVER (PARTITION BY p.vec_id
                             ORDER BY cscore DESC, c.centroid_id ASC) = 1
)
SELECT centroid_id, vec_id AS medoid_id, cscore AS medoid_score,
       CAST(count(*) OVER (PARTITION BY centroid_id) AS BIGINT) AS cluster_size
FROM assign
QUALIFY row_number() OVER (PARTITION BY centroid_id
                           ORDER BY cscore DESC, vec_id ASC) = 1
""",
    "cluster prototype selection: per trained-IVF bucket (k=8 Lloyd's "
    "centroids via operators.topk.train_ivf_centroids — constant-size "
    "driver state; the oracle replays training as chained CTEs exactly "
    "like ann_ivf_trained) the member closest to the centroid + bucket "
    "size — the curation primitive behind prototype-per-cluster corpus "
    "summaries and SemDeDup representative picking. Both argmaxes are "
    "max(struct(score, -id, ...)) hash aggregations with map-side partial "
    "combine (nothing is sorted, the shuffle carries one pre-reduced row "
    "per key per map partition); centroid scoring reuses the NumPy tile "
    "kernel, scores rounded to 6 BEFORE the argmax so tie semantics match "
    "the oracle windows exactly",
)
def q_cluster_medoids(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.fast_vector import pairwise_cosine_fast
    from fastembed_rs_spark.operators.topk import train_ivf_centroids

    emb = t(spark, sf_dir, "embeddings")
    # k trained centroids collected to the driver: CONSTANT size by
    # construction (k=8), unlike the former 1-in-50 modulo sample whose
    # driver footprint grew linearly with the corpus
    targets = [
        (r[0], list(r[1]))
        for r in train_ivf_centroids(emb, k=8, iters=3).collect()
    ]
    scored = pairwise_cosine_fast(
        emb, "vec_id", "embedding", targets,
        target_id_name="centroid_id", score_name="__raw",
    ).select("vec_id", "centroid_id", F.round("__raw", 6).alias("cscore"))
    assign = (
        scored.groupBy("vec_id")
        .agg(
            F.max(
                F.struct(
                    F.col("cscore").alias("cscore"),
                    (-F.col("centroid_id")).alias("__nc"),
                    F.col("centroid_id").alias("centroid_id"),
                )
            ).alias("__b")
        )
        .select(
            "vec_id",
            F.col("__b.cscore").alias("cscore"),
            F.col("__b.centroid_id").alias("centroid_id"),
        )
    )
    return (
        assign.groupBy("centroid_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cluster_size"),
            F.max(
                F.struct(
                    F.col("cscore").alias("cscore"),
                    (-F.col("vec_id")).alias("__nv"),
                    F.col("vec_id").alias("vec_id"),
                )
            ).alias("__b"),
        )
        .select(
            "centroid_id",
            F.col("__b.vec_id").alias("medoid_id"),
            F.col("__b.cscore").alias("medoid_score"),
            "cluster_size",
        )
    )


#: integer text features whose pairwise correlations feature_correlations
#: reports — names must match text_stat_counts_fast output columns
_CORR_FEATS = ("n_chars", "n_tokens", "tok_chars", "sw_any", "n_punct")


def _corr_oracle() -> str:
    feats = _CORR_FEATS
    moments = ["CAST(count(*) AS BIGINT) AS n"]
    for a in feats:
        moments.append(f"CAST(sum({a}) AS BIGINT) AS s_{a}")
        moments.append(f"CAST(sum({a} * {a}) AS BIGINT) AS ss_{a}")
    pair_rows = []
    for i, a in enumerate(feats):
        for b in feats[i + 1:]:
            moments.append(f"CAST(sum({a} * {b}) AS BIGINT) AS sp_{a}__{b}")
            num = (
                f"(CAST(n AS DOUBLE) * CAST(sp_{a}__{b} AS DOUBLE)"
                f" - CAST(s_{a} AS DOUBLE) * CAST(s_{b} AS DOUBLE))"
            )
            den = (
                f"((CAST(n AS DOUBLE) * CAST(ss_{a} AS DOUBLE)"
                f" - CAST(s_{a} AS DOUBLE) * CAST(s_{a} AS DOUBLE))"
                f" * (CAST(n AS DOUBLE) * CAST(ss_{b} AS DOUBLE)"
                f" - CAST(s_{b} AS DOUBLE) * CAST(s_{b} AS DOUBLE)))"
            )
            pair_rows.append(
                f"SELECT '{a}' AS feature_a, '{b}' AS feature_b, "
                f"round(CASE WHEN {den} <= 0.0 THEN 0.0 "
                f"ELSE {num} / sqrt({den}) END, 6) AS pearson_r FROM mom"
            )
    return f"""
WITH f AS (
  SELECT CAST(length(text) AS BIGINT) AS n_chars,
         CAST(len({duck_tokens('text')}) AS BIGINT) AS n_tokens,
         CAST(coalesce(list_sum(list_transform({duck_tokens('text')}, tk -> length(tk))), 0) AS BIGINT) AS tok_chars,
         CAST(len(list_filter({duck_tokens('text')}, tk -> list_contains([{_ALL_SW}], tk))) AS BIGINT) AS sw_any,
         CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS BIGINT) AS n_punct
  FROM documents
),
mom AS (SELECT {', '.join(moments)} FROM f)
{' UNION ALL '.join(pair_rows)}
"""


@q(
    "feature_correlations",
    _corr_oracle(),
    "Pearson correlation matrix of the per-document integer text features "
    "(chars, tokens, token chars, stopword hits, punct count) — the "
    "redundancy screen run before feeding quality features to a "
    "classifier. One kernel scan + ONE single-row aggregate of exact "
    "int64 moments (n, Σx, Σx², Σxy — map-side combined, no shuffle "
    "beyond 1 row), then each r = (nΣxy-ΣxΣy)/√((nΣx²-(Σx)²)(nΣy²-(Σy)²)) "
    "from exactly-converted integer moments: every float op is on "
    "identical inputs with IEEE-determined results, so the matrix is "
    "bit-identical across engines before the cosmetic round(6). Int64 "
    "moments are exact to ~2e5 docs at these feature scales; past that "
    "switch the Σ columns to decimal(38,0) (one-line change, noted here "
    "rather than paid everywhere)",
)
def q_feature_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.fast_text import text_stat_counts_fast

    feats = _CORR_FEATS
    counts = text_stat_counts_fast(
        t(spark, sf_dir, "documents"), "doc_id", "text"
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for a in feats:
        aggs.append(F.sum(a).cast("long").alias(f"s_{a}"))
        aggs.append(F.sum(F.col(a) * F.col(a)).cast("long").alias(f"ss_{a}"))
    for i, a in enumerate(feats):
        for b in feats[i + 1:]:
            aggs.append(
                F.sum(F.col(a) * F.col(b)).cast("long").alias(f"sp_{a}__{b}")
            )
    mom = counts.agg(*aggs)

    def dbl(c: str):
        return F.col(c).cast("double")

    structs = []
    for i, a in enumerate(feats):
        for b in feats[i + 1:]:
            num = dbl("n") * dbl(f"sp_{a}__{b}") - dbl(f"s_{a}") * dbl(f"s_{b}")
            den = (dbl("n") * dbl(f"ss_{a}") - dbl(f"s_{a}") * dbl(f"s_{a}")) * (
                dbl("n") * dbl(f"ss_{b}") - dbl(f"s_{b}") * dbl(f"s_{b}")
            )
            r = F.when(den <= 0.0, F.lit(0.0)).otherwise(num / F.sqrt(den))
            structs.append(
                F.struct(
                    F.lit(a).alias("feature_a"),
                    F.lit(b).alias("feature_b"),
                    F.round(r, 6).alias("pearson_r"),
                )
            )
    return mom.select(F.explode(F.array(*structs)).alias("__p")).select(
        "__p.feature_a", "__p.feature_b", "__p.pearson_r"
    )


@q(
    "association_rules",
    """
WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS i FROM lineitem),
nn AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS n_orders FROM li),
itm AS (SELECT i, CAST(count(*) AS BIGINT) AS cnt FROM li GROUP BY i),
pr AS (
  SELECT a.i AS item_a, b.i AS item_b, CAST(count(*) AS BIGINT) AS pair_cnt
  FROM li a JOIN li b ON a.o = b.o AND a.i < b.i
  GROUP BY a.i, b.i
  HAVING count(*) >= 2
)
SELECT item_a, item_b, pair_cnt,
       round(CAST(pair_cnt AS DOUBLE) / CAST(nn.n_orders AS DOUBLE), 6) AS support,
       round(CAST(pair_cnt AS DOUBLE) / CAST(ia.cnt AS DOUBLE), 6) AS conf_a_to_b,
       round(CAST(pair_cnt AS DOUBLE) / CAST(ib.cnt AS DOUBLE), 6) AS conf_b_to_a,
       round((CAST(pair_cnt AS DOUBLE) * CAST(nn.n_orders AS DOUBLE))
             / (CAST(ia.cnt AS DOUBLE) * CAST(ib.cnt AS DOUBLE)), 6) AS lift
FROM pr
JOIN itm ia ON pr.item_a = ia.i
JOIN itm ib ON pr.item_b = ib.i
CROSS JOIN nn
""",
    "market-basket association rules over part pairs co-occurring in ≥2 "
    "orders: support, directional confidence, lift — the A-priori-style "
    "2-itemset pass behind every 'frequently bought together' feature. "
    "Pair counts come from the basket self-join (fan-out bounded by "
    "items-per-order, the copurchase_edges scale argument); item counts "
    "and the basket total ride broadcast joins onto the pair table; every "
    "ratio is ONE float division (or one product then one division, same "
    "tree both engines) of exactly-converted integer counts, so scores "
    "are bit-identical cross-engine before round(6). min-support (≥2) is "
    "pushed into the pair aggregation HAVING, the step that makes "
    "A-priori feasible at scale — the long tail of singleton pairs never "
    "leaves the partial aggregate",
)
def q_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        t(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("i"))
        .distinct()
    )
    n_orders = li.agg(
        F.countDistinct("o").cast("long").alias("n_orders")
    )
    itm = li.groupBy("i").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    a = li.select("o", F.col("i").alias("item_a"))
    b = li.select("o", F.col("i").alias("item_b"))
    pr = (
        a.join(b, "o")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("long").alias("pair_cnt"))
        .filter(F.col("pair_cnt") >= 2)
    )
    ia = itm.select(F.col("i").alias("item_a"), F.col("cnt").alias("__ca"))
    ib = itm.select(F.col("i").alias("item_b"), F.col("cnt").alias("__cb"))
    j = (
        pr.join(F.broadcast(ia), "item_a")
        .join(F.broadcast(ib), "item_b")
        .crossJoin(F.broadcast(n_orders))
    )
    pc, ca, cb, no = (
        F.col("pair_cnt").cast("double"),
        F.col("__ca").cast("double"),
        F.col("__cb").cast("double"),
        F.col("n_orders").cast("double"),
    )
    return j.select(
        "item_a",
        "item_b",
        "pair_cnt",
        F.round(pc / no, 6).alias("support"),
        F.round(pc / ca, 6).alias("conf_a_to_b"),
        F.round(pc / cb, 6).alias("conf_b_to_a"),
        F.round((pc * no) / (ca * cb), 6).alias("lift"),
    )


def _lp_round_sql(k: int) -> str:
    return f"""v{k} AS (
  SELECT s.dst AS node, l.label, CAST(count(*) AS BIGINT) AS cnt
  FROM sym s JOIN l{k - 1} l ON s.src = l.node
  WHERE s.dst NOT IN (SELECT node FROM l{k - 1})
  GROUP BY s.dst, l.label
),
n{k} AS (
  SELECT node, label, CAST({k} AS BIGINT) AS round_labeled FROM v{k}
  QUALIFY row_number() OVER (PARTITION BY node ORDER BY cnt DESC, label ASC) = 1
),
l{k} AS (SELECT * FROM l{k - 1} UNION ALL SELECT * FROM n{k})"""


def _lp_audit(spark: SparkSession, sf_dir: str, edges) -> DataFrame:
    """Shared body of the two label-propagation queries: 10% modulo seed
    set, 2 fill-only majority rounds over the given edge table, then the
    held-out correctness audit columns — the queries differ ONLY in how
    the edge table is generated (full threshold graph vs per-node-capped)."""
    from fastembed_rs_spark.operators.graph import propagate_labels

    emb = t(spark, sf_dir, "embeddings")
    seeds = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("node"), "label"
    )
    out = propagate_labels(edges, seeds, rounds=2)
    truth = emb.select(
        F.col("vec_id").alias("node"), F.col("label").cast("long").alias("__t")
    )
    return out.join(truth, "node").select(
        "node",
        F.col("label").alias("label_pred"),
        "round_labeled",
        F.when(F.col("label") == F.col("__t"), 1)
        .otherwise(0)
        .cast("long")
        .alias("correct"),
    )


@q(
    "label_propagation",
    f"""
WITH edges AS ({_EDGE_SQL}),
sym AS (SELECT id_a AS src, id_b AS dst FROM edges
        UNION ALL SELECT id_b AS src, id_a AS dst FROM edges),
l0 AS (SELECT vec_id AS node, CAST(label AS BIGINT) AS label,
              CAST(0 AS BIGINT) AS round_labeled
       FROM embeddings WHERE vec_id % 10 = 0),
{_lp_round_sql(1)},
{_lp_round_sql(2)}
SELECT l2.node, l2.label AS label_pred, l2.round_labeled,
       CAST(CASE WHEN l2.label = CAST(e.label AS BIGINT) THEN 1 ELSE 0 END
            AS BIGINT) AS correct
FROM l2 JOIN embeddings e ON l2.node = e.vec_id
""",
    "semi-supervised label spreading: 10% of vectors keep their true "
    "label (deterministic vec_id seed set), everyone else takes the "
    "majority label of labeled near-dup neighbors (cosine ≥ 0.4 graph), "
    "2 fill-only rounds — how sparse human quality/language/domain labels "
    "get extended across a 100 TB corpus without a model. Fill-only "
    "propagation is monotone (labeled set only grows), so rounds bound "
    "work and there is no LPA oscillation; per round one edge⋈labeled "
    "equi-join + one (node,label) count agg + one max(struct) argmax "
    "(ties → lowest label), lineage checkpoint-truncated. Output carries "
    "the round each node was labeled in and correctness vs the held-out "
    "truth — the accuracy audit rides the same scan",
)
def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = (
        QUERIES["embedding_neardup"]
        .spark(spark, sf_dir)
        .select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    )
    return _lp_audit(spark, sf_dir, edges)


@q(
    "label_propagation_bounded",
    f"""
WITH edges0 AS (
  SELECT * FROM (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round({_dk_cos('a.embedding', 'b.embedding')}, 6) AS score
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  ) WHERE score >= 0.4
),
sym0 AS (SELECT id_a AS src, id_b AS dst, score FROM edges0
         UNION ALL SELECT id_b, id_a, score FROM edges0),
edges AS (
  SELECT DISTINCT least(src, dst) AS id_a, greatest(src, dst) AS id_b
  FROM (SELECT src, dst,
               row_number() OVER (PARTITION BY src
                                  ORDER BY score DESC, dst ASC) AS rnk
        FROM sym0)
  WHERE rnk <= 8
),
sym AS (SELECT id_a AS src, id_b AS dst FROM edges
        UNION ALL SELECT id_b AS src, id_a AS dst FROM edges),
l0 AS (SELECT vec_id AS node, CAST(label AS BIGINT) AS label,
              CAST(0 AS BIGINT) AS round_labeled
       FROM embeddings WHERE vec_id % 10 = 0),
{_lp_round_sql(1)},
{_lp_round_sql(2)}
SELECT l2.node, l2.label AS label_pred, l2.round_labeled,
       CAST(CASE WHEN l2.label = CAST(e.label AS BIGINT) THEN 1 ELSE 0 END
            AS BIGINT) AS correct
FROM l2 JOIN embeddings e ON l2.node = e.vec_id
""",
    "label_propagation on the BOUNDED edge set (the 100 TB input shape): "
    "the cosine≥0.4 near-dup graph grows quadratically per duplicate "
    "cluster, so the edge generator caps each node to its top-8 partners "
    "(union-kNN: an edge survives when EITHER endpoint ranks it ≤ 8 by "
    "rounded score, ties to the lower partner id) INSIDE the tile kernel "
    "— the pair table is n·B·k-bounded before any shuffle "
    "(dedup.py::embedding_near_dups_blocked per_node_top_k). Propagation "
    "itself is unchanged: fill-only majority over labeled neighbors, 2 "
    "rounds, monotone labeled set — same accuracy-audit output columns",
)
def q_label_propagation_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = D.embedding_near_dups_blocked(
        t(spark, sf_dir, "embeddings"), threshold=0.4, per_node_top_k=8
    ).select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    return _lp_audit(spark, sf_dir, edges)


@q(
    "cohort_retention",
    """
WITH e AS (
  SELECT user_id, epoch_ns(ts) // 604800000000000 AS wk FROM events
),
c AS (SELECT user_id, min(wk) AS cohort_wk FROM e GROUP BY user_id),
a AS (
  SELECT DISTINCT e.user_id, c.cohort_wk, e.wk - c.cohort_wk AS offset_wk
  FROM e JOIN c ON e.user_id = c.user_id
),
sz AS (SELECT cohort_wk, CAST(count(*) AS BIGINT) AS cohort_size
       FROM c GROUP BY cohort_wk)
SELECT a.cohort_wk, a.offset_wk,
       CAST(count(*) AS BIGINT) AS n_active,
       sz.cohort_size,
       round(CAST(count(*) AS DOUBLE) / CAST(sz.cohort_size AS DOUBLE), 6)
         AS retention
FROM a JOIN sz ON a.cohort_wk = sz.cohort_wk
GROUP BY a.cohort_wk, a.offset_wk, sz.cohort_size
""",
    "cohort retention matrix: users grouped by first-activity week, "
    "fraction still active k weeks later — the product-analytics staple "
    "behind every retention curve. Weeks are exact integer epoch-nanos "
    "floor-division buckets (ts div 604800e9), NOT calendar months: "
    "calendar bucketing is the classic cross-engine trap (zone/DST/month "
    "length), integer weeks hash-match by construction. Shape: one "
    "user-keyed min-agg for cohorts, one distinct over (user, offset) — "
    "both partial-agg'd before their shuffles — then a cohort-sized "
    "(tiny) size table joined back; the per-user event history never "
    "needs to fit anywhere, only its distinct week set does",
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").select(
        "user_id", F.expr("ts div 604800000000000").alias("wk")
    )
    c = e.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    a = (
        e.join(c, "user_id")
        .select("user_id", "cohort_wk", (F.col("wk") - F.col("cohort_wk")).alias("offset_wk"))
        .distinct()
    )
    sz = c.groupBy("cohort_wk").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    return (
        a.groupBy("cohort_wk", "offset_wk")
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
        .join(F.broadcast(sz), "cohort_wk")
        .select(
            "cohort_wk",
            "offset_wk",
            "n_active",
            "cohort_size",
            F.round(
                F.col("n_active").cast("double")
                / F.col("cohort_size").cast("double"),
                6,
            ).alias("retention"),
        )
    )


@q(
    "training_triples",
    f"""
WITH qv AS (
  SELECT vec_id AS query_id, embedding AS qe, label AS qlabel
  FROM embeddings WHERE vec_id < 20
),
scored AS (
  SELECT qv.query_id, qv.qlabel, e.vec_id, e.label,
         round({_dk_cos('qv.qe', 'e.embedding')}, 6) AS score
  FROM qv CROSS JOIN embeddings e
  WHERE e.vec_id <> qv.query_id
),
pos AS (
  SELECT query_id, vec_id AS pos_id, score AS pos_score
  FROM scored WHERE label = qlabel
  QUALIFY row_number() OVER (PARTITION BY query_id
                             ORDER BY score DESC, vec_id ASC) = 1
),
neg AS (
  SELECT query_id, vec_id AS neg_id, score AS neg_score,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY score DESC, vec_id ASC) AS BIGINT)
           AS neg_rank
  FROM scored WHERE label <> qlabel
  QUALIFY neg_rank <= 5
)
SELECT neg.query_id, pos.pos_id, pos.pos_score,
       neg.neg_rank, neg.neg_id, neg.neg_score
FROM neg JOIN pos ON neg.query_id = pos.query_id
""",
    "contrastive training-pair generation: for each anchor, the nearest "
    "SAME-label neighbor as the positive and the 5 nearest "
    "DIFFERENT-label vectors as hard negatives — the (anchor, positive, "
    "hard-negative) triples that train embedding models and rerankers "
    "(the reference's models are consumers of exactly this data). One "
    "broadcast-anchor score pass feeds both sides; the positive is a "
    "map-side-combined max(struct) argmax (no sort), negatives go "
    "through the rank-k window WindowGroupLimit prunes; at corpus scale "
    "the scored pass swaps for the IVF/PQ searchers with label "
    "post-filter + overfetch — same downstream contract",
)
def q_training_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.fast_vector import pairwise_cosine_fast

    emb = t(spark, sf_dir, "embeddings")
    anchors = (
        emb.filter(F.col("vec_id") < 20)
        .select("vec_id", "embedding", "label")
        .collect()
    )
    targets = [(r[0], list(r[1])) for r in anchors]
    qlabels = spark.createDataFrame(
        [(r[0], r[2]) for r in anchors], "query_id long, __ql int"
    )
    # anchor scoring through the NumPy tile kernel (the expression-chain
    # cosine measured 3.5s for this 40k-row pass at sf0.1 — codegen does
    # not love a 64-dim unrolled tree; the kernel is bit-identical, see
    # the blocked-neardup pin). Materialized once for its two consumers.
    scored = (
        pairwise_cosine_fast(
            emb, "vec_id", "embedding", targets,
            target_id_name="query_id", score_name="__raw",
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .join(F.broadcast(qlabels), "query_id")
        .join(emb.select("vec_id", "label"), "vec_id")  # AQE broadcasts
        .select(
            "query_id",
            "__ql",
            "vec_id",
            "label",
            F.round("__raw", 6).alias("score"),
        )
        .localCheckpoint()
    )
    pos = (
        scored.filter(F.col("label") == F.col("__ql"))
        .groupBy("query_id")
        .agg(
            F.max(
                F.struct(
                    F.col("score").alias("score"),
                    (-F.col("vec_id")).alias("__nv"),
                    F.col("vec_id").alias("vec_id"),
                )
            ).alias("__b")
        )
        .select(
            "query_id",
            F.col("__b.vec_id").alias("pos_id"),
            F.col("__b.score").alias("pos_score"),
        )
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("vec_id")
    )
    neg = (
        scored.filter(F.col("label") != F.col("__ql"))
        .withColumn("neg_rank", F.row_number().over(wr).cast("long"))
        .filter(F.col("neg_rank") <= 5)
        .select(
            "query_id",
            F.col("vec_id").alias("neg_id"),
            F.col("score").alias("neg_score"),
            "neg_rank",
        )
    )
    return neg.join(F.broadcast(pos), "query_id").select(
        "query_id", "pos_id", "pos_score", "neg_rank", "neg_id", "neg_score"
    )


_GRAMS_CTE = f"""g AS (
  SELECT doc_id, lang,
         list_distinct(CASE WHEN len({duck_tokens('text')}) >= 3 THEN
           list_transform(generate_series(1, len({duck_tokens('text')}) - 2),
             i -> concat_ws(' ', {duck_tokens('text')}[i], {duck_tokens('text')}[i+1], {duck_tokens('text')}[i+2]))
         ELSE [] END) AS grams
  FROM documents
)"""


@q(
    "containment_neardup",
    f"""
WITH {_GRAMS_CTE}
SELECT * FROM (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(len(a.grams) AS BIGINT) AS grams_a,
         CAST(len(b.grams) AS BIGINT) AS grams_b,
         round(CASE WHEN least(len(a.grams), len(b.grams)) = 0 THEN 0.0 ELSE
           CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
           / CAST(least(len(a.grams), len(b.grams)) AS DOUBLE) END, 6)
           AS containment
  FROM g a JOIN g b ON a.doc_id < b.doc_id
) WHERE containment >= 0.6
""",
    "asymmetric containment near-dup pairs: |A∩B| / min(|A|,|B|) ≥ 0.6 "
    "over word-3-gram sets — catches quote/subset duplication that "
    "Jaccard structurally misses (a paragraph pasted into a 100x longer "
    "page is ~0.01 Jaccard but 1.0 containment; curation drops the "
    "contained side). Same inverted-index shape and Σdf² cost model as "
    "ngram_jaccard_neardup: postings self-equi-join, zero-overlap pairs "
    "never materialize, exact for threshold > 0 "
    "(operators/dedup.py::containment_pairs)",
)
def q_containment_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.dedup import containment_pairs

    docs = t(spark, sf_dir, "documents")
    return containment_pairs(docs, "doc_id", "text", n=3, threshold=0.6)


@q(
    "grouped_linregress",
    f"""
WITH f AS (
  SELECT lang,
         CAST(len({duck_tokens('text')}) AS BIGINT) AS x,
         CAST(length(text) AS BIGINT) AS y
  FROM documents
),
m AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM f GROUP BY lang
)
SELECT lang, n,
  round(CASE WHEN (n * sxx - sx * sx) = 0 THEN 0.0 ELSE
    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
  END, 6) AS slope,
  round(CASE WHEN (n * sxx - sx * sx) = 0 THEN 0.0 ELSE
    (CAST(sy AS DOUBLE) - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) * CAST(sx AS DOUBLE))
    / CAST(n AS DOUBLE)
  END, 6) AS intercept,
  round(CASE WHEN (n * sxx - sx * sx) = 0 OR (n * syy - sy * sy) = 0 THEN 0.0 ELSE
    ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
     * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
    / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
       * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
  END, 6) AS r2
FROM m
""",
    "per-group closed-form linear regression (chars ~ tokens per "
    "language): slope, intercept, R² from ONE pass of exact int64 moment "
    "sums — the distributed 'ML-lite' shape for per-segment trend fits "
    "that never needs an iterative solver. Degenerate groups (zero x or y "
    "variance) report 0.0 via an EXACT integer variance check, not a "
    "float epsilon; the float stages run the same expression tree on "
    "identically-converted integer moments, so results are bit-identical "
    "cross-engine before round(6). Same int64-range note as "
    "feature_correlations applies past ~2e5 docs per group",
)
def q_grouped_linregress(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    from fastembed_rs_spark.functions.text import tokens

    f = docs.select(
        "lang",
        F.size(tokens(F.col("text"))).cast("long").alias("x"),
        F.length("text").cast("long").alias("y"),
    )
    m = f.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )

    def dbl(c: str):
        return F.col(c).cast("double")

    denx_i = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    deny_i = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    num = dbl("n") * dbl("sxy") - dbl("sx") * dbl("sy")
    denx = dbl("n") * dbl("sxx") - dbl("sx") * dbl("sx")
    deny = dbl("n") * dbl("syy") - dbl("sy") * dbl("sy")
    slope = num / denx
    return m.select(
        "lang",
        "n",
        F.round(F.when(denx_i == 0, F.lit(0.0)).otherwise(slope), 6).alias("slope"),
        F.round(
            F.when(denx_i == 0, F.lit(0.0)).otherwise(
                (dbl("sy") - slope * dbl("sx")) / dbl("n")
            ),
            6,
        ).alias("intercept"),
        F.round(
            F.when((denx_i == 0) | (deny_i == 0), F.lit(0.0)).otherwise(
                (num * num) / (denx * deny)
            ),
            6,
        ).alias("r2"),
    )


@q(
    "reciprocal_nn",
    f"""
WITH p AS (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         round({_dk_cos('a.embedding', 'b.embedding')}, 6) AS score
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
),
pf AS (SELECT * FROM p WHERE score >= 0.2),
r AS (
  SELECT src, dst, score,
         CAST(row_number() OVER (PARTITION BY src
                                 ORDER BY score DESC, dst ASC) AS BIGINT)
           AS rnk
  FROM pf QUALIFY rnk <= 3
)
SELECT r1.src AS id_a, r1.dst AS id_b, r1.score,
       r1.rnk AS rank_ab, r2.rnk AS rank_ba
FROM r r1 JOIN r r2 ON r1.src = r2.dst AND r1.dst = r2.src
WHERE r1.src < r1.dst
""",
    "reciprocal nearest neighbors: pairs where EACH side ranks the other "
    "in its top-3 (among candidates with cosine ≥ 0.2) — the "
    "high-precision mutual-kNN filter that separates true duplicates "
    "from hub vectors that merely sit near everything (a hub appears in "
    "many top-k lists but reciprocates few). One blocked-kernel candidate "
    "pass feeds a per-src rank window (WindowGroupLimit-pruned), then "
    "mutuality is a self equi-join on the reversed pair; at corpus scale "
    "the candidate pass swaps for the IVF searcher with overfetch — the "
    "mutual-join stage is unchanged",
)
def q_reciprocal_nn(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per_node_top_k=3 bounds the candidate pair table to the union-3NN
    # graph INSIDE the tile kernel (n·B·3-ish rows instead of quadratic
    # per dup-cluster) — provably output-identical here: every src's true
    # top-3 partners survive the cap, extra partners kept via the other
    # side only rank ≥ 4, and mutuality needs rank ≤ 3 on BOTH sides
    # (tests/test_mining_ops.py pins capped == brute-force full semantics)
    pairs = D.embedding_near_dups_blocked(
        t(spark, sf_dir, "embeddings"), threshold=0.2, per_node_top_k=3
    )
    # blocked kernel emits canonical a<b pairs; symmetrize for ranking
    sym = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst"), "score"
    ).unionAll(
        pairs.select(
            F.col("id_b").alias("src"), F.col("id_a").alias("dst"), "score"
        )
    )
    wr = Window.partitionBy("src").orderBy(F.desc("score"), F.asc("dst"))
    r = (
        sym.withColumn("rnk", F.row_number().over(wr).cast("long"))
        .filter(F.col("rnk") <= 3)
    )
    r2 = r.select(
        F.col("src").alias("dst"),
        F.col("dst").alias("src"),
        F.col("rnk").alias("rank_ba"),
    )
    return (
        r.join(r2, ["src", "dst"])
        .filter(F.col("src") < F.col("dst"))
        .select(
            F.col("src").alias("id_a"),
            F.col("dst").alias("id_b"),
            "score",
            F.col("rnk").alias("rank_ab"),
            "rank_ba",
        )
    )



@q(
    "margin_mining",
    f"""{_TRAIN8_CTES},
probes AS (
  SELECT p.vec_id, c.centroid_id,
         row_number() OVER (PARTITION BY p.vec_id
                            ORDER BY round({_dk_cos('p.v', 'c.cv')}, 6) DESC,
                                     c.centroid_id ASC) AS rnk
  FROM pts p CROSS JOIN {_TRAIN8_CENT} c
  QUALIFY rnk <= 2
),
cand AS (
  SELECT DISTINCT a.vec_id AS aid, c.vec_id AS cid
  FROM probes a JOIN probes c ON a.centroid_id = c.centroid_id
  WHERE a.vec_id % 2 = 0 AND c.vec_id % 2 = 1
    AND (a.rnk = 1 OR c.rnk = 1)
),
p AS (
  SELECT cand.aid, cand.cid,
         CAST(round({_dk_cos('ea.v', 'ec.v')} * 1000000)
              AS BIGINT) AS si
  FROM cand JOIN pts ea ON cand.aid = ea.vec_id
            JOIN pts ec ON cand.cid = ec.vec_id
),
ka AS (
  SELECT aid, CAST(sum(si) AS BIGINT) AS suma
  FROM (SELECT aid, si, row_number() OVER (PARTITION BY aid
              ORDER BY si DESC, cid ASC) AS rn FROM p)
  WHERE rn <= 4 GROUP BY aid
),
kc AS (
  SELECT cid, CAST(sum(si) AS BIGINT) AS sumc
  FROM (SELECT cid, si, row_number() OVER (PARTITION BY cid
              ORDER BY si DESC, aid ASC) AS rn FROM p)
  WHERE rn <= 4 GROUP BY cid
),
m AS (
  SELECT p.aid, p.cid, p.si,
         round(CASE WHEN (ka.suma + kc.sumc) <= 0 THEN 0.0 ELSE
           8.0 * CAST(p.si AS DOUBLE) / CAST(ka.suma + kc.sumc AS DOUBLE)
         END, 6) AS margin
  FROM p JOIN ka ON p.aid = ka.aid JOIN kc ON p.cid = kc.cid
)
SELECT aid AS anchor_id, cid AS candidate_id,
       round(CAST(si AS DOUBLE) / 1000000, 6) AS score, margin
FROM m
QUALIFY row_number() OVER (PARTITION BY aid
                           ORDER BY margin DESC, cid ASC) = 1
""",
    "margin-based mining (ratio margin, Artetxe & Schwenk 2019 — the "
    "bitext-mining score behind CCMatrix-style parallel-corpus "
    "extraction): split vectors into two pools (even/odd ids standing in "
    "for two languages), generate candidate pairs DISTRIBUTED via a "
    "trained-IVF overfetch (k=8 Lloyd's centroids, each vector probes its "
    "top-2 buckets; a pair is a candidate when either side's ASSIGNED "
    "bucket is among the other's probes — a shuffle equi-join on bucket "
    "id, never all-pairs and never a driver collect), then score "
    "margin(a,c) = cos(a,c) / mean(top-4 cos of a, top-4 cos of c) over "
    "the candidate set and keep each anchor's best candidate — the "
    "normalization suppresses hub vectors that score high against "
    "everything. Scores live in exact integer micro-units so the top-4 "
    "sums are order-independent (8·si/(Σa+Σc) is one division of exact "
    "ints — bit-identical cross-engine); both top-4 windows are "
    "WindowGroupLimit-pruned; the oracle replays centroid training as "
    "chained CTEs exactly like ann_ivf_trained",
)
def q_margin_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.fast_vector import pairwise_cosine_fast
    from fastembed_rs_spark.operators.topk import train_ivf_centroids

    emb = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # constant-size driver state: k=8 trained centroids (the former shape —
    # collecting the whole odd pool into the task closure — grew linearly
    # with the corpus: the textbook driver-OOM at 100x)
    targets = [
        (r[0], list(r[1]))
        for r in train_ivf_centroids(emb, k=8, iters=3).collect()
    ]
    probes = (
        pairwise_cosine_fast(
            emb, "vec_id", "embedding", targets,
            target_id_name="centroid_id", score_name="__p",
        )
        .select("vec_id", "centroid_id", F.round("__p", 6).alias("__ps"))
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(
                    F.desc("__ps"), F.asc("centroid_id")
                )
            ),
        )
        .filter(F.col("rnk") <= 2)
        .join(emb, "vec_id")
    )
    pa = probes.filter(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("aid"), F.col("embedding").alias("__ea"),
        "centroid_id", F.col("rnk").alias("__ra"),
    )
    pc = probes.filter(F.col("vec_id") % 2 == 1).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("__ec"),
        "centroid_id", F.col("rnk").alias("__rc"),
    )
    # candidate pair when a probes c's assigned bucket OR c probes a's
    # assigned bucket (assignment = probe rank 1) — the symmetric IVF
    # overfetch; equi-join on centroid_id keeps the shuffle bucket-local.
    # Pair scoring runs through the row-pair NumPy kernel (bit-identical
    # fold order): the interpreted HOF cosine cost 376s on the sf1
    # fixture's 50M-row candidate table, the kernel seconds
    from fastembed_rs_spark.operators.fast_vector import rowpair_cosine_fast

    pairs = pa.join(pc.filter(F.col("__rc") == 1), "centroid_id").unionByName(
        pa.filter(F.col("__ra") == 1).join(pc, "centroid_id")
    )
    scored = rowpair_cosine_fast(
        pairs, "__ea", "__ec", keep=["aid", "cid"], score_name="__raw"
    ).select(
        "aid",
        "cid",
        F.round(F.col("__raw") * 1000000).cast("long").alias("si"),
    )
    # dedup pairs found in both directions (si is bit-identical either way,
    # so max == the value); the scored table feeds THREE consumers (both
    # top-4 windows and the margin join) so it is materialized once,
    # repartitioned by anchor for window parallelism. persist(), NOT
    # localCheckpoint: checkpoint blocks are lineage-free — one eviction
    # under memory pressure is fatal (observed on a 100M-row pair table at
    # the sf1 proof: block-manager FileNotFound). persist keeps lineage so
    # a dropped block just recomputes its partition.
    p = (
        scored.groupBy("aid", "cid")
        .agg(F.max("si").alias("si"))
        .repartition(32, "aid")
        .persist()
    )
    wa = Window.partitionBy("aid").orderBy(F.desc("si"), F.asc("cid"))
    wc = Window.partitionBy("cid").orderBy(F.desc("si"), F.asc("aid"))
    ka = (
        p.withColumn("rn", F.row_number().over(wa))
        .filter(F.col("rn") <= 4)
        .groupBy("aid")
        .agg(F.sum("si").cast("long").alias("suma"))
    )
    kc = (
        p.withColumn("rn", F.row_number().over(wc))
        .filter(F.col("rn") <= 4)
        .groupBy("cid")
        .agg(F.sum("si").cast("long").alias("sumc"))
    )
    den = F.col("suma") + F.col("sumc")
    m = (
        p.join(F.broadcast(ka), "aid")
        .join(F.broadcast(kc), "cid")
        .select(
            "aid",
            "cid",
            "si",
            F.round(
                F.when(den <= 0, F.lit(0.0)).otherwise(
                    F.lit(8.0) * F.col("si").cast("double") / den.cast("double")
                ),
                6,
            ).alias("margin"),
        )
    )
    wm = Window.partitionBy("aid").orderBy(F.desc("margin"), F.asc("cid"))
    return (
        m.withColumn("__r", F.row_number().over(wm))
        .filter(F.col("__r") == 1)
        .select(
            F.col("aid").alias("anchor_id"),
            F.col("cid").alias("candidate_id"),
            F.round(F.col("si").cast("double") / 1000000, 6).alias("score"),
            "margin",
        )
    )


def _kcore_oracle(k: int, rounds: int) -> str:
    parts = []
    prev = "sym"
    for r in range(1, rounds + 1):
        parts.append(f"""k{r} AS (
  SELECT src AS node FROM {prev} GROUP BY src HAVING count(*) >= {k}
),
s{r} AS (
  SELECT s.src, s.dst FROM {prev} s
  JOIN k{r} x ON s.src = x.node JOIN k{r} y ON s.dst = y.node
)""")
        prev = f"s{r}"
    return (
        "WITH " + _GRAPH_EDGE2_CTES + ",\n" + ",\n".join(parts)
        + f"""
SELECT src AS node, CAST(count(*) AS BIGINT) AS core_deg
FROM {prev} GROUP BY src HAVING count(*) >= {k}"""
    )


@q(
    "graph_kcore",
    _kcore_oracle(k=2, rounds=4),
    "2-core of the supported co-purchase graph via 4 bounded peel rounds "
    "(drop degree<2 nodes, recompute on the induced subgraph): the "
    "density-pruning pass that strips evidence-thin tendrils off a "
    "candidate-pair graph before clustering — a chain of pairwise matches "
    "is one bad edge from wrong, a 2-core region is mutually "
    "corroborated. Peeling is idempotent at the fixpoint so the fixed "
    "bound (needed for oracle unrolling) just no-ops after convergence; "
    "per round two left-semi joins against the shrinking survivor set + "
    "one count agg, edge list monotonically shrinking "
    "(operators/graph.py::kcore)",
)
def q_graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators import graph as G

    edges = G.copurchase_edges(t(spark, sf_dir, "lineitem"), min_support=2)
    return G.kcore(edges, k=2, rounds=4).select("node", "core_deg")


@q(
    "psi_drift",
    """
WITH b AS (
  SELECT lang, least(n_chars // 200, 9) AS bucket FROM documents
),
langs AS (SELECT DISTINCT lang FROM b WHERE lang <> 'en'),
grid AS (
  SELECT langs.lang, g.bucket
  FROM langs CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS bucket) g
),
rc AS (SELECT bucket, CAST(count(*) AS BIGINT) AS rcnt
       FROM b WHERE lang = 'en' GROUP BY bucket),
rt AS (SELECT CAST(count(*) AS BIGINT) AS rtot FROM b WHERE lang = 'en'),
cc AS (SELECT lang, bucket, CAST(count(*) AS BIGINT) AS ccnt
       FROM b WHERE lang <> 'en' GROUP BY lang, bucket),
ct AS (SELECT lang, CAST(count(*) AS BIGINT) AS ctot
       FROM b WHERE lang <> 'en' GROUP BY lang),
j AS (
  SELECT grid.lang, grid.bucket,
         CAST(coalesce(rc.rcnt, 0) + 1 AS DOUBLE)
           / CAST(rt.rtot + 10 AS DOUBLE) AS p,
         CAST(coalesce(cc.ccnt, 0) + 1 AS DOUBLE)
           / CAST(ct.ctot + 10 AS DOUBLE) AS q
  FROM grid
  LEFT JOIN rc ON grid.bucket = rc.bucket
  LEFT JOIN cc ON grid.lang = cc.lang AND grid.bucket = cc.bucket
  JOIN ct ON grid.lang = ct.lang
  CROSS JOIN rt
),
terms AS (
  SELECT lang, bucket, p, q,
         CAST(round((p - q) * ln(p / q) * 1000000000) AS BIGINT) AS nano
  FROM j
)
SELECT lang, bucket, round(p, 6) AS p_ref, round(q, 6) AS q_cmp,
       CAST(sum(nano) OVER (PARTITION BY lang) AS BIGINT) AS psi_nano
FROM terms
""",
    "population stability index (PSI) — the production drift metric — of "
    "the document-length distribution per language vs the 'en' reference: "
    "10 fixed 200-char buckets, Laplace-smoothed shares, per-bucket "
    "contribution (p−q)·ln(p/q), and the per-language PSI total "
    "(>0.2 = retrain/alert in the standard reading). Per-bucket terms "
    "are converted to exact integer NANO-units before the per-language "
    "sum, so the only cross-engine float ops are two divisions and one "
    "ln on identical inputs — the total is never an order-dependent "
    "float sum. One scan builds the histogram; everything after runs on "
    "a (langs × 10)-row table of broadcast joins",
)
def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    b = docs.select(
        "lang", F.least(F.expr("n_chars div 200"), F.lit(9)).alias("bucket")
    )
    langs = b.filter(F.col("lang") != "en").select("lang").distinct()
    grid = langs.crossJoin(
        F.broadcast(
            b.sparkSession.range(10).select(F.col("id").cast("int").alias("bucket"))
        )
    )
    rc = (
        b.filter(F.col("lang") == "en")
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("rcnt"))
    )
    rt = b.filter(F.col("lang") == "en").agg(
        F.count(F.lit(1)).cast("long").alias("rtot")
    )
    cc = (
        b.filter(F.col("lang") != "en")
        .groupBy("lang", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("ccnt"))
    )
    ct = (
        b.filter(F.col("lang") != "en")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).cast("long").alias("ctot"))
    )
    p = (F.coalesce(F.col("rcnt"), F.lit(0)) + 1).cast("double") / (
        F.col("rtot") + 10
    ).cast("double")
    q_ = (F.coalesce(F.col("ccnt"), F.lit(0)) + 1).cast("double") / (
        F.col("ctot") + 10
    ).cast("double")
    j = (
        grid.join(F.broadcast(rc), "bucket", "left")
        .join(F.broadcast(cc), ["lang", "bucket"], "left")
        .join(F.broadcast(ct), "lang")
        .crossJoin(F.broadcast(rt))
        .select("lang", "bucket", p.alias("p"), q_.alias("q"))
    )
    terms = j.select(
        "lang",
        "bucket",
        "p",
        "q",
        F.round((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q")) * 1000000000)
        .cast("long")
        .alias("nano"),
    )
    wl = Window.partitionBy("lang")
    return terms.select(
        "lang",
        "bucket",
        F.round("p", 6).alias("p_ref"),
        F.round("q", 6).alias("q_cmp"),
        F.sum("nano").over(wl).cast("long").alias("psi_nano"),
    )


@q(
    "robust_value_outliers",
    """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY event_type
),
mad AS (
  SELECT e.event_type, med.med,
         quantile_cont(abs(e.value - med.med), 0.5) AS mad,
         CAST(count(*) AS BIGINT) AS n
  FROM events e JOIN med ON e.event_type = med.event_type
  GROUP BY e.event_type, med.med
)
SELECT m.event_type, round(m.med, 6) AS med, round(m.mad, 6) AS mad, m.n,
       CAST(count(*) FILTER (WHERE m.mad > 0.0
              AND abs(0.6745 * (e.value - m.med) / m.mad) > 3.5) AS BIGINT)
         AS n_outliers
FROM events e JOIN mad m ON e.event_type = m.event_type
GROUP BY m.event_type, m.med, m.mad, m.n
""",
    "robust outlier detection per event type: median + MAD (median "
    "absolute deviation) and the count of |modified z| = "
    "|0.6745(x−med)/MAD| > 3.5 rows (Iglewicz-Hoaglin) — the monitoring "
    "pass that, unlike mean/stddev z-scores, is not dragged by the very "
    "outliers it hunts (one fat-finger event inflates σ and masks "
    "itself; the median pair is 50%-breakdown robust). Two exact "
    "ordered-set aggregate passes (same percentile↔quantile_cont recipe "
    "as value_percentiles) with the tiny per-type medians broadcast back "
    "between them; the flag comparison runs on deterministic floats so "
    "the counts hash-match",
)
def q_robust_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type", "med")
        .agg(
            F.expr("percentile(abs(value - med), 0.5)").alias("mad"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )
    flag = (
        F.col("mad") > 0.0
    ) & (F.abs(F.lit(0.6745) * (F.col("value") - F.col("med")) / F.col("mad")) > 3.5)
    return (
        ev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "med", "mad", "n")
        .agg(F.sum(F.when(flag, 1).otherwise(0)).cast("long").alias("n_outliers"))
        .select(
            "event_type",
            F.round("med", 6).alias("med"),
            F.round("mad", 6).alias("mad"),
            "n",
            "n_outliers",
        )
    )


@q(
    "event_transitions",
    """
WITH s AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY epoch_ns(ts), event_id) AS prev
  FROM events
),
c AS (
  SELECT prev, event_type AS next, CAST(count(*) AS BIGINT) AS cnt
  FROM s WHERE prev IS NOT NULL GROUP BY prev, event_type
),
rowtot AS (SELECT prev, CAST(sum(cnt) AS BIGINT) AS tot FROM c GROUP BY prev)
SELECT c.prev, c.next, c.cnt,
       round(CAST(c.cnt AS DOUBLE) / CAST(r.tot AS BIGINT), 6) AS prob,
       CAST(row_number() OVER (PARTITION BY c.prev
                               ORDER BY c.cnt DESC, c.next ASC) AS BIGINT)
         AS rnk
FROM c JOIN rowtot r ON c.prev = r.prev
""",
    "first-order Markov transition matrix over per-user event sequences: "
    "P(next | prev) with counts, row-normalized probabilities and a "
    "per-state rank — the model behind next-action prediction, funnel "
    "drop-off analysis and session synthesis. One user-partitioned lag "
    "window (the same single shuffle sessionize/scd2 use), then all "
    "aggregation happens on the states×states table (tiny however large "
    "the event log); probabilities are one division of exact counts",
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "user_id", "event_type", F.lag("event_type").over(w).alias("prev")
    ).filter(F.col("prev").isNotNull())
    c = s.groupBy(F.col("prev"), F.col("event_type").alias("next")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    rowtot = c.groupBy("prev").agg(F.sum("cnt").cast("long").alias("tot"))
    wr = Window.partitionBy("prev").orderBy(F.desc("cnt"), F.asc("next"))
    return (
        c.join(F.broadcast(rowtot), "prev")
        .select(
            "prev",
            "next",
            "cnt",
            F.round(F.col("cnt").cast("double") / F.col("tot").cast("double"), 6)
            .alias("prob"),
            F.row_number().over(wr).cast("long").alias("rnk"),
        )
    )


_KMV_MIX_MOD = 4_294_967_296  # 2^32 domain after the Fibonacci mix
_KMV_K = 256


def _kmv_key_hashes_sql(table: str, key: str) -> str:
    th = duck_token_hash(f"CAST({key} AS VARCHAR)")
    return (
        f"SELECT DISTINCT (({th} * 2654435761) % {_KMV_MIX_MOD}) AS h "
        f"FROM {table}"
    )


@q(
    "join_size_estimate",
    f"""
WITH ha AS ({_kmv_key_hashes_sql('orders', 'o_custkey')}),
hb AS ({_kmv_key_hashes_sql('customer', 'c_custkey')}),
topu AS (
  SELECT h FROM (SELECT h FROM ha UNION SELECT h FROM hb)
  ORDER BY h LIMIT {_KMV_K}
),
flags AS (
  SELECT t.h,
         CASE WHEN a.h IS NOT NULL THEN 1 ELSE 0 END AS ina,
         CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END AS inb
  FROM topu t LEFT JOIN ha a ON t.h = a.h LEFT JOIN hb b ON t.h = b.h
),
est AS (
  SELECT CAST(count(*) AS BIGINT) AS kk,
         CAST(max(h) AS BIGINT) AS hk,
         CAST(sum(ina * inb) AS BIGINT) AS n_both
  FROM flags
),
act AS (
  SELECT CAST(count(*) AS BIGINT) AS actual_overlap FROM (
    SELECT DISTINCT o_custkey FROM orders
    INTERSECT SELECT DISTINCT c_custkey FROM customer
  )
)
SELECT est.kk, est.n_both,
       round(CASE WHEN est.kk < {_KMV_K} THEN CAST(est.kk AS DOUBLE)
             ELSE ({_KMV_K} - 1) * CAST({_KMV_MIX_MOD} AS DOUBLE)
                  / CAST(est.hk AS DOUBLE) END, 4) AS est_union,
       round(CAST(est.n_both AS DOUBLE) / CAST(est.kk AS DOUBLE), 6)
         AS est_jaccard,
       round((CAST(est.n_both AS DOUBLE) / CAST(est.kk AS DOUBLE))
             * (CASE WHEN est.kk < {_KMV_K} THEN CAST(est.kk AS DOUBLE)
                ELSE ({_KMV_K} - 1) * CAST({_KMV_MIX_MOD} AS DOUBLE)
                     / CAST(est.hk AS DOUBLE) END), 4) AS est_overlap,
       act.actual_overlap
FROM est CROSS JOIN act
""",
    "KMV join-cardinality estimator — the cost-based-optimizer primitive: "
    "estimate the distinct-key overlap of orders.o_custkey vs "
    "customer.c_custkey from two 256-value KMV sketches (Beyer et al. "
    "2007: K-th smallest hash of the union estimates the union size, the "
    "fraction of the union sketch present in BOTH sketches estimates "
    "Jaccard; overlap = jaccard × union), side-by-side with the exact "
    "overlap for the accuracy audit. Each sketch is a 256-row "
    "distinct-hash TakeOrdered over a mixed uniform hash (the "
    "hash_sample Fibonacci mix — raw rolling hashes of short numeric "
    "keys are run-correlated); everything after the two sketch scans "
    "runs on ≤512 rows. This is how a 100 TB engine prices a join "
    "WITHOUT scanning either side's full key set",
)
def q_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.functions.text import token_hash

    def key_hashes(df: DataFrame, key: str) -> DataFrame:
        h = token_hash(F.col(key).cast("string"))
        return df.select(
            ((h * 2654435761) % _KMV_MIX_MOD).alias("h")
        ).distinct()

    ha = key_hashes(t(spark, sf_dir, "orders"), "o_custkey")
    hb = key_hashes(t(spark, sf_dir, "customer"), "c_custkey")
    topu = (
        ha.unionAll(hb).distinct().orderBy("h").limit(_KMV_K)
    )
    flags = (
        topu.join(ha.withColumn("ina", F.lit(1)), "h", "left")
        .join(hb.withColumn("inb", F.lit(1)), "h", "left")
        .select(
            "h",
            F.coalesce("ina", F.lit(0)).alias("ina"),
            F.coalesce("inb", F.lit(0)).alias("inb"),
        )
    )
    est = flags.agg(
        F.count(F.lit(1)).cast("long").alias("kk"),
        F.max("h").cast("long").alias("hk"),
        F.sum(F.col("ina") * F.col("inb")).cast("long").alias("n_both"),
    )
    actual = (
        t(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("k"))
        .distinct()
        .join(
            t(spark, sf_dir, "customer")
            .select(F.col("c_custkey").alias("k"))
            .distinct(),
            "k",
            "left_semi",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("actual_overlap"))
    )
    union_est = F.when(
        F.col("kk") < _KMV_K, F.col("kk").cast("double")
    ).otherwise(
        (_KMV_K - 1) * F.lit(float(_KMV_MIX_MOD)) / F.col("hk").cast("double")
    )
    jacc = F.col("n_both").cast("double") / F.col("kk").cast("double")
    return est.crossJoin(F.broadcast(actual)).select(
        "kk",
        "n_both",
        F.round(union_est, 4).alias("est_union"),
        F.round(jacc, 6).alias("est_jaccard"),
        F.round(jacc * union_est, 4).alias("est_overlap"),
        "actual_overlap",
    )


_SPLIT_CASE_SQL = duck_split_80_10_10("CAST(doc_id AS VARCHAR) || '#split'")


@q(
    "split_leakage_report",
    f"""
WITH {_GRAMS_CTE},
p AS (
  SELECT * FROM (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(CASE WHEN (len(a.grams) = 0 AND len(b.grams) = 0) THEN 0.0 ELSE
             CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
             / (CAST(len(a.grams) AS DOUBLE) + CAST(len(b.grams) AS DOUBLE)
                - CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)) END, 6)
             AS jaccard
    FROM g a JOIN g b ON a.doc_id < b.doc_id
  ) WHERE jaccard >= 0.5
),
s AS (SELECT doc_id, {_SPLIT_CASE_SQL} AS split FROM documents)
SELECT least(sa.split, sb.split) AS split_a,
       greatest(sa.split, sb.split) AS split_b,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(CASE WHEN sa.split <> sb.split THEN 1 ELSE 0 END) AS BIGINT)
         AS n_leaking
FROM p JOIN s sa ON p.id_a = sa.doc_id JOIN s sb ON p.id_b = sb.doc_id
GROUP BY least(sa.split, sb.split), greatest(sa.split, sb.split)
""",
    "train/val/test LEAKAGE AUDIT at the NEAR-DUP level: every jaccard "
    "≥ 0.5 near-duplicate pair, grouped by the (deterministic 80/10/10 "
    "stratified_split) splits its two sides landed in — a cross-split "
    "pair means an eval document has a training-set near-duplicate, the "
    "contamination that silently inflates benchmark numbers (exact-dup "
    "leakage alone misses paraphrase/boilerplate near-dups, which is why "
    "the audit runs on the near-dup pair generator, not fingerprints). "
    "Pairs come from the same adaptive bucketed generator as "
    "jaccard_adaptive_neardup (never all-pairs); split labels are pure "
    "hash codegen joined onto the pair table by id; output is one row "
    "per split pair with total and cross-split ('leaking') counts",
)
def q_split_leakage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.functions.text import token_hash
    from fastembed_rs_spark.operators.dedup import jaccard_pairs_adaptive

    docs = t(spark, sf_dir, "documents")
    pairs = jaccard_pairs_adaptive(docs, "doc_id", "text", n=3, threshold=0.5)
    hh = token_hash(F.concat(F.col("doc_id").cast("string"), F.lit("#split")))
    s = docs.select("doc_id").withColumn("__sg_h", hh).select(
        "doc_id", split_80_10_10("__sg_h").alias("split")
    )
    sa = s.select(F.col("doc_id").alias("id_a"), F.col("split").alias("__sa"))
    sb = s.select(F.col("doc_id").alias("id_b"), F.col("split").alias("__sb"))
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .groupBy(
            F.least("__sa", "__sb").alias("split_a"),
            F.greatest("__sa", "__sb").alias("split_b"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(F.when(F.col("__sa") != F.col("__sb"), 1).otherwise(0))
            .cast("long")
            .alias("n_leaking"),
        )
    )


@q(
    "quality_percent_rank",
    f"""
WITH RECURSIVE {_duck_quality_ctes(", lang", keep="", alias="quality")}
SELECT doc_id, lang, quality,
       round(percent_rank() OVER (PARTITION BY lang ORDER BY quality), 6)
         AS pr
FROM qual
""",
    "per-language quantile normalization of the quality score: "
    "percent_rank within each language — the calibration step that makes "
    "quality thresholds comparable across sub-corpora whose raw score "
    "distributions differ (a 0.55 in one language's distribution is a "
    "0.9 in another's; mixing on raw scores skews the blend). Rank-based, "
    "so it needs no distribution assumption; percent_rank = "
    "(rank−1)/(n−1) is an exact integer ratio over quality values that "
    "are themselves rounded BEFORE ranking (the catalog's standing "
    "determinism rule), and the per-language sort is the one shuffle",
)
def q_quality_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.fast_text import text_stat_counts_fast

    docs = t(spark, sf_dir, "documents")
    counts = text_stat_counts_fast(docs, "doc_id", "text", keep_cols=("lang",))
    q_ = counts.select(
        "doc_id",
        "lang",
        F.round(TS.quality_score_from_counts(), 6).alias("quality"),
    )
    w = Window.partitionBy("lang").orderBy("quality")
    return q_.select(
        "doc_id", "lang", "quality", F.round(F.percent_rank().over(w), 6).alias("pr")
    )


@q(
    "tokenizer_fertility",
    f"""
WITH per AS (
  SELECT lang, source,
         CAST(len(regexp_extract_all(lower(text), '{_BPE_RE}')) AS BIGINT) AS bpe,
         CAST(len({duck_tokens('text')}) AS BIGINT) AS words,
         CAST(n_chars AS BIGINT) AS chars
  FROM documents
)
SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(bpe) AS BIGINT) AS n_bpe_tokens,
       CAST(sum(words) AS BIGINT) AS n_words,
       CAST(sum(chars) AS BIGINT) AS n_chars,
       CASE WHEN CAST(sum(words) AS BIGINT) = 0 THEN 0
            ELSE CAST(sum(bpe) AS BIGINT) * 10000 // CAST(sum(words) AS BIGINT)
       END AS fertility_tenk,
       CASE WHEN CAST(sum(bpe) AS BIGINT) = 0 THEN 0
            ELSE CAST(sum(chars) AS BIGINT) * 10000 // CAST(sum(bpe) AS BIGINT)
       END AS chars_per_token_tenk
FROM per GROUP BY lang, source
""",
    "tokenizer-evaluation fertility table: per (lang, source) sub-corpus, "
    "subword fertility (BPE-ish regex tokens per whitespace word, integer "
    "ten-thousandths) and compression (chars per subword token) — the two "
    "numbers that decide whether a tokenizer under- or over-segments a "
    "language before committing a 100 TB tokenization run (a lang whose "
    "fertility is 2x the corpus median doubles its effective training "
    "cost per character). One narrow scan + one partial-aggregated "
    "groupBy; all ratios are integer floor-division on exact BIGINT sums "
    "so both engines hash identically",
)
def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.functions.text import tokens

    docs = t(spark, sf_dir, "documents")
    per = docs.select(
        "lang",
        "source",
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(_BPE_RE), F.lit(0)))
        .cast("long").alias("bpe"),
        F.size(tokens("text")).cast("long").alias("words"),
        F.col("n_chars").cast("long").alias("chars"),
    )
    agg = per.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("bpe").cast("long").alias("n_bpe_tokens"),
        F.sum("words").cast("long").alias("n_words"),
        F.sum("chars").cast("long").alias("n_chars"),
    )
    return agg.select(
        "lang", "source", "n_docs", "n_bpe_tokens", "n_words", "n_chars",
        F.when(F.col("n_words") == 0, F.lit(0).cast("long"))
        .otherwise(F.expr("n_bpe_tokens * 10000 div n_words"))
        .alias("fertility_tenk"),
        F.when(F.col("n_bpe_tokens") == 0, F.lit(0).cast("long"))
        .otherwise(F.expr("n_chars * 10000 div n_bpe_tokens"))
        .alias("chars_per_token_tenk"),
    )


@q(
    "soft_dedup_weights",
    f"""
WITH RECURSIVE edges AS ({_EDGE_SQL}),
sym AS (SELECT id_a AS a, id_b AS b FROM edges
        UNION SELECT id_b, id_a FROM edges),
reach(node, r) AS (
  SELECT DISTINCT a, a FROM sym
  UNION
  SELECT s.b, reach.r FROM reach JOIN sym s ON s.a = reach.node
),
comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node),
sizes AS (SELECT component, CAST(count(*) AS BIGINT) AS cluster_size
          FROM comp GROUP BY component),
cs AS (SELECT comp.node, sizes.cluster_size
       FROM comp JOIN sizes ON comp.component = sizes.component),
w AS (
  SELECT coalesce(e.label, '__none') AS label,
         coalesce(cs.cluster_size, 1) AS csz
  FROM embeddings e LEFT JOIN cs ON e.vec_id = cs.node
)
SELECT label, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN csz > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
       CAST(sum(10000 // csz) AS BIGINT) AS effective_size_tenk
FROM w GROUP BY label
""",
    "SoftDeDup-style soft deduplication: instead of DROPPING near-dups, "
    "weight every document by 1/|near-dup cluster| so a cluster of k "
    "copies contributes exactly one document's worth of sampling mass — "
    "the gentler alternative to dedup_keep_best when duplicates carry "
    "signal (recency, source diversity). Clusters come from the SAME "
    "bucketed embedding near-dup generator + connected components as "
    "neardup_components (never all-pairs); singletons never enter the "
    "pair machinery and default to weight 1 via a LEFT join. Weights are "
    "integer ten-thousandths (10000 div cluster_size) so the per-label "
    "effective-corpus-size sums hash identically cross-engine",
)
def q_soft_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.components import (
        component_summary,
        connected_components,
    )

    edges = QUERIES["embedding_neardup"].spark(spark, sf_dir).select("id_a", "id_b")
    # small-graph tier (same rationale + bound as corpus_curation): the
    # post-threshold pair set is tiny relative to the corpus, driver
    # union-find beats several fixed-overhead distributed rounds; above
    # 10^6 edges the distributed loop runs unchanged, labels identical
    cs = component_summary(
        connected_components(edges, collect_threshold=1_000_000)
    ).select(F.col("node").alias("vec_id"), "cluster_size")
    emb = t(spark, sf_dir, "embeddings").select("vec_id", "label")
    w = emb.join(cs, "vec_id", "left").select(
        F.coalesce("label", F.lit("__none")).alias("label"),
        F.coalesce("cluster_size", F.lit(1).cast("long")).alias("csz"),
    )
    return w.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("csz") > 1, 1).otherwise(0)).cast("long")
        .alias("n_dup_docs"),
        F.sum(F.expr("10000 div csz")).cast("long").alias("effective_size_tenk"),
    )


_GSPLIT_CASE_SQL = duck_split_80_10_10("CAST(rep AS VARCHAR) || '#gsplit'")


@q(
    "leakage_safe_split",
    f"""
WITH RECURSIVE {_GRAMS_CTE},
p AS (
  SELECT * FROM (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(CASE WHEN (len(a.grams) = 0 AND len(b.grams) = 0) THEN 0.0 ELSE
             CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
             / (CAST(len(a.grams) AS DOUBLE) + CAST(len(b.grams) AS DOUBLE)
                - CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)) END, 6)
             AS jaccard
    FROM g a JOIN g b ON a.doc_id < b.doc_id
  ) WHERE jaccard >= 0.5
),
sym AS (SELECT id_a AS a, id_b AS b FROM p
        UNION SELECT id_b, id_a FROM p),
reach(node, r) AS (
  SELECT DISTINCT a, a FROM sym
  UNION
  SELECT s2.b, reach.r FROM reach JOIN sym s2 ON s2.a = reach.node
),
comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node),
reps AS (
  SELECT d.doc_id, coalesce(c.component, d.doc_id) AS rep
  FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
),
s AS (SELECT doc_id, rep, {_GSPLIT_CASE_SQL} AS split FROM reps),
doc_agg AS (
  SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(count(DISTINCT rep) AS BIGINT) AS n_groups
  FROM s GROUP BY split
),
pair_agg AS (
  SELECT least(sa.split, sb.split) AS split,
         CAST(count(*) AS BIGINT) AS n_dup_pairs,
         CAST(sum(CASE WHEN sa.split <> sb.split THEN 1 ELSE 0 END) AS BIGINT)
           AS n_leaking
  FROM p JOIN s sa ON p.id_a = sa.doc_id JOIN s sb ON p.id_b = sb.doc_id
  GROUP BY least(sa.split, sb.split)
)
SELECT d.split, d.n_docs, d.n_groups,
       coalesce(pa.n_dup_pairs, 0) AS n_dup_pairs,
       coalesce(pa.n_leaking, 0) AS n_leaking
FROM doc_agg d LEFT JOIN pair_agg pa ON d.split = pa.split
""",
    "leakage-SAFE train/val/test split: split assignment is keyed on the "
    "near-dup COMPONENT representative (min doc_id of the connected "
    "component over the same jaccard >= 0.5 adaptive pair generator the "
    "audit query uses), not the document id — every member of a near-dup "
    "cluster lands in the same split BY CONSTRUCTION, so n_leaking is "
    "structurally zero (still computed honestly on both engines, not "
    "asserted). This is the FIX for what split_leakage_report measures: "
    "contaminated eval splits. Singleton docs (the vast majority) never "
    "enter the pair machinery — rep falls back to their own id via a "
    "LEFT join, so the extra cost over a naive hash split is only the "
    "dup-pair CC, which dedup already computes. Split hash is the "
    "engine-shared rolling hash on the rep id (80/10/10)",
)
def q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.functions.text import token_hash
    from fastembed_rs_spark.operators.components import connected_components
    from fastembed_rs_spark.operators.dedup import jaccard_pairs_adaptive

    docs = t(spark, sf_dir, "documents")
    pairs = jaccard_pairs_adaptive(
        docs, "doc_id", "text", n=3, threshold=0.5
    ).select("id_a", "id_b")
    # small-graph tier: see corpus_curation (bounded at 10^6 edges,
    # distributed loop above, labels identical either way)
    comp = connected_components(pairs, collect_threshold=1_000_000).select(
        F.col("node").alias("doc_id"), F.col("comp").alias("component")
    )
    reps = docs.select("doc_id").join(comp, "doc_id", "left").select(
        "doc_id", F.coalesce("component", "doc_id").alias("rep")
    )
    hh = token_hash(F.concat(F.col("rep").cast("string"), F.lit("#gsplit")))
    s = reps.withColumn("__sg_h", hh).select(
        "doc_id", "rep", split_80_10_10("__sg_h").alias("split")
    )
    doc_agg = s.groupBy("split").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("rep").cast("long").alias("n_groups"),
    )
    sa = s.select(F.col("doc_id").alias("id_a"), F.col("split").alias("__sa"))
    sb = s.select(F.col("doc_id").alias("id_b"), F.col("split").alias("__sb"))
    pair_agg = (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .groupBy(F.least("__sa", "__sb").alias("split"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_dup_pairs"),
            F.sum(F.when(F.col("__sa") != F.col("__sb"), 1).otherwise(0))
            .cast("long").alias("n_leaking"),
        )
    )
    return doc_agg.join(pair_agg, "split", "left").select(
        "split", "n_docs", "n_groups",
        F.coalesce("n_dup_pairs", F.lit(0).cast("long")).alias("n_dup_pairs"),
        F.coalesce("n_leaking", F.lit(0).cast("long")).alias("n_leaking"),
    )


def _ann_recall_oracle(
    k: int, iters: int, nq: int, nprobe: int, topk: int,
    dim: int = EMB_DIM, seed: int = 42,
) -> str:
    """Trained-IVF replay (``_ivf_train_ctes``) + probe top-k AND the
    brute-force ground-truth top-k, joined per probe query — recall@k of
    the approximate index, measured inside the engine."""
    ctes, prev = _ivf_train_ctes(k, iters, dim=dim, seed=seed)
    return ctes + f""",
assign AS (
  SELECT p.vec_id, p.v AS embedding, c.centroid_id,
         round({_dk_cos('p.v', 'c.cv')}, 6) AS cscore
  FROM pts p CROSS JOIN {prev} c
  QUALIFY row_number() OVER (PARTITION BY p.vec_id ORDER BY cscore DESC, c.centroid_id ASC) = 1
),
qv AS (SELECT vec_id AS query_id, v AS qe FROM pts WHERE vec_id < {nq}),
probes AS (
  SELECT qv.query_id, qv.qe, c.centroid_id,
         round({_dk_cos('qv.qe', 'c.cv')}, 6) AS pscore
  FROM qv CROSS JOIN {prev} c
  QUALIFY row_number() OVER (PARTITION BY qv.query_id ORDER BY pscore DESC, c.centroid_id ASC) <= {nprobe}
),
approx AS (
  SELECT query_id, vec_id FROM (
    SELECT p.query_id, a.vec_id, round({_dk_cos('p.qe', 'a.embedding')}, 6) AS score
    FROM probes p JOIN assign a ON p.centroid_id = a.centroid_id
  ) QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id ASC) <= {topk}
),
truth AS (
  SELECT query_id, vec_id FROM (
    SELECT qv.query_id, p.vec_id, round({_dk_cos('qv.qe', 'p.v')}, 6) AS score
    FROM qv CROSS JOIN pts p
  ) QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id ASC) <= {topk}
),
hits AS (
  SELECT t.query_id, CAST(count(*) AS BIGINT) AS n_hits
  FROM truth t JOIN approx a ON t.query_id = a.query_id AND t.vec_id = a.vec_id
  GROUP BY t.query_id
)
SELECT q.query_id, CAST({topk} AS BIGINT) AS n_true,
       coalesce(h.n_hits, 0) AS n_hits,
       coalesce(h.n_hits, 0) * 100 // {topk} AS recall_pct
FROM (SELECT DISTINCT query_id FROM qv) q
LEFT JOIN hits h ON q.query_id = h.query_id"""


@q(
    "ann_recall_eval",
    _ann_recall_oracle(k=8, iters=3, nq=20, nprobe=2, topk=10),
    "index-quality evaluation INSIDE the engine: recall@10 of the "
    "k-means-trained IVF index (nprobe=2) against brute-force ground "
    "truth, per probe query — the measurement you sample-run on a 100 TB "
    "index after every build/retrain to decide whether nprobe/k need "
    "retuning, here as a first-class catalog query (ANN_RECALL.md holds "
    "the offline ladder; this is the online spot-check). Ground truth is "
    "exact top-10 over a 20-query probe set (probe count is the knob "
    "that bounds the brute-force side at scale); both sides use the "
    "rounded-score/vec_id tie order so the hit join is deterministic "
    "cross-engine",
)
def q_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.topk import (
        cosine_top_k_fast,
        train_ivf_centroids,
    )

    emb = t(spark, sf_dir, "embeddings")
    centroids = train_ivf_centroids(emb, k=8, iters=3)
    bucketed = assign_ivf_buckets_fast(emb, centroids)
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    approx = ivf_top_k(
        queries, bucketed, centroids, k=10, nprobe=2, round_to=6
    ).select("query_id", "vec_id")
    # ground truth through the NumPy tile kernel: 20 probes x corpus via
    # the interpreted lambda fold was the dominant cost of this query
    truth = cosine_top_k_fast(queries, emb, k=10, round_to=6).select(
        "query_id", "vec_id"
    )
    hits = truth.join(approx, ["query_id", "vec_id"]).groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_hits")
    )
    base = queries.select("query_id").distinct()
    return base.join(hits, "query_id", "left").select(
        "query_id",
        F.lit(10).cast("long").alias("n_true"),
        F.coalesce("n_hits", F.lit(0).cast("long")).alias("n_hits"),
        F.expr("coalesce(n_hits, 0) * 100 div 10").cast("long").alias("recall_pct"),
    )


@q(
    "dedup_threshold_sweep",
    f"""
WITH p AS (
  SELECT * FROM (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round({_dk_cos('a.embedding', 'b.embedding')}, 6) AS score
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  ) WHERE score >= 0.2
),
p2 AS (SELECT id_a, id_b, CAST(round(score * 1000000) AS BIGINT) AS sm FROM p),
ts AS (SELECT unnest(generate_series(2, 9)) AS t),
pair_ct AS (
  SELECT ts.t, CAST(count(*) AS BIGINT) AS n_pairs
  FROM ts JOIN p2 ON p2.sm >= ts.t * 100000 GROUP BY ts.t
),
sym AS (SELECT id_a AS node, sm FROM p2 UNION ALL SELECT id_b, sm FROM p2),
doc_ct AS (
  SELECT ts.t, CAST(count(DISTINCT s.node) AS BIGINT) AS n_docs
  FROM ts JOIN sym s ON s.sm >= ts.t * 100000 GROUP BY ts.t
),
deg AS (
  SELECT ts.t, s.node, CAST(count(*) AS BIGINT) AS d
  FROM ts JOIN sym s ON s.sm >= ts.t * 100000 GROUP BY ts.t, s.node
),
deg_max AS (SELECT t, max(d) AS max_degree FROM deg GROUP BY t)
SELECT CAST(ts.t AS BIGINT) AS threshold_tenths,
       coalesce(pair_ct.n_pairs, 0) AS n_pairs,
       coalesce(doc_ct.n_docs, 0) AS n_docs,
       coalesce(deg_max.max_degree, 0) AS max_degree
FROM ts LEFT JOIN pair_ct ON ts.t = pair_ct.t
LEFT JOIN doc_ct ON ts.t = doc_ct.t
LEFT JOIN deg_max ON ts.t = deg_max.t
""",
    "dedup threshold calibration sweep: pair count, documents touched, "
    "and max node degree (hub / giant-cluster proxy) at every candidate "
    "cosine threshold 0.2..0.9 — the table you read BEFORE committing a "
    "100 TB dedup run to one tau (too low: the threshold graph grows a "
    "giant component and dedup eats the corpus; too high: dup clusters "
    "survive). ONE bucketed candidate-pair pass at the loosest threshold "
    "feeds every row: scores become exact integer micro-units, bucket = "
    "sm div 100000 (so 'score >= t/10' is an exact integer comparison, "
    "never a float-boundary trap), and the per-threshold aggregates are "
    "suffix-sums over the 8-bucket histograms — no per-threshold rescan. "
    "The per-(node,bucket) suffix table is the only n-sized intermediate; "
    "everything after is 8-row arithmetic",
)
def q_dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    pairs = D.embedding_near_dups_blocked(emb, threshold=0.2)
    b = pairs.select(
        "id_a", "id_b",
        F.least(
            F.expr("CAST(round(score * 1000000) AS BIGINT) div 100000"),
            F.lit(9).cast("long"),
        ).alias("bucket"),
    )
    # the big pair table is consumed EXACTLY ONCE, into the per-(node,
    # bucket) count table nb (≤ n·8 rows) — every sweep statistic below
    # derives from nb, so no persist of the pair table is needed:
    #   pairs per bucket = Σ_node nb.c / 2 (each pair contributes its
    #   bucket under BOTH endpoints in sym), docs per tau = nodes whose
    #   max bucket ≥ tau, degree at tau = per-node suffix-sum of nb.c
    sym = b.select(F.col("id_a").alias("node"), "bucket").unionAll(
        b.select(F.col("id_b").alias("node"), "bucket")
    )
    nb = sym.groupBy("node", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    ).localCheckpoint()  # small by construction; scanned by 3 branches
    grid = spark.range(2, 10).select(F.col("id").alias("t"))
    pair_hist = nb.groupBy("bucket").agg(
        F.expr("sum(c) div 2").alias("n")  # Σc is even: 2 endpoints/pair
    )
    pair_ct = (
        grid.join(pair_hist, pair_hist["bucket"] >= grid["t"])
        .groupBy("t").agg(F.sum("n").cast("long").alias("n_pairs"))
    )
    node_max = nb.groupBy("node").agg(F.max("bucket").alias("mb"))
    doc_hist = node_max.groupBy("mb").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    doc_ct = (
        grid.join(doc_hist, doc_hist["mb"] >= grid["t"])
        .groupBy("t").agg(F.sum("n").cast("long").alias("n_docs"))
    )
    w = (
        Window.partitionBy("node")
        .orderBy(F.col("bucket").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    suffix = nb.select("node", "bucket", F.sum("c").over(w).alias("deg"))
    bucket_max = suffix.groupBy("bucket").agg(F.max("deg").alias("mdeg"))
    deg_max = (
        grid.join(bucket_max, bucket_max["bucket"] >= grid["t"])
        .groupBy("t").agg(F.max("mdeg").cast("long").alias("max_degree"))
    )
    out = (
        grid.join(pair_ct, "t", "left")
        .join(doc_ct, "t", "left")
        .join(deg_max, "t", "left")
        .select(
            F.col("t").cast("long").alias("threshold_tenths"),
            F.coalesce("n_pairs", F.lit(0).cast("long")).alias("n_pairs"),
            F.coalesce("n_docs", F.lit(0).cast("long")).alias("n_docs"),
            F.coalesce("max_degree", F.lit(0).cast("long")).alias("max_degree"),
        )
    )
    return out


def _bucket_drift_oracle(k: int, iters: int, dim: int = EMB_DIM) -> str:
    """Trained-IVF assign replay + per-label PSI of bucket occupancy vs the
    whole-corpus bucket mix (same Laplace/nano-unit math as psi_drift)."""
    ctes, prev = _ivf_train_ctes(k, iters, dim=dim)
    return ctes + f""",
assign AS (
  SELECT p.vec_id, c.centroid_id,
         round({_dk_cos('p.v', 'c.cv')}, 6) AS cscore
  FROM pts p CROSS JOIN {prev} c
  QUALIFY row_number() OVER (PARTITION BY p.vec_id ORDER BY cscore DESC, c.centroid_id ASC) = 1
),
b AS (
  SELECT coalesce(e.label, '__none') AS label, a.centroid_id AS bucket
  FROM assign a JOIN embeddings e ON a.vec_id = e.vec_id
),
labels AS (SELECT DISTINCT label FROM b),
grid AS (
  SELECT labels.label, g.bucket
  FROM labels CROSS JOIN (SELECT unnest(generate_series(0, {k - 1})) AS bucket) g
),
rc AS (SELECT bucket, CAST(count(*) AS BIGINT) AS rcnt FROM b GROUP BY bucket),
rt AS (SELECT CAST(count(*) AS BIGINT) AS rtot FROM b),
cc AS (SELECT label, bucket, CAST(count(*) AS BIGINT) AS ccnt
       FROM b GROUP BY label, bucket),
ct AS (SELECT label, CAST(count(*) AS BIGINT) AS ctot FROM b GROUP BY label),
j AS (
  SELECT grid.label, grid.bucket,
         CAST(coalesce(rc.rcnt, 0) + 1 AS DOUBLE)
           / CAST(rt.rtot + {k} AS DOUBLE) AS p,
         CAST(coalesce(cc.ccnt, 0) + 1 AS DOUBLE)
           / CAST(ct.ctot + {k} AS DOUBLE) AS q
  FROM grid
  LEFT JOIN rc ON grid.bucket = rc.bucket
  LEFT JOIN cc ON grid.label = cc.label AND grid.bucket = cc.bucket
  JOIN ct ON grid.label = ct.label
  CROSS JOIN rt
),
terms AS (
  SELECT label, bucket, p, q,
         CAST(round((p - q) * ln(p / q) * 1000000000) AS BIGINT) AS nano
  FROM j
)
SELECT label, CAST(bucket AS BIGINT) AS bucket,
       round(p, 6) AS p_ref, round(q, 6) AS q_cmp,
       CAST(sum(nano) OVER (PARTITION BY label) AS BIGINT) AS psi_nano
FROM terms"""


@q(
    "embedding_bucket_drift",
    _bucket_drift_oracle(k=8, iters=3),
    "EMBEDDING-SPACE drift monitor: PSI of trained-IVF bucket occupancy "
    "per label vs the whole-corpus bucket mix — psi_drift watches a "
    "scalar's histogram, this watches where each slice actually lives in "
    "embedding space (a new crawl whose vectors pile into two buckets "
    "has drifted even when its length/quality scalars look unchanged — "
    "and it degrades ANN recall for exactly that slice, so this is also "
    "the 'retrain the index?' signal). The k-bucket histogram is the "
    "constant-size sufficient statistic: one train + one kernel assign "
    "pass over the corpus, then all PSI math runs on a labels x k grid "
    "of broadcast joins; per-bucket terms become exact integer "
    "nano-units before the per-label window sum (no order-dependent "
    "float accumulation)",
)
def q_embedding_bucket_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.topk import train_ivf_centroids

    k = 8
    emb = t(spark, sf_dir, "embeddings")
    centroids = train_ivf_centroids(emb, k=k, iters=3)
    assigned = assign_ivf_buckets_fast(emb, centroids)
    b = assigned.select(
        F.coalesce("label", F.lit("__none")).alias("label"),
        F.col("centroid_id").alias("bucket"),
    )
    labels = b.select("label").distinct()
    grid = labels.crossJoin(
        F.broadcast(
            spark.range(k).select(F.col("id").cast("int").alias("bucket"))
        )
    )
    rc = b.groupBy("bucket").agg(F.count(F.lit(1)).cast("long").alias("rcnt"))
    rt = b.agg(F.count(F.lit(1)).cast("long").alias("rtot"))
    cc = b.groupBy("label", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("ccnt")
    )
    ct = b.groupBy("label").agg(F.count(F.lit(1)).cast("long").alias("ctot"))
    j = (
        grid.join(F.broadcast(rc), "bucket", "left")
        .join(F.broadcast(cc), ["label", "bucket"], "left")
        .join(F.broadcast(ct), "label")
        .crossJoin(F.broadcast(rt))
        .select(
            "label", "bucket",
            (
                (F.coalesce("rcnt", F.lit(0)) + 1).cast("double")
                / (F.col("rtot") + k).cast("double")
            ).alias("p"),
            (
                (F.coalesce("ccnt", F.lit(0)) + 1).cast("double")
                / (F.col("ctot") + k).cast("double")
            ).alias("q"),
        )
    )
    terms = j.select(
        "label", "bucket", "p", "q",
        F.expr(
            "CAST(round((p - q) * ln(p / q) * 1000000000) AS BIGINT)"
        ).alias("nano"),
    )
    wl = Window.partitionBy("label")
    return terms.select(
        "label",
        F.col("bucket").cast("long").alias("bucket"),
        F.round("p", 6).alias("p_ref"),
        F.round("q", 6).alias("q_cmp"),
        F.sum("nano").over(wl).cast("long").alias("psi_nano"),
    )


@q(
    "cross_source_contamination",
    f"""
WITH {_GRAMS_CTE},
p AS (
  SELECT * FROM (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(CASE WHEN least(len(a.grams), len(b.grams)) = 0 THEN 0.0 ELSE
             CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
             / CAST(least(len(a.grams), len(b.grams)) AS DOUBLE) END, 6)
             AS containment
    FROM g a JOIN g b ON a.doc_id < b.doc_id
  ) WHERE containment >= 0.6
),
pm AS (
  SELECT p.id_a, p.id_b,
         CAST(round(p.containment * 1000000) AS BIGINT) AS cmicro,
         least(da.source, db.source) AS source_a,
         greatest(da.source, db.source) AS source_b
  FROM p
  JOIN documents da ON p.id_a = da.doc_id
  JOIN documents db ON p.id_b = db.doc_id
)
SELECT source_a, source_b,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(CASE WHEN source_a <> source_b THEN 1 ELSE 0 END) AS BIGINT)
         AS n_cross,
       CAST(sum(cmicro) AS BIGINT) // CAST(count(*) AS BIGINT)
         AS mean_containment_micro
FROM pm GROUP BY source_a, source_b
""",
    "cross-source contamination matrix: containment >= 0.6 near-dup "
    "pairs grouped by the (source_a, source_b) pair of corpora they "
    "connect — the audit that finds one source quoting/mirroring "
    "another (benchmark pages inside a crawl, wiki mirrors, syndicated "
    "boilerplate) BEFORE both sides are sampled into a training mix as "
    "'independent' data. Asymmetric containment is the right signal "
    "(the benchmark page is tiny next to the crawl page that embeds "
    "it; Jaccard would score it ~0). Pairs come from the same "
    "inverted-index postings join as containment_neardup (never "
    "all-pairs, zero-overlap pairs never materialize); the mean is "
    "integer micro-units floor-divided by the count so no "
    "order-dependent float sum crosses engines",
)
def q_cross_source_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.dedup import containment_pairs

    docs = t(spark, sf_dir, "documents")
    pairs = containment_pairs(docs, "doc_id", "text", n=3, threshold=0.6)
    src = docs.select("doc_id", "source")
    pm = (
        pairs.select(
            "id_a", "id_b",
            F.expr("CAST(round(containment * 1000000) AS BIGINT)").alias("cmicro"),
        )
        .join(
            src.select(F.col("doc_id").alias("id_a"), F.col("source").alias("__sa")),
            "id_a",
        )
        .join(
            src.select(F.col("doc_id").alias("id_b"), F.col("source").alias("__sb")),
            "id_b",
        )
        .select(
            F.least("__sa", "__sb").alias("source_a"),
            F.greatest("__sa", "__sb").alias("source_b"),
            "cmicro",
        )
    )
    return pm.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(
            F.when(F.col("source_a") != F.col("source_b"), 1).otherwise(0)
        ).cast("long").alias("n_cross"),
        F.expr(
            "CAST(sum(cmicro) AS BIGINT) div CAST(count(*) AS BIGINT)"
        ).alias("mean_containment_micro"),
    )


@q(
    "duplicate_cluster_profile",
    f"""
WITH RECURSIVE {_GRAMS_CTE},
p AS (
  SELECT * FROM (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(CASE WHEN (len(a.grams) = 0 AND len(b.grams) = 0) THEN 0.0 ELSE
             CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
             / (CAST(len(a.grams) AS DOUBLE) + CAST(len(b.grams) AS DOUBLE)
                - CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)) END, 6)
             AS jaccard
    FROM g a JOIN g b ON a.doc_id < b.doc_id
  ) WHERE jaccard >= 0.5
),
sym AS (SELECT id_a AS a, id_b AS b FROM p
        UNION SELECT id_b, id_a FROM p),
reach(node, r) AS (
  SELECT DISTINCT a, a FROM sym
  UNION
  SELECT s2.b, reach.r FROM reach JOIN sym s2 ON s2.a = reach.node
),
comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node)
SELECT comp.component,
       CAST(count(*) AS BIGINT) AS cluster_size,
       CAST(count(DISTINCT d.lang) AS BIGINT) AS n_langs,
       CAST(count(DISTINCT d.source) AS BIGINT) AS n_sources,
       CAST(min(d.n_chars) AS BIGINT) AS min_chars,
       CAST(max(d.n_chars) AS BIGINT) AS max_chars
FROM comp JOIN documents d ON comp.node = d.doc_id
GROUP BY comp.component
""",
    "duplicate-cluster profile: the 'what am I about to delete' report "
    "read between computing near-dup clusters and running the "
    "destructive keep-one pass at corpus scale — per cluster (keyed by "
    "its min-doc_id representative): size, how many languages and "
    "sources it spans, and its length range. A cluster spanning many "
    "sources is boilerplate/syndication (safe to collapse); one "
    "spanning languages flags a broken near-dup threshold or "
    "translations (maybe keep); a huge length range means the "
    "keep-best policy should prefer the long side. Clusters come from "
    "the same adaptive jaccard generator + min-label CC the dedup "
    "family shares; the profile is one join to the docs table + one "
    "grouped agg over cluster members only (singletons never appear)",
)
def q_duplicate_cluster_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.components import connected_components
    from fastembed_rs_spark.operators.dedup import jaccard_pairs_adaptive

    docs = t(spark, sf_dir, "documents")
    pairs = jaccard_pairs_adaptive(
        docs, "doc_id", "text", n=3, threshold=0.5
    ).select("id_a", "id_b")
    # small-graph tier: see corpus_curation (bounded at 10^6 edges,
    # distributed loop above, labels identical either way)
    comp = connected_components(pairs, collect_threshold=1_000_000).select(
        F.col("node").alias("doc_id"), F.col("comp").alias("component")
    )
    return (
        comp.join(docs.select("doc_id", "lang", "source", "n_chars"), "doc_id")
        .groupBy("component")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cluster_size"),
            F.countDistinct("lang").cast("long").alias("n_langs"),
            F.countDistinct("source").cast("long").alias("n_sources"),
            F.min("n_chars").cast("long").alias("min_chars"),
            F.max("n_chars").cast("long").alias("max_chars"),
        )
    )


def _probe_sweep_oracle(
    k: int, iters: int, nq: int, topk: int, dim: int = EMB_DIM,
) -> str:
    """Trained-IVF replay + the full probe-rank table (every query ×
    every centroid, ranked), then recall/cost at every nprobe as
    suffix-sums over the per-rank histograms — the ann_recall_eval
    measurement at ALL nprobe settings out of one pass."""
    ctes, prev = _ivf_train_ctes(k, iters, dim=dim)
    return ctes + f""",
assign AS (
  SELECT p.vec_id, c.centroid_id,
         round({_dk_cos('p.v', 'c.cv')}, 6) AS cscore
  FROM pts p CROSS JOIN {prev} c
  QUALIFY row_number() OVER (PARTITION BY p.vec_id ORDER BY cscore DESC, c.centroid_id ASC) = 1
),
sizes AS (SELECT centroid_id, CAST(count(*) AS BIGINT) AS bsize
          FROM assign GROUP BY centroid_id),
qv AS (SELECT vec_id AS query_id, v AS qe FROM pts WHERE vec_id < {nq}),
pr AS (
  SELECT qv.query_id, c.centroid_id,
         row_number() OVER (PARTITION BY qv.query_id
                            ORDER BY round({_dk_cos('qv.qe', 'c.cv')}, 6) DESC,
                                     c.centroid_id ASC) AS pr
  FROM qv CROSS JOIN {prev} c
),
truth AS (
  SELECT query_id, vec_id FROM (
    SELECT qv.query_id, p.vec_id, round({_dk_cos('qv.qe', 'p.v')}, 6) AS score
    FROM qv CROSS JOIN pts p
  ) QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id ASC) <= {topk}
),
tr AS (
  SELECT p.pr FROM truth t
  JOIN assign a ON t.vec_id = a.vec_id
  JOIN pr p ON p.query_id = t.query_id AND p.centroid_id = a.centroid_id
),
hit_hist AS (SELECT pr, CAST(count(*) AS BIGINT) AS c FROM tr GROUP BY pr),
cost_hist AS (
  SELECT p.pr, CAST(sum(s.bsize) AS BIGINT) AS s
  FROM pr p JOIN sizes s ON p.centroid_id = s.centroid_id GROUP BY p.pr
),
grid AS (SELECT CAST(unnest(generate_series(1, {k})) AS BIGINT) AS nprobe)
SELECT g.nprobe,
       coalesce(h.n, 0) AS n_hits,
       coalesce(h.n, 0) * 1000000 // {nq * topk} AS recall_micro,
       coalesce(cc.s, 0) AS total_candidates,
       coalesce(cc.s, 0) // {nq} AS avg_candidates
FROM grid g
LEFT JOIN (SELECT g2.nprobe, CAST(sum(hh.c) AS BIGINT) AS n
           FROM grid g2 JOIN hit_hist hh ON hh.pr <= g2.nprobe
           GROUP BY g2.nprobe) h ON g.nprobe = h.nprobe
LEFT JOIN (SELECT g3.nprobe, CAST(sum(ch.s) AS BIGINT) AS s
           FROM grid g3 JOIN cost_hist ch ON ch.pr <= g3.nprobe
           GROUP BY g3.nprobe) cc ON g.nprobe = cc.nprobe"""


@q(
    "ann_probe_sweep",
    _probe_sweep_oracle(k=8, iters=3, nq=20, topk=10),
    "nprobe calibration sweep: recall@10 AND candidate-scan cost of the "
    "trained IVF index at EVERY nprobe 1..k, out of ONE assignment pass — "
    "the recall/latency frontier you read before pinning the serving "
    "nprobe on a 100 TB index (ann_recall_eval spot-checks one setting; "
    "this prices all of them). The trick mirrors dedup_threshold_sweep: "
    "rank all k centroids once per probe query, locate each true "
    "neighbor's bucket on that ranking, and every per-nprobe stat becomes "
    "a suffix-sum over two k-row histograms (hits-at-rank, bucket-size-"
    "at-rank) — no per-nprobe re-search, so the sweep costs the same as "
    "a single evaluation. recall_micro/avg_candidates are integer "
    "floor-divisions — exact cross-engine",
)
def q_ann_probe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.topk import (
        cosine_top_k_fast,
        train_ivf_centroids,
    )

    k, nq, topk = 8, 20, 10
    emb = t(spark, sf_dir, "embeddings")
    centroids = train_ivf_centroids(emb, k=k, iters=3)
    # the (vec_id, centroid_id) table feeds BOTH the bucket-size histogram
    # and the truth-rank join; localCheckpoint the 2-int-per-row table so
    # the kernel assign runs once, not twice (small by construction)
    assigned = assign_ivf_buckets_fast(emb, centroids).select(
        "vec_id", "centroid_id"
    ).localCheckpoint()
    sizes = assigned.groupBy("centroid_id").agg(
        F.count(F.lit(1)).cast("long").alias("bsize")
    )
    queries = emb.filter(F.col("vec_id") < nq).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.desc("__ps"), F.asc("centroid_id")
    )
    pr = (
        queries.crossJoin(F.broadcast(centroids))
        .select(
            "query_id", "centroid_id",
            F.round(cosine_similarity("query_vec", "centroid_vec"), 6)
            .alias("__ps"),
        )
        .withColumn("pr", F.row_number().over(wq))
        .select("query_id", "centroid_id", "pr")
    )
    truth = cosine_top_k_fast(queries, emb, k=topk, round_to=6).select(
        "query_id", "vec_id"
    )
    tr = truth.join(assigned, "vec_id").join(pr, ["query_id", "centroid_id"])
    hit_hist = tr.groupBy("pr").agg(F.count(F.lit(1)).cast("long").alias("c"))
    cost_hist = pr.join(F.broadcast(sizes), "centroid_id").groupBy("pr").agg(
        F.sum("bsize").cast("long").alias("s")
    )
    grid = spark.range(1, k + 1).select(F.col("id").alias("nprobe"))
    hits = (
        grid.join(hit_hist, hit_hist["pr"] <= grid["nprobe"])
        .groupBy("nprobe").agg(F.sum("c").cast("long").alias("nh"))
    )
    cands = (
        grid.join(cost_hist, cost_hist["pr"] <= grid["nprobe"])
        .groupBy("nprobe").agg(F.sum("s").cast("long").alias("cs"))
    )
    return (
        grid.join(hits, "nprobe", "left")
        .join(cands, "nprobe", "left")
        .select(
            "nprobe",
            F.coalesce("nh", F.lit(0).cast("long")).alias("n_hits"),
            F.expr(f"coalesce(nh, 0) * 1000000 div {nq * topk}")
            .cast("long").alias("recall_micro"),
            F.coalesce("cs", F.lit(0).cast("long")).alias("total_candidates"),
            F.expr(f"coalesce(cs, 0) div {nq}")
            .cast("long").alias("avg_candidates"),
        )
    )


def _pq_recon_oracle(m: int, dsub: int, k: int, iters: int) -> str:
    """Trained-PQ replay through ``enc`` (which carries the winning squared
    L2 distance), then per-subspace distortion + code-utilization stats."""
    ctes, _ = _pq_train_enc_ctes(m, dsub, k, iters)
    return ctes + """,
counts AS (
  SELECT subspace, code_id, CAST(count(*) AS BIGINT) AS c
  FROM enc GROUP BY subspace, code_id
),
per AS (
  SELECT subspace, CAST(sum(c) AS BIGINT) AS n_vectors,
         CAST(count(*) AS BIGINT) AS codes_used,
         CAST(max(c) AS BIGINT) AS max_c
  FROM counts GROUP BY subspace
),
sse AS (
  SELECT subspace,
         CAST(sum(CAST(round(d2 * 1000000) AS BIGINT)) AS BIGINT) AS sse_micro
  FROM enc GROUP BY subspace
)
SELECT CAST(per.subspace AS BIGINT) AS subspace, per.n_vectors,
       sse.sse_micro,
       sse.sse_micro // per.n_vectors AS mse_micro,
       per.codes_used,
       per.max_c * 1000 // per.n_vectors AS max_code_share_permille
FROM per JOIN sse ON per.subspace = sse.subspace"""


@q(
    "pq_reconstruction_error",
    _pq_recon_oracle(m=_PQ_M, dsub=_PQ_DSUB, k=8, iters=2),
    "PQ codebook QA: per-subspace reconstruction error (SSE/MSE of each "
    "subvector vs its winning code) plus code utilization (codes actually "
    "used, largest code's occupancy share) for the trained m=8/k=8 "
    "codebooks — the report you read before committing a 100 TB corpus "
    "to one PQ config: high MSE in one subspace means that dimension "
    "block needs more codes (or OPQ rotation), a code hogging the "
    "occupancy means dead codes and wasted bits, and this table is what "
    "the m/nbits decision is actually made from. The argmin encode "
    "already computes the winning distance, so the error column is free "
    "(pq_encode keep_error=True) — one training + one encode scan, then "
    "an m-row aggregate; errors become exact integer micro-units before "
    "summation so no float accumulation order crosses engines",
)
def q_pq_reconstruction_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators import pq

    emb = t(spark, sf_dir, "embeddings")
    books = pq.train_pq_codebooks(
        emb, "vec_id", "embedding", m=_PQ_M, dsub=_PQ_DSUB, k=8, iters=2
    )
    enc = pq.pq_encode(
        emb, books, "vec_id", "embedding", m=_PQ_M, dsub=_PQ_DSUB,
        keep_error=True,
    ).select(
        "subspace", "code_id",
        F.expr("CAST(round(d2 * 1000000) AS BIGINT)").alias("__e"),
    )
    counts = enc.groupBy("subspace", "code_id").agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.sum("__e").cast("long").alias("se"),
    )
    return (
        counts.groupBy("subspace")
        .agg(
            F.sum("c").cast("long").alias("n_vectors"),
            F.count(F.lit(1)).cast("long").alias("codes_used"),
            F.max("c").cast("long").alias("__max_c"),
            F.sum("se").cast("long").alias("sse_micro"),
        )
        .select(
            F.col("subspace").cast("long").alias("subspace"),
            "n_vectors", "sse_micro",
            F.expr("sse_micro div n_vectors").alias("mse_micro"),
            "codes_used",
            F.expr("__max_c * 1000 div n_vectors")
            .alias("max_code_share_permille"),
        )
    )


def _scurve_micro(jm: str, b: int, r: int, div: str) -> str:
    """LSH S-curve P(candidate | jaccard) = 1-(1-j^r)^b in EXACT integer
    micro-unit fixed point: ``jm`` is jaccard in micro-units (BIGINT), every
    power step is multiply-then-floor-divide by 1e6, so both engines walk
    the identical integer sequence — no pow(), no float accumulation, no
    half-even boundary. ``div`` is the engine's integer-division token
    ('div' Spark, '//' DuckDB). Max intermediate is 1e6*1e6 = 1e12 << int64."""
    s = 1_000_000
    acc = jm
    for _ in range(r - 1):
        acc = f"(({acc} * {jm}) {div} {s})"
    miss = f"({s} - {acc})"
    acc_b = miss
    for _ in range(b - 1):
        acc_b = f"(({acc_b} * {miss}) {div} {s})"
    return f"({s} - {acc_b})"


_BAND_CONFIGS = ((16, 1), (8, 2), (4, 4), (2, 8), (1, 16))


def _band_curve_oracle() -> str:
    selects = []
    for b, r in _BAND_CONFIGS:
        p = _scurve_micro("jm", b, r, "//")
        selects.append(f"""
SELECT CAST({b} AS BIGINT) AS bands, CAST({r} AS BIGINT) AS rows_per_band,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(CASE WHEN jm >= 500000 THEN 1 ELSE 0 END) AS BIGINT) AS n_true_pairs,
       CAST(sum({p}) AS BIGINT) AS exp_candidates_micro,
       CAST(sum(CASE WHEN jm >= 500000 THEN 1000000 - {p} ELSE 0 END) AS BIGINT) AS exp_missed_true_micro
FROM base""")
    return (
        _minhash_cand_ctes()
        + """,
base AS (
  SELECT CAST(round(jaccard * 1000000) AS BIGINT) AS jm
  FROM verified WHERE jaccard >= 0.1
)"""
        + "\nUNION ALL".join(selects)
    )


@q(
    "minhash_band_curve",
    _band_curve_oracle(),
    "LSH band-configuration planning table: for every way to split the 16 "
    "minhashes into (bands × rows) — (16,1) (8,2) (4,4) (2,8) (1,16) — "
    "the expected candidate volume and the expected TRUE near-dup pairs "
    "missed, evaluated against the MEASURED pair-similarity distribution "
    "of this corpus (the verified LSH pairs at a 0.1 floor), not a "
    "textbook prior. This is the table you read before re-banding a "
    "100 TB dedup run: more rows/band sharpens the S-curve (fewer junk "
    "candidates, more missed borderline dups) and the right answer "
    "depends on where YOUR corpus's similarity mass sits. The S-curve "
    "1-(1-j^r)^b is evaluated in exact integer micro-unit fixed point "
    "(multiply + floor-div chains, no pow()) so both engines walk "
    "identical integer sequences; one pair scan feeds all five configs",
)
def q_minhash_band_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.fast_text import (
        minhash_signatures_fast,
        verify_candidates_fast,
    )

    docs = t(spark, sf_dir, "documents")
    sigs = minhash_signatures_fast(docs, "doc_id", "text", k_shingle=5)
    cand = D.lsh_candidate_pairs(sigs, "doc_id", bands=4, rows_per_band=4)
    pairs = verify_candidates_fast(
        cand, docs, "doc_id", "text", k_shingle=5, threshold=0.1
    )
    base = pairs.select(
        F.expr("CAST(round(jaccard * 1000000) AS BIGINT)").alias("jm")
    )
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(F.when(F.col("jm") >= 500000, 1).otherwise(0))
        .cast("long").alias("n_true_pairs"),
    ]
    for b, r in _BAND_CONFIGS:
        p = _scurve_micro("jm", b, r, "div")
        aggs.append(
            F.expr(f"CAST(sum({p}) AS BIGINT)").alias(f"__e_{b}_{r}")
        )
        aggs.append(
            F.expr(
                f"CAST(sum(CASE WHEN jm >= 500000 THEN 1000000 - {p} "
                f"ELSE 0 END) AS BIGINT)"
            ).alias(f"__m_{b}_{r}")
        )
    one = base.agg(*aggs)
    stack_args = ", ".join(
        f"CAST({b} AS BIGINT), CAST({r} AS BIGINT), __e_{b}_{r}, __m_{b}_{r}"
        for b, r in _BAND_CONFIGS
    )
    return one.select(
        F.expr(
            f"stack({len(_BAND_CONFIGS)}, {stack_args}) AS "
            "(bands, rows_per_band, exp_candidates_micro, "
            "exp_missed_true_micro)"
        ),
        "n_pairs", "n_true_pairs",
    )


_LADDER_KS = (1, 2, 4, 8)


def _kmeans_ladder_oracle(iters: int, dim: int = EMB_DIM) -> str:
    """Four chained trainings (prefixed CTEs, shared pts/dims, same seed →
    nested inits), one cosine-argmax assign + L2-SSE aggregate per k, then
    the raw-energy row and explained shares."""
    first_k = _LADDER_KS[0]
    sql, prev = _ivf_train_ctes(first_k, iters, dim=dim, prefix=f"t{first_k}_")
    finals = {first_k: prev}
    for kk in _LADDER_KS[1:]:
        frag, prev = _ivf_train_ctes(
            kk, iters, dim=dim, prefix=f"t{kk}_", standalone=False
        )
        sql += frag
        finals[kk] = prev
    parts = [sql]
    for kk in _LADDER_KS:
        parts.append(f""",
s{kk} AS (
  SELECT CAST({kk} AS BIGINT) AS k,
         CAST(sum(CAST(round(round({_dk_sqdist('x.v', 'x.cv')}, 6) * 1000000)
                       AS BIGINT)) AS BIGINT) AS sse_micro
  FROM (
    SELECT p.v, c.cv
    FROM pts p CROSS JOIN {finals[kk]} c
    QUALIFY row_number() OVER (PARTITION BY p.vec_id
                               ORDER BY round({_dk_cos('p.v', 'c.cv')}, 6) DESC,
                                        c.centroid_id ASC) = 1
  ) x
)""")
    parts.append(f""",
s0 AS (
  SELECT CAST(0 AS BIGINT) AS k,
         CAST(sum(CAST(round(round({_dk_dot('v', 'v')}, 6) * 1000000)
                       AS BIGINT)) AS BIGINT) AS sse_micro
  FROM pts
),
ladder AS (SELECT * FROM s0{''.join(f' UNION ALL SELECT * FROM s{kk}' for kk in _LADDER_KS)})
SELECT l.k, l.sse_micro,
       (s0.sse_micro - l.sse_micro) * 1000 // s0.sse_micro
         AS explained_permille
FROM ladder l CROSS JOIN s0""")
    return "".join(parts)


@q(
    "kmeans_distortion_ladder",
    _kmeans_ladder_oracle(iters=3),
    "rate-distortion ladder for the IVF coarse quantizer: L2 "
    "reconstruction SSE of the corpus against trained centroids at k = "
    "1, 2, 4, 8 (plus the raw-energy k=0 row), with the share of corpus "
    "energy each k explains — the elbow curve you read before choosing "
    "the coarse-quantizer size for a 100 TB index (too few centroids: "
    "buckets don't separate and nprobe must grow; doubling k past the "
    "elbow buys permille while doubling the centroid scan). All four "
    "trainings share one seed (inits are nested prefixes of the same "
    "hash ordering) and replay in the oracle as prefixed chained CTEs "
    "off one shared pts scan; Spark side trains all four configs JOINTLY "
    "(one kernel pass per Lloyd's iteration scores every config, "
    "bit-identical to per-k training) and one joint pass assigns them "
    "all, so the ladder costs ~one training; energies become "
    "exact integer micro-units before summation. Complements "
    "pq_reconstruction_error (subspace codes) and ann_probe_sweep "
    "(recall/cost at fixed k) as the third leg of the index-design "
    "calibration set",
)
def q_kmeans_distortion_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.functions.vector import dot_fixed
    from fastembed_rs_spark.operators.fast_vector import pairwise_cosine_fast
    from fastembed_rs_spark.operators.pq import _sq_dist_fixed
    from fastembed_rs_spark.operators.topk import (
        _MULTI_K_STRIDE,
        argmax_assign,
        train_ivf_centroids_multi,
    )

    emb = t(spark, sf_dir, "embeddings")
    # all four trainings share each iteration's kernel pass (bit-identical
    # to per-k training, pinned by test), and the final assign scores all
    # four configs in ONE corpus × Σk pass too — the ladder costs ~one
    # training, not four
    cents = train_ivf_centroids_multi(emb, ks=_LADDER_KS, iters=3)
    crows = cents.collect()  # Σk = 15 rows — constant by construction
    targets = [
        (r["k"] * _MULTI_K_STRIDE + r["centroid_id"], list(r["centroid_vec"]))
        for r in crows
    ]
    scored = pairwise_cosine_fast(
        emb.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("__v")
        ),
        "vec_id", "__v", targets,
        target_id_name="__tid", score_name="__raw",
    ).select(
        "vec_id",
        F.expr(f"CAST(__tid div {_MULTI_K_STRIDE} AS INT)").alias("__k"),
        F.expr(f"CAST(__tid % {_MULTI_K_STRIDE} AS INT)").alias("centroid_id"),
        F.round("__raw", 6).alias("__cscore"),
    )
    best = argmax_assign(
        scored, keys=["vec_id", "__k"], choice_col="centroid_id",
        score_col="__cscore", carry=[],
    )
    d2 = (
        best.join(
            F.broadcast(cents.withColumnRenamed("k", "__k")),
            ["__k", "centroid_id"],
        )
        .join(emb.select("vec_id", "embedding"), "vec_id")
        .select(
            "__k",
            F.round(
                _sq_dist_fixed("embedding", "centroid_vec", EMB_DIM), 6
            ).alias("__d2"),
        )
    )
    per_k = d2.groupBy("__k").agg(
        F.sum(F.expr("CAST(round(__d2 * 1000000) AS BIGINT)"))
        .cast("long").alias("sse_micro")
    ).select(F.col("__k").cast("long").alias("k"), "sse_micro")
    raw = (
        emb.select(
            F.round(dot_fixed("embedding", "embedding", EMB_DIM), 6)
            .alias("__d2")
        )
        .agg(
            F.sum(F.expr("CAST(round(__d2 * 1000000) AS BIGINT)"))
            .cast("long").alias("sse_micro")
        )
        .select(F.lit(0).cast("long").alias("k"), "sse_micro")
    )
    ladder = raw.unionAll(per_k)
    base = raw.select(F.col("sse_micro").alias("__sse0"))
    return ladder.crossJoin(F.broadcast(base)).select(
        "k", "sse_micro",
        F.expr("(__sse0 - sse_micro) * 1000 div __sse0")
        .alias("explained_permille"),
    )


_PACK_SWEEP_LENS = (64, 128, 256, 512, 1024)


@q(
    "packing_efficiency_sweep",
    f"""
WITH hist AS (
  SELECT CAST(len({duck_tokens('text')}) AS BIGINT) AS len,
         CAST(count(*) AS BIGINT) AS n
  FROM documents
  WHERE len({duck_tokens('text')}) > 0
  GROUP BY len
),
grid AS (SELECT CAST(unnest(ARRAY{list(_PACK_SWEEP_LENS)}) AS BIGINT) AS max_len),
agg AS (
  SELECT g.max_len,
         CAST(sum(h.n) AS BIGINT) AS n_docs,
         CAST(sum(h.len * h.n) AS BIGINT) AS total_tokens,
         CAST(sum(CASE WHEN h.len > g.max_len THEN h.n ELSE 0 END) AS BIGINT)
           AS n_docs_over,
         CAST(sum(CASE WHEN h.len > g.max_len
                       THEN (h.len - g.max_len) * h.n ELSE 0 END) AS BIGINT)
           AS tokens_truncated,
         CAST(sum(least(h.len, g.max_len) * h.n) AS BIGINT) AS kept
  FROM grid g CROSS JOIN hist h
  GROUP BY g.max_len
)
SELECT max_len, n_docs, total_tokens, n_docs_over, tokens_truncated,
       n_docs * max_len - kept AS pad_waste,
       kept * 1000 // (n_docs * max_len) AS pad_efficiency_permille,
       (total_tokens + max_len - 1) // max_len AS n_seqs_concat,
       total_tokens * 1000
         // (((total_tokens + max_len - 1) // max_len) * max_len)
         AS concat_efficiency_permille
FROM agg
""",
    "sequence-length planning sweep: for every candidate max_len (64.."
    "1024), the cost of BOTH packing strategies out of ONE token-count "
    "scan — pad-per-doc (docs over the limit, tokens truncated, pad "
    "waste, slot efficiency) vs concat-and-chunk (sequences needed, "
    "tail-only waste) — the table you read before committing a 100 TB "
    "tokenization run to a context length, because the answer depends "
    "on YOUR corpus's length distribution, not a rule of thumb. The "
    "corpus is consumed exactly once into a (length -> count) histogram "
    "(bounded by distinct lengths, not docs); every sweep row is "
    "arithmetic over that histogram joined to a constant grid — no "
    "per-max_len rescan, and every output is an exact integer "
    "(floor-div permille), so the table is bit-identical cross-engine. "
    "Zero-token docs are excluded (they pack to nothing, matching "
    "sequence_packing)",
)
def q_packing_efficiency_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.functions.text import tokens

    docs = t(spark, sf_dir, "documents")
    hist = (
        docs.select(F.size(tokens("text")).cast("long").alias("len"))
        .filter(F.col("len") > 0)
        .groupBy("len")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    grid = spark.createDataFrame(
        [(int(m),) for m in _PACK_SWEEP_LENS], "max_len long"
    )
    agg = (
        grid.crossJoin(F.broadcast(hist))
        .groupBy("max_len")
        .agg(
            F.sum("n").cast("long").alias("n_docs"),
            F.sum(F.col("len") * F.col("n")).cast("long").alias("total_tokens"),
            F.sum(F.when(F.col("len") > F.col("max_len"), F.col("n"))
                  .otherwise(0)).cast("long").alias("n_docs_over"),
            F.sum(
                F.when(
                    F.col("len") > F.col("max_len"),
                    (F.col("len") - F.col("max_len")) * F.col("n"),
                ).otherwise(0)
            ).cast("long").alias("tokens_truncated"),
            F.sum(F.least("len", "max_len") * F.col("n"))
            .cast("long").alias("__kept"),
        )
    )
    return agg.select(
        "max_len", "n_docs", "total_tokens", "n_docs_over", "tokens_truncated",
        (F.col("n_docs") * F.col("max_len") - F.col("__kept"))
        .cast("long").alias("pad_waste"),
        F.expr("__kept * 1000 div (n_docs * max_len)")
        .cast("long").alias("pad_efficiency_permille"),
        F.expr("(total_tokens + max_len - 1) div max_len")
        .cast("long").alias("n_seqs_concat"),
        F.expr(
            "total_tokens * 1000 div "
            "(((total_tokens + max_len - 1) div max_len) * max_len)"
        ).cast("long").alias("concat_efficiency_permille"),
    )


@q(
    "source_overlap_matrix",
    f"""
WITH hs AS (
  SELECT DISTINCT source,
         (({duck_token_hash('token')} * 2654435761) % {_KMV_MIX_MOD}) AS h
  FROM (SELECT source, unnest({duck_tokens('text')}) AS token FROM documents)
),
sk AS (
  SELECT source, h FROM hs
  QUALIFY row_number() OVER (PARTITION BY source ORDER BY h) <= {_KMV_K}
),
srcs AS (SELECT DISTINCT source FROM hs),
pr AS (
  SELECT a.source AS source_a, b.source AS source_b
  FROM srcs a JOIN srcs b ON a.source < b.source
),
cand AS (
  SELECT p.source_a, p.source_b, s.h,
         CASE WHEN s.source = p.source_a THEN 1 ELSE 0 END AS ina,
         CASE WHEN s.source = p.source_b THEN 1 ELSE 0 END AS inb
  FROM pr p JOIN sk s ON s.source = p.source_a OR s.source = p.source_b
),
grp AS (
  SELECT source_a, source_b, h,
         CAST(max(ina) AS BIGINT) AS ina, CAST(max(inb) AS BIGINT) AS inb
  FROM cand GROUP BY source_a, source_b, h
),
topu AS (
  SELECT * FROM grp
  QUALIFY row_number() OVER (PARTITION BY source_a, source_b ORDER BY h)
          <= {_KMV_K}
),
est AS (
  SELECT source_a, source_b,
         CAST(count(*) AS BIGINT) AS kk,
         CAST(max(h) AS BIGINT) AS hk,
         CAST(sum(ina * inb) AS BIGINT) AS n_both
  FROM topu GROUP BY source_a, source_b
),
act AS (
  SELECT p.source_a, p.source_b, CAST(count(*) AS BIGINT) AS actual_overlap
  FROM pr p
  JOIN hs a ON a.source = p.source_a
  JOIN hs b ON b.source = p.source_b AND a.h = b.h
  GROUP BY p.source_a, p.source_b
)
SELECT est.source_a, est.source_b, est.kk, est.n_both,
       round(CASE WHEN est.kk < {_KMV_K} THEN CAST(est.kk AS DOUBLE)
             ELSE ({_KMV_K} - 1) * CAST({_KMV_MIX_MOD} AS DOUBLE)
                  / CAST(est.hk AS DOUBLE) END, 4) AS est_union,
       round(CAST(est.n_both AS DOUBLE) / CAST(est.kk AS DOUBLE), 6)
         AS est_jaccard,
       coalesce(act.actual_overlap, 0) AS actual_overlap
FROM est
LEFT JOIN act ON est.source_a = act.source_a AND est.source_b = act.source_b
""",
    "pairwise source-overlap atlas: KMV-sketch estimates of token-"
    "vocabulary union and Jaccard for EVERY pair of sources, next to the "
    "exact overlap audit — the corpus-composition map you build before "
    "mixing N crawls/dumps into one training set (two sources sharing "
    "most of their vocabulary are probably the same crawl twice; "
    "cross_source_contamination finds shared DOCUMENTS, this finds "
    "shared LANGUAGE/domain at source granularity). The scale shape is "
    "sketch-first: one scan distills each source to a 256-value KMV "
    "sketch (per-source top-k window), pairwise math then runs on "
    "sources^2 x 256 sketch rows — never on the vocabularies themselves; "
    "the union sketch of a pair is the k smallest of the two sketches' "
    "union (exactly the Beyer et al. combine join_size_estimate pins for "
    "one pair). The exact-audit column is the one piece that scans full "
    "vocabularies — it is the accuracy check you sample at 100 TB, not "
    "run exhaustively",
)
def q_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.functions.text import token_hash, tokens

    docs = t(spark, sf_dir, "documents")
    hs = (
        docs.select("source", F.explode(tokens("text")).alias("token"))
        .select(
            "source",
            ((token_hash(F.col("token")) * 2654435761) % _KMV_MIX_MOD)
            .alias("h"),
        )
        .distinct()
    )
    wsk = Window.partitionBy("source").orderBy("h")
    sk = (
        hs.withColumn("__rn", F.row_number().over(wsk))
        .filter(F.col("__rn") <= _KMV_K)
        .select("source", "h")
    )
    srcs = hs.select("source").distinct()
    pr = (
        srcs.select(F.col("source").alias("source_a"))
        .join(
            srcs.select(F.col("source").alias("source_b")),
            F.col("source_a") < F.col("source_b"),
        )
    )
    cand = pr.join(
        F.broadcast(sk),
        (F.col("source") == F.col("source_a"))
        | (F.col("source") == F.col("source_b")),
    ).select(
        "source_a", "source_b", "h",
        (F.col("source") == F.col("source_a")).cast("int").alias("ina"),
        (F.col("source") == F.col("source_b")).cast("int").alias("inb"),
    )
    grp = cand.groupBy("source_a", "source_b", "h").agg(
        F.max("ina").cast("long").alias("ina"),
        F.max("inb").cast("long").alias("inb"),
    )
    wp = Window.partitionBy("source_a", "source_b").orderBy("h")
    topu = (
        grp.withColumn("__rn", F.row_number().over(wp))
        .filter(F.col("__rn") <= _KMV_K)
    )
    est = topu.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).cast("long").alias("kk"),
        F.max("h").cast("long").alias("hk"),
        F.sum(F.col("ina") * F.col("inb")).cast("long").alias("n_both"),
    )
    ha = hs.select(F.col("source").alias("source_a"), "h")
    hb = hs.select(F.col("source").alias("source_b"), "h")
    act = (
        ha.join(hb, "h")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("actual_overlap"))
    )
    return est.join(act, ["source_a", "source_b"], "left").select(
        "source_a", "source_b", "kk", "n_both",
        F.round(
            F.when(
                F.col("kk") < _KMV_K, F.col("kk").cast("double")
            ).otherwise(
                F.lit(float(_KMV_K - 1))
                * F.lit(float(_KMV_MIX_MOD))
                / F.col("hk").cast("double")
            ),
            4,
        ).alias("est_union"),
        F.round(
            F.col("n_both").cast("double") / F.col("kk").cast("double"), 6
        ).alias("est_jaccard"),
        F.coalesce("actual_overlap", F.lit(0).cast("long"))
        .alias("actual_overlap"),
    )


_PROFILE_COLS = (
    "o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderdate", "o_orderpriority",
)


@q(
    "table_profile",
    "\nUNION ALL".join(
        f"""
SELECT '{c}' AS column_name, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(CASE WHEN count(*) = 0 THEN 0
            ELSE count({c}) * 1000 // count(*) END AS BIGINT)
         AS fill_permille
FROM orders""" for c in _PROFILE_COLS
    ),
    "Deequ-style data-profiling pass over the orders table: per column, "
    "row count, null count, EXACT distinct count and fill rate — the "
    "completeness/uniqueness table a warehouse publishes per ingest batch "
    "(a fill_permille drop or an n_distinct collapse is how schema drift "
    "and broken upstream joins actually surface). One scan: Spark "
    "evaluates all six count(DISTINCT) in a single aggregate (Expand with "
    "one projection per distinct column — the native multi-distinct "
    "plan, still one pass over the files), then stack() unpivots the "
    "1-row aggregate into the per-column report. At 100 TB you swap the "
    "exact distincts for approx_count_distinct per column (the HLL "
    "machinery next door in hll_distinct) — the fill/null math is "
    "unchanged",
)
def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    for c in _PROFILE_COLS:
        aggs.append(F.count(c).cast("long").alias(f"__f_{c}"))
        aggs.append(F.countDistinct(c).cast("long").alias(f"__d_{c}"))
    one = orders.agg(*aggs)
    # empty-table guard: Spark's div yields NULL on a zero denominator
    # where DuckDB's // raises — both sides report an exact 0 instead
    stack_args = ", ".join(
        f"'{c}', __n, __n - __f_{c}, __d_{c}, "
        f"CAST(CASE WHEN __n = 0 THEN 0 "
        f"ELSE __f_{c} * 1000 div __n END AS BIGINT)"
        for c in _PROFILE_COLS
    )
    return one.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
            "(column_name, n_rows, n_nulls, n_distinct, fill_permille)"
        )
    )


_N_SHARDS = 8


@q(
    "shard_balance_plan",
    f"""
WITH dt AS (
  SELECT doc_id, CAST(len({duck_tokens('text')}) AS BIGINT) AS tk
  FROM documents
),
ranked AS (
  SELECT tk, row_number() OVER (ORDER BY tk DESC, doc_id ASC) - 1 AS rn
  FROM dt
),
placed AS (
  SELECT tk,
         CASE WHEN (rn // {_N_SHARDS}) % 2 = 0 THEN rn % {_N_SHARDS}
              ELSE {_N_SHARDS - 1} - (rn % {_N_SHARDS}) END AS shard
  FROM ranked
),
per AS (
  SELECT CAST(shard AS BIGINT) AS shard,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(tk) AS BIGINT) AS shard_tokens
  FROM placed GROUP BY shard
),
tot AS (SELECT CAST(sum(tk) AS BIGINT) AS total_tokens FROM dt)
SELECT per.shard, per.n_docs, per.shard_tokens,
       CAST(CASE WHEN tot.total_tokens = 0 THEN 0
            ELSE per.shard_tokens * {_N_SHARDS} * 1000 // tot.total_tokens
            END AS BIGINT) AS load_permille_of_ideal
FROM per CROSS JOIN tot
""",
    f"training-shard placement plan: assign every document to one of "
    f"{_N_SHARDS} shards by snake (boustrophedon) order over token count "
    "— sort docs by length desc, deal rank r to shard r%S on even blocks "
    "and S-1-r%S on odd blocks — the parallelizable approximation of LPT "
    "bin packing (each shard gets one doc per block, blocks alternate "
    "direction so no shard always gets the block's largest), then report "
    "per-shard doc/token totals and load vs the ideal even split in "
    "permille. This is the pre-flight plan for writing balanced training "
    "shards: a 1.2x-heavy shard is a 1.2x-slower epoch tail. The global "
    "rank is computed WITHOUT a single-partition window: a (token-count "
    "-> n_docs) histogram (bounded by max doc length) gives each length "
    "its global offset via a cumulative sum over that tiny table, and "
    "ties rank by doc_id inside well-distributed per-length window "
    "partitions — the same two-level rank a 1000-executor sort would use",
)
def q_shard_balance_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.functions.text import tokens

    docs = t(spark, sf_dir, "documents")
    dt = docs.select(
        "doc_id", F.size(tokens("text")).cast("long").alias("tk")
    )
    # global rank without a global window: per-length offsets come from a
    # histogram-sized cumulative sum; within a length, rank by doc_id in a
    # partitioned window (each length's partition is corpus/width sized)
    hist = dt.groupBy("tk").agg(F.count(F.lit(1)).cast("long").alias("__c"))
    wh = (
        Window.orderBy(F.col("tk").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = hist.select(
        "tk",
        F.coalesce(F.sum("__c").over(wh), F.lit(0)).cast("long")
        .alias("__before"),
    )
    wt = Window.partitionBy("tk").orderBy("doc_id")
    ranked = (
        dt.withColumn("__i", F.row_number().over(wt) - 1)
        .join(F.broadcast(before), "tk")
        .select("tk", (F.col("__before") + F.col("__i")).alias("rn"))
    )
    placed = ranked.select(
        "tk",
        F.when(
            F.expr(f"(rn div {_N_SHARDS}) % 2") == 0, F.col("rn") % _N_SHARDS
        ).otherwise(
            F.lit(_N_SHARDS - 1) - (F.col("rn") % _N_SHARDS)
        ).alias("shard"),
    )
    per = (
        placed.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("tk").cast("long").alias("shard_tokens"),
        )
        .select(
            F.col("shard").cast("long").alias("shard"),
            "n_docs", "shard_tokens",
        )
    )
    tot = dt.agg(F.sum("tk").cast("long").alias("total_tokens"))
    # all-zero-token guard, mirroring the oracle: Spark div NULLs on a
    # zero denominator where DuckDB // raises — both report 0
    return per.crossJoin(F.broadcast(tot)).select(
        "shard", "n_docs", "shard_tokens",
        F.expr(
            f"CAST(CASE WHEN total_tokens = 0 THEN 0 "
            f"ELSE shard_tokens * {_N_SHARDS} * 1000 div total_tokens "
            "END AS BIGINT)"
        ).alias("load_permille_of_ideal"),
    )


@q(
    "vocab_divergence",
    f"""
WITH tok AS (
  SELECT source, unnest({duck_tokens('text')}) AS token FROM documents
),
sc AS (SELECT source, token, CAST(count(*) AS BIGINT) AS c
       FROM tok GROUP BY source, token),
st AS (SELECT source, CAST(sum(c) AS BIGINT) AS n,
              CAST(count(*) AS BIGINT) AS vocab
       FROM sc GROUP BY source),
lm AS (SELECT token, CAST(sum(c) AS BIGINT) AS ct FROM sc GROUP BY token),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS nn FROM sc),
terms AS (
  SELECT sc.source,
         CAST(round((CAST(sc.c AS DOUBLE) / CAST(st.n AS DOUBLE))
                    * ln(CAST(sc.c AS DOUBLE) / CAST(st.n AS DOUBLE))
                    * 1000000000) AS BIGINT) AS h_nano,
         CAST(round((CAST(sc.c AS DOUBLE) / CAST(st.n AS DOUBLE))
                    * ln((CAST(sc.c AS DOUBLE) * CAST(tot.nn AS DOUBLE))
                         / (CAST(st.n AS DOUBLE) * CAST(lm.ct AS DOUBLE)))
                    * 1000000000) AS BIGINT) AS kl_nano
  FROM sc JOIN st USING (source) JOIN lm USING (token) CROSS JOIN tot
)
SELECT st.source, st.n AS n_tokens, st.vocab,
       CAST(-sum(t.h_nano) AS BIGINT) AS entropy_nano,
       CAST(sum(t.kl_nano) AS BIGINT) AS kl_vs_corpus_nano
FROM terms t JOIN st USING (source)
GROUP BY st.source, st.n, st.vocab
""",
    "per-source unigram-distribution fingerprint: token entropy and "
    "KL(source || corpus) — entropy near zero means a source is "
    "boilerplate/template spam (few tokens dominate), high KL means its "
    "language is far from the mix you are training on (both the signals "
    "behind 'this crawl is junk' and 'this source needs its own mixing "
    "weight', complementing source_overlap_matrix's set overlap with "
    "distribution shape). Every summand is one division and one ln on "
    "identical integer inputs converted to exact NANO-units before the "
    "sum (the psi_drift discipline) and the KL ratio multiplies in DOUBLE (c*N as int64 would overflow at 100 TB token counts), so the per-source totals are never "
    "order-dependent float sums; KL needs no smoothing because every "
    "source token is in the corpus by construction. Scale shape: one "
    "(source, token) count aggregation (map-side combinable), then all "
    "math on vocabulary-sized tables joined via broadcast",
)
def q_vocab_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.functions.text import tokens

    docs = t(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(tokens("text")).alias("token"))
    sc = tok.groupBy("source", "token").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    ).localCheckpoint()  # feeds st, lm, tot and the term scan
    st = sc.groupBy("source").agg(
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
    )
    lm = sc.groupBy("token").agg(F.sum("c").cast("long").alias("ct"))
    tot = sc.agg(F.sum("c").cast("long").alias("nn"))
    p = "(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))"
    terms = (
        sc.join(F.broadcast(st), "source")
        .join(F.broadcast(lm), "token")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.expr(
                f"CAST(round({p} * ln({p}) * 1000000000) AS BIGINT)"
            ).alias("h_nano"),
            F.expr(
                f"CAST(round({p} * ln((CAST(c AS DOUBLE) * CAST(nn AS DOUBLE)) "
                "/ (CAST(n AS DOUBLE) * CAST(ct AS DOUBLE))) * 1000000000) "
                "AS BIGINT)"
            ).alias("kl_nano"),
        )
    )
    agg = terms.groupBy("source").agg(
        (-F.sum("h_nano")).cast("long").alias("entropy_nano"),
        F.sum("kl_nano").cast("long").alias("kl_vs_corpus_nano"),
    )
    return agg.join(F.broadcast(st), "source").select(
        "source", F.col("n").alias("n_tokens"), "vocab",
        "entropy_nano", "kl_vs_corpus_nano",
    )


def _simhash_curve_oracle() -> str:
    sh_expr = _simhash_sql(
        f"list_transform({duck_tokens('text')}, tk -> {duck_token_hash('tk')})"
    )
    return (
        _minhash_cand_ctes()
        + f""",
shq AS (
  SELECT doc_id,
         CASE WHEN len({duck_tokens('text')}) = 0 THEN 0
              ELSE {sh_expr} END AS simhash
  FROM documents
),
pairs AS (
  SELECT CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS ham,
         CASE WHEN v.jaccard >= 0.5 THEN 1 ELSE 0 END AS is_true
  FROM verified v
  JOIN shq a ON v.id_a = a.doc_id JOIN shq b ON v.id_b = b.doc_id
  WHERE v.jaccard >= 0.1
),
hist AS (
  SELECT ham, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(is_true) AS BIGINT) AS n_true
  FROM pairs GROUP BY ham
),
grid AS (SELECT CAST(unnest(generate_series(0, 32)) AS BIGINT) AS h),
tt AS (SELECT CAST(coalesce(sum(n_true), 0) AS BIGINT) AS total_true
       FROM hist)
SELECT g.h,
       CAST(coalesce(sum(hist.n), 0) AS BIGINT) AS n_candidates,
       CAST(coalesce(sum(hist.n_true), 0) AS BIGINT) AS n_true_captured,
       CAST(tt.total_true - coalesce(sum(hist.n_true), 0) AS BIGINT)
         AS n_true_missed,
       CAST(CASE WHEN coalesce(sum(hist.n), 0) = 0 THEN -1
                 ELSE coalesce(sum(hist.n_true), 0) * 1000 // sum(hist.n)
            END AS BIGINT) AS precision_permille
FROM grid g LEFT JOIN hist ON hist.ham <= g.h CROSS JOIN tt
GROUP BY g.h, tt.total_true
"""
    )


@q(
    "simhash_hamming_curve",
    _simhash_curve_oracle(),
    "simhash threshold-calibration table: at every Hamming-distance "
    "cutoff 0..32 on the 32-bit simhash, the candidate-pair volume, the "
    "TRUE near-dup pairs (exact Jaccard >= 0.5) captured and missed, and "
    "the precision in permille — measured against this corpus's verified "
    "pair-similarity distribution (the LSH candidates at a 0.1 floor), "
    "not a bit-independence prior. The companion to minhash_band_curve "
    "for the OTHER dedup fingerprint: before running a 100 TB "
    "simhash-block dedup you pick max_hamming off this curve (too low "
    "misses paraphrase dups, too high drowns verify in false "
    "candidates). One pass computes per-pair Hamming distances into a "
    "33-bucket histogram; every cutoff row is then a prefix-sum over "
    "that constant-size histogram joined to a constant 33-row grid — "
    "the sweep costs one histogram, not 33 rescans",
)
def q_simhash_hamming_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.fast_text import (
        minhash_signatures_fast,
        verify_candidates_fast,
    )

    docs = t(spark, sf_dir, "documents")
    sigs = minhash_signatures_fast(docs, "doc_id", "text", k_shingle=5)
    cand = D.lsh_candidate_pairs(sigs, "doc_id", bands=4, rows_per_band=4)
    pairs = verify_candidates_fast(
        cand, docs, "doc_id", "text", k_shingle=5, threshold=0.1
    )
    sh = docs.select("doc_id", D.simhash("text").alias("__sh"))
    pj = (
        pairs
        .join(
            sh.select(
                F.col("doc_id").alias("id_a"), F.col("__sh").alias("__sa")
            ),
            "id_a",
        )
        .join(
            sh.select(
                F.col("doc_id").alias("id_b"), F.col("__sh").alias("__sb")
            ),
            "id_b",
        )
        .select(
            F.expr("CAST(bit_count(__sa ^ __sb) AS BIGINT)").alias("ham"),
            F.when(F.col("jaccard") >= 0.5, 1).otherwise(0).alias("is_true"),
        )
    )
    hist = pj.groupBy("ham").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("is_true").cast("long").alias("n_true"),
    ).localCheckpoint()  # <=33 rows; feeds BOTH the totals aggregate and
    # the grid join — without this the whole pair pipeline executes twice
    grid = spark.range(33).select(F.col("id").cast("long").alias("h"))
    tt = hist.agg(
        F.coalesce(F.sum("n_true"), F.lit(0)).cast("long").alias("total_true")
    )
    joined = grid.join(F.broadcast(hist), F.col("ham") <= F.col("h"), "left")
    agg = joined.groupBy("h").agg(
        F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("n_candidates"),
        F.coalesce(F.sum("n_true"), F.lit(0)).cast("long")
        .alias("n_true_captured"),
    )
    return agg.crossJoin(F.broadcast(tt)).select(
        "h", "n_candidates", "n_true_captured",
        (F.col("total_true") - F.col("n_true_captured")).cast("long")
        .alias("n_true_missed"),
        F.when(F.col("n_candidates") == 0, F.lit(-1).cast("long"))
        .otherwise(
            F.expr("CAST(n_true_captured * 1000 div n_candidates AS BIGINT)")
        ).alias("precision_permille"),
    )


@q(
    "label_coherence",
    f"""
WITH dims AS (
  SELECT CAST(e.label AS BIGINT) AS label, d.i - 1 AS dim,
         CAST(round(CAST(e.embedding[d.i] AS DOUBLE) * 100000000)
              AS BIGINT) AS xf
  FROM embeddings e
  CROSS JOIN (SELECT unnest(generate_series(1, {EMB_DIM})) AS i) d
  WHERE d.i <= len(e.embedding)
),
cent AS (
  SELECT label, dim,
         round((CAST(CAST(sum(xf) AS BIGINT) AS DOUBLE) / 100000000)
               / count(*), 6) AS cx
  FROM dims GROUP BY label, dim
),
cvec AS (
  SELECT label, list(cx ORDER BY dim) AS cv FROM cent GROUP BY label
),
cnorm AS (
  SELECT label,
         CAST(round(round({_dk_norm('cv')}, 6) * 1000000) AS BIGINT)
           AS centroid_norm_micro
  FROM cvec
),
scored AS (
  SELECT CAST(e.label AS BIGINT) AS label,
         CAST(round(round({_dk_cos('e.embedding', 'c.cv')}, 6) * 1000000)
              AS BIGINT) AS cm
  FROM embeddings e JOIN cvec c ON CAST(e.label AS BIGINT) = c.label
),
agg AS (
  SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
         CAST(sum(cm) AS BIGINT) AS sum_cm
  FROM scored GROUP BY label
)
SELECT a.label, a.n_vecs, cn.centroid_norm_micro,
       CAST(a.sum_cm // a.n_vecs AS BIGINT) AS mean_cos_micro
FROM agg a JOIN cnorm cn ON a.label = cn.label
""",
    "intra-class embedding coherence: per label, the class centroid's "
    "norm and the mean cosine of members to their own centroid — the "
    "two-number health check of a labeled embedding space (coherence "
    "near 1 = the class is a tight cluster ANN/classifiers can "
    "separate; centroid norm near 0 = the class's directions cancel, "
    "i.e. the label carries no embedding signal — exactly what "
    "embedding collapse or a mislabeled slice looks like, per slice "
    "rather than per dimension like embedding_stats). Scale shape: the "
    "centroid is one posexplode + map-side-combinable (label, dim) "
    "mean, centroids are a labels x dim table broadcast back for one "
    "member-scoring scan; cosines round to 6 then exact integer "
    "micro-units so the per-label mean is integer division, and "
    "centroid coordinates sum 1e-8 fixed-point integers per element "
    "before the one double division — NO aggregate here is an "
    "order-dependent float sum, at any partitioning",
)
def q_label_coherence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.functions.vector import l2_norm_fixed
    from fastembed_rs_spark.operators.fast_vector import rowpair_cosine_fast

    emb = t(spark, sf_dir, "embeddings")
    dims = emb.select(
        F.col("label").cast("long").alias("label"),
        F.posexplode(F.col("embedding").cast("array<double>"))
        .alias("dim", "x"),
    ).filter(F.col("dim") < EMB_DIM)
    # element values become 1e-8 fixed-point integers BEFORE summation, so
    # the centroid is bit-exact under any partitioning (the gram-kernel
    # discipline); the only float ops are one division pair on identical
    # integer inputs
    cent = dims.groupBy("label", "dim").agg(
        F.round(
            (F.sum(F.expr("CAST(round(x * 100000000) AS BIGINT)"))
             .cast("long").cast("double") / F.lit(100000000))
            / F.count(F.lit(1)),
            6,
        ).alias("cx")
    )
    cvec = cent.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "cx"))),
            lambda s: s["cx"],
        ).alias("cv")
    ).localCheckpoint()  # labels x dim — constant; feeds cnorm, the
    # member-scoring join AND the final join, else the posexplode
    # centroid pipeline executes three times
    cnorm = cvec.select(
        "label",
        F.round(F.round(l2_norm_fixed("cv", EMB_DIM), 6) * 1000000)
        .cast("long").alias("centroid_norm_micro"),
    )
    # member scoring goes through the row-pair NumPy cosine kernel (exact
    # left-fold order, bit-identical to the expression path): each member
    # joins its OWN label's centroid via the broadcast labels x dim table
    # and scores exactly one cosine — no L-fold waste scoring against
    # other labels' centroids, and no 64-dim unrolled expression tree
    # (codegen-hostile fixed plan cost, the training_triples finding)
    mem = emb.select(
        F.col("label").cast("long").alias("label"),
        F.col("embedding").cast("array<double>").alias("__v"),
    ).join(F.broadcast(cvec), "label")
    scored = rowpair_cosine_fast(
        mem, "__v", "cv", keep=["label"], score_name="__raw"
    ).select(
        "label",
        F.round(F.round("__raw", 6) * 1000000).cast("long").alias("cm"),
    )
    agg = scored.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.sum("cm").cast("long").alias("sum_cm"),
    )
    return agg.join(F.broadcast(cnorm), "label").select(
        "label", "n_vecs", "centroid_norm_micro",
        F.expr("CAST(sum_cm div n_vecs AS BIGINT)").alias("mean_cos_micro"),
    )


# --- synthesized partsupp: the one TPC-H table the driver testdata lacks.
# Both engines construct the IDENTICAL table from lineitem's observed
# (partkey, suppkey) pairs with deterministic integer-arithmetic columns
# (the pii_redact precedent: synthesize missing inputs identically on both
# sides rather than skip the query shape). Costs stay exact: supplycost is
# integer CENTS, availqty an integer, so every downstream aggregate is
# pure int64 — no float money anywhere.
_PS_SYNTH_SQL = """
psd AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
ps AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         CAST((l_partkey * 7 + l_suppkey * 3) % 9999 + 1 AS BIGINT)
           AS ps_availqty,
         CAST((l_partkey * 31 + l_suppkey * 17) % 100000 + 100 AS BIGINT)
           AS ps_supplycost_cents
  FROM psd
)"""


def _partsupp_synth(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.select("l_partkey", "l_suppkey").distinct().select(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
        F.expr(
            "CAST((l_partkey * 7 + l_suppkey * 3) % 9999 + 1 AS BIGINT)"
        ).alias("ps_availqty"),
        F.expr(
            "CAST((l_partkey * 31 + l_suppkey * 17) % 100000 + 100 AS BIGINT)"
        ).alias("ps_supplycost_cents"),
    )


#: synthesized per-line lateness (receipt delay minus commit delay), the
#: ONE function shared by late_delivery_suppliers and shipmode_priority so
#: the two queries describe a single consistent synthetic world — edit it
#: here or nowhere (SQL text + Spark expr kept adjacent like _PS_SYNTH_SQL)
_LATENESS_SQL = """CAST((l_orderkey * 11 + l_linenumber * 7) % 45 AS BIGINT)
         - CAST((l_orderkey * 13 + l_linenumber * 5) % 30 AS BIGINT)"""


def _lateness_col():
    return (
        F.expr("CAST((l_orderkey * 11 + l_linenumber * 7) % 45 AS BIGINT)")
        - F.expr("CAST((l_orderkey * 13 + l_linenumber * 5) % 30 AS BIGINT)")
    )


_Q11_NATIONS = ("NATION_3", "NATION_7", "NATION_11")


@q(
    "important_stock_share",
    f"""
WITH {_PS_SYNTH_SQL},
natsup AS (
  SELECT s.s_suppkey FROM supplier s
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE n.n_name IN {str(_Q11_NATIONS)}
),
val AS (
  SELECT ps.ps_partkey,
         CAST(sum(ps.ps_supplycost_cents * ps.ps_availqty) AS BIGINT)
           AS value_cents
  FROM ps JOIN natsup ON ps.ps_suppkey = natsup.s_suppkey
  GROUP BY ps.ps_partkey
),
tot AS (SELECT CAST(sum(value_cents) AS BIGINT) AS total_cents FROM val)
SELECT v.ps_partkey, v.value_cents,
       CAST(v.value_cents * 100000 // t.total_cents AS BIGINT)
         AS share_per100k
FROM val v CROSS JOIN tot t
WHERE v.value_cents * 10000 > t.total_cents
""",
    "TPC-H Q11 shape (important stock identification) over the synthesized "
    "partsupp: inventory value per part held by a 3-nation supplier "
    "region, keeping parts above a 1/10000 share of the region's total. "
    "The scale-free trick is the filter: value*10000 > total compares two "
    "exact int64s — no float fraction, no boundary flips at any SF. Plan: "
    "supplier x nation is a broadcast chain, partsupp aggregates by part "
    "(map-side combinable), the 1-row total broadcasts back. partsupp "
    "itself is one distinct over lineitem's (part, supp) pairs — at "
    "100 TB that distinct is the only shuffle",
)
def q_important_stock_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = _partsupp_synth(spark, sf_dir)
    sup = t(spark, sf_dir, "supplier")
    nat = t(spark, sf_dir, "nation")
    natsup = (
        sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .filter(F.col("n_name").isin(*_Q11_NATIONS))
        .select("s_suppkey")
    )
    val = (
        ps.join(F.broadcast(natsup), ps.ps_suppkey == natsup.s_suppkey)
        .groupBy("ps_partkey")
        .agg(
            F.sum(F.col("ps_supplycost_cents") * F.col("ps_availqty"))
            .cast("long").alias("value_cents")
        )
    )
    tot = val.agg(F.sum("value_cents").cast("long").alias("total_cents"))
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(F.col("value_cents") * 10000 > F.col("total_cents"))
        .select(
            "ps_partkey", "value_cents",
            F.expr("CAST(value_cents * 100000 div total_cents AS BIGINT)")
            .alias("share_per100k"),
        )
    )


_Q16_SIZES = (1, 4, 7, 10, 13)


@q(
    "supplier_part_variety",
    f"""
WITH {_PS_SYNTH_SQL},
excl AS (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0),
pp AS (
  SELECT p_partkey, p_brand, p_type, CAST(p_size AS BIGINT) AS p_size
  FROM part
  WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
    AND p_size IN {str(_Q16_SIZES)}
)
SELECT pp.p_brand, pp.p_type, pp.p_size,
       CAST(count(DISTINCT ps.ps_suppkey) AS BIGINT) AS supplier_cnt
FROM ps
JOIN pp ON ps.ps_partkey = pp.p_partkey
WHERE ps.ps_suppkey NOT IN (SELECT s_suppkey FROM excl)
GROUP BY pp.p_brand, pp.p_type, pp.p_size
""",
    "TPC-H Q16 shape (parts/supplier relationship) over the synthesized "
    "partsupp: how many DISTINCT suppliers can provide each surviving "
    "(brand, type, size) combination, excluding one brand, one type, "
    "off-list sizes, and suppliers in bad standing (negative acctbal "
    "stands in for Q16's complaints predicate — the testdata carries no "
    "s_comment). Plan: part filters push to the parquet scan, the "
    "filtered part table broadcasts against partsupp, the exclusion set "
    "is a broadcast LEFT ANTI join (the null-safe NOT IN rewrite — "
    "suppkeys are non-null by construction), then one count-distinct "
    "aggregate keyed by the group columns",
)
def q_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = _partsupp_synth(spark, sf_dir)
    part = t(spark, sf_dir, "part")
    sup = t(spark, sf_dir, "supplier")
    pp = (
        part.filter(
            (F.col("p_brand") != "Brand#1")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(*_Q16_SIZES)
        )
        .select(
            "p_partkey", "p_brand", "p_type",
            F.col("p_size").cast("long").alias("p_size"),
        )
    )
    excl = sup.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        ps.join(F.broadcast(pp), ps.ps_partkey == pp.p_partkey)
        .join(
            F.broadcast(excl),
            ps.ps_suppkey == excl.s_suppkey,
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(
            F.countDistinct("ps_suppkey").cast("long").alias("supplier_cnt")
        )
    )


@q(
    "promotion_stock_suppliers",
    f"""
WITH {_PS_SYNTH_SQL},
target_parts AS (SELECT p_partkey FROM part WHERE p_name LIKE 'small%'),
shipped AS (
  SELECT l_partkey, l_suppkey,
         CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
           AS qty100
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l_partkey, l_suppkey
),
qualified AS (
  SELECT DISTINCT ps.ps_suppkey
  FROM ps
  JOIN target_parts tp ON ps.ps_partkey = tp.p_partkey
  LEFT JOIN shipped sh
    ON sh.l_partkey = ps.ps_partkey AND sh.l_suppkey = ps.ps_suppkey
  WHERE ps.ps_availqty * 200 > coalesce(sh.qty100, 0)
)
SELECT s.s_suppkey, s.s_name
FROM supplier s JOIN qualified q ON s.s_suppkey = q.ps_suppkey
""",
    "TPC-H Q20 shape (potential part promotion) over the synthesized "
    "partsupp: suppliers holding excess stock of 'small%' parts — "
    "availqty greater than half of what that (part, supplier) pair "
    "actually shipped in a two-year window. The half-of-shipped "
    "comparison runs in exact integers (quantities become int64 "
    "hundredths per ROW before summation, then availqty*200 > qty100 — "
    "no float half). Plan: the part-name filter pushes to the scan and "
    "broadcasts; shipped is one (part, supp)-keyed aggregate off the "
    "date-pruned lineitem scan; Q20's nested EXISTS subqueries become "
    "one left join + distinct — the shape that actually distributes",
)
def q_promotion_stock_suppliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ps = _partsupp_synth(spark, sf_dir)
    part = t(spark, sf_dir, "part")
    sup = t(spark, sf_dir, "supplier")
    li = t(spark, sf_dir, "lineitem")
    target = part.filter(F.col("p_name").like("small%")).select("p_partkey")
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(F.expr("CAST(round(l_quantity * 100) AS BIGINT)"))
            .cast("long").alias("qty100")
        )
    )
    qual = (
        ps.join(F.broadcast(target), ps.ps_partkey == target.p_partkey)
        .join(
            shipped,
            (shipped.l_partkey == ps.ps_partkey)
            & (shipped.l_suppkey == ps.ps_suppkey),
            "left",
        )
        .filter(
            F.col("ps_availqty") * 200
            > F.coalesce(F.col("qty100"), F.lit(0))
        )
        .select("ps_suppkey")
        .distinct()
    )
    return sup.join(qual, sup.s_suppkey == qual.ps_suppkey).select(
        "s_suppkey", "s_name"
    )


@q(
    "late_delivery_suppliers",
    f"""
WITH l AS (
  SELECT l_orderkey, l_suppkey,
         {_LATENESS_SQL}
           AS lateness
  FROM lineitem
),
lo AS (
  SELECT l_orderkey, l_suppkey,
         CASE WHEN max(lateness) > 0 THEN 1 ELSE 0 END AS is_late
  FROM l GROUP BY l_orderkey, l_suppkey
),
j AS (
  SELECT lo.* FROM lo
  JOIN orders o ON lo.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F'
),
ordstat AS (
  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_supp,
         CAST(sum(is_late) AS BIGINT) AS n_late
  FROM j GROUP BY l_orderkey
)
SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM j
JOIN ordstat USING (l_orderkey)
JOIN supplier s ON j.l_suppkey = s.s_suppkey
WHERE j.is_late = 1 AND ordstat.n_supp >= 2 AND ordstat.n_late = 1
GROUP BY s.s_name
""",
    "TPC-H Q21 shape (suppliers who kept orders waiting): count, per "
    "supplier, the finished multi-supplier orders where THAT supplier "
    "was the only late one. Commit/receipt dates are absent from the "
    "testdata, so per-line lateness is synthesized as a deterministic "
    "integer function of (orderkey, linenumber) — identical on both "
    "engines, same discipline as the partsupp synth. The reference "
    "formulation's correlated EXISTS / NOT EXISTS pair is rewritten as "
    "the distributed shape: one (order, supplier) rollup, one per-order "
    "(n_suppliers, n_late) aggregate, then a join-and-filter — two "
    "shuffles total, both on orderkey, no correlated re-scans",
)
def q_late_delivery_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    sup = t(spark, sf_dir, "supplier")
    lo = (
        li.select(
            "l_orderkey", "l_suppkey",
            _lateness_col().alias("lateness"),
        )
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.when(F.max("lateness") > 0, 1).otherwise(0).alias("is_late")
        )
    )
    j = lo.join(
        orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey"),
        lo.l_orderkey == F.col("o_orderkey"),
    ).select("l_orderkey", "l_suppkey", "is_late")
    ordstat = j.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_supp"),
        F.sum("is_late").cast("long").alias("n_late"),
    )
    return (
        j.filter(F.col("is_late") == 1)
        .join(ordstat, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .join(F.broadcast(sup), j.l_suppkey == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
    )


_SPECTRUM_ITERS = 16
_GRAM_SCALE = 10**8


def _spectrum_oracle(iters: int = _SPECTRUM_ITERS, dim: int = EMB_DIM) -> str:
    parts = [f"""
WITH pr AS (
  SELECT a.i - 1 AS i, b.i - 1 AS j,
         CAST(round(CAST(e.embedding[a.i] AS DOUBLE)
                    * CAST(e.embedding[b.i] AS DOUBLE)
                    * {_GRAM_SCALE}) AS BIGINT) AS pf
  FROM embeddings e
  CROSS JOIN (SELECT unnest(generate_series(1, {dim})) AS i) a
  CROSS JOIN (SELECT unnest(generate_series(1, {dim})) AS i) b
),
gram AS MATERIALIZED (
  SELECT i, j, CAST(sum(pf) AS BIGINT) AS g_fixed FROM pr GROUP BY i, j),
g AS MATERIALIZED (
  SELECT i, j, CAST(g_fixed AS DOUBLE) / {_GRAM_SCALE} AS g FROM gram),
v0 AS (SELECT unnest(generate_series(0, {dim - 1})) AS j, 0.125 AS val)"""]
    prev = "v0"
    for r in range(1, iters + 1):
        parts.append(f""",
m{r} AS MATERIALIZED (
  SELECT g.i AS j, sum(g.g * {prev}.val) AS mv
  FROM g JOIN {prev} ON g.j = {prev}.j GROUP BY g.i),
n{r} AS (SELECT COALESCE(sqrt(sum(mv * mv)), 0) AS nrm FROM m{r}),
v{r} AS (SELECT j, CASE WHEN nrm = 0 THEN 0 ELSE mv / nrm END AS val
         FROM m{r} CROSS JOIN n{r})""")
        prev = f"v{r}"
    # degenerate-spectrum guards mirror the Spark side (empty / all-zero
    # corpus): empty aggregates COALESCE to 0 instead of NULL, mv/0 never
    # propagates NaN through the power-iteration CTEs, and the share
    # divide is CASE-guarded (DuckDB // raises on a zero divisor where
    # Spark div yields NULL — both replaced by an exact zero row)
    parts.append(f""",
tr AS (SELECT CAST(COALESCE(sum(g_fixed), 0) // 100 AS BIGINT)
         AS trace_micro
       FROM gram WHERE i = j),
nv AS (SELECT CAST(count(*) AS BIGINT) AS n_vecs FROM embeddings),
eig AS (SELECT CAST(round(round(COALESCE(nrm, 0), 6) * 1000000) AS BIGINT)
          AS top_eig_micro FROM n{iters})
SELECT nv.n_vecs, CAST({dim} AS BIGINT) AS dim, tr.trace_micro,
       eig.top_eig_micro,
       CAST(CASE WHEN tr.trace_micro = 0 THEN 0
            ELSE eig.top_eig_micro * 1000 // tr.trace_micro END AS BIGINT)
         AS top_share_permille
FROM nv CROSS JOIN tr CROSS JOIN eig""")
    return "".join(parts)


@q(
    "embedding_spectrum",
    _spectrum_oracle(),
    "spectral collapse monitor: top eigenvalue of the corpus Gram matrix "
    "X^T X (by 16 power-iteration steps) and its share of the trace — THE "
    "anisotropy number for an embedding space (share -> 1: every vector "
    "lies on one line and cosine similarity is meaningless; share ~ "
    "1/dim: isotropic). Complements embedding_stats (per-dim marginals "
    "can look healthy while a single dominant direction eats the "
    "variance). Scale shape: the Gram matrix is a kernel partial "
    "aggregate — each Arrow batch contributes a dim^2 integer tile "
    "(every x_i*x_j rounded half-away to 1e-8 units BEFORE summation, "
    "so the matrix is bit-exact under any partitioning — the micro-unit "
    "discipline applied to a matrix), one tiny groupBy collapses tiles, "
    "and the driver state is dim^2 integers, CONSTANT in corpus size; "
    "power iteration then runs on the driver (dim x dim, microseconds) "
    "and the oracle replays it as unrolled CTEs on the identical "
    "fixed-point matrix (operators/fast_vector.py::gram_fixed_fast)",
)
def q_embedding_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from fastembed_rs_spark.operators.fast_vector import gram_fixed_fast

    emb = t(spark, sf_dir, "embeddings")
    gram = (
        gram_fixed_fast(emb, "embedding", EMB_DIM, scale=_GRAM_SCALE)
        .groupBy("i", "j")
        .agg(F.sum("g_fixed").cast("long").alias("g_fixed"))
    )
    rows = gram.collect()  # dim^2 = 4096 integers — constant by construction
    n_vecs = emb.count()
    Gf = np.zeros((EMB_DIM, EMB_DIM), dtype=np.int64)
    for r in rows:
        Gf[r["i"], r["j"]] = r["g_fixed"]
    trace_micro = int(np.trace(Gf)) // 100  # 1e-8 -> 1e-6 units, exact
    G = Gf.astype(np.float64) / float(_GRAM_SCALE)
    v = np.full(EMB_DIM, 0.125, dtype=np.float64)
    nrm = 0.0
    for _ in range(_SPECTRUM_ITERS):
        mv = G @ v
        nrm = float(np.sqrt((mv * mv).sum()))
        if not np.isfinite(nrm) or nrm <= 0.0:
            nrm = 0.0  # degenerate spectrum (empty / all-zero corpus):
            break      # report a zero row instead of splicing nan as SQL
        v = mv / nrm
    # final rounding happens through Spark expressions so the half-up /
    # fixed-point semantics are the engine's own, not Python's
    return spark.range(1).select(
        F.lit(n_vecs).cast("long").alias("n_vecs"),
        F.lit(EMB_DIM).cast("long").alias("dim"),
        F.lit(trace_micro).cast("long").alias("trace_micro"),
        F.expr(
            f"CAST(round(round(CAST({nrm!r} AS DOUBLE), 6) * 1000000) "
            "AS BIGINT)"
        ).alias("top_eig_micro"),
    ).withColumn(
        "top_share_permille",
        F.expr(
            "CAST(CASE WHEN trace_micro = 0 THEN 0 "
            "ELSE top_eig_micro * 1000 div trace_micro END AS BIGINT)"
        ),
    )


@q(
    "minimum_cost_supplier",
    f"""
WITH {_PS_SYNTH_SQL},
rs AS (
  SELECT s.s_suppkey, s.s_name, n.n_name
  FROM supplier s
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'ASIA'
),
pp AS (
  SELECT p_partkey, p_brand FROM part
  WHERE p_size <= 10 AND p_type = 'STANDARD'
),
ranked AS (
  SELECT pp.p_partkey, pp.p_brand, rs.s_suppkey, rs.s_name, rs.n_name,
         ps.ps_supplycost_cents,
         row_number() OVER (PARTITION BY pp.p_partkey
                            ORDER BY ps.ps_supplycost_cents ASC,
                                     rs.s_suppkey ASC) AS rnk
  FROM ps
  JOIN rs ON ps.ps_suppkey = rs.s_suppkey
  JOIN pp ON ps.ps_partkey = pp.p_partkey
)
SELECT p_partkey, p_brand, s_suppkey, s_name, n_name, ps_supplycost_cents
FROM ranked WHERE rnk = 1
""",
    "TPC-H Q2 shape (minimum-cost supplier) over the synthesized "
    "partsupp: for every small STANDARD part, the cheapest ASIA "
    "supplier — Q2's correlated MIN subquery rewritten as one window "
    "rank over the region-filtered partsupp (ties break on suppkey; "
    "costs are exact integer cents so the argmin is deterministic on "
    "both engines). Plan: region x nation x supplier collapses to a "
    "broadcast chain, the part filter pushes to the scan and "
    "broadcasts, the window partitions by partkey — the only shuffle "
    "is partsupp onto its own part key",
)
def q_minimum_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = _partsupp_synth(spark, sf_dir)
    sup = t(spark, sf_dir, "supplier")
    nat = t(spark, sf_dir, "nation")
    reg = t(spark, sf_dir, "region")
    part = t(spark, sf_dir, "part")
    rs = (
        sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(
            F.broadcast(reg.filter(F.col("r_name") == "ASIA")),
            nat.n_regionkey == reg.r_regionkey,
        )
        .select("s_suppkey", "s_name", "n_name")
    )
    pp = part.filter(
        (F.col("p_size") <= 10) & (F.col("p_type") == "STANDARD")
    ).select("p_partkey", "p_brand")
    w = Window.partitionBy("p_partkey").orderBy(
        F.asc("ps_supplycost_cents"), F.asc("s_suppkey")
    )
    return (
        ps.join(F.broadcast(rs), ps.ps_suppkey == rs.s_suppkey)
        .join(F.broadcast(pp), ps.ps_partkey == pp.p_partkey)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select(
            "p_partkey", "p_brand", "s_suppkey", "s_name", "n_name",
            "ps_supplycost_cents",
        )
    )


@q(
    "product_type_profit",
    f"""
WITH {_PS_SYNTH_SQL},
li AS (
  SELECT l_orderkey, l_partkey, l_suppkey,
         CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
           AS amount_tenk,
         CAST(round(l_quantity * 100) AS BIGINT) AS qty100
  FROM lineitem
),
red AS (SELECT p_partkey FROM part WHERE p_name LIKE '%red%')
SELECT n.n_name, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(li.amount_tenk - ps.ps_supplycost_cents * li.qty100)
            AS BIGINT) AS profit_tenk
FROM li
JOIN red ON li.l_partkey = red.p_partkey
JOIN ps ON ps.ps_partkey = li.l_partkey AND ps.ps_suppkey = li.l_suppkey
JOIN supplier s ON li.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN orders o ON li.l_orderkey = o.o_orderkey
GROUP BY n.n_name, o_year
""",
    "TPC-H Q9 shape (product-type profit measure) over the synthesized "
    "partsupp: profit on 'red' parts per supplier nation per year — "
    "revenue minus supply cost, the classic 6-table star join. Money "
    "never floats across a sum: revenue becomes exact integer "
    "ten-thousandths PER ROW (the BASELINE r5 discipline), and the cost "
    "side is integer cents x integer hundredth-quantities — also "
    "ten-thousandths — so profit is one int64 subtraction per line. "
    "Plan: part filter and the supplier/nation dims broadcast; the two "
    "real shuffles are lineitem->orders on orderkey and lineitem-> "
    "partsupp on (part, supp) — exactly the two fact-fact joins Q9 "
    "cannot avoid at any scale",
)
def q_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = _partsupp_synth(spark, sf_dir)
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        F.expr(
            "CAST(round(l_extendedprice * (1 - l_discount) * 10000) "
            "AS BIGINT)"
        ).alias("amount_tenk"),
        F.expr("CAST(round(l_quantity * 100) AS BIGINT)").alias("qty100"),
    )
    red = t(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%")
    ).select("p_partkey")
    sup = t(spark, sf_dir, "supplier")
    nat = t(spark, sf_dir, "nation")
    orders = t(spark, sf_dir, "orders")
    return (
        li.join(F.broadcast(red), li.l_partkey == red.p_partkey)
        .join(
            ps,
            (ps.ps_partkey == li.l_partkey)
            & (ps.ps_suppkey == li.l_suppkey),
        )
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            "n_name", F.year("o_orderdate").cast("long").alias("o_year")
        )
        .agg(
            F.sum(
                F.col("amount_tenk")
                - F.col("ps_supplycost_cents") * F.col("qty100")
            ).cast("long").alias("profit_tenk")
        )
    )


_FRAME_SLOTS = 8
_FPS_MILLI = (23976, 24000, 25000, 30000)


@q(
    "video_frame_plan",
    f"""
WITH meta AS (
  SELECT doc_id,
         CAST((doc_id * 37) % 600000 + 1000 AS BIGINT) AS duration_ms,
         CAST(CASE doc_id % 4 WHEN 0 THEN {_FPS_MILLI[0]}
                              WHEN 1 THEN {_FPS_MILLI[1]}
                              WHEN 2 THEN {_FPS_MILLI[2]}
                              ELSE {_FPS_MILLI[3]} END AS BIGINT)
           AS fps_milli
  FROM documents
),
frames AS (
  SELECT doc_id, duration_ms, fps_milli,
         CAST(duration_ms * fps_milli // 1000000 AS BIGINT) AS n_frames
  FROM meta
)
SELECT f.doc_id, CAST(s.slot AS BIGINT) AS slot, f.n_frames,
       CAST(s.slot * (f.n_frames - 1) // {_FRAME_SLOTS - 1} AS BIGINT)
         AS frame_idx,
       CAST((s.slot * (f.n_frames - 1) // {_FRAME_SLOTS - 1}) * 1000000
            // f.fps_milli AS BIGINT) AS ts_ms
FROM frames f
CROSS JOIN (SELECT unnest(generate_series(0, {_FRAME_SLOTS - 1})) AS slot) s
""",
    f"uniform video frame-sampling plan: for every asset, the "
    f"{_FRAME_SLOTS} frame indices and millisecond timestamps a "
    "multimodal ingest would decode — slot i maps to frame "
    "i*(n_frames-1)//(k-1), the endpoints-inclusive uniform grid, with "
    "frame counts derived from duration x fps entirely in integer "
    "milli-units (fps 23.976 stays exact as 23976 milli-fps; no float "
    "timebase math, the thing that actually desyncs frame pipelines). "
    "Video metadata is synthesized deterministically from doc_id — the "
    "container has no codecs (README: environment limitation), so the "
    "decode stage is the stub layer while the PLAN (the Spark-side "
    "contract a decode UDF consumes: per-slot rows, integer "
    "frame/timestamp targets) is real and oracle-checked. Per-row "
    "integer math x a constant 8-slot grid: embarrassingly parallel, "
    "no shuffle at all",
)
def q_video_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    fps = "CASE doc_id % 4 " + " ".join(
        f"WHEN {i} THEN {v}" for i, v in enumerate(_FPS_MILLI[:3])
    ) + f" ELSE {_FPS_MILLI[3]} END"
    frames = docs.select(
        "doc_id",
        F.expr("CAST((doc_id * 37) % 600000 + 1000 AS BIGINT)")
        .alias("duration_ms"),
        F.expr(f"CAST({fps} AS BIGINT)").alias("fps_milli"),
    ).withColumn(
        "n_frames",
        F.expr("CAST(duration_ms * fps_milli div 1000000 AS BIGINT)"),
    )
    return frames.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(_FRAME_SLOTS - 1)))
        .alias("slot"),
        "n_frames", "fps_milli",
    ).select(
        "doc_id", F.col("slot").cast("long").alias("slot"), "n_frames",
        F.expr(
            f"CAST(slot * (n_frames - 1) div {_FRAME_SLOTS - 1} AS BIGINT)"
        ).alias("frame_idx"),
        F.expr(
            f"CAST((slot * (n_frames - 1) div {_FRAME_SLOTS - 1}) * 1000000 "
            "div fps_milli AS BIGINT)"
        ).alias("ts_ms"),
    )


_SHIPMODES = ("AIR", "MAIL", "RAIL", "SHIP", "TRUCK")


@q(
    "shipmode_priority",
    f"""
WITH l AS (
  SELECT l_orderkey,
         CASE (l_orderkey * 3 + l_linenumber) % 5
           {' '.join(f"WHEN {i} THEN '{m}'" for i, m in enumerate(_SHIPMODES[:4]))}
           ELSE '{_SHIPMODES[4]}' END AS l_shipmode,
         {_LATENESS_SQL}
           AS lateness
  FROM lineitem
)
SELECT l.l_shipmode,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.lateness > 0
GROUP BY l.l_shipmode
""",
    "TPC-H Q12 shape (shipping modes and order priority): among LATE "
    "lines, how many belonged to urgent/high-priority orders per ship "
    "mode — the did-cheap-shipping-hurt-critical-orders audit. Ship mode "
    "and lateness are synthesized deterministically from (orderkey, "
    "linenumber) — the same lateness function late_delivery_suppliers "
    "uses, so the two queries describe one consistent synthetic world; "
    "o_orderpriority is real testdata. With Q2/Q9/Q11/Q16/Q20/Q21 this "
    "retires the last TPC-H shape the round-6 verdict listed as "
    "data-limited. Plan: one orderkey equi-join, conditional aggregates "
    "map-side combine into 5 groups",
)
def q_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    mode = "CASE (l_orderkey * 3 + l_linenumber) % 5 " + " ".join(
        f"WHEN {i} THEN '{m}'" for i, m in enumerate(_SHIPMODES[:4])
    ) + f" ELSE '{_SHIPMODES[4]}' END"
    l = li.select(
        "l_orderkey",
        F.expr(mode).alias("l_shipmode"),
        _lateness_col().alias("lateness"),
    ).filter(F.col("lateness") > 0)
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(orders, l.l_orderkey == orders.o_orderkey)
        .groupBy("l_shipmode")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("long")
            .alias("high_line_count"),
            F.sum(F.when(hi, 0).otherwise(1)).cast("long")
            .alias("low_line_count"),
        )
    )


def _fill_sketch_oracles() -> None:
    from fastembed_rs_spark.operators.sketch import (
        duck_cms,
        duck_hll,
        duck_hll_grouped,
        duck_kmv,
    )

    _LANG_TOKEN_HASH_ROWS = (
        "SELECT lang, " + duck_token_hash("token") + " AS h FROM "
        "(SELECT lang, unnest(" + duck_tokens("text") + ") AS token FROM documents)"
    )
    QUERIES["hll_distinct_per_lang"] = QuerySpec(
        spark=QUERIES["hll_distinct_per_lang"].spark,
        oracle=duck_hll_grouped(_LANG_TOKEN_HASH_ROWS, key="lang", p=9),
        description=QUERIES["hll_distinct_per_lang"].description,
    )

    _CMS_TOKS = (
        "SELECT token, " + duck_token_hash("token") + " AS h FROM "
        "(SELECT unnest(" + duck_tokens("text") + ") AS token FROM documents)"
    )
    QUERIES["cms_heavy_estimate"] = QuerySpec(
        spark=QUERIES["cms_heavy_estimate"].spark,
        oracle=duck_cms(_CMS_TOKS, k=20),
        description=QUERIES["cms_heavy_estimate"].description,
    )
    QUERIES["kmv_distinct"] = QuerySpec(
        spark=QUERIES["kmv_distinct"].spark,
        oracle=duck_kmv(_TOKEN_HASH_ROWS, k=256),
        description=QUERIES["kmv_distinct"].description,
    )
    QUERIES["hll_distinct"] = QuerySpec(
        spark=QUERIES["hll_distinct"].spark,
        oracle=duck_hll(_TOKEN_HASH_ROWS, p=9),
        description=QUERIES["hll_distinct"].description,
    )


_fill_sketch_oracles()


# Driver-verification rotation. The driver's CORRECTNESS_r{N}.json covers
# only the first ~50 entries of ``queries()`` per round, so ordering is the
# coverage lever. ``all_queries`` orders AUTOMATICALLY: queries never seen
# in any committed CORRECTNESS_r*.json first, then ascending by the last
# round that checked them — so the window always lands on the least-
# recently-verified queries with no per-round list maintenance. The static
# list below is the round-4 snapshot, kept ONLY as the fallback when no
# driver artifacts are readable (fresh clone without history).
_DRIVER_PRIORITY: list[str] = [
    "shipmode_priority",
    "minimum_cost_supplier",
    "product_type_profit",
    "video_frame_plan",
    "important_stock_share",
    "supplier_part_variety",
    "promotion_stock_suppliers",
    "late_delivery_suppliers",
    "embedding_spectrum",
    "table_profile",
    "shard_balance_plan",
    "vocab_divergence",
    "simhash_hamming_curve",
    "label_coherence",
    "packing_efficiency_sweep",
    "source_overlap_matrix",
    "kmeans_distortion_ladder",
    "ann_probe_sweep",
    "pq_reconstruction_error",
    "minhash_band_curve",
    "cross_source_contamination",
    "duplicate_cluster_profile",
    "dedup_threshold_sweep",
    "embedding_bucket_drift",
    "tokenizer_fertility",
    "soft_dedup_weights",
    "leakage_safe_split",
    "ann_recall_eval",
    "label_propagation_bounded",
    "split_leakage_report",
    "quality_percent_rank",
    "robust_value_outliers",
    "event_transitions",
    "join_size_estimate",
    "graph_kcore",
    "psi_drift",
    "containment_neardup",
    "grouped_linregress",
    "reciprocal_nn",
    "margin_mining",
    "cohort_retention",
    "training_triples",
    "association_rules",
    "label_propagation",
    "graph_pagerank",
    "graph_triangles",
    "pareto_front",
    "cluster_medoids",
    "feature_correlations",
    "scd2_history",
    "fuzzy_vocab_join",
    "events_anomaly_days",
    "chi2_token_select",
    "skew_report",
    "minhash_estimate_eval",
    "ann_rq_adc_topk",
    "group_winsorize",
    "stratified_split",
    "snapshot_diff",
    "bpe_apply",
    "token_budget_mix",
    "weighted_sample",
    "dedup_keep_best",
    "backoff_trigram_score",
    "ann_pq_rescore",
    "ann_ivf_pq_topk",
    "crossmodal_similarity",
    "events_props_json",
    "revenue_rollup",
    "revenue_cube",
    "bloom_semijoin_revenue",
    "order_items_array",
    "chunk_documents",
    "chunk_documents_tokens",
    "rag_passage_topk",
    "customers_without_orders",
    "user_rolling_value",
    "value_percentiles",
    "value_percentiles_approx",
    "brand_buyers_setops",
    "orders_by_month",
    "tfidf_top_terms",
    "multimodal_probe",
    "cms_heavy_estimate",
    "stratified_sample",
    "value_quartiles",
    "clean_text",
    "user_journey",
    "unigram_surprisal",
    "benchmark_decontam",
    "pii_redact",
    "repetition_signals",
    "semantic_dedup",
    "dsir_importance",
    "sequence_packing",
    "embedding_stats",
    "mmr_diversify",
    "hll_distinct_per_lang",
    "customers_with_returns",
    "user_event_pivot",
    "value_by_type_salted",
    "incremental_dedup",
    "events_funnel",
    "retrieve_then_rerank",
    "order_rank_profile",
    "incremental_embed",
    "embed_qwen_vl_stub",
    # round-4 additions (never driver-checked as of this snapshot)
    "customer_order_distribution",
    "sales_opportunity_segments",
    "promo_revenue_share",
    "order_priority_pending",
    "chunk_exact_dedup",
    "domain_mix_weights",
    "token_vocab_coverage",
    "value_percentiles_sampled",
    "value_percentiles_sampled_by_type",
    "bigram_lift",
    "jaccard_prefix_neardup",
    "daily_activity_reconcile",
    "cosine_topk_filtered",
    # round-5 additions
    "embed_text_stub_packed",
    "jaccard_adaptive_neardup",
    "repeated_spans",
    "cluster_balanced_sample",
    "embedding_outliers",
    "jl_project_topk",
    "nation_trade_volume",
    "promo_market_share",
    "returned_items_top_customers",
    "top_supplier_revenue",
    "brand_bracket_revenue",
    # round-6 additions (ann_pq_rescore / ann_ivf_pq_topk are already at
    # the head of the list)
    "bpe_merge_step",
    "bigram_surprisal",
    "epoch_shuffle",
    "quality_classifier",
]


def _last_driver_round() -> dict[str, int]:
    """name -> rotation key from committed CORRECTNESS_r{N}.json artifacts.

    Normally the highest round number with a row for the query; but a query
    whose LATEST row is red — a failed rows/schema/hash match or a harness
    error other than the by-design ``no_oracle`` — keys as ``-1`` so it
    sorts directly after never-checked queries and re-enters the driver's
    ~50-row window the round after its fix lands (sequence_packing /
    order_items_array in r4 would otherwise have waited a full rotation)."""
    import json
    import re as _re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    last: dict[str, int] = {}
    latest_row: dict[str, tuple[int, dict]] = {}
    try:
        entries = os.listdir(root)
    except OSError:
        return last
    for fn in entries:
        m = _re.fullmatch(r"CORRECTNESS_r(\d+)\.json", fn)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(os.path.join(root, fn)) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in data.items():
            last[name] = max(last.get(name, -2), rnd)
            if name not in latest_row or rnd > latest_row[name][0]:
                latest_row[name] = (rnd, row if isinstance(row, dict) else {})
    for name, (_, row) in latest_row.items():
        err = row.get("err")
        red = (err is not None and err != "no_oracle") or any(
            row.get(k) is False
            for k in ("rows_match", "schema_match", "hash_match")
        )
        if red:
            last[name] = -1
    return last


#: Queries whose Spark code or oracle SQL changed since the last committed
#: CORRECTNESS round — sorted ahead of even never-seen queries so the
#: driver's ~50-row window re-verifies them THIS round. Refresh per round.
_CHANGED_THIS_ROUND: tuple[str, ...] = (
    "embedding_spectrum",  # r8: oracle degenerate-spectrum guards
    "table_profile",       # r8: fill_permille zero-denominator guard
    "shard_balance_plan",  # r8: load_permille zero-denominator guard
)


def all_queries() -> dict[str, QuerySpec]:
    """Full catalog, ordered for driver-verification rotation: queries
    changed this round first (``_CHANGED_THIS_ROUND``), then queries NEVER
    seen in a committed CORRECTNESS_r*.json, then ascending by the round
    that last checked them (ties keep registration order) — the driver's
    ~50-row window always covers changed + least-recently-verified
    queries, with no other manual list upkeep. Falls back to the static
    ``_DRIVER_PRIORITY`` snapshot when no driver artifacts are readable."""
    last = _last_driver_round()
    names = list(QUERIES)
    if not last:
        prioritized = {n: QUERIES[n] for n in _DRIVER_PRIORITY if n in QUERIES}
        rest = {n: s for n, s in QUERIES.items() if n not in prioritized}
        return {**prioritized, **rest}
    for n in _CHANGED_THIS_ROUND:
        last[n] = -3
    order = sorted(range(len(names)), key=lambda i: (last.get(names[i], -2), i))
    return {names[i]: QUERIES[names[i]] for i in order}
