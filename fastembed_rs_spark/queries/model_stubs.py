"""Model-runtime queries (pandas-UDF inference path; rows-only driver check) — dense/sparse/BGE-M3/image/VL stubs.

Split out of the monolithic queries.py (r8); registration order is
preserved by the sequential imports in queries/__init__.py.
"""

from __future__ import annotations

from fastembed_rs_spark.queries._core import (
    DataFrame,
    EH,
    EMB_DIM,
    F,
    SparkSession,
    Window,
    _dk_cos,
    assign_ivf_buckets_fast,
    duck_token_hash,
    duck_tokens,
    ivf_top_k,
    q,
    rerank,
    t,
)

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
