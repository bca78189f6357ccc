"""Operator-level semantics: top-k against a NumPy oracle, dedup family on
constructed near/far duplicates, sessionization on a hand-built event log."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from fastembed_rs_spark.operators import dedup as D
from fastembed_rs_spark.operators.rerank import rerank, token_overlap_score
from fastembed_rs_spark.operators.topk import assign_ivf_buckets, cosine_top_k, ivf_top_k

RNG = np.random.default_rng(7)
CORPUS = RNG.normal(size=(50, 8)).astype(np.float64)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.createDataFrame(
        [(i, CORPUS[i].tolist()) for i in range(len(CORPUS))], ["vec_id", "embedding"]
    )


def _np_topk(qi: int, k: int):
    q = CORPUS[qi]
    scores = CORPUS @ q / (np.linalg.norm(CORPUS, axis=1) * np.linalg.norm(q))
    scores = np.round(scores, 6)
    order = sorted(range(len(CORPUS)), key=lambda i: (-scores[i], i))
    return [(i, scores[i]) for i in order[:k]]


def test_cosine_topk_matches_numpy(spark, emb):
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = cosine_top_k(queries, emb, k=5, round_to=6)
    got = {
        (r["query_id"], r["rank"]): (r["vec_id"], r["score"]) for r in out.collect()
    }
    for qi in range(3):
        for rank, (vid, score) in enumerate(_np_topk(qi, 5), start=1):
            gvid, gscore = got[(qi, rank)]
            assert gvid == vid
            assert gscore == pytest.approx(score, abs=1e-9)


def test_cosine_topk_fixed_dim_same_result(spark, emb):
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    a = cosine_top_k(queries, emb, k=5, round_to=6).collect()
    b = cosine_top_k(queries, emb, k=5, round_to=6, dim=8).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_ivf_recall_vs_exact(spark, emb):
    centroids = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centroid_vec")
    )
    bucketed = assign_ivf_buckets(emb, centroids)
    assert bucketed.count() == len(CORPUS)  # every vector in exactly one bucket
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = ivf_top_k(queries, bucketed, centroids, k=3, nprobe=3).collect()
    # rank-1 result must be the query itself (self-similarity 1.0 is always in
    # a probed bucket: the query's own bucket centroid is its best centroid)
    best = {r["query_id"]: r["vec_id"] for r in out if r["rank"] == 1}
    assert best == {0: 0, 1: 1, 2: 2}


def test_exact_dedup_groups(spark):
    docs = spark.createDataFrame(
        [(0, "Hello world"), (1, "hello,  WORLD!"), (2, "different entirely")],
        ["doc_id", "text"],
    )
    rows = D.exact_dedup(docs, "doc_id", "text").collect()
    groups = {r["fingerprint"]: (r["n_docs"], r["canonical_id"]) for r in rows}
    assert len(groups) == 2
    assert (2, 0) in groups.values()  # the two hello-worlds collapse to doc 0
    assert (1, 2) in groups.values()


NEAR_A = "the quick brown fox jumps over the lazy dog and keeps running far away"
NEAR_B = "the quick brown fox jumps over the lazy dog and keeps walking far away"
FAR = "completely unrelated content about numerical weather prediction models"


def test_minhash_lsh_finds_near_dup(spark):
    docs = spark.createDataFrame(
        [(0, NEAR_A), (1, NEAR_B), (2, FAR)], ["doc_id", "text"]
    )
    sigs = D.minhash_signatures(docs, "doc_id", "text", k_shingle=5)
    cand = D.lsh_candidate_pairs(sigs, "doc_id", bands=4, rows_per_band=4)
    out = D.verify_candidates(cand, docs, "doc_id", "text", k_shingle=5, threshold=0.5)
    pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert (0, 1) in pairs
    assert all(2 not in p for p in pairs)


def test_minhash_identical_docs_signature_equal(spark):
    docs = spark.createDataFrame([(0, NEAR_A), (1, NEAR_A)], ["doc_id", "text"])
    rows = D.minhash_signatures(docs, "doc_id", "text").collect()
    sig = {r["doc_id"]: tuple(v for k, v in r.asDict().items() if k.startswith("mh_")) for r in rows}
    assert sig[0] == sig[1]


def test_simhash_near_pairs(spark):
    docs = spark.createDataFrame(
        [(0, NEAR_A), (1, NEAR_A), (2, FAR)], ["doc_id", "text"]
    )
    sh = docs.select("doc_id", D.simhash("text").alias("simhash"))
    out = D.simhash_near_pairs(sh, "doc_id", max_hamming=3).collect()
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in out}
    assert pairs.get((0, 1)) == 0  # identical docs → identical simhash


def test_embedding_near_dups_threshold(spark):
    vecs = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0, 0.0]),   # near dup of 0
        (2, [0.0, 1.0, 0.0, 0.0]),      # orthogonal
        (3, [0.0, 0.0, 0.0, 0.0]),      # zero vector → guard, never matches
    ]
    emb = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    for dim in (None, 4):
        out = D.embedding_near_dups(emb, threshold=0.95, dim=dim).collect()
        pairs = {(r["id_a"], r["id_b"]) for r in out}
        assert pairs == {(0, 1)}


def test_rerank_ordering_and_k(spark):
    pairs = spark.createDataFrame(
        [
            (0, 10, "apple banana cherry", "apple banana cherry"),
            (0, 11, "apple banana cherry", "apple banana"),
            (0, 12, "apple banana cherry", "unrelated words here"),
            (1, 10, "dogs cats", "dogs cats"),
        ],
        ["query_id", "doc_id", "__q", "__d"],
    )
    out = rerank(pairs, token_overlap_score(F.col("__q"), F.col("__d")), k=2)
    got = {(r["query_id"], r["rank"]): r["doc_id"] for r in out.collect()}
    assert got[(0, 1)] == 10 and got[(0, 2)] == 11
    assert got[(1, 1)] == 10
    assert (0, 3) not in got  # k=2 truncation


def test_sessionize_semantics(spark):
    # hand-built event log: user 1 has two sessions split by a >30min gap
    ns = 1_000_000_000
    events = [
        (1, 1, 0 * ns), (2, 1, 600 * ns), (3, 1, 900 * ns),     # session 1: 0..900s
        (4, 1, (900 + 1801) * ns),                              # gap 1801s → session 2
        (5, 2, 0 * ns),                                         # user 2: one event
    ]
    df = spark.createDataFrame(events, ["event_id", "user_id", "ts"])
    from fastembed_rs_spark.queries import q_events_sessionize  # noqa: F401  (shape reference)
    from pyspark.sql import Window

    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    l = df.select("user_id", "event_id", "ts", F.lag("ts").over(wo).alias("pts"))
    n = l.withColumn(
        "is_new",
        F.when(F.col("pts").isNull() | ((F.col("ts") - F.col("pts")) > 1800 * ns), 1).otherwise(0),
    )
    s = n.withColumn(
        "session_id",
        F.sum("is_new").over(wo.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
    agg = s.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.expr(f"(max(ts) - min(ts)) div {ns}").alias("duration_s"),
    )
    rows = {(r["user_id"], r["session_id"]): (r["n_events"], r["duration_s"])
            for r in agg.collect()}
    assert rows == {(1, 1): (3, 900), (1, 2): (1, 0), (2, 1): (1, 0)}


def test_train_ivf_centroids_recovers_clusters(spark):
    import numpy as np
    from fastembed_rs_spark.operators.topk import train_ivf_centroids

    rng = np.random.default_rng(5)
    centers = np.eye(3, 8) * 10.0
    pts = np.vstack([c + rng.normal(scale=0.3, size=(30, 8)) for c in centers])
    df = spark.createDataFrame(
        [(i, pts[i].tolist()) for i in range(len(pts))], ["vec_id", "embedding"]
    )
    cent = train_ivf_centroids(df, k=3, iters=4)
    got = np.array([r["centroid_vec"] for r in cent.collect()])
    assert got.shape == (3, 8)
    for c in centers:
        cos = (got @ c) / (np.linalg.norm(got, axis=1) * np.linalg.norm(c))
        assert cos.max() > 0.99  # each true center recovered by some centroid
    # buckets are balanced on this symmetric data
    buckets = assign_ivf_buckets(df, cent).groupBy("centroid_id").count().collect()
    assert sorted(r["count"] for r in buckets) == [30, 30, 30]


def test_ivf_recall_at_10_vs_brute(spark):
    """Measured recall of the trained-IVF probe path against the exact
    brute-force top-k on the real sf0.001 embeddings (deterministic data +
    seeded init → a stable, pinnable number)."""
    from fastembed_rs_spark.operators.topk import train_ivf_centroids

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = cosine_top_k(queries, emb, k=10, round_to=6)
    truth = {(r["query_id"], r["vec_id"]) for r in exact.collect()}

    centroids = train_ivf_centroids(emb, k=10, iters=3)
    bucketed = assign_ivf_buckets(emb, centroids)
    approx = ivf_top_k(queries, bucketed, centroids, k=10, nprobe=3, round_to=6)
    got = {(r["query_id"], r["vec_id"]) for r in approx.collect()}

    recall = len(truth & got) / len(truth)
    # probing 3 of 10 trained buckets on this corpus measures exactly 0.60
    # (fully deterministic: seeded init + exact assignment); bound leaves
    # margin in case the plan's float fold order ever shifts a tie
    assert recall >= 0.5, f"recall@10 = {recall}"


def test_train_ivf_centroids_multi_matches_per_k(spark):
    """Joint multi-k training must be BIT-identical to running the
    single-k trainer once per k (same seed ordering, same means): the
    whole point of the joint path is stage-count, not semantics."""
    from fastembed_rs_spark.operators.topk import (
        train_ivf_centroids,
        train_ivf_centroids_multi,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    ks = (1, 2, 4, 8)
    multi = train_ivf_centroids_multi(emb, ks=ks, iters=3)
    got = {
        (r["k"], r["centroid_id"]): r["centroid_vec"]
        for r in multi.collect()
    }
    assert len(got) == sum(ks)
    for k in ks:
        single = {
            r["centroid_id"]: r["centroid_vec"]
            for r in train_ivf_centroids(emb, k=k, iters=3).collect()
        }
        assert set(single) == {c for (kk, c) in got if kk == k}
        for cid, vec in single.items():
            assert got[(k, cid)] == vec, (k, cid)


def test_cosine_top_k_fast_matches_expression_path(spark):
    """The kernel-scored brute-force top-k must return EXACTLY the same
    (query, id, score, rank) rows as the expression-path cosine_top_k —
    same rounded scores, same tie order."""
    from fastembed_rs_spark.operators.topk import cosine_top_k, cosine_top_k_fast

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 7).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    slow = cosine_top_k(queries, emb, k=9, round_to=6).select(
        "query_id", "vec_id", "score", "rank"
    ).collect()
    fast = cosine_top_k_fast(queries, emb, k=9, round_to=6).select(
        "query_id", "vec_id", "score", "rank"
    ).collect()
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted(map(tuple, slow), key=lambda t: (t[0], t[3])) == \
        sorted(map(tuple, fast), key=lambda t: (t[0], t[3]))
