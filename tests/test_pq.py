"""Product quantization: encoding exactness, ADC equivalence when the corpus
IS the codebook, trained codebooks beating sampled ones, and the blocked
near-dup tile scorer matching the pure-expression pair join bit-for-bit."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from fastembed_rs_spark.operators import dedup as D
from fastembed_rs_spark.operators import pq

RNG = np.random.default_rng(11)
N, DIM, M, DSUB = 40, 16, 4, 4
CORPUS = RNG.normal(size=(N, DIM)).astype(np.float64)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.createDataFrame(
        [(i, CORPUS[i].tolist()) for i in range(N)], ["vec_id", "embedding"]
    )


def test_pq_encode_one_code_per_subspace(spark, emb):
    books = pq.sample_pq_codebooks(emb, "vec_id", "embedding", m=M, dsub=DSUB, every=10)
    codes = pq.pq_encode(emb, books, "vec_id", "embedding", m=M, dsub=DSUB)
    counts = codes.groupBy("vec_id").count().collect()
    assert len(counts) == N
    assert all(r["count"] == M for r in counts)


def test_pq_encode_identity_when_corpus_is_codebook(spark, emb):
    # every vector is a codebook entry (every=1) → each subvector must encode
    # to itself (d2 = 0) unless another entry ties at distance 0
    books = pq.sample_pq_codebooks(emb, "vec_id", "embedding", m=M, dsub=DSUB, every=1)
    codes = pq.pq_encode(emb, books, "vec_id", "embedding", m=M, dsub=DSUB)
    mismatches = codes.filter(F.col("vec_id") != F.col("code_id")).count()
    assert mismatches == 0  # gaussian subvectors: no exact-duplicate entries


def test_pq_adc_exact_when_corpus_is_codebook(spark, emb):
    # with a perfect codebook the ADC score IS the exact dot product
    books = pq.sample_pq_codebooks(emb, "vec_id", "embedding", m=M, dsub=DSUB, every=1)
    codes = pq.pq_encode(emb, books, "vec_id", "embedding", m=M, dsub=DSUB)
    queries = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = pq.pq_adc_topk(queries, codes, books, k=5, m=M, dsub=DSUB).collect()
    assert len(out) == 10
    for r in out:
        true_dot = float(CORPUS[r["query_id"]] @ CORPUS[r["vec_id"]])
        # per-subspace rounding to 6dp introduces ≤ m·5e-7 absolute error
        assert r["score"] == pytest.approx(true_dot, abs=M * 5e-7 + 5e-7)


def test_pq_trained_distortion_not_worse_than_sampled(spark, emb):
    def distortion(books):
        codes = pq.pq_encode(emb, books, "vec_id", "embedding", m=M, dsub=DSUB)
        joined = (
            pq.split_subvectors(emb, "vec_id", "embedding", m=M, dsub=DSUB)
            .join(codes, on=["vec_id", "subspace"])
            .join(F.broadcast(books), on=["subspace", "code_id"])
            .select(pq._sq_dist_fixed("subvec", "code_vec", DSUB).alias("d2"))
        )
        return joined.agg(F.sum("d2")).collect()[0][0]

    sampled = pq.sample_pq_codebooks(emb, "vec_id", "embedding", m=M, dsub=DSUB, every=10)
    trained = pq.train_pq_codebooks(
        emb, "vec_id", "embedding", m=M, dsub=DSUB, k=4, iters=2
    )
    assert distortion(trained) <= distortion(sampled) * 1.01


def test_blocked_neardup_matches_expression_pair_join(spark, emb):
    a = D.embedding_near_dups(emb, threshold=0.3, dim=DIM).collect()
    b = D.embedding_near_dups_blocked(emb, threshold=0.3, n_blocks=4).collect()
    assert len(a) > 0
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_blocked_neardup_handles_zero_vectors(spark):
    rows = [(0, [0.0] * 8), (1, [0.0] * 8), (2, [1.0] + [0.0] * 7), (3, [1.0] + [0.0] * 7)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = {(r["id_a"], r["id_b"]): r["score"]
           for r in D.embedding_near_dups_blocked(df, threshold=0.5, n_blocks=2).collect()}
    # zero-norm pairs score 0.0 (guard), identical unit vectors score 1.0
    assert got == {(2, 3): 1.0}


def test_per_node_cap_parity_at_large_k(spark, emb):
    # k ≥ max degree → the union-kNN cap is a no-op: identical pair set
    base = D.embedding_near_dups_blocked(emb, threshold=0.1, n_blocks=4).collect()
    capped = D.embedding_near_dups_blocked(
        emb, threshold=0.1, n_blocks=4, per_node_top_k=10**6
    ).collect()
    assert len(base) > 0
    assert sorted(map(tuple, base)) == sorted(map(tuple, capped))


def test_per_node_cap_matches_bruteforce_union_knn(spark, emb):
    """Capped output == brute-force union-kNN graph on rounded scores:
    edge kept iff it ranks ≤ k among EITHER endpoint's thresholded
    partners (score desc, partner id asc) — exercises both the in-tile
    band pre-prune and the exact Spark-side window."""
    k, thr = 3, 0.1
    cos = np.zeros((N, N))
    for i in range(N):
        for j in range(N):
            ni, nj = np.linalg.norm(CORPUS[i]), np.linalg.norm(CORPUS[j])
            cos[i, j] = round(float(CORPUS[i] @ CORPUS[j] / (ni * nj)), 6)
    partners = {
        i: sorted(
            ((cos[i, j], -j) for j in range(N) if j != i and cos[i, j] >= thr),
            reverse=True,
        )[:k]
        for i in range(N)
    }
    want = set()
    for i, tops in partners.items():
        for s, nj in tops:
            want.add((min(i, -nj), max(i, -nj)))
    got = {
        (r["id_a"], r["id_b"])
        for r in D.embedding_near_dups_blocked(
            emb, threshold=thr, n_blocks=4, per_node_top_k=k
        ).collect()
    }
    assert got == want
    # the cap must actually bound: strictly fewer pairs than uncapped
    full = D.embedding_near_dups_blocked(emb, threshold=thr, n_blocks=4).count()
    assert len(got) < full


def test_opq_rotation_is_orthonormal_and_preserves_search():
    R = pq.opq_rotation(DIM, seed=7)
    assert np.allclose(R @ R.T, np.eye(DIM), atol=1e-12)
    # deterministic across calls
    assert np.array_equal(R, pq.opq_rotation(DIM, seed=7))
    # inner products invariant -> exact search unchanged by the rotation
    P = CORPUS @ R
    assert np.allclose(P @ P.T, CORPUS @ CORPUS.T, atol=1e-9)


def test_apply_rotation_matches_numpy(spark, emb):
    R = pq.opq_rotation(DIM, seed=7)
    got = {
        r["vec_id"]: np.asarray(r["embedding"])
        for r in pq.apply_rotation(emb, "vec_id", "embedding", R).collect()
    }
    want = CORPUS @ R
    for i in range(N):
        assert np.allclose(got[i], want[i], atol=1e-12)


def test_pq_adc_rescore_topk_scores_are_exact_cosine(spark, emb):
    """The rescore tier must emit k rows per query whose scores equal the
    EXACT cosine (the shortlist comes from the compressed codes, but what
    the user sees is full-precision)."""
    books = pq.train_pq_codebooks(
        emb, "vec_id", "embedding", m=M, dsub=DSUB, k=4, iters=2
    )
    codes = pq.pq_encode(emb, books, "vec_id", "embedding", m=M, dsub=DSUB)
    queries = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = pq.pq_adc_rescore_topk(
        queries, codes, books, emb, k=3, rescore_factor=4, m=M, dsub=DSUB
    )
    rows = out.collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r)
        a, b = CORPUS[r["query_id"]], CORPUS[r["vec_id"]]
        true_cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert r["score"] == pytest.approx(round(true_cos, 6), abs=1e-9)
    assert all(len(v) == 3 for v in per_q.values()) and len(per_q) == 2


def test_ivf_pq_full_probe_equals_plain_adc(spark, emb):
    """With every bucket probed, IVF-PQ scores the whole corpus through
    the same LUT as plain ADC — the top-k must be identical; with
    nprobe=1 the candidate set (and output) must be a subset drawn only
    from probed buckets."""
    books = pq.sample_pq_codebooks(emb, "vec_id", "embedding", m=M, dsub=DSUB, every=10)
    codes = pq.pq_encode(emb, books, "vec_id", "embedding", m=M, dsub=DSUB)
    centroids = emb.filter(F.col("vec_id") % 8 == 0).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centroid_vec")
    )
    from fastembed_rs_spark.operators.topk import assign_ivf_buckets

    bucketed = assign_ivf_buckets(emb, centroids)
    codes_b = codes.join(bucketed.select("vec_id", "centroid_id"), "vec_id")
    queries = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    n_buckets = centroids.count()

    plain = {
        (r["query_id"], r["vec_id"], r["score"], r["rank"])
        for r in pq.pq_adc_topk(queries, codes, books, k=4, m=M, dsub=DSUB).collect()
    }
    full = {
        (r["query_id"], r["vec_id"], r["score"], r["rank"])
        for r in pq.ivf_pq_topk(
            queries, codes_b, centroids, books, k=4, nprobe=n_buckets,
            m=M, dsub=DSUB,
        ).collect()
    }
    assert full == plain

    one = pq.ivf_pq_topk(
        queries, codes_b, centroids, books, k=4, nprobe=1, m=M, dsub=DSUB
    ).collect()
    assigned = {r["vec_id"]: r["centroid_id"] for r in bucketed.collect()}
    probed_sizes = {}
    for r in one:
        probed_sizes.setdefault(r["query_id"], set()).add(assigned[r["vec_id"]])
    # all results of a query come from ONE probed bucket
    assert all(len(buckets) == 1 for buckets in probed_sizes.values())


def test_rq_residual_refinement_improves_reconstruction(spark):
    """Level-2 codes must reduce mean reconstruction error vs level-1
    alone (that's what residual quantization IS), and the ADC score must
    equal dot(q, c1 + c2) recomputed in numpy."""
    import numpy as np
    from pyspark.sql import functions as F

    from fastembed_rs_spark.operators.pq import rq_adc_topk, rq_encode

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    codes, b1, b2 = rq_encode(emb, "vec_id", "embedding", dim=64)
    vecs = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
            for r in emb.collect()}
    c1 = {r["c1_id"]: np.asarray(r["c1_vec"]) for r in b1.collect()}
    c2 = {r["c2_id"]: np.asarray(r["c2_vec"]) for r in b2.collect()}
    asg = {r["vec_id"]: (r["c1_id"], r["c2_id"]) for r in codes.collect()}
    assert set(asg) == set(vecs)
    e1 = e2 = 0.0
    for vid, (a, b) in asg.items():
        v = vecs[vid]
        e1 += float(np.linalg.norm(v - c1[a]))
        e2 += float(np.linalg.norm(v - (c1[a] + c2[b])))
    assert e2 < e1  # the second level refines, never degrades on average

    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = rq_adc_topk(queries, codes, b1, b2, k=10, dim=64).collect()
    for r in out[:20]:
        a, b = asg[r["vec_id"]]
        q = vecs[r["query_id"]]
        exp = round(round(float(q @ c1[a]), 6) + round(float(q @ c2[b]), 6), 6)
        assert abs(r["score"] - exp) < 1e-9


def test_rq_id_bound_caps_codebooks_and_is_noop_below_bound(spark):
    """id_bound caps each codebook to sample ids below it (constant-size
    books, the faiss 2^nbits shape that keeps the encode scan linear),
    and a bound above every id is a no-op."""
    from fastembed_rs_spark.operators.pq import rq_encode

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    codes, b1, b2 = rq_encode(
        emb, "vec_id", "embedding", dim=64, every1=50, every2=37,
        id_bound=200,
    )
    assert {r["c1_id"] for r in b1.collect()} == {0, 50, 100, 150}
    assert {r["c2_id"] for r in b2.collect()} == {0, 37, 74, 111, 148, 185}
    assert codes.count() == emb.count()  # every vector still encoded
    free_codes, fb1, fb2 = rq_encode(emb, "vec_id", "embedding", dim=64)
    hi_codes, hb1, hb2 = rq_encode(
        emb, "vec_id", "embedding", dim=64, id_bound=10**9
    )
    assert hb1.count() == fb1.count() and hb2.count() == fb2.count()
    assert sorted(map(tuple, hi_codes.collect())) == sorted(
        map(tuple, free_codes.collect())
    )


def test_rq_encode_keep_error_matches_recompute(spark):
    """keep_error must expose each level's winning squared distance:
    d2_1/d2_2 recompute exactly from the returned codebooks (round-6,
    same fold order), and keep_error=False output is unchanged."""
    import numpy as np

    from fastembed_rs_spark.operators.pq import rq_encode

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    codes, b1, b2 = rq_encode(
        emb, "vec_id", "embedding", dim=64, every1=50, every2=37,
        id_bound=1000, keep_error=True,
    )
    assert set(codes.columns) == {"vec_id", "c1_id", "c2_id", "d2_1", "d2_2"}
    plain, _, _ = rq_encode(
        emb, "vec_id", "embedding", dim=64, every1=50, every2=37,
        id_bound=1000,
    )
    assert set(plain.columns) == {"vec_id", "c1_id", "c2_id"}
    assert (
        codes.select("vec_id", "c1_id", "c2_id").exceptAll(plain).count() == 0
    )
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in emb.collect()}
    books1 = {r["c1_id"]: np.array(r["c1_vec"]) for r in b1.collect()}
    books2 = {r["c2_id"]: np.array(r["c2_vec"]) for r in b2.collect()}
    for r in codes.orderBy("vec_id").limit(25).collect():
        v = vecs[r["vec_id"]]
        c1v = books1[r["c1_id"]]
        assert r["d2_1"] == round(float(((v - c1v) ** 2).sum()), 6)
        resid = v - c1v
        c2v = books2[r["c2_id"]]
        assert r["d2_2"] == round(float(((resid - c2v) ** 2).sum()), 6)
