"""Property tests for the round-3 curation operators (MMR, sequence
packing, DSIR, decontamination, PII) — semantics beyond the oracle
hash-match: diversity actually improves, chunks tile the token stream,
target docs are excluded, redaction round-trips."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def catalog():
    from fastembed_rs_spark.queries import all_queries

    return all_queries()


def test_mmr_reduces_redundancy_vs_topk(spark, catalog):
    """The MMR-selected 5 must have a lower mean pairwise cosine than the
    plain top-5 by relevance (that's the operator's whole point), while
    rank 1 stays the most relevant candidate."""
    import numpy as np

    out = catalog["mmr_diversify"].spark(spark, SF).collect()
    emb = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
           for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()}

    def mean_pairwise(ids):
        vs = [emb[i] / np.linalg.norm(emb[i]) for i in ids]
        sims = [float(vs[i] @ vs[j]) for i in range(len(vs))
                for j in range(i + 1, len(vs))]
        return sum(sims) / len(sims)

    by_q: dict[int, list] = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    assert len(by_q) == 3
    improved = 0
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r["mmr_rank"])
        assert [r["mmr_rank"] for r in rows] == [1, 2, 3, 4, 5]
        # rank 1 = argmax relevance (ties id asc)
        best_rel = max(r["relevance"] for r in rows)
        assert rows[0]["relevance"] == best_rel
        # compare against plain top-5 by relevance from the same candidates
        cand = catalog["cosine_topk"]  # not same k; recompute top-5 directly
        sims_mmr = mean_pairwise([r["vec_id"] for r in rows])
        from fastembed_rs_spark.operators.topk import cosine_top_k

        emb_df = spark.read.parquet(f"{SF}/embeddings.parquet")
        queries = emb_df.filter(F.col("vec_id") == q).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        top5 = [r["vec_id"] for r in cosine_top_k(
            queries, emb_df, k=5, round_to=6, dim=64).collect()]
        sims_top = mean_pairwise(top5)
        improved += sims_mmr <= sims_top + 1e-12
    assert improved == 3  # diversification never increases redundancy here


def test_sequence_packing_tiles_the_stream(spark, catalog):
    """Within a shard: docs are contiguous (start = prev start + prev len),
    chunk ids are non-decreasing, and n_chunks matches the span formula."""
    rows = catalog["sequence_packing"].spark(spark, SF).collect()
    from fastembed_rs_spark.functions.text import tokens

    ntok = {r["doc_id"]: r["n"] for r in spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", F.size(tokens("text")).alias("n")).collect()}
    shards: dict[int, list] = {}
    for r in rows:
        shards.setdefault(r["shard"], []).append(r)
    assert len(shards) == 8
    C = 256
    for shard, rs in shards.items():
        rs.sort(key=lambda r: r["doc_id"])
        expect_start = 0
        for r in rs:
            assert r["start_tok"] == expect_start
            expect_start += ntok[r["doc_id"]]
            first = r["start_tok"] // C
            last = (r["start_tok"] + ntok[r["doc_id"]] - 1) // C
            assert r["chunk_id"] == shard * 1_000_000 + first
            assert r["n_chunks"] == last - first + 1


def test_dsir_excludes_target_slice(spark, catalog):
    rows = catalog["dsir_importance"].spark(spark, SF).collect()
    assert rows and all(r["doc_id"] % 50 != 0 for r in rows)


def test_decontam_reports_only_nontarget_docs(spark, catalog):
    rows = catalog["benchmark_decontam"].spark(spark, SF).collect()
    assert all(r["doc_id"] % 50 != 0 for r in rows)
    assert all(r["n_shared_grams"] >= 1 for r in rows)


def test_pii_redaction_is_complete(spark, catalog):
    """After redaction no email pattern or 6+-digit run survives, and
    injected rows are counted."""
    rows = catalog["pii_redact"].spark(spark, SF).collect()
    import re

    email = re.compile(r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}")
    num = re.compile(r"[0-9]{6,}")
    n_email_docs = n_num_docs = 0
    for r in rows:
        assert not email.search(r["redacted"]), r["doc_id"]
        assert not num.search(r["redacted"]), r["doc_id"]
        if r["doc_id"] % 7 == 0:
            assert r["n_emails"] == 1
            n_email_docs += 1
        elif r["doc_id"] % 11 == 0:
            assert r["n_longnums"] == 1
            n_num_docs += 1
        else:
            assert r["n_emails"] == 0 and r["n_longnums"] == 0
    assert n_email_docs > 0 and n_num_docs > 0


# ---------------------------------------------------------------------------
# round-6 corpus-assembly operators
# ---------------------------------------------------------------------------

def test_keep_best_representative_semantics(spark):
    """Argmax-quality survivor per cluster, min-id tiebreak, singletons
    survive — on a hand-built graph where the answer is obvious."""
    from fastembed_rs_spark.operators.dedup import keep_best_representative

    docs = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.9), (4, 0.5), (10, 0.1), (11, 0.3)],
        "doc_id long, quality double",
    )
    # cluster A = {1,2,3} (chain), cluster B = {10,11}, singleton {4}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    out = {r["doc_id"]: r for r in
           keep_best_representative(docs, pairs, "doc_id", "quality").collect()}
    assert len(out) == 6
    # argmax quality 0.9 shared by 2 and 3 -> min id 2 survives
    assert [out[i]["keep"] for i in (1, 2, 3)] == [0, 1, 0]
    assert all(out[i]["cluster_size"] == 3 for i in (1, 2, 3))
    assert all(out[i]["component"] == 1 for i in (1, 2, 3))
    assert [out[10]["keep"], out[11]["keep"]] == [0, 1]  # 0.3 > 0.1
    assert out[4]["keep"] == 1 and out[4]["cluster_size"] == 1
    # exactly one survivor per component
    comp_keeps: dict[int, int] = {}
    for r in out.values():
        comp_keeps[r["component"]] = comp_keeps.get(r["component"], 0) + r["keep"]
    assert set(comp_keeps.values()) == {1}


def test_token_budget_mix_is_greedy_quality_prefix(spark, catalog):
    """Kept docs per source are exactly the best-quality-first prefix whose
    pre-doc cumulative token count is under the budget."""
    from fastembed_rs_spark.queries import _MIX_BUDGET, _scored_docs

    kept = catalog["token_budget_mix"].spark(spark, SF).collect()
    scored = _scored_docs(spark, SF).collect()
    by_src: dict[str, list] = {}
    for r in scored:
        by_src.setdefault(r["source"], []).append(r)
    expect: dict[str, set] = {}
    for src, rows in by_src.items():
        rows.sort(key=lambda r: (-r["quality"], r["doc_id"]))
        cum, ids = 0, set()
        for r in rows:
            if cum < _MIX_BUDGET:
                ids.add(r["doc_id"])
            cum += r["n_tokens"]
        expect[src] = ids
    got: dict[str, set] = {}
    for r in kept:
        assert r["tokens_before"] < _MIX_BUDGET
        got.setdefault(r["source"], set()).add(r["doc_id"])
    assert got == expect


def test_weighted_sample_prefers_heavy_docs(spark, catalog):
    """Exactly k ranked rows, deterministic across runs, and the
    quality-weighted sample's mean quality exceeds the corpus mean."""
    from fastembed_rs_spark.queries import _WS_K, _scored_docs

    out = catalog["weighted_sample"].spark(spark, SF).collect()
    assert sorted(r["rank"] for r in out) == list(range(1, _WS_K + 1))
    again = catalog["weighted_sample"].spark(spark, SF).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    corpus = _scored_docs(spark, SF).collect()
    corpus_mean = sum(r["quality"] for r in corpus) / len(corpus)
    sample_mean = sum(r["quality"] for r in out) / len(out)
    assert sample_mean > corpus_mean


def test_backoff_score_held_out_split(spark, catalog):
    """Scores exist only for the held-out (odd) split, are positive, and
    n_trigrams matches the doc's token count."""
    from fastembed_rs_spark.functions.text import tokens

    out = catalog["backoff_trigram_score"].spark(spark, SF).collect()
    assert out and all(r["doc_id"] % 2 == 1 for r in out)
    assert all(r["surprisal"] > 0.0 for r in out)
    lens = {r["doc_id"]: r["n"] for r in
            spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", F.size(tokens("text")).alias("n")).collect()}
    for r in out:
        assert r["n_trigrams"] == max(lens[r["doc_id"]] - 2, 0)


def test_snapshot_diff_classes_partition_the_keyspace(spark, catalog):
    """Class counts must match the mutation rules exactly, and the four
    classes partition old ∪ new."""
    from fastembed_rs_spark.queries import (
        _DIFF_ADD, _DIFF_CHG, _DIFF_DEL, t as load,
    )

    out = {r["change_class"]: r for r in
           catalog["snapshot_diff"].spark(spark, SF).collect()}
    keys = [r["o_orderkey"] for r in
            load(spark, SF, "orders").select("o_orderkey").collect()]
    removed = {k for k in keys if k % _DIFF_DEL == 0}
    changed = {k for k in keys if k % _DIFF_CHG == 0} - removed
    added = {k for k in keys if k % _DIFF_ADD == 0}
    assert out["removed"]["n"] == len(removed)
    assert out["changed"]["n"] == len(changed)
    assert out["added"]["n"] == len(added)
    assert out["unchanged"]["n"] == len(keys) - len(removed) - len(changed)
    assert out["removed"]["key_checksum"] == sum(removed)
    assert out["changed"]["key_checksum"] == sum(changed)


def test_bpe_apply_matches_reference_merge_walk(spark, catalog):
    """Piece counts equal a pure-Python replay of the rank-ordered merge
    walk (Sennrich apply) on a sample of docs."""
    from fastembed_rs_spark.queries import _BPE_MERGES
    import re as _re

    def pieces(word: str) -> int:
        cur = " ".join(word)
        for a, b in _BPE_MERGES:
            cur = cur.replace(f"{a} {b}", f"{a}{b}")
        return len(cur.split(" "))

    out = {r["doc_id"]: r for r in
           catalog["bpe_apply"].spark(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(20).collect()
    for d in docs:
        toks = [w for w in _re.split(r"[^a-z0-9]+", d["text"].lower()) if w]
        if not toks:
            assert d["doc_id"] not in out
            continue
        assert out[d["doc_id"]]["n_tokens"] == len(toks)
        assert out[d["doc_id"]]["n_pieces"] == sum(pieces(w) for w in toks)
        # merging can only shrink: pieces never exceed characters
        assert out[d["doc_id"]]["n_pieces"] <= sum(len(w) for w in toks)


def test_group_winsorize_clip_accounting(spark, catalog):
    """Bounds sit inside each group's range, the clip counters match a
    direct recount, and the winsorized mean is inside [lo, hi]."""
    out = catalog["group_winsorize"].spark(spark, SF).collect()
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_type", "value").collect()
    by_type: dict[str, list[float]] = {}
    for r in ev:
        by_type.setdefault(r["event_type"], []).append(r["value"])
    assert {r["event_type"] for r in out} == set(by_type)
    for r in out:
        vals = by_type[r["event_type"]]
        assert r["n"] == len(vals)
        assert r["lo"] <= r["hi"]
        assert r["n_clipped_low"] == sum(1 for v in vals if v < r["lo"])
        assert r["n_clipped_high"] == sum(1 for v in vals if v > r["hi"])
        assert r["lo"] <= r["winsorized_mean"] <= r["hi"]


def test_stratified_split_partitions_and_ratios(spark, catalog):
    """Per-source counts sum to the source size, assignment is
    deterministic, and the global split ratio is near 80/10/10."""
    out = catalog["stratified_split"].spark(spark, SF).collect()
    again = catalog["stratified_split"].spark(spark, SF).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    src_n: dict[str, int] = {}
    split_n: dict[str, int] = {}
    for r in out:
        src_n[r["source"]] = src_n.get(r["source"], 0) + r["n"]
        split_n[r["split"]] = split_n.get(r["split"], 0) + r["n"]
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    truth = {r["source"]: r["n"] for r in
             docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert src_n == truth
    total = sum(split_n.values())
    assert 0.7 < split_n["train"] / total < 0.9
    assert split_n["val"] / total < 0.2 and split_n["test"] / total < 0.2


def test_keep_best_representative_matches_union_find_reference(spark):
    """Random pair graphs + random scores: the distributed CC + argmax must
    equal a pure-Python union-find with the same keep policy (argmax score,
    min-id ties), including singleton handling."""
    import random

    from fastembed_rs_spark.operators.dedup import keep_best_representative

    for seed in (7, 23, 101):
        rng = random.Random(seed)
        n = 60
        ids = list(range(n))
        scores = {i: round(rng.random(), 6) for i in ids}
        pairs = sorted({
            tuple(sorted(rng.sample(ids, 2))) for _ in range(rng.randint(5, 40))
        })
        parent = {i: i for i in ids}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            parent[find(a)] = find(b)
        comp_of = {i: min(j for j in ids if find(j) == find(i)) for i in ids}
        members: dict[int, list[int]] = {}
        for i in ids:
            members.setdefault(comp_of[i], []).append(i)
        expect = {}
        for c, ms in members.items():
            keeper = min(ms, key=lambda i: (-scores[i], i))
            for i in ms:
                expect[i] = (c, len(ms), int(i == keeper))

        docs = spark.createDataFrame(
            [(i, scores[i]) for i in ids], "doc_id long, quality double"
        )
        edges = spark.createDataFrame(pairs, "id_a long, id_b long")
        got = {
            r["doc_id"]: (r["component"], r["cluster_size"], r["keep"])
            for r in keep_best_representative(docs, edges, "doc_id", "quality").collect()
        }
        assert got == expect, f"seed {seed}"


def test_skew_report_stats_and_heavy_keys(spark, catalog):
    """Global stats match a direct recount; heavy keys are the true top-5
    with correct shares on every row."""
    out = catalog["skew_report"].spark(spark, SF).collect()
    orders = spark.read.parquet(f"{SF}/orders.parquet").collect()
    counts: dict[int, int] = {}
    for r in orders:
        counts[r["o_custkey"]] = counts.get(r["o_custkey"], 0) + 1
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [(r["key"], r["n"]) for r in sorted(out, key=lambda r: r["rnk"])] == top
    for r in out:
        assert r["total_rows"] == len(orders)
        assert r["n_keys"] == len(counts)
        assert r["max_group"] == max(counts.values())
        assert abs(r["share"] - r["n"] / len(orders)) < 1e-6


def test_minhash_estimate_tracks_exact_jaccard(spark, catalog):
    """The signature estimate must actually track exact Jaccard on the
    candidate set: mean abs error well under 0.5 (16 hashes -> se ~0.125)
    and est/jaccard positively correlated."""
    out = catalog["minhash_estimate_eval"].spark(spark, SF).collect()
    assert out
    mae = sum(r["abs_err"] for r in out) / len(out)
    assert mae < 0.3
    xs = [r["jaccard"] for r in out]
    ys = [r["est"] for r in out]
    mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
    cov = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    vx = sum((x - mx) ** 2 for x in xs)
    vy = sum((y - my) ** 2 for y in ys)
    if vx > 0 and vy > 0:
        assert cov / (vx * vy) ** 0.5 > 0.5


def test_tokenizer_fertility_consistency(spark, catalog):
    """Group rows must tile the corpus exactly (sums equal the per-doc
    token-count query's totals) and every ratio column must be the exact
    integer floor of its BIGINT sums — the cross-engine determinism
    contract."""
    out = catalog["tokenizer_fertility"].spark(spark, SF).collect()
    assert out
    per_doc = catalog["bpe_token_count"].spark(spark, SF).collect()
    assert sum(r["n_bpe_tokens"] for r in out) == sum(
        r["n_bpe_tokens"] for r in per_doc
    )
    assert sum(r["n_words"] for r in out) == sum(
        r["n_ws_tokens"] for r in per_doc
    )
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert sum(r["n_docs"] for r in out) == docs.count()
    assert sum(r["n_chars"] for r in out) == (
        docs.agg(F.sum("n_chars")).collect()[0][0]
    )
    for r in out:
        if r["n_words"]:
            assert r["fertility_tenk"] == r["n_bpe_tokens"] * 10000 // r["n_words"]
        if r["n_bpe_tokens"]:
            assert (
                r["chars_per_token_tenk"]
                == r["n_chars"] * 10000 // r["n_bpe_tokens"]
            )


def test_soft_dedup_weights_mass_conservation(spark, catalog):
    """Every document appears exactly once; a cluster of size k contributes
    k * (10000 div k) effective mass and singletons contribute 10000 — the
    totals must reconcile against the components query."""
    out = catalog["soft_dedup_weights"].spark(spark, SF).collect()
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    n_corpus = emb.count()
    assert sum(r["n_docs"] for r in out) == n_corpus
    comp = catalog["neardup_components"].spark(spark, SF).collect()
    n_clustered = len(comp)
    assert sum(r["n_dup_docs"] for r in out) == n_clustered
    expected_mass = (n_corpus - n_clustered) * 10000 + sum(
        10000 // r["cluster_size"] for r in comp
    )
    assert sum(r["effective_size_tenk"] for r in out) == expected_mass
    for r in out:
        assert r["effective_size_tenk"] <= r["n_docs"] * 10000
        if r["n_dup_docs"] == 0:
            assert r["effective_size_tenk"] == r["n_docs"] * 10000


def test_leakage_safe_split_no_cross_pairs(spark, catalog):
    """The whole point: zero near-dup pairs straddle splits, every doc is
    assigned exactly once, pair totals reconcile with the generator, and
    ratios stay near 80/10/10."""
    from fastembed_rs_spark.operators.dedup import jaccard_pairs_adaptive

    out = {r["split"]: r for r in catalog["leakage_safe_split"].spark(spark, SF).collect()}
    assert set(out) == {"train", "val", "test"}
    assert all(r["n_leaking"] == 0 for r in out.values())
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert sum(r["n_docs"] for r in out.values()) == docs.count()
    n_pairs = jaccard_pairs_adaptive(
        docs, "doc_id", "text", n=3, threshold=0.5
    ).count()
    assert sum(r["n_dup_pairs"] for r in out.values()) == n_pairs
    total = sum(r["n_docs"] for r in out.values())
    assert 0.7 < out["train"]["n_docs"] / total < 0.9
    assert out["val"]["n_docs"] / total < 0.2
    assert out["test"]["n_docs"] / total < 0.2
    for r in out.values():
        assert r["n_groups"] <= r["n_docs"]


def test_ann_recall_eval_bounds_and_exactness(spark, catalog):
    """One row per probe, hits bounded by k, recall_pct is the exact
    integer ratio, and the trained index clears a floor that a broken
    probe/assign path could not (random 2-of-8 buckets would land ~0.25)."""
    out = catalog["ann_recall_eval"].spark(spark, SF).collect()
    assert len(out) == 20
    assert {r["query_id"] for r in out} == set(range(20))
    for r in out:
        assert r["n_true"] == 10
        assert 0 <= r["n_hits"] <= 10
        assert r["recall_pct"] == r["n_hits"] * 100 // 10
    mean_recall = sum(r["n_hits"] for r in out) / (10 * len(out))
    assert mean_recall > 0.4


def test_dedup_threshold_sweep_monotone_and_reconciles(spark, catalog):
    """Rows must be monotone non-increasing as tau rises (suffix-sums of
    one histogram), and the tau=0.4 row must reconcile exactly with the
    embedding_neardup pair table the dedup family is built on."""
    out = {r["threshold_tenths"]: r
           for r in catalog["dedup_threshold_sweep"].spark(spark, SF).collect()}
    assert set(out) == set(range(2, 10))
    for col in ("n_pairs", "n_docs", "max_degree"):
        vals = [out[t][col] for t in range(2, 10)]
        assert all(a >= b for a, b in zip(vals, vals[1:])), (col, vals)
    pairs = catalog["embedding_neardup"].spark(spark, SF).collect()
    assert out[4]["n_pairs"] == len(pairs)
    nodes = {r["id_a"] for r in pairs} | {r["id_b"] for r in pairs}
    assert out[4]["n_docs"] == len(nodes)
    deg: dict[int, int] = {}
    for r in pairs:
        deg[r["id_a"]] = deg.get(r["id_a"], 0) + 1
        deg[r["id_b"]] = deg.get(r["id_b"], 0) + 1
    assert out[4]["max_degree"] == (max(deg.values()) if deg else 0)


def test_embedding_bucket_drift_psi_semantics(spark, catalog):
    """Shares must be Laplace-smoothed bucket occupancies that sum to ~1
    per label, psi_nano must equal the recomputed term sum, and a label
    whose mix matches the corpus mix must score lower than a concentrated
    one (PSI's whole point)."""
    import math

    rows = catalog["embedding_bucket_drift"].spark(spark, SF).collect()
    by_label: dict[str, list] = {}
    for r in rows:
        by_label.setdefault(r["label"], []).append(r)
    for label, rs in by_label.items():
        assert len(rs) == 8
        assert abs(sum(r["q_cmp"] for r in rs) - 1.0) < 1e-3
        assert abs(sum(r["p_ref"] for r in rs) - 1.0) < 1e-3
        psi = {r["psi_nano"] for r in rs}
        assert len(psi) == 1  # window sum is constant per label
        # each term (p-q)*ln(p/q) is >= 0 (signs agree), so the total can
        # only dip below zero by the per-term nano rounding (8 * 0.5)
        assert psi.pop() >= -8
        total = sum(
            round((r["p_ref"] - r["q_cmp"])
                  * math.log(r["p_ref"] / r["q_cmp"]) * 1e9)
            for r in rs
        )
        # recomputation from the 6-decimal ROUNDED p/q drifts up to
        # ~|ln(p/q)| * 5e-7 * 1e9 nano per term vs the exact-p/q sum the
        # query uses — a loose absolute bound on values of order 1e7+
        assert abs(total - rs[0]["psi_nano"]) < 20000


def test_cross_source_contamination_reconciles(spark, catalog):
    """Every containment pair lands in exactly one (source_a, source_b)
    cell, cross-cells count all their pairs as cross, diagonal cells none,
    and the micro-unit mean stays within the threshold..1.0 band."""
    pairs = catalog["containment_neardup"].spark(spark, SF).collect()
    out = catalog["cross_source_contamination"].spark(spark, SF).collect()
    assert sum(r["n_pairs"] for r in out) == len(pairs)
    src = {
        r["doc_id"]: r["source"]
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "source").collect()
    }
    cells: dict[tuple, int] = {}
    for p in pairs:
        a, b = sorted((src[p["id_a"]], src[p["id_b"]]))
        cells[(a, b)] = cells.get((a, b), 0) + 1
    assert {(r["source_a"], r["source_b"]): r["n_pairs"] for r in out} == cells
    for r in out:
        assert r["source_a"] <= r["source_b"]
        expected_cross = r["n_pairs"] if r["source_a"] != r["source_b"] else 0
        assert r["n_cross"] == expected_cross
        assert 600000 <= r["mean_containment_micro"] <= 1000000


def test_duplicate_cluster_profile_matches_union_find(spark, catalog):
    """Clusters must be the transitive closure of the jaccard pair set
    (python union-find reference), keyed by min member id, with exact
    member-attribute aggregates."""
    from fastembed_rs_spark.operators.dedup import jaccard_pairs_adaptive

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    pairs = jaccard_pairs_adaptive(
        docs, "doc_id", "text", n=3, threshold=0.5
    ).select("id_a", "id_b").collect()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for p in pairs:
        ra, rb = find(p["id_a"]), find(p["id_b"])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    members: dict[int, list[int]] = {}
    for node in parent:
        members.setdefault(find(node), []).append(node)
    attrs = {
        r["doc_id"]: r
        for r in docs.select("doc_id", "lang", "source", "n_chars").collect()
    }
    out = {r["component"]: r
           for r in catalog["duplicate_cluster_profile"].spark(spark, SF).collect()}
    assert set(out) == {min(ms) for ms in members.values()}
    for rep, ms in members.items():
        r = out[min(ms)]
        assert r["cluster_size"] == len(ms) >= 2
        assert r["n_langs"] == len({attrs[m]["lang"] for m in ms})
        assert r["n_sources"] == len({attrs[m]["source"] for m in ms})
        assert r["min_chars"] == min(attrs[m]["n_chars"] for m in ms)
        assert r["max_chars"] == max(attrs[m]["n_chars"] for m in ms)


def test_ann_probe_sweep_monotone_and_exhaustive_probe_is_exact(spark, catalog):
    """Hits and candidate totals must be non-decreasing in nprobe
    (suffix-sums over one rank histogram), the nprobe=k row must be
    EXACT (probing every bucket = brute force, recall 100%) and must
    scan query-count x corpus candidates, and the nprobe=2 row must
    reconcile with ann_recall_eval's per-query hits."""
    out = {r["nprobe"]: r
           for r in catalog["ann_probe_sweep"].spark(spark, SF).collect()}
    assert set(out) == set(range(1, 9))
    for col in ("n_hits", "total_candidates"):
        vals = [out[p][col] for p in range(1, 9)]
        assert all(a <= b for a, b in zip(vals, vals[1:])), (col, vals)
    for r in out.values():
        assert r["recall_micro"] == r["n_hits"] * 1_000_000 // 200
        assert r["avg_candidates"] == r["total_candidates"] // 20
    n_vec = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert out[8]["n_hits"] == 200
    assert out[8]["recall_micro"] == 1_000_000
    assert out[8]["total_candidates"] == 20 * n_vec
    recall = catalog["ann_recall_eval"].spark(spark, SF).collect()
    assert out[2]["n_hits"] == sum(r["n_hits"] for r in recall)


def test_pq_reconstruction_error_matches_numpy_assign(spark, catalog):
    """Every subspace row must cover the whole corpus, derived columns
    must be the exact integer ratios, and subspace 0's SSE must equal an
    independent NumPy nearest-code recompute (round-6 then micro-units,
    ties to the lowest code id) from the trained codebooks."""
    import numpy as np

    from fastembed_rs_spark.operators import pq

    out = {r["subspace"]: r
           for r in catalog["pq_reconstruction_error"].spark(spark, SF).collect()}
    assert set(out) == set(range(8))
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    n = emb.count()
    for r in out.values():
        assert r["n_vectors"] == n
        assert 1 <= r["codes_used"] <= 8
        assert r["mse_micro"] == r["sse_micro"] // n
        assert r["max_code_share_permille"] >= 1000 // 8 - 1
    books = pq.train_pq_codebooks(
        emb, "vec_id", "embedding", m=8, dsub=8, k=8, iters=2
    )
    codes0 = np.array([
        r["code_vec"] for r in sorted(
            books.filter("subspace = 0").collect(),
            key=lambda r: r["code_id"],
        )
    ])
    sub0 = np.array(
        [r["embedding"][:8] for r in emb.select("embedding").collect()],
        dtype=np.float64,
    )
    d2 = ((sub0[:, None, :] - codes0[None, :, :]) ** 2).sum(axis=2)
    d2r = np.round(d2, 6)
    best = d2r.min(axis=1)  # argmin value; ties share the same d2
    sse = int(np.round(best * 1_000_000).sum())
    assert out[0]["sse_micro"] == sse


def test_minhash_band_curve_scurve_ordering_and_fixed_point(spark, catalog):
    """Sharper configs (more rows/band) must expect fewer candidates and
    miss more true pairs, the (16,1) config must miss true pairs by at
    most the 2^-16 tail, and every aggregate must equal a pure-Python
    replay of the integer fixed-point chain over the measured pairs."""
    from fastembed_rs_spark.operators import dedup as D
    from fastembed_rs_spark.operators.fast_text import (
        minhash_signatures_fast,
        verify_candidates_fast,
    )

    out = {(r["bands"], r["rows_per_band"]): r
           for r in catalog["minhash_band_curve"].spark(spark, SF).collect()}
    cfgs = [(16, 1), (8, 2), (4, 4), (2, 8), (1, 16)]
    assert set(out) == set(cfgs)
    exp = [out[c]["exp_candidates_micro"] for c in cfgs]
    miss = [out[c]["exp_missed_true_micro"] for c in cfgs]
    assert all(a >= b for a, b in zip(exp, exp[1:])), exp
    assert all(a <= b for a, b in zip(miss, miss[1:])), miss
    n_true = out[cfgs[0]]["n_true_pairs"]
    assert len({out[c]["n_pairs"] for c in cfgs}) == 1
    assert len({out[c]["n_true_pairs"] for c in cfgs}) == 1
    assert out[(16, 1)]["exp_missed_true_micro"] <= n_true * 16

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    sigs = minhash_signatures_fast(docs, "doc_id", "text", k_shingle=5)
    cand = D.lsh_candidate_pairs(sigs, "doc_id", bands=4, rows_per_band=4)
    jms = [
        int(round(r["jaccard"] * 1_000_000))
        for r in verify_candidates_fast(
            cand, docs, "doc_id", "text", k_shingle=5, threshold=0.1
        ).collect()
    ]
    assert out[cfgs[0]]["n_pairs"] == len(jms)

    def p_micro(jm: int, b: int, r: int) -> int:
        acc = jm
        for _ in range(r - 1):
            acc = acc * jm // 1_000_000
        q = 1_000_000 - acc
        accq = q
        for _ in range(b - 1):
            accq = accq * q // 1_000_000
        return 1_000_000 - accq

    for b, r in cfgs:
        assert out[(b, r)]["exp_candidates_micro"] == sum(
            p_micro(jm, b, r) for jm in jms
        )
        assert out[(b, r)]["exp_missed_true_micro"] == sum(
            1_000_000 - p_micro(jm, b, r) for jm in jms if jm >= 500_000
        )


def test_kmeans_distortion_ladder_monotone_and_reconciles(spark, catalog):
    """SSE must shrink monotonically down the ladder (k=1 is variance
    around the trained global mean, already below raw energy; more
    centroids can only help on this clustered corpus), explained share
    must be the exact integer permille, and the k=0/k=1 rows must equal
    independent NumPy recomputes (raw energy; train k=1 then L2 SSE
    against the single trained centroid)."""
    import numpy as np

    from fastembed_rs_spark.operators.topk import train_ivf_centroids

    out = {r["k"]: r
           for r in catalog["kmeans_distortion_ladder"].spark(spark, SF).collect()}
    assert set(out) == {0, 1, 2, 4, 8}
    sses = [out[k]["sse_micro"] for k in (0, 1, 2, 4, 8)]
    assert all(a > b for a, b in zip(sses, sses[1:])), sses
    for k, r in out.items():
        assert r["explained_permille"] == (
            (out[0]["sse_micro"] - r["sse_micro"]) * 1000
            // out[0]["sse_micro"]
        )
    assert out[0]["explained_permille"] == 0
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    vecs = np.array(
        [r["embedding"] for r in emb.select("embedding").collect()],
        dtype=np.float64,
    )
    e0 = int(np.round(np.round((vecs ** 2).sum(axis=1), 6) * 1_000_000).sum())
    assert out[0]["sse_micro"] == e0
    c1 = np.array(
        train_ivf_centroids(emb, k=1, iters=3).collect()[0]["centroid_vec"]
    )
    d2 = np.round(((vecs - c1[None, :]) ** 2).sum(axis=1), 6)
    assert out[1]["sse_micro"] == int(np.round(d2 * 1_000_000).sum())


def test_packing_efficiency_sweep_reconciles(spark, catalog):
    """Every row must reconcile with a Python replay over the raw token
    counts (pad and concat strategies), efficiencies must be exact
    integer permille, and monotonicity must hold: truncation shrinks and
    pad efficiency rises as max_len drops toward the median length...
    specifically tokens_truncated decreases in max_len while
    n_seqs_concat decreases too."""
    from fastembed_rs_spark.functions.text import tokens as tok_expr

    out = {r["max_len"]: r
           for r in catalog["packing_efficiency_sweep"].spark(spark, SF).collect()}
    assert set(out) == {64, 128, 256, 512, 1024}
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    lens = [
        r["n"] for r in docs.select(
            F.size(tok_expr("text")).alias("n")
        ).collect() if r["n"] > 0
    ]
    total = sum(lens)
    for L, r in out.items():
        assert r["n_docs"] == len(lens)
        assert r["total_tokens"] == total
        assert r["n_docs_over"] == sum(1 for x in lens if x > L)
        assert r["tokens_truncated"] == sum(x - L for x in lens if x > L)
        kept = sum(min(x, L) for x in lens)
        assert r["pad_waste"] == len(lens) * L - kept
        assert r["pad_efficiency_permille"] == kept * 1000 // (len(lens) * L)
        nseq = (total + L - 1) // L
        assert r["n_seqs_concat"] == nseq
        assert r["concat_efficiency_permille"] == total * 1000 // (nseq * L)
    ls = sorted(out)
    assert all(out[a]["tokens_truncated"] >= out[b]["tokens_truncated"]
               for a, b in zip(ls, ls[1:]))
    assert all(out[a]["n_seqs_concat"] >= out[b]["n_seqs_concat"]
               for a, b in zip(ls, ls[1:]))


def test_source_overlap_matrix_estimates_and_audit(spark, catalog):
    """One row per unordered source pair, sketch bounds hold
    (n_both <= kk <= 256), the exact-audit column must match a Python
    set-intersection replay of the mixed token hashes, and for pairs
    whose union fits entirely in the sketch (kk < 256) the 'estimate'
    must be EXACT: est_jaccard * kk == actual n_both and est_union ==
    true union size."""
    from fastembed_rs_spark.functions.text import token_hash, tokens as tok_expr

    out = {(r["source_a"], r["source_b"]): r
           for r in catalog["source_overlap_matrix"].spark(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    hs = docs.select(
        "source", F.explode(tok_expr("text")).alias("token")
    ).select(
        "source",
        ((token_hash(F.col("token")) * 2654435761) % 4294967296).alias("h"),
    ).distinct().collect()
    sets: dict[str, set] = {}
    for r in hs:
        sets.setdefault(r["source"], set()).add(r["h"])
    srcs = sorted(sets)
    assert set(out) == {(a, b) for i, a in enumerate(srcs)
                        for b in srcs[i + 1:]}
    for (a, b), r in out.items():
        inter = sets[a] & sets[b]
        union = sets[a] | sets[b]
        assert r["actual_overlap"] == len(inter)
        assert 0 <= r["n_both"] <= r["kk"] <= 256
        if r["kk"] < 256:  # whole union fits: sketch IS the union
            assert r["kk"] == len(union)
            assert r["n_both"] == len(inter)
            assert r["est_union"] == float(len(union))


def test_shard_balance_plan_replays_snake_placement(spark, catalog):
    """Shard totals must equal a pure-Python snake-placement replay over
    the raw token counts, shard doc counts differ by at most 1, the
    permille loads sum to ~S*1000, and the snake must balance at least as
    well as naive round-robin dealing on the same sorted order."""
    from fastembed_rs_spark.functions.text import tokens as tok_expr
    from fastembed_rs_spark.queries import _N_SHARDS as S

    out = {r["shard"]: r
           for r in catalog["shard_balance_plan"].spark(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    dt = sorted(
        ((r["doc_id"], r["n"]) for r in docs.select(
            "doc_id", F.size(tok_expr("text")).alias("n")).collect()),
        key=lambda x: (-x[1], x[0]),
    )
    snake = {s: [0, 0] for s in range(S)}
    rr = {s: 0 for s in range(S)}
    for rn, (_, tk) in enumerate(dt):
        pos = rn % S
        shard = pos if (rn // S) % 2 == 0 else S - 1 - pos
        snake[shard][0] += 1
        snake[shard][1] += tk
        rr[pos] += tk
    total = sum(tk for _, tk in dt)
    assert set(out) == set(range(S))
    for s, r in out.items():
        assert r["n_docs"] == snake[s][0]
        assert r["shard_tokens"] == snake[s][1]
        assert r["load_permille_of_ideal"] == snake[s][1] * S * 1000 // total
    docs_per = [out[s]["n_docs"] for s in range(S)]
    assert max(docs_per) - min(docs_per) <= 1
    loads = [out[s]["load_permille_of_ideal"] for s in range(S)]
    assert S * 1000 - S <= sum(loads) <= S * 1000
    spread_snake = max(v[1] for v in snake.values()) - min(
        v[1] for v in snake.values())
    spread_rr = max(rr.values()) - min(rr.values())
    assert spread_snake <= spread_rr


def test_vocab_divergence_information_bounds(spark, catalog):
    """Per-source entropy must sit in [0, ln(vocab)] and KL(source||corpus)
    must be non-negative — both within the summed nano-rounding slack
    (each term is rounded to the nearest nano-unit, so a sum of V terms
    carries at most V/2 nano of error) — and a pure-Python replay over the
    raw token counts must agree to the same slack."""
    import math
    from collections import Counter

    from fastembed_rs_spark.functions.text import tokens as tok_expr

    out = {r["source"]: r
           for r in catalog["vocab_divergence"].spark(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    per_src: dict[str, Counter] = {}
    for r in docs.select("source", tok_expr("text").alias("tk")).collect():
        per_src.setdefault(r["source"], Counter()).update(r["tk"])
    corpus = Counter()
    for cnt in per_src.values():
        corpus.update(cnt)
    nn = sum(corpus.values())
    assert set(out) == {s for s, c in per_src.items() if c}
    for src, r in out.items():
        cnt = per_src[src]
        n = sum(cnt.values())
        assert r["n_tokens"] == n
        assert r["vocab"] == len(cnt)
        slack = len(cnt)  # 0.5 nano per rounded term, doubled for safety
        assert -slack <= r["entropy_nano"] <= math.log(len(cnt)) * 1e9 + slack
        assert r["kl_vs_corpus_nano"] >= -slack
        h = sum(round((c / n) * math.log(c / n) * 1e9)
                for c in cnt.values())
        kl = sum(round((c / n) * math.log((c * nn) / (n * corpus[t])) * 1e9)
                 for t, c in cnt.items())
        assert abs(r["entropy_nano"] - (-h)) <= slack
        assert abs(r["kl_vs_corpus_nano"] - kl) <= slack


def test_simhash_hamming_curve_monotone_and_anchored(spark, catalog):
    """The sweep must be a valid prefix-sum family: candidates and captured
    non-decreasing in h, missed non-increasing, captured+missed constant,
    precision only -1 where candidates are 0, and the h=32 row must equal
    an independent recount of the measured pair set (every pair is within
    Hamming 32 of every other on a 32-bit fingerprint)."""
    from fastembed_rs_spark.operators import dedup as D
    from fastembed_rs_spark.operators.fast_text import (
        minhash_signatures_fast,
        verify_candidates_fast,
    )
    from fastembed_rs_spark.queries import t as tbl

    out = {r["h"]: r
           for r in catalog["simhash_hamming_curve"].spark(spark, SF).collect()}
    assert set(out) == set(range(33))
    for h in range(1, 33):
        assert out[h]["n_candidates"] >= out[h - 1]["n_candidates"]
        assert out[h]["n_true_captured"] >= out[h - 1]["n_true_captured"]
        assert out[h]["n_true_missed"] <= out[h - 1]["n_true_missed"]
    totals = {out[h]["n_true_captured"] + out[h]["n_true_missed"]
              for h in range(33)}
    assert len(totals) == 1
    for h in range(33):
        r = out[h]
        if r["n_candidates"] == 0:
            assert r["precision_permille"] == -1
        else:
            assert r["precision_permille"] == (
                r["n_true_captured"] * 1000 // r["n_candidates"])
    docs = tbl(spark, SF, "documents")
    sigs = minhash_signatures_fast(docs, "doc_id", "text", k_shingle=5)
    cand = D.lsh_candidate_pairs(sigs, "doc_id", bands=4, rows_per_band=4)
    pairs = verify_candidates_fast(
        cand, docs, "doc_id", "text", k_shingle=5, threshold=0.1)
    n_pairs = pairs.count()
    n_true = pairs.filter(F.col("jaccard") >= 0.5).count()
    assert out[32]["n_candidates"] == n_pairs
    assert out[32]["n_true_captured"] == n_true
    assert out[32]["n_true_missed"] == 0
