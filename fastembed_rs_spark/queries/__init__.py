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

# Family modules in REGISTRATION ORDER — importing each module runs
# its @q decorators against the shared QUERIES registry in _core, so
# this import sequence IS the catalog order (ties in the rotation
# sort keep it). Every top-level name is then re-exported so all
# pre-split imports (`from fastembed_rs_spark.queries import X`,
# including the tests' private helpers) resolve unchanged.
from fastembed_rs_spark.queries._core import (  # noqa: F401
    Callable,
    D,
    DataFrame,
    EH,
    EMB_DIM,
    F,
    HASH_MOD,
    QUERIES,
    QuerySpec,
    SparkSession,
    TABLES,
    TS,
    Window,
    _dk_cos,
    _dk_dot,
    _dk_norm,
    _dk_shingles,
    annotations,
    assign_ivf_buckets,
    assign_ivf_buckets_fast,
    cosine_similarity,
    cosine_top_k,
    dataclass,
    dot,
    duck_doc_fingerprint,
    duck_split_80_10_10,
    duck_token_hash,
    duck_tokens,
    ivf_top_k,
    os,
    q,
    rerank,
    split_80_10_10,
    t,
    token_overlap_score,
)
from fastembed_rs_spark.queries.similarity import (  # noqa: F401
    _ALL_SW,
    _ANN_ID_BOUND,
    _DUCK_QUALITY_EXPR,
    _HASH_EMBED_ORACLE,
    _IVF_ORACLE,
    _IVF_PQ_ORACLE,
    _LANG_ORACLE,
    _PQ_DSUB,
    _PQ_EVERY,
    _PQ_M,
    _PQ_ORACLE,
    _PQ_SLICE,
    _QUALITY_ORACLE,
    _RERANK_ORACLE,
    _SIMHASH_ORACLE,
    _SPARSE_DOT_ORACLE,
    _SPLADE_ORACLE,
    _duck_quality_ctes,
    _duck_stats_ctes,
    _lang_hits,
    _minhash_cand_ctes,
    _minhash_oracle,
    _pq_train_enc_ctes,
    _pq_trained_oracle,
    _simhash_sql,
    q_ann_ivf_pq_topk,
    q_ann_ivf_topk,
    q_ann_pq_adc,
    q_ann_pq_rescore,
    q_ann_pq_trained,
    q_cosine_topk,
    q_cosine_topk_filtered,
    q_dense_hash_embed,
    q_doc_fingerprint,
    q_dot_pairs,
    q_embedding_neardup,
    q_exact_dedup,
    q_lang_id,
    q_minhash_lsh,
    q_rerank_overlap,
    q_simhash,
    q_sparse_dot_topk,
    q_splade_hash_sparse,
    q_text_quality,
)
from fastembed_rs_spark.queries.relational import (  # noqa: F401
    _BPE_RE,
    _COLBERT_ORACLE,
    _COLBERT_TOKENS,
    _JL_OUT,
    _MAXSIM,
    _MIX_CAP,
    _NGRAM_ORACLE,
    _NS_PER_S,
    _SPAN_N,
    _dk_jl,
    _ngram_allpairs_oracle,
    q_bpe_token_count,
    q_brand_revenue,
    q_cluster_balanced_sample,
    q_colbert_maxsim,
    q_embedding_outliers,
    q_events_hourly,
    q_events_sessionize,
    q_jaccard_adaptive,
    q_jaccard_prefix,
    q_jl_project_topk,
    q_local_supplier_volume,
    q_ngram_jaccard,
    q_pricing_summary,
    q_repeated_spans,
    q_shipping_priority,
    q_top_customers,
)
from fastembed_rs_spark.queries.model_stubs import (  # noqa: F401
    _CROSSMODAL_ORACLE,
    _ivf_train_ctes,
    _ivf_trained_oracle,
    q_ann_ivf_trained,
    q_crossmodal_similarity,
    q_embed_bgem3_stub,
    q_embed_image_stub,
    q_embed_sparse_stub,
    q_embed_text_stub,
    q_embed_text_stub_packed,
    q_rerank_model_stub,
)
from fastembed_rs_spark.queries.timeseries_sketches import (  # noqa: F401
    _CURATION_ORACLE,
    _EDGE_SQL,
    _LSH_BANDS,
    _TOKEN_HASH_ROWS,
    _bm25_oracle,
    _dk_pack_bits,
    _hybrid_rrf_oracle,
    _lsh_oracle,
    _lsh_planes,
    q_ann_lsh_topk,
    q_binary_quant_topk,
    q_bm25_topk,
    q_corpus_curation,
    q_deterministic_sample,
    q_events_asof,
    q_events_range_join,
    q_heavy_hitters,
    q_hll_distinct,
    q_hybrid_rrf_topk,
    q_int8_quant_topk,
    q_kmv_distinct,
    q_large_order_customers,
    q_mrl_truncate_topk,
    q_neardup_components,
    q_price_histogram,
    q_small_quantity_revenue,
)
from fastembed_rs_spark.queries.relational_events import (  # noqa: F401
    _CHUNK_KEY,
    _RAG_MAXP_ORACLE,
    q_bloom_semijoin_revenue,
    q_brand_buyers_setops,
    q_chunk_documents,
    q_chunk_documents_tokens,
    q_clean_text,
    q_cms_heavy_estimate,
    q_customers_without_orders,
    q_events_props_json,
    q_multimodal_probe,
    q_order_items_array,
    q_orders_by_month,
    q_rag_passage_topk,
    q_revenue_cube,
    q_revenue_rollup,
    q_stratified_sample,
    q_tfidf_top_terms,
    q_user_journey,
    q_user_rolling_value,
    q_value_percentiles,
    q_value_percentiles_approx,
    q_value_quartiles,
)
from fastembed_rs_spark.queries.curation import (  # noqa: F401
    _BIGRAM_LIFT_ORACLE,
    _CHUNK_DEDUP_ORACLE,
    _DK_GRAM5,
    _DSIR_B,
    _PACK_C,
    _PACK_SHARDS,
    _PII_EMAIL,
    _PII_NUM,
    _RETRIEVE_RERANK_ORACLE,
    _SAMPLED_PCTL_GROUPED_ORACLE,
    _SAMPLED_PCTL_ORACLE,
    _SEMDEDUP_ORACLE,
    _SEMDEDUP_TAU,
    _VOCAB_ORACLE,
    _mmr_oracle,
    q_benchmark_decontam,
    q_bigram_lift,
    q_brand_bracket_revenue,
    q_chunk_exact_dedup,
    q_customer_order_distribution,
    q_customers_with_returns,
    q_daily_activity_reconcile,
    q_domain_mix_weights,
    q_dsir_importance,
    q_embed_qwen_vl_stub,
    q_embedding_stats,
    q_events_funnel,
    q_hll_distinct_per_lang,
    q_incremental_dedup,
    q_incremental_embed,
    q_mmr_diversify,
    q_nation_trade_volume,
    q_order_priority_pending,
    q_order_rank_profile,
    q_pii_redact,
    q_promo_market_share,
    q_promo_revenue_share,
    q_repetition_signals,
    q_retrieve_then_rerank,
    q_returned_items_top_customers,
    q_sales_opportunity_segments,
    q_semantic_dedup,
    q_sequence_packing,
    q_token_vocab_coverage,
    q_top_supplier_revenue,
    q_unigram_surprisal,
    q_user_event_pivot,
    q_value_by_type_salted,
    q_value_percentiles_sampled,
    q_value_percentiles_sampled_by_type,
)
from fastembed_rs_spark.queries.lm_tokenizer import (  # noqa: F401
    _BACKOFF_ORACLE,
    _BIGRAM_SURPRISAL_ORACLE,
    _BPE_MERGES,
    _BPE_ORACLE,
    _DIFF_ADD,
    _DIFF_ADD_OFFSET,
    _DIFF_CHG,
    _DIFF_DEL,
    _EPOCH_SHUFFLE_ORACLE,
    _FUZZY_DELETE_KEYS,
    _MIX_BUDGET,
    _QC_ORACLE,
    _QC_WEIGHTS,
    _QUAL_SRC_CTE,
    _RQ_E1,
    _RQ_E2,
    _RQ_ENC_CTES,
    _RQ_ID_BOUND,
    _WS_K,
    _dk_sqdist,
    _duck_bpe_apply,
    _minhash_eval_oracle,
    _scored_docs,
    q_ann_rq_adc,
    q_backoff_trigram_score,
    q_bigram_surprisal,
    q_bpe_apply,
    q_bpe_merge_step,
    q_chi2_token_select,
    q_dedup_keep_best,
    q_epoch_shuffle,
    q_events_anomaly_days,
    q_fuzzy_vocab_join,
    q_group_winsorize,
    q_minhash_estimate_eval,
    q_quality_classifier,
    q_scd2_history,
    q_skew_report,
    q_snapshot_diff,
    q_stratified_split,
    q_token_budget_mix,
    q_weighted_sample,
)
from fastembed_rs_spark.queries.graph_mining import (  # noqa: F401
    _CORR_FEATS,
    _GRAMS_CTE,
    _GRAPH_EDGE2_CTES,
    _GRAPH_EDGE_CTES,
    _KMV_K,
    _KMV_MIX_MOD,
    _SPLIT_CASE_SQL,
    _TRAIN8_CENT,
    _TRAIN8_CTES,
    _corr_oracle,
    _fill_graph_pagerank_oracle,
    _kcore_oracle,
    _kmv_key_hashes_sql,
    _lp_audit,
    _lp_round_sql,
    _pagerank_oracle,
    q_association_rules,
    q_cluster_medoids,
    q_cohort_retention,
    q_containment_neardup,
    q_event_transitions,
    q_feature_correlations,
    q_graph_kcore,
    q_graph_pagerank,
    q_graph_triangles,
    q_grouped_linregress,
    q_join_size_estimate,
    q_label_propagation,
    q_label_propagation_bounded,
    q_margin_mining,
    q_pareto_front,
    q_psi_drift,
    q_reciprocal_nn,
    q_robust_value_outliers,
    q_split_leakage_report,
    q_training_triples,
)
from fastembed_rs_spark.queries.monitoring import (  # noqa: F401
    _BAND_CONFIGS,
    _GSPLIT_CASE_SQL,
    _LADDER_KS,
    _N_SHARDS,
    _PACK_SWEEP_LENS,
    _PROFILE_COLS,
    _ann_recall_oracle,
    _band_curve_oracle,
    _bucket_drift_oracle,
    _kmeans_ladder_oracle,
    _pq_recon_oracle,
    _probe_sweep_oracle,
    _scurve_micro,
    _simhash_curve_oracle,
    q_ann_probe_sweep,
    q_ann_recall_eval,
    q_cross_source_contamination,
    q_dedup_threshold_sweep,
    q_curation_store_audit,
    q_duplicate_cluster_profile,
    q_embedding_bucket_drift,
    q_index_lifecycle_audit,
    q_index_repair_audit,
    q_index_retrain_compact_audit,
    q_kmeans_distortion_ladder,
    q_label_coherence,
    q_leakage_safe_split,
    q_minhash_band_curve,
    q_packing_efficiency_sweep,
    q_pq_reconstruction_error,
    q_quality_percent_rank,
    q_shard_balance_plan,
    q_simhash_hamming_curve,
    q_soft_dedup_weights,
    q_source_overlap_matrix,
    q_table_profile,
    q_tokenizer_fertility,
    q_vocab_divergence,
)
from fastembed_rs_spark.queries.tpch_synth import (  # noqa: F401
    _FPS_MILLI,
    _FRAME_SLOTS,
    _GRAM_SCALE,
    _LATENESS_SQL,
    _PS_SYNTH_SQL,
    _Q11_NATIONS,
    _Q16_SIZES,
    _SHIPMODES,
    _SPECTRUM_ITERS,
    _lateness_col,
    _partsupp_synth,
    _spectrum_oracle,
    q_embedding_spectrum,
    q_important_stock_share,
    q_late_delivery_suppliers,
    q_minimum_cost_supplier,
    q_product_type_profit,
    q_promotion_stock_suppliers,
    q_shipmode_priority,
    q_supplier_part_variety,
    q_video_frame_plan,
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
    # round-9 additions
    "index_lifecycle_audit",
    "index_repair_audit",
    "index_retrain_compact_audit",
    # round-10 addition
    "curation_store_audit",
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

    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
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
    # r11: LM n-gram family fused to one corpus scan / marginals derived
    # from the checkpointed type table
    "backoff_trigram_score",
    "bigram_surprisal",
    # r11: connected_components driver-tier gate + jump fold touch every
    # CC-family consumer; the gram-id assignment moved inside the dedup
    # checkpoint touches the prefix-jaccard family
    "neardup_components",
    "semantic_dedup",
    "corpus_curation",
    "dedup_keep_best",
    "duplicate_cluster_profile",
    "leakage_safe_split",
    "soft_dedup_weights",
    "cross_source_contamination",
    "split_leakage_report",
    "jaccard_prefix_neardup",
    "jaccard_adaptive_neardup",
    "ngram_jaccard_neardup",
    "containment_neardup",
    # r11: store build/read overlap (prewarm, reps-write ∥ counts) and the
    # retrain tmp-write overlap — re-verify the audits that drive them
    "curation_store_audit",
    "index_retrain_compact_audit",
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
