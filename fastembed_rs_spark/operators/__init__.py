from fastembed_rs_spark.operators.topk import cosine_top_k  # noqa: F401
from fastembed_rs_spark.operators.rerank import rerank  # noqa: F401
from fastembed_rs_spark.operators.mmr import mmr_rerank  # noqa: F401
from fastembed_rs_spark.operators.bloom import (  # noqa: F401
    bloom_build,
    bloom_prune,
    bloom_semi_join,
)
from fastembed_rs_spark.operators.chunk import (  # noqa: F401
    chunk_by_chars,
    chunk_by_tokens,
)
from fastembed_rs_spark.operators.curation_store import (  # noqa: F401
    CurationStore,
    build_curation_store,
    cluster_profile_from_store,
    component_summary_from_store,
    keep_best_from_store,
    leakage_safe_split_from_store,
    load_curation_store,
    soft_dedup_weights_from_store,
)
from fastembed_rs_spark.operators.ivf_index import (  # noqa: F401
    IndexWriterLockHeld,
    append_ivf_index,
    audit_ivf_index,
    build_ivf_index,
    compact_ivf_index,
    index_file_stats,
    load_ivf_index,
    query_ivf_index,
    repair_ivf_index,
    retrain_ivf_index,
)
