from fastembed_rs_spark.streaming.join_stream import (  # noqa: F401
    enrich_stream,
    view_click_attribution,
)
from fastembed_rs_spark.streaming.neardup_stream import neardup_stream  # noqa: F401
from fastembed_rs_spark.streaming.topk_stream import topk_stream  # noqa: F401
from fastembed_rs_spark.streaming.pipelines import (  # noqa: F401
    dedup_to_store_stream,
    dedup_stream,
    drift_against_reference,
    drift_finalize,
    embedding_drift_registers,
    embed_stream,
    embed_to_parquet_stream,
    index_ingest_stream,
    kmv_quantile_store_stream,
    sessionize_stream,
    windowed_event_counts,
)
