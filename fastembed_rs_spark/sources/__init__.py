from fastembed_rs_spark.sources.io import (  # noqa: F401
    read_documents,
    read_images,
    compact_parquet,
    upsert_embeddings,
    write_embeddings,
)
