from fastembed_rs_spark.functions.vector import (  # noqa: F401
    cosine_similarity,
    dot,
    l2_norm,
    l2_normalize,
)
from fastembed_rs_spark.functions.text import (  # noqa: F401
    char_shingles,
    doc_fingerprint,
    token_hash,
    token_hashes,
    tokens,
)
