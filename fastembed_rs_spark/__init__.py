"""fastembed_rs_spark — a PySpark-native batch embedding + vector-analytics engine.

Re-expresses the capabilities of the reference library ``Anush008/fastembed-rs``
(dense / sparse / multi-vector text embeddings, image embeddings, cross-encoder
reranking, cosine similarity top-k — see ``/root/reference/src/lib.rs:2-12``)
as idiomatic Spark:

* similarity math, ranking, dedup and text analytics are **pure DataFrame
  algebra** (higher-order array functions, windows, hash-joins) that Catalyst
  optimizes and whole-stage-codegens;
* model inference (tokenizer + ONNX session) runs inside **Arrow-batched
  pandas UDFs** with a per-executor lazy session singleton — the Spark
  translation of the reference's stateful ``TextEmbedding`` handle
  (``src/text_embedding/init.rs:141-148``).

Everything is designed for multi-executor scale: broadcast the small side,
shuffle only on aggregation keys, keep expressions JVM-side unless inference
genuinely requires Python.
"""

__version__ = "0.1.0"

from fastembed_rs_spark.api import (  # noqa: F401
    Bgem3Embedding,
    ImageEmbedding,
    InitOptions,
    SparseTextEmbedding,
    TextEmbedding,
    TextRerank,
)
from fastembed_rs_spark.functions.vector import (  # noqa: F401
    # src/similarity.rs:14-40 — the reference's public similarity surface,
    # as Catalyst column expressions / the distributed top-k operator
    cosine_similarity,
    dot,
)
from fastembed_rs_spark.operators.topk import cosine_top_k  # noqa: F401
from fastembed_rs_spark.session import get_spark  # noqa: F401
