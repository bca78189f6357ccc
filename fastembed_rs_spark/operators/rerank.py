"""Cross-encoder style reranking as DataFrame algebra.

Reference: ``TextRerank::rerank(query, documents, ...)`` tokenizes (query, doc)
pairs, scores each with the model, and sorts desc (src/reranking/impl.rs:109-196).

Spark shape: a (query × candidate) pair DataFrame, a pluggable pair-scoring
column or pandas UDF, and a per-query ``row_number()`` ranking — the
multi-query generalization of the reference's single-query global sort.

Two scorers are provided:

* ``token_overlap_score`` — a deterministic lexical relevance score
  (token-set Jaccard), pure Catalyst, DuckDB-verifiable; used as the default
  stub scorer when no ONNX cross-encoder is available in the environment.
* a model scorer via ``fastembed_rs_spark.models.runtime`` (pandas UDF over
  the pair batch) when onnxruntime + a model artifact are present.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from fastembed_rs_spark.functions.text import tokens


def token_overlap_score(query_text: Column | str, doc_text: Column | str) -> Column:
    """Jaccard similarity of distinct token sets, in DOUBLE.

    inter = |{q} ∩ {d}| via hash-based ``array_intersect`` (both sides
    distinct first), union = |q| + |d| - inter; 0.0 when both empty.
    The formula is written so the DuckDB oracle can mirror it verbatim
    (``list_intersect``).
    """
    q = F.array_distinct(tokens(query_text))
    d = F.array_distinct(tokens(doc_text))
    inter = F.size(F.array_intersect(q, d)).cast("double")
    union = F.size(q).cast("double") + F.size(d).cast("double") - inter
    return F.when(union == 0.0, F.lit(0.0)).otherwise(inter / union)


def rerank(
    pairs: DataFrame,
    score: Column,
    k: int | None = None,
    query_id: str = "query_id",
    doc_id: str = "doc_id",
    round_to: int | None = 6,
    return_documents: bool = True,
    document_col: str | None = None,
) -> DataFrame:
    """Rank candidate docs per query by ``score`` desc (ties → doc id asc).

    Result: pairs' columns + (score double, rank long); optionally truncated
    to the top ``k`` — the RerankResult ordering of the reference
    (src/reranking/impl.rs:185-195), vectorized over many queries.

    ``return_documents=False`` drops ``document_col`` from the output — the
    reference's RerankResult.document Option (src/reranking/init.rs:131-136):
    at scale, not carrying the text through the sort shuffle is the point.
    """
    scored = pairs.withColumn("score", score.cast("double"))
    if not return_documents and document_col is not None:
        scored = scored.drop(document_col)
    if round_to is not None:
        scored = scored.withColumn("score", F.round("score", round_to))
    w = Window.partitionBy(query_id).orderBy(F.desc("score"), F.asc(doc_id))
    out = scored.withColumn("rank", F.row_number().over(w).cast("long"))
    if k is not None:
        out = out.filter(F.col("rank") <= k)
    return out
