"""ColBERT late-interaction (MaxSim) scoring over multi-vector columns.

The reference *produces* ColBERT token matrices (`Vec<Vec<Vec<f32>>>`,
src/bgem3_embedding/init.rs:21-25, populated at impl.rs:272-295) but ships no
scorer for them; retrieval users score with MaxSim:

    score(Q, D) = Σ_{q ∈ Q} max_{d ∈ D} q·d

This module provides MaxSim as a pure Catalyst expression over
``array<array<double>>`` columns (oracle-verifiable, used by the catalog
query) and the top-k retrieval operator built on it.

Scale shape: identical to dense top-k — broadcast the (small) query token
matrices against the corpus; per-pair cost is |Q|·|D| dots, so keep token
counts bounded upstream (the reference's colbert output is already
mask-filtered). For web-scale corpora route through an ANN prefilter
(operators.topk.ivf_top_k on the dense vectors) and MaxSim-rescore the
candidates — the standard two-stage late-interaction architecture.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def token_dot(q_tok: Column, d_tok: Column) -> Column:
    """dot of two token vectors (array<double>), NULL-tail as 0."""
    prods = F.zip_with(q_tok, d_tok, lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda a, x: a + F.coalesce(x, F.lit(0.0)))


def maxsim(q_tokens: Column | str, d_tokens: Column | str) -> Column:
    """MaxSim late-interaction score between two token matrices
    (array<array<double>>): Σ over query tokens of the max dot against any
    doc token. Empty doc → contributes 0 per query token (array_max of an
    empty transform is NULL → coalesced)."""
    q = F.col(q_tokens) if isinstance(q_tokens, str) else q_tokens
    d = F.col(d_tokens) if isinstance(d_tokens, str) else d_tokens
    return F.aggregate(
        q,
        F.lit(0.0),
        lambda acc, qt: acc
        + F.coalesce(
            F.array_max(F.transform(d, lambda dt: token_dot(qt, dt))), F.lit(0.0)
        ),
    )


def colbert_top_k(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    query_id: str = "query_id",
    query_tokens: str = "query_tokens",
    id_col: str = "doc_id",
    tokens_col: str = "colbert",
    round_to: int | None = 6,
) -> DataFrame:
    """Late-interaction retrieval: MaxSim every query against the corpus,
    rank per query. Queries broadcast; corpus never shuffled.
    Result: (query_id, id_col, score double, rank long)."""
    scored = corpus.crossJoin(F.broadcast(queries)).select(
        F.col(query_id),
        F.col(id_col),
        maxsim(query_tokens, tokens_col).alias("score"),
    )
    if round_to is not None:
        scored = scored.withColumn("score", F.round("score", round_to))
    w = Window.partitionBy(query_id).orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )
