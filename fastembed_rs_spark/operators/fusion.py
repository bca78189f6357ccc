"""Hybrid-retrieval rank fusion.

The reference scores dense, sparse and reranker paths independently
(src/similarity.rs, src/sparse_text_embedding/impl.rs,
src/reranking/impl.rs) and leaves combining them to the caller. Reciprocal
Rank Fusion (Cormack et al., SIGIR 2009) is the standard score-free
combiner: ``rrf(d) = Σ_lists 1 / (K + rank_list(d))`` with K=60.

Implemented as a union + one hash aggregation — no windowing over the
corpus, only over the fused candidate set (≤ Σ list sizes per query), so
the cost is independent of corpus size once the input rank lists exist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: the K constant from the RRF paper; dampens the impact of high ranks
RRF_K = 60


def rrf_fuse(
    ranked_lists: list[DataFrame],
    query_id: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int | None = None,
    rrf_k: int = RRF_K,
    round_to: int = 6,
) -> DataFrame:
    """Fuse per-query rank lists into one RRF-ranked list.

    Each input must carry (query_id, id_col, rank_col with rank 1 = best).
    Returns (query_id, id_col, rrf_score double, n_lists long, rank long).
    ``rrf_score`` is rounded before ranking (ties → id asc) so rankings
    are engine-reproducible. With two lists the double addition is
    commutative, hence exactly order-independent; for 3+ lists the
    contributions are summed in ascending value order inside an array to
    keep the result deterministic under shuffle too.
    """
    parts = [
        df.select(
            F.col(query_id), F.col(id_col),
            (F.lit(1.0) / (F.lit(float(rrf_k)) + F.col(rank_col).cast("double"))).alias("__c"),
        )
        for df in ranked_lists
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = u.groupBy(query_id, id_col).agg(
        # sort the (tiny, ≤ n_lists) contribution array before folding:
        # a fixed addition order no matter how partitions delivered rows
        F.aggregate(
            F.array_sort(F.collect_list("__c")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("__score"),
        F.count("*").cast("long").alias("n_lists"),
    ).select(
        query_id, id_col,
        F.round("__score", round_to).alias("rrf_score"),
        "n_lists",
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("rrf_score"), F.asc(id_col))
    out = fused.withColumn("rank", F.row_number().over(w).cast("long"))
    if k is not None:
        out = out.filter(F.col("rank") <= k)
    return out
