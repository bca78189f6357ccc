"""BM25 lexical retrieval over a document table — the classic sparse
scoring function the reference's SPLADE/BGE-M3 sparse embeddings
approximate with learned weights (src/sparse_text_embedding/, SURVEY §2.1
rows 9-10); here computed exactly from corpus statistics as DataFrame
algebra, no UDFs.

Pipeline shape (all Catalyst-visible, three narrow aggregations):
1. tf:   explode(tokens) → groupBy(doc, token).count           [shuffle 1]
2. df:   distinct doc-token pairs → groupBy(token).count       [reuses 1]
3. join query tokens (small → broadcast) against tf on token,
   attach idf + doclen/avgdl, sum per (query, doc)             [shuffle 2]

At 100 TB the token-keyed shuffle is the cost center; stopword-frequency
tokens are the skew risk — the df table gives the exact frequency to cut
on (drop tokens with df > cutoff, standard practice), and the final
per-(query,doc) sum map-side combines. avgdl is one scalar broadcast, not
a per-row window.

BM25 (Robertson/Sparck-Jones): score(q,d) = Σ_{t∈q∩d} idf(t) ·
tf·(k1+1) / (tf + k1·(1-b+b·|d|/avgdl)), idf = ln(1+(N-df+0.5)/(df+0.5)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fastembed_rs_spark.functions.text import tokens

K1 = 1.2
B = 0.75


def doc_term_freqs(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, token, tf, doclen) — one row per distinct token per doc."""
    toks = docs.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("token")
    )
    tf = toks.groupBy(id_col, "token").agg(F.count("*").alias("tf"))
    doclen = tf.groupBy(id_col).agg(F.sum("tf").alias("doclen"))
    return tf.join(doclen, id_col)


def bm25_top_k(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    k1: float = K1,
    b: float = B,
    round_to: int = 6,
) -> DataFrame:
    """Top-k BM25 scores per query: (query_id, doc_id, score, rank).

    Scores are rounded BEFORE ranking; ties break on doc_id ascending —
    rank order is engine-reproducible (driver contract).
    """
    # EAGER checkpoint: tf feeds THREE consumers (avgdl, the df counts and
    # the scoring join) — without it the token explode + double aggregation
    # re-runs per consumer (same pattern as the ngram postings)
    tf = doc_term_freqs(docs, id_col, text_col).localCheckpoint()
    n_docs = docs.select(F.countDistinct(id_col).alias("n"))
    # exact-integer sum/count, divided ONCE: bit-identical avgdl across
    # engines (a float avg() would fuzz every downstream term score)
    avgdl = (
        tf.select(id_col, "doclen")
        .distinct()
        .agg(
            (
                F.sum("doclen").cast("double") / F.count("*").cast("double")
            ).alias("avgdl")
        )
    )
    df = tf.groupBy("token").agg(F.count("*").alias("df"))
    qtok = queries.select(
        F.col(query_id_col),
        F.explode(F.array_distinct(tokens(query_text_col))).alias("token"),
    )
    scored = (
        tf.join(F.broadcast(qtok), "token")
        .join(F.broadcast(df), "token")
        .crossJoin(F.broadcast(n_docs))
        .crossJoin(F.broadcast(avgdl))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("doclen") / F.col("avgdl"))
            ),
        )
        .groupBy(query_id_col, id_col)
        .agg(F.round(F.sum("term_score"), round_to).alias("score"))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("score").desc(), F.col(id_col).asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
