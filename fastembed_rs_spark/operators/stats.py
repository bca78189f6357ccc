"""Distribution statistics as single-pass DataFrame algebra: equi-width
histograms (the building block for approximate quantiles at scale) and
heavy-hitter tokens.

Why not ``approxQuantile``/``percentile_approx``: their GK/KLL sketches are
engine-internal and not reproducible in a DuckDB oracle. An equi-width
histogram is: bin edges derive from the exact min/max (one tiny aggregate,
broadcast back), bin assignment is one arithmetic expression, and counts
are exact — two narrow passes total, both map-side combinable, no sort.
Quantiles read off the cumulative counts with sub-bin linear
interpolation error <= bin width.

Heavy hitters: exact top-k by count — groupBy(token) partial-aggregates
map-side so the shuffle carries one row per distinct token per partition,
then TakeOrderedAndProject keeps k rows; no global sort materializes. At
100 TB this IS the scalable shape (the count-min alternative only wins
when the distinct set itself doesn't fit the shuffle — not the case for
language tokens).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def equiwidth_histogram(
    df: DataFrame, col: str, bins: int = 20, round_to: int = 4
) -> DataFrame:
    """(bin, lo, hi, n, cum_n) — equi-width bins over [min, max], the max
    value clamped into the last bin. Empty bins are absent (join against a
    ``sequence`` spine if a dense axis is needed)."""
    c = F.col(col).cast("double")
    mm = df.agg(
        F.min(c).alias("__mn"), F.max(c).alias("__mx")
    )
    binned = (
        df.crossJoin(F.broadcast(mm))
        .select(
            F.least(
                F.lit(bins - 1),
                F.floor(
                    (c - F.col("__mn"))
                    / ((F.col("__mx") - F.col("__mn")) / bins)
                ).cast("int"),
            ).alias("bin"),
            "__mn",
            "__mx",
        )
        .groupBy("bin", "__mn", "__mx")
        .agg(F.count("*").cast("long").alias("n"))
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    width = (F.col("__mx") - F.col("__mn")) / bins
    return binned.select(
        "bin",
        F.round(F.col("__mn") + F.col("bin") * width, round_to).alias("lo"),
        F.round(F.col("__mn") + (F.col("bin") + 1) * width, round_to).alias("hi"),
        "n",
        F.sum("n").over(w).cast("long").alias("cum_n"),
    )


def heavy_hitter_tokens(
    docs: DataFrame, text_col: str = "text", k: int = 50
) -> DataFrame:
    """Top-k tokens by exact corpus frequency: (token, n, rank). Ties break
    lexicographically on the token so ranking is engine-reproducible."""
    from fastembed_rs_spark.functions.text import tokens

    counts = (
        docs.select(F.explode(tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("n"))
    )
    # distributed top-k (TakeOrderedAndProject: per-partition heads merged
    # on the driver) — a global row_number window would funnel the whole
    # vocabulary through one task's sort. The rank window then runs on k
    # rows only.
    top = counts.orderBy(F.col("n").desc(), F.col("token").asc()).limit(k)
    w = Window.orderBy(F.col("n").desc(), F.col("token").asc())
    return top.withColumn("rank", F.row_number().over(w))
