"""Distinct-count sketches as pure DataFrame algebra: KMV (k-minimum
values) and an HLL-style register sketch.

Spark ships ``approx_count_distinct`` (HLL++), but its register layout and
hashing are engine-internal — a DuckDB oracle can't reproduce them. These
sketches instead build on the repo's canonical rolling hash
(functions/text.py), ALL INTEGER MATH until the final estimate, so both
engines produce bit-identical registers and the driver hash-check applies
to a *sketch*, not just exact counts.

Scale shape (the reason sketches exist at 100 TB):
- KMV: per-partition top-k smallest hashes (TakeOrderedAndProject — no
  full shuffle of the distinct set), k rows to the driver-side merge.
- HLL: groupBy(bucket).max(rho) — partial aggregation map-side combines
  to at most m rows per partition, one m-row shuffle, one-row result.
  m = 2^p registers; standard error ≈ 1.04/sqrt(m).

The 2^-register harmonic sum is computed in *integers* (terms
2^(SHIFT - rho), SHIFT=50) so summation order cannot perturb the float
result — see driver-contract notes on cross-engine float folds.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fastembed_rs_spark.functions.text import HASH_MOD

SHIFT = 50  # fixed-point exponent for the exact integer harmonic sum


def _bitlen(x: Column) -> Column:
    """bit_length(x) for x >= 0 via the binary string — exact integer
    semantics in both engines (bin(0) = '0' is special-cased to 0)."""
    return F.when(x == 0, F.lit(0)).otherwise(F.length(F.bin(x)))


def kmv_sketch(hashes: DataFrame, hash_col: str, k: int = 256) -> DataFrame:
    """KMV distinct estimate from a column of uniform hashes in
    [0, HASH_MOD). Returns one row: (kmv_k, kmv_est).

    est = (k-1) * M / h_(k)  where h_(k) is the k-th smallest DISTINCT
    hash; when fewer than k distinct hashes exist the exact distinct count
    is returned (the sketch is lossless below k).
    """
    top = hashes.select(F.col(hash_col).alias("h")).distinct().orderBy("h").limit(k)
    return top.agg(
        F.count("h").alias("kmv_k"),
        F.round(
            F.when(
                F.count("h") < k, F.count("h").cast("double")
            ).otherwise((k - 1) * F.lit(float(HASH_MOD)) / F.max("h")),
            4,
        ).alias("kmv_est"),
    )


def duck_kmv(hash_expr_rows: str, k: int = 256) -> str:
    """DuckDB mirror of kmv_sketch: `hash_expr_rows` is a SQL subquery
    yielding one column `h`."""
    return f"""
WITH tops AS (
  SELECT DISTINCT h FROM ({hash_expr_rows}) ORDER BY h LIMIT {k}
)
SELECT count(h) AS kmv_k,
       round(CASE WHEN count(h) < {k} THEN CAST(count(h) AS DOUBLE)
             ELSE ({k} - 1) * CAST({HASH_MOD} AS DOUBLE) / max(h) END, 4) AS kmv_est
FROM tops
"""


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_bucket_cols(hash_col: str, p: int = 9) -> tuple[Column, Column]:
    """(bucket, rho) columns from a uniform-hash column — the map-side of
    the register aggregation; compose with any extra grouping keys
    (e.g. a time window for the streaming form)."""
    m = 1 << p
    w_bits = (HASH_MOD // m).bit_length()
    h = F.col(hash_col)
    w = F.shiftright(h.cast("long"), p)  # h div 2^p, exact int
    return (h % m).alias("bucket"), (w_bits - _bitlen(w) + 1).alias("rho")


def hll_finalize(regs: DataFrame, keys: list[str], p: int = 9) -> DataFrame:
    """Finalize (keys..., bucket, rho) max-registers into per-key
    estimates (keys..., hll_m, hll_est). Register merge is max() — so
    registers union across datasets/micro-batches for free; this is the
    reduce side shared by the batch sketch and the streaming window form.
    """
    m = 1 << p
    agg = regs.withColumn(
        # exact power-of-two term; SQL shiftleft takes column bit counts
        "term", F.expr(f"shiftleft(cast(1 as bigint), {SHIFT} - rho)")
    ).groupBy(*keys).agg(
        F.count("*").alias("present"),
        F.sum("term").alias("s_present"),
    )
    alpha = _alpha(m)
    s_total = (
        F.col("s_present") + (m - F.col("present")) * F.lit(1 << SHIFT)
    ).cast("double")
    raw = F.lit(alpha * m * m * float(1 << SHIFT)) / s_total
    zeros = F.lit(m) - F.col("present")
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0), m * F.log(F.lit(float(m)) / zeros)
    ).otherwise(raw)
    return agg.select(
        *keys, F.lit(m).alias("hll_m"), F.round(est, 4).alias("hll_est")
    )


def hll_sketch(hashes: DataFrame, hash_col: str, p: int = 9) -> DataFrame:
    """HLL-style distinct estimate over uniform hashes in [0, HASH_MOD).

    bucket = h mod m; rho = (#leading zero bits of w = h div m, within its
    W-bit budget) + 1. Registers are max(rho) per bucket; empty buckets
    count as rho=0. Returns one row (hll_m, hll_est) with the standard
    small-range linear-counting correction.
    """
    bucket, rho = hll_bucket_cols(hash_col, p)
    regs = hashes.select(bucket, rho).groupBy("bucket").agg(
        F.max("rho").alias("rho")
    )
    return hll_finalize(regs, keys=[], p=p)


def duck_hll(hash_expr_rows: str, p: int = 9) -> str:
    m = 1 << p
    w_bits = (HASH_MOD // m).bit_length()
    alpha = _alpha(m)
    # explicit ::DOUBLE — DuckDB parses bare float literals as DECIMAL,
    # which both overflows and computes different (decimal) arithmetic
    numer = f"(({alpha!r}::DOUBLE) * {m} * {m} * ({float(1 << SHIFT)!r}::DOUBLE))"
    return f"""
WITH regs AS (
  SELECT h % {m} AS bucket,
         max({w_bits} - (CASE WHEN h // {m} = 0 THEN 0 ELSE length(bin(h // {m})) END) + 1) AS rho
  FROM ({hash_expr_rows}) GROUP BY 1
), agg AS (
  SELECT count(*) AS present,
         CAST(sum(CAST((CAST(1 AS BIGINT) << ({SHIFT} - rho)) AS HUGEINT)) AS BIGINT)
           AS s_present
  FROM regs
), tot AS (
  -- exact integer total register sum, ONE cast to double (identical
  -- correctly-rounded conversion in both engines)
  SELECT present,
         CAST(s_present + ({m} - present) * {1 << SHIFT} AS DOUBLE) AS s_total
  FROM agg
)
SELECT {m} AS hll_m,
       round(CASE WHEN {numer} / s_total <= ({2.5 * m!r}::DOUBLE) AND present < {m}
             THEN {m} * ln(CAST({m} AS DOUBLE) / ({m} - present))
             ELSE {numer} / s_total END, 4) AS hll_est
FROM tot
"""


def duck_hll_grouped(hash_expr_rows: str, key: str, p: int = 9) -> str:
    """Per-group form of ``duck_hll``: ``hash_expr_rows`` yields (key, h);
    every stage carries the key. The register/estimate math is identical."""
    m = 1 << p
    w_bits = (HASH_MOD // m).bit_length()
    alpha = _alpha(m)
    numer = f"(({alpha!r}::DOUBLE) * {m} * {m} * ({float(1 << SHIFT)!r}::DOUBLE))"
    return f"""
WITH regs AS (
  SELECT {key}, h % {m} AS bucket,
         max({w_bits} - (CASE WHEN h // {m} = 0 THEN 0 ELSE length(bin(h // {m})) END) + 1) AS rho
  FROM ({hash_expr_rows}) GROUP BY 1, 2
), agg AS (
  SELECT {key}, count(*) AS present,
         CAST(sum(CAST((CAST(1 AS BIGINT) << ({SHIFT} - rho)) AS HUGEINT)) AS BIGINT)
           AS s_present
  FROM regs GROUP BY {key}
), tot AS (
  SELECT {key}, present,
         CAST(s_present + ({m} - present) * {1 << SHIFT} AS DOUBLE) AS s_total
  FROM agg
)
SELECT {key}, {m} AS hll_m,
       round(CASE WHEN {numer} / s_total <= ({2.5 * m!r}::DOUBLE) AND present < {m}
             THEN {m} * ln(CAST({m} AS DOUBLE) / ({m} - present))
             ELSE {numer} / s_total END, 4) AS hll_est
FROM tot
"""


# ---------------------------------------------------------------------------
# Count-Min Sketch
# ---------------------------------------------------------------------------

#: CMS row hash coefficients — the first 4 minhash affine pairs (same fixed
#: constants shared verbatim with the DuckDB oracle; see operators/dedup.py)
CMS_DEPTH = 4
CMS_WIDTH = 1024


def _cms_coeffs(d: int) -> list[tuple[int, int]]:
    from fastembed_rs_spark.operators.dedup import minhash_coeffs

    return minhash_coeffs(d)


def cms_counters(
    hashes: DataFrame, hash_col: str, d: int = CMS_DEPTH, w: int = CMS_WIDTH,
) -> DataFrame:
    """Count-Min Sketch counter table (depth, bucket, cnt) over uniform
    hashes: bucket_i = ((h·a_i + b_i) mod P) mod w.

    One explode (d rows per input) + one groupBy — map-side combined down
    to ≤ d·w rows per partition, so the shuffle is sketch-sized, not
    data-sized. All integer math: both engines build bit-identical
    counters."""
    db = F.explode(F.array(*[
        F.struct(
            F.lit(i).cast("int").alias("depth"),
            (((F.col(hash_col) * F.lit(a) + F.lit(b)) % F.lit(HASH_MOD))
             % F.lit(w)).alias("bucket"),
        )
        for i, (a, b) in enumerate(_cms_coeffs(d))
    ]))
    return (
        hashes.select(db.alias("db"))
        .select("db.depth", "db.bucket")
        .groupBy("depth", "bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def cms_estimate(
    items: DataFrame, counters: DataFrame, hash_col: str,
    d: int = CMS_DEPTH, w: int = CMS_WIDTH,
) -> DataFrame:
    """CMS point estimate for each item row: min over depths of the item's
    counter. Guaranteed ≥ the true count (CMS never underestimates);
    expected overestimate ≤ e·N/w with probability 1−e^−d."""
    probes = items.select(
        "*",
        F.explode(F.array(*[
            F.struct(
                F.lit(i).cast("int").alias("depth"),
                (((F.col(hash_col) * F.lit(a) + F.lit(b)) % F.lit(HASH_MOD))
                 % F.lit(w)).alias("bucket"),
            )
            for i, (a, b) in enumerate(_cms_coeffs(d))
        ])).alias("db"),
    ).select("*", "db.depth", "db.bucket").drop("db")
    keys = [c for c in items.columns]
    return (
        probes.join(F.broadcast(counters), ["depth", "bucket"])
        .groupBy(*keys)
        .agg(F.min("cnt").alias("cms_n"))
    )


def duck_cms(
    toks_rows: str, d: int = CMS_DEPTH, w: int = CMS_WIDTH, k: int = 20,
) -> str:
    """DuckDB mirror: ``toks_rows`` must select (token, h). Returns the
    exact top-k tokens with true and CMS-estimated counts."""
    coeffs = _cms_coeffs(d)
    counter_parts = " UNION ALL ".join(
        f"SELECT {i} AS depth, ((h * {a} + {b}) % {HASH_MOD}) % {w} AS bucket, "
        f"CAST(count(*) AS BIGINT) AS cnt FROM toks GROUP BY 2"
        for i, (a, b) in enumerate(coeffs)
    )
    lookup_parts = " UNION ALL ".join(
        f"SELECT token, true_n, rank, {i} AS depth, "
        f"((h * {a} + {b}) % {HASH_MOD}) % {w} AS bucket FROM topk"
        for i, (a, b) in enumerate(coeffs)
    )
    return f"""
WITH toks AS ({toks_rows}),
counters AS ({counter_parts}),
exact AS (SELECT token, h, CAST(count(*) AS BIGINT) AS true_n
          FROM toks GROUP BY token, h),
topk AS (
  SELECT token, h, true_n,
         row_number() OVER (ORDER BY true_n DESC, token ASC) AS rank
  FROM exact QUALIFY rank <= {k}
),
lookups AS ({lookup_parts})
SELECT l.token, l.true_n, CAST(MIN(c.cnt) AS BIGINT) AS cms_n, l.rank
FROM lookups l JOIN counters c ON l.depth = c.depth AND l.bucket = c.bucket
GROUP BY l.token, l.true_n, l.rank
"""
