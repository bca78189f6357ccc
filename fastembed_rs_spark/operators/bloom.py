"""Broadcast Bloom-filter pre-filter for selective semi-joins.

The classic runtime-filter pattern, expressed explicitly: build a
fixed-size bitmap from the small (build) side of a semi-join, embed it as
an array literal, and prune the large (probe) side with a codegen bitwise
*filter* — evaluated on the scan, before any join. Spark's own injected
bloom join filter (`spark.sql.optimizer.runtime.bloomFilter.enabled`)
does the same inside the optimizer; this module is the explicit form for
when the build side is an arbitrary DataFrame and the filter must be
reusable across several downstream joins.

Why the bitmap is materialized eagerly (a driver collect) instead of
cross-joined as a one-row broadcast: a broadcast bitmap makes the prune a
*join*, and Catalyst freely reorders joins — in practice it floats the
exact semi-join below the bloom condition, turning the bloom into a
no-op (observed in PLANS.md before this design). A literal filter cannot
be reordered above a join; it stays glued to the scan. The collect moves
m/8 bytes (8 KiB at the default m=2^16) — the same driver roundtrip the
IVF path pays for its centroid broadcast, amortized across every probe.

Scale shape at 100 TB:
- Build: k positions per key -> explode -> groupBy(word) bit_or. Partial
  aggregation map-side combines to at most m/64 rows per partition, so
  the shuffle is O(m/64) rows regardless of build-side size; the driver
  receives <= m/64 rows once.
- Probe: a `forall` over k bit-tests against the literal word array —
  whole-stage-codegen filter on the scan, no shuffle, no Python. Only
  surviving rows (true matches + ~fpp false positives) reach the exact
  semi-join, which removes the false positives, so the end-to-end result
  is EXACT; the bloom is purely a scan-reduction lever.

False-positive rate ≈ (1 - e^(-k·n/m))^k; the default m=2^16, k=3 holds
fpp < 1% up to n ≈ 5 000 build keys. Size m ≈ 10·n bits for ~1% fpp.

No reference counterpart (fastembed-rs has no joins at all,
`/root/reference/src/similarity.rs` is its only scoring surface); this is
engine-native scale infrastructure.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_M_BITS = 1 << 16
DEFAULT_K = 3


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """k independent bit positions in [0, m_bits) via seeded xxhash64.

    xxhash64 is Spark-internal (no oracle ever reproduces the bitmap —
    results stay exact via the verify join), so the fastest 64-bit hash
    wins; pmod keeps negative hashes in range.
    """
    return [
        F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(m_bits)) for seed in range(k)
    ]


def bloom_build(
    df: DataFrame, key_col: str, m_bits: int = DEFAULT_M_BITS, k: int = DEFAULT_K
) -> list[int]:
    """Dense word array (length m_bits/64) of the build side's key column.

    Distributed bit_or per word (O(m/64)-row shuffle), then one tiny
    collect. The returned list is the bitmap to pass to ``bloom_prune``.
    """
    bits = df.select(
        F.explode(F.array(*_positions(F.col(key_col), m_bits, k))).alias("bit")
    )
    words = (
        bits.select(
            (F.col("bit") / 64).cast("int").alias("w"),
            # SQL shiftleft (unlike the F.shiftleft wrapper) takes a column
            # shift amount
            F.call_function(
                "shiftleft",
                F.lit(1).cast("long"),
                F.pmod(F.col("bit"), F.lit(64)).cast("int"),
            ).alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("bits"))
        .collect()
    )
    dense = [0] * (m_bits // 64)
    for r in words:
        dense[r["w"]] = r["bits"]
    return dense


def bloom_prune(
    probe: DataFrame,
    key_col: str,
    bitmap: list[int],
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Keep only probe rows whose key *may* be in the build set (no false
    negatives; ~fpp false positives — follow with an exact semi-join).

    Pure Filter over an array literal: stays below joins, inside
    whole-stage codegen, shuffle-free.
    """
    arr = F.lit(bitmap)  # single array<long> Literal, not a 1024-ary expr
    pos = F.array(*_positions(F.col(key_col), m_bits, k))

    def _bit_set(p: Column) -> Column:
        word = F.element_at(arr, ((p / 64).cast("int") + 1))  # 1-indexed
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("long"), F.pmod(p, F.lit(64)).cast("int")
        )
        return word.bitwiseAND(mask) != 0

    return probe.filter(F.forall(pos, _bit_set))


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Exact left-semi join, bloom-accelerated: bitmap prune first (a
    scan-level filter), then the real semi-join over the ~fpp survivors."""
    bitmap = bloom_build(build, build_key, m_bits, k)
    pruned = bloom_prune(probe, probe_key, bitmap, m_bits, k)
    return pruned.join(
        build.select(F.col(build_key).alias("__bk")).distinct(),
        pruned[probe_key] == F.col("__bk"),
        "left_semi",
    )
