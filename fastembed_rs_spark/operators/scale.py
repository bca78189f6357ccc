"""Scale patterns: length-aware batching, skew salting, bucketed joins.

These are the "custom work Catalyst won't invent" items from SURVEY §4:

* ``repartition_by_length`` — the reference pads each inference batch to its
  longest sequence (PaddingStrategy::BatchLongest, src/common.rs:106-113), so
  a batch mixing a 5-token and a 500-token doc wastes ~99% of the compute on
  padding for the short rows. Range-partitioning by text length co-batches
  similar lengths; embeddings are unchanged (masked pooling is
  padding-invariant) but padded-token throughput improves by the length
  variance of the corpus.
* ``salted_aggregate`` — two-stage aggregation for skewed group keys: stage 1
  aggregates on (key, salt) spreading one hot key over N reducers, stage 2
  merges the partials. Works for any algebraic aggregate (sum/count/min/max).
* ``write_bucketed`` / no-shuffle joins — persisting both sides of a
  recurring join bucketed by the key lets Spark plan a SortMergeJoin with
  ZERO Exchange: at 100 TB the shuffle is the cost, and bucketing pays it
  once at write time instead of per query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def repartition_by_length(
    df: DataFrame,
    text_col: str = "text",
    num_partitions: int | None = None,
) -> DataFrame:
    """Range-repartition by text length so each Arrow batch (and therefore
    each padded inference batch) holds similar-length documents.

    Safe for correctness: per-document embeddings do not depend on batch
    composition (tests pin partition invariance); this only changes the
    padding waste. Use directly in front of ``embed_text``."""
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism
    return df.repartitionByRange(num_partitions, F.length(F.col(text_col)))


def spread_if_narrow(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition only when the input scan is narrower than the cluster's
    parallelism. Local single-row-group parquet test files scan as one task,
    so the heavy per-row work downstream would serialize; a 100 TB scan
    already has thousands of splits, making this a no-op — no blanket
    corpus shuffle at scale."""
    if df.isStreaming:
        # no .rdd on streaming frames; micro-batch parallelism is the
        # source's concern (maxFilesPerTrigger etc.), not a repartition's
        return df
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def salted_aggregate(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 32,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``aggs`` maps output column → (input column, fn) with fn in
    {sum, count, min, max}. Stage 1 groups by (keys..., salt) — a hot key's
    rows spread over ``salt_buckets`` reducers; stage 2 merges partials by
    the true keys (count partials merge by SUM).

    Example::

        salted_aggregate(li, ["l_returnflag"], {"qty": ("l_quantity", "sum"),
                                                "n": ("l_quantity", "count")})
    """
    merge_fn = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    for out, (_, fn) in aggs.items():
        if fn not in merge_fn:
            raise ValueError(f"{out}: non-algebraic aggregate {fn!r} cannot be salted")
    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    partial = salted.groupBy(*key_cols, "__salt").agg(*[
        getattr(F, fn)(col).alias(out) for out, (col, fn) in aggs.items()
    ])
    return partial.groupBy(*key_cols).agg(*[
        getattr(F, merge_fn[fn])(out).alias(out) for out, (_, fn) in aggs.items()
    ])


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join for when the small side is too large to
    broadcast and the big side has hot keys: big rows draw a random salt
    in [0, B); the small side is replicated B times (explode over a
    B-element literal array); the join key becomes (key, salt), so a hot
    key's rows spread over B reducers instead of one straggler.

    Value-neutral: the output is exactly ``big JOIN small`` (each big row
    matches the single small replica carrying its salt). Cost: the small
    side is shuffled B times — use for extreme/known skew; AQE's skew-join
    split (on in session.py) handles moderate skew without replication.
    Supports how in {inner, left} (right/outer would need salt-complete
    small partitions).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    b = big.withColumn("__salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    s = small.withColumn(
        "__rep", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    cond = (b[big_key] == s[small_key]) & (b["__salt"] == s["__rep"])
    return b.join(s, cond, how).drop("__salt", "__rep")


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 32,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) table. Joining two
    tables bucketed by the same column into the same bucket count plans with
    no Exchange on either side — verify with ``assert_no_shuffle_join``."""
    writer = df.write.mode(mode).bucketBy(num_buckets, bucket_col)
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def assert_no_shuffle_join(joined: DataFrame) -> bool:
    """True iff the executed plan of ``joined`` contains a join but no
    Exchange (shuffle) — the co-located-join property bucketing buys."""
    plan = joined._jdf.queryExecution().executedPlan().toString()
    return ("Join" in plan) and ("Exchange" not in plan)


def hash_sample(
    df: DataFrame, key_col: str, pct_mille: int, salt: str = ""
) -> DataFrame:
    """Deterministic ``pct_mille``/1000 sample keyed on a column: keeps rows
    where rolling_hash(key || salt) % 1000 < pct_mille.

    Properties a pipeline needs that ``df.sample()`` lacks: reproducible
    across runs/engines (no RNG state), stable under repartition, and
    consistent across tables — sampling two tables by the same key keeps
    JOINABLE rows together (hash agreement), so a 1% dev slice of a 100 TB
    corpus still joins. Change ``salt`` to draw an independent sample.

    The rolling hash alone is poorly mixed on short sequential keys
    (consecutive ids land in runs — measured 19% kept at pct_mille=100), so
    the bucket goes through a Fibonacci multiplicative mix first: top bits
    of h * 2654435761 mod 2^32 — exact int64 math, same in the oracle.
    """
    from fastembed_rs_spark.functions.text import token_hash

    key = F.concat(F.col(key_col).cast("string"), F.lit(salt))
    return (
        df.withColumn("__sg_h", token_hash(key))
        .filter(
            F.expr(
                "((__sg_h * 2654435761) % 4294967296) * 1000 div 4294967296"
            )
            < pct_mille
        )
        .drop("__sg_h")
    )


def pareto_front_2d(
    df: DataFrame,
    cost_col: str,
    gain_col: str,
    prefilter_buckets: int = 64,
) -> DataFrame:
    """2-D skyline: rows not dominated by any other (lower-or-equal cost AND
    higher-or-equal gain, strict in at least one). Both columns must be
    integers (exact comparisons — the caller converts money to cents).

    Shape: the classic sort-sweep ("keep iff gain beats the running max of
    every strictly-cheaper row") expressed as two window maxes — O(n log n),
    never the O(n²) NOT-EXISTS self-join. A global ORDER BY window is a
    single-partition sort, so a LOCAL skyline prefilter runs first,
    partitioned by a hash bucket: dominance within any subset implies
    global dominance, and a global skyline row is undominated in every
    subset, so the prefilter is exact (transitivity carries removed rows'
    dominators to the survivor set). Survivors of per-bucket skylines are
    near-skyline-sized in practice, so the single-partition final pass
    touches a tiny fraction of the input. Equal (cost, gain) duplicates do
    not dominate each other and all survive, matching the NOT-EXISTS
    definition.
    """
    from pyspark.sql import Window

    def _keep(d: DataFrame, part: list[str]) -> DataFrame:
        w_lt = (
            Window.partitionBy(*part)
            .orderBy(cost_col)
            .rangeBetween(Window.unboundedPreceding, -1)
        )
        w_eq = Window.partitionBy(*part, cost_col)
        return (
            d.withColumn("__mx_lt", F.max(gain_col).over(w_lt))
            .withColumn("__mx_eq", F.max(gain_col).over(w_eq))
            .filter(
                F.col("__mx_lt").isNull() | (F.col(gain_col) > F.col("__mx_lt"))
            )
            .filter(F.col(gain_col) == F.col("__mx_eq"))
            .drop("__mx_lt", "__mx_eq")
        )

    # bucket on an id-ish column when one exists (stable under metric
    # duplicates); a frame of only the two metrics buckets on both
    first = next(
        (c for c in df.columns if c not in (cost_col, gain_col)),
        None,
    )
    bkt_src = F.hash(first) if first else F.hash(cost_col, gain_col)
    local = _keep(
        df.withColumn("__bkt", F.pmod(bkt_src, F.lit(prefilter_buckets))),
        ["__bkt"],
    ).drop("__bkt")
    return _keep(local, [])


def local_table(spark, rows, schema: str) -> DataFrame:
    """Small driver-side row set → DataFrame through the Arrow/pandas path.

    ``spark.createDataFrame(list_of_rows)`` pickles the rows into
    defaultParallelism (32) Python partitions; every downstream collect or
    broadcast of that table then pays 32 Python-worker round-trips
    (measured ~1.2 s per collect+broadcast use at local[32] vs ~0.35 s via
    Arrow — the same pathology the r10 manifest fix removed from the
    lifecycle writes). Routing the rows through a pandas DataFrame uses
    Arrow serialization and far fewer partitions; values and schema are
    unchanged. Falls back to the plain path if pandas/Arrow cannot
    represent the rows (exotic nested types); callers never see a
    behavioral difference.

    ``schema`` must be a DDL string ("a int, b array<double>"); column
    names are parsed from it for the pandas frame.
    """
    try:
        import pandas as pd

        names, depth, cur = [], 0, []
        for ch in schema:
            if ch in "<(":
                depth += 1
            elif ch in ">)":
                depth -= 1
            if ch == "," and depth == 0:
                names.append("".join(cur).strip().split()[0])
                cur = []
            else:
                cur.append(ch)
        if "".join(cur).strip():
            names.append("".join(cur).strip().split()[0])
        pdf = pd.DataFrame([tuple(r) for r in rows], columns=names)
        return spark.createDataFrame(pdf, schema)
    except Exception:  # noqa: BLE001 — fall back, never change results
        return spark.createDataFrame(rows, schema)
