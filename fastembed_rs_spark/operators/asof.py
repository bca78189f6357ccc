"""Time-series joins Spark lacks natively: as-of join and banded range join.

Both are expressed as pure DataFrame algebra (one shuffle each), not
driver-side loops or per-key ``applyInPandas`` merges, so they scale to
arbitrarily many keys/rows:

- ``asof_join``: the classic union-and-carry-forward formulation — tag both
  sides, union, sort within each key partition, and carry the most recent
  right-side payload forward with ``last(..., ignorenulls=True)`` over a
  running row frame. Cost: ONE hash shuffle of |L|+|R| rows on the key plus
  a per-partition sort; no pair blow-up, no window over the cross product.
  (Equivalent of pandas ``merge_asof``; the reference engine has no as-of
  operator — this is part of the beyond-reference pipeline surface.)

- ``banded_range_join``: |l_val - r_val| <= band equi-joinified by bucketing
  both sides into band-width buckets and exploding the LEFT side into the 3
  candidate buckets (b-1, b, b+1). Each true pair meets in exactly one
  bucket (the right row's home bucket), so no dedup pass is needed. Turns
  an O(|L|·|R|) theta-join into a hash join with 3× left fan-out — the
  standard scalable banding trick for pure range predicates.

Scale notes (100 TB): the as-of shuffle partitions by join key — a single
hyper-hot key serializes into one task's sort; pre-splitting such a key by
time range and merging boundaries is the documented mitigation (SCALE.md).
The band join's fan-out is a constant 3× regardless of band width; pick the
band = the predicate's radius so bucket population stays proportional to
match density.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload_cols: Sequence[str],
    direction: str = "backward",
    strict: bool = False,
    tolerance: int | None = None,
) -> DataFrame:
    """For each left row, attach the payload of the right row with the
    greatest ``right_ts`` <= ``left_ts`` (direction="backward"; ">=" and
    smallest for "forward") within the same ``on`` key.

    Ties on ``right_ts`` break to the LAST payload column tuple in
    (payload_cols) order — pass an id column last to make this total.
    ``strict=True`` uses a strict inequality. ``tolerance`` (same unit as
    the ts columns; use int64 nanos) drops matches farther than that.

    Left rows with no match keep a null payload struct (left-join
    semantics). Output = left columns + ``matched`` struct of payload_cols
    + ``matched_ts``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    sign = 1 if direction == "backward" else -1
    # Order key: right rows must sort BEFORE left rows at equal ts for an
    # inclusive match (strict: after). Among right rows with equal ts the
    # running `last()` keeps the greatest payload tuple because they are
    # sorted ascending by payload.
    right_first = 0 if not strict else 2
    r = right.select(
        F.col(on).alias("__k"),
        (F.col(right_ts) * sign).alias("__t"),
        F.lit(right_first).alias("__side"),
        F.struct(
            F.col(right_ts).alias("__mts"),
            *[F.col(c) for c in payload_cols],
        ).alias("__pay"),
    )
    l = left.select(  # noqa: E741
        F.col(on).alias("__k"),
        (F.col(left_ts) * sign).alias("__t"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__row"),
    ).withColumn("__pay", F.lit(None).cast(r.schema["__pay"].dataType))
    unioned = r.withColumn("__row", F.lit(None).cast(l.schema["__row"].dataType)).select(
        "__k", "__t", "__side", "__pay", "__row"
    ).unionByName(l.select("__k", "__t", "__side", "__pay", "__row"))

    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__side").asc(), F.col("__pay").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("__m", F.last("__pay", ignorenulls=True).over(w))
    out = carried.filter(F.col("__side") == 1)
    if tolerance is not None:
        lag = (F.col("__row")[left_ts] - F.col("__m.__mts")) * sign
        out = out.withColumn(
            "__m", F.when(lag <= F.lit(tolerance), F.col("__m"))
        )
    return out.select(
        F.col("__row.*"),
        F.col("__m.__mts").alias("matched_ts"),
        F.struct(*[F.col(f"__m.{c}").alias(c) for c in payload_cols]).alias("matched"),
    )


def banded_range_join(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    right_val: str,
    band: int,
    extra_key: str | None = None,
) -> DataFrame:
    """Inner join of rows with |left_val - right_val| <= band (integer
    columns; use int64 epoch-nanos for timestamps). ``extra_key`` adds an
    equi-key to the bucket join (e.g. a tenant/user column).

    Left columns keep their names; right columns are prefixed ``r_`` when
    they collide.
    """
    lb = left.withColumn(
        "__b",
        F.explode(
            F.array(
                F.expr(f"({left_val} div {band}) - 1"),
                F.expr(f"{left_val} div {band}"),
                F.expr(f"({left_val} div {band}) + 1"),
            )
        ),
    )
    rb = right.withColumn("__b", F.expr(f"{right_val} div {band}"))
    collide = set(left.columns) & set(right.columns)
    for c in collide:
        rb = rb.withColumnRenamed(c, f"r_{c}")
    r_val = f"r_{right_val}" if right_val in collide else right_val
    keys = ["__b"] + ([extra_key] if extra_key else [])
    if extra_key and extra_key in collide:
        rb = rb.withColumnRenamed(f"r_{extra_key}", extra_key)
    joined = lb.join(rb, on=keys, how="inner")
    dist: Column = F.abs(F.col(left_val) - F.col(r_val))
    return joined.filter(dist <= F.lit(band)).drop("__b")
