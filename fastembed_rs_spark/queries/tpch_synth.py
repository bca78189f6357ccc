"""TPC-H shapes over the synthesized partsupp/shipmode world (Q2/Q9/Q11/Q12/Q16/Q20/Q21) and the embedding spectrum monitor.

Split out of the monolithic queries.py (r8); registration order is
preserved by the sequential imports in queries/__init__.py.
"""

from __future__ import annotations

from fastembed_rs_spark.queries._core import (
    DataFrame,
    EMB_DIM,
    F,
    SparkSession,
    Window,
    q,
    t,
)

# Both engines construct the IDENTICAL table from lineitem's observed
# (partkey, suppkey) pairs with deterministic integer-arithmetic columns
# (the pii_redact precedent: synthesize missing inputs identically on both
# sides rather than skip the query shape). Costs stay exact: supplycost is
# integer CENTS, availqty an integer, so every downstream aggregate is
# pure int64 — no float money anywhere.
_PS_SYNTH_SQL = """
psd AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
ps AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         CAST((l_partkey * 7 + l_suppkey * 3) % 9999 + 1 AS BIGINT)
           AS ps_availqty,
         CAST((l_partkey * 31 + l_suppkey * 17) % 100000 + 100 AS BIGINT)
           AS ps_supplycost_cents
  FROM psd
)"""


def _partsupp_synth(
    spark: SparkSession, sf_dir: str,
    part_filter: DataFrame | None = None,
    supp_filter: DataFrame | None = None,
) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    # semi-join pre-filters (guide §3.2): when the consumer only INNER-joins
    # partsupp against a filtered part/supplier set, drop non-matching rows
    # BEFORE the distinct's shuffle — identical join result (dropped rows
    # could never match), shuffle shrunk by the filter selectivity
    if part_filter is not None:
        li = li.join(
            F.broadcast(part_filter.select(F.col("p_partkey").alias("l_partkey"))),
            "l_partkey", "left_semi",
        )
    if supp_filter is not None:
        li = li.join(
            F.broadcast(supp_filter.select(F.col("s_suppkey").alias("l_suppkey"))),
            "l_suppkey", "left_semi",
        )
    return li.select("l_partkey", "l_suppkey").distinct().select(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
        F.expr(
            "CAST((l_partkey * 7 + l_suppkey * 3) % 9999 + 1 AS BIGINT)"
        ).alias("ps_availqty"),
        F.expr(
            "CAST((l_partkey * 31 + l_suppkey * 17) % 100000 + 100 AS BIGINT)"
        ).alias("ps_supplycost_cents"),
    )


#: synthesized per-line lateness (receipt delay minus commit delay), the
#: ONE function shared by late_delivery_suppliers and shipmode_priority so
#: the two queries describe a single consistent synthetic world — edit it
#: here or nowhere (SQL text + Spark expr kept adjacent like _PS_SYNTH_SQL)
_LATENESS_SQL = """CAST((l_orderkey * 11 + l_linenumber * 7) % 45 AS BIGINT)
         - CAST((l_orderkey * 13 + l_linenumber * 5) % 30 AS BIGINT)"""


def _lateness_col():
    return (
        F.expr("CAST((l_orderkey * 11 + l_linenumber * 7) % 45 AS BIGINT)")
        - F.expr("CAST((l_orderkey * 13 + l_linenumber * 5) % 30 AS BIGINT)")
    )


_Q11_NATIONS = ("NATION_3", "NATION_7", "NATION_11")


@q(
    "important_stock_share",
    f"""
WITH {_PS_SYNTH_SQL},
natsup AS (
  SELECT s.s_suppkey FROM supplier s
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE n.n_name IN {str(_Q11_NATIONS)}
),
val AS (
  SELECT ps.ps_partkey,
         CAST(sum(ps.ps_supplycost_cents * ps.ps_availqty) AS BIGINT)
           AS value_cents
  FROM ps JOIN natsup ON ps.ps_suppkey = natsup.s_suppkey
  GROUP BY ps.ps_partkey
),
tot AS (SELECT CAST(sum(value_cents) AS BIGINT) AS total_cents FROM val)
SELECT v.ps_partkey, v.value_cents,
       CAST(v.value_cents * 100000 // t.total_cents AS BIGINT)
         AS share_per100k
FROM val v CROSS JOIN tot t
WHERE v.value_cents * 10000 > t.total_cents
""",
    "TPC-H Q11 shape (important stock identification) over the synthesized "
    "partsupp: inventory value per part held by a 3-nation supplier "
    "region, keeping parts above a 1/10000 share of the region's total. "
    "The scale-free trick is the filter: value*10000 > total compares two "
    "exact int64s — no float fraction, no boundary flips at any SF. Plan: "
    "supplier x nation is a broadcast chain, partsupp aggregates by part "
    "(map-side combinable), the 1-row total broadcasts back. partsupp "
    "itself is one distinct over lineitem's (part, supp) pairs — at "
    "100 TB that distinct is the only shuffle",
)
def q_important_stock_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = t(spark, sf_dir, "supplier")
    nat = t(spark, sf_dir, "nation")
    natsup = (
        sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .filter(F.col("n_name").isin(*_Q11_NATIONS))
        .select("s_suppkey")
    )
    # partsupp pre-filtered to the 3-nation suppliers BEFORE its distinct
    ps = _partsupp_synth(spark, sf_dir, supp_filter=natsup)
    val = (
        ps.join(F.broadcast(natsup), ps.ps_suppkey == natsup.s_suppkey)
        .groupBy("ps_partkey")
        .agg(
            F.sum(F.col("ps_supplycost_cents") * F.col("ps_availqty"))
            .cast("long").alias("value_cents")
        )
    )
    tot = val.agg(F.sum("value_cents").cast("long").alias("total_cents"))
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(F.col("value_cents") * 10000 > F.col("total_cents"))
        .select(
            "ps_partkey", "value_cents",
            F.expr("CAST(value_cents * 100000 div total_cents AS BIGINT)")
            .alias("share_per100k"),
        )
    )


_Q16_SIZES = (1, 4, 7, 10, 13)


@q(
    "supplier_part_variety",
    f"""
WITH {_PS_SYNTH_SQL},
excl AS (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0),
pp AS (
  SELECT p_partkey, p_brand, p_type, CAST(p_size AS BIGINT) AS p_size
  FROM part
  WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
    AND p_size IN {str(_Q16_SIZES)}
)
SELECT pp.p_brand, pp.p_type, pp.p_size,
       CAST(count(DISTINCT ps.ps_suppkey) AS BIGINT) AS supplier_cnt
FROM ps
JOIN pp ON ps.ps_partkey = pp.p_partkey
WHERE ps.ps_suppkey NOT IN (SELECT s_suppkey FROM excl)
GROUP BY pp.p_brand, pp.p_type, pp.p_size
""",
    "TPC-H Q16 shape (parts/supplier relationship) over the synthesized "
    "partsupp: how many DISTINCT suppliers can provide each surviving "
    "(brand, type, size) combination, excluding one brand, one type, "
    "off-list sizes, and suppliers in bad standing (negative acctbal "
    "stands in for Q16's complaints predicate — the testdata carries no "
    "s_comment). Plan: part filters push to the parquet scan, the "
    "filtered part table broadcasts against partsupp, the exclusion set "
    "is a broadcast LEFT ANTI join (the null-safe NOT IN rewrite — "
    "suppkeys are non-null by construction), then one count-distinct "
    "aggregate keyed by the group columns",
)
def q_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = t(spark, sf_dir, "part")
    sup = t(spark, sf_dir, "supplier")
    pp = (
        part.filter(
            (F.col("p_brand") != "Brand#1")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(*_Q16_SIZES)
        )
        .select(
            "p_partkey", "p_brand", "p_type",
            F.col("p_size").cast("long").alias("p_size"),
        )
    )
    # partsupp pre-filtered to the surviving parts BEFORE its distinct
    # (the supplier exclusion stays a post-distinct ANTI join — an anti
    # filter cannot be pushed below the distinct)
    ps = _partsupp_synth(spark, sf_dir, part_filter=pp)
    excl = sup.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        ps.join(F.broadcast(pp), ps.ps_partkey == pp.p_partkey)
        .join(
            F.broadcast(excl),
            ps.ps_suppkey == excl.s_suppkey,
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(
            F.countDistinct("ps_suppkey").cast("long").alias("supplier_cnt")
        )
    )


@q(
    "promotion_stock_suppliers",
    f"""
WITH {_PS_SYNTH_SQL},
target_parts AS (SELECT p_partkey FROM part WHERE p_name LIKE 'small%'),
shipped AS (
  SELECT l_partkey, l_suppkey,
         CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
           AS qty100
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l_partkey, l_suppkey
),
qualified AS (
  SELECT DISTINCT ps.ps_suppkey
  FROM ps
  JOIN target_parts tp ON ps.ps_partkey = tp.p_partkey
  LEFT JOIN shipped sh
    ON sh.l_partkey = ps.ps_partkey AND sh.l_suppkey = ps.ps_suppkey
  WHERE ps.ps_availqty * 200 > coalesce(sh.qty100, 0)
)
SELECT s.s_suppkey, s.s_name
FROM supplier s JOIN qualified q ON s.s_suppkey = q.ps_suppkey
""",
    "TPC-H Q20 shape (potential part promotion) over the synthesized "
    "partsupp: suppliers holding excess stock of 'small%' parts — "
    "availqty greater than half of what that (part, supplier) pair "
    "actually shipped in a two-year window. The half-of-shipped "
    "comparison runs in exact integers (quantities become int64 "
    "hundredths per ROW before summation, then availqty*200 > qty100 — "
    "no float half). Plan: the part-name filter pushes to the scan and "
    "broadcasts; shipped is one (part, supp)-keyed aggregate off the "
    "date-pruned lineitem scan; Q20's nested EXISTS subqueries become "
    "one left join + distinct — the shape that actually distributes",
)
def q_promotion_stock_suppliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    part = t(spark, sf_dir, "part")
    sup = t(spark, sf_dir, "supplier")
    li = t(spark, sf_dir, "lineitem")
    target = part.filter(F.col("p_name").like("small%")).select("p_partkey")
    # partsupp pre-filtered to the target parts BEFORE its distinct; the
    # shipped aggregate gets the same semi-filter (its rows only matter
    # where the LEFT join key matches a target-part ps row)
    ps = _partsupp_synth(spark, sf_dir, part_filter=target)
    shipped = (
        li.join(
            F.broadcast(target.select(F.col("p_partkey").alias("l_partkey"))),
            "l_partkey", "left_semi",
        )
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(F.expr("CAST(round(l_quantity * 100) AS BIGINT)"))
            .cast("long").alias("qty100")
        )
    )
    qual = (
        ps.join(F.broadcast(target), ps.ps_partkey == target.p_partkey)
        .join(
            shipped,
            (shipped.l_partkey == ps.ps_partkey)
            & (shipped.l_suppkey == ps.ps_suppkey),
            "left",
        )
        .filter(
            F.col("ps_availqty") * 200
            > F.coalesce(F.col("qty100"), F.lit(0))
        )
        .select("ps_suppkey")
        .distinct()
    )
    return sup.join(qual, sup.s_suppkey == qual.ps_suppkey).select(
        "s_suppkey", "s_name"
    )


@q(
    "late_delivery_suppliers",
    f"""
WITH l AS (
  SELECT l_orderkey, l_suppkey,
         {_LATENESS_SQL}
           AS lateness
  FROM lineitem
),
lo AS (
  SELECT l_orderkey, l_suppkey,
         CASE WHEN max(lateness) > 0 THEN 1 ELSE 0 END AS is_late
  FROM l GROUP BY l_orderkey, l_suppkey
),
j AS (
  SELECT lo.* FROM lo
  JOIN orders o ON lo.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F'
),
ordstat AS (
  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_supp,
         CAST(sum(is_late) AS BIGINT) AS n_late
  FROM j GROUP BY l_orderkey
)
SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM j
JOIN ordstat USING (l_orderkey)
JOIN supplier s ON j.l_suppkey = s.s_suppkey
WHERE j.is_late = 1 AND ordstat.n_supp >= 2 AND ordstat.n_late = 1
GROUP BY s.s_name
""",
    "TPC-H Q21 shape (suppliers who kept orders waiting): count, per "
    "supplier, the finished multi-supplier orders where THAT supplier "
    "was the only late one. Commit/receipt dates are absent from the "
    "testdata, so per-line lateness is synthesized as a deterministic "
    "integer function of (orderkey, linenumber) — identical on both "
    "engines, same discipline as the partsupp synth. The reference "
    "formulation's correlated EXISTS / NOT EXISTS pair is rewritten as "
    "the distributed shape: one (order, supplier) rollup, one per-order "
    "(n_suppliers, n_late) aggregate, then a join-and-filter — two "
    "shuffles total, both on orderkey, no correlated re-scans",
)
def q_late_delivery_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    sup = t(spark, sf_dir, "supplier")
    lo = (
        li.select(
            "l_orderkey", "l_suppkey",
            _lateness_col().alias("lateness"),
        )
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.when(F.max("lateness") > 0, 1).otherwise(0).alias("is_late")
        )
    )
    j = lo.join(
        orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey"),
        lo.l_orderkey == F.col("o_orderkey"),
    ).select("l_orderkey", "l_suppkey", "is_late")
    ordstat = j.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_supp"),
        F.sum("is_late").cast("long").alias("n_late"),
    )
    return (
        j.filter(F.col("is_late") == 1)
        .join(ordstat, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .join(F.broadcast(sup), j.l_suppkey == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
    )


_SPECTRUM_ITERS = 16
_GRAM_SCALE = 10**8


def _spectrum_oracle(iters: int = _SPECTRUM_ITERS, dim: int = EMB_DIM) -> str:
    parts = [f"""
WITH pr AS (
  SELECT a.i - 1 AS i, b.i - 1 AS j,
         CAST(round(CAST(e.embedding[a.i] AS DOUBLE)
                    * CAST(e.embedding[b.i] AS DOUBLE)
                    * {_GRAM_SCALE}) AS BIGINT) AS pf
  FROM embeddings e
  CROSS JOIN (SELECT unnest(generate_series(1, {dim})) AS i) a
  CROSS JOIN (SELECT unnest(generate_series(1, {dim})) AS i) b
),
gram AS MATERIALIZED (
  SELECT i, j, CAST(sum(pf) AS BIGINT) AS g_fixed FROM pr GROUP BY i, j),
g AS MATERIALIZED (
  SELECT i, j, CAST(g_fixed AS DOUBLE) / {_GRAM_SCALE} AS g FROM gram),
v0 AS (SELECT unnest(generate_series(0, {dim - 1})) AS j, 0.125 AS val)"""]
    prev = "v0"
    for r in range(1, iters + 1):
        parts.append(f""",
m{r} AS MATERIALIZED (
  SELECT g.i AS j, sum(g.g * {prev}.val) AS mv
  FROM g JOIN {prev} ON g.j = {prev}.j GROUP BY g.i),
n{r} AS (SELECT COALESCE(sqrt(sum(mv * mv)), 0) AS nrm FROM m{r}),
v{r} AS (SELECT j, CASE WHEN nrm = 0 THEN 0 ELSE mv / nrm END AS val
         FROM m{r} CROSS JOIN n{r})""")
        prev = f"v{r}"
    # degenerate-spectrum guards mirror the Spark side (empty / all-zero
    # corpus): empty aggregates COALESCE to 0 instead of NULL, mv/0 never
    # propagates NaN through the power-iteration CTEs, and the share
    # divide is CASE-guarded (DuckDB // raises on a zero divisor where
    # Spark div yields NULL — both replaced by an exact zero row)
    parts.append(f""",
tr AS (SELECT CAST(COALESCE(sum(g_fixed), 0) // 100 AS BIGINT)
         AS trace_micro
       FROM gram WHERE i = j),
nv AS (SELECT CAST(count(*) AS BIGINT) AS n_vecs FROM embeddings),
eig AS (SELECT CAST(round(round(COALESCE(nrm, 0), 6) * 1000000) AS BIGINT)
          AS top_eig_micro FROM n{iters})
SELECT nv.n_vecs, CAST({dim} AS BIGINT) AS dim, tr.trace_micro,
       eig.top_eig_micro,
       CAST(CASE WHEN tr.trace_micro = 0 THEN 0
            ELSE eig.top_eig_micro * 1000 // tr.trace_micro END AS BIGINT)
         AS top_share_permille
FROM nv CROSS JOIN tr CROSS JOIN eig""")
    return "".join(parts)


@q(
    "embedding_spectrum",
    _spectrum_oracle(),
    "spectral collapse monitor: top eigenvalue of the corpus Gram matrix "
    "X^T X (by 16 power-iteration steps) and its share of the trace — THE "
    "anisotropy number for an embedding space (share -> 1: every vector "
    "lies on one line and cosine similarity is meaningless; share ~ "
    "1/dim: isotropic). Complements embedding_stats (per-dim marginals "
    "can look healthy while a single dominant direction eats the "
    "variance). Scale shape: the Gram matrix is a kernel partial "
    "aggregate — each Arrow batch contributes a dim^2 integer tile "
    "(every x_i*x_j rounded half-away to 1e-8 units BEFORE summation, "
    "so the matrix is bit-exact under any partitioning — the micro-unit "
    "discipline applied to a matrix), one tiny groupBy collapses tiles, "
    "and the driver state is dim^2 integers, CONSTANT in corpus size; "
    "power iteration then runs on the driver (dim x dim, microseconds) "
    "and the oracle replays it as unrolled CTEs on the identical "
    "fixed-point matrix (operators/fast_vector.py::gram_fixed_fast)",
)
def q_embedding_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from fastembed_rs_spark.operators.fast_vector import gram_fixed_fast

    emb = t(spark, sf_dir, "embeddings")
    gram = (
        gram_fixed_fast(emb, "embedding", EMB_DIM, scale=_GRAM_SCALE)
        .groupBy("i", "j")
        .agg(F.sum("g_fixed").cast("long").alias("g_fixed"))
    )
    rows = gram.collect()  # dim^2 = 4096 integers — constant by construction
    n_vecs = emb.count()
    Gf = np.zeros((EMB_DIM, EMB_DIM), dtype=np.int64)
    for r in rows:
        Gf[r["i"], r["j"]] = r["g_fixed"]
    trace_micro = int(np.trace(Gf)) // 100  # 1e-8 -> 1e-6 units, exact
    G = Gf.astype(np.float64) / float(_GRAM_SCALE)
    v = np.full(EMB_DIM, 0.125, dtype=np.float64)
    nrm = 0.0
    for _ in range(_SPECTRUM_ITERS):
        mv = G @ v
        nrm = float(np.sqrt((mv * mv).sum()))
        if not np.isfinite(nrm) or nrm <= 0.0:
            nrm = 0.0  # degenerate spectrum (empty / all-zero corpus):
            break      # report a zero row instead of splicing nan as SQL
        v = mv / nrm
    # final rounding happens through Spark expressions so the half-up /
    # fixed-point semantics are the engine's own, not Python's
    return spark.range(1).select(
        F.lit(n_vecs).cast("long").alias("n_vecs"),
        F.lit(EMB_DIM).cast("long").alias("dim"),
        F.lit(trace_micro).cast("long").alias("trace_micro"),
        F.expr(
            f"CAST(round(round(CAST({nrm!r} AS DOUBLE), 6) * 1000000) "
            "AS BIGINT)"
        ).alias("top_eig_micro"),
    ).withColumn(
        "top_share_permille",
        F.expr(
            "CAST(CASE WHEN trace_micro = 0 THEN 0 "
            "ELSE top_eig_micro * 1000 div trace_micro END AS BIGINT)"
        ),
    )


@q(
    "minimum_cost_supplier",
    f"""
WITH {_PS_SYNTH_SQL},
rs AS (
  SELECT s.s_suppkey, s.s_name, n.n_name
  FROM supplier s
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'ASIA'
),
pp AS (
  SELECT p_partkey, p_brand FROM part
  WHERE p_size <= 10 AND p_type = 'STANDARD'
),
ranked AS (
  SELECT pp.p_partkey, pp.p_brand, rs.s_suppkey, rs.s_name, rs.n_name,
         ps.ps_supplycost_cents,
         row_number() OVER (PARTITION BY pp.p_partkey
                            ORDER BY ps.ps_supplycost_cents ASC,
                                     rs.s_suppkey ASC) AS rnk
  FROM ps
  JOIN rs ON ps.ps_suppkey = rs.s_suppkey
  JOIN pp ON ps.ps_partkey = pp.p_partkey
)
SELECT p_partkey, p_brand, s_suppkey, s_name, n_name, ps_supplycost_cents
FROM ranked WHERE rnk = 1
""",
    "TPC-H Q2 shape (minimum-cost supplier) over the synthesized "
    "partsupp: for every small STANDARD part, the cheapest ASIA "
    "supplier — Q2's correlated MIN subquery rewritten as one window "
    "rank over the region-filtered partsupp (ties break on suppkey; "
    "costs are exact integer cents so the argmin is deterministic on "
    "both engines). Plan: region x nation x supplier collapses to a "
    "broadcast chain, the part filter pushes to the scan and "
    "broadcasts, the window partitions by partkey — the only shuffle "
    "is partsupp onto its own part key",
)
def q_minimum_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = t(spark, sf_dir, "supplier")
    nat = t(spark, sf_dir, "nation")
    reg = t(spark, sf_dir, "region")
    part = t(spark, sf_dir, "part")
    rs = (
        sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(
            F.broadcast(reg.filter(F.col("r_name") == "ASIA")),
            nat.n_regionkey == reg.r_regionkey,
        )
        .select("s_suppkey", "s_name", "n_name")
    )
    pp = part.filter(
        (F.col("p_size") <= 10) & (F.col("p_type") == "STANDARD")
    ).select("p_partkey", "p_brand")
    # partsupp pre-filtered on BOTH join sides before its distinct
    ps = _partsupp_synth(spark, sf_dir, part_filter=pp, supp_filter=rs)
    w = Window.partitionBy("p_partkey").orderBy(
        F.asc("ps_supplycost_cents"), F.asc("s_suppkey")
    )
    return (
        ps.join(F.broadcast(rs), ps.ps_suppkey == rs.s_suppkey)
        .join(F.broadcast(pp), ps.ps_partkey == pp.p_partkey)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select(
            "p_partkey", "p_brand", "s_suppkey", "s_name", "n_name",
            "ps_supplycost_cents",
        )
    )


@q(
    "product_type_profit",
    f"""
WITH {_PS_SYNTH_SQL},
li AS (
  SELECT l_orderkey, l_partkey, l_suppkey,
         CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
           AS amount_tenk,
         CAST(round(l_quantity * 100) AS BIGINT) AS qty100
  FROM lineitem
),
red AS (SELECT p_partkey FROM part WHERE p_name LIKE '%red%')
SELECT n.n_name, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(li.amount_tenk - ps.ps_supplycost_cents * li.qty100)
            AS BIGINT) AS profit_tenk
FROM li
JOIN red ON li.l_partkey = red.p_partkey
JOIN ps ON ps.ps_partkey = li.l_partkey AND ps.ps_suppkey = li.l_suppkey
JOIN supplier s ON li.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN orders o ON li.l_orderkey = o.o_orderkey
GROUP BY n.n_name, o_year
""",
    "TPC-H Q9 shape (product-type profit measure) over the synthesized "
    "partsupp: profit on 'red' parts per supplier nation per year — "
    "revenue minus supply cost, the classic 6-table star join. Money "
    "never floats across a sum: revenue becomes exact integer "
    "ten-thousandths PER ROW (the BASELINE r5 discipline), and the cost "
    "side is integer cents x integer hundredth-quantities — also "
    "ten-thousandths — so profit is one int64 subtraction per line. "
    "Plan: part filter and the supplier/nation dims broadcast; the two "
    "real shuffles are lineitem->orders on orderkey and lineitem-> "
    "partsupp on (part, supp) — exactly the two fact-fact joins Q9 "
    "cannot avoid at any scale",
)
def q_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    red = t(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%")
    ).select("p_partkey")
    # partsupp pre-filtered to red parts BEFORE its distinct shuffles —
    # non-red rows could never survive the (partkey, suppkey) join below
    ps = _partsupp_synth(spark, sf_dir, part_filter=red)
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        F.expr(
            "CAST(round(l_extendedprice * (1 - l_discount) * 10000) "
            "AS BIGINT)"
        ).alias("amount_tenk"),
        F.expr("CAST(round(l_quantity * 100) AS BIGINT)").alias("qty100"),
    )
    sup = t(spark, sf_dir, "supplier")
    nat = t(spark, sf_dir, "nation")
    orders = t(spark, sf_dir, "orders")
    return (
        li.join(F.broadcast(red), li.l_partkey == red.p_partkey)
        .join(
            ps,
            (ps.ps_partkey == li.l_partkey)
            & (ps.ps_suppkey == li.l_suppkey),
        )
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            "n_name", F.year("o_orderdate").cast("long").alias("o_year")
        )
        .agg(
            F.sum(
                F.col("amount_tenk")
                - F.col("ps_supplycost_cents") * F.col("qty100")
            ).cast("long").alias("profit_tenk")
        )
    )


_FRAME_SLOTS = 8
_FPS_MILLI = (23976, 24000, 25000, 30000)


@q(
    "video_frame_plan",
    f"""
WITH meta AS (
  SELECT doc_id,
         CAST((doc_id * 37) % 600000 + 1000 AS BIGINT) AS duration_ms,
         CAST(CASE doc_id % 4 WHEN 0 THEN {_FPS_MILLI[0]}
                              WHEN 1 THEN {_FPS_MILLI[1]}
                              WHEN 2 THEN {_FPS_MILLI[2]}
                              ELSE {_FPS_MILLI[3]} END AS BIGINT)
           AS fps_milli
  FROM documents
),
frames AS (
  SELECT doc_id, duration_ms, fps_milli,
         CAST(duration_ms * fps_milli // 1000000 AS BIGINT) AS n_frames
  FROM meta
)
SELECT f.doc_id, CAST(s.slot AS BIGINT) AS slot, f.n_frames,
       CAST(s.slot * (f.n_frames - 1) // {_FRAME_SLOTS - 1} AS BIGINT)
         AS frame_idx,
       CAST((s.slot * (f.n_frames - 1) // {_FRAME_SLOTS - 1}) * 1000000
            // f.fps_milli AS BIGINT) AS ts_ms
FROM frames f
CROSS JOIN (SELECT unnest(generate_series(0, {_FRAME_SLOTS - 1})) AS slot) s
""",
    f"uniform video frame-sampling plan: for every asset, the "
    f"{_FRAME_SLOTS} frame indices and millisecond timestamps a "
    "multimodal ingest would decode — slot i maps to frame "
    "i*(n_frames-1)//(k-1), the endpoints-inclusive uniform grid, with "
    "frame counts derived from duration x fps entirely in integer "
    "milli-units (fps 23.976 stays exact as 23976 milli-fps; no float "
    "timebase math, the thing that actually desyncs frame pipelines). "
    "Video metadata is synthesized deterministically from doc_id — the "
    "container has no codecs (README: environment limitation), so the "
    "decode stage is the stub layer while the PLAN (the Spark-side "
    "contract a decode UDF consumes: per-slot rows, integer "
    "frame/timestamp targets) is real and oracle-checked. Per-row "
    "integer math x a constant 8-slot grid: embarrassingly parallel, "
    "no shuffle at all",
)
def q_video_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    fps = "CASE doc_id % 4 " + " ".join(
        f"WHEN {i} THEN {v}" for i, v in enumerate(_FPS_MILLI[:3])
    ) + f" ELSE {_FPS_MILLI[3]} END"
    frames = docs.select(
        "doc_id",
        F.expr("CAST((doc_id * 37) % 600000 + 1000 AS BIGINT)")
        .alias("duration_ms"),
        F.expr(f"CAST({fps} AS BIGINT)").alias("fps_milli"),
    ).withColumn(
        "n_frames",
        F.expr("CAST(duration_ms * fps_milli div 1000000 AS BIGINT)"),
    )
    return frames.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(_FRAME_SLOTS - 1)))
        .alias("slot"),
        "n_frames", "fps_milli",
    ).select(
        "doc_id", F.col("slot").cast("long").alias("slot"), "n_frames",
        F.expr(
            f"CAST(slot * (n_frames - 1) div {_FRAME_SLOTS - 1} AS BIGINT)"
        ).alias("frame_idx"),
        F.expr(
            f"CAST((slot * (n_frames - 1) div {_FRAME_SLOTS - 1}) * 1000000 "
            "div fps_milli AS BIGINT)"
        ).alias("ts_ms"),
    )


_SHIPMODES = ("AIR", "MAIL", "RAIL", "SHIP", "TRUCK")


@q(
    "shipmode_priority",
    f"""
WITH l AS (
  SELECT l_orderkey,
         CASE (l_orderkey * 3 + l_linenumber) % 5
           {' '.join(f"WHEN {i} THEN '{m}'" for i, m in enumerate(_SHIPMODES[:4]))}
           ELSE '{_SHIPMODES[4]}' END AS l_shipmode,
         {_LATENESS_SQL}
           AS lateness
  FROM lineitem
)
SELECT l.l_shipmode,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.lateness > 0
GROUP BY l.l_shipmode
""",
    "TPC-H Q12 shape (shipping modes and order priority): among LATE "
    "lines, how many belonged to urgent/high-priority orders per ship "
    "mode — the did-cheap-shipping-hurt-critical-orders audit. Ship mode "
    "and lateness are synthesized deterministically from (orderkey, "
    "linenumber) — the same lateness function late_delivery_suppliers "
    "uses, so the two queries describe one consistent synthetic world; "
    "o_orderpriority is real testdata. With Q2/Q9/Q11/Q16/Q20/Q21 this "
    "retires the last TPC-H shape the round-6 verdict listed as "
    "data-limited. Plan: one orderkey equi-join, conditional aggregates "
    "map-side combine into 5 groups",
)
def q_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    mode = "CASE (l_orderkey * 3 + l_linenumber) % 5 " + " ".join(
        f"WHEN {i} THEN '{m}'" for i, m in enumerate(_SHIPMODES[:4])
    ) + f" ELSE '{_SHIPMODES[4]}' END"
    l = li.select(
        "l_orderkey",
        F.expr(mode).alias("l_shipmode"),
        _lateness_col().alias("lateness"),
    ).filter(F.col("lateness") > 0)
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(orders, l.l_orderkey == orders.o_orderkey)
        .groupBy("l_shipmode")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("long")
            .alias("high_line_count"),
            F.sum(F.when(hi, 0).otherwise(1)).cast("long")
            .alias("low_line_count"),
        )
    )


