"""Graph algorithms (pagerank, triangles, k-core, label propagation) and mining ops (medoids, triples, margins, reciprocal NN).

Split out of the monolithic queries.py (r8); registration order is
preserved by the sequential imports in queries/__init__.py.
"""

from __future__ import annotations

from fastembed_rs_spark.queries._core import (
    D,
    DataFrame,
    F,
    QUERIES,
    QuerySpec,
    SparkSession,
    Window,
    _dk_cos,
    duck_split_80_10_10,
    duck_token_hash,
    duck_tokens,
    q,
    split_80_10_10,
    t,
)
from fastembed_rs_spark.queries.similarity import _ALL_SW
from fastembed_rs_spark.queries.model_stubs import _ivf_train_ctes
from fastembed_rs_spark.queries.timeseries_sketches import _EDGE_SQL

_GRAPH_EDGE_CTES = """li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS i FROM lineitem),
edges AS (SELECT DISTINCT a.i AS a, b.i AS b
          FROM li a JOIN li b ON a.o = b.o AND a.i < b.i),
sym AS (SELECT a AS src, b AS dst FROM edges
        UNION ALL SELECT b AS src, a AS dst FROM edges),
deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS outdeg
        FROM sym GROUP BY src)"""


def _pagerank_oracle(iters: int, scale: int, damping_pct: int) -> str:
    """Unrolled fixed-point PageRank: one CTE per iteration, every step
    integer multiply + floor division (DuckDB `//` == Spark `div` on
    positives) — bit-identical to operators/graph.py::pagerank_fixedpoint
    with NO float rounding policy at all."""
    d, r = damping_pct, 100 - damping_pct
    parts = [
        "nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM deg)",
        f"""r0 AS (SELECT node, outdeg, CAST({scale} // nn.n AS BIGINT) AS rank_units
      FROM deg CROSS JOIN nn)""",
    ]
    for k in range(1, iters + 1):
        parts.append(f"""r{k} AS (
  SELECT d.node, d.outdeg,
         CAST(({r} * {scale}) // (100 * nn.n) AS BIGINT)
         + CAST(sum(({d} * r.rank_units) // (100 * r.outdeg)) AS BIGINT) AS rank_units
  FROM deg d JOIN sym s ON s.dst = d.node
  JOIN r{k - 1} r ON s.src = r.node CROSS JOIN nn
  GROUP BY d.node, d.outdeg, nn.n)""")
    return (
        "WITH " + _GRAPH_EDGE_CTES + ",\n" + ",\n".join(parts)
        + f"\nSELECT node, rank_units FROM r{iters}"
    )


@q(
    "graph_pagerank",
    None,  # filled below — needs graph.PR_SCALE without a circular import
    "PageRank centrality over the part co-purchase graph (items appearing "
    "in the same order), 5 iterations, damping 0.85 — INTEGER FIXED-POINT: "
    "ranks are int64 mass units (1e12 total) and every step is integer "
    "multiply + floor division, so the result is bit-identical across "
    "engines/runs with no float rounding policy (per-node in-edge float "
    "sums are order-dependent and iterations amplify the drift — the same "
    "reason production graph engines fix-point incremental PageRank). "
    "Plan: rank⋈edge join + map-side-combined integer sum per iteration, "
    "lineage checkpoint-truncated every 2 rounds, node count as the one "
    "plan-time scalar; this is the join-based Pregel shape that survives "
    "a 100 TB edge list (persist sym bucketed by src and only ranks move)",
)
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators import graph as G

    edges = G.copurchase_edges(t(spark, sf_dir, "lineitem"))
    return G.pagerank_fixedpoint(edges, iters=5).select("node", "rank_units")


def _fill_graph_pagerank_oracle() -> None:
    from fastembed_rs_spark.operators.graph import PR_SCALE

    QUERIES["graph_pagerank"] = QuerySpec(
        spark=QUERIES["graph_pagerank"].spark,
        oracle=_pagerank_oracle(iters=5, scale=PR_SCALE, damping_pct=85),
        description=QUERIES["graph_pagerank"].description,
    )


_fill_graph_pagerank_oracle()


_GRAPH_EDGE2_CTES = """li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS i FROM lineitem),
edges AS (SELECT a.i AS a, b.i AS b
          FROM li a JOIN li b ON a.o = b.o AND a.i < b.i
          GROUP BY a.i, b.i HAVING count(*) >= 2),
sym AS (SELECT a AS src, b AS dst FROM edges
        UNION ALL SELECT b AS src, a AS dst FROM edges),
deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS outdeg
        FROM sym GROUP BY src)"""


@q(
    "graph_triangles",
    f"""
WITH {_GRAPH_EDGE2_CTES},
o AS (
  SELECT CASE WHEN da.outdeg < db.outdeg
                OR (da.outdeg = db.outdeg AND e.a < e.b)
              THEN e.a ELSE e.b END AS src,
         CASE WHEN da.outdeg < db.outdeg
                OR (da.outdeg = db.outdeg AND e.a < e.b)
              THEN e.b ELSE e.a END AS dst,
         CASE WHEN da.outdeg < db.outdeg
                OR (da.outdeg = db.outdeg AND e.a < e.b)
              THEN db.outdeg ELSE da.outdeg END AS dd
  FROM edges e JOIN deg da ON e.a = da.node JOIN deg db ON e.b = db.node
),
wedges AS (
  SELECT e1.src AS u, e1.dst AS v, e2.dst AS w
  FROM o e1 JOIN o e2 ON e1.src = e2.src
  WHERE e1.dd < e2.dd OR (e1.dd = e2.dd AND e1.dst < e2.dst)
),
tri AS (
  SELECT wedges.u AS x, wedges.v AS y, wedges.w AS z
  FROM wedges JOIN o ON o.src = wedges.v AND o.dst = wedges.w
),
corners AS (
  SELECT x AS node FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri
)
SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
FROM corners GROUP BY node
""",
    "per-node triangle counts over the SUPPORTED part co-purchase graph "
    "(pairs co-occurring in >= 2 orders — the standard noise cut: a single "
    "chance co-occurrence carries no signal, and without it a uniformly "
    "random basket corpus densifies toward a complete graph as it grows, "
    "which no triangle algorithm survives) — the local "
    "clustering signal that separates genuine near-dup/co-occurrence "
    "cliques from chance pair collisions. Degree-ordered enumeration: "
    "edges oriented low→high by (degree, id) so every node's oriented "
    "out-degree is O(sqrt(E)) and the wedge self-join never explodes on a "
    "hub (celebrity item with 1e6 co-purchases builds wedges only through "
    "its low-degree neighbors); each triangle has exactly one minimal "
    "apex, so it is counted once with no dedup pass. Two equi-joins total",
)
def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators import graph as G

    edges = G.copurchase_edges(t(spark, sf_dir, "lineitem"), min_support=2)
    return G.triangle_counts(edges).select("node", "n_triangles")


@q(
    "pareto_front",
    """
WITH vol AS (
  SELECT l_partkey, CAST(sum(l_quantity) AS BIGINT) AS volume
  FROM lineitem GROUP BY l_partkey
),
pts AS (
  SELECT p.p_partkey,
         CAST(round(p.p_retailprice * 100) AS BIGINT) AS price_cents,
         v.volume
  FROM part p JOIN vol v ON p.p_partkey = v.l_partkey
),
sky AS (
  SELECT p_partkey, price_cents, volume,
         max(volume) OVER (ORDER BY price_cents
             RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mx_lt,
         max(volume) OVER (PARTITION BY price_cents) AS mx_eq
  FROM pts
)
SELECT p_partkey, price_cents, volume
FROM sky
WHERE (mx_lt IS NULL OR volume > mx_lt) AND volume = mx_eq
""",
    "2-D skyline (Pareto front) of parts: cheapest-for-the-volume — rows "
    "no other part dominates on (retail price ↓, units sold ↑). The "
    "sort-sweep formulation (gain vs running max over strictly-cheaper "
    "rows, two window maxes) is O(n log n), never the O(n²) NOT-EXISTS "
    "self-join; the Spark side runs an exact hash-bucketed LOCAL skyline "
    "first (dominance in a subset implies global dominance, transitivity "
    "keeps a dominator among survivors) so the single-partition global "
    "sweep touches only near-skyline candidates. Integer cents/units "
    "comparisons — no float ordering anywhere",
)
def q_pareto_front(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.scale import pareto_front_2d

    li = t(spark, sf_dir, "lineitem")
    vol = li.groupBy("l_partkey").agg(
        F.sum("l_quantity").cast("long").alias("volume")
    )
    pts = (
        t(spark, sf_dir, "part")
        .join(vol, F.col("p_partkey") == F.col("l_partkey"))
        .select(
            "p_partkey",
            F.round(F.col("p_retailprice") * 100).cast("long").alias("price_cents"),
            "volume",
        )
    )
    return pareto_front_2d(pts, "price_cents", "volume").select(
        "p_partkey", "price_cents", "volume"
    )


#: the ONE k=8/iters=3 training replay every trained-centroid oracle
#: shares (cluster_medoids, margin_mining, and the ann_recall/bucket-
#: drift builders call _ivf_train_ctes with the same args) — a single
#: constant makes 'these oracles replay the SAME training' explicit
_TRAIN8_CTES, _TRAIN8_CENT = _ivf_train_ctes(k=8, iters=3)

@q(
    "cluster_medoids",
    f"""{_TRAIN8_CTES},
assign AS (
  SELECT p.vec_id, CAST(c.centroid_id AS BIGINT) AS centroid_id,
         round({_dk_cos('p.v', 'c.cv')}, 6) AS cscore
  FROM pts p CROSS JOIN {_TRAIN8_CENT} c
  QUALIFY row_number() OVER (PARTITION BY p.vec_id
                             ORDER BY cscore DESC, c.centroid_id ASC) = 1
)
SELECT centroid_id, vec_id AS medoid_id, cscore AS medoid_score,
       CAST(count(*) OVER (PARTITION BY centroid_id) AS BIGINT) AS cluster_size
FROM assign
QUALIFY row_number() OVER (PARTITION BY centroid_id
                           ORDER BY cscore DESC, vec_id ASC) = 1
""",
    "cluster prototype selection: per trained-IVF bucket (k=8 Lloyd's "
    "centroids via operators.topk.train_ivf_centroids — constant-size "
    "driver state; the oracle replays training as chained CTEs exactly "
    "like ann_ivf_trained) the member closest to the centroid + bucket "
    "size — the curation primitive behind prototype-per-cluster corpus "
    "summaries and SemDeDup representative picking. Both argmaxes are "
    "max(struct(score, -id, ...)) hash aggregations with map-side partial "
    "combine (nothing is sorted, the shuffle carries one pre-reduced row "
    "per key per map partition); centroid scoring reuses the NumPy tile "
    "kernel, scores rounded to 6 BEFORE the argmax so tie semantics match "
    "the oracle windows exactly",
)
def q_cluster_medoids(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.fast_vector import pairwise_cosine_fast
    from fastembed_rs_spark.operators.topk import train_ivf_centroids

    emb = t(spark, sf_dir, "embeddings")
    # k trained centroids collected to the driver: CONSTANT size by
    # construction (k=8), unlike the former 1-in-50 modulo sample whose
    # driver footprint grew linearly with the corpus
    targets = [
        (r[0], list(r[1]))
        for r in train_ivf_centroids(emb, k=8, iters=3).collect()
    ]
    scored = pairwise_cosine_fast(
        emb, "vec_id", "embedding", targets,
        target_id_name="centroid_id", score_name="__raw",
    ).select("vec_id", "centroid_id", F.round("__raw", 6).alias("cscore"))
    assign = (
        scored.groupBy("vec_id")
        .agg(
            F.max(
                F.struct(
                    F.col("cscore").alias("cscore"),
                    (-F.col("centroid_id")).alias("__nc"),
                    F.col("centroid_id").alias("centroid_id"),
                )
            ).alias("__b")
        )
        .select(
            "vec_id",
            F.col("__b.cscore").alias("cscore"),
            F.col("__b.centroid_id").alias("centroid_id"),
        )
    )
    return (
        assign.groupBy("centroid_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cluster_size"),
            F.max(
                F.struct(
                    F.col("cscore").alias("cscore"),
                    (-F.col("vec_id")).alias("__nv"),
                    F.col("vec_id").alias("vec_id"),
                )
            ).alias("__b"),
        )
        .select(
            "centroid_id",
            F.col("__b.vec_id").alias("medoid_id"),
            F.col("__b.cscore").alias("medoid_score"),
            "cluster_size",
        )
    )


#: integer text features whose pairwise correlations feature_correlations
#: reports — names must match text_stat_counts_fast output columns
_CORR_FEATS = ("n_chars", "n_tokens", "tok_chars", "sw_any", "n_punct")


def _corr_oracle() -> str:
    feats = _CORR_FEATS
    moments = ["CAST(count(*) AS BIGINT) AS n"]
    for a in feats:
        moments.append(f"CAST(sum({a}) AS BIGINT) AS s_{a}")
        moments.append(f"CAST(sum({a} * {a}) AS BIGINT) AS ss_{a}")
    pair_rows = []
    for i, a in enumerate(feats):
        for b in feats[i + 1:]:
            moments.append(f"CAST(sum({a} * {b}) AS BIGINT) AS sp_{a}__{b}")
            num = (
                f"(CAST(n AS DOUBLE) * CAST(sp_{a}__{b} AS DOUBLE)"
                f" - CAST(s_{a} AS DOUBLE) * CAST(s_{b} AS DOUBLE))"
            )
            den = (
                f"((CAST(n AS DOUBLE) * CAST(ss_{a} AS DOUBLE)"
                f" - CAST(s_{a} AS DOUBLE) * CAST(s_{a} AS DOUBLE))"
                f" * (CAST(n AS DOUBLE) * CAST(ss_{b} AS DOUBLE)"
                f" - CAST(s_{b} AS DOUBLE) * CAST(s_{b} AS DOUBLE)))"
            )
            pair_rows.append(
                f"SELECT '{a}' AS feature_a, '{b}' AS feature_b, "
                f"round(CASE WHEN {den} <= 0.0 THEN 0.0 "
                f"ELSE {num} / sqrt({den}) END, 6) AS pearson_r FROM mom"
            )
    return f"""
WITH f AS (
  SELECT CAST(length(text) AS BIGINT) AS n_chars,
         CAST(len({duck_tokens('text')}) AS BIGINT) AS n_tokens,
         CAST(coalesce(list_sum(list_transform({duck_tokens('text')}, tk -> length(tk))), 0) AS BIGINT) AS tok_chars,
         CAST(len(list_filter({duck_tokens('text')}, tk -> list_contains([{_ALL_SW}], tk))) AS BIGINT) AS sw_any,
         CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS BIGINT) AS n_punct
  FROM documents
),
mom AS (SELECT {', '.join(moments)} FROM f)
{' UNION ALL '.join(pair_rows)}
"""


@q(
    "feature_correlations",
    _corr_oracle(),
    "Pearson correlation matrix of the per-document integer text features "
    "(chars, tokens, token chars, stopword hits, punct count) — the "
    "redundancy screen run before feeding quality features to a "
    "classifier. One kernel scan + ONE single-row aggregate of exact "
    "int64 moments (n, Σx, Σx², Σxy — map-side combined, no shuffle "
    "beyond 1 row), then each r = (nΣxy-ΣxΣy)/√((nΣx²-(Σx)²)(nΣy²-(Σy)²)) "
    "from exactly-converted integer moments: every float op is on "
    "identical inputs with IEEE-determined results, so the matrix is "
    "bit-identical across engines before the cosmetic round(6). Int64 "
    "moments are exact to ~2e5 docs at these feature scales; past that "
    "switch the Σ columns to decimal(38,0) (one-line change, noted here "
    "rather than paid everywhere)",
)
def q_feature_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.fast_text import text_stat_counts_fast

    feats = _CORR_FEATS
    counts = text_stat_counts_fast(
        t(spark, sf_dir, "documents"), "doc_id", "text"
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for a in feats:
        aggs.append(F.sum(a).cast("long").alias(f"s_{a}"))
        aggs.append(F.sum(F.col(a) * F.col(a)).cast("long").alias(f"ss_{a}"))
    for i, a in enumerate(feats):
        for b in feats[i + 1:]:
            aggs.append(
                F.sum(F.col(a) * F.col(b)).cast("long").alias(f"sp_{a}__{b}")
            )
    mom = counts.agg(*aggs)

    def dbl(c: str):
        return F.col(c).cast("double")

    structs = []
    for i, a in enumerate(feats):
        for b in feats[i + 1:]:
            num = dbl("n") * dbl(f"sp_{a}__{b}") - dbl(f"s_{a}") * dbl(f"s_{b}")
            den = (dbl("n") * dbl(f"ss_{a}") - dbl(f"s_{a}") * dbl(f"s_{a}")) * (
                dbl("n") * dbl(f"ss_{b}") - dbl(f"s_{b}") * dbl(f"s_{b}")
            )
            r = F.when(den <= 0.0, F.lit(0.0)).otherwise(num / F.sqrt(den))
            structs.append(
                F.struct(
                    F.lit(a).alias("feature_a"),
                    F.lit(b).alias("feature_b"),
                    F.round(r, 6).alias("pearson_r"),
                )
            )
    return mom.select(F.explode(F.array(*structs)).alias("__p")).select(
        "__p.feature_a", "__p.feature_b", "__p.pearson_r"
    )


@q(
    "association_rules",
    """
WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS i FROM lineitem),
nn AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS n_orders FROM li),
itm AS (SELECT i, CAST(count(*) AS BIGINT) AS cnt FROM li GROUP BY i),
pr AS (
  SELECT a.i AS item_a, b.i AS item_b, CAST(count(*) AS BIGINT) AS pair_cnt
  FROM li a JOIN li b ON a.o = b.o AND a.i < b.i
  GROUP BY a.i, b.i
  HAVING count(*) >= 2
)
SELECT item_a, item_b, pair_cnt,
       round(CAST(pair_cnt AS DOUBLE) / CAST(nn.n_orders AS DOUBLE), 6) AS support,
       round(CAST(pair_cnt AS DOUBLE) / CAST(ia.cnt AS DOUBLE), 6) AS conf_a_to_b,
       round(CAST(pair_cnt AS DOUBLE) / CAST(ib.cnt AS DOUBLE), 6) AS conf_b_to_a,
       round((CAST(pair_cnt AS DOUBLE) * CAST(nn.n_orders AS DOUBLE))
             / (CAST(ia.cnt AS DOUBLE) * CAST(ib.cnt AS DOUBLE)), 6) AS lift
FROM pr
JOIN itm ia ON pr.item_a = ia.i
JOIN itm ib ON pr.item_b = ib.i
CROSS JOIN nn
""",
    "market-basket association rules over part pairs co-occurring in ≥2 "
    "orders: support, directional confidence, lift — the A-priori-style "
    "2-itemset pass behind every 'frequently bought together' feature. "
    "Pair counts come from the basket self-join (fan-out bounded by "
    "items-per-order, the copurchase_edges scale argument); item counts "
    "and the basket total ride broadcast joins onto the pair table; every "
    "ratio is ONE float division (or one product then one division, same "
    "tree both engines) of exactly-converted integer counts, so scores "
    "are bit-identical cross-engine before round(6). min-support (≥2) is "
    "pushed into the pair aggregation HAVING, the step that makes "
    "A-priori feasible at scale — the long tail of singleton pairs never "
    "leaves the partial aggregate",
)
def q_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    # EAGER checkpoint: li feeds FOUR consumers (n_orders, item counts and
    # both self-join sides) — without it the distinct's shuffle re-runs
    # once per consumer
    li = (
        t(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("i"))
        .distinct()
        .localCheckpoint()
    )
    n_orders = li.agg(
        F.countDistinct("o").cast("long").alias("n_orders")
    )
    itm = li.groupBy("i").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    a = li.select("o", F.col("i").alias("item_a"))
    b = li.select("o", F.col("i").alias("item_b"))
    pr = (
        a.join(b, "o")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("long").alias("pair_cnt"))
        .filter(F.col("pair_cnt") >= 2)
    )
    ia = itm.select(F.col("i").alias("item_a"), F.col("cnt").alias("__ca"))
    ib = itm.select(F.col("i").alias("item_b"), F.col("cnt").alias("__cb"))
    j = (
        pr.join(F.broadcast(ia), "item_a")
        .join(F.broadcast(ib), "item_b")
        .crossJoin(F.broadcast(n_orders))
    )
    pc, ca, cb, no = (
        F.col("pair_cnt").cast("double"),
        F.col("__ca").cast("double"),
        F.col("__cb").cast("double"),
        F.col("n_orders").cast("double"),
    )
    return j.select(
        "item_a",
        "item_b",
        "pair_cnt",
        F.round(pc / no, 6).alias("support"),
        F.round(pc / ca, 6).alias("conf_a_to_b"),
        F.round(pc / cb, 6).alias("conf_b_to_a"),
        F.round((pc * no) / (ca * cb), 6).alias("lift"),
    )


def _lp_round_sql(k: int) -> str:
    return f"""v{k} AS (
  SELECT s.dst AS node, l.label, CAST(count(*) AS BIGINT) AS cnt
  FROM sym s JOIN l{k - 1} l ON s.src = l.node
  WHERE s.dst NOT IN (SELECT node FROM l{k - 1})
  GROUP BY s.dst, l.label
),
n{k} AS (
  SELECT node, label, CAST({k} AS BIGINT) AS round_labeled FROM v{k}
  QUALIFY row_number() OVER (PARTITION BY node ORDER BY cnt DESC, label ASC) = 1
),
l{k} AS (SELECT * FROM l{k - 1} UNION ALL SELECT * FROM n{k})"""


def _lp_audit(spark: SparkSession, sf_dir: str, edges) -> DataFrame:
    """Shared body of the two label-propagation queries: 10% modulo seed
    set, 2 fill-only majority rounds over the given edge table, then the
    held-out correctness audit columns — the queries differ ONLY in how
    the edge table is generated (full threshold graph vs per-node-capped)."""
    from fastembed_rs_spark.operators.graph import propagate_labels

    emb = t(spark, sf_dir, "embeddings")
    seeds = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("node"), "label"
    )
    out = propagate_labels(edges, seeds, rounds=2)
    truth = emb.select(
        F.col("vec_id").alias("node"), F.col("label").cast("long").alias("__t")
    )
    return out.join(truth, "node").select(
        "node",
        F.col("label").alias("label_pred"),
        "round_labeled",
        F.when(F.col("label") == F.col("__t"), 1)
        .otherwise(0)
        .cast("long")
        .alias("correct"),
    )


@q(
    "label_propagation",
    f"""
WITH edges AS ({_EDGE_SQL}),
sym AS (SELECT id_a AS src, id_b AS dst FROM edges
        UNION ALL SELECT id_b AS src, id_a AS dst FROM edges),
l0 AS (SELECT vec_id AS node, CAST(label AS BIGINT) AS label,
              CAST(0 AS BIGINT) AS round_labeled
       FROM embeddings WHERE vec_id % 10 = 0),
{_lp_round_sql(1)},
{_lp_round_sql(2)}
SELECT l2.node, l2.label AS label_pred, l2.round_labeled,
       CAST(CASE WHEN l2.label = CAST(e.label AS BIGINT) THEN 1 ELSE 0 END
            AS BIGINT) AS correct
FROM l2 JOIN embeddings e ON l2.node = e.vec_id
""",
    "semi-supervised label spreading: 10% of vectors keep their true "
    "label (deterministic vec_id seed set), everyone else takes the "
    "majority label of labeled near-dup neighbors (cosine ≥ 0.4 graph), "
    "2 fill-only rounds — how sparse human quality/language/domain labels "
    "get extended across a 100 TB corpus without a model. Fill-only "
    "propagation is monotone (labeled set only grows), so rounds bound "
    "work and there is no LPA oscillation; per round one edge⋈labeled "
    "equi-join + one (node,label) count agg + one max(struct) argmax "
    "(ties → lowest label), lineage checkpoint-truncated. Output carries "
    "the round each node was labeled in and correctness vs the held-out "
    "truth — the accuracy audit rides the same scan",
)
def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = (
        QUERIES["embedding_neardup"]
        .spark(spark, sf_dir)
        .select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    )
    return _lp_audit(spark, sf_dir, edges)


@q(
    "label_propagation_bounded",
    f"""
WITH edges0 AS (
  SELECT * FROM (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round({_dk_cos('a.embedding', 'b.embedding')}, 6) AS score
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  ) WHERE score >= 0.4
),
sym0 AS (SELECT id_a AS src, id_b AS dst, score FROM edges0
         UNION ALL SELECT id_b, id_a, score FROM edges0),
edges AS (
  SELECT DISTINCT least(src, dst) AS id_a, greatest(src, dst) AS id_b
  FROM (SELECT src, dst,
               row_number() OVER (PARTITION BY src
                                  ORDER BY score DESC, dst ASC) AS rnk
        FROM sym0)
  WHERE rnk <= 8
),
sym AS (SELECT id_a AS src, id_b AS dst FROM edges
        UNION ALL SELECT id_b AS src, id_a AS dst FROM edges),
l0 AS (SELECT vec_id AS node, CAST(label AS BIGINT) AS label,
              CAST(0 AS BIGINT) AS round_labeled
       FROM embeddings WHERE vec_id % 10 = 0),
{_lp_round_sql(1)},
{_lp_round_sql(2)}
SELECT l2.node, l2.label AS label_pred, l2.round_labeled,
       CAST(CASE WHEN l2.label = CAST(e.label AS BIGINT) THEN 1 ELSE 0 END
            AS BIGINT) AS correct
FROM l2 JOIN embeddings e ON l2.node = e.vec_id
""",
    "label_propagation on the BOUNDED edge set (the 100 TB input shape): "
    "the cosine≥0.4 near-dup graph grows quadratically per duplicate "
    "cluster, so the edge generator caps each node to its top-8 partners "
    "(union-kNN: an edge survives when EITHER endpoint ranks it ≤ 8 by "
    "rounded score, ties to the lower partner id) INSIDE the tile kernel "
    "— the pair table is n·B·k-bounded before any shuffle "
    "(dedup.py::embedding_near_dups_blocked per_node_top_k). Propagation "
    "itself is unchanged: fill-only majority over labeled neighbors, 2 "
    "rounds, monotone labeled set — same accuracy-audit output columns",
)
def q_label_propagation_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = D.embedding_near_dups_blocked(
        t(spark, sf_dir, "embeddings"), threshold=0.4, per_node_top_k=8
    ).select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    return _lp_audit(spark, sf_dir, edges)


@q(
    "cohort_retention",
    """
WITH e AS (
  SELECT user_id, epoch_ns(ts) // 604800000000000 AS wk FROM events
),
c AS (SELECT user_id, min(wk) AS cohort_wk FROM e GROUP BY user_id),
a AS (
  SELECT DISTINCT e.user_id, c.cohort_wk, e.wk - c.cohort_wk AS offset_wk
  FROM e JOIN c ON e.user_id = c.user_id
),
sz AS (SELECT cohort_wk, CAST(count(*) AS BIGINT) AS cohort_size
       FROM c GROUP BY cohort_wk)
SELECT a.cohort_wk, a.offset_wk,
       CAST(count(*) AS BIGINT) AS n_active,
       sz.cohort_size,
       round(CAST(count(*) AS DOUBLE) / CAST(sz.cohort_size AS DOUBLE), 6)
         AS retention
FROM a JOIN sz ON a.cohort_wk = sz.cohort_wk
GROUP BY a.cohort_wk, a.offset_wk, sz.cohort_size
""",
    "cohort retention matrix: users grouped by first-activity week, "
    "fraction still active k weeks later — the product-analytics staple "
    "behind every retention curve. Weeks are exact integer epoch-nanos "
    "floor-division buckets (ts div 604800e9), NOT calendar months: "
    "calendar bucketing is the classic cross-engine trap (zone/DST/month "
    "length), integer weeks hash-match by construction. Shape: one "
    "user-keyed min-agg for cohorts, one distinct over (user, offset) — "
    "both partial-agg'd before their shuffles — then a cohort-sized "
    "(tiny) size table joined back; the per-user event history never "
    "needs to fit anywhere, only its distinct week set does",
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").select(
        "user_id", F.expr("ts div 604800000000000").alias("wk")
    )
    c = e.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    a = (
        e.join(c, "user_id")
        .select("user_id", "cohort_wk", (F.col("wk") - F.col("cohort_wk")).alias("offset_wk"))
        .distinct()
    )
    sz = c.groupBy("cohort_wk").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    return (
        a.groupBy("cohort_wk", "offset_wk")
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
        .join(F.broadcast(sz), "cohort_wk")
        .select(
            "cohort_wk",
            "offset_wk",
            "n_active",
            "cohort_size",
            F.round(
                F.col("n_active").cast("double")
                / F.col("cohort_size").cast("double"),
                6,
            ).alias("retention"),
        )
    )


@q(
    "training_triples",
    f"""
WITH qv AS (
  SELECT vec_id AS query_id, embedding AS qe, label AS qlabel
  FROM embeddings WHERE vec_id < 20
),
scored AS (
  SELECT qv.query_id, qv.qlabel, e.vec_id, e.label,
         round({_dk_cos('qv.qe', 'e.embedding')}, 6) AS score
  FROM qv CROSS JOIN embeddings e
  WHERE e.vec_id <> qv.query_id
),
pos AS (
  SELECT query_id, vec_id AS pos_id, score AS pos_score
  FROM scored WHERE label = qlabel
  QUALIFY row_number() OVER (PARTITION BY query_id
                             ORDER BY score DESC, vec_id ASC) = 1
),
neg AS (
  SELECT query_id, vec_id AS neg_id, score AS neg_score,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY score DESC, vec_id ASC) AS BIGINT)
           AS neg_rank
  FROM scored WHERE label <> qlabel
  QUALIFY neg_rank <= 5
)
SELECT neg.query_id, pos.pos_id, pos.pos_score,
       neg.neg_rank, neg.neg_id, neg.neg_score
FROM neg JOIN pos ON neg.query_id = pos.query_id
""",
    "contrastive training-pair generation: for each anchor, the nearest "
    "SAME-label neighbor as the positive and the 5 nearest "
    "DIFFERENT-label vectors as hard negatives — the (anchor, positive, "
    "hard-negative) triples that train embedding models and rerankers "
    "(the reference's models are consumers of exactly this data). One "
    "broadcast-anchor score pass feeds both sides; the positive is a "
    "map-side-combined max(struct) argmax (no sort), negatives go "
    "through the rank-k window WindowGroupLimit prunes; at corpus scale "
    "the scored pass swaps for the IVF/PQ searchers with label "
    "post-filter + overfetch — same downstream contract",
)
def q_training_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.fast_vector import pairwise_cosine_fast

    emb = t(spark, sf_dir, "embeddings")
    anchors = (
        emb.filter(F.col("vec_id") < 20)
        .select("vec_id", "embedding", "label")
        .collect()
    )
    targets = [(r[0], list(r[1])) for r in anchors]
    from fastembed_rs_spark.operators.scale import local_table

    qlabels = local_table(
        spark, [(r[0], r[2]) for r in anchors], "query_id long, __ql int"
    )
    # anchor scoring through the NumPy tile kernel (the expression-chain
    # cosine measured 3.5s for this 40k-row pass at sf0.1 — codegen does
    # not love a 64-dim unrolled tree; the kernel is bit-identical, see
    # the blocked-neardup pin). Materialized once for its two consumers.
    scored = (
        pairwise_cosine_fast(
            emb, "vec_id", "embedding", targets,
            target_id_name="query_id", score_name="__raw",
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .join(F.broadcast(qlabels), "query_id")
        .join(emb.select("vec_id", "label"), "vec_id")  # AQE broadcasts
        .select(
            "query_id",
            "__ql",
            "vec_id",
            "label",
            F.round("__raw", 6).alias("score"),
        )
        .localCheckpoint()
    )
    pos = (
        scored.filter(F.col("label") == F.col("__ql"))
        .groupBy("query_id")
        .agg(
            F.max(
                F.struct(
                    F.col("score").alias("score"),
                    (-F.col("vec_id")).alias("__nv"),
                    F.col("vec_id").alias("vec_id"),
                )
            ).alias("__b")
        )
        .select(
            "query_id",
            F.col("__b.vec_id").alias("pos_id"),
            F.col("__b.score").alias("pos_score"),
        )
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("vec_id")
    )
    neg = (
        scored.filter(F.col("label") != F.col("__ql"))
        .withColumn("neg_rank", F.row_number().over(wr).cast("long"))
        .filter(F.col("neg_rank") <= 5)
        .select(
            "query_id",
            F.col("vec_id").alias("neg_id"),
            F.col("score").alias("neg_score"),
            "neg_rank",
        )
    )
    return neg.join(F.broadcast(pos), "query_id").select(
        "query_id", "pos_id", "pos_score", "neg_rank", "neg_id", "neg_score"
    )


_GRAMS_CTE = f"""g AS (
  SELECT doc_id, lang,
         list_distinct(CASE WHEN len({duck_tokens('text')}) >= 3 THEN
           list_transform(generate_series(1, len({duck_tokens('text')}) - 2),
             i -> concat_ws(' ', {duck_tokens('text')}[i], {duck_tokens('text')}[i+1], {duck_tokens('text')}[i+2]))
         ELSE [] END) AS grams
  FROM documents
)"""


@q(
    "containment_neardup",
    f"""
WITH {_GRAMS_CTE}
SELECT * FROM (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(len(a.grams) AS BIGINT) AS grams_a,
         CAST(len(b.grams) AS BIGINT) AS grams_b,
         round(CASE WHEN least(len(a.grams), len(b.grams)) = 0 THEN 0.0 ELSE
           CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
           / CAST(least(len(a.grams), len(b.grams)) AS DOUBLE) END, 6)
           AS containment
  FROM g a JOIN g b ON a.doc_id < b.doc_id
) WHERE containment >= 0.6
""",
    "asymmetric containment near-dup pairs: |A∩B| / min(|A|,|B|) ≥ 0.6 "
    "over word-3-gram sets — catches quote/subset duplication that "
    "Jaccard structurally misses (a paragraph pasted into a 100x longer "
    "page is ~0.01 Jaccard but 1.0 containment; curation drops the "
    "contained side). Same inverted-index shape and Σdf² cost model as "
    "ngram_jaccard_neardup: postings self-equi-join, zero-overlap pairs "
    "never materialize, exact for threshold > 0 "
    "(operators/dedup.py::containment_pairs)",
)
def q_containment_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.dedup import containment_pairs

    docs = t(spark, sf_dir, "documents")
    return containment_pairs(docs, "doc_id", "text", n=3, threshold=0.6)


@q(
    "grouped_linregress",
    f"""
WITH f AS (
  SELECT lang,
         CAST(len({duck_tokens('text')}) AS BIGINT) AS x,
         CAST(length(text) AS BIGINT) AS y
  FROM documents
),
m AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM f GROUP BY lang
)
SELECT lang, n,
  round(CASE WHEN (n * sxx - sx * sx) = 0 THEN 0.0 ELSE
    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
  END, 6) AS slope,
  round(CASE WHEN (n * sxx - sx * sx) = 0 THEN 0.0 ELSE
    (CAST(sy AS DOUBLE) - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) * CAST(sx AS DOUBLE))
    / CAST(n AS DOUBLE)
  END, 6) AS intercept,
  round(CASE WHEN (n * sxx - sx * sx) = 0 OR (n * syy - sy * sy) = 0 THEN 0.0 ELSE
    ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
     * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
    / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
       * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
  END, 6) AS r2
FROM m
""",
    "per-group closed-form linear regression (chars ~ tokens per "
    "language): slope, intercept, R² from ONE pass of exact int64 moment "
    "sums — the distributed 'ML-lite' shape for per-segment trend fits "
    "that never needs an iterative solver. Degenerate groups (zero x or y "
    "variance) report 0.0 via an EXACT integer variance check, not a "
    "float epsilon; the float stages run the same expression tree on "
    "identically-converted integer moments, so results are bit-identical "
    "cross-engine before round(6). Same int64-range note as "
    "feature_correlations applies past ~2e5 docs per group",
)
def q_grouped_linregress(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    from fastembed_rs_spark.functions.text import tokens

    f = docs.select(
        "lang",
        F.size(tokens(F.col("text"))).cast("long").alias("x"),
        F.length("text").cast("long").alias("y"),
    )
    m = f.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )

    def dbl(c: str):
        return F.col(c).cast("double")

    denx_i = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    deny_i = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    num = dbl("n") * dbl("sxy") - dbl("sx") * dbl("sy")
    denx = dbl("n") * dbl("sxx") - dbl("sx") * dbl("sx")
    deny = dbl("n") * dbl("syy") - dbl("sy") * dbl("sy")
    slope = num / denx
    return m.select(
        "lang",
        "n",
        F.round(F.when(denx_i == 0, F.lit(0.0)).otherwise(slope), 6).alias("slope"),
        F.round(
            F.when(denx_i == 0, F.lit(0.0)).otherwise(
                (dbl("sy") - slope * dbl("sx")) / dbl("n")
            ),
            6,
        ).alias("intercept"),
        F.round(
            F.when((denx_i == 0) | (deny_i == 0), F.lit(0.0)).otherwise(
                (num * num) / (denx * deny)
            ),
            6,
        ).alias("r2"),
    )


@q(
    "reciprocal_nn",
    f"""
WITH p AS (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         round({_dk_cos('a.embedding', 'b.embedding')}, 6) AS score
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
),
pf AS (SELECT * FROM p WHERE score >= 0.2),
r AS (
  SELECT src, dst, score,
         CAST(row_number() OVER (PARTITION BY src
                                 ORDER BY score DESC, dst ASC) AS BIGINT)
           AS rnk
  FROM pf QUALIFY rnk <= 3
)
SELECT r1.src AS id_a, r1.dst AS id_b, r1.score,
       r1.rnk AS rank_ab, r2.rnk AS rank_ba
FROM r r1 JOIN r r2 ON r1.src = r2.dst AND r1.dst = r2.src
WHERE r1.src < r1.dst
""",
    "reciprocal nearest neighbors: pairs where EACH side ranks the other "
    "in its top-3 (among candidates with cosine ≥ 0.2) — the "
    "high-precision mutual-kNN filter that separates true duplicates "
    "from hub vectors that merely sit near everything (a hub appears in "
    "many top-k lists but reciprocates few). One blocked-kernel candidate "
    "pass feeds a per-src rank window (WindowGroupLimit-pruned), then "
    "mutuality is a self equi-join on the reversed pair; at corpus scale "
    "the candidate pass swaps for the IVF searcher with overfetch — the "
    "mutual-join stage is unchanged",
)
def q_reciprocal_nn(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per_node_top_k=3 bounds the candidate pair table to the union-3NN
    # graph INSIDE the tile kernel (n·B·3-ish rows instead of quadratic
    # per dup-cluster) — provably output-identical here: every src's true
    # top-3 partners survive the cap, extra partners kept via the other
    # side only rank ≥ 4, and mutuality needs rank ≤ 3 on BOTH sides
    # (tests/test_mining_ops.py pins capped == brute-force full semantics)
    pairs = D.embedding_near_dups_blocked(
        t(spark, sf_dir, "embeddings"), threshold=0.2, per_node_top_k=3
    )
    # blocked kernel emits canonical a<b pairs; symmetrize for ranking
    sym = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst"), "score"
    ).unionAll(
        pairs.select(
            F.col("id_b").alias("src"), F.col("id_a").alias("dst"), "score"
        )
    )
    wr = Window.partitionBy("src").orderBy(F.desc("score"), F.asc("dst"))
    # EAGER checkpoint: r feeds both sides of the mutuality self-join —
    # without it the near-dup KERNEL and the ranking window run twice
    r = (
        sym.withColumn("rnk", F.row_number().over(wr).cast("long"))
        .filter(F.col("rnk") <= 3)
        .localCheckpoint()
    )
    r2 = r.select(
        F.col("src").alias("dst"),
        F.col("dst").alias("src"),
        F.col("rnk").alias("rank_ba"),
    )
    return (
        r.join(r2, ["src", "dst"])
        .filter(F.col("src") < F.col("dst"))
        .select(
            F.col("src").alias("id_a"),
            F.col("dst").alias("id_b"),
            "score",
            F.col("rnk").alias("rank_ab"),
            "rank_ba",
        )
    )



@q(
    "margin_mining",
    f"""{_TRAIN8_CTES},
probes AS (
  SELECT p.vec_id, c.centroid_id,
         row_number() OVER (PARTITION BY p.vec_id
                            ORDER BY round({_dk_cos('p.v', 'c.cv')}, 6) DESC,
                                     c.centroid_id ASC) AS rnk
  FROM pts p CROSS JOIN {_TRAIN8_CENT} c
  QUALIFY rnk <= 2
),
cand AS (
  SELECT DISTINCT a.vec_id AS aid, c.vec_id AS cid
  FROM probes a JOIN probes c ON a.centroid_id = c.centroid_id
  WHERE a.vec_id % 2 = 0 AND c.vec_id % 2 = 1
    AND (a.rnk = 1 OR c.rnk = 1)
),
p AS (
  SELECT cand.aid, cand.cid,
         CAST(round({_dk_cos('ea.v', 'ec.v')} * 1000000)
              AS BIGINT) AS si
  FROM cand JOIN pts ea ON cand.aid = ea.vec_id
            JOIN pts ec ON cand.cid = ec.vec_id
),
ka AS (
  SELECT aid, CAST(sum(si) AS BIGINT) AS suma
  FROM (SELECT aid, si, row_number() OVER (PARTITION BY aid
              ORDER BY si DESC, cid ASC) AS rn FROM p)
  WHERE rn <= 4 GROUP BY aid
),
kc AS (
  SELECT cid, CAST(sum(si) AS BIGINT) AS sumc
  FROM (SELECT cid, si, row_number() OVER (PARTITION BY cid
              ORDER BY si DESC, aid ASC) AS rn FROM p)
  WHERE rn <= 4 GROUP BY cid
),
m AS (
  SELECT p.aid, p.cid, p.si,
         round(CASE WHEN (ka.suma + kc.sumc) <= 0 THEN 0.0 ELSE
           8.0 * CAST(p.si AS DOUBLE) / CAST(ka.suma + kc.sumc AS DOUBLE)
         END, 6) AS margin
  FROM p JOIN ka ON p.aid = ka.aid JOIN kc ON p.cid = kc.cid
)
SELECT aid AS anchor_id, cid AS candidate_id,
       round(CAST(si AS DOUBLE) / 1000000, 6) AS score, margin
FROM m
QUALIFY row_number() OVER (PARTITION BY aid
                           ORDER BY margin DESC, cid ASC) = 1
""",
    "margin-based mining (ratio margin, Artetxe & Schwenk 2019 — the "
    "bitext-mining score behind CCMatrix-style parallel-corpus "
    "extraction): split vectors into two pools (even/odd ids standing in "
    "for two languages), generate candidate pairs DISTRIBUTED via a "
    "trained-IVF overfetch (k=8 Lloyd's centroids, each vector probes its "
    "top-2 buckets; a pair is a candidate when either side's ASSIGNED "
    "bucket is among the other's probes — a shuffle equi-join on bucket "
    "id, never all-pairs and never a driver collect), then score "
    "margin(a,c) = cos(a,c) / mean(top-4 cos of a, top-4 cos of c) over "
    "the candidate set and keep each anchor's best candidate — the "
    "normalization suppresses hub vectors that score high against "
    "everything. Scores live in exact integer micro-units so the top-4 "
    "sums are order-independent (8·si/(Σa+Σc) is one division of exact "
    "ints — bit-identical cross-engine); both top-4 windows are "
    "WindowGroupLimit-pruned; the oracle replays centroid training as "
    "chained CTEs exactly like ann_ivf_trained",
)
def q_margin_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators.fast_vector import pairwise_cosine_fast
    from fastembed_rs_spark.operators.topk import train_ivf_centroids

    emb = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # constant-size driver state: k=8 trained centroids (the former shape —
    # collecting the whole odd pool into the task closure — grew linearly
    # with the corpus: the textbook driver-OOM at 100x)
    targets = [
        (r[0], list(r[1]))
        for r in train_ivf_centroids(emb, k=8, iters=3).collect()
    ]
    probes = (
        pairwise_cosine_fast(
            emb, "vec_id", "embedding", targets,
            target_id_name="centroid_id", score_name="__p",
        )
        .select("vec_id", "centroid_id", F.round("__p", 6).alias("__ps"))
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(
                    F.desc("__ps"), F.asc("centroid_id")
                )
            ),
        )
        .filter(F.col("rnk") <= 2)
        .join(emb, "vec_id")
    )
    pa = probes.filter(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("aid"), F.col("embedding").alias("__ea"),
        "centroid_id", F.col("rnk").alias("__ra"),
    )
    pc = probes.filter(F.col("vec_id") % 2 == 1).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("__ec"),
        "centroid_id", F.col("rnk").alias("__rc"),
    )
    # candidate pair when a probes c's assigned bucket OR c probes a's
    # assigned bucket (assignment = probe rank 1) — the symmetric IVF
    # overfetch; equi-join on centroid_id keeps the shuffle bucket-local.
    # Pair scoring runs through the row-pair NumPy kernel (bit-identical
    # fold order): the interpreted HOF cosine cost 376s on the sf1
    # fixture's 50M-row candidate table, the kernel seconds
    from fastembed_rs_spark.operators.fast_vector import rowpair_cosine_fast

    pairs = pa.join(pc.filter(F.col("__rc") == 1), "centroid_id").unionByName(
        pa.filter(F.col("__ra") == 1).join(pc, "centroid_id")
    )
    scored = rowpair_cosine_fast(
        pairs, "__ea", "__ec", keep=["aid", "cid"], score_name="__raw"
    ).select(
        "aid",
        "cid",
        F.round(F.col("__raw") * 1000000).cast("long").alias("si"),
    )
    # dedup pairs found in both directions (si is bit-identical either way,
    # so max == the value); the scored table feeds THREE consumers (both
    # top-4 windows and the margin join) so it is materialized once,
    # repartitioned by anchor for window parallelism. persist(), NOT
    # localCheckpoint: checkpoint blocks are lineage-free — one eviction
    # under memory pressure is fatal (observed on a 100M-row pair table at
    # the sf1 proof: block-manager FileNotFound). persist keeps lineage so
    # a dropped block just recomputes its partition.
    p = (
        scored.groupBy("aid", "cid")
        .agg(F.max("si").alias("si"))
        .repartition(32, "aid")
        .persist()
    )
    wa = Window.partitionBy("aid").orderBy(F.desc("si"), F.asc("cid"))
    wc = Window.partitionBy("cid").orderBy(F.desc("si"), F.asc("aid"))
    ka = (
        p.withColumn("rn", F.row_number().over(wa))
        .filter(F.col("rn") <= 4)
        .groupBy("aid")
        .agg(F.sum("si").cast("long").alias("suma"))
    )
    kc = (
        p.withColumn("rn", F.row_number().over(wc))
        .filter(F.col("rn") <= 4)
        .groupBy("cid")
        .agg(F.sum("si").cast("long").alias("sumc"))
    )
    den = F.col("suma") + F.col("sumc")
    m = (
        p.join(F.broadcast(ka), "aid")
        .join(F.broadcast(kc), "cid")
        .select(
            "aid",
            "cid",
            "si",
            F.round(
                F.when(den <= 0, F.lit(0.0)).otherwise(
                    F.lit(8.0) * F.col("si").cast("double") / den.cast("double")
                ),
                6,
            ).alias("margin"),
        )
    )
    wm = Window.partitionBy("aid").orderBy(F.desc("margin"), F.asc("cid"))
    return (
        m.withColumn("__r", F.row_number().over(wm))
        .filter(F.col("__r") == 1)
        .select(
            F.col("aid").alias("anchor_id"),
            F.col("cid").alias("candidate_id"),
            F.round(F.col("si").cast("double") / 1000000, 6).alias("score"),
            "margin",
        )
    )


def _kcore_oracle(k: int, rounds: int) -> str:
    parts = []
    prev = "sym"
    for r in range(1, rounds + 1):
        parts.append(f"""k{r} AS (
  SELECT src AS node FROM {prev} GROUP BY src HAVING count(*) >= {k}
),
s{r} AS (
  SELECT s.src, s.dst FROM {prev} s
  JOIN k{r} x ON s.src = x.node JOIN k{r} y ON s.dst = y.node
)""")
        prev = f"s{r}"
    return (
        "WITH " + _GRAPH_EDGE2_CTES + ",\n" + ",\n".join(parts)
        + f"""
SELECT src AS node, CAST(count(*) AS BIGINT) AS core_deg
FROM {prev} GROUP BY src HAVING count(*) >= {k}"""
    )


@q(
    "graph_kcore",
    _kcore_oracle(k=2, rounds=4),
    "2-core of the supported co-purchase graph via 4 bounded peel rounds "
    "(drop degree<2 nodes, recompute on the induced subgraph): the "
    "density-pruning pass that strips evidence-thin tendrils off a "
    "candidate-pair graph before clustering — a chain of pairwise matches "
    "is one bad edge from wrong, a 2-core region is mutually "
    "corroborated. Peeling is idempotent at the fixpoint so the fixed "
    "bound (needed for oracle unrolling) just no-ops after convergence; "
    "per round two left-semi joins against the shrinking survivor set + "
    "one count agg, edge list monotonically shrinking "
    "(operators/graph.py::kcore)",
)
def q_graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.operators import graph as G

    edges = G.copurchase_edges(t(spark, sf_dir, "lineitem"), min_support=2)
    return G.kcore(edges, k=2, rounds=4).select("node", "core_deg")


@q(
    "psi_drift",
    """
WITH b AS (
  SELECT lang, least(n_chars // 200, 9) AS bucket FROM documents
),
langs AS (SELECT DISTINCT lang FROM b WHERE lang <> 'en'),
grid AS (
  SELECT langs.lang, g.bucket
  FROM langs CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS bucket) g
),
rc AS (SELECT bucket, CAST(count(*) AS BIGINT) AS rcnt
       FROM b WHERE lang = 'en' GROUP BY bucket),
rt AS (SELECT CAST(count(*) AS BIGINT) AS rtot FROM b WHERE lang = 'en'),
cc AS (SELECT lang, bucket, CAST(count(*) AS BIGINT) AS ccnt
       FROM b WHERE lang <> 'en' GROUP BY lang, bucket),
ct AS (SELECT lang, CAST(count(*) AS BIGINT) AS ctot
       FROM b WHERE lang <> 'en' GROUP BY lang),
j AS (
  SELECT grid.lang, grid.bucket,
         CAST(coalesce(rc.rcnt, 0) + 1 AS DOUBLE)
           / CAST(rt.rtot + 10 AS DOUBLE) AS p,
         CAST(coalesce(cc.ccnt, 0) + 1 AS DOUBLE)
           / CAST(ct.ctot + 10 AS DOUBLE) AS q
  FROM grid
  LEFT JOIN rc ON grid.bucket = rc.bucket
  LEFT JOIN cc ON grid.lang = cc.lang AND grid.bucket = cc.bucket
  JOIN ct ON grid.lang = ct.lang
  CROSS JOIN rt
),
terms AS (
  SELECT lang, bucket, p, q,
         CAST(round((p - q) * ln(p / q) * 1000000000) AS BIGINT) AS nano
  FROM j
)
SELECT lang, bucket, round(p, 6) AS p_ref, round(q, 6) AS q_cmp,
       CAST(sum(nano) OVER (PARTITION BY lang) AS BIGINT) AS psi_nano
FROM terms
""",
    "population stability index (PSI) — the production drift metric — of "
    "the document-length distribution per language vs the 'en' reference: "
    "10 fixed 200-char buckets, Laplace-smoothed shares, per-bucket "
    "contribution (p−q)·ln(p/q), and the per-language PSI total "
    "(>0.2 = retrain/alert in the standard reading). Per-bucket terms "
    "are converted to exact integer NANO-units before the per-language "
    "sum, so the only cross-engine float ops are two divisions and one "
    "ln on identical inputs — the total is never an order-dependent "
    "float sum. One scan builds the histogram; everything after runs on "
    "a (langs × 10)-row table of broadcast joins",
)
def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    b = docs.select(
        "lang", F.least(F.expr("n_chars div 200"), F.lit(9)).alias("bucket")
    )
    # ONE corpus scan per side: the reference/candidate bucket histograms
    # are checkpointed (bounded: ≤ 10·|langs| rows) and every other input
    # (totals, the lang list) is derived FROM them — rtot = Σ rcnt,
    # ctot = Σ ccnt per lang, and every lang in b has ≥ 1 row so the
    # distinct-lang set of cc equals b's. The old shape re-scanned the
    # corpus five times (one per aggregate).
    rc = (
        b.filter(F.col("lang") == "en")
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("rcnt"))
        .localCheckpoint()
    )
    cc = (
        b.filter(F.col("lang") != "en")
        .groupBy("lang", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("ccnt"))
        .localCheckpoint()
    )
    langs = cc.select("lang").distinct()
    grid = langs.crossJoin(
        F.broadcast(
            b.sparkSession.range(10).select(F.col("id").cast("int").alias("bucket"))
        )
    )
    # coalesce: the old count() gave 0 on an empty reference side where
    # sum() would give NULL
    rt = rc.agg(
        F.coalesce(F.sum("rcnt"), F.lit(0)).cast("long").alias("rtot")
    )
    ct = cc.groupBy("lang").agg(F.sum("ccnt").cast("long").alias("ctot"))
    p = (F.coalesce(F.col("rcnt"), F.lit(0)) + 1).cast("double") / (
        F.col("rtot") + 10
    ).cast("double")
    q_ = (F.coalesce(F.col("ccnt"), F.lit(0)) + 1).cast("double") / (
        F.col("ctot") + 10
    ).cast("double")
    j = (
        grid.join(F.broadcast(rc), "bucket", "left")
        .join(F.broadcast(cc), ["lang", "bucket"], "left")
        .join(F.broadcast(ct), "lang")
        .crossJoin(F.broadcast(rt))
        .select("lang", "bucket", p.alias("p"), q_.alias("q"))
    )
    terms = j.select(
        "lang",
        "bucket",
        "p",
        "q",
        F.round((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q")) * 1000000000)
        .cast("long")
        .alias("nano"),
    )
    wl = Window.partitionBy("lang")
    return terms.select(
        "lang",
        "bucket",
        F.round("p", 6).alias("p_ref"),
        F.round("q", 6).alias("q_cmp"),
        F.sum("nano").over(wl).cast("long").alias("psi_nano"),
    )


@q(
    "robust_value_outliers",
    """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY event_type
),
mad AS (
  SELECT e.event_type, med.med,
         quantile_cont(abs(e.value - med.med), 0.5) AS mad,
         CAST(count(*) AS BIGINT) AS n
  FROM events e JOIN med ON e.event_type = med.event_type
  GROUP BY e.event_type, med.med
)
SELECT m.event_type, round(m.med, 6) AS med, round(m.mad, 6) AS mad, m.n,
       CAST(count(*) FILTER (WHERE m.mad > 0.0
              AND abs(0.6745 * (e.value - m.med) / m.mad) > 3.5) AS BIGINT)
         AS n_outliers
FROM events e JOIN mad m ON e.event_type = m.event_type
GROUP BY m.event_type, m.med, m.mad, m.n
""",
    "robust outlier detection per event type: median + MAD (median "
    "absolute deviation) and the count of |modified z| = "
    "|0.6745(x−med)/MAD| > 3.5 rows (Iglewicz-Hoaglin) — the monitoring "
    "pass that, unlike mean/stddev z-scores, is not dragged by the very "
    "outliers it hunts (one fat-finger event inflates σ and masks "
    "itself; the median pair is 50%-breakdown robust). Two exact "
    "ordered-set aggregate passes (same percentile↔quantile_cont recipe "
    "as value_percentiles) with the tiny per-type medians broadcast back "
    "between them; the flag comparison runs on deterministic floats so "
    "the counts hash-match",
)
def q_robust_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type", "med")
        .agg(
            F.expr("percentile(abs(value - med), 0.5)").alias("mad"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )
    flag = (
        F.col("mad") > 0.0
    ) & (F.abs(F.lit(0.6745) * (F.col("value") - F.col("med")) / F.col("mad")) > 3.5)
    return (
        ev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "med", "mad", "n")
        .agg(F.sum(F.when(flag, 1).otherwise(0)).cast("long").alias("n_outliers"))
        .select(
            "event_type",
            F.round("med", 6).alias("med"),
            F.round("mad", 6).alias("mad"),
            "n",
            "n_outliers",
        )
    )


@q(
    "event_transitions",
    """
WITH s AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY epoch_ns(ts), event_id) AS prev
  FROM events
),
c AS (
  SELECT prev, event_type AS next, CAST(count(*) AS BIGINT) AS cnt
  FROM s WHERE prev IS NOT NULL GROUP BY prev, event_type
),
rowtot AS (SELECT prev, CAST(sum(cnt) AS BIGINT) AS tot FROM c GROUP BY prev)
SELECT c.prev, c.next, c.cnt,
       round(CAST(c.cnt AS DOUBLE) / CAST(r.tot AS BIGINT), 6) AS prob,
       CAST(row_number() OVER (PARTITION BY c.prev
                               ORDER BY c.cnt DESC, c.next ASC) AS BIGINT)
         AS rnk
FROM c JOIN rowtot r ON c.prev = r.prev
""",
    "first-order Markov transition matrix over per-user event sequences: "
    "P(next | prev) with counts, row-normalized probabilities and a "
    "per-state rank — the model behind next-action prediction, funnel "
    "drop-off analysis and session synthesis. One user-partitioned lag "
    "window (the same single shuffle sessionize/scd2 use), then all "
    "aggregation happens on the states×states table (tiny however large "
    "the event log); probabilities are one division of exact counts",
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "user_id", "event_type", F.lag("event_type").over(w).alias("prev")
    ).filter(F.col("prev").isNotNull())
    c = s.groupBy(F.col("prev"), F.col("event_type").alias("next")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    rowtot = c.groupBy("prev").agg(F.sum("cnt").cast("long").alias("tot"))
    wr = Window.partitionBy("prev").orderBy(F.desc("cnt"), F.asc("next"))
    return (
        c.join(F.broadcast(rowtot), "prev")
        .select(
            "prev",
            "next",
            "cnt",
            F.round(F.col("cnt").cast("double") / F.col("tot").cast("double"), 6)
            .alias("prob"),
            F.row_number().over(wr).cast("long").alias("rnk"),
        )
    )


_KMV_MIX_MOD = 4_294_967_296  # 2^32 domain after the Fibonacci mix
_KMV_K = 256


def _kmv_key_hashes_sql(table: str, key: str) -> str:
    th = duck_token_hash(f"CAST({key} AS VARCHAR)")
    return (
        f"SELECT DISTINCT (({th} * 2654435761) % {_KMV_MIX_MOD}) AS h "
        f"FROM {table}"
    )


@q(
    "join_size_estimate",
    f"""
WITH ha AS ({_kmv_key_hashes_sql('orders', 'o_custkey')}),
hb AS ({_kmv_key_hashes_sql('customer', 'c_custkey')}),
topu AS (
  SELECT h FROM (SELECT h FROM ha UNION SELECT h FROM hb)
  ORDER BY h LIMIT {_KMV_K}
),
flags AS (
  SELECT t.h,
         CASE WHEN a.h IS NOT NULL THEN 1 ELSE 0 END AS ina,
         CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END AS inb
  FROM topu t LEFT JOIN ha a ON t.h = a.h LEFT JOIN hb b ON t.h = b.h
),
est AS (
  SELECT CAST(count(*) AS BIGINT) AS kk,
         CAST(max(h) AS BIGINT) AS hk,
         CAST(sum(ina * inb) AS BIGINT) AS n_both
  FROM flags
),
act AS (
  SELECT CAST(count(*) AS BIGINT) AS actual_overlap FROM (
    SELECT DISTINCT o_custkey FROM orders
    INTERSECT SELECT DISTINCT c_custkey FROM customer
  )
)
SELECT est.kk, est.n_both,
       round(CASE WHEN est.kk < {_KMV_K} THEN CAST(est.kk AS DOUBLE)
             ELSE ({_KMV_K} - 1) * CAST({_KMV_MIX_MOD} AS DOUBLE)
                  / CAST(est.hk AS DOUBLE) END, 4) AS est_union,
       round(CAST(est.n_both AS DOUBLE) / CAST(est.kk AS DOUBLE), 6)
         AS est_jaccard,
       round((CAST(est.n_both AS DOUBLE) / CAST(est.kk AS DOUBLE))
             * (CASE WHEN est.kk < {_KMV_K} THEN CAST(est.kk AS DOUBLE)
                ELSE ({_KMV_K} - 1) * CAST({_KMV_MIX_MOD} AS DOUBLE)
                     / CAST(est.hk AS DOUBLE) END), 4) AS est_overlap,
       act.actual_overlap
FROM est CROSS JOIN act
""",
    "KMV join-cardinality estimator — the cost-based-optimizer primitive: "
    "estimate the distinct-key overlap of orders.o_custkey vs "
    "customer.c_custkey from two 256-value KMV sketches (Beyer et al. "
    "2007: K-th smallest hash of the union estimates the union size, the "
    "fraction of the union sketch present in BOTH sketches estimates "
    "Jaccard; overlap = jaccard × union), side-by-side with the exact "
    "overlap for the accuracy audit. Each sketch is a 256-row "
    "distinct-hash TakeOrdered over a mixed uniform hash (the "
    "hash_sample Fibonacci mix — raw rolling hashes of short numeric "
    "keys are run-correlated); everything after the two sketch scans "
    "runs on ≤512 rows. This is how a 100 TB engine prices a join "
    "WITHOUT scanning either side's full key set",
)
def q_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.functions.text import token_hash

    def key_hashes(df: DataFrame, key: str) -> DataFrame:
        h = token_hash(F.col(key).cast("string"))
        return df.select(
            ((h * 2654435761) % _KMV_MIX_MOD).alias("h")
        ).distinct()

    ha = key_hashes(t(spark, sf_dir, "orders"), "o_custkey")
    hb = key_hashes(t(spark, sf_dir, "customer"), "c_custkey")
    topu = (
        ha.unionAll(hb).distinct().orderBy("h").limit(_KMV_K)
    )
    flags = (
        topu.join(ha.withColumn("ina", F.lit(1)), "h", "left")
        .join(hb.withColumn("inb", F.lit(1)), "h", "left")
        .select(
            "h",
            F.coalesce("ina", F.lit(0)).alias("ina"),
            F.coalesce("inb", F.lit(0)).alias("inb"),
        )
    )
    est = flags.agg(
        F.count(F.lit(1)).cast("long").alias("kk"),
        F.max("h").cast("long").alias("hk"),
        F.sum(F.col("ina") * F.col("inb")).cast("long").alias("n_both"),
    )
    actual = (
        t(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("k"))
        .distinct()
        .join(
            t(spark, sf_dir, "customer")
            .select(F.col("c_custkey").alias("k"))
            .distinct(),
            "k",
            "left_semi",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("actual_overlap"))
    )
    union_est = F.when(
        F.col("kk") < _KMV_K, F.col("kk").cast("double")
    ).otherwise(
        (_KMV_K - 1) * F.lit(float(_KMV_MIX_MOD)) / F.col("hk").cast("double")
    )
    jacc = F.col("n_both").cast("double") / F.col("kk").cast("double")
    return est.crossJoin(F.broadcast(actual)).select(
        "kk",
        "n_both",
        F.round(union_est, 4).alias("est_union"),
        F.round(jacc, 6).alias("est_jaccard"),
        F.round(jacc * union_est, 4).alias("est_overlap"),
        "actual_overlap",
    )


_SPLIT_CASE_SQL = duck_split_80_10_10("CAST(doc_id AS VARCHAR) || '#split'")


@q(
    "split_leakage_report",
    f"""
WITH {_GRAMS_CTE},
p AS (
  SELECT * FROM (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(CASE WHEN (len(a.grams) = 0 AND len(b.grams) = 0) THEN 0.0 ELSE
             CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
             / (CAST(len(a.grams) AS DOUBLE) + CAST(len(b.grams) AS DOUBLE)
                - CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)) END, 6)
             AS jaccard
    FROM g a JOIN g b ON a.doc_id < b.doc_id
  ) WHERE jaccard >= 0.5
),
s AS (SELECT doc_id, {_SPLIT_CASE_SQL} AS split FROM documents)
SELECT least(sa.split, sb.split) AS split_a,
       greatest(sa.split, sb.split) AS split_b,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(CASE WHEN sa.split <> sb.split THEN 1 ELSE 0 END) AS BIGINT)
         AS n_leaking
FROM p JOIN s sa ON p.id_a = sa.doc_id JOIN s sb ON p.id_b = sb.doc_id
GROUP BY least(sa.split, sb.split), greatest(sa.split, sb.split)
""",
    "train/val/test LEAKAGE AUDIT at the NEAR-DUP level: every jaccard "
    "≥ 0.5 near-duplicate pair, grouped by the (deterministic 80/10/10 "
    "stratified_split) splits its two sides landed in — a cross-split "
    "pair means an eval document has a training-set near-duplicate, the "
    "contamination that silently inflates benchmark numbers (exact-dup "
    "leakage alone misses paraphrase/boilerplate near-dups, which is why "
    "the audit runs on the near-dup pair generator, not fingerprints). "
    "Pairs come from the same adaptive bucketed generator as "
    "jaccard_adaptive_neardup (never all-pairs); split labels are pure "
    "hash codegen joined onto the pair table by id; output is one row "
    "per split pair with total and cross-split ('leaking') counts",
)
def q_split_leakage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastembed_rs_spark.functions.text import token_hash
    from fastembed_rs_spark.operators.dedup import jaccard_pairs_adaptive

    docs = t(spark, sf_dir, "documents")
    pairs = jaccard_pairs_adaptive(docs, "doc_id", "text", n=3, threshold=0.5)
    hh = token_hash(F.concat(F.col("doc_id").cast("string"), F.lit("#split")))
    s = docs.select("doc_id").withColumn("__sg_h", hh).select(
        "doc_id", split_80_10_10("__sg_h").alias("split")
    )
    sa = s.select(F.col("doc_id").alias("id_a"), F.col("split").alias("__sa"))
    sb = s.select(F.col("doc_id").alias("id_b"), F.col("split").alias("__sb"))
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .groupBy(
            F.least("__sa", "__sb").alias("split_a"),
            F.greatest("__sa", "__sb").alias("split_b"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(F.when(F.col("__sa") != F.col("__sb"), 1).otherwise(0))
            .cast("long")
            .alias("n_leaking"),
        )
    )


