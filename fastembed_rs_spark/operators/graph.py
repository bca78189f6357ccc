"""Distributed graph analytics over DataFrame edge lists.

Beyond-reference operators for the curation side of a training-data
pipeline: near-dup candidate pairs, co-purchase/co-occurrence pairs and
link graphs all arrive as (a, b) edge DataFrames, and the questions asked
of them — "which nodes are central?" (PageRank), "how clustered is the
neighborhood?" (triangle counts) — need iterative / multi-join plans that
stay shuffle-bounded at 100 TB.

Cross-engine determinism: PageRank here is **integer fixed-point** — ranks
live in integer mass units (default 1e12 total), every step is integer
multiply + floor division + integer sum. Floating-point PageRank is NOT
reproducible across engines (per-node in-edge sums are order-dependent and
5 iterations amplify last-ulp drift); fixed-point arithmetic gives
bit-identical ranks on Spark and DuckDB with no rounding policy at all,
and is the same trick production graph engines use to make incremental
PageRank runs comparable. The floor loss per edge is < 1 unit = 1e-12 of
total mass per hop — far below any ranking-relevant difference.

`connected_components` (operators/components.py) covers the third classic;
this module deliberately shares its edge-list conventions (BIGINT node
ids, canonical a < b undirected pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: total PageRank mass in fixed-point units; 1e12 keeps 85 * rank well
#: inside int64 (8.5e13) while giving ~12 significant digits of rank.
PR_SCALE = 1_000_000_000_000


def copurchase_edges(
    lineitem: DataFrame,
    order_col: str = "l_orderkey",
    item_col: str = "l_partkey",
    min_support: int = 1,
) -> DataFrame:
    """Undirected co-occurrence pairs (a < b) of items that appear together
    in at least ``min_support`` orders/baskets/documents.

    Plan shape: project → distinct (one shuffle on (order, item)) →
    self-equi-join on the order key (both sides already hash-partitioned on
    it, so AQE reuses one exchange) → pair count-agg with the support
    filter pushed into HAVING (partial-agg'd — the singleton tail dies
    map-side). The join fan-out per order is C(items_per_order, 2) —
    bounded for basket-like data (TPC-H caps at 7 lineitems); for heavy
    containers (a "basket" with 1e5 items) cap or sample items per
    container BEFORE the self-join, as minhash-banding does for
    boilerplate grams. ``min_support > 1`` is the standard noise cut
    before graph analytics on basket data: a single chance co-occurrence
    carries no signal, and on uniformly-random baskets the unfiltered
    graph densifies toward complete (avg degree ~90 on TPC-H sf0.1 parts)
    while the supported graph stays sparse.
    """
    li = lineitem.select(
        F.col(order_col).alias("__o"), F.col(item_col).alias("__i")
    ).distinct()
    a = li.select(F.col("__o"), F.col("__i").alias("a"))
    b = li.select(F.col("__o"), F.col("__i").alias("b"))
    pairs = a.join(b, "__o").filter(F.col("a") < F.col("b"))
    if min_support <= 1:
        return pairs.select("a", "b").distinct()
    return (
        pairs.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("__sup"))
        .filter(F.col("__sup") >= min_support)
        .select("a", "b")
    )


def _symmetric(edges: DataFrame) -> DataFrame:
    return edges.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
        edges.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )


def pagerank_fixedpoint(
    edges: DataFrame,
    iters: int = 5,
    damping_pct: int = 85,
    scale: int = PR_SCALE,
) -> DataFrame:
    """PageRank over an undirected edge list (a < b), integer fixed-point.

    rank_0(v)   = scale // N
    rank_k+1(v) = (100-d)*scale // (100*N)
                  + Σ_{u→v} (d * rank_k(u)) // (100 * outdeg(u))

    with d = damping_pct. All arithmetic is int64 (`div` floor division on
    positives), so the result is bit-identical across engines and runs —
    see the module docstring for why fixed-point instead of doubles.

    Plan shape per iteration: ranks ⋈ edges on src (one hash shuffle; at
    scale persist `sym` bucketed by src so only ranks move) → groupBy dst
    integer sum (map-side partial combine) → join outdeg back. Lineage is
    localCheckpoint-truncated every 2 iterations like
    components.connected_components, so 20-iteration runs don't build a
    40-join plan. N (node count) is one scalar count at plan time — the
    same bounded driver probe the adaptive-jaccard planner uses.

    Dangling nodes: an undirected graph has outdeg ≥ 1 for every node that
    appears in an edge; isolated items never enter the edge list and are
    excluded (their rank is the uniform base — uninformative).
    """
    # materialize the symmetric edge list ONCE, hash-partitioned on the
    # join key: every iteration joins it, and without this the whole
    # upstream edge derivation (e.g. the basket self-join) would
    # re-execute per iteration (measured 5x the runtime at sf0.1).
    # repartition+persist (not localCheckpoint — that erases partitioning
    # metadata) keeps the src hash-partitioning visible to Catalyst, so
    # each iteration's join shuffles ONLY the node-sized ranks table while
    # the edge list never moves again — measured another 2x at sf0.1, and
    # the property that makes iteration cost ~|ranks| not ~|edges| on a
    # real cluster.
    # match spark.sql.shuffle.partitions so the ranks side's shuffle output
    # partitioning lines up with sym's and neither gets re-exchanged
    n_part = int(
        edges.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    sym = _symmetric(edges).repartition(n_part, "src").persist()
    deg = sym.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("outdeg")
    ).persist()
    n_nodes = deg.count()  # plan-time scalar; deg is tiny vs the edge list
    if n_nodes == 0:
        return deg.select("node", F.lit(0).cast("long").alias("rank_units"))
    base = ((100 - damping_pct) * scale) // (100 * n_nodes)
    ranks = deg.select(
        "node", "outdeg", F.lit(scale // n_nodes).cast("long").alias("rank_units")
    )
    for i in range(iters):
        contrib = (
            sym.join(ranks, sym["src"] == ranks["node"])
            .select(
                F.col("dst").alias("node"),
                F.expr(
                    f"(CAST({damping_pct} AS BIGINT) * rank_units) "
                    "div (CAST(100 AS BIGINT) * outdeg)"
                ).alias("__share"),
            )
            .groupBy("node")
            .agg(F.sum("__share").cast("long").alias("__in"))
        )
        ranks = (
            deg.join(contrib, "node", "left")
            .select(
                "node",
                "outdeg",
                (
                    F.lit(base).cast("long")
                    + F.coalesce(F.col("__in"), F.lit(0).cast("long"))
                ).alias("rank_units"),
            )
        )
        if i % 2 == 1:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select("node", "rank_units")


def oriented_edges(edges: DataFrame) -> DataFrame:
    """Orient each undirected edge from the lower-(degree, id) endpoint to
    the higher one. This is the classic triangle-counting preparation: the
    out-degree of every node in the oriented graph is O(sqrt(|E|)), so the
    wedge join below never explodes on a hub node (a celebrity item with
    1e6 co-purchases contributes wedges only through its LOW-degree
    neighbors). Deterministic: ties on degree break on node id."""
    deg = _symmetric(edges).groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("__da"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("__db"))
    e = edges.join(da, "a").join(db, "b")
    lower_first = (F.col("__da") < F.col("__db")) | (
        (F.col("__da") == F.col("__db")) & (F.col("a") < F.col("b"))
    )
    return e.select(
        F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
        F.when(lower_first, F.col("__db")).otherwise(F.col("__da")).alias("__dd"),
    )


def triangles(edges: DataFrame) -> DataFrame:
    """Enumerate each triangle exactly once as (x, y, z).

    Degree-ordered algorithm: orient edges low→high by (degree, id), build
    wedges (v, w) from each node's out-neighbor pairs ordered by the SAME
    total order, and close them against the oriented edge set. Each
    triangle has exactly one lowest-(degree,id) apex, so it is emitted
    once — no post-hoc dedup. Two equi-joins (src, then the closing
    (v, w) pair); the degree orientation is what bounds the wedge count at
    skewed 100 TB graphs (Σ outdeg² with outdeg = O(sqrt|E|)).

    The oriented edge list feeds THREE plan branches (both wedge sides and
    the closing join), so it is materialized once via localCheckpoint —
    without it Spark re-derives the edges (and their upstream basket
    self-join) per branch, measured 3x the runtime at sf0.1. The INPUT
    edge list is checkpointed first for the same reason: oriented_edges
    consumes it twice (degree aggregation + orientation join), so the
    upstream derivation would otherwise run twice even inside the single
    materialization of `o`."""
    o = oriented_edges(edges.localCheckpoint()).localCheckpoint()
    e1 = o.select(F.col("src").alias("u"), F.col("dst").alias("v"), F.col("__dd").alias("__dv"))
    e2 = o.select(F.col("src").alias("u"), F.col("dst").alias("w"), F.col("__dd").alias("__dw"))
    wedge_order = (F.col("__dv") < F.col("__dw")) | (
        (F.col("__dv") == F.col("__dw")) & (F.col("v") < F.col("w"))
    )
    wedges = e1.join(e2, "u").filter(wedge_order).select("u", "v", "w")
    closing = o.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    return wedges.join(closing, ["v", "w"]).select(
        F.col("u").alias("x"), F.col("v").alias("y"), F.col("w").alias("z")
    )


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle participation counts (nodes in ≥1 triangle).

    Explode each triangle to its 3 corners, integer-count per node — the
    local clustering signal used to spot near-dup cliques vs chance
    collisions in a candidate-pair graph."""
    tri = triangles(edges)
    corners = (
        tri.select(F.col("x").alias("node"))
        .unionAll(tri.select(F.col("y").alias("node")))
        .unionAll(tri.select(F.col("z").alias("node")))
    )
    return corners.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )


def propagate_labels(
    edges: DataFrame, seeds: DataFrame, rounds: int = 2
) -> DataFrame:
    """Fill-only majority label propagation: seeds (node, label BIGINT) keep
    their label forever; each round, every still-unlabeled node adjacent to
    labeled ones takes the majority label of its labeled neighbors (ties →
    lowest label). The semi-supervised trick for spreading sparse quality /
    language / domain labels across a near-dup or similarity graph.

    Fill-only (vs relabel-everything LPA) is monotone — the labeled set only
    grows — so `rounds` bounds both work and the oscillation classic LPA
    needs async tricks to avoid. Per round: one edge⋈labeled equi-join,
    one (node, label) count aggregation (map-side combined), one
    max(struct(cnt, -label)) argmax — no sorts, no windows; the labeled
    frontier is localCheckpoint-truncated so lineage stays flat.

    The symmetric edge table is EAGERLY checkpointed: every round joins
    it, and without the checkpoint the upstream edge derivation (e.g. the
    embedding near-dup kernel) re-executes once per round."""
    sym = _symmetric(edges).localCheckpoint()
    labeled = seeds.select(
        "node",
        F.col("label").cast("long").alias("label"),
        F.lit(0).cast("long").alias("round_labeled"),
    )
    for k in range(1, rounds + 1):
        votes = (
            sym.join(labeled.select(F.col("node").alias("src"), "label"), "src")
            .select(F.col("dst").alias("node"), "label")
            .join(labeled.select("node"), "node", "left_anti")
            .groupBy("node", "label")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        )
        newly = (
            votes.groupBy("node")
            .agg(
                F.max(
                    F.struct(
                        F.col("cnt").alias("cnt"),
                        (-F.col("label")).alias("__nl"),
                        F.col("label").alias("label"),
                    )
                ).alias("__b")
            )
            .select(
                "node",
                F.col("__b.label").alias("label"),
                F.lit(k).cast("long").alias("round_labeled"),
            )
        )
        labeled = labeled.unionAll(newly).localCheckpoint(eager=False)
    return labeled


def kcore(edges: DataFrame, k: int = 2, rounds: int = 4) -> DataFrame:
    """Bounded-peel k-core: nodes surviving ``rounds`` iterations of
    "drop every node with degree < k, recompute degrees on the induced
    subgraph". Returns (node, core_deg) — the density-pruning pass that
    strips tendrils off candidate-pair graphs before clustering (a chain
    of pairwise matches is evidence-thin; a 2-core region is mutually
    corroborated).

    Peeling is idempotent at the fixpoint, so extra rounds past
    convergence are cheap no-ops on the already-shrunken graph; the fixed
    bound keeps the plan finite and lets the DuckDB oracle unroll the
    exact same rounds (convergence on sparse supported graphs is
    typically 2-3 rounds). Per round: one semi-join of the edge list
    against the surviving node set per endpoint + one count agg — the
    edge list shrinks monotonically, and the surviving node set is the
    small side (broadcastable at any corpus scale where the core is a
    fraction of the graph)."""
    sym = _symmetric(edges).localCheckpoint()
    for _ in range(rounds):
        keep = (
            sym.groupBy(F.col("src").alias("node"))
            .agg(F.count(F.lit(1)).cast("long").alias("deg"))
            .filter(F.col("deg") >= k)
        )
        sym = (
            sym.join(keep.select(F.col("node").alias("src")), "src", "left_semi")
            .join(keep.select(F.col("node").alias("dst")), "dst", "left_semi")
            .localCheckpoint()
        )
    return (
        sym.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).cast("long").alias("core_deg"))
        .filter(F.col("core_deg") >= k)
    )
