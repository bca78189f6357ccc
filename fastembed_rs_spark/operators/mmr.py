"""Maximal Marginal Relevance (MMR) diversification — re-rank a bounded
candidate list so results stay relevant but not redundant (Carbonell &
Goldstein, SIGIR'98). The training-data-pipeline use: picking a diverse
exemplar subset out of near-duplicate-heavy retrieval results.

Beyond-reference operator (the reference stops at raw ``top_k``,
src/similarity.rs:31-40). Greedy objective per step:

    argmax_c  lambda * relevance(c) - (1 - lambda) * max_{s in S} cos(c, s)

Scale shape: MMR is inherently sequential in k but only ever touches each
query's CANDIDATE list (k' rows from an upstream top-k', already bounded —
the same bound that makes rescoring affordable). The operator is one
``applyInPandas`` keyed by query: the corpus is never touched, the shuffle
carries |queries| * k' rows, and each group is an O(k'^2 * d) NumPy tile.

Cross-engine determinism: pairwise cosines fold dimensions sequentially
from a zero accumulator (the same left-fold as the column expressions and
the DuckDB oracle's list_sum — bit-identical doubles, see
dedup.embedding_near_dups_blocked), relevance arrives pre-rounded, the
objective is exact double arithmetic on those, and ties break on the
lowest id. The oracle replays the greedy loop as chained CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mmr_rerank(
    candidates: DataFrame,
    k: int,
    lam: float = 0.7,
    query_id: str = "query_id",
    id_col: str = "vec_id",
    rel_col: str = "relevance",
    vec_col: str = "vec",
    round_to: int = 6,
) -> DataFrame:
    """Greedy MMR over per-query candidate lists.

    ``candidates``: (query_id, id_col, rel_col double, vec_col array) —
    the output of a top-k' stage joined back to its vectors. Returns
    (query_id, id_col, rel_col, objective double, mmr_rank long) with at
    most ``k`` rows per query; step 1's objective is ``lam * relevance``
    (empty selected set contributes 0 redundancy).
    """
    import numpy as np
    import pandas as pd

    q_t = candidates.schema[query_id].dataType.simpleString()
    id_t = candidates.schema[id_col].dataType.simpleString()
    out_schema = (
        f"{query_id} {q_t}, {id_col} {id_t}, {rel_col} double, "
        "objective double, mmr_rank long"
    )
    one_minus = 1.0 - lam

    def run_group(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        ids = pdf[id_col].to_numpy()
        rel = pdf[rel_col].to_numpy(dtype=np.float64)
        V = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
        d = V.shape[1] if n else 0
        # sequential fold over dims from zero accumulators == list_sum order
        sq = np.zeros(n)
        for i in range(d):
            sq += V[:, i] * V[:, i]
        norms = np.sqrt(sq)
        dots = np.zeros((n, n))
        for i in range(d):
            dots += np.outer(V[:, i], V[:, i])
        denom = np.outer(norms, norms)
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = np.where(denom == 0.0, 0.0, dots / denom)
        selected: list[int] = []
        out_rows = []
        remaining = list(range(n))
        for step in range(1, min(k, n) + 1):
            best, best_key = None, None
            for idx in remaining:
                maxsim = max((cos[idx, s] for s in selected), default=0.0)
                obj = lam * rel[idx] - one_minus * maxsim
                key = (-obj, ids[idx])
                if best_key is None or key < best_key:
                    best, best_key = idx, key
            selected.append(best)
            remaining.remove(best)
            out_rows.append((
                pdf[query_id].iloc[0], ids[best], rel[best],
                -best_key[0], step,
            ))
        return pd.DataFrame(
            out_rows,
            columns=[query_id, id_col, rel_col, "objective", "mmr_rank"],
        )

    out = candidates.groupBy(query_id).applyInPandas(run_group, schema=out_schema)
    return out.withColumn("objective", F.round("objective", round_to))
