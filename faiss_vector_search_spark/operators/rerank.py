"""Post-retrieval re-ranking — the diversity step a RAG serving stack
(like the reference's retrieve→prompt pipeline, components/core/
search_service.py) runs between vector search and context assembly.

MMR (maximal marginal relevance) greedily picks the candidate that
maximizes ``λ·relevance − (1−λ)·max_sim_to_already_picked`` — high
score, low redundancy.

Design for scale
----------------
MMR is inherently sequential *within* one query's shortlist, but a
shortlist is k·fanout rows (tens), so the right distribution is
per-query-group: ``applyInPandas`` over query_id runs every query's
greedy loop in parallel across the cluster, each group one small
Arrow batch. The corpus-scale work (producing the shortlist) stays in
the declarative two-phase top-k; this operator only ever touches
shortlists. Deterministic: float64 arithmetic on rounded scores,
ties broken by ascending vec_id.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame


def mmr_rerank(
    candidates: DataFrame,
    k: int = 10,
    lambda_: float = 0.7,
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
    score_col: str = "score",
    vec_col: str = "embedding",
) -> DataFrame:
    """Select ``k`` diverse results per query from a scored shortlist.

    ``candidates`` must carry (query_id, vec_id, score, embedding).
    Output: (query_id, vec_id, mmr_rank 1..k, score) — score is the
    original relevance, rank is the MMR pick order. The id columns keep
    whatever types ``candidates`` carries (string doc ids work: the
    output schema is derived from the input schema and the tie-break
    compares ids with their native ordering)."""
    import pandas as pd

    def pick(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([score_col, id_col], ascending=[False, True])
        ids = pdf[id_col].to_numpy()
        scores = pdf[score_col].to_numpy(dtype=np.float64)
        x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        nrm = np.linalg.norm(x, axis=1)
        nrm[nrm == 0] = 1.0
        u = x / nrm[:, None]
        sims = u @ u.T  # shortlist × shortlist, tens of rows
        n = len(ids)
        picked: list[int] = []
        remaining = list(range(n))
        while remaining and len(picked) < k:
            best, best_val = None, None
            for i in remaining:
                red = max((sims[i, j] for j in picked), default=0.0)
                val = lambda_ * scores[i] - (1.0 - lambda_) * red
                # tie-break: higher val, then lower id (type-agnostic:
                # native ordering of whatever the id column holds)
                if (
                    best is None
                    or val > best_val
                    or (val == best_val and ids[i] < ids[best])
                ):
                    best, best_val = i, val
            picked.append(best)
            remaining.remove(best)
        return pd.DataFrame(
            {
                query_id_col: pdf[query_id_col].iloc[:1].repeat(len(picked)).to_numpy(),
                id_col: ids[picked],
                "mmr_rank": np.arange(1, len(picked) + 1),
                score_col: scores[picked],
            }
        )

    in_schema = candidates.schema
    qt = in_schema[query_id_col].dataType.simpleString()
    it = in_schema[id_col].dataType.simpleString()
    schema = (
        f"{query_id_col} {qt}, {id_col} {it}, "
        f"mmr_rank int, {score_col} double"
    )
    return candidates.groupBy(query_id_col).applyInPandas(pick, schema=schema)
