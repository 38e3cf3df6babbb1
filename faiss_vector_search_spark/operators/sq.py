"""Scalar quantization — FAISS ``IndexScalarQuantizer`` (SQ8) as
DataFrame ops: per-dimension [min, max] bounds train in one pass,
vectors encode to uint8 codes (4× smaller than float32 at rest), and
search decodes midpoint reconstructions on the fly.

Reference parity: the reference's index family (``components/core/
index_service.py:82-101``: FlatIP / FlatL2 / IVFFlat) sits in the same
FAISS lineage; SQ8 is the standard next compression rung below PQ —
per-dim affine quantization instead of per-subspace codebooks. Unlike
PQ (k-means codebooks → rows-only pytest gate), SQ8 is fully
deterministic arithmetic, so the whole train→encode→search path is
oracle-gated cross-engine.

Scale posture (100 TB):
- training reduces to 2·dim doubles per partition (map-side partial
  min/max before the shuffle) — the shuffle carries P×dim rows, never
  vectors;
- bounds are a dim-row model table; they broadcast as ONE row of two
  arrays onto the encode/search scans (same shape as PQ codebooks);
- encode is map-only; search is scan + TakeOrderedAndProject — the
  corpus never shuffles.

Determinism: floor-quantization, not round (Spark HALF_UP vs DuckDB
half-even would diverge); every float expression keeps the same
association order as the oracle SQL so IEEE results are bit-equal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import vector as V

SCORE_DECIMALS = 6


def sq_train(corpus: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-dimension bounds: (pos, vmin, vmax), one row per dim.
    posexplode → groupBy(pos) min/max; partial aggregation collapses
    each partition to 2·dim values before the exchange."""
    return (
        corpus.select(F.posexplode(F.col(vec_col)).alias("pos", "x"))
        .groupBy("pos")
        .agg(
            F.min(F.col("x").cast("double")).alias("vmin"),
            F.max(F.col("x").cast("double")).alias("vmax"),
        )
    )


def _bounds_row(bounds: DataFrame):
    """Collapse the dim-row bounds table to ONE broadcastable row of
    pos-ordered (mn_arr, mx_arr)."""
    return F.broadcast(
        bounds.agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "vmin"))),
                lambda s: s["vmin"],
            ).alias("mn_arr"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "vmax"))),
                lambda s: s["vmax"],
            ).alias("mx_arr"),
        )
    )


def _code_expr(x, mn, mx):
    width = mx - mn
    return (
        F.when(width > 0.0, F.least(F.lit(255), F.floor((x - mn) * 256.0 / width)))
        .otherwise(F.lit(0))
        .cast("int")
    )


def sq_encode(
    corpus: DataFrame,
    bounds: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """corpus → (id, codes array<int> in [0,255]): per-dim affine
    floor-quantization against the broadcast bounds. Map-only."""
    return corpus.crossJoin(_bounds_row(bounds)).select(
        F.col(id_col),
        F.transform(
            F.sequence(F.lit(0), F.size(F.col(vec_col)) - 1),
            lambda i: _code_expr(
                F.get(F.col(vec_col), i).cast("double"),
                F.get(F.col("mn_arr"), i),
                F.get(F.col("mx_arr"), i),
            ),
        ).alias("codes"),
    )


def sq_decode_expr(codes, mn_arr, mx_arr):
    """Midpoint reconstruction x̂_d = mn + (c + 0.5)·(mx − mn)/256 —
    the same association order as the oracle SQL."""
    return F.transform(
        F.sequence(F.lit(0), F.size(codes) - 1),
        lambda i: F.get(mn_arr, i)
        + (F.get(codes, i).cast("double") + 0.5)
        * (F.get(mx_arr, i) - F.get(mn_arr, i))
        / 256.0,
    )


def sq_topk(
    codes: DataFrame,
    bounds: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Approximate top-k inner product over SQ8 codes: decode the
    midpoint reconstruction in-row, dot with the broadcast query,
    rank. Compiles to scan + TakeOrderedAndProject — the 4×-smaller
    codes are all that is read, and nothing shuffles."""
    scored = codes.crossJoin(_bounds_row(bounds)).crossJoin(
        F.broadcast(query)
    ).select(
        F.col(id_col),
        F.round(
            V.dot(
                sq_decode_expr(
                    F.col("codes"), F.col("mn_arr"), F.col("mx_arr")
                ),
                F.col(query_vec_col),
            ),
            SCORE_DECIMALS,
        ).alias("score"),
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)
