"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` pairs implement SURVEY.md §2; the
driver hash-compares each Spark result with its DuckDB oracle at
sf=0.01. Float outputs are emitted as DECIMAL(18,6) in BOTH engines so
value hashes are fixed-point-deterministic.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from faiss_vector_search_spark import io as fio
from faiss_vector_search_spark.operators import knn

DEC = "decimal(18,6)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return fio.load_table(spark, sf_dir, name)


def _query_vec(emb: DataFrame, vec_id: int = 0) -> DataFrame:
    return emb.where(F.col("vec_id") == vec_id).select(
        F.col("embedding").alias("query_vec")
    )


# --- §2a reference parity -------------------------------------------------


def q_knn_topk_ip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flat-IP top-10 (ref index_service.py:84-87, 205-235)."""
    emb = _t(spark, sf_dir, "embeddings")
    out = knn.topk(emb, _query_vec(emb), k=10, metric="ip")
    return out.select("vec_id", F.col("score").cast(DEC).alias("score"))


def q_knn_topk_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flat-L2 top-10, score = 1/(1+d) (ref search_service.py:336-349)."""
    emb = _t(spark, sf_dir, "embeddings")
    out = knn.topk(emb, _query_vec(emb, vec_id=7), k=10, metric="l2")
    return out.select("vec_id", F.col("score").cast(DEC).alias("score"))


def q_knn_fixed_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed similarity threshold (ref search_service.py:300-302)."""
    emb = _t(spark, sf_dir, "embeddings")
    out = knn.topk(emb, _query_vec(emb, vec_id=3), k=50, metric="ip", threshold=0.2)
    return out.select("vec_id", F.col("score").cast(DEC).alias("score"))


def q_knn_dynamic_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-threshold search (ref search_service.py:41-184)."""
    emb = _t(spark, sf_dir, "embeddings")
    out = knn.dynamic_threshold_search(
        emb, _query_vec(emb, vec_id=5), k=20, hit_target=3, step=0.05
    )
    return out.select(
        "vec_id",
        F.col("score").cast(DEC).alias("score"),
        F.col("final_threshold").cast(DEC).alias("final_threshold"),
    )


def q_knn_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch retrieval: top-3 per query for queries vec_id < 5."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = knn.topk_join(emb, queries, k=3, metric="ip")
    return out.select(
        "query_id", "vec_id", F.col("score").cast(DEC).alias("score"), "rank"
    )


# --- oracle SQL -----------------------------------------------------------

_IP = "ROUND(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv), 6)"
_L2SQ = (
    "list_sum(list_transform(generate_series(1, len(e.embedding)), "
    "i -> (CAST(e.embedding[i] AS DOUBLE) - q.qv[i]) * "
    "(CAST(e.embedding[i] AS DOUBLE) - q.qv[i])))"
)


def _oracle_topk_ip(query_id: int, k: int, where: str = "") -> str:
    return f"""
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = {query_id}),
scored AS (
  SELECT e.vec_id, {_IP} AS score FROM embeddings e, q
)
SELECT vec_id, CAST(score AS DECIMAL(18,6)) AS score
FROM scored {where}
ORDER BY score DESC, vec_id ASC
LIMIT {k}
"""


ORACLES: dict[str, str] = {
    "knn_topk_ip": _oracle_topk_ip(0, 10),
    "knn_topk_l2": f"""
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 7),
scored AS (
  SELECT e.vec_id, ROUND(1.0 / (1.0 + {_L2SQ}), 6) AS score FROM embeddings e, q
)
SELECT vec_id, CAST(score AS DECIMAL(18,6)) AS score
FROM scored ORDER BY score DESC, vec_id ASC LIMIT 10
""",
    "knn_fixed_threshold": _oracle_topk_ip(3, 50, where="WHERE score >= 0.2"),
    "knn_dynamic_threshold": """
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 5),
cand AS (
  SELECT e.vec_id, ROUND(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv), 6) AS score
  FROM embeddings e, q
  ORDER BY score DESC, vec_id ASC LIMIT 20
),
grid AS (SELECT unnest(generate_series(0, 20)) / 20.0 AS t),
hits AS (SELECT t, count(*) AS hits FROM cand, grid WHERE cand.score >= grid.t GROUP BY t),
final AS (
  SELECT coalesce(
    (SELECT max(t) FROM hits WHERE hits >= 3),
    (SELECT t FROM hits ORDER BY hits DESC, t DESC LIMIT 1)
  ) AS final_t
)
SELECT c.vec_id, CAST(c.score AS DECIMAL(18,6)) AS score,
       CAST(ROUND(f.final_t, 6) AS DECIMAL(18,6)) AS final_threshold
FROM cand c, final f
WHERE c.score >= f.final_t
ORDER BY c.score DESC, c.vec_id ASC
""",
    "knn_batch": """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < 5
),
scored AS (
  SELECT q.query_id, e.vec_id,
         ROUND(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv), 6) AS score
  FROM embeddings e, q
),
ranked AS (
  SELECT query_id, vec_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, CAST(score AS DECIMAL(18,6)) AS score, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 3
""",
}


# --- driver contract ------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: Flat-IP top-10 on sf0.001."""
    return q_knn_topk_ip(spark, fio.DEFAULT_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "knn_topk_ip": q_knn_topk_ip,
        "knn_topk_l2": q_knn_topk_l2,
        "knn_fixed_threshold": q_knn_fixed_threshold,
        "knn_dynamic_threshold": q_knn_dynamic_threshold,
        "knn_batch": q_knn_batch,
    }


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
