"""The two-phase batch top-k must be row-identical to the windowed
single-phase operator (same ranking, same tie-breaks)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from faiss_vector_search_spark import io as fio
from faiss_vector_search_spark.operators import knn


@pytest.mark.parametrize("metric", ["ip", "l2"])
def test_two_phase_equals_single_phase(spark, sf_small, metric):
    emb = fio.load_table(spark, sf_small, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    one = knn.topk_join(emb, queries, k=7, metric=metric)
    two = knn.topk_join_two_phase(emb, queries, k=7, metric=metric)
    a = sorted((r.query_id, r.vec_id, r.rank, round(r.score, 6)) for r in one.collect())
    b = sorted((r.query_id, r.vec_id, r.rank, round(r.score, 6)) for r in two.collect())
    assert a == b


def test_two_phase_no_corpus_shuffle_before_local_topk(spark, sf_small):
    emb = fio.load_table(spark, sf_small, "embeddings")
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    plan = knn.topk_join_two_phase(emb, queries, k=5)._jdf.queryExecution(
    ).executedPlan().toString()
    # exactly one exchange: the k×P survivors into the ranking window
    assert plan.count("Exchange hashpartitioning") <= 1
