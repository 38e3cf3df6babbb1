"""Round-8 ADVICE regression gates: weighted-kNN weight clamping,
retrieval-metrics judgment dedup, and duplicate-tag validation in the
multi-query engines."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


class TestWeightedClassifyNegativeScores:
    def _frame(self, spark, rows):
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>, label int"
        )

    def test_negative_similarity_contributes_zero_weight(self, spark):
        from faiss_vector_search_spark.operators import knn

        # neighbor 1: positive sim, label 9. neighbor 2: NEGATIVE sim
        # (anti-correlated), label 3 — without the clamp its weight
        # would be negative and confidence would exceed 1.
        emb = self._frame(spark, [
            (0, [1.0, 0.0], 0),
            (1, [0.5, 0.0], 9),
            (2, [-0.8, 0.0], 3),
        ])
        q = emb.where(F.col("vec_id") == 0).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        (w,) = knn.knn_classify(emb, q, k=2, weighted=True).collect()
        assert w["pred_label"] == 9
        assert w["weight"] == pytest.approx(0.5)
        assert w["confidence"] == pytest.approx(1.0)  # 0.5 / (0.5 + 0)

    def test_all_negative_neighborhood_yields_null_confidence(self, spark):
        from faiss_vector_search_spark.operators import knn

        emb = self._frame(spark, [
            (0, [1.0, 0.0], 0),
            (1, [-0.5, 0.0], 9),
            (2, [-0.8, 0.0], 3),
        ])
        q = emb.where(F.col("vec_id") == 0).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        (w,) = knn.knn_classify(emb, q, k=2, weighted=True).collect()
        # total weight 0: ties break to the smaller label, weight is
        # 0, and confidence is NULL (no signal), never 0/0 or >1
        assert w["pred_label"] == 3
        assert w["weight"] == 0.0
        assert w["confidence"] is None


class TestRetrievalMetricsJudgmentDedup:
    def test_duplicate_truth_rows_do_not_inflate_recall(self, spark):
        from faiss_vector_search_spark.operators import evaluate

        results = spark.createDataFrame(
            [("q1", 10, 1), ("q1", 11, 2)],
            "query_tag string, doc_id long, rank int",
        )
        truth = spark.createDataFrame(
            # doc 10 judged twice — the fan-out would double n_hits
            [("q1", 10), ("q1", 10), ("q1", 12)],
            "query_tag string, doc_id long",
        )
        rows = {r["query_tag"]: r for r in evaluate
                .retrieval_metrics_by_query(results, truth, k=10).collect()}
        q = rows["q1"]
        assert q["n_relevant"] == 2          # {10, 12}, not 3
        assert q["n_hits"] == 1              # doc 10 once, not twice
        assert q["recall_at_k"] == pytest.approx(0.5)
        assert q["recall_at_k"] <= 1.0

    def test_single_query_metrics_dedupe_too(self, spark):
        from faiss_vector_search_spark.operators import evaluate

        results = spark.createDataFrame(
            [(10, 1), (11, 2)], "doc_id long, rank int")
        truth = spark.createDataFrame(
            [(10,), (10,), (12,)], "doc_id long")
        (m,) = evaluate.retrieval_metrics(results, truth, k=10).collect()
        assert m["n_relevant"] == 2 and m["n_hits"] == 1
        assert m["recall_at_k"] == 0.5


class TestMultiQueryDuplicateTags:
    def test_text_search_multi_rejects_duplicate_tags(self, spark, sf_small):
        from faiss_vector_search_spark import io as fio
        from faiss_vector_search_spark.operators import embed

        docs = fio.load_table(spark, sf_small, "documents")
        with pytest.raises(ValueError, match="duplicate query tags"):
            embed.text_search_multi(
                docs, [("t", "alpha beta"), ("t", "gamma delta")]
            )

    def test_bm25_search_multi_rejects_duplicate_tags(self, spark, sf_small):
        from faiss_vector_search_spark import io as fio
        from faiss_vector_search_spark.operators import lexical

        docs = fio.load_table(spark, sf_small, "documents")
        with pytest.raises(ValueError, match="duplicate query tags"):
            lexical.bm25_search_multi(
                docs, [("t", "alpha beta"), ("t", "gamma delta")]
            )
