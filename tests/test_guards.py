"""Runtime guardrails: the O(n²) oracle-baseline operators must refuse
large inputs unless explicitly overridden, degenerate chunking params
must fail fast, and unconverged cluster propagation must warn — the
"can't accidentally point it at a real corpus" contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from faiss_vector_search_spark.operators import chunking, dedup


def _big_docs(spark, n):
    return spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit("some text tokens here").alias("text")
    )


def test_ngram_jaccard_refuses_large_input(spark):
    docs = _big_docs(spark, dedup.QUADRATIC_ROW_LIMIT + 1)
    with pytest.raises(ValueError, match="O\\(n²\\).*allow_quadratic"):
        dedup.ngram_jaccard_pairs(docs)


def test_embedding_cosine_refuses_large_input(spark):
    emb = spark.range(dedup.QUADRATIC_ROW_LIMIT + 1).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.0)).alias("embedding"),
    )
    with pytest.raises(ValueError, match="O\\(n²\\).*allow_quadratic"):
        dedup.embedding_cosine_pairs(emb)


def test_allow_quadratic_override_builds_plan(spark):
    docs = _big_docs(spark, dedup.QUADRATIC_ROW_LIMIT + 1)
    # Explicit opt-in skips the guard; only the plan is built (lazy).
    df = dedup.ngram_jaccard_pairs(docs, allow_quadratic=True)
    assert set(df.columns) == {"doc_a", "doc_b", "jaccard"}


def test_small_input_passes_guard(spark):
    docs = _big_docs(spark, 5)
    assert dedup.ngram_jaccard_pairs(docs).count() >= 0


@pytest.mark.parametrize(
    "size,overlap", [(200, 200), (200, 250), (0, 0), (-5, 0), (10, -1)]
)
def test_chunk_fixed_rejects_degenerate_params(spark, sf_small, size, overlap):
    docs = spark.createDataFrame([(1, "abcdef")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunking.chunk_fixed(docs, size=size, overlap=overlap)


def test_chunk_fixed_zero_overlap_ok(spark):
    docs = spark.createDataFrame([(1, "abcdef")], "doc_id long, text string")
    rows = chunking.chunk_fixed(docs, size=3, overlap=0).collect()
    assert [r.chunk for r in sorted(rows, key=lambda r: r.start)] == ["abc", "def"]


def test_dedup_clusters_warns_when_unconverged(spark):
    # A path graph of 12 nodes needs ~11 rounds for the min label to
    # reach the far end; max_iter=3 must exit loudly, not silently.
    n = 12
    docs = spark.range(n).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    with pytest.warns(RuntimeWarning, match="did not converge"):
        out = dedup.dedup_clusters(docs, pairs, max_iter=3)
        out.collect()


def test_dedup_clusters_no_warning_when_converged(spark, recwarn):
    docs = spark.range(4).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame([(0, 1), (2, 3)], "doc_a long, doc_b long")
    out = {r.doc_id: r.cluster_id for r in dedup.dedup_clusters(docs, pairs).collect()}
    assert out == {0: 0, 1: 0, 2: 2, 3: 2}
    assert not [w for w in recwarn.list if issubclass(w.category, RuntimeWarning)]


# --- r5 advisor-fix regression guards ---------------------------------


def _emb8(spark, n):
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.col("id") * (i + 1)).cast("double") for i in range(8)]).alias(
            "embedding"
        ),
    )


def test_train_sample_is_a_hard_bound(spark):
    """Ceiling-division stride: n=150, train_sample=100 used to sample
    every row (stride 1 via floor); the bound must actually hold."""
    from faiss_vector_search_spark.operators import ivf, pq

    emb = _emb8(spark, 150)
    n = 150
    for ts in (100, 149, 151):
        stride = max(1, -(-n // ts))
        sampled = emb.where(F.col("vec_id") % stride == 0).count()
        assert sampled <= ts, (ts, sampled)
    # end-to-end: kmeans_centroids with train_sample=100 on 150 rows
    # must still produce nlist centroids from <=100 training rows
    cents = ivf.kmeans_centroids(emb, nlist=4, iters=1, train_sample=100)
    assert cents.count() == 4


def test_pq_arrow_train_sample_smaller_than_ksub_raises(spark):
    from faiss_vector_search_spark.operators import pq

    emb = _emb8(spark, 40)
    with pytest.raises(ValueError, match="ksub"):
        pq.pq_train(
            emb, m=2, ksub=16, iters=1, train_sample=8, engine="arrow"
        )


@pytest.mark.parametrize("engine", ["sql", "arrow"])
def test_sq_topk_rejects_multi_row_query(spark, engine):
    from faiss_vector_search_spark.operators import sq

    emb = _emb8(spark, 32)
    bounds = sq.sq_train(emb, vec_col="embedding")
    codes = sq.sq_encode(emb, bounds, id_col="vec_id", vec_col="embedding")
    query2 = emb.limit(2).select(F.col("embedding").alias("query_vec"))
    with pytest.raises(ValueError, match="exactly one query row"):
        sq.sq_topk(codes, bounds, query2, k=5, engine=engine)


def test_semdedup_bad_pair_engine_message(spark):
    emb = _emb8(spark, 8)
    with pytest.raises(ValueError, match="unknown pair_engine"):
        dedup.semdedup(emb, nlist=2, pair_engine="bogus")
