"""Gates for product quantization (operators/pq.py): code shape and
determinism, ADC shortlist quality, exact-rerank recall, and the
plan shapes the 100 TB story depends on (no corpus shuffle, no
Python in the search path).

Params (m=16, ksub=64) are tuned for this corpus's near-random
embeddings (top-10 neighbor cosines 0.21-0.37 — the worst regime for
any quantizer); real corpora cluster tighter and do better.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from faiss_vector_search_spark import io as fio
from faiss_vector_search_spark.operators import knn, pq

M, KSUB = 16, 64


@pytest.fixture(scope="module")
def emb(spark, sf_medium):
    return fio.load_table(spark, sf_medium, "embeddings").cache()


@pytest.fixture(scope="module")
def books(emb):
    return pq.pq_train(emb, m=M, ksub=KSUB, iters=4)


@pytest.fixture(scope="module")
def codes(emb, books):
    return pq.pq_encode(emb, books).cache()


def _query(emb, vid):
    return emb.where(F.col("vec_id") == vid).select(
        F.col("embedding").alias("query_vec")
    )


def test_codebook_shape(books):
    rows = books.collect()
    assert len(rows) == M * KSUB
    assert {r.j for r in rows} == set(range(M))
    assert all(len(r.cvec) == 64 // M for r in rows)


def test_codes_shape_and_range(emb, codes):
    assert codes.count() == emb.count()
    bad = codes.where(
        (F.size("codes") != M)
        | F.exists("codes", lambda c: (c < 0) | (c >= KSUB))
    ).count()
    assert bad == 0


def test_encode_deterministic(emb, books, codes):
    again = pq.pq_encode(emb, books)
    assert codes.exceptAll(again).count() == 0


def test_train_rejects_indivisible_dim(emb):
    with pytest.raises(ValueError, match="not divisible"):
        pq.pq_train(emb, m=7)


@pytest.mark.parametrize("vid", [0, 7, 42])
def test_adc_shortlist_overlaps_exact(emb, books, codes, vid):
    q = _query(emb, vid)
    exact = {r.vec_id for r in knn.topk(emb, q, k=10, metric="ip").collect()}
    adc = {r.vec_id for r in pq.pq_topk_adc(codes, books, q, k=10).collect()}
    assert len(adc & exact) / 10 >= 0.4, (vid, adc & exact)


@pytest.mark.parametrize("vid", [0, 7, 42])
def test_rerank_recovers_exact_topk(emb, books, codes, vid):
    q = _query(emb, vid)
    exact = {r.vec_id for r in knn.topk(emb, q, k=10, metric="ip").collect()}
    got = {
        r.vec_id
        for r in pq.pq_topk_rerank(
            emb, codes, books, q, k=10, expand=3
        ).collect()
    }
    assert len(got & exact) / 10 >= 0.9, (vid, got & exact)


def test_adc_search_plan_no_corpus_shuffle(emb, books, codes):
    q = _query(emb, 0)
    plan_buf = pq.pq_topk_adc(codes, books, q, k=10)._jdf.queryExecution()
    plan = plan_buf.executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    # the only exchange allowed is the m×ksub codebook-model agg (on
    # "j"); the codes corpus itself must never shuffle
    assert "Exchange hashpartitioning(vec_id" not in plan
    assert "Exchange hashpartitioning(codes" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_encode_plan_is_map_only(emb, books):
    df = pq.pq_encode(emb, books)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning(vec_id" not in plan
    assert "Exchange hashpartitioning(embedding" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
