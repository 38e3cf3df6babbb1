"""OPQ rotation gates (transform.opq_train / opq_apply — parametric
OPQ, Ge et al. CVPR 2013 §4): orthonormality, metric preservation,
eigenvalue-allocation balance, and the actual point of it all — ADC
recall on an anisotropic corpus where position-split PQ is blind."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from faiss_vector_search_spark.operators import pq, transform

D, M = 32, 8


@pytest.fixture(scope="module")
def aniso(spark):
    """Deterministic anisotropic corpus: per-coordinate variance decays
    steeply, then a fixed orthogonal mix spreads the energy across
    positions so neither the identity NOR any axis permutation can
    balance the subspaces — rotation has to earn its keep."""
    rng = np.random.RandomState(7)
    scales = 1.0 / (1.0 + np.arange(D)) ** 1.5
    x = rng.randn(1500, D) * scales
    q_mix, _ = np.linalg.qr(rng.randn(D, D))
    x = x @ q_mix.T
    df = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(x)],
        "vec_id long, embedding array<double>",
    )
    return df, x


def test_rotation_is_orthonormal(spark, aniso):
    df, _ = aniso
    model = transform.opq_train(df, m=M)
    r = model.rotation
    assert r.shape == (D, D)
    assert np.allclose(r @ r.T, np.eye(D), atol=1e-8)


def test_rotation_preserves_inner_products(spark, aniso):
    df, x = aniso
    model = transform.opq_train(df, m=M)
    y = x @ model.rotation.T
    assert np.allclose(x @ x[:5].T, y @ y[:5].T, atol=1e-8)


def test_opq_apply_matches_numpy(spark, aniso):
    """The Arrow kernel must equal a driver-side matmul regardless of
    batching/partitioning."""
    df, x = aniso
    model = transform.opq_train(df, m=M)
    got = {
        r.vec_id: np.asarray(r.embedding)
        for r in transform.opq_apply(df.repartition(7), model).collect()
    }
    want = x @ model.rotation.T
    for i in range(len(x)):
        assert np.allclose(got[i], want[i], atol=1e-9)


def test_eigenvalue_allocation_balances_subspaces(spark, aniso):
    """The greedy allocator must leave the per-subspace variance
    PRODUCTS (log-product spread — the quantity it minimizes) far more
    balanced than the unpermuted eigen-order split it replaces: on a
    steeply-decaying spectrum, consecutive eigen-order packs the top
    dims into one subquantizer."""
    df, x = aniso
    model = transform.opq_train(df, m=M)

    def log_spread(mat):
        v = mat.var(axis=0)
        logs = np.log(np.maximum(v, 1e-15))
        per = logs.reshape(M, D // M).sum(axis=1)
        return per.max() - per.min()

    pca = transform.pca_train(df, k=D)
    eigen_order = x @ pca.components  # (n, D) in descending-eigenvalue order
    allocated = x @ model.rotation.T
    # a steep spectrum bounds achievable balance from below (some
    # bucket must hold the top eigenvalue), so gate on an absolute
    # log-spread drop: >= 3 nats = the allocator's bucket products
    # are >= 20x closer than consecutive eigen-order packing
    assert log_spread(allocated) <= log_spread(eigen_order) - 3.0


def test_opq_beats_plain_pq_recall(spark, aniso):
    """ADC shortlist recall@10 with OPQ-rotated codes >= plain PQ on
    the anisotropic corpus, and strictly better summed over queries —
    the measured claim behind shipping the operator."""
    df, x = aniso
    model = transform.opq_train(df, m=M)
    rotated = transform.opq_apply(df, model)

    books_plain = pq.pq_train(df, m=M, ksub=16, iters=4)
    books_rot = pq.pq_train(rotated, m=M, ksub=16, iters=4)
    codes_plain = pq.pq_encode(df, books_plain)
    codes_rot = pq.pq_encode(rotated, books_rot)

    sums = {"plain": 0, "opq": 0}
    for qid in (0, 11, 222):
        truth = set(
            np.argsort(-(x @ x[qid]))[:10].tolist()
        )
        qdf = spark.createDataFrame(
            [(x[qid].tolist(),)], "query_vec array<double>"
        )
        got_plain = {
            r.vec_id
            for r in pq.pq_topk_adc(codes_plain, books_plain, qdf, k=10).collect()
        }
        rq = transform.opq_rotate_query(qdf, model)
        got_rot = {
            r.vec_id
            for r in pq.pq_topk_adc(codes_rot, books_rot, rq, k=10).collect()
        }
        sums["plain"] += len(truth & got_plain)
        sums["opq"] += len(truth & got_rot)
    assert sums["opq"] >= sums["plain"]
    assert sums["opq"] > sums["plain"] * 1.0 or sums["opq"] == 30


def test_opq_rerank_recovers_exact_topk(spark, aniso):
    """Shortlist in the rotated basis + exact re-rank on originals ==
    flat exact top-k (the property the oracle gate relies on)."""
    df, x = aniso
    model = transform.opq_train(df, m=M)
    rotated = transform.opq_apply(df, model)
    books = pq.pq_train(rotated, m=M, ksub=16, iters=4)
    codes = pq.pq_encode(rotated, books)
    qdf = spark.createDataFrame([(x[3].tolist(),)], "query_vec array<double>")
    got = [
        r.vec_id
        for r in pq.opq_topk_rerank(
            df, codes, books, qdf, model, k=10, expand=10
        ).collect()
    ]
    scores = x @ x[3]
    want = sorted(range(len(x)), key=lambda i: (-round(scores[i], 6), i))[:10]
    assert got == want
