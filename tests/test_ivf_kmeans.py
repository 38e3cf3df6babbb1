"""Property gates for the k-means-trained IVF quantizer (SURVEY.md
§2a #7) — approximate, so gated on recall and on the Lloyd objective
rather than a SQL oracle.

The test corpus is near-random (top-10 neighbors at cos 0.21-0.37),
the worst case for any clustering index; real embedding corpora
cluster far more tightly and reach the same recall at much lower
nprobe/nlist ratios."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from faiss_vector_search_spark import io as fio
from faiss_vector_search_spark.functions import vector as V
from faiss_vector_search_spark.operators import ivf, knn

NLIST = 16


@pytest.fixture(scope="module")
def emb(spark, sf_small):
    return fio.load_table(spark, sf_small, "embeddings").cache()


@pytest.fixture(scope="module")
def trained(emb):
    c = ivf.kmeans_centroids(emb, NLIST, iters=5).cache()
    c.count()
    return c


def _objective(emb, cents) -> float:
    """Mean squared distance to the assigned centroid (Lloyd loss)."""
    assigned = ivf.assign_lists(emb, cents)
    joined = assigned.join(
        F.broadcast(cents), assigned["list_id"] == cents["cid"]
    )
    return joined.agg(
        F.avg(V.l2_sq(F.col("embedding"), F.col("cvec"))).alias("o")
    ).first().o


def test_kmeans_improves_quantizer(spark, emb, trained):
    seeded = ivf.seeded_centroids(emb, NLIST)
    assert _objective(emb, trained) < _objective(emb, seeded)


def test_kmeans_centroid_shape(spark, trained):
    rows = trained.collect()
    assert len(rows) == NLIST
    assert all(len(r.cvec) == 64 for r in rows)
    assert sorted(r.cid for r in rows) == list(range(NLIST))


def test_ivf_kmeans_recall_at_10(spark, emb, trained):
    recalls = []
    for qid in (0, 7, 42, 99, 250):
        q = emb.where(F.col("vec_id") == qid).select(
            F.col("embedding").alias("query_vec")
        )
        exact = {r.vec_id for r in knn.topk(emb, q, k=10, metric="ip").collect()}
        approx = {
            r.vec_id
            for r in ivf.ivf_search(
                emb, q, NLIST, nprobe=12, k=10, centroids=trained
            ).collect()
        }
        recalls.append(len(exact & approx) / len(exact))
    assert sum(recalls) / len(recalls) >= 0.85, recalls


def test_assign_arrow_matches_sql_fold(spark, emb, trained):
    """The arrow (BLAS argmin) assignment engine must produce the
    same list map as the oracle-deterministic sql fold on the test
    corpus — same contract as semdedup's pair-engine equality gate."""
    sql_rows = {
        r.vec_id: r.list_id
        for r in ivf.assign_lists(emb, trained, engine="sql")
        .select("vec_id", "list_id").collect()
    }
    arrow_rows = {
        r.vec_id: r.list_id
        for r in ivf.assign_lists(emb, trained, engine="arrow")
        .select("vec_id", "list_id").collect()
    }
    assert sql_rows == arrow_rows


def test_assign_unknown_engine_raises(spark, emb, trained):
    with pytest.raises(ValueError, match="unknown assign engine"):
        ivf.assign_lists(emb, trained, engine="bogus")


def test_kmeans_arrow_engine_matches_sql(spark, emb):
    """Arrow-assignment Lloyd must land on the same centroids as the
    sql fold (assignment equality holds per iteration, and the mean
    aggregation is shared)."""
    a = ivf.kmeans_centroids(emb, NLIST, iters=2)
    b = ivf.kmeans_centroids(emb, NLIST, iters=2, engine="arrow")
    ra = {r.cid: r.cvec for r in a.collect()}
    rb = {r.cid: r.cvec for r in b.collect()}
    assert ra.keys() == rb.keys()
    worst = max(abs(x - y) for k in ra for x, y in zip(ra[k], rb[k]))
    assert worst < 1e-9, worst


def test_kmeans_train_sample_full_equals_unsampled(spark, emb):
    n = emb.count()
    a = ivf.kmeans_centroids(emb, NLIST, iters=2)
    b = ivf.kmeans_centroids(emb, NLIST, iters=2, train_sample=n)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_kmeans_sampled_centroids_still_improve_quantizer(spark, emb):
    """A half-corpus training sample must still beat the seeded
    quantizer on the FULL corpus — the property that justifies
    bounded-sample training at scale."""
    n = emb.count()
    sampled = ivf.kmeans_centroids(
        emb, NLIST, iters=3, train_sample=n // 2, engine="arrow"
    )
    seeded = ivf.seeded_centroids(emb, NLIST)
    assert _objective(emb, sampled) < _objective(emb, seeded)


def test_kmeans_mllib_engine_contract_and_quality(spark, emb, trained):
    """engine="mllib" (the BASELINE-named stock trainer) returns the
    same (cid, cvec) contract and a quantizer at least as good as the
    seeded centroids it competes with."""
    from faiss_vector_search_spark.operators import ivf

    ml = ivf.kmeans_centroids(emb, nlist=NLIST, iters=5, engine="mllib")
    assert ml.columns == ["cid", "cvec"]
    assert ml.count() <= NLIST  # mllib may drop empty clusters
    assert len(ml.first().cvec) == 64
    seeded = ivf.seeded_centroids(emb, NLIST)

    def objective(cents):
        assigned = ivf.assign_lists(emb, cents)
        joined = assigned.join(
            cents.withColumnRenamed("cid", "list_id"), "list_id"
        )
        return joined.select(
            F.aggregate(
                F.zip_with(
                    "embedding", "cvec",
                    lambda a, b: (a.cast("double") - b) ** 2,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("d2")
        ).agg(F.sum("d2")).first()[0]

    assert objective(ml) <= objective(seeded) * 1.001
