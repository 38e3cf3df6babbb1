"""Property gates for the hyperplane-LSH ANN path (SURVEY.md §2b #23):
recall vs the brute-force oracle, exact precision of the verify step.
These are the rows-only checks standing in for a SQL oracle — the
operator is approximate by design."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from faiss_vector_search_spark import io as fio
from faiss_vector_search_spark.operators import dedup, knn, lsh


@pytest.fixture(scope="module")
def emb(spark, sf_small):
    return fio.load_table(spark, sf_small, "embeddings").cache()


def _query(emb, vec_id):
    return emb.where(F.col("vec_id") == vec_id).select(
        F.col("embedding").alias("query_vec")
    )


def test_ann_lsh_recall_at_10(spark, emb):
    """Mean recall@10 over several queries ≥ 0.9 vs brute force."""
    recalls = []
    for qid in (0, 7, 42, 99, 250):
        q = _query(emb, qid)
        exact = {r.vec_id for r in knn.topk(emb, q, k=10, metric="ip").collect()}
        approx = {
            r.vec_id
            for r in lsh.ann_lsh_search(emb, q, k=10, dim=64).collect()
        }
        recalls.append(len(exact & approx) / len(exact))
    assert sum(recalls) / len(recalls) >= 0.9, recalls


def test_ann_lsh_scores_are_exact_for_returned_ids(spark, emb):
    """LSH only prunes candidates; scores of returned rows must equal
    the brute-force scores (the verify step is exact)."""
    q = _query(emb, 3)
    exact = {
        r.vec_id: r.score
        for r in knn.topk(emb, q, k=500, metric="ip").collect()
    }
    for r in lsh.ann_lsh_search(emb, q, k=10, dim=64).collect():
        assert abs(exact[r.vec_id] - r.score) < 1e-9


def test_near_dup_lsh_recall_and_precision(spark, emb):
    """Bucket-blocked near-dup vs the exact O(n²) pairs: perfect
    precision (exact in-bucket verify) and recall ≥ 0.8."""
    tau = 0.45
    exact_pairs = {
        (r.id_a, r.id_b)
        for r in dedup.embedding_cosine_pairs(emb, threshold=tau).collect()
    }
    lsh_pairs = {
        (r.id_a, r.id_b)
        for r in lsh.near_dup_lsh(emb, threshold=tau, dim=64).collect()
    }
    assert exact_pairs, "test corpus must contain near-dup pairs"
    assert lsh_pairs <= exact_pairs  # precision 1.0
    assert len(lsh_pairs & exact_pairs) / len(exact_pairs) >= 0.8


def test_lsh_buckets_shape(spark, emb):
    """One (id, table, bucket) row per vector per table; buckets in
    [0, 2^bits)."""
    n = emb.count()
    b = lsh.lsh_buckets(emb, dim=64, n_tables=4, n_bits=8).cache()
    assert b.count() == n * 4
    stats = b.agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    ).first()
    assert stats.lo >= 0 and stats.hi < 256


def test_bucket_cap_skew_guard(spark, emb):
    """Capping bucket size keeps precision exact, bounds per-bucket
    join cost, and retains most recall via the other tables."""
    tau = 0.45
    exact_pairs = {
        (r.id_a, r.id_b)
        for r in dedup.embedding_cosine_pairs(emb, threshold=tau).collect()
    }
    capped = {
        (r.id_a, r.id_b)
        for r in lsh.near_dup_lsh(
            emb, threshold=tau, dim=64, max_bucket_size=40
        ).collect()
    }
    assert capped <= exact_pairs  # precision still 1.0
    assert len(capped) / len(exact_pairs) >= 0.5  # bounded recall loss

    buckets = lsh.cap_bucket_size(
        lsh.lsh_buckets(emb, dim=64), max_bucket_size=40
    )
    from pyspark.sql import functions as F2
    assert buckets.groupBy("table", "bucket").count().agg(
        F2.max("count")
    ).first()[0] <= 40


@pytest.mark.parametrize("seed", [1337, 20260813])
def test_ann_lsh_recall_holds_at_other_seeds(spark, emb, seed):
    """The recall gate must not be plane-seed luck: re-run the
    recall@10 check with different hyperplane seeds."""
    recalls = []
    for qid in (0, 7, 42, 99, 250):
        q = _query(emb, qid)
        exact = {r.vec_id for r in knn.topk(emb, q, k=10, metric="ip").collect()}
        approx = {
            r.vec_id
            for r in lsh.ann_lsh_search(emb, q, k=10, dim=64, seed=seed).collect()
        }
        recalls.append(len(exact & approx) / len(exact))
    assert sum(recalls) / len(recalls) >= 0.9, (seed, recalls)


def test_near_dup_lsh_recall_holds_at_other_seed(spark, emb):
    tau = 0.45
    exact_pairs = {
        (r.id_a, r.id_b)
        for r in dedup.embedding_cosine_pairs(emb, threshold=tau).collect()
    }
    lsh_pairs = {
        (r.id_a, r.id_b)
        for r in lsh.near_dup_lsh(emb, threshold=tau, dim=64, seed=1337).collect()
    }
    assert lsh_pairs <= exact_pairs  # precision stays 1.0 at any seed
    assert len(lsh_pairs & exact_pairs) / len(exact_pairs) >= 0.8


def test_multiprobe_recovers_recall_with_fewer_tables(spark, emb):
    """Multi-probe at 8 tables beats plain 8-table recall and reaches
    the 24-table config's recall class — the index is 3× smaller for
    the same answer quality (the corpus-side saving that matters)."""
    qids = (0, 7, 42, 99, 250)

    def mean_recall(n_tables, multiprobe):
        recalls = []
        for qid in qids:
            q = _query(emb, qid)
            exact = {
                r.vec_id for r in knn.topk(emb, q, k=10, metric="ip").collect()
            }
            approx = {
                r.vec_id
                for r in lsh.ann_lsh_search(
                    emb, q, k=10, dim=64,
                    n_tables=n_tables, multiprobe=multiprobe,
                ).collect()
            }
            recalls.append(len(exact & approx) / len(exact))
        return sum(recalls) / len(recalls)

    plain = mean_recall(8, 0)
    probed = mean_recall(8, 2)
    assert probed >= plain, (plain, probed)
    assert probed >= 0.9, (plain, probed)


def test_multiprobe_probe_set_shape(spark, emb):
    q = _query(emb, 0)
    base = lsh.query_probe_buckets(q, dim=64, n_tables=8, multiprobe=0)
    probed = lsh.query_probe_buckets(q, dim=64, n_tables=8, multiprobe=2)
    assert base.count() == 8
    # ≤ 3 probes per table (home + 2 flips), distinct
    assert 8 < probed.count() <= 24
    # home buckets are a subset of the probed set
    home = {(r.table, r.bucket) for r in base.collect()}
    allp = {(r.table, r.bucket) for r in probed.collect()}
    assert home <= allp


def test_lsh_bits_for_sizing_rule():
    """Bucket bits grow with log2(n): pinned bucket size keeps the
    candidate-pair stage linear in corpus size (r4 rehearsal: fixed
    bits went 54x slower at 10x the vectors)."""
    from faiss_vector_search_spark.operators.lsh import lsh_bits_for

    assert lsh_bits_for(2_000, target_bucket_size=64) == 5
    assert lsh_bits_for(20_000, target_bucket_size=64) == 9
    assert lsh_bits_for(200_000, target_bucket_size=64) == 12
    # 10x data -> bucket size unchanged at the suggested bits
    for n in (2_000, 20_000, 200_000):
        bits = lsh_bits_for(n, target_bucket_size=64)
        assert n / (1 << bits) <= 64
    # floor: tiny corpora never go below min_bits
    assert lsh_bits_for(10) == 4
    assert lsh_bits_for(0) == 4


def test_near_dup_lsh_arrow_engine_equals_sql(spark, emb):
    sql = {
        (r.id_a, r.id_b, r.cosine)
        for r in lsh.near_dup_lsh(emb, threshold=0.45, n_bits=5).collect()
    }
    arrow = {
        (r.id_a, r.id_b, r.cosine)
        for r in lsh.near_dup_lsh(
            emb, threshold=0.45, n_bits=5, engine="arrow"
        ).collect()
    }
    assert sql == arrow and sql


def test_near_dup_lsh_unknown_engine_raises(spark, emb):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown near_dup_lsh engine"):
        lsh.near_dup_lsh(emb, engine="bogus")
