"""Scale-rehearsal recall gates (`pytest -m scale`, VERDICT r4 asks
#3/#7): the ivf-kmeans / ann-lsh / planted-near-dup recall properties
that the default suite proves at sf0.001 re-asserted on the 10x
rehearsal corpora in `_scaledata/` — 20k vectors instead of ~200, the
production parameter sizing (nlist ~ sqrt(N), log2-scaled LSH bits,
bounded-sample arrow training) instead of toy constants.

Opt-in twice over: the `scale` marker keeps `pytest tests/ -x -q`
(the driver's per-round run) fast, and the skipif guards keep the
suite green on a checkout where the gitignored `_scaledata/` corpora
have not been generated (scripts/make_scale_data.py).

Run:  SPARK_GRAFT_SCALE_TESTS=1 python -m pytest tests/ -m scale -q
"""

from __future__ import annotations

import math
import os
import sys

import pytest
from pyspark.sql import functions as F

SF1 = "/root/repo/_scaledata/sf1"
SF1C = "/root/repo/_scaledata/sf1c"

pytestmark = [
    pytest.mark.scale,
    pytest.mark.skipif(
        not os.environ.get("SPARK_GRAFT_SCALE_TESTS"),
        reason="scale suite is opt-in: SPARK_GRAFT_SCALE_TESTS=1",
    ),
]


def _table(spark, sf_dir, name):
    from faiss_vector_search_spark import io as fio

    if not os.path.isdir(os.path.join(sf_dir, f"{name}.parquet")):
        pytest.skip(f"{sf_dir}/{name}.parquet not generated")
    return fio.load_table(spark, sf_dir, name)


@pytest.fixture(scope="module")
def emb_sf1(spark):
    return _table(spark, SF1, "embeddings").cache()


@pytest.fixture(scope="module")
def emb_sf1c(spark):
    # self-generate when absent (r5 verdict ask #4: all 8 scale gates
    # must run, not 7): the clustered corpus is a pure function of its
    # parameters, so regeneration is byte-stable (n=20000 matches the
    # committed recall artifacts in artifacts/scale_rehearsal/)
    if not os.path.isdir(os.path.join(SF1C, "embeddings.parquet")):
        sys.path.insert(0, "/root/repo/scripts")
        from make_scale_data import make_clustered_embeddings

        make_clustered_embeddings(spark, SF1C, n=20000)
    return _table(spark, SF1C, "embeddings").cache()


def _exact_topk_ids(emb, qid, k=10):
    from faiss_vector_search_spark.operators import knn

    q = emb.where(F.col("vec_id") == qid).select(
        F.col("embedding").alias("query_vec")
    )
    return {r[0] for r in knn.topk(emb, q, k=k).select("vec_id").collect()}


# --- VERDICT #7: existing recall property gates at sf1 -----------------


def test_ivf_kmeans_recall_sf1(spark, emb_sf1):
    """kmeans-trained IVF at production sizing on the 10x replica
    corpus (the documented worst case: top-10 neighbors at cos
    0.2-0.6). The r4 seeded-centroid dial measured 0.80 at a 14% scan
    fraction on sf10; the kmeans quantizer at a ~23% fraction must
    clear 0.6 here — well above the 0.41 the 3% fraction delivers."""
    from faiss_vector_search_spark.operators import ivf

    n = emb_sf1.count()
    nlist = max(16, int(math.sqrt(n)))  # 141
    cents = ivf.kmeans_centroids(
        emb_sf1, nlist=nlist, iters=3, train_sample=10_000, engine="arrow"
    )
    assigned = ivf.assign_lists(emb_sf1, cents, engine="arrow").cache()
    try:
        recalls = []
        for qid in (2, 5002, 10002, 15002):
            q = emb_sf1.where(F.col("vec_id") == qid).select(
                F.col("embedding").alias("query_vec")
            )
            got = {
                r[0]
                for r in ivf.ivf_search(
                    emb_sf1, q, nlist=nlist, nprobe=nlist // 4, k=10,
                    centroids=cents, assigned=assigned,
                ).select("vec_id").collect()
            }
            recalls.append(len(got & _exact_topk_ids(emb_sf1, qid)) / 10)
        assert sum(recalls) / len(recalls) >= 0.6, recalls
    finally:
        assigned.unpersist()


def test_ann_lsh_recall_sf1(spark, emb_sf1):
    """Multiprobe hyperplane LSH with corpus-sized bucket bits
    (lsh_bits_for) at sf1 — r4 measured 0.90 mean recall@10; gate at
    0.75 to absorb query-sample wobble."""
    from faiss_vector_search_spark.operators import lsh

    n = emb_sf1.count()
    bits = lsh.lsh_bits_for(n, target_bucket_size=64)
    index = lsh.lsh_buckets(emb_sf1, 64, 24, bits, 42, "vec_id", "embedding").cache()
    try:
        recalls = []
        for qid in (2, 5002, 10002, 15002):
            q = emb_sf1.where(F.col("vec_id") == qid).select(
                F.col("embedding").alias("query_vec")
            )
            got = {
                r[0]
                for r in lsh.ann_lsh_search(
                    emb_sf1, q, k=10, n_tables=24, n_bits=bits,
                    multiprobe=4, corpus_buckets=index,
                ).select("vec_id").collect()
            }
            recalls.append(len(got & _exact_topk_ids(emb_sf1, qid)) / 10)
        assert sum(recalls) / len(recalls) >= 0.75, recalls
    finally:
        index.unpersist()


@pytest.mark.parametrize("engine", ["sql", "arrow"])
def test_dedup_embedding_lsh_planted_recall_sf1(spark, emb_sf1, engine):
    """Every planted near-dup pair (cos ~ 0.99, truth linear in N by
    construction — make_scale_data.py) must surface from the
    bucketed near-dup join: the r4 rehearsal measured 100% planted
    recall at every SF once bucket bits scaled with the corpus."""
    from faiss_vector_search_spark.operators import lsh

    n = emb_sf1.count()
    n_base = 2000  # sf0.1 embeddings rows, replicated 10x
    truth = {
        (g - 1, g)
        for g in range(n_base, n)
        if (g % n_base) % 100 == 1
    }
    assert truth, "plant rule produced no pairs — corpus layout changed?"
    bits = lsh.lsh_bits_for(n, target_bucket_size=64)
    pairs = {
        (r.id_a, r.id_b)
        for r in lsh.near_dup_lsh(
            emb_sf1, threshold=0.9, dim=64, n_bits=bits,
            max_bucket_size=4096, engine=engine,
        ).collect()
    }
    missed = truth - pairs
    assert not missed, f"missed {len(missed)}/{len(truth)} planted pairs"


# --- VERDICT #3: nprobe dial helper on the clustered corpus ------------


def test_nprobe_for_recall_clustered_sf1c(spark, emb_sf1c):
    """On a corpus with real cluster structure (Gaussian mixture,
    C=100) the dial helper must find a nprobe WELL below exhaustive
    for a 0.9 target — the whole point of separating index quality
    from the near-random replica corpus's pathology."""
    from faiss_vector_search_spark.operators import evaluate

    n = emb_sf1c.count()
    nlist = max(16, int(math.sqrt(n)))  # 141
    out = evaluate.nprobe_for_recall(
        emb_sf1c, target=0.9, query_ids=(2, 5002, 10002, 15002),
        k=10, nlist=nlist, engine="arrow",
    )
    assert out["nprobe"] is not None, out
    assert out["recall"] >= 0.9
    # clustered corpus: the target must be reachable at a fraction of
    # the lists (near-random sf10 needed 14% for just 0.80)
    assert out["nprobe"] <= nlist // 2, out


def test_repeated_spans_truth_scales_linearly(spark):
    """The sf1 replica corpus is 10 deterministic copies of sf0.1 (with
    FK-shifted ids and constant-width token tags), so every repeated
    span found at 1x must appear in each replica: total span-window
    mass at 10x = exactly 10x the 1x mass, and the gram dictionary
    join must stay broadcast (2 exchanges) at both SFs."""
    from faiss_vector_search_spark.operators import dedup

    from faiss_vector_search_spark import io as fio

    base = fio.load_table(spark, "/root/testdata/sf0.1", "documents")
    big = _table(spark, SF1, "documents")
    out_small = dedup.repeated_spans(base, w=8, hash_fn="xxhash64")
    out_big = dedup.repeated_spans(big, w=8, hash_fn="xxhash64")
    small_mass = out_small.agg(F.sum("n_windows")).first()[0]
    big_mass = out_big.agg(F.sum("n_windows")).first()[0]
    assert small_mass > 0
    # cross-replica token tags keep replicas from matching EACH OTHER,
    # so the planted within-replica repeats replicate exactly 10x
    assert big_mass == 10 * small_mass
    plan = out_big._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_ngram_novelty_truth_scales_exactly(spark):
    """Same replica argument as the span test: replicas cannot match
    each other (token tags), so per-replica gram structure — and with
    it the novel/total window masses — must replicate exactly 10x."""
    from faiss_vector_search_spark import io as fio
    from faiss_vector_search_spark.operators import textstats

    base = fio.load_table(spark, "/root/testdata/sf0.1", "documents")
    big = _table(spark, SF1, "documents")
    s = textstats.ngram_novelty(base, w=8, hash_fn="xxhash64").agg(
        F.sum("n_grams"), F.sum("n_novel")
    ).first()
    b = textstats.ngram_novelty(big, w=8, hash_fn="xxhash64").agg(
        F.sum("n_grams"), F.sum("n_novel")
    ).first()
    assert s[0] > 0 and s[1] > 0
    assert b[0] == 10 * s[0]
    assert b[1] == 10 * s[1]


def test_self_similarity_constant_sample_at_scale(spark):
    """The diversity report's quadratic part is the bounded sample at
    any corpus size: the full C(40,2) pair set materializes at 10x and
    the pair join stays broadcast (no sort-merge join)."""
    from faiss_vector_search_spark.operators import dedup

    big = _table(spark, SF1, "documents")
    df = dedup.self_similarity_report(big, sample_k=40, shingle_n=2)
    (row,) = df.collect()
    assert row["n_pairs"] == 40 * 39 // 2
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan.split("Initial Plan")[0]


# --- r6: simhash engines on the realistic-density corpus ----------------

REAL = "/root/repo/_scaledata/realistic"


@pytest.fixture(scope="module")
def realistic_docs(spark):
    # self-generate (pure function of its parameters, byte-stable);
    # 100k keeps the gate <1 min while preserving the density regime
    path = os.path.join(REAL, "documents.parquet")
    if not os.path.isdir(path):
        sys.path.insert(0, "/root/repo/scripts")
        from make_scale_data import make_realistic_docs

        make_realistic_docs(spark, REAL, n=100_000)
    from faiss_vector_search_spark import io as fio

    return fio.load_table(spark, REAL, "documents")


def test_simhash_engines_agree_at_realistic_density(spark, realistic_docs):
    from faiss_vector_search_spark.operators import dedup

    # id-range cut, NOT limit(): an arbitrary 100k subset would split
    # planted cliques and collapse the recall denominator
    docs = realistic_docs.where(F.col("doc_id") < 100_000)
    a = dedup.simhash_pairs(docs, engine="pigeonhole",
                            hash_fn="xxhash64")
    b = dedup.simhash_pairs(docs, engine="combinatorial",
                            hash_fn="xxhash64")
    ca, cb = a.count(), b.count()
    assert ca == cb and ca > 0
    # identical sets, not just counts: anti-join both directions
    assert a.join(b, ["doc_a", "doc_b"], "left_anti").count() == 0
    assert b.join(a, ["doc_a", "doc_b"], "left_anti").count() == 0
    # planted cliques (groups of 20, ids 0-2 near-copies): simhash at
    # hamming<=3 recovers at least half at this edit rate (measured
    # 0.531 at 500k; a regression below 0.45 means the fingerprint or
    # the blocking broke)
    n = docs.count()
    hits = b.where(
        ((F.col("doc_a") / 20).cast("bigint")
         == (F.col("doc_b") / 20).cast("bigint"))
        & (F.col("doc_a") % 20 <= 2) & (F.col("doc_b") % 20 <= 2)
    ).count()
    recall = hits / ((n // 20) * 3)
    assert recall >= 0.45, recall


# --- VERDICT r7 #1: classify/mining quartet shuffle-volume gate ---------


def test_classify_mining_two_phase_shuffle_volume_sf1c(spark, emb_sf1c):
    """The r8 two-phase rewrite's scale claim, asserted at 100× the
    oracle SF: the rows that SHUFFLE into the per-query rank window
    are the phase-1 survivors (≤ k × partitions × |Q|), not the
    corpus-sized N × |Q| stream the single-phase window form moves —
    and the end-to-end result is row-identical to that foil. The
    survivor count IS the shuffle volume driver (each survivor is one
    fixed-width triple), so the gate records the reduction factor as
    a committed artifact like the bucket-Gram precedent."""
    import json

    from faiss_vector_search_spark.operators import knn

    emb = emb_sf1c
    n = emb.count()
    n_part = emb.rdd.getNumPartitions()
    queries = emb.where(F.col("vec_id").isin([0, 3, 7, 11])).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    k, nq = 10, 4
    surv = knn._two_phase_survivors(
        emb, queries, k, "ip", "vec_id", "embedding",
        "query_id", "query_vec", exclude_self=True, carry_label=True,
    ).count()
    single_phase_rows = n * nq  # what the window engine shuffles
    assert surv <= k * n_part * nq
    assert surv * 50 < single_phase_rows, (
        f"two-phase must shuffle >=50x fewer rows: {surv} vs "
        f"{single_phase_rows}"
    )
    two = sorted(map(tuple, knn.knn_classify(
        emb, queries, k=k, engine="two_phase").collect()))
    one = sorted(map(tuple, knn.knn_classify(
        emb, queries, k=k, engine="window").collect()))
    assert two == one

    os.makedirs("/root/repo/artifacts/scale_rehearsal", exist_ok=True)
    with open("/root/repo/artifacts/scale_rehearsal/"
              "classify_two_phase_sf1c.json", "w") as fh:
        json.dump({
            "corpus_rows": n, "partitions": n_part, "queries": nq, "k": k,
            "window_engine_shuffle_rows": single_phase_rows,
            "two_phase_survivor_rows": surv,
            "reduction_factor": round(single_phase_rows / surv, 1),
        }, fh, indent=1)


def test_mining_pair_engines_identical_sf1(spark, emb_sf1):
    """hard_negatives and training_triplets: two-phase == window at
    the 10x corpus (the boundary-tie surface grows with N; equality
    must hold beyond the oracle SF)."""
    from faiss_vector_search_spark.operators import knn

    anchors = emb_sf1.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        F.col("label").alias("query_label"),
    )
    for fn, kw in ((knn.hard_negatives, {"k": 5}),
                   (knn.training_triplets, {})):
        a = sorted(map(tuple, fn(emb_sf1, anchors,
                                 engine="window", **kw).collect()))
        b = sorted(map(tuple, fn(emb_sf1, anchors,
                                 engine="two_phase", **kw).collect()))
        assert a == b, fn.__name__


def test_chunk_index_persisted_parity_sf1(spark, tmp_path_factory):
    """Persisted chunk serving == the in-memory engine at the 10x
    documents corpus, with the probe scan partition-pruned."""
    from faiss_vector_search_spark.operators import embed

    docs = _table(spark, SF1, "documents")
    path = str(tmp_path_factory.mktemp("chunkidx_sf1") / "idx")
    embed.chunk_index_build(docs, path, nlist=16, hash_fn="xxhash64")
    q = "batch window vector hash fast stream"
    got = embed.chunk_search_persisted(
        spark, path, q, k=5, nprobe=4, hash_fn="xxhash64").collect()
    want = embed.chunk_text_search_ivf(
        docs, q, k=5, nlist=16, nprobe=4, hash_fn="xxhash64").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
