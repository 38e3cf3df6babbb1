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


class TestClassifyMiningQuartetTwoPhase:
    """The r8 scale-shape closure: knn_classify (both modes),
    hard_negatives and training_triplets run two-phase by default —
    each must be row-identical to its single-phase window foil, and
    the corpus must never shuffle into a per-query window partition
    (plan gate: at most one exchange, carrying survivors only)."""

    def _queries(self, emb):
        return emb.where(F.col("vec_id").isin([0, 3, 7, 11])).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )

    def _anchors(self, emb):
        return emb.where(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
            F.col("label").alias("query_label"),
        )

    @pytest.mark.parametrize("weighted", [False, True])
    def test_knn_classify_engines_identical(self, spark, sf_small, weighted):
        emb = fio.load_table(spark, sf_small, "embeddings")
        q = self._queries(emb)
        a = sorted(map(tuple, knn.knn_classify(
            emb, q, k=10, weighted=weighted, engine="window").collect()))
        b = sorted(map(tuple, knn.knn_classify(
            emb, q, k=10, weighted=weighted, engine="two_phase").collect()))
        assert a == b and len(a) == 4

    def test_hard_negatives_engines_identical(self, spark, sf_small):
        emb = fio.load_table(spark, sf_small, "embeddings")
        anchors = self._anchors(emb)
        a = sorted(map(tuple, knn.hard_negatives(
            emb, anchors, k=5, engine="window").collect()))
        b = sorted(map(tuple, knn.hard_negatives(
            emb, anchors, k=5, engine="two_phase").collect()))
        assert a == b and len(a) == 40

    def test_training_triplets_engines_identical(self, spark, sf_small):
        emb = fio.load_table(spark, sf_small, "embeddings")
        anchors = self._anchors(emb)
        a = sorted(map(tuple, knn.training_triplets(
            emb, anchors, engine="window").collect()))
        b = sorted(map(tuple, knn.training_triplets(
            emb, anchors, engine="two_phase").collect()))
        assert a == b and len(a) == 8

    @pytest.mark.parametrize("build", [
        lambda emb, q, a: knn.knn_classify(emb, q, k=10),
        lambda emb, q, a: knn.knn_classify(emb, q, k=10, weighted=True),
        lambda emb, q, a: knn.hard_negatives(emb, a, k=5),
        lambda emb, q, a: knn.training_triplets(emb, a),
    ], ids=["classify", "classify_weighted", "hard_negatives", "triplets"])
    def test_no_corpus_sized_exchange_into_window(self, spark, sf_small,
                                                  build):
        emb = fio.load_table(spark, sf_small, "embeddings")
        df = build(emb, self._queries(emb), self._anchors(emb))
        plan = df._jdf.queryExecution().executedPlan().toString()
        # the corpus stays in its scan partitions: no crossJoin of the
        # corpus against the query set survives to the physical plan,
        # and the rank window reads only the mapInPandas survivors
        assert "BroadcastNestedLoopJoin" not in plan
        assert "MapInPandas" in plan

    def test_two_phase_carries_string_labels(self, spark):
        """The survivors engine must pass non-numeric label columns
        through (object-dtype arrays have no .item): classify over a
        string-labeled corpus works identically in both engines."""
        emb = spark.createDataFrame(
            [(0, [1.0, 0.0], "ham"), (1, [0.9, 0.1], "spam"),
             (2, [0.8, 0.3], "ham"), (3, [0.2, 0.9], "spam")],
            "vec_id long, embedding array<double>, label string",
        )
        q = emb.where(F.col("vec_id") == 0).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        a = sorted(map(tuple, knn.knn_classify(
            emb, q, k=2, engine="window").collect()))
        b = sorted(map(tuple, knn.knn_classify(
            emb, q, k=2, engine="two_phase").collect()))
        assert a == b
        assert b[0][1] in ("ham", "spam")

    def test_boundary_ties_resolve_identically(self, spark):
        """Adversarial tie surface: many corpus vectors with IDENTICAL
        rounded scores straddling the k boundary — the local lexsort's
        (score desc, id asc) must match the window's ORDER BY exactly,
        in every operator of the quartet."""
        rows = [(i, [1.0, 0.0], i % 3) for i in range(1, 40)]  # all tie
        rows.append((0, [1.0, 0.0], 0))
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>, label int")
        q = emb.where(F.col("vec_id") == 0).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"))
        a_q = emb.where(F.col("vec_id") == 0).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
            F.col("label").alias("query_label"))
        for build in (
            lambda e: knn.knn_classify(emb, q, k=7, engine=e),
            lambda e: knn.knn_classify(emb, q, k=7, weighted=True, engine=e),
            lambda e: knn.hard_negatives(emb, a_q, k=7, engine=e),
            lambda e: knn.training_triplets(emb, a_q, engine=e),
        ):
            a = sorted(map(tuple, build("window").collect()))
            b = sorted(map(tuple, build("two_phase").collect()))
            assert a == b

    def test_k_exceeds_corpus_and_empty_partitions(self, spark):
        """k larger than the corpus and a corpus spread over many
        EMPTY partitions must both survive the Arrow local phase."""
        emb = spark.createDataFrame(
            [(0, [1.0, 0.0], 1), (1, [0.5, 0.1], 2), (2, [0.1, 0.9], 1)],
            "vec_id long, embedding array<double>, label int",
        ).repartition(64)
        q = emb.where(F.col("vec_id") == 0).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"))
        a = sorted(map(tuple, knn.knn_classify(
            emb, q, k=50, engine="window").collect()))
        b = sorted(map(tuple, knn.knn_classify(
            emb, q, k=50, engine="two_phase").collect()))
        assert a == b and len(b) == 1

    def test_empty_query_set_returns_empty(self, spark, sf_small):
        emb = fio.load_table(spark, sf_small, "embeddings")
        none = emb.where(F.col("vec_id") < 0).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"))
        assert knn.knn_classify(emb, none, k=5).count() == 0
        assert knn.topk_join_two_phase(emb, none, k=5).count() == 0


class TestKnnClassifyPersisted:
    """Persisted-IVF classification: full-probe == exact knn_classify
    (both vote modes), candidate scan partition-pruned."""

    @pytest.fixture(scope="class")
    def idx(self, spark, sf_small, tmp_path_factory):
        from faiss_vector_search_spark.operators import ivf as ivf_mod

        emb = fio.load_table(spark, sf_small, "embeddings")
        path = str(tmp_path_factory.mktemp("clsidx") / "ivf")
        cents = ivf_mod.seeded_centroids(emb, 8)
        ivf_mod.save_ivf(emb, cents, path)
        return path

    @pytest.mark.parametrize("weighted", [False, True])
    def test_full_probe_equals_exact(self, spark, sf_small, idx, weighted):
        emb = fio.load_table(spark, sf_small, "embeddings")
        queries = emb.where(F.col("vec_id").isin([0, 3, 7, 11])).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        got = sorted(map(tuple, knn.knn_classify_persisted(
            spark, idx, queries, k=10, nprobe=8, weighted=weighted
        ).collect()))
        want = sorted(map(tuple, knn.knn_classify(
            emb, queries, k=10, weighted=weighted).collect()))
        assert got == want

    def test_candidate_scan_is_partition_pruned(self, spark, sf_small, idx):
        import contextlib
        import io as pyio
        import re

        emb = fio.load_table(spark, sf_small, "embeddings")
        queries = emb.where(F.col("vec_id") < 2).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        df = knn.knn_classify_persisted(spark, idx, queries, k=5, nprobe=2)
        buf = pyio.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        assert "PartitionFilters: [" in plan
        assert not re.search(
            r"Scan parquet[^\n]*vectors[\s\S]{0,400}PartitionFilters: \[\]",
            plan,
        ) or plan.count("PartitionFilters: [") >= 2


class TestHardNegativesPersisted:
    def test_full_probe_deep_pool_equals_exact(self, spark, sf_small,
                                               tmp_path):
        from faiss_vector_search_spark.operators import ivf as ivf_mod

        emb = fio.load_table(spark, sf_small, "embeddings")
        path = str(tmp_path / "ivf")
        ivf_mod.save_ivf(emb, ivf_mod.seeded_centroids(emb, 8), path)
        anchors = emb.where(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
            F.col("label").alias("query_label"),
        )
        n = emb.count()
        got = sorted(map(tuple, knn.hard_negatives_persisted(
            spark, path, anchors, k=5, nprobe=8,
            pool_mult=-(-n // 5),  # pool covers the whole corpus
        ).collect()))
        want = sorted(map(tuple, knn.hard_negatives(
            emb, anchors, k=5).collect()))
        assert got == want

    def test_shallow_pool_is_subset_of_exact_negatives(self, spark,
                                                       sf_small, tmp_path):
        """At any pool depth the mined rows are genuinely
        different-label and never the anchor itself."""
        from faiss_vector_search_spark.operators import ivf as ivf_mod

        emb = fio.load_table(spark, sf_small, "embeddings")
        path = str(tmp_path / "ivf")
        ivf_mod.save_ivf(emb, ivf_mod.seeded_centroids(emb, 8), path)
        anchors = emb.where(F.col("vec_id") < 4).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
            F.col("label").alias("query_label"),
        )
        mined = knn.hard_negatives_persisted(
            spark, path, anchors, k=5, nprobe=2, pool_mult=2
        )
        labels = {r.vec_id: r.label for r in emb.collect()}
        alabels = {r.query_id: r.query_label for r in anchors.collect()}
        for r in mined.collect():
            assert r.vec_id != r.query_id
            assert labels[r.vec_id] != alabels[r.query_id]


class TestTrainingTripletsPersisted:
    def test_full_probe_deep_pool_equals_exact(self, spark, sf_small,
                                               tmp_path):
        from faiss_vector_search_spark.operators import ivf as ivf_mod

        emb = fio.load_table(spark, sf_small, "embeddings")
        path = str(tmp_path / "ivf")
        ivf_mod.save_ivf(emb, ivf_mod.seeded_centroids(emb, 8), path)
        anchors = emb.where(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
            F.col("label").alias("query_label"),
        )
        n = emb.count()
        got = sorted(map(tuple, knn.training_triplets_persisted(
            spark, path, anchors, nprobe=8, pool=n + 1).collect()))
        want = sorted(map(tuple, knn.training_triplets(
            emb, anchors).collect()))
        assert got == want

    def test_shallow_pool_sides_are_label_correct(self, spark, sf_small,
                                                  tmp_path):
        from faiss_vector_search_spark.operators import ivf as ivf_mod

        emb = fio.load_table(spark, sf_small, "embeddings")
        path = str(tmp_path / "ivf")
        ivf_mod.save_ivf(emb, ivf_mod.seeded_centroids(emb, 8), path)
        anchors = emb.where(F.col("vec_id") < 4).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
            F.col("label").alias("query_label"),
        )
        out = knn.training_triplets_persisted(
            spark, path, anchors, nprobe=2, pool=10).collect()
        labels = {r.vec_id: r.label for r in emb.collect()}
        alabels = {r.query_id: r.query_label for r in anchors.collect()}
        assert len(out) == 4
        for r in out:
            if r.pos_id is not None:
                assert labels[r.pos_id] == alabels[r.query_id]
                assert r.pos_id != r.query_id
            if r.neg_id is not None:
                assert labels[r.neg_id] != alabels[r.query_id]
