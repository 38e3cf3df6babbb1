"""Property gates for the r5 third-wave operators: PMI collocations,
per-domain KL divergence, and length-bucketed batch planning."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from faiss_vector_search_spark.operators import chunking, lexical, lm


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id bigint, text string"
    )


class TestPmiCollocations:
    def test_planted_collocation_ranks_first(self, spark):
        # "san francisco" always adjacent; "the"/"cat" frequent but
        # independent -> the planted phrase wins on PMI
        corpus = ["san francisco is large the cat sat"] * 6 + [
            "the dog sat on a mat",
            "cat and dog see the bird",
            "a cat sat near the dog",
        ]
        top = lexical.pmi_collocations(
            _docs(spark, corpus), min_count=3, top_n=5
        ).collect()
        # the repeated doc makes every within-doc adjacency equally
        # strong ("is large" ties) -- the planted pair must sit in the
        # max-PMI tier, and the independent frequent pair must not
        best = max(r["pmi"] for r in top)
        tier = {(r["term_a"], r["term_b"]) for r in top if r["pmi"] == best}
        assert ("san", "francisco") in tier
        assert ("the", "cat") not in tier

    def test_exact_pmi_math(self, spark):
        # one doc "a b a b": unigrams a:2 b:2 (N_uni=4);
        # bigrams (a,b):2 (b,a):1 (N_bi=3)
        out = {
            (r["term_a"], r["term_b"]): r
            for r in lexical.pmi_collocations(
                _docs(spark, ["a b a b"]), min_count=1, top_n=10
            ).collect()
        }
        ab = out[("a", "b")]
        assert ab["n_pair"] == 2
        expected = math.log((2 / 3) / ((2 / 4) * (2 / 4)))
        assert abs(ab["pmi"] - round(expected, 6)) < 1e-9

    def test_min_count_floor(self, spark):
        out = lexical.pmi_collocations(
            _docs(spark, ["x y", "p q p q p q"]), min_count=2, top_n=10
        ).collect()
        pairs = {(r["term_a"], r["term_b"]) for r in out}
        assert ("x", "y") not in pairs  # support 1 < floor
        assert ("p", "q") in pairs

    def test_candidate_joins_broadcast(self, spark, sf_small):
        from faiss_vector_search_spark import io as fio

        df = lexical.pmi_collocations(
            fio.load_table(spark, sf_small, "documents")
        )
        df.collect()  # AQE: reuse decisions land in the final plan
        final = (
            df._jdf.queryExecution().executedPlan().toString()
            .split("Initial Plan")[0]
        )
        # one melted broadcast join resolves both ends' counts; the
        # vocab table is never shuffle-joined and the corpus is
        # scanned exactly twice (once per count model — the totals
        # branches reuse the model aggs' exchanges)
        assert final.count("Scan parquet") == 2
        assert final.count("ReusedExchange") >= 2
        assert final.count("BroadcastHashJoin") >= 1
        assert "SortMergeJoin" not in final


class TestDomainKl:
    def test_identical_distribution_zero_kl(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c", "s1"), (2, "a b c", "s2")],
            "doc_id bigint, text string, source string",
        )
        out = {r["source"]: r for r in lm.domain_kl_report(df).collect()}
        assert out["s1"]["kl_nats"] == 0.0
        assert out["s2"]["kl_nats"] == 0.0

    def test_divergent_source_scores_higher_and_exact(self, spark):
        # s1: 4x"a"; s2: 2x"a" 2x"b". corpus: a:6 b:2 (N=8)
        df = spark.createDataFrame(
            [(1, "a a a a", "s1"), (2, "a a b b", "s2")],
            "doc_id bigint, text string, source string",
        )
        out = {r["source"]: r for r in lm.domain_kl_report(df).collect()}
        # hand: s1 p(a)=1, q(a)=6/8 -> KL = ln(8/6)
        exp1 = round(round(1.0 * math.log(1.0 / (6 / 8)), 8), 6)
        # s2: .5*ln(.5/(6/8)) + .5*ln(.5/(2/8))
        exp2 = round(
            round(0.5 * math.log(0.5 / (6 / 8)), 8)
            + round(0.5 * math.log(0.5 / (2 / 8)), 8),
            6,
        )
        assert abs(out["s1"]["kl_nats"] - exp1) < 1e-9
        assert abs(out["s2"]["kl_nats"] - exp2) < 1e-9
        # s1 (pure "a") diverges more from the 75/25 corpus than s2
        # (50/50, which still overlaps the corpus everywhere)
        assert out["s1"]["kl_nats"] > out["s2"]["kl_nats"]
        assert out["s1"]["n_tokens"] == 4 and out["s2"]["n_tokens"] == 4

    def test_one_corpus_scan(self, spark, sf_small):
        from faiss_vector_search_spark import io as fio

        df = lm.domain_kl_report(fio.load_table(spark, sf_small, "documents"))
        df.collect()  # AQE: reuse decisions land in the final plan
        plan = df._jdf.queryExecution().executedPlan().toString()
        # AQE's toString appends the pre-execution "Initial Plan"
        # snapshot -- gate only the final plan section
        final = plan.split("Initial Plan")[0]
        # totals attach as windows / a ReusedExchange branch: the
        # documents parquet is scanned once at runtime
        assert final.count("Scan parquet") == 1
        assert "ReusedExchange" in final


class TestLengthBatches:
    @pytest.fixture(scope="class")
    def plan_df(self, spark, sf_small):
        from faiss_vector_search_spark import io as fio

        docs = fio.load_table(spark, sf_small, "documents")
        out = chunking.length_bucket_batches(
            docs, batch_size=8, bucket_width=64, n_shards=4
        )
        return docs, out.collect()

    def test_batch_invariants(self, plan_df):
        docs, rows = plan_df
        assert rows
        for r in rows:
            assert 1 <= r["n_docs"] <= 8
            assert r["padding"] == r["n_docs"] * r["max_tokens"] - r["sum_tokens"]
            assert r["padding"] >= 0
            # bucket bound: every member (so the max too) lies in
            # [bucket*64, bucket*64+63]
            assert r["bucket"] * 64 <= r["max_tokens"] < (r["bucket"] + 1) * 64
        assert sum(r["n_docs"] for r in rows) == docs.count()

    def test_bucketing_caps_waste(self, plan_df):
        _docs_, rows = plan_df
        # pad-to-batch-max within a 64-wide bucket wastes < 64 tokens
        # per doc by construction
        for r in rows:
            assert (r["max_tokens"] * r["n_docs"] - r["sum_tokens"]) < 64 * r[
                "n_docs"
            ]

    def test_deterministic(self, spark, sf_small):
        from faiss_vector_search_spark import io as fio

        docs = fio.load_table(spark, sf_small, "documents")
        a = sorted(
            map(
                tuple,
                chunking.length_bucket_batches(docs, 8, 64, 4).collect(),
            )
        )
        b = sorted(
            map(
                tuple,
                chunking.length_bucket_batches(docs, 8, 64, 4).collect(),
            )
        )
        assert a == b


class TestHardNegatives:
    def test_label_mismatch_and_k(self, spark):
        from faiss_vector_search_spark.operators import knn

        # 3 clusters by label; anchor in label 0
        rows = [
            (0, [1.0, 0.0], 0), (1, [0.99, 0.1], 0), (2, [0.98, 0.2], 0),
            (3, [0.9, 0.4], 1), (4, [0.8, 0.6], 1),
            (5, [0.0, 1.0], 2), (6, [0.1, 0.9], 2),
        ]
        emb = spark.createDataFrame(
            rows, "vec_id bigint, embedding array<double>, label int"
        )
        anchors = emb.where(F.col("vec_id") == 0).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
            F.col("label").alias("query_label"),
        )
        out = knn.hard_negatives(emb, anchors, k=3).collect()
        got = [(r["vec_id"], r["rank"]) for r in out]
        # nearest DIFFERENT-label rows: 3 (0.9), 4 (0.8), then 6 (0.1)
        assert got == [(3, 1), (4, 2), (6, 3)]
        labels = {r[0]: r[2] for r in rows}
        assert all(labels[v] != 0 for v, _ in got)

    def test_filter_before_rank_window(self, spark):
        """Same-label rows crowding the top must not eat rank slots:
        k negatives return even when the k nearest overall share the
        anchor's label."""
        from faiss_vector_search_spark.operators import knn

        rows = [(i, [1.0 - 0.01 * i, 0.01 * i], 0) for i in range(5)] + [
            (10, [0.5, 0.5], 1), (11, [0.4, 0.6], 1)
        ]
        emb = spark.createDataFrame(
            rows, "vec_id bigint, embedding array<double>, label int"
        )
        anchors = emb.where(F.col("vec_id") == 0).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
            F.col("label").alias("query_label"),
        )
        out = knn.hard_negatives(emb, anchors, k=2).collect()
        assert [(r["vec_id"], r["rank"]) for r in out] == [(10, 1), (11, 2)]


class TestTokenBudgetSample:
    def test_budget_respected_and_maximal_prefix(self, spark):
        from faiss_vector_search_spark.operators import textstats

        docs = spark.createDataFrame(
            [(i, "w " * (i % 5 + 1), "a" if i % 2 == 0 else "b")
             for i in range(40)],
            "doc_id bigint, text string, source string",
        )
        out = textstats.token_budget_sample(
            docs, {"a": 20, "b": 15}
        ).collect()
        by_dom = {}
        for r in out:
            by_dom.setdefault(r["source"], []).append(r)
        for dom, cap in (("a", 20), ("b", 15)):
            total = sum(r["n_tokens"] for r in by_dom[dom])
            assert total <= cap
            # maximal prefix: the max running total is within cap and
            # every kept row's running <= cap
            assert max(r["running"] for r in by_dom[dom]) == total

    def test_stable_under_corpus_growth(self, spark):
        """md5 ranking: adding new docs never evicts an already-kept
        doc unless the budget forces it — the same-corpus rerun is
        byte-identical."""
        from faiss_vector_search_spark.operators import textstats

        docs = spark.createDataFrame(
            [(i, "tok " * 3, "a") for i in range(30)],
            "doc_id bigint, text string, source string",
        )
        a = sorted(
            r["doc_id"]
            for r in textstats.token_budget_sample(docs, {"a": 30}).collect()
        )
        b = sorted(
            r["doc_id"]
            for r in textstats.token_budget_sample(docs, {"a": 30}).collect()
        )
        assert a == b and len(a) == 10  # 30 tokens / 3 per doc

    def test_domains_outside_budget_drop_and_empty_raises(self, spark):
        import pytest as _pytest

        from faiss_vector_search_spark.operators import textstats

        docs = spark.createDataFrame(
            [(1, "x y z", "a"), (2, "x y z", "zzz")],
            "doc_id bigint, text string, source string",
        )
        out = textstats.token_budget_sample(docs, {"a": 100}).collect()
        assert {r["source"] for r in out} == {"a"}
        with _pytest.raises(ValueError):
            textstats.token_budget_sample(docs, {})


class TestTrainingTriplets:
    def test_hardest_pair_and_margin(self, spark):
        from faiss_vector_search_spark.operators import knn

        rows = [
            (0, [1.0, 0.0], 0),
            (1, [0.95, 0.2], 0),   # hardest positive
            (2, [0.5, 0.5], 0),
            (3, [0.9, 0.4], 1),    # hardest negative
            (4, [0.0, 1.0], 2),
        ]
        emb = spark.createDataFrame(
            rows, "vec_id bigint, embedding array<double>, label int"
        )
        anchors = emb.where(F.col("vec_id") == 0).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
            F.col("label").alias("query_label"),
        )
        t = knn.training_triplets(emb, anchors).collect()[0]
        assert (t["pos_id"], t["neg_id"]) == (1, 3)
        assert t["pos_score"] == 0.95 and t["neg_score"] == 0.9
        assert abs(t["margin"] - 0.05) < 1e-9

    def test_misranked_anchor_has_negative_margin(self, spark):
        from faiss_vector_search_spark.operators import knn

        rows = [
            (0, [1.0, 0.0], 0),
            (1, [0.2, 0.9], 0),    # far positive
            (2, [0.99, 0.1], 1),   # near negative -> misranked
        ]
        emb = spark.createDataFrame(
            rows, "vec_id bigint, embedding array<double>, label int"
        )
        anchors = emb.where(F.col("vec_id") == 0).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
            F.col("label").alias("query_label"),
        )
        t = knn.training_triplets(emb, anchors).collect()[0]
        assert t["margin"] < 0

    def test_anchor_never_its_own_positive(self, spark):
        from faiss_vector_search_spark.operators import knn

        emb = spark.createDataFrame(
            [(i, [1.0, 0.0], i % 2) for i in range(6)],
            "vec_id bigint, embedding array<double>, label int",
        )
        anchors = emb.select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
            F.col("label").alias("query_label"),
        )
        for t in knn.training_triplets(emb, anchors).collect():
            assert t["pos_id"] != t["query_id"]


class TestCurationScore:
    def test_bounds_grain_and_constant_pin(self, spark):
        from faiss_vector_search_spark.operators import curation

        # identical docs -> all three signals constant -> every norm
        # pins to 0.5 -> blend = 0.5 exactly
        docs = spark.createDataFrame(
            [(i, "the quick brown fox jumps over the lazy dog") for i in range(6)],
            "doc_id bigint, text string",
        )
        rows = curation.curation_score(docs, hash_fn="md5").collect()
        assert len(rows) == 6
        for r in rows:
            assert r["curation_score"] == 0.5

    def test_blend_matches_python_reference(self, spark, sf_small):
        from faiss_vector_search_spark import io as fio
        from faiss_vector_search_spark.operators import curation

        docs = fio.load_table(spark, sf_small, "documents")
        rows = curation.curation_score(docs, hash_fn="md5").collect()
        assert rows
        qs = [r["quality"] for r in rows]
        fs = [r["fluency"] for r in rows]
        cs = [r["logit"] for r in rows]
        mins = (min(qs), min(fs), min(cs))
        maxs = (max(qs), max(fs), max(cs))

        def norm(x, mn, mx):
            return (x - mn) / (mx - mn) if mx > mn else 0.5

        for r in rows:
            ref = round(
                0.4 * norm(r["quality"], mins[0], maxs[0])
                + 0.3 * norm(r["fluency"], mins[1], maxs[1])
                + 0.3 * norm(r["logit"], mins[2], maxs[2]),
                6,
            )
            assert r["curation_score"] == ref
            assert 0.0 <= r["curation_score"] <= 1.0
