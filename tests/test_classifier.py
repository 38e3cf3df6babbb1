"""Property gates for the fastText-style quality classifier:
train/score determinism, separable-corpus fit, committed-model
contract, and the zero-shuffle scoring plan."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from faiss_vector_search_spark.operators import classifier


def _labeled(spark, rows):
    docs = spark.createDataFrame(
        [(i, t) for i, (t, _y) in enumerate(rows)],
        "doc_id bigint, text string",
    )
    labels = spark.createDataFrame(
        [(i, y) for i, (_t, y) in enumerate(rows)],
        "doc_id bigint, label int",
    )
    return docs, labels


def _separable(n=60):
    good = "the quick brown fox jumps over a lazy dog near the river bank"
    junk = "zzz qqq xxx kkk vvv jjj www yyy zzz qqq xxx kkk"
    return [(good, 1) if i % 2 == 0 else (junk, 0) for i in range(n)]


class TestTraining:
    def test_fits_separable_corpus(self, spark):
        docs, labels = _labeled(spark, _separable())
        m = classifier.train_quality_classifier(docs, labels, n_buckets=32)
        scored = classifier.score_quality_classifier(docs, m)
        j = scored.join(labels, "doc_id")
        acc = (
            j.where(j["keep"].cast("int") == j["label"]).count() / j.count()
        )
        assert acc >= 0.95

    def test_deterministic(self, spark):
        docs, labels = _labeled(spark, _separable())
        a = classifier.train_quality_classifier(docs, labels, n_buckets=32)
        b = classifier.train_quality_classifier(docs, labels, n_buckets=32)
        assert a == b

    def test_sample_cap_ceiling_division(self, spark):
        # n=60, cap=40 -> stride ceil(60/40)=2 -> <=30 ids train; the
        # floor-division bug class would keep stride=1 (no-op cap).
        # Classes alternate in PAIRS so the stride-2 subset keeps both
        # (good-only would make training degenerate).
        good = "the quick brown fox jumps over a lazy dog by the river"
        junk = "zzz qqq xxx kkk vvv jjj www yyy zzz qqq xxx kkk"
        rows = [
            (good, 1) if (i // 2) % 2 == 0 else (junk, 0) for i in range(60)
        ]
        docs, labels = _labeled(spark, rows)
        m = classifier.train_quality_classifier(
            docs, labels, n_buckets=32, train_sample=40
        )
        assert m["n_buckets"] == 32  # trains without error on the half


class TestScoring:
    def test_zero_shuffle_plan(self, spark, sf_small):
        from faiss_vector_search_spark import io as fio

        m = classifier.load_model()
        plan = classifier.score_quality_classifier(
            fio.load_table(spark, sf_small, "documents"), m, hash_fn="md5"
        )._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "Join" not in plan

    def test_empty_and_null_docs_score_bias(self, spark):
        m = classifier.load_model()
        df = spark.createDataFrame(
            [(1, ""), (2, None), (3, "normal words here")],
            "doc_id bigint, text string",
        )
        out = {
            r["doc_id"]: r
            for r in classifier.score_quality_classifier(
                df, m, hash_fn="md5"
            ).collect()
        }
        b6 = round(m["bias"], 6)
        assert out[1]["n_tokens"] == 0 and out[1]["logit"] == b6
        assert out[2]["n_tokens"] == 0 and out[2]["logit"] == b6
        assert out[3]["n_tokens"] == 3
        assert out[3]["keep"] == (out[3]["logit"] > 0)

    def test_logit_matches_numpy_reference(self, spark):
        """The in-plan fold replicates the model math exactly."""
        m = classifier.load_model()
        text = "alpha beta gamma alpha"
        df = spark.createDataFrame([(0, text)], "doc_id bigint, text string")
        got = classifier.score_quality_classifier(
            df, m, hash_fn="md5"
        ).collect()[0]
        import hashlib

        def bucket(tok):
            h = int(hashlib.md5(f"s37:{tok}".encode()).hexdigest()[:15], 16)
            return h % m["n_buckets"]

        toks = text.split()
        n = len(toks)
        usum = sum(m["units"][bucket(t)] for t in toks)
        sum_len = sum(len(t) for t in toks)
        ref = round(
            m["bias"]
            + (usum / 1e8) / n
            + m["w_len"] * (math.log(n + 1.0) / 10.0)
            + m["w_mwl"] * ((sum_len / n) / 10.0),
            6,
        )
        assert got["logit"] == ref
        assert got["n_tokens"] == n


class TestCommittedModel:
    def test_contract(self):
        m = classifier.load_model()
        assert m["n_buckets"] == 64 and len(m["units"]) == 64
        assert m["seed"] == classifier.FEATURE_SEED
        assert all(isinstance(u, int) for u in m["units"])
        for k in ("bias", "w_len", "w_mwl"):
            assert isinstance(m[k], float)

    def test_distillation_agreement(self, spark, sf_medium):
        """The committed model reproduces its documented in-sample
        agreement with the gopher keep labels (0.82 at train time; a
        regression here means model/featureizer drift)."""
        from faiss_vector_search_spark import io as fio
        from faiss_vector_search_spark.operators import textstats

        docs = fio.load_table(spark, sf_medium, "documents")
        labels = textstats.gopher_rules(docs).select(
            "doc_id", F.col("keep").cast("int").alias("label")
        )
        scored = classifier.score_quality_classifier(
            docs, classifier.load_model(), hash_fn="md5"
        )
        j = scored.join(labels, "doc_id")
        acc = (
            j.where(j["keep"].cast("int") == j["label"]).count() / j.count()
        )
        assert acc >= 0.8
