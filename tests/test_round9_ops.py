"""Round-9 operators: benchmark contamination attribution (#208) and
the classifier calibration audit (#209)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from faiss_vector_search_spark import io as fio
from faiss_vector_search_spark.operators import classifier, dedup


class TestContaminationReport:
    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_planted_leaks_attribute_exactly(self, spark):
        bench_text = "alpha bravo charlie delta echo foxtrot golf hotel"
        # corpus doc 1 contains the full benchmark 8-gram; doc 2
        # contains it too plus an extra leading token (same single
        # shared 8-gram); doc 3 is clean
        corpus = self._docs(spark, [
            (1, "intro words " + bench_text + " trailing words here"),
            (2, "x " + bench_text),
            (3, "completely unrelated content with many different words"
                " spread across enough tokens to form grams"),
        ])
        bench = self._docs(spark, [(100, bench_text)])
        rows = dedup.contamination_report(
            corpus, bench, n=8, hash_fn="md5").collect()
        assert len(rows) == 1
        r = rows[0]
        assert r["bench_id"] == 100
        assert r["n_corpus_docs"] == 2
        # each leaking doc shares exactly the one 8-gram
        assert r["n_leak_pairs"] == 2
        assert r["max_shared_grams"] == 1

    def test_heavier_leak_ranks_first_and_counts_grams(self, spark):
        b1 = "one two three four five six seven eight nine ten"
        corpus = self._docs(spark, [
            # contains the benchmark doc verbatim -> shares ALL its
            # 8-grams (3 of them for a 10-token doc)
            (1, "prefix " + b1 + " suffix"),
        ])
        bench = self._docs(spark, [(7, b1)])
        (r,) = dedup.contamination_report(
            corpus, bench, n=8, hash_fn="md5").collect()
        assert (r["bench_id"], r["n_corpus_docs"]) == (7, 1)
        assert r["n_leak_pairs"] == 3 and r["max_shared_grams"] == 3

    def test_no_overlap_is_empty(self, spark):
        corpus = self._docs(spark, [
            (1, "aa bb cc dd ee ff gg hh ii jj kk")])
        bench = self._docs(spark, [
            (9, "zz yy xx ww vv uu tt ss rr qq pp")])
        assert dedup.contamination_report(
            corpus, bench, n=8, hash_fn="md5").count() == 0

    def test_short_docs_form_no_grams(self, spark):
        corpus = self._docs(spark, [(1, "only five words here now")])
        bench = self._docs(spark, [(2, "only five words here now")])
        # identical text but < 8 tokens: no 8-grams, no contamination
        assert dedup.contamination_report(
            corpus, bench, n=8, hash_fn="md5").count() == 0

    def test_corpus_never_shuffles_before_join(self, spark, sf_small):
        docs = fio.load_table(spark, sf_small, "documents")
        df = dedup.contamination_report(
            docs.where(F.col("doc_id") % 50 != 0),
            docs.where(F.col("doc_id") % 50 == 0),
            n=8, hash_fn="md5",
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        final = plan.split("Initial Plan")[0]
        assert "SortMergeJoin" not in final
        assert "BroadcastHashJoin" in final  # benchmark side broadcasts


class TestClassifierCalibration:
    @pytest.fixture(scope="class")
    def report(self, spark, sf_small):
        docs = fio.load_table(spark, sf_small, "documents")
        rep = classifier.quality_calibration_report(
            docs, classifier.load_model(), n_bins=10, hash_fn="md5"
        ).collect()
        n = docs.count()
        return rep, n

    def test_partition_of_corpus(self, report):
        rep, n = report
        assert [r["decile"] for r in rep] == list(range(1, 11))
        assert sum(r["n_docs"] for r in rep) == n
        # ntile: bucket sizes differ by at most 1
        sizes = [r["n_docs"] for r in rep]
        assert max(sizes) - min(sizes) <= 1

    def test_logit_ordering_across_deciles(self, report):
        rep, _ = report
        # decile 1 holds the highest logits: min_logit non-increasing
        mins = [r["min_logit"] for r in rep]
        assert all(a >= b for a, b in zip(mins, mins[1:]))
        means = [r["mean_logit"] for r in rep]
        assert all(a >= b for a, b in zip(means, means[1:]))

    def test_pass_rate_bounds_and_signal(self, report):
        rep, _ = report
        rates = [r["gopher_pass_rate"] for r in rep]
        assert all(0.0 <= x <= 1.0 for x in rates)
        # the committed model distilled the gopher rules (0.82
        # agreement): the top half of the ranking must pass the rules
        # more often than the bottom half — the calibration property
        # the report exists to expose
        top, bottom = sum(rates[:5]), sum(rates[5:])
        assert top > bottom

    def test_approx_edges_engine(self, spark, sf_small):
        """The 100 TB profile: decile edges from one percentile_approx
        sketch, no global sort. Structural gates hold and the
        calibration signal reads the same as the exact engine."""
        docs = fio.load_table(spark, sf_small, "documents")
        rep = classifier.quality_calibration_report(
            docs, classifier.load_model(), n_bins=10, hash_fn="md5",
            edges="approx",
        ).collect()
        n = docs.count()
        assert sum(r["n_docs"] for r in rep) == n  # every doc binned
        assert {r["decile"] for r in rep} <= set(range(1, 11))
        mins = [r["min_logit"] for r in rep]
        assert all(a >= b for a, b in zip(mins, mins[1:]))
        rates = [r["gopher_pass_rate"] for r in rep]
        k = len(rates) // 2
        assert sum(rates[:k]) > sum(rates[-k:])
        # plan: no global-sort window, no join, one scan
        df = classifier.quality_calibration_report(
            docs, classifier.load_model(), n_bins=10, hash_fn="md5",
            edges="approx",
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        final = plan.split("Initial Plan")[0]
        # no ntile global sort; the only window is the bounded
        # cumulative count over the ≤10001-cell sigmoid histogram
        # (r10 single-scan engine), and the corpus is read ONCE
        assert "ntile(" not in final
        assert "SortMergeJoin" not in final
        assert final.count("Scan parquet") == 1

    def test_unknown_edges_engine_raises(self, spark, sf_small):
        docs = fio.load_table(spark, sf_small, "documents")
        with pytest.raises(ValueError, match="edges"):
            classifier.quality_calibration_report(
                docs, classifier.load_model(), edges="nope")

    def test_single_scan_no_join(self, spark, sf_small):
        docs = fio.load_table(spark, sf_small, "documents")
        df = classifier.quality_calibration_report(
            docs, classifier.load_model(), n_bins=10, hash_fn="md5")
        plan = df._jdf.queryExecution().executedPlan().toString()
        final = plan.split("Initial Plan")[0]
        # the two signals chain off ONE scan: no join anywhere
        assert "Join" not in final
        assert final.count("Scan parquet") == 1


class TestQualityDecilesApproxEdges:
    def test_approx_engine_structural_gates(self, spark, sf_small):
        from faiss_vector_search_spark.operators import textstats

        docs = fio.load_table(spark, sf_small, "documents")
        rep = sorted(
            textstats.quality_deciles(docs, edges="approx").collect(),
            key=lambda r: r["decile"],
        )
        n = docs.count()
        assert sum(r["n_docs"] for r in rep) == n
        assert {r["decile"] for r in rep} <= set(range(1, 11))
        mins = [r["min_q"] for r in rep]
        assert all(a <= b for a, b in zip(mins, mins[1:]))  # ascending
        # plan: no ntile global sort, ONE corpus scan; the only
        # window is the bounded cumulative count over the ≤10001-cell
        # quality-grid histogram (r10 single-scan engine)
        df = textstats.quality_deciles(docs, edges="approx")
        final = df._jdf.queryExecution().executedPlan().toString().split(
            "Initial Plan")[0]
        assert "ntile(" not in final
        assert "SortMergeJoin" not in final
        assert final.count("Scan parquet") == 1

    def test_unknown_engine_raises(self, spark, sf_small):
        from faiss_vector_search_spark.operators import textstats

        docs = fio.load_table(spark, sf_small, "documents")
        with pytest.raises(ValueError, match="edges"):
            textstats.quality_deciles(docs, edges="nope")


class TestKeepColsPassthrough:
    def test_gopher_rules_keep_cols(self, spark, sf_small):
        from faiss_vector_search_spark.operators import textstats

        docs = fio.load_table(spark, sf_small, "documents")
        out = textstats.gopher_rules(docs, keep_cols=("text", "source"))
        assert {"text", "source", "keep", "doc_id"} <= set(out.columns)
        base = textstats.gopher_rules(docs).select("doc_id", "keep")
        got = {(r["doc_id"], r["keep"]) for r in
               out.select("doc_id", "keep").collect()}
        want = {(r["doc_id"], r["keep"]) for r in base.collect()}
        assert got == want

    def test_score_classifier_keep_cols(self, spark, sf_small):
        docs = fio.load_table(spark, sf_small, "documents")
        out = classifier.score_quality_classifier(
            docs, classifier.load_model(), hash_fn="md5",
            keep_cols=("source",))
        assert "source" in out.columns
        base = classifier.score_quality_classifier(
            docs, classifier.load_model(), hash_fn="md5")
        got = {(r["doc_id"], r["logit"]) for r in
               out.select("doc_id", "logit").collect()}
        want = {(r["doc_id"], r["logit"]) for r in base.collect()}
        assert got == want
