"""Round-10 gates: the approx-edges dials' exchange budgets and
degenerate single-bucket profile, the MACRO-collision fix in the
suite-level retrieval rollup, and the shared-probe-job refactor of
the persisted IVF serving surfaces (r9 VERDICT asks #3/#4 + ADVICE)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from faiss_vector_search_spark.io import load_table


def _final_plan(df) -> str:
    df.collect()  # let AQE settle so the final plan is the real one
    return df._jdf.queryExecution().executedPlan().toString().split(
        "Initial Plan"
    )[0]


class TestApproxDialExchangeBudget:
    """The 100 TB edges="approx" engines carry a CI-pinned plan
    budget (r9 VERDICT ask #4, tightened by the r10 single-scan
    histogram rework): ONE corpus scan, the grid-histogram agg, the
    bounded cumulative window over the tiny histogram, and the final
    decile rollup — a regression that re-introduces the ntile global
    sort or a second corpus pass shows up here before it shows up as
    a slow bench row."""

    def test_quality_deciles_approx_plan(self, spark, sf_small):
        from faiss_vector_search_spark.operators import textstats

        docs = load_table(spark, sf_small, "documents")
        final = _final_plan(textstats.quality_deciles(docs, edges="approx"))
        assert final.count("Scan parquet") == 1, final
        assert final.count("Exchange") <= 3, final
        assert "ntile(" not in final and "SortMergeJoin" not in final

    def test_calibration_approx_plan(self, spark, sf_small):
        from faiss_vector_search_spark.operators import classifier

        docs = load_table(spark, sf_small, "documents")
        final = _final_plan(
            classifier.quality_calibration_report(
                docs, classifier.load_model(), n_bins=10,
                hash_fn="md5", edges="approx",
            )
        )
        assert final.count("Scan parquet") == 1, final
        assert final.count("Exchange") <= 3, final
        assert "ntile(" not in final and "SortMergeJoin" not in final


class TestApproxSingleBucket:
    """n_buckets==1 short-circuits: percentile_approx rejects an empty
    percentage list, so the approx engines must emit the one-bucket
    profile directly, matching the exact (ntile) engine (r9 ADVICE)."""

    def test_quality_deciles_single_bucket(self, spark, sf_small):
        from faiss_vector_search_spark.operators import textstats

        docs = load_table(spark, sf_small, "documents")
        approx = textstats.quality_deciles(
            docs, n_buckets=1, edges="approx"
        ).collect()
        exact = textstats.quality_deciles(
            docs, n_buckets=1, edges="exact"
        ).collect()
        assert len(approx) == len(exact) == 1
        a, e = approx[0], exact[0]
        assert a["decile"] == e["decile"] == 1
        assert a["n_docs"] == e["n_docs"]
        assert a["min_q"] == e["min_q"] and a["max_q"] == e["max_q"]
        assert a["avg_q"] == e["avg_q"]

    def test_calibration_single_bin(self, spark, sf_small):
        from faiss_vector_search_spark.operators import classifier

        docs = load_table(spark, sf_small, "documents")
        model = classifier.load_model()
        approx = classifier.quality_calibration_report(
            docs, model, n_bins=1, hash_fn="md5", edges="approx"
        ).collect()
        exact = classifier.quality_calibration_report(
            docs, model, n_bins=1, hash_fn="md5", edges="exact"
        ).collect()
        assert len(approx) == len(exact) == 1
        a, e = approx[0], exact[0]
        assert a["decile"] == e["decile"] == 1
        assert a["n_docs"] == e["n_docs"]
        assert a["min_logit"] == e["min_logit"]
        assert a["mean_logit"] == e["mean_logit"]
        assert a["gopher_pass_rate"] == e["gopher_pass_rate"]


class TestMacroCollisionGuard:
    """A real query literally tagged 'MACRO' must stay a distinct
    per-query row — the struct rollup key cannot merge it into the
    macro-average group (r9 ADVICE: the old explode-into-'MACRO'
    label silently corrupted both rows)."""

    def _frames(self, spark, tags):
        rows_r, rows_t = [], []
        for i, tag in enumerate(tags):
            # query i ranks docs [10i .. 10i+4]; truth = first 2 of them
            for r in range(1, 6):
                rows_r.append((tag, 10 * i + r, r))
            rows_t.extend([(tag, 10 * i + 1), (tag, 10 * i + 2)])
        results = spark.createDataFrame(
            rows_r, "query_tag string, doc_id long, rank int"
        )
        truth = spark.createDataFrame(rows_t, "query_tag string, doc_id long")
        return results, truth

    def test_macro_named_query_stays_distinct(self, spark):
        from faiss_vector_search_spark.operators import evaluate as ev

        results, truth = self._frames(spark, ["q1", "MACRO", "q3"])
        out = ev.retrieval_metrics_by_query(results, truth, k=5).collect()
        # 3 per-query rows + 1 macro row; two rows carry the label
        # MACRO (the real query and the average) and stay separate
        assert len(out) == 4
        macro_rows = [r for r in out if r["query_tag"] == "MACRO"]
        assert len(macro_rows) == 2
        # deterministic order: the real query (is_macro=0) sorts first
        per_q, avg = macro_rows
        # the real query's counters are its own (2 relevant, 2 hits);
        # the average row sums all three queries' counters
        assert per_q["n_relevant"] == 2 and per_q["n_hits"] == 2
        assert avg["n_relevant"] == 6 and avg["n_hits"] == 6

    def test_no_collision_output_unchanged(self, spark):
        from faiss_vector_search_spark.operators import evaluate as ev

        results, truth = self._frames(spark, ["q1", "q2"])
        out = {
            r["query_tag"]: r
            for r in ev.retrieval_metrics_by_query(results, truth, k=5)
            .collect()
        }
        assert set(out) == {"q1", "q2", "MACRO"}
        assert out["MACRO"]["n_relevant"] == 4
        # perfect retrieval of both judged docs at ranks 1-2
        assert out["q1"]["recall_at_k"] == 1.0
        assert out["MACRO"]["recall_at_k"] == 1.0


class TestSharedProbeJob:
    """ivf_search_persisted_batch_probed returns the probe union the
    batch search already computed, so the persisted miners run ONE
    bounded centroid job instead of two (r9 VERDICT ask #3)."""

    @pytest.fixture(scope="class")
    def store(self, spark, sf_small, tmp_path_factory):
        from faiss_vector_search_spark.operators import ivf as ivf_mod

        emb = load_table(spark, sf_small, "embeddings")
        cents = ivf_mod.seeded_centroids(emb, nlist=8)
        path = str(tmp_path_factory.mktemp("ivfp") / "idx")
        ivf_mod.save_ivf(emb, cents, path)
        return path, emb

    def _queries(self, emb, qids):
        return emb.where(F.col("vec_id").isin(qids)).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )

    def test_probed_equals_independent_union(self, spark, store):
        from faiss_vector_search_spark.operators import ivf as ivf_mod

        path, emb = store
        queries = self._queries(emb, [0, 3, 7])
        _, probed = ivf_mod.ivf_search_persisted_batch_probed(
            spark, path, queries, nprobe=3, k=5
        )
        cents = spark.read.parquet(f"{path}/_centroids")
        want = sorted({
            r["probe_cid"]
            for qid in [0, 3, 7]
            for r in ivf_mod.probe_lists(
                emb.where(F.col("vec_id") == qid).select(
                    F.col("embedding").alias("query_vec")
                ),
                cents, 3,
            ).collect()
        })
        assert probed == want
        assert probed == sorted(set(probed))  # sorted, deduped

    def test_results_match_unprobed_form(self, spark, store):
        from faiss_vector_search_spark.operators import ivf as ivf_mod

        path, emb = store
        queries = self._queries(emb, [0, 3])
        a = ivf_mod.ivf_search_persisted_batch(
            spark, path, queries, nprobe=2, k=5
        ).collect()
        b, _ = ivf_mod.ivf_search_persisted_batch_probed(
            spark, path, queries, nprobe=2, k=5
        )
        assert sorted(map(tuple, a)) == sorted(map(tuple, b.collect()))


class TestQLSearch:
    """Dirichlet query-likelihood retrieval (SURVEY §2 #210)."""

    def test_topk_shape_and_order(self, spark, sf_small):
        from faiss_vector_search_spark.operators import lexical

        docs = load_table(spark, sf_small, "documents")
        rows = lexical.ql_search(docs, "batch window vector", k=10).collect()
        assert len(rows) == 10
        scores = [r["score"] for r in rows]
        assert scores == sorted(scores, reverse=True)

    def test_matching_beats_length_prior_alone(self, spark):
        # a doc containing the query terms outranks a same-length doc
        # without them (the matched fold is positive; the length term
        # is shared)
        from faiss_vector_search_spark.operators import lexical

        docs = spark.createDataFrame(
            [(1, "alpha beta gamma delta"), (2, "zeta eta theta iota")],
            "doc_id long, text string",
        )
        rows = lexical.ql_search(docs, "alpha beta", k=2).collect()
        assert [r["doc_id"] for r in rows] == [1]  # only matches score

    def test_tf_monotone(self, spark):
        from faiss_vector_search_spark.operators import lexical

        docs = spark.createDataFrame(
            [(1, "alpha alpha alpha pad"), (2, "alpha pad pad pad")],
            "doc_id long, text string",
        )
        rows = lexical.ql_search(docs, "alpha", k=2).collect()
        assert rows[0]["doc_id"] == 1 and rows[0]["score"] > rows[1]["score"]

    def test_empty_query(self, spark, sf_small):
        from faiss_vector_search_spark.operators import lexical

        docs = load_table(spark, sf_small, "documents")
        assert lexical.ql_search(docs, "???", k=5).count() == 0

    def test_plan_no_term_window_two_scans(self, spark, sf_small):
        """The QL family's defining plan fact: per-term collection
        stats ride the corpus-stats pass as in-row array_remove
        aggregates — no term-keyed window (no stopword skew tail),
        two corpus scans, SMJ-free."""
        from faiss_vector_search_spark.operators import lexical

        docs = load_table(spark, sf_small, "documents")
        df = lexical.ql_search(docs, "batch window vector hash", k=10)
        final = _final_plan(df)
        assert "Window" not in final
        assert "SortMergeJoin" not in final
        assert final.count("Scan parquet") <= 2, final


class TestPercolate:
    """Standing-query matching (SURVEY §2 #211)."""

    def _docs(self, spark):
        return spark.createDataFrame(
            [
                (1, "alpha beta gamma"),
                (2, "alpha beta"),
                (3, "beta gamma delta"),
                (4, "epsilon zeta"),
            ],
            "doc_id long, text string",
        )

    def test_boolean_and_matching(self, spark):
        from faiss_vector_search_spark.operators import lexical

        out = lexical.percolate(
            self._docs(spark),
            [("q1", "alpha beta"), ("q2", "gamma delta")],
        ).collect()
        got = {(r["query_id"], r["doc_id"]) for r in out}
        assert got == {("q1", 1), ("q1", 2), ("q2", 3)}
        assert all(r["n_matched"] == r["n_terms"] == 2 for r in out)

    def test_min_should_match_fraction(self, spark):
        from faiss_vector_search_spark.operators import lexical

        # 3-term query at msm=0.5 -> required = 2 of 3
        out = lexical.percolate(
            self._docs(spark),
            [("q", "alpha beta delta")],
            min_should_match=0.5,
        ).collect()
        got = {r["doc_id"]: r["n_matched"] for r in out}
        assert got == {1: 2, 2: 2, 3: 2}

    def test_duplicate_tokens_count_once(self, spark):
        from faiss_vector_search_spark.operators import lexical

        docs = spark.createDataFrame(
            [(1, "alpha alpha alpha")], "doc_id long, text string"
        )
        out = lexical.percolate(
            docs, [("q", "alpha beta")], min_should_match=0.5
        ).collect()
        assert len(out) == 1 and out[0]["n_matched"] == 1

    def test_empty_stored_query_rejected(self, spark):
        from faiss_vector_search_spark.operators import lexical

        with pytest.raises(ValueError, match="no tokens"):
            lexical.percolate(self._docs(spark), [("q", "???")])

    def test_plan_one_scan_broadcast_only(self, spark, sf_small):
        """One corpus scan, the stored-query side broadcasts, no SMJ
        — the corpus never shuffles before the (doc, query) rollup."""
        from faiss_vector_search_spark.operators import lexical

        docs = load_table(spark, sf_small, "documents")
        df = lexical.percolate(
            docs, [("a", "batch window"), ("b", "vector stream")]
        )
        final = _final_plan(df)
        assert final.count("Scan parquet") == 1, final
        assert "SortMergeJoin" not in final
        assert "BroadcastHashJoin" in final


class TestFuzzySearch:
    """Edit-distance query expansion + BM25 (SURVEY §2 #212)."""

    def test_typo_finds_intended_docs(self, spark):
        from faiss_vector_search_spark.operators import lexical

        docs = spark.createDataFrame(
            [(1, "window batch engine"), (2, "totally unrelated words"),
             (3, "window window pane")],
            "doc_id long, text string",
        )
        rows = lexical.fuzzy_search(docs, "windov", k=3).collect()
        assert {r["doc_id"] for r in rows} == {1, 3}

    def test_max_dist_zero_equals_bm25(self, spark, sf_small):
        from faiss_vector_search_spark.operators import lexical

        docs = load_table(spark, sf_small, "documents")
        a = lexical.fuzzy_search(docs, "batch window", k=10, max_dist=0)
        b = lexical.bm25_search(docs, "batch window", k=10)
        assert [tuple(r) for r in a.collect()] == [
            tuple(r) for r in b.collect()
        ]

    def test_variant_scores_with_own_df(self, spark):
        # 'cat' and 'cap' both within 1 edit of query 'cat': docs
        # containing either match, each variant scored as itself
        from faiss_vector_search_spark.operators import lexical

        docs = spark.createDataFrame(
            [(1, "cat toy"), (2, "cap toy"), (3, "dog toy")],
            "doc_id long, text string",
        )
        rows = lexical.fuzzy_search(docs, "cat", k=3).collect()
        assert {r["doc_id"] for r in rows} == {1, 2}

    def test_no_expansion_empty(self, spark):
        from faiss_vector_search_spark.operators import lexical

        docs = spark.createDataFrame(
            [(1, "alpha beta")], "doc_id long, text string"
        )
        assert lexical.fuzzy_search(docs, "zzzzzzzzz", k=5).count() == 0


class TestPRFSearch:
    """Pseudo-relevance-feedback retrieval (SURVEY §2 #213)."""

    def test_topk_shape(self, spark, sf_small):
        from faiss_vector_search_spark.operators import lexical

        docs = load_table(spark, sf_small, "documents")
        rows = lexical.prf_search(docs, "batch window vector", k=10).collect()
        assert len(rows) == 10
        scores = [r["score"] for r in rows]
        assert scores == sorted(scores, reverse=True)

    def test_lam_one_is_plain_bm25_ranking(self, spark, sf_small):
        # λ=1: expansion weights vanish, query terms carry uniform
        # λ/|q| mass — scores scale by 1/|q| but the RANKING is bm25's
        from faiss_vector_search_spark.operators import lexical

        docs = load_table(spark, sf_small, "documents")
        a = lexical.prf_search(docs, "batch window", k=10, lam=1.0)
        b = lexical.bm25_search(docs, "batch window", k=10)
        assert [r["doc_id"] for r in a.collect()] == [
            r["doc_id"] for r in b.collect()
        ]

    def test_uniform_weighted_equals_bm25_bitwise(self, spark, sf_small):
        from faiss_vector_search_spark.operators import lexical

        docs = load_table(spark, sf_small, "documents")
        w = lexical.bm25_search_weighted(
            docs, {"batch": 1.0, "window": 1.0}, k=10
        )
        b = lexical.bm25_search(docs, "batch window", k=10)
        assert [tuple(r) for r in w.collect()] == [
            tuple(r) for r in b.collect()
        ]

    def test_expansion_pulls_related_docs(self, spark):
        # feedback doc couples 'alpha' with 'omega'; expansion must
        # surface the omega-only doc that plain bm25 cannot reach
        from faiss_vector_search_spark.operators import lexical

        docs = spark.createDataFrame(
            [
                (1, "alpha omega omega omega"),
                (2, "omega omega gamma"),
                (3, "unrelated words entirely"),
            ],
            "doc_id long, text string",
        )
        plain = {r["doc_id"] for r in
                 lexical.bm25_search(docs, "alpha", k=3).collect()}
        prf = {r["doc_id"] for r in
               lexical.prf_search(docs, "alpha", k=3, fb_docs=1,
                                  fb_terms=2).collect()}
        assert plain == {1}
        assert 2 in prf  # reached through the expanded 'omega'

    def test_empty_query(self, spark, sf_small):
        from faiss_vector_search_spark.operators import lexical

        docs = load_table(spark, sf_small, "documents")
        assert lexical.prf_search(docs, "???", k=5).count() == 0


class TestQLSearchMulti:
    """One-pass multi-query QL equals the per-query loop."""

    def test_equals_per_query_loop(self, spark, sf_small):
        from faiss_vector_search_spark.operators import lexical

        docs = load_table(spark, sf_small, "documents")
        tagged = [("q1", "batch window vector"), ("q2", "hash fast"),
                  ("q3", "stream sort merge")]
        multi = lexical.ql_search_multi(docs, tagged, k=10).collect()
        got = {}
        for r in multi:
            got.setdefault(r["query_tag"], []).append(
                (r["rank"], r["doc_id"], r["score"])
            )
        for tag, text in tagged:
            solo = lexical.ql_search(docs, text, k=10).collect()
            want = [(i + 1, r["doc_id"], r["score"])
                    for i, r in enumerate(solo)]
            assert sorted(got.get(tag, [])) == want, tag

    def test_duplicate_tags_rejected(self, spark, sf_small):
        from faiss_vector_search_spark.operators import lexical

        docs = load_table(spark, sf_small, "documents")
        with pytest.raises(ValueError, match="duplicate query tags"):
            lexical.ql_search_multi(docs, [("a", "x"), ("a", "y")])

    def test_one_scoring_scan_no_window_prefold(self, spark, sf_small):
        """The scoring plan reads the corpus once (stats collected as
        a bounded job beforehand) and carries no term-keyed window."""
        from faiss_vector_search_spark.operators import lexical

        docs = load_table(spark, sf_small, "documents")
        df = lexical.ql_search_multi(
            docs, [("a", "batch window"), ("b", "vector stream")], k=5
        )
        final = _final_plan(df)
        assert final.count("Scan parquet") == 1, final
        assert "SortMergeJoin" not in final
