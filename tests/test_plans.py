"""Plan-shape gates (SURVEY.md §5.3): the physical plans Catalyst
produces must be the plans the 100 TB design calls for — broadcasts
where a side is small, predicate pushdown reaching the parquet scan,
per-partition top-k instead of a global sort, and no corpus shuffle in
the kNN path. A correctness-green operator with the wrong plan shape
fails here."""

from __future__ import annotations

import contextlib
import io as pyio
import re

import pytest
from pyspark.sql import functions as F

from faiss_vector_search_spark import io as fio
from faiss_vector_search_spark.operators import analytics, ivf, knn


def plan_of(df, mode: str = "formatted") -> str:
    buf = pyio.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def has_codegen(df) -> bool:
    """Whole-stage-codegen spans only appear in the AQE *final* plan,
    so execute first, then read the executed plan."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "WholeStageCodegen" in plan or "*(" in plan


@pytest.fixture(scope="module")
def emb(spark, sf_small):
    return fio.load_table(spark, sf_small, "embeddings")


@pytest.fixture(scope="module")
def query(emb):
    return emb.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("query_vec")
    )


def test_knn_topk_is_take_ordered_no_corpus_shuffle(emb, query):
    plan = plan_of(knn.topk(emb, query, k=10))
    assert "TakeOrderedAndProject" in plan  # per-partition top-k + merge
    assert "Exchange hashpartitioning" not in plan  # corpus never shuffles
    assert "BroadcastNestedLoopJoin" in plan  # single-row query broadcast


def test_knn_no_python_udf_in_scan_loop(emb, query):
    plan = plan_of(knn.topk(emb, query, k=10))
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert has_codegen(knn.topk(emb, query, k=10))


def test_filter_pushdown_reaches_parquet_scan(spark, sf_small):
    # orders, not embeddings: other test modules cache() embeddings and
    # a cache hit would replace the parquet scan we're asserting on.
    df = fio.load_table(spark, sf_small, "orders").where(
        F.col("o_orderkey") < 100
    ).select("o_orderkey")
    plan = plan_of(df)
    assert (
        "PushedFilters: [IsNotNull(o_orderkey), LessThan(o_orderkey,100)]"
        in plan
    )
    # column pruning: only the filtered key column leaves the scan
    assert "ReadSchema: struct<o_orderkey:bigint>" in plan


def test_ivf_probe_set_is_broadcast(emb, query):
    plan = plan_of(ivf.ivf_search(emb, query, nlist=8, nprobe=2, k=5))
    assert "BroadcastExchange" in plan
    assert plan.count("Exchange hashpartitioning") == 0  # map-side assign


def test_small_dim_join_is_broadcast(spark, sf_small):
    out = analytics.top_customers_by_nation(
        fio.load_table(spark, sf_small, "customer"),
        fio.load_table(spark, sf_small, "orders"),
        fio.load_table(spark, sf_small, "nation"),
        top_n=3,
    )
    plan = plan_of(out)
    assert "BroadcastHashJoin" in plan  # nation (25 rows) must broadcast


def test_tpch_q1_partial_aggregation(spark, sf_small):
    plan = plan_of(
        analytics.pricing_summary(fio.load_table(spark, sf_small, "lineitem"))
    )
    # map-side combine: a partial_ aggregate must run before the shuffle
    assert "partial_sum" in plan or "partial_count" in plan
    assert has_codegen(
        analytics.pricing_summary(fio.load_table(spark, sf_small, "lineitem"))
    )


def test_bm25_query_terms_broadcast(spark, sf_small):
    """BM25's per-query work must be bounded by the query-term
    semi-join: the tiny term set broadcasts, the corpus never
    shuffles its full token stream into the scoring joins."""
    from faiss_vector_search_spark.operators import lexical

    docs = fio.load_table(spark, sf_small, "documents")
    plan = plan_of(lexical.bm25_search(docs, "lorem data word", k=5))
    assert "BroadcastExchange" in plan


def test_threshold_min_bound(spark, sf_small):
    """min_threshold floors the walk (ref dynamic_retriever.py)."""
    emb = fio.load_table(spark, sf_small, "embeddings")
    q = emb.where(F.col("vec_id") == 5).select(
        F.col("embedding").alias("query_vec")
    )
    unbounded = knn.dynamic_threshold_search(emb, q, k=20, hit_target=99)
    floored = knn.dynamic_threshold_search(
        emb, q, k=20, hit_target=99, min_threshold=0.25
    )
    t_un = unbounded.first().final_threshold
    t_fl = floored.first().final_threshold
    assert float(t_fl) >= 0.25
    assert float(t_fl) >= float(t_un)


def final_plan_of(df) -> str:
    """Executed plan text, final-plan section only (AQE's toString
    appends an '== Initial Plan ==' copy that double-counts nodes)."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


def test_asof_join_single_shuffle(spark, sf_small):
    """The union-tag as-of join must shuffle ONCE (on user_id) — a
    correlated/nested-loop plan would defeat the formulation."""
    events = fio.load_table(spark, sf_small, "events")
    plan = final_plan_of(analytics.asof_join_events(events))
    assert plan.count("Exchange hashpartitioning") <= 1
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_range_join_is_equi_join(spark, sf_small):
    """Bucketization must turn the interval predicate into an
    equi-join — no nested-loop/cartesian fallback."""
    events = fio.load_table(spark, sf_small, "events")
    plan = final_plan_of(analytics.range_join_events(events))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_anti_join_plans_as_broadcast_or_hash_anti(spark, sf_small):
    """Q22 shape: the NOT EXISTS must plan as a left-anti join (no
    row duplication, no distinct), with the date filter pushed to the
    orders scan."""
    out = analytics.customers_without_orders(
        fio.load_table(spark, sf_small, "customer"),
        fio.load_table(spark, sf_small, "orders"),
    )
    plan = plan_of(out)
    assert "LeftAnti" in plan
    assert "PushedFilters" in plan and "o_orderdate" in plan


def test_q17_preagg_not_correlated_rescan(spark, sf_small):
    """Q17 shape: exactly two lineitem scans (fact + pre-agg), never a
    per-row correlated rescan."""
    out = analytics.small_quantity_revenue(
        fio.load_table(spark, sf_small, "lineitem"),
        fio.load_table(spark, sf_small, "part"),
    )
    import re

    plan = plan_of(out)
    # formatted explain lists each node in tree AND detail sections;
    # count the numbered detail entries only.
    n_scans = len(re.findall(r"\(\d+\) Scan parquet", plan))
    assert n_scans == 3  # lineitem x2 + part
    assert "BroadcastHashJoin" in plan  # part dim broadcasts


def test_minmax_stats_are_broadcast(spark, sf_small):
    out = analytics.minmax_scale_events(
        fio.load_table(spark, sf_small, "events")
    )
    assert "BroadcastHashJoin" in plan_of(out)


def test_rollup_is_single_expand_aggregate(spark, sf_small):
    """ROLLUP must plan as one Expand + aggregate, not three scans."""
    import re

    out = analytics.pricing_rollup(fio.load_table(spark, sf_small, "lineitem"))
    plan = plan_of(out)
    assert "Expand" in plan
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_hopping_explode_is_scan_side(spark, sf_small):
    """The window-start explode must sit below the aggregation (scan
    side), and the aggregate must be partial (map-side combine)."""
    out = analytics.hopping_window_agg(fio.load_table(spark, sf_small, "events"))
    plan = plan_of(out)
    assert "Generate" in plan
    assert "partial_count" in plan  # map-side combine before the shuffle


def test_tfidf_topk_no_python_udf(spark, sf_small):
    from faiss_vector_search_spark.operators import lexical

    out = lexical.tfidf_topk_terms(fio.load_table(spark, sf_small, "documents"))
    plan = plan_of(out)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_cube_is_one_expand_one_scan(spark, sf_small):
    """CUBE must plan as grouping-set expansion over ONE scan, not a
    union of four aggregations."""
    out = analytics.pricing_cube(fio.load_table(spark, sf_small, "lineitem"))
    plan = plan_of(out)
    assert "Expand" in plan
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_trade_volume_broadcasts_nations_no_nested_loop(spark, sf_small):
    t = lambda n: fio.load_table(spark, sf_small, n)  # noqa: E731
    out = analytics.nation_trade_volume(
        t("lineitem"), t("orders"), t("customer"), t("supplier"), t("nation")
    )
    plan = plan_of(out)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the nation-name prefilter reaches the nation scans
    assert "In(n_name" in plan


def test_disjunctive_brand_union_pushed_to_part_scan(spark, sf_small):
    out = analytics.disjunctive_revenue(
        fio.load_table(spark, sf_small, "lineitem"),
        fio.load_table(spark, sf_small, "part"),
    )
    plan = plan_of(out)
    assert "BroadcastHashJoin" in plan
    # union of branch brands is pushed into the part scan
    assert "In(p_brand" in plan


def test_gap_fill_stays_jvm_side(spark, sf_small):
    out = analytics.events_gap_fill(fio.load_table(spark, sf_small, "events"))
    plan = plan_of(out)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


class TestPlanAuditRegressionGate:
    """r7 verdict ask #5: the committed PLAN_AUDIT.md facts are a
    CI-enforced allowlist, not a diff a human must read. Any new
    SortMergeJoin, any CartesianProduct, any Arrow/pandas node outside
    the declared non-JVM stages, or an ERR row fails here the moment
    scripts/plan_audit.py regenerates the table (the per-round
    ritual). Live-plan spot gates below keep the r8-edited keys honest
    between regenerations."""

    # The 4 justified sort-merge joins (each a fact-fact join whose
    # both sides descend from corpus-sized derivations, documented in
    # PLAN_AUDIT.md / VERDICT r7): semdedup's co-partitioned
    # intra-cluster equi-join, events_range_join's fact-fact bucket
    # join, ann_lsh_search's band join, snapshot_diff on the PLAIN
    # (deliberately unbucketed) store.
    SMJ_ALLOWLIST = {
        "semdedup", "events_range_join", "ann_lsh_search", "snapshot_diff",
        # r12: the verify-side candidate prefilter (docs leftsemi
        # candidate-ids before the shingle build — dedup.py
        # minhash_lsh_pairs/fuzzy_decontaminate) plans as SMJ in the
        # static AQE-off audit because the candidate set's size is
        # unknown at plan time; at runtime AQE broadcasts it (verified
        # on executed plans at sf0.001-1). SMJ is the correct fallback
        # when candidates are too large to broadcast at 100 TB.
        "dedup_minhash_lsh", "fuzzy_decontaminate", "cross_domain_dups",
    }
    # Declared non-JVM stages: Arrow-batched chunker / local-top-k /
    # LSH-Gram / MMR / model slots / tokenizer / codecs — each one a
    # documented mapInPandas|applyInPandas design decision.
    ARROW_ALLOWLIST = {
        "knn_classify", "knn_classify_weighted", "knn_batch",
        "hard_negatives", "training_triplets",
        "chunk_search", "chunk_documents_greedy", "pack_sequences",
        "opq_rerank_search", "ann_lsh_search", "dedup_embedding_lsh",
        "mmr_rerank", "bpe_tokenize", "bpe_fertility",
        "embed_text_model", "multimodal_decode", "docx_ingest",
        "model_rerank", "cross_rerank",
        # r11: fused BLAS projection+assignment kernel — the
        # declarative form re-evaluated the interpreted PCA folds per
        # downstream reference (1.94 s of 2.28 s at sf0.1); rationale
        # in transform.pca_assign_arrow's docstring
        "pca_ivf_search",
    }

    @pytest.fixture(scope="class")
    def audit_rows(self):
        import os

        path = os.path.join(os.path.dirname(__file__), "..", "PLAN_AUDIT.md")
        rows = {}
        with open(path) as fh:
            for line in fh:
                if not line.startswith("| "):
                    continue
                cells = [c.strip() for c in line.strip().strip("|").split("|")]
                if len(cells) != 6 or cells[0] in ("query", "---"):
                    continue
                rows[cells[0]] = {
                    "exchanges": cells[1], "joins": cells[2],
                    "props": cells[3], "codegen": cells[4],
                    "python": cells[5],
                }
        assert len(rows) > 150, "PLAN_AUDIT.md did not parse"
        return rows

    def test_no_audit_errors(self, audit_rows):
        errs = [k for k, r in audit_rows.items() if r["exchanges"] == "ERR"]
        assert not errs, f"plan audit ERR rows: {errs}"

    def test_no_cartesian_products(self, audit_rows):
        bad = [k for k, r in audit_rows.items()
               if "CartesianProduct" in r["joins"]]
        assert not bad, f"CartesianProduct appeared in: {bad}"

    def test_sort_merge_joins_within_allowlist(self, audit_rows):
        smj = {k for k, r in audit_rows.items()
               if "SortMergeJoin" in r["joins"]}
        new = smj - self.SMJ_ALLOWLIST
        assert not new, (
            f"NEW SortMergeJoin in {sorted(new)} — either restore the "
            f"broadcast/fusion shape or justify it in PLAN_AUDIT.md and "
            f"extend the allowlist"
        )

    def test_python_nodes_within_allowlist(self, audit_rows):
        py = {k for k, r in audit_rows.items() if r["python"] != "-"}
        new = py - self.ARROW_ALLOWLIST
        assert not new, (
            f"NEW Arrow/pandas node in {sorted(new)} — hot paths must "
            f"stay JVM-side; declare a deliberate non-JVM stage here "
            f"only with a docstring rationale"
        )

    def test_hybrid_search_stays_fused(self, spark, sf_small):
        """Live gate for the r8 union+groupBy-sum fusion: the RRF
        fusion of two corpus-derived shortlists must never plan as a
        sort-merge join again."""
        from faiss_vector_search_spark.operators import embed, lexical

        docs = fio.load_table(spark, sf_small, "documents")
        lex = lexical.bm25_search(docs, "batch window vector", k=20)
        den = embed.text_search(docs, "batch window vector", k=20)
        plan = plan_of(lexical.hybrid_rrf(lex, den, k=10), "simple")
        assert "SortMergeJoin" not in plan
        assert "TakeOrderedAndProject" in plan

    def test_retrieval_eval_suite_plan_budget(self, spark, sf_small):
        """Live gate for the r9 eval-family fusion: the suite eval
        must stay SMJ-free and inside its corpus-scan budget — the
        two stage-1 engines (bm25: stats + matched passes, dense: one
        pass) and NOTHING else. The pre-r9 form planned the dense
        truth engine twice (metric-tail self-join) and a third bm25
        scan (df broadcast subtree); this pins both fixes."""
        import __spark_entry__ as entrymod

        df = entrymod.q_retrieval_eval_suite(spark, sf_small)
        plan = df._jdf.queryExecution().executedPlan().toString()
        final = plan.split("Initial Plan")[0]
        assert "SortMergeJoin" not in final
        assert "CartesianProduct" not in final
        assert final.count("Scan parquet") <= 3, (
            "eval suite exceeded its 3-corpus-scan budget — a metric-"
            "tail self-join or an engine-side duplicated subtree is back"
        )

    def test_retrieval_metrics_reads_truth_once(self, spark):
        """The union metric form consumes each input exactly once: a
        truth frame tagged with a one-row side branch appears in the
        plan a single time (the old nrel/stats left-join form planned
        the whole truth subtree twice)."""
        from faiss_vector_search_spark.operators import evaluate

        results = spark.createDataFrame(
            [("q1", 10, 1), ("q1", 11, 2)],
            "query_tag string, doc_id long, rank int")
        truth = spark.createDataFrame(
            [("q1", 10), ("q1", 12)], "query_tag string, doc_id long")
        df = evaluate.retrieval_metrics_by_query(results, truth, k=10)
        final = df._jdf.queryExecution().executedPlan().toString().split(
            "Initial Plan")[0]
        assert "SortMergeJoin" not in final and "Join" not in final, (
            "the union metric form has no joins at all"
        )

    def test_text_search_is_join_free(self, spark, sf_small):
        """Live gate for the literal-map engine: the single-query
        retrieval plan carries no join at all — the query rides the
        plan as a literal map, the corpus aggregates once."""
        from faiss_vector_search_spark.operators import embed

        docs = fio.load_table(spark, sf_small, "documents")
        plan = plan_of(embed.text_search(docs, "batch window vector", k=5),
                       "simple")
        assert "Join" not in plan
        assert "TakeOrderedAndProject" in plan
