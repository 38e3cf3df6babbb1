"""Round-11 gates: bounded streaming replay stores (r10 verdict ask
#3), the clamped-logit calibration grid + decile balance (r10 ADVICE),
the is_macro disambiguator (r10 ADVICE), and NULL-text training-shard
accounting (r10 ADVICE)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from faiss_vector_search_spark import io as fio
from faiss_vector_search_spark.streaming import streams


class TestReplaySliceBounds:
    """The replay guard must PRUNE the store scan to the horizon's
    partitions — the whole point of the r11 rework: guard cost flat
    over stream lifetime, not O(history)."""

    @pytest.fixture()
    def store(self, spark, tmp_path):
        path = str(tmp_path / "alerts")
        for b in range(6):
            (
                spark.range(b * 10, b * 10 + 10)
                .select(
                    F.col("id").alias("doc_id"),
                    F.lit(f"q{b}").alias("query_id"),
                    F.lit(b).alias("_ingest_batch"),
                )
                .write.mode("append")
                .partitionBy("_ingest_batch")
                .parquet(path)
            )
        return path

    def test_slice_prunes_partitions(self, spark, store):
        sliced = streams.replay_slice(spark, store, batch_id=5, horizon=2)
        plan = sliced._jdf.queryExecution().executedPlan().toString()
        # the horizon predicate reaches the parquet source as a
        # partition filter — the store scan prunes, it doesn't read
        assert "PartitionFilters" in plan
        assert "_ingest_batch" in plan.split("PartitionFilters")[1][:200]
        # and the pruned read returns exactly the horizon's batches
        got = {r["_ingest_batch"] for r in sliced.collect()}
        assert got == {3, 4, 5}

    def test_slice_no_horizon_reads_all(self, spark, store):
        sliced = streams.replay_slice(spark, store, batch_id=5, horizon=None)
        assert sliced.count() == 60

    def test_guard_is_bounded_not_whole_store(self, spark, store, tmp_path):
        """A redelivery WITHIN the horizon no-ops; one BEYOND the
        horizon is out of the guard's contract (documented bound) —
        proving the guard reads the slice, not the history."""
        inside = spark.createDataFrame(
            [(50, "q5")], "doc_id bigint, query_id string"
        )
        streams._append_guarded(
            spark, inside, store, 6, ["doc_id", "query_id"], 2
        )
        # doc 50 landed in batch 5 (inside horizon 6-2..6) -> no-op
        assert (
            spark.read.parquet(store)
            .where("doc_id = 50 and query_id = 'q5'")
            .count()
            == 1
        )
        beyond = spark.createDataFrame(
            [(0, "q0")], "doc_id bigint, query_id string"
        )
        streams._append_guarded(
            spark, beyond, store, 7, ["doc_id", "query_id"], 2
        )
        # doc 0 landed in batch 0 — outside horizon 5..7, so the
        # bounded guard does NOT see it (the documented contract:
        # horizon >= the upstream's redelivery window)
        assert (
            spark.read.parquet(store)
            .where("doc_id = 0 and query_id = 'q0'")
            .count()
            == 2
        )

    def test_guard_plans_no_broadcast_hint(self, spark, store):
        """The pre-r11 F.broadcast(seen) hint is gone: the guard join
        must leave the build side to AQE/planner choice so a grown
        slice can shuffle-join instead of hitting the 8 GB ceiling.
        Structural check: the logical plan carries no ResolvedHint."""
        batch = spark.createDataFrame(
            [(999, "qx")], "doc_id bigint, query_id string"
        )
        seen = streams.replay_slice(spark, store, 5, 2).select(
            "doc_id", "query_id"
        )
        joined = batch.join(seen, ["doc_id", "query_id"], "left_anti")
        assert "UnresolvedHint" not in joined._jdf.queryExecution().logical().toString()
        assert "ResolvedHint" not in joined._jdf.queryExecution().analyzed().toString()


class TestStreamingStoresLayout:
    """End-to-end: the reworked helpers write `_ingest_batch`
    partition directories (the layout the pruned guard needs) and
    keep their exactly-once contract (batch-twin equality is the
    standing test_streaming gate; this adds the layout proof)."""

    def test_percolate_store_is_batch_partitioned(
        self, spark, sf_small, tmp_path
    ):
        docs = fio.load_table(spark, sf_small, "documents")
        src = tmp_path / "docs_in"
        docs.where("doc_id < 250").coalesce(1).write.mode("append").parquet(
            str(src)
        )
        docs.where("doc_id >= 250").coalesce(1).write.mode("append").parquet(
            str(src)
        )
        out = tmp_path / "alerts"
        q = streams.streaming_percolate(
            spark,
            str(src),
            [("q_batch_window", "batch window")],
            str(out),
            checkpoint=str(tmp_path / "ckpt"),
        )
        q.awaitTermination()
        dirs = {p.name for p in out.iterdir() if p.is_dir()}
        assert {"_ingest_batch=0", "_ingest_batch=1"} <= dirs

    def test_curation_store_is_bucketed_and_join_is_exchange_free(
        self, spark, sf_small, tmp_path
    ):
        """The curated store persists as a BUCKETED table on
        text_hash (#174 posture): the guard anti-join plans with NO
        exchange on the store side — only the (small) batch side
        shuffles into the bucket layout."""
        import hashlib

        docs = fio.load_table(spark, sf_small, "documents")
        src = tmp_path / "docs_in"
        docs.coalesce(1).write.parquet(str(src))
        out = str(tmp_path / "curated")
        q = streams.streaming_curation_ingest(
            spark, str(src), out, checkpoint=str(tmp_path / "ckpt")
        )
        q.awaitTermination()
        table = "fvs_curated_" + hashlib.md5(out.encode()).hexdigest()[:12]
        assert spark.catalog.tableExists(table)
        try:
            thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            try:
                batch = docs.where("doc_id < 20").withColumn(
                    "text_hash", F.md5(F.col("text"))
                )
                seen = spark.table(table).select("text_hash")
                j = batch.join(seen, on="text_hash", how="left_anti")
                j.collect()
                plan = (
                    j._jdf.queryExecution().executedPlan().toString()
                    .split("== Initial Plan ==")[0]
                )
                assert "SortMergeJoin" in plan
                # the store scan carries its bucket spec...
                assert "Bucketed: true" in plan
                # ...and exactly ONE exchange exists: the batch side;
                # the bucketed store side reads pre-partitioned
                assert plan.count("Exchange") == 1
            finally:
                spark.conf.set(
                    "spark.sql.autoBroadcastJoinThreshold", thresh
                )
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {table}")


class TestCalibrationClampedGrid:
    """r10 ADVICE: the sigmoid grid saturated beyond |logit|~9 and
    collapsed a confident classifier's tails into single cells; the
    clamped raw-logit grid keeps uniform 1e-3 resolution, so deciles
    stay balanced on a saturated distribution."""

    def _report(self, spark, logits, edges):
        """Run the binning engines on a synthetic logit column by
        monkey-wiring score_quality_classifier's output shape."""
        from faiss_vector_search_spark.operators import classifier as clf

        triples = spark.createDataFrame(
            [(i, float(x), i % 2 == 0) for i, x in enumerate(logits)],
            "doc_id bigint, logit double, _rule_keep boolean",
        )
        # drive the binning tail directly: emulate the engine with the
        # same grid expression the operator uses
        import types

        model = clf.load_model()
        # full-path smoke happens in test_classifier; here we gate the
        # GRID's balance property via the public operator on real docs
        # below — this helper bins the synthetic logits the same way
        from pyspark.sql import Window

        n_bins = 10
        if edges == "approx":
            hist = triples.groupBy(
                F.round(
                    F.greatest(
                        F.lit(-20.0), F.least(F.lit(20.0), F.col("logit"))
                    ),
                    3,
                ).alias("_g")
            ).agg(F.count("*").alias("_n"))
            cw = Window.orderBy(F.col("_g").desc())
            tw = cw.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
            return (
                hist.select(
                    "_n",
                    F.least(
                        F.lit(n_bins),
                        F.ceil(
                            F.sum("_n").over(
                                cw.rowsBetween(Window.unboundedPreceding, 0)
                            )
                            * n_bins
                            / F.sum("_n").over(tw)
                        ),
                    ).cast("int").alias("decile"),
                )
                .groupBy("decile")
                .agg(F.sum("_n").alias("n_docs"))
                .collect()
            )
        raise ValueError(edges)

    def test_saturated_distribution_stays_balanced(self, spark):
        """A confident classifier: 40% of logits in the saturated
        tails (|logit| in 9..18, where the old sigmoid grid had ~1
        cell per tail). Every decile must stay within 2x of the ideal
        population — the old grid put 20%+ in one tail decile."""
        import random

        rng = random.Random(11)
        logits = (
            [rng.uniform(9.0, 18.0) for _ in range(200)]
            + [rng.uniform(-18.0, -9.0) for _ in range(200)]
            + [rng.uniform(-9.0, 9.0) for _ in range(600)]
        )
        rows = self._report(spark, logits, "approx")
        sizes = {r["decile"]: r["n_docs"] for r in rows}
        assert len(sizes) == 10
        assert max(sizes.values()) <= 2 * (len(logits) // 10)

    def test_operator_engines_agree_on_real_docs(self, spark, sf_small):
        """Exact (ntile) and approx (clamped-logit grid) engines
        produce the same decile POPULATIONS on the corpus (logits are
        near-unique at 1e-3, so grid ties don't bind here)."""
        from faiss_vector_search_spark.operators import classifier as clf

        docs = fio.load_table(spark, sf_small, "documents")
        model = clf.load_model()
        exact = {
            r["decile"]: (r["n_docs"], r["min_logit"])
            for r in clf.quality_calibration_report(
                docs, model, hash_fn="md5", edges="exact"
            ).collect()
        }
        approx = {
            r["decile"]: (r["n_docs"], r["min_logit"])
            for r in clf.quality_calibration_report(
                docs, model, hash_fn="md5", edges="approx"
            ).collect()
        }
        assert set(approx) == set(exact)
        for d in exact:
            # populations within one grid-tie of each other
            assert abs(approx[d][0] - exact[d][0]) <= 2, d


class TestMacroDisambiguator:
    def test_is_macro_flag_separates_rows_by_value(self, spark):
        """r10 ADVICE: the macro-average row is distinguishable from
        a real query tagged 'MACRO' by COLUMN VALUE, not row order."""
        from faiss_vector_search_spark.operators import evaluate as ev

        results = spark.createDataFrame(
            [("MACRO", 10, 1), ("MACRO", 11, 2), ("q2", 20, 1)],
            "query_tag string, doc_id long, rank int",
        )
        truth = spark.createDataFrame(
            [("MACRO", 10), ("q2", 20)], "query_tag string, doc_id long"
        )
        rows = ev.retrieval_metrics_by_query(results, truth, k=5).collect()
        assert "is_macro" in rows[0].asDict()
        by_key = {(r["query_tag"], r["is_macro"]): r for r in rows}
        assert set(by_key) == {
            ("MACRO", False), ("q2", False), ("MACRO", True),
        }
        assert by_key[("MACRO", False)]["n_relevant"] == 1
        assert by_key[("MACRO", True)]["n_relevant"] == 2


class TestTrainingShardsNullText:
    def test_null_text_counts_zero_tokens(self, spark, tmp_path):
        """r10 ADVICE: size(tokens(NULL)) is -1 under legacy
        sizeOfNull — the coalesce pins a NULL-text doc to 0 tokens in
        total, n_shards, and the manifest."""
        from faiss_vector_search_spark.operators import maintenance as mt

        docs = spark.createDataFrame(
            [(1, "alpha beta gamma"), (2, None), (3, "delta")],
            "doc_id bigint, text string",
        )
        manifest = mt.write_training_shards(
            docs, str(tmp_path / "sh"), token_budget=2, hash_fn="md5"
        )
        rows = manifest.collect()
        # 4 tokens total -> ceil(4/2) = 2 shards (a -1 for the NULL
        # doc would have made the total 3 -> 2 shards too, so also
        # check the per-shard sums: no shard may carry a negative or
        # NULL-skewed token count, and every doc lands exactly once
        assert sum(r["n_docs"] for r in rows) == 3
        assert sum(r["n_tokens"] for r in rows) == 4
        assert all(r["n_tokens"] >= 0 for r in rows)


class TestHeavyHittersLexicalTieBreak:
    """r10 verdict ask #7 promotion: tie_break='lexical' makes the
    sketch's top-k a TOTAL deterministic order, equal to the exact
    top-k whenever the sketch is exact."""

    def test_equals_exact_topk_under_same_tiebreak(self, spark, sf_small):
        from faiss_vector_search_spark.functions.text import tokens
        from faiss_vector_search_spark.operators import sketches

        docs = fio.load_table(spark, sf_small, "documents")
        got = [
            (r["bigram"], r["n"])
            for r in sketches.bigram_heavy_hitters(
                docs, k=20, tie_break="lexical"
            ).collect()
        ]
        staged = docs.select(tokens(F.col("text")).alias("_toks"))
        exact = (
            staged.select(
                F.explode(
                    F.transform(
                        F.slice(
                            F.col("_toks"), 1,
                            F.greatest(
                                F.size("_toks") - 1, F.lit(0)
                            ),
                        ),
                        lambda t, i: F.concat_ws(
                            " ", t, F.element_at(F.col("_toks"), i + 2)
                        ),
                    )
                ).alias("bigram")
            )
            .groupBy("bigram")
            .agg(F.count("*").alias("n"))
            .orderBy(F.col("n").desc(), F.col("bigram").asc())
            .limit(20)
            .collect()
        )
        assert got == [(r["bigram"], r["n"]) for r in exact]

    def test_boundary_tie_group_fits_overfetch(self, spark, sf_small):
        """The promotion's precondition, asserted on the corpus: every
        bigram tied with the rank-k count must fit inside the 2k
        over-fetch, else the lexical cut could differ from exact."""
        from faiss_vector_search_spark.functions.text import tokens

        docs = fio.load_table(spark, sf_small, "documents")
        staged = docs.select(tokens(F.col("text")).alias("_toks"))
        counts = (
            staged.select(
                F.explode(
                    F.transform(
                        F.slice(
                            F.col("_toks"), 1,
                            F.greatest(F.size("_toks") - 1, F.lit(0)),
                        ),
                        lambda t, i: F.concat_ws(
                            " ", t, F.element_at(F.col("_toks"), i + 2)
                        ),
                    )
                ).alias("bigram")
            )
            .groupBy("bigram")
            .agg(F.count("*").alias("n"))
            .orderBy(F.col("n").desc(), F.col("bigram").asc())
            .limit(60)
            .collect()
        )
        kth = counts[19]["n"]
        n_at_or_above = sum(1 for r in counts if r["n"] >= kth)
        assert n_at_or_above <= 40  # the 2k over-fetch covers the cut

    def test_sketch_tiebreak_unchanged_and_bad_value_raises(
        self, spark, sf_small
    ):
        import pytest as _pytest

        from faiss_vector_search_spark.operators import sketches

        docs = fio.load_table(spark, sf_small, "documents")
        assert sketches.bigram_heavy_hitters(docs, k=5).count() == 5
        with _pytest.raises(ValueError):
            sketches.bigram_heavy_hitters(docs, k=5, tie_break="x")


class TestPercolateJoinEngine:
    """r10 verdict ask #6: the broadcast-join term-frame variant for
    the 1k-10k standing-query regime — identical output to the
    literal-array form."""

    def test_engines_agree(self, spark, sf_small):
        from faiss_vector_search_spark.operators import lexical

        docs = fio.load_table(spark, sf_small, "documents")
        queries = [
            ("q_bw", "batch window"),
            ("q_vs", "vector stream"),
            ("q_hfb", "hash fast batch"),
        ]
        for msm in (1.0, 0.5):
            lit = {
                tuple(r)
                for r in lexical.percolate(
                    docs, queries, min_should_match=msm,
                    engine="literal",
                ).collect()
            }
            join = {
                tuple(r)
                for r in lexical.percolate(
                    docs, queries, min_should_match=msm, engine="join"
                ).collect()
            }
            assert lit == join

    def test_bad_engine_raises(self, spark, sf_small):
        from faiss_vector_search_spark.operators import lexical

        docs = fio.load_table(spark, sf_small, "documents")
        with pytest.raises(ValueError):
            lexical.percolate(docs, [("q", "a b")], engine="x")
