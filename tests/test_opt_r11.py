"""Round-11 optimization gates: every engine/plan rewrite this round
must produce BYTE-IDENTICAL output to the form it replaced. These
tests pin that equality on the sf0.001 fixtures plus adversarial
inputs, so a future edit cannot silently trade correctness for speed.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from faiss_vector_search_spark import io as fio

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return fio.load_table(spark, SF, "documents")


@pytest.fixture(scope="module")
def emb(spark):
    return fio.load_table(spark, SF, "embeddings")


class TestSparkXxhash64Replica:
    """functions/xxh.py must equal F.xxhash64 bit-for-bit — the
    foundation under the vectorized winnow engine."""

    CASES = [
        "", "x", "abcdefgh", "sevench", "12345678",
        "abcdefghijklmnopqrstuvwxyz0123456789ABCDEF",
        "exactly32bytes_exactly32bytes_32",
        "ünïcødé-grams", "emoji \U0001f600 tail", "a" * 100,
    ]

    def test_matches_spark_expression(self, spark):
        from faiss_vector_search_spark.functions.xxh import (
            spark_xxhash64_str,
        )

        df = spark.createDataFrame([(s,) for s in self.CASES], "s string")
        rows = df.select(
            "s",
            F.xxhash64("s", F.lit(11)).alias("h11"),
            F.xxhash64("s", F.lit(0)).alias("h0"),
        ).collect()
        for r in rows:
            assert spark_xxhash64_str(r.s, 11) == r.h11, repr(r.s)
            assert spark_xxhash64_str(r.s, 0) == r.h0, repr(r.s)

    def test_vectorized_fixed_matches_reference(self):
        import numpy as np

        from faiss_vector_search_spark.functions.xxh import (
            xxh64_bytes,
            xxh64_fixed_np,
            xxh64_int_chain,
            xxh64_int_chain_np,
        )

        data = b"the quick brown fox jumps over the lazy dog 0123456789"
        for k in (1, 3, 4, 5, 8, 11, 16, 31):
            arr = np.frombuffer(data, dtype=np.uint8)
            grams = np.lib.stride_tricks.sliding_window_view(arr, k)
            h1 = xxh64_fixed_np(grams, 42)
            want = [
                xxh64_bytes(data[i:i + k], 42)
                for i in range(len(data) - k + 1)
            ]
            assert [int(x) for x in h1] == want, f"k={k}"
            chained = xxh64_int_chain_np(h1, 11)
            want2 = [xxh64_int_chain(h, 11) for h in want]
            assert [int(x) for x in chained] == want2, f"k={k} chain"


class TestWinnowArrowXxEngine:
    """winnow_fp_sets_arrow_xx == the SQL xxhash64 winnow, as SETS per
    doc, on the corpus fixture and adversarial shapes."""

    def _sets(self, df):
        return {
            r[0]: sorted(set(r[1])) if r[1] is not None else []
            for r in df.collect()
        }

    def test_corpus_fingerprints_identical(self, spark, docs):
        from faiss_vector_search_spark.operators import textstats

        a = self._sets(
            textstats.winnow_fp_sets(docs, 8, 4, "doc_id", "text", "xxhash64")
        )
        b = self._sets(
            textstats.winnow_fp_sets_arrow_xx(docs, 8, 4, "doc_id", "text")
        )
        assert a == b

    def test_adversarial_shapes(self, spark):
        from faiss_vector_search_spark.operators import textstats

        adv = [
            (1, None), (2, ""), (3, "short"), (4, "x" * 7), (5, "x" * 8),
            (6, "ünïcødé gräms ünïcødé gräms and more of them here"),
            (7, "mixed ascii then ünïcødé tail"), (8, "a" * 300),
        ]
        df = spark.createDataFrame(adv, "doc_id long, text string")
        from_sql = self._sets(
            textstats.winnow_fp_sets(df, 8, 4, "doc_id", "text", "xxhash64")
        )
        from_arrow = self._sets(
            textstats.winnow_fp_sets_arrow_xx(df, 8, 4, "doc_id", "text")
        )
        assert from_sql == from_arrow

    def test_overlap_search_engines_equal(self, spark, docs):
        from faiss_vector_search_spark.operators import textstats

        kw = dict(query_doc_id=7, gram=8, w=4, min_shared=2,
                  hash_fn="xxhash64")
        a = [tuple(r) for r in textstats.fingerprint_overlap_search(
            docs, engine="sql", **kw).collect()]
        b = [tuple(r) for r in textstats.fingerprint_overlap_search(
            docs, engine="arrow", **kw).collect()]
        assert a == b and len(a) > 0

    def test_arrow_rejects_md5(self, docs):
        from faiss_vector_search_spark.operators import textstats

        with pytest.raises(ValueError, match="oracle profile"):
            textstats.fingerprint_overlap_search(
                docs, query_doc_id=7, hash_fn="md5", engine="arrow"
            )


class TestSpanWindowHashes:
    """The xxhash64 token-hash-combine window hasher must find the
    same spans as the string-gram form it replaced."""

    def test_repeated_spans_same_as_string_grams(self, spark, docs):
        from faiss_vector_search_spark.functions.hashing import hashed
        from faiss_vector_search_spark.functions.text import (
            positional_windows,
            tokens,
        )
        from faiss_vector_search_spark.operators import dedup

        tokd = docs.select(
            F.col("doc_id"), tokens(F.col("text")).alias("_toks")
        ).where(F.size("_toks") >= 8)
        wins_str = tokd.select(
            F.col("doc_id"),
            F.explode(positional_windows(F.col("_toks"), 8)).alias("t"),
        ).select(
            F.col("doc_id"),
            F.col("t.pos").cast("bigint").alias("pos"),
            hashed(F.col("t.gram"), seed=0, hash_fn="xxhash64").alias("gh"),
        )
        rep = (wins_str.groupBy("gh").agg(F.count("*").alias("c"))
               .where("c >= 2").select("gh"))
        want = sorted(
            map(tuple, wins_str.join(rep, "gh")
                .select("doc_id", "pos").collect())
        )
        got_wins = dedup._span_window_hashes(
            docs.select(
                F.col("doc_id"), tokens(F.col("text")).alias("_toks")
            ).where(F.size("_toks") >= 8),
            8, "doc_id", "xxhash64",
        )
        rep2 = (got_wins.groupBy("gh").agg(F.count("*").alias("c"))
                .where("c >= 2").select("gh"))
        got = sorted(
            map(tuple, got_wins.join(rep2, "gh")
                .select("doc_id", "pos").collect())
        )
        assert want == got and len(got) > 0


class TestPcaAssignArrow:
    """pca_ivf_search engine='arrow' (fused BLAS project+assign) must
    return the same rows as the declarative engine."""

    def test_engines_equal_full_and_partial_probe(self, spark, emb):
        from faiss_vector_search_spark.operators import transform

        q = emb.where(F.col("vec_id") == 0).select(
            F.col("embedding").alias("query_vec")
        )
        for nprobe, shortlist in ((16, 100), (4, 50)):
            a = [tuple(r) for r in transform.pca_ivf_search(
                emb, q, out_dim=16, nlist=16, nprobe=nprobe, k=10,
                shortlist=shortlist, engine="sql").collect()]
            b = [tuple(r) for r in transform.pca_ivf_search(
                emb, q, out_dim=16, nlist=16, nprobe=nprobe, k=10,
                shortlist=shortlist, engine="arrow").collect()]
            assert a == b and len(a) == 10


class TestTermMatchInSet:
    """The IN-list term match must select exactly the docs/terms the
    array_contains form selected (BM25 scores are downstream of the
    match set, so score equality covers it)."""

    def test_bm25_multi_matches_single(self, spark, docs):
        from faiss_vector_search_spark.operators import lexical

        queries = [("a", "batch window vector"), ("b", "hash fast stream")]
        multi = lexical.bm25_search_multi(docs, queries, k=10)
        for tag, qtext in queries:
            single = [
                (r["doc_id"], r["score"])
                for r in lexical.bm25_search(docs, qtext, k=10).collect()
            ]
            got = [
                (r["doc_id"], r["score"])
                for r in multi.where(F.col("query_tag") == tag)
                .orderBy("rank").collect()
            ]
            assert single == got


class TestRepetitionRunLength:
    """The sorted-run top-token count must equal the per-distinct
    membership-scan count it replaced (same integers => same rounded
    ratios)."""

    def test_matches_quadratic_form(self, spark, docs):
        from faiss_vector_search_spark.functions.text import tokens
        from faiss_vector_search_spark.operators import textstats

        toks = tokens(F.col("text"))
        base = docs.select(F.col("doc_id"), toks.alias("toks")).where(
            F.size("toks") >= 3
        )
        dist = F.array_distinct(F.col("toks"))
        quad = base.select(
            "doc_id",
            F.array_max(
                F.transform(
                    dist,
                    lambda d: F.size(
                        F.filter(F.col("toks"), lambda t: t == d)
                    ),
                )
            ).alias("top_cnt"),
        )
        want = {r["doc_id"]: r["top_cnt"] for r in quad.collect()}
        got = {
            r["doc_id"]: round(r["top_token_ratio"] * r["n_tokens"])
            for r in textstats.repetition_score(docs).collect()
        }
        assert want == got and len(got) > 0

    def test_degenerate_runs(self, spark):
        from faiss_vector_search_spark.operators import textstats

        df = spark.createDataFrame(
            [(1, "a a a a a"), (2, "a b c a b a"), (3, "x y z")],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in textstats.repetition_score(df).collect()}
        assert out[1]["top_token_ratio"] == 1.0
        assert out[2]["top_token_ratio"] == 0.5
        assert round(out[3]["top_token_ratio"], 6) == round(1 / 3, 6)


class TestCcnetExtraCols:
    """ccnet_buckets' domain now rides the LM aggregation instead of a
    corpus-vs-corpus id join — rows must match the join form."""

    def test_matches_join_form(self, spark, docs):
        from pyspark.sql import Window

        from faiss_vector_search_spark.operators import lm, textstats

        model = lm.bigram_lm_train(docs)
        fl = lm.bigram_lm_score(docs, model)
        j = docs.select("doc_id", "source").join(fl, on="doc_id")
        w = Window.partitionBy("source").orderBy(
            F.col("fluency").desc(), F.col("doc_id").asc()
        )
        tl = F.ntile(3).over(w)
        want = sorted(map(tuple, j.select(
            F.col("doc_id"), F.col("source"), F.col("fluency"),
            tl.cast("int").alias("tercile"),
            F.when(tl == 1, "head").when(tl == 2, "middle")
            .otherwise("tail").alias("bucket"),
        ).collect()))
        got = sorted(map(tuple, textstats.ccnet_buckets(docs).collect()))
        assert want == got and len(got) > 0


class TestGramHashPairs:
    """The decontamination family's token-hash-combined gram pairs
    must select the same (doc, gram) identity as the string-shingle
    form they replaced on the xxhash64 profile."""

    def test_decontaminate_matches_string_shingles(self, spark, docs):
        from faiss_vector_search_spark.functions.hashing import hashed
        from faiss_vector_search_spark.operators import dedup

        bench = docs.where(F.col("doc_id") % 20 == 7).select(
            "doc_id", "text"
        )

        def old_grams(df, out_id, n=8):
            sh = dedup._shingle_sets(df, n, "doc_id", "text")
            return sh.select(
                F.col("doc_id").alias(out_id),
                F.explode_outer(F.col("shingles")).alias("_g"),
            ).select(
                out_id,
                hashed(F.col("_g"), seed=17, hash_fn="xxhash64").alias("g"),
            )

        cg = old_grams(docs, "c_id")
        bg = old_grams(bench, "b_id").distinct()
        want = sorted(map(tuple, (
            cg.join(F.broadcast(bg), "g")
            .groupBy(F.col("c_id").alias("doc_id"))
            .agg(
                F.count_distinct("g").alias("n_shared_grams"),
                F.count_distinct("b_id").alias("n_benchmark_docs"),
            )
        ).collect()))
        got = sorted(map(tuple, dedup.decontaminate(
            docs, bench, n=8, hash_fn="xxhash64").collect()))
        assert want == got and len(got) > 0


class TestTfidfWindowDf:
    """tfidf's df-as-window must equal the former df-aggregation+join
    form."""

    def test_window_df_values(self, spark, docs):
        from pyspark.sql import Window

        from faiss_vector_search_spark.functions.text import tokens
        from faiss_vector_search_spark.operators import lexical

        toks = docs.select(
            F.col("doc_id"),
            F.explode_outer(tokens(F.col("text"))).alias("term"),
        ).where(F.col("term").isNotNull())
        tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
        dfr = tf.groupBy("term").agg(F.count("*").alias("df"))
        n_docs = docs.select(F.count("*").cast("double").alias("n_docs"))
        scored = tf.join(dfr, "term").crossJoin(F.broadcast(n_docs)).select(
            F.col("doc_id"), "term", "tf",
            F.round(
                F.col("tf")
                * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)), 6
            ).alias("tfidf"),
        )
        w = Window.partitionBy("doc_id").orderBy(
            F.col("tfidf").desc(), F.col("term").asc()
        )
        want = sorted(map(tuple, scored.withColumn(
            "rk", F.row_number().over(w)).where("rk <= 5").select(
            "doc_id", "term", "tf", "tfidf",
            F.col("rk").cast("int").alias("rk")).collect()))
        got = sorted(map(tuple, lexical.tfidf_topk_terms(
            docs, k=5).collect()))
        assert want == got and len(got) > 0


class TestLshStreamedVerify:
    """The bucket-sorted mapInPandas verify must emit exactly the
    applyInPandas-era pair set — including when an Arrow batch
    boundary SPLITS a (table, bucket) group (forced here by a tiny
    maxRecordsPerBatch)."""

    def test_pair_set_equal_under_batch_splits(self, spark, emb):
        from faiss_vector_search_spark.operators import lsh

        key = "spark.sql.execution.arrow.maxRecordsPerBatch"
        old = spark.conf.get(key, None)
        spark.conf.set(key, "7")  # groups of ~10+ rows must span batches
        try:
            a = sorted(map(tuple, lsh.near_dup_lsh(
                emb, threshold=0.45, dim=64, n_bits=4,
                engine="sql").collect()))
            b = sorted(map(tuple, lsh.near_dup_lsh(
                emb, threshold=0.45, dim=64, n_bits=4,
                engine="arrow").collect()))
        finally:
            if old is not None:
                spark.conf.set(key, old)
            else:
                spark.conf.unset(key)
        assert a == b and len(b) > 0


class TestRerankSinglePlanEntry:
    """model_rerank / cross_encoder_rerank keep their output contract
    after the stage-1 single-plan-entry restructure."""

    def test_model_rerank_rows(self, spark, docs):
        from faiss_vector_search_spark.operators import rerank

        out = rerank.model_rerank(
            docs, "batch window vector hash fast stream", k=5, shortlist=20
        ).collect()
        assert [r["rank"] for r in out] == list(range(1, len(out) + 1))
        assert all(r["score_stage1"] is not None for r in out)
        scores = [r["score_model"] for r in out]
        assert scores == sorted(scores, reverse=True)

    def test_cross_rerank_rows(self, spark, docs):
        from faiss_vector_search_spark.operators import rerank

        out = rerank.cross_encoder_rerank(
            docs, "batch window vector hash fast stream", k=5, shortlist=20
        ).collect()
        assert [r["rank"] for r in out] == list(range(1, len(out) + 1))
        assert all(r["score_stage1"] is not None for r in out)
