"""Degenerate-input gates: every operator must behave sanely on an
empty corpus and on a single row — the failure modes that surface in
production as a partition with no data or a filter that matched
nothing, not in happy-path benchmarks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from faiss_vector_search_spark.operators import (
    analytics,
    chunking,
    dedup,
    embed,
    index_store,
    knn,
    lsh,
    textstats,
)

DOC_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"
EMB_SCHEMA = "vec_id bigint, embedding array<float>, label int"


@pytest.fixture(scope="module")
def empty_docs(spark):
    return spark.createDataFrame([], DOC_SCHEMA)


@pytest.fixture(scope="module")
def one_doc(spark):
    return spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog", "en", "t", 43)],
        DOC_SCHEMA,
    )


@pytest.fixture(scope="module")
def empty_emb(spark):
    return spark.createDataFrame([], EMB_SCHEMA)


@pytest.fixture(scope="module")
def one_emb(spark):
    v = [1.0] + [0.0] * 63
    return spark.createDataFrame([(1, v, 0)], EMB_SCHEMA)


class TestEmptyCorpus:
    def test_text_ops(self, empty_docs):
        assert dedup.exact_dedup(empty_docs).count() == 0
        assert dedup.minhash_lsh_pairs(empty_docs, hash_fn="xxhash64").count() == 0
        assert dedup.simhash_pairs(empty_docs, hash_fn="xxhash64").count() == 0
        assert textstats.lang_id(empty_docs).count() == 0
        assert textstats.token_count(empty_docs).count() == 0
        assert textstats.winnow_fingerprints(empty_docs, hash_fn="xxhash64").count() == 0
        assert chunking.chunk_fixed(empty_docs).count() == 0
        assert chunking.chunk_greedy(empty_docs).count() == 0
        assert chunking.pack_sequences(empty_docs, n_shards=2).count() == 0
        assert textstats.stratified_sample(empty_docs, 0.5).count() == 0

    def test_vector_ops(self, spark, empty_emb, one_emb):
        q = one_emb.select(F.col("embedding").alias("query_vec"))
        assert knn.topk(empty_emb, q, k=5).count() == 0
        assert knn.dynamic_threshold_search(empty_emb, q).count() == 0
        assert lsh.near_dup_lsh(empty_emb, dim=64).count() == 0
        assert index_store.add_vectors(empty_emb, one_emb).count() == 1
        stats = index_store.index_stats(empty_emb).first()
        assert stats.num_documents == 0


class TestSingleRow:
    def test_self_search_returns_self(self, one_emb):
        q = one_emb.select(F.col("embedding").alias("query_vec"))
        rows = knn.topk(one_emb, q, k=5, metric="ip").collect()
        assert len(rows) == 1 and rows[0].vec_id == 1
        assert abs(rows[0].score - 1.0) < 1e-9

    def test_no_self_pairs(self, one_doc, one_emb):
        assert dedup.minhash_lsh_pairs(one_doc, hash_fn="xxhash64").count() == 0
        assert dedup.simhash_pairs(one_doc, hash_fn="xxhash64").count() == 0
        assert lsh.near_dup_lsh(one_emb, dim=64).count() == 0

    def test_text_ops_single(self, one_doc):
        assert textstats.lang_id(one_doc).first().pred_lang == "en"
        tc = textstats.token_count(one_doc).first()
        assert tc.ws_tokens == 9
        packed = chunking.pack_sequences(one_doc, max_tokens=4, n_shards=2)
        row = packed.first()  # oversized doc still gets its own bin
        assert row.n_docs == 1 and row.total_tokens == 9

    def test_embed_single(self, one_doc):
        out = embed.embed_documents(one_doc, dim=16).first()
        assert len(out.embedding) == 16
        n2 = sum(x * x for x in out.embedding)
        assert abs(n2 - 1.0) < 1e-9


class TestNullText:
    def test_null_text_rows_do_not_crash(self, spark):
        docs = spark.createDataFrame(
            [(1, None, "en", "t", 0), (2, "real text here", "en", "t", 14)],
            DOC_SCHEMA,
        )
        assert dedup.exact_dedup(docs).count() >= 1
        assert chunking.chunk_greedy(docs).count() >= 1
        assert textstats.token_count(docs).count() == 2


class TestSimhashEngines:
    """The two candidate-enumeration engines are EXACT twins: the
    combinatorial (Manku WWW'07) tables must yield byte-identical
    pairs to the pigeonhole bands at every hamming dial."""

    def test_engines_identical_output(self, spark, sf_small):
        from faiss_vector_search_spark.io import load_table
        from faiss_vector_search_spark.operators import dedup

        docs = load_table(spark, sf_small, "documents")
        for mh in (1, 3):
            a = sorted(map(tuple, dedup.simhash_pairs(
                docs, max_hamming=mh, engine="pigeonhole",
                hash_fn="xxhash64").collect()))
            b = sorted(map(tuple, dedup.simhash_pairs(
                docs, max_hamming=mh, engine="combinatorial",
                hash_fn="xxhash64").collect()))
            assert a == b, mh
            if mh == 3:
                assert a  # non-degenerate gate: the corpus has pairs

    def test_engine_param_validation(self, spark):
        from faiss_vector_search_spark.operators import dedup

        docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
        import pytest as _pytest
        with _pytest.raises(ValueError, match="max_hamming < blocks"):
            dedup.simhash_pairs(docs, max_hamming=6, engine="combinatorial")
        with _pytest.raises(ValueError, match="max_hamming < bands"):
            dedup.simhash_pairs(docs, max_hamming=4, engine="pigeonhole")
        with _pytest.raises(ValueError, match="unknown simhash_pairs"):
            dedup.simhash_pairs(docs, engine="grams")
