"""BPE tokenizer gates: lossless round-trip against the canonical
token stream, merge determinism, compression monotonicity, batch/
partitioning invariance, NULL handling."""

from __future__ import annotations

from pyspark.sql import functions as F

from faiss_vector_search_spark import io as fio
from faiss_vector_search_spark.functions.text import tokens
from faiss_vector_search_spark.operators import bpe


def test_roundtrip_and_counts(spark, sf_small):
    docs = fio.load_table(spark, sf_small, "documents").limit(300)
    merges = bpe.bpe_train(docs, num_merges=150)
    assert len(merges) > 0
    enc = {r.doc_id: r for r in bpe.bpe_encode(docs, merges).collect()}
    canon = {
        r.doc_id: " ".join(r.toks)
        for r in docs.select(
            "doc_id", tokens(F.col("text")).alias("toks")
        ).collect()
    }
    assert set(enc) == set(canon)
    total_pieces = total_words = 0
    for did, r in enc.items():
        assert bpe.bpe_decode_pieces(r.pieces) == canon[did]
        assert r.n_pieces == len(r.pieces)
        assert r.n_words == len(canon[did].split()) if canon[did] else True
        # merges only ever shrink the stream; floor is one piece/word
        assert r.n_words <= r.n_pieces
        total_pieces += r.n_pieces
        total_words += r.n_words
    # 150 merges on a tiny vocab must actually compress vs chars
    total_chars = sum(len(c.replace(" ", "")) for c in canon.values())
    assert total_pieces < total_chars


def test_merges_deterministic(spark, sf_small):
    docs = fio.load_table(spark, sf_small, "documents").limit(200)
    a = bpe.bpe_train(docs, num_merges=50)
    b = bpe.bpe_train(docs.repartition(7), num_merges=50)
    assert a == b


def test_encode_partitioning_invariant(spark, sf_small):
    docs = fio.load_table(spark, sf_small, "documents").limit(200)
    merges = bpe.bpe_train(docs, num_merges=50)
    one = sorted(
        (r.doc_id, tuple(r.pieces))
        for r in bpe.bpe_encode(docs.coalesce(1), merges).collect()
    )
    many = sorted(
        (r.doc_id, tuple(r.pieces))
        for r in bpe.bpe_encode(docs.repartition(13), merges).collect()
    )
    assert one == many


def test_null_and_empty_docs(spark):
    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "hello hello hello world")],
        "doc_id long, text string",
    )
    merges = bpe.bpe_train(docs, num_merges=20)
    enc = {r.doc_id: r for r in bpe.bpe_encode(docs, merges).collect()}
    assert enc[1].n_pieces == 0 and enc[1].n_words == 0
    assert enc[2].n_pieces == 0
    # "hello" repeats 3x -> it must have merged into few pieces
    assert enc[3].n_pieces < len("hellohellohelloworld") + 4


def test_frequent_words_become_single_pieces(spark):
    docs = spark.createDataFrame(
        [(i, "spark engine " * 20) for i in range(5)],
        "doc_id long, text string",
    )
    merges = bpe.bpe_train(docs, num_merges=40)
    enc = bpe.bpe_encode(docs, merges).first()
    # with 40 merges on a 2-word corpus both words fuse completely
    assert set(enc.pieces) == {"spark" + bpe.END, "engine" + bpe.END}
