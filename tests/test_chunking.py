"""Invariant gates for the greedy / conversational chunkers
(SURVEY.md §2a #13/#15, reference chunk_text_files.py:85-273 behavior):
size bounds, content coverage, overlap, turn integrity. These are the
rows-only checks standing in for a SQL oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from faiss_vector_search_spark import io as fio
from faiss_vector_search_spark.operators import chunking

MIN, MAX, OVERLAP = 500, 2000, 100


def _mk_paragraphs(n: int, size: int) -> str:
    return "\n\n".join(
        f"para{i:03d} " + ("word " * ((size - 8) // 5)).strip() for i in range(n)
    )


def _mk_sentences(n: int, size: int) -> str:
    return " ".join(
        f"Sentence {i:03d} " + ("w " * ((size - 16) // 2)).strip() + "."
        for i in range(n)
    )


class TestGreedyUnit:
    def test_size_bounds(self):
        text = _mk_paragraphs(20, 300)
        chunks = chunking._greedy_chunks(text, MIN, MAX, OVERLAP)
        assert len(chunks) > 1
        for ch in chunks:
            assert len(ch) <= MAX
        for ch in chunks[:-1]:
            assert len(ch) >= MIN

    def test_coverage_all_paragraphs_present(self):
        text = _mk_paragraphs(20, 300)
        joined = "".join(chunking._greedy_chunks(text, MIN, MAX, OVERLAP))
        for i in range(20):
            assert f"para{i:03d}" in joined

    def test_overlap_carried(self):
        text = _mk_paragraphs(20, 300)
        chunks = chunking._greedy_chunks(text, MIN, MAX, OVERLAP)
        for prev, nxt in zip(chunks, chunks[1:]):
            assert nxt[:OVERLAP] in prev

    def test_oversized_paragraph_sentence_split(self):
        text = _mk_sentences(30, 200)  # one 6000-char "paragraph"
        chunks = chunking._greedy_chunks(text, MIN, MAX, OVERLAP)
        assert len(chunks) > 1
        assert all(len(ch) <= MAX for ch in chunks)

    def test_empty_and_tiny(self):
        assert chunking._greedy_chunks("", MIN, MAX, OVERLAP) == []
        assert chunking._greedy_chunks("tiny", MIN, MAX, OVERLAP) == ["tiny"]


class TestConversationalUnit:
    TEXT = "\n\n".join(
        f"{'K' if i % 2 == 0 else 'V'}: turn {i:03d} " + "blah " * 60
        for i in range(16)
    )

    def test_turn_integrity(self):
        chunks = chunking._conversational_chunks(self.TEXT, MIN, MAX)
        assert len(chunks) > 1
        for ch in chunks:
            assert ch.startswith(("K:", "V:"))
        joined = "".join(chunks)
        for i in range(16):
            assert f"turn {i:03d}" in joined

    def test_overlap_turn_shared(self):
        chunks = chunking._conversational_chunks(self.TEXT, MIN, MAX)
        for prev, nxt in zip(chunks, chunks[1:]):
            first_turn = nxt.split("\n\n")[0]
            assert first_turn in prev

    def test_size_bounds(self):
        chunks = chunking._conversational_chunks(self.TEXT, MIN, MAX)
        for ch in chunks[:-1]:
            assert MIN <= len(ch) <= MAX


class TestOperator:
    @pytest.fixture(scope="class")
    def chunked(self, spark, sf_small):
        docs = fio.load_table(spark, sf_small, "documents")
        return chunking.chunk_greedy(
            docs, min_size=100, max_size=250, overlap=20
        ).cache()

    def test_every_doc_chunked(self, spark, sf_small, chunked):
        docs = fio.load_table(spark, sf_small, "documents")
        n_docs = docs.where(F.length("text") > 0).count()
        assert chunked.select("doc_id").distinct().count() == n_docs

    def test_chunk_ids_contiguous_and_starts_monotone(self, chunked):
        bad = chunked.groupBy("doc_id").agg(
            F.count("*").alias("n"),
            F.max("chunk_id").alias("mx"),
            F.min("chunk_id").alias("mn"),
            (
                F.array_sort(F.collect_list(F.struct("chunk_id", "start")))
            ).alias("seq"),
        ).where(
            (F.col("mn") != 0)
            | (F.col("mx") != F.col("n") - 1)
            | F.exists(
                F.zip_with(
                    F.col("seq"),
                    F.slice(F.col("seq"), 2, 1_000_000),
                    lambda a, b: b["start"] <= a["start"],
                ),
                lambda x: x,
            )
        )
        assert bad.count() == 0

    def test_no_empty_chunks(self, chunked):
        assert chunked.where(F.length("chunk") == 0).count() == 0

    def test_short_doc_round_trips(self, spark, sf_small, chunked):
        """Docs that fit in one chunk come back verbatim."""
        docs = fio.load_table(spark, sf_small, "documents")
        small = docs.where(F.length("text") <= 250).select("doc_id", "text")
        joined = small.join(chunked, "doc_id").where(
            F.col("chunk") != F.col("text")
        )
        assert joined.count() == 0


class TestPackSequences:
    BUDGET = 60

    @pytest.fixture(scope="class")
    def packed(self, spark, sf_small):
        docs = fio.load_table(spark, sf_small, "documents")
        return chunking.pack_sequences(
            docs, max_tokens=self.BUDGET, n_shards=8
        ).cache()

    def test_every_doc_packed_exactly_once(self, spark, sf_small, packed):
        docs = fio.load_table(spark, sf_small, "documents")
        packed_ids = packed.select(
            F.explode("doc_ids").alias("doc_id")
        )
        assert packed_ids.count() == docs.count()
        assert packed_ids.distinct().count() == docs.count()

    def test_budget_respected_or_singleton(self, packed):
        bad = packed.where(
            (F.col("total_tokens") > self.BUDGET) & (F.col("n_docs") > 1)
        )
        assert bad.count() == 0

    def test_bins_reasonably_full(self, spark, sf_small, packed):
        """Packing must beat one-doc-per-bin by a wide margin: mean
        fill ≥ 60% of budget for multi-doc-capable corpora."""
        from pyspark.sql.functions import avg, col
        stats = packed.where(col("total_tokens") <= self.BUDGET).agg(
            avg("total_tokens").alias("mean_fill")
        ).first()
        assert stats.mean_fill >= 0.6 * self.BUDGET

    def test_bin_ids_unique(self, packed):
        assert packed.count() == packed.select("bin_id").distinct().count()


class TestGreedyOracleFidelity:
    """The chunk_documents_greedy DuckDB oracle must replay the Python
    fold exactly — including the paragraph-packing, overlap-carry,
    trailing-merge, and sentence-split branches the gated corpus
    (plain token streams) never exercises."""

    TEXTS = [
        (1, "Sentence one is here. Sentence two follows! A third one? " * 8),
        (2, "Para one with some words here to make it long enough for a chunk maybe.\n\n"
            "Para two also has plenty of words to push the combined size over limits.\n\n"
            "Para three continues with more text so the fold has to emit and carry overlap.\n\n"
            "Para four is the last paragraph and it is reasonably sized too."),
        (3, "short"),
        (4, "A long single sentence without breaks that just keeps going and going " * 6),
        (5, "Tiny para.\n\n" + ("Big paragraph with lots of words. " * 12) + "\n\nEnd."),
        (6, "  "),
        (7, "Mix. " * 30 + "\n\n" + "Second block? With questions! And more. " * 10),
    ]

    def test_oracle_matches_python_fold_on_structured_text(self):
        import duckdb
        import pandas as pd

        import __spark_entry__ as entrymod

        pdf = pd.DataFrame(self.TEXTS, columns=["doc_id", "text"])
        con = duckdb.connect()
        con.register("documents", pdf)
        got = (
            con.sql(entrymod.oracle_sql()["chunk_documents_greedy"])
            .df()
            .sort_values(["doc_id", "chunk_id"])
            .reset_index(drop=True)
        )
        rows = []
        for doc_id, text in self.TEXTS:
            pos = 0
            for i, ch in enumerate(chunking._greedy_chunks(text, 100, 250, 20)):
                rows.append((doc_id, i, pos, ch))
                pos += len(ch)
        want = pd.DataFrame(rows, columns=["doc_id", "chunk_id", "start", "chunk"])
        got = got.astype({"chunk_id": "int64", "start": "int64"})
        want = want.astype({"chunk_id": "int64", "start": "int64"})
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_pack_oracle_is_first_fit_decreasing(self):
        """Replay the pack_sequences oracle on a tiny synthetic corpus
        and check it against a literal Python FFD."""
        import duckdb
        import pandas as pd

        import __spark_entry__ as entrymod
        from faiss_vector_search_spark.functions import hashing  # noqa: F401

        import hashlib

        texts = [(i, "tok " * (5 + (i * 37) % 200)) for i in range(40)]
        pdf = pd.DataFrame(texts, columns=["doc_id", "text"])
        con = duckdb.connect()
        con.register("documents", pdf)
        got = (
            con.sql(entrymod.oracle_sql()["pack_sequences"])
            .df()
            .sort_values("bin_id")
            .reset_index(drop=True)
        )

        def md5i(s):
            return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

        shards = {}
        for doc_id, text in texts:
            n = len(text.split())
            shards.setdefault(md5i(f"s21:{doc_id}") % 8, []).append((doc_id, n))
        rows = []
        for shard, items in shards.items():
            items.sort(key=lambda x: (-x[1], x[0]))
            bins = []
            for doc_id, n in items:
                for b in bins:
                    if n <= b[1]:
                        b[0].append(doc_id)
                        b[1] -= n
                        break
                else:
                    bins.append([[doc_id], max(256 - n, 0), n])
            tok = dict(items)
            for i, b in enumerate(bins):
                rows.append(((shard << 40) + i, sum(tok[d] for d in b[0]), len(b[0])))
        want = (
            pd.DataFrame(rows, columns=["bin_id", "total_tokens", "n_docs"])
            .sort_values("bin_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
