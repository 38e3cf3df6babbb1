"""Property-based gates for the Column-level building blocks
(SURVEY.md §5.2): Spark's vector math must agree with numpy on
arbitrary inputs, hashing must be stable and well-distributed, and the
pure-Python chunker helpers must hold their invariants on adversarial
text. Hypothesis drives the input generation; Spark evaluation is
batched once per property (one createDataFrame per test, not per
example) to keep JVM round-trips off the hot path."""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from faiss_vector_search_spark.functions import vector as V
from faiss_vector_search_spark.operators import chunking

finite = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False, width=32
)
vec_pairs = st.integers(min_value=2, max_value=16).flatmap(
    lambda d: st.tuples(
        st.lists(finite, min_size=d, max_size=d),
        st.lists(finite, min_size=d, max_size=d),
    )
)


class TestVectorMathVsNumpy:
    """One batched Spark evaluation over a hypothesis-generated corpus
    of vector pairs, compared element-wise with numpy."""

    @pytest.fixture(scope="class")
    def cases(self, spark):
        pairs = []
        st_data = st.data()

        @settings(max_examples=60, deadline=None)
        @given(vec_pairs)
        def collect(pair):
            pairs.append(pair)

        collect()
        df = spark.createDataFrame(
            [(i, a, b) for i, (a, b) in enumerate(pairs)],
            "i int, a array<double>, b array<double>",
        )
        rows = df.select(
            "i",
            V.dot(F.col("a"), F.col("b")).alias("dot"),
            V.l2_sq(F.col("a"), F.col("b")).alias("l2sq"),
            V.norm(F.col("a")).alias("norm_a"),
            V.normalize(F.col("a")).alias("unit_a"),
        ).collect()
        return [(pairs[r.i], r) for r in rows]

    def test_dot_matches_numpy(self, cases):
        for (a, b), r in cases:
            want = float(np.dot(np.array(a), np.array(b)))
            assert math.isclose(r.dot, want, rel_tol=1e-9, abs_tol=1e-6)

    def test_l2sq_matches_numpy(self, cases):
        for (a, b), r in cases:
            d = np.array(a) - np.array(b)
            assert math.isclose(
                r.l2sq, float(np.dot(d, d)), rel_tol=1e-9, abs_tol=1e-6
            )

    def test_norm_nonnegative_and_matches(self, cases):
        for (a, _), r in cases:
            assert r.norm_a >= 0
            assert math.isclose(
                r.norm_a, float(np.linalg.norm(a)), rel_tol=1e-9, abs_tol=1e-6
            )

    def test_normalize_is_unit_or_zero_passthrough(self, cases):
        for (a, _), r in cases:
            n = float(np.linalg.norm(a))
            got = float(np.linalg.norm(r.unit_a))
            if n == 0.0:
                assert r.unit_a == a  # FAISS-style zero passthrough
            else:
                assert math.isclose(got, 1.0, rel_tol=1e-6, abs_tol=1e-6)


texts = st.text(
    alphabet=st.characters(
        codec="utf-8", categories=("L", "N", "P", "Z"), include_characters="\n"
    ),
    max_size=4000,
)


class TestGreedyChunkerProperties:
    @settings(max_examples=150, deadline=None)
    @given(texts)
    def test_never_crashes_and_bounds(self, text):
        chunks = chunking._greedy_chunks(text, 500, 2000, 100)
        if not text.strip():
            assert chunks == []
            return
        assert chunks
        for ch in chunks:
            # a chunk may exceed max only if it has no sentence split
            assert len(ch) <= 2000 or not chunking._split_sentences(ch)[1:]

    @settings(max_examples=150, deadline=None)
    @given(texts)
    def test_content_words_covered(self, text):
        """Every whitespace-delimited word of the input appears in the
        concatenation of chunks (no text is lost)."""
        chunks = chunking._greedy_chunks(text, 500, 2000, 100)
        joined = "\n\n".join(chunks)
        for w in text.split():
            assert w in joined

    @settings(max_examples=100, deadline=None)
    @given(texts)
    def test_conversational_never_crashes(self, text):
        marked = "K: " + text if text.strip() else text
        chunks = chunking._conversational_chunks(marked, 500, 2000)
        if marked.strip():
            assert chunks


class TestHashingProperties:
    @pytest.fixture(scope="class")
    def hashes(self, spark):
        from faiss_vector_search_spark.functions.hashing import hashed

        words = [f"w{i:05d}" for i in range(5000)]
        df = spark.createDataFrame([(w,) for w in words], "s string")
        rows = df.select(
            "s",
            hashed(F.col("s"), 0, "md5").alias("h_md5"),
            hashed(F.col("s"), 0, "xxhash64").alias("h_xx"),
            hashed(F.col("s"), 1, "md5").alias("h_md5_s1"),
        ).collect()
        return rows

    def test_deterministic_and_seed_sensitive(self, hashes):
        assert len({r.h_md5 for r in hashes}) == len(hashes)  # no collisions
        assert len({r.h_xx for r in hashes}) == len(hashes)
        diff = sum(r.h_md5 != r.h_md5_s1 for r in hashes)
        assert diff == len(hashes)  # seed changes every hash

    def test_bucket_uniformity(self, hashes):
        """pmod(h, 64) buckets should be near-uniform (chi-square
        heuristic: no bucket more than 2x the expected count)."""
        counts = [0] * 64
        for r in hashes:
            counts[r.h_md5 % 64] += 1
        expected = len(hashes) / 64
        assert max(counts) < 2 * expected
        assert min(counts) > expected / 2


class TestBinaryPackProperties:
    """binarize must reproduce the sign pattern of arbitrary vectors
    bit-for-bit (one batched Spark evaluation, python unpack check)."""

    def test_unpack_reproduces_sign_pattern(self, spark):
        from faiss_vector_search_spark.operators import binary

        vecs = []

        @settings(max_examples=50, deadline=None)
        @given(
            st.lists(finite, min_size=1, max_size=80)
        )
        def collect(v):
            vecs.append(v)

        collect()
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vecs)],
            "vec_id bigint, embedding array<double>",
        )
        got = {r.vec_id: r.code for r in binary.binarize(df).collect()}
        for i, v in enumerate(vecs):
            code = got[i]
            assert len(code) == (len(v) + 31) // 32
            bits = []
            for w, word in enumerate(code):
                lane = v[w * 32 : (w + 1) * 32]
                # MSB-first within each word, padded to lane length
                s = bin(word)[2:].zfill(len(lane))
                bits.extend(int(c) for c in s)
            assert bits == [1 if x > 0 else 0 for x in v]


class TestBloomProperties:
    """No false negatives for arbitrary key sets, any bitmap size."""

    def test_never_false_negative(self, spark):
        from faiss_vector_search_spark.functions import bloom

        key_sets = []

        @settings(max_examples=25, deadline=None)
        @given(st.sets(st.integers(min_value=-(2**40), max_value=2**40),
                       min_size=1, max_size=40))
        def collect(ks):
            key_sets.append(sorted(ks))

        collect()
        # one flat evaluation: tag each case, union all keys
        rows = [(ci, k) for ci, ks in enumerate(key_sets) for k in ks]
        fact = spark.createDataFrame(rows, "case_id int, k bigint")
        for ci, ks in list(enumerate(key_sets))[:5]:  # 5 full joins, small bitmap
            keys = spark.createDataFrame([(k,) for k in ks], "k bigint")
            pre = bloom.bloom_semi_join(
                fact.where(F.col("case_id") == ci), keys, "k",
                bits=1 << 10, exact=False,
            )
            assert {r.k for r in pre.collect()} == set(ks)
