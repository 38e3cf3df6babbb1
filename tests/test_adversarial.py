"""Adversarial hardening suite (round-4, VERDICT item 2): sweep the
engine-wide contracts most likely to harbor silent wrongness —
NULL / empty / whitespace / unicode documents through every text
operator, duplicate ids through the index ops, exact and sub-rounding
ties at top-k boundaries, and the ANSI division/overflow discipline —
plus hypothesis-driven fuzz of the tokenizer/split/chunk contracts
against pure-Python references.

These are bound checks and invariants, not oracle parity (that's
test_oracle_parity.py): the question here is "does a degenerate row
crash a 100 TB job or silently skew it", per SURVEY.md §4's ANSI
posture.
"""

from __future__ import annotations

import math
import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from faiss_vector_search_spark.operators import (
    analytics,
    chunking,
    dedup,
    index_store,
    knn,
    lexical,
    lm,
    textstats,
)

DOC_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"
EMB_SCHEMA = "vec_id bigint, embedding array<float>, label int"

NASTY_TEXTS = [
    None,  # NULL text
    "",  # empty
    "   \t  \n ",  # whitespace only
    "!!! ??? ... ,,, ;;;",  # punctuation only
    "日本語のテキストです。これはテストです。",  # CJK, no ascii tokens
    "🎉🎊🥳 emoji storm 🎈🎂 🎁",  # emoji + ascii
    "café naïve résumé — déjà vu",  # combining accents
    "مرحبا بالعالم هذا نص عربي",  # RTL Arabic
    "a",  # single char
    "7 77 777 7777 77777",  # digits only
    "the " * 500,  # one token repeated (repetition extreme)
    "x" * 5000,  # one giant token
    "the quick brown fox jumps over the lazy dog",  # normal control
    "el perro y el gato y los pájaros",  # spanish control
    "line one\nline two\r\nline three\n\n\nline four",  # newline soup
    "tab\tseparated\tand\x0bvertical\x0ctabs",  # control chars
]


@pytest.fixture(scope="module")
def nasty(spark):
    rows = [
        (i, t, "xx", f"src{i % 3}", len(t) if t is not None else None)
        for i, t in enumerate(NASTY_TEXTS)
    ]
    return spark.createDataFrame(rows, DOC_SCHEMA)


N = len(NASTY_TEXTS)


class TestNastyTextSweep:
    """Every text operator over the adversarial corpus: no exception,
    documented row-grain, outputs inside their contractual bounds."""

    def test_lang_id_total_and_bounds(self, nasty):
        rows = textstats.lang_id(nasty).collect()
        assert len(rows) == N  # doc-grain: nothing dropped, nothing duped
        for r in rows:
            assert r.pred_lang in {"en", "es", "de", "fr", "und"}
            assert r.n_hits >= 0
            if r.pred_lang == "und":
                assert r.n_hits == 0

    def test_quality_score_bounds(self, nasty):
        rows = textstats.quality_score(nasty).collect()
        # only token-bearing docs are scoreable by contract
        assert 0 < len(rows) < N
        for r in rows:
            assert r.n_tokens > 0
            assert r.quality is not None and 0.0 <= r.quality <= 1.0

    def test_token_count_total(self, nasty):
        rows = textstats.token_count(nasty).collect()
        assert len(rows) == N
        for r in rows:
            for v in (r.ws_tokens, r.bpe_tokens, r.distinct_tokens):
                assert v is None or v >= 0
            if r.ws_tokens is not None and r.distinct_tokens is not None:
                assert r.distinct_tokens <= max(r.ws_tokens, 1)

    def test_char_entropy_bounds(self, nasty):
        rows = textstats.char_entropy(nasty).collect()
        for r in rows:
            assert r.n_chars > 0
            # Shannon entropy of an n-char doc: 0 ≤ H ≤ log2(n_chars)
            assert -1e-9 <= r.entropy_bits <= math.log2(r.n_chars) + 1e-6

    def test_repetition_ratios_bounds(self, nasty):
        rows = textstats.repetition_score(nasty).collect()
        for r in rows:
            assert 0.0 <= r.distinct_ratio <= 1.0
            assert 0.0 <= r.top_token_ratio <= 1.0
            assert 0.0 <= r.rep_3gram_ratio <= 1.0
        # the repeated-token doc must profile as extreme repetition
        rep = {r.doc_id: r for r in rows}[10]
        assert rep.top_token_ratio == 1.0 and rep.distinct_ratio < 0.01

    def test_redact_pii_doc_grain(self, nasty):
        rows = textstats.redact_pii(nasty).collect()
        assert len(rows) == N
        for r in rows:
            assert (r.n_ssn or 0) >= 0 and (r.n_emails or 0) >= 0

    def test_gopher_rules_doc_grain(self, nasty):
        rows = textstats.gopher_rules(nasty).collect()
        assert len(rows) == N
        keeps = {r.doc_id: r.keep for r in rows}
        # degenerate docs must be REJECTED, not crash and not pass
        for bad in (0, 1, 2, 3, 8, 11):
            assert keeps[bad] is not True
        assert keeps[12] is not None  # control doc gets a real verdict

    def test_hash_split_partition(self, nasty):
        rows = textstats.hash_split(nasty).collect()
        assert len(rows) == N
        assert {r.split for r in rows} <= {"train", "val", "test"}
        again = {(r.doc_id, r.split) for r in textstats.hash_split(nasty).collect()}
        assert again == {(r.doc_id, r.split) for r in rows}  # deterministic

    def test_doc_length_histogram_conserves_docs(self, nasty):
        rows = textstats.doc_length_histogram(nasty).collect()
        # NULL text → NULL length → its own bucket row; total conserved
        assert sum(r.n_docs for r in rows) == N

    def test_weighted_sample_excludes_nonpositive(self, spark, nasty):
        # weights: NULL for NULL text, 0 for empty, and force one negative
        weighted = nasty.withColumn(
            "w",
            F.when(F.col("doc_id") == 3, F.lit(-5.0)).otherwise(
                F.col("n_chars").cast("double")
            ),
        )
        rows = textstats.weighted_sample(
            weighted, n=N, weight_col=F.col("w"), id_col="doc_id"
        ).collect()
        ranked = [r.doc_id for r in rows if r.sample_key is not None]
        # NULL-weight (0), zero-weight (1), negative-weight (3) never rank
        assert not {0, 1, 3} & set(ranked)
        assert len(ranked) >= 5  # the real docs all got keys

    def test_dedup_family(self, nasty):
        assert dedup.exact_dedup(nasty).count() <= N
        # the minhash/simhash paths require token-bearing docs to pair
        assert dedup.minhash_lsh_pairs(nasty, hash_fn="xxhash64").count() >= 0
        assert dedup.simhash_pairs(nasty, hash_fn="xxhash64").count() >= 0
        assert dedup.line_dedup(nasty, hash_fn="xxhash64").count() == N

    def test_chunking_family(self, nasty):
        fixed = chunking.chunk_fixed(nasty, size=10, overlap=3)
        # every non-null non-empty text yields ≥1 chunk; chunks cover text
        per_doc = {
            r.doc_id: r.n for r in fixed.groupBy("doc_id").agg(
                F.count("*").alias("n")
            ).collect()
        }
        for i, t in enumerate(NASTY_TEXTS):
            if t is None:
                assert i not in per_doc
            else:
                assert per_doc.get(i, 0) >= 1
        assert chunking.chunk_greedy(nasty).count() >= 1
        packed = chunking.pack_sequences(nasty, max_tokens=16, n_shards=2)
        assert packed.count() >= 1

    def test_lexical_family(self, nasty):
        assert lexical.tfidf_topk_terms(nasty, k=3).count() >= 1
        assert lexical.bigram_counts(nasty, top_n=10).count() >= 1
        # unicode query terms: no crash, plausible hits
        hits = lexical.bm25_search(nasty, "日本語 fox", k=5).collect()
        assert all(r.score >= 0 for r in hits)
        # query with no tokens → empty result, not a crash
        assert lexical.bm25_search(nasty, "!!! ???", k=5).count() == 0
        assert lexical.phrase_search(nasty, "quick brown fox").count() == 1
        # phrase absent → empty
        assert lexical.phrase_search(nasty, "no such phrase here zz").count() == 0
        assert lexical.near_search(nasty, "quick", "dog", window=9).count() == 1
        with pytest.raises(ValueError):
            lexical.near_search(nasty, "", "dog")

    def test_bigram_lm_on_nasty(self, nasty):
        model = lm.bigram_lm_train(nasty)
        mrows = model.collect()
        assert mrows  # the repeated/control docs produce transitions
        for r in mrows:
            assert 0 < float(r.prob) <= 1
        scored = lm.bigram_lm_score(nasty, model).collect()
        for r in scored:
            assert 0.0 <= r.fluency <= 1.0 and r.n_transitions >= 1

    def test_corpus_profile_on_nasty(self, nasty):
        rows = {r.metric: r.value for r in textstats.corpus_profile(nasty).collect()}
        assert rows["n_docs"] == float(N)
        assert rows["distinct_texts"] <= N
        assert 0.0 <= rows["dup_rate"] <= 1.0

    def test_stratified_and_domain_mix(self, nasty):
        out = textstats.stratified_sample(nasty, 0.5, strata_col="source")
        assert 0 < out.count() <= N
        mixed = textstats.domain_mix_sample(
            nasty, {"src0": 500, "src1": 500}, domain_col="source"
        )
        assert mixed.count() >= 0  # quotas are data-dependent; no crash


class TestDuplicateIds:
    """Duplicate ids through every index op: the contract is that id
    uniqueness is ENFORCED by add_vectors (anti-join) and tolerated
    (deterministically) everywhere else."""

    @pytest.fixture(scope="class")
    def dup_emb(self, spark):
        def v(x):
            return [float(x)] + [0.0] * 7

        rows = [(1, v(0.9), 0), (1, v(0.8), 0), (2, v(0.7), 0), (3, v(0.6), 0)]
        return spark.createDataFrame(rows, EMB_SCHEMA)

    def test_add_vectors_refuses_existing_id(self, spark, dup_emb):
        new = spark.createDataFrame(
            [(1, [9.0] * 8, 1), (4, [1.0] * 8, 1)], EMB_SCHEMA
        )
        out = index_store.add_vectors(dup_emb, new)
        assert out.count() == 5  # only id=4 appended; id=1 rejected
        assert out.where("vec_id = 4").count() == 1

    def test_index_stats_reports_distinct(self, dup_emb):
        s = index_store.index_stats(dup_emb).first()
        assert s.num_documents == 4 and s.distinct_ids == 3

    def test_remove_vectors_removes_all_copies(self, spark, dup_emb):
        ids = spark.createDataFrame([(1,)], "vec_id bigint")
        out = index_store.remove_vectors(dup_emb, ids)
        assert out.count() == 2
        assert out.where("vec_id = 1").count() == 0

    def test_topk_with_dup_ids_is_deterministic(self, spark, dup_emb):
        q = spark.createDataFrame(
            [([1.0] + [0.0] * 7,)], "query_vec array<float>"
        )
        a = [(r.vec_id, r.score) for r in knn.topk(dup_emb, q, k=3).collect()]
        b = [
            (r.vec_id, r.score)
            for r in knn.topk(dup_emb.repartition(7), q, k=3).collect()
        ]
        assert a == b  # partitioning cannot change the answer
        # both copies of id=1 are real corpus rows; the higher-scoring
        # one ranks first, so rank order is (1, 1, 2) at these scores
        assert [x[0] for x in a] == [1, 1, 2]


class TestTopKBoundaries:
    """Ties at the top-k boundary: the engine contract is round-to-6dp
    scores, then (score desc, id asc) — exact across partitionings,
    thresholds inclusive."""

    @pytest.fixture(scope="class")
    def tied(self, spark):
        # ids deliberately inserted in descending order: 5 identical
        # vectors, plus two whose raw scores differ only BELOW the 6dp
        # rounding grain (0.12345641 vs 0.12345649 both round to
        # 0.123456) so they tie after rounding
        def v(x):
            return [float(x)] + [0.0] * 7

        rows = [(i, v(0.5), 0) for i in (9, 7, 5, 3, 1)]
        rows += [(20, v(0.12345649), 0), (10, v(0.12345641), 0)]
        return spark.createDataFrame(rows, EMB_SCHEMA)

    @pytest.fixture(scope="class")
    def unit_q(self, spark):
        return spark.createDataFrame(
            [([1.0] + [0.0] * 7,)], "query_vec array<float>"
        )

    def test_exact_ties_break_by_lowest_id(self, tied, unit_q):
        rows = knn.topk(tied, unit_q, k=3).collect()
        assert [r.vec_id for r in rows] == [1, 3, 5]

    def test_sub_rounding_ties_break_by_id(self, tied, unit_q):
        rows = knn.topk(tied, unit_q, k=7).collect()
        tail = [r.vec_id for r in rows[-2:]]
        assert tail == [10, 20]  # equal after 6dp rounding → id asc
        assert rows[-1].score == rows[-2].score == 0.123456

    def test_partitioning_invariance(self, tied, unit_q):
        a = [(r.vec_id, r.score) for r in knn.topk(tied, unit_q, k=7).collect()]
        for parts in (1, 3, 7):
            b = [
                (r.vec_id, r.score)
                for r in knn.topk(tied.repartition(parts), unit_q, k=7).collect()
            ]
            assert b == a

    def test_threshold_is_inclusive_on_rounded_score(self, tied, unit_q):
        rows = knn.topk(tied, unit_q, k=10, threshold=0.123456).collect()
        assert len(rows) == 7  # the sub-rounding pair is INCLUDED
        rows = knn.topk(tied, unit_q, k=10, threshold=0.1234561).collect()
        assert len(rows) == 5  # strictly above the rounded score

    def test_range_search_radius_inclusive(self, tied, unit_q):
        assert knn.range_search(tied, unit_q, radius=0.5).count() == 5
        assert knn.range_search(tied, unit_q, radius=0.500001).count() == 0

    def test_k_exceeding_corpus(self, tied, unit_q):
        assert knn.topk(tied, unit_q, k=100).count() == 7

    def test_topk_join_per_query_ties(self, spark, tied):
        queries = spark.createDataFrame(
            [(0, [1.0] + [0.0] * 7), (1, [1.0] + [0.0] * 7)],
            "query_id bigint, query_vec array<float>",
        )
        out = knn.topk_join(tied, queries, k=3).collect()
        by_q = {}
        for r in out:
            by_q.setdefault(r.query_id, []).append(r.vec_id)
        assert by_q[0] == by_q[1] == [1, 3, 5]


class TestAnsiDivisionSweeps:
    """x/0 and min==max shapes that ANSI mode turns into job-killers
    unless routed through try_divide / explicit guards."""

    def test_minmax_scale_constant_group(self, spark):
        events = spark.createDataFrame(
            [(1, "a", 5.0), (2, "a", 5.0), (3, "b", 1.0), (4, "b", 3.0)],
            "event_id bigint, event_type string, value double",
        )
        rows = {r.event_id: r.scaled for r in
                analytics.minmax_scale_events(events).collect()}
        assert rows[1] == 0.0 and rows[2] == 0.0  # constant group → 0, no throw
        assert rows[3] == 0.0 and rows[4] == 1.0

    def test_quality_on_token_free_docs_is_dropped_not_thrown(self, spark):
        docs = spark.createDataFrame(
            [(1, "...", "xx", "s", 3), (2, "", "xx", "s", 0)], DOC_SCHEMA
        )
        assert textstats.quality_score(docs).count() == 0

    def test_bm25_single_doc_corpus(self, spark):
        # N == df for every term: idf = ln(1 + 0.5/1.5) > 0, finite
        docs = spark.createDataFrame(
            [(1, "only one document here", "en", "s", 22)], DOC_SCHEMA
        )
        rows = lexical.bm25_search(docs, "document", k=5).collect()
        assert len(rows) == 1 and math.isfinite(rows[0].score)


# --- hypothesis fuzz ------------------------------------------------------

# compact alphabets that still cover the interesting classes: ascii
# letters/digits, punctuation, whitespace, CJK, accents, emoji
_ALPHABET = st.sampled_from(
    list("abcXYZ019 .,!?\t\n-_@#") + ["é", "日", "語", "🎉", "ß"]
)
_TEXT = st.text(alphabet=_ALPHABET, min_size=0, max_size=60)

_TOKEN_RE = re.compile("[^a-z0-9]+")


def _py_tokens(s: str) -> list[str]:
    return [t for t in _TOKEN_RE.split(s.lower()) if t != ""]


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(_TEXT, min_size=1, max_size=12))
def test_fuzz_token_count_matches_python_reference(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    got = {r.doc_id: (r.ws_tokens, r.distinct_tokens)
           for r in textstats.token_count(docs).collect()}
    for i, t in enumerate(texts):
        toks = _py_tokens(t)
        assert got[i] == (len(toks), len(set(toks))), repr(t)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(_TEXT.filter(lambda s: s != ""), min_size=1, max_size=8))
def test_fuzz_chunk_fixed_reconstructs_text(spark, texts):
    """Zero-overlap fixed chunks concatenate back to the exact
    original text — unicode safe (substring is codepoint-based)."""
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    out = chunking.chunk_fixed(docs, size=7, overlap=0).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_id, r.chunk))
    for i, t in enumerate(texts):
        parts = [c for _, c in sorted(by_doc[i])]
        assert "".join(parts) == t, repr(t)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ids=st.lists(st.integers(0, 2**40), min_size=1, max_size=30, unique=True))
def test_fuzz_hash_split_is_a_stable_partition(spark, ids):
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id bigint")
    rows = textstats.hash_split(docs).collect()
    assert len(rows) == len(ids)  # every id in exactly one split
    assert {r.split for r in rows} <= {"train", "val", "test"}
    # stability under corpus growth: the same ids keep their split
    # when the corpus doubles (the incremental-ingest contract)
    grown = spark.createDataFrame(
        [(i,) for i in ids] + [(max(ids) + 1 + j,) for j in range(len(ids))],
        "doc_id bigint",
    )
    grown_split = {r.doc_id: r.split for r in textstats.hash_split(grown).collect()}
    for r in rows:
        assert grown_split[r.doc_id] == r.split


class TestR5LateOpsOnNasty:
    """The late-r5 text operators over the same adversarial corpus:
    no exception, contractual grain and bounds hold on NULL/unicode/
    control-char/degenerate docs."""

    def test_normalize_text_grain_and_bounds(self, nasty):
        from faiss_vector_search_spark.operators import textstats

        rows = textstats.normalize_text(nasty).collect()
        assert len(rows) == N  # row-per-doc, NULLs included
        for r in rows:
            if r.norm_text is None:
                assert r.changed is None and r.n_chars_removed is None
                continue
            assert r.n_chars_removed >= 0
            # normalized text never contains runs the pass removes
            assert "  " not in r.norm_text
            assert "\n" not in r.norm_text and "\t" not in r.norm_text
            assert "!!" not in r.norm_text and "??" not in r.norm_text
            assert r.norm_text == r.norm_text.strip()

    def test_repeated_spans_on_nasty(self, nasty):
        from faiss_vector_search_spark.operators import dedup

        # "the "*500 repeats its own 8-gram massively -> one giant span
        spans = {r.doc_id: r for r in dedup.repeated_spans(
            nasty, w=8, min_count=2, hash_fn="xxhash64"
        ).collect()}
        rep_id = NASTY_TEXTS.index("the " * 500)
        assert rep_id in spans
        s = spans[rep_id]
        assert s.span_start >= 1 and s.span_end <= 500

    def test_strip_repeated_spans_on_nasty(self, nasty):
        from faiss_vector_search_spark.operators import dedup

        out = {r.doc_id: r for r in dedup.strip_repeated_spans(
            nasty, w=8, min_count=2, hash_fn="xxhash64"
        ).collect()}
        assert len(out) == N
        rep_id = NASTY_TEXTS.index("the " * 500)
        # degenerate self-overlap: every window from pos 2 on is
        # redundant and their merged extent [2,500] eats into the kept
        # first window's tail — removal is SPAN-granular (documented),
        # so exactly the first token survives
        assert out[rep_id].clean_text == "the"
        assert out[rep_id].n_tokens_removed == 499
        for r in out.values():
            assert r.n_tokens >= 0 and 0 <= r.n_tokens_removed <= r.n_tokens

    def test_dsir_on_nasty(self, nasty):
        from faiss_vector_search_spark.operators import lm

        target = nasty.where(F.col("doc_id") % 3 == 0)
        imp = lm.dsir_importance(nasty, target).collect()
        # only token-bearing docs get scores; every score is finite
        import math

        for r in imp:
            assert r.n_tokens > 0
            assert math.isfinite(r.importance)

    def test_fuzzy_decontaminate_on_nasty(self, nasty):
        from faiss_vector_search_spark.operators import dedup

        out = dedup.fuzzy_decontaminate(
            nasty, nasty.where(F.col("doc_id") % 3 == 0),
            threshold=0.8, hash_fn="xxhash64",
        ).collect()
        # token-bearing docs in both sides must self-match at 1.0
        matched = {(r.doc_id, r.bench_id): r.jaccard for r in out}
        for i, t in enumerate(NASTY_TEXTS):
            if i % 3 == 0 and t and len([w for w in t.split() if w]) >= 3:
                if (i, i) in matched:
                    assert matched[(i, i)] == 1.0
        for r in out:
            assert r.jaccard >= 0.8


class TestWave3OpsOnNasty:
    """The r5 third-wave operators over the adversarial corpus: no
    exception; grain, bounds, and degenerate-doc contracts hold."""

    def test_quality_classifier_on_nasty(self, nasty):
        from faiss_vector_search_spark.operators import classifier

        m = classifier.load_model()
        out = {r.doc_id: r for r in classifier.score_quality_classifier(
            nasty, m, hash_fn="md5"
        ).collect()}
        assert len(out) == N  # row-per-doc, NULL text included
        b6 = round(m["bias"], 6)
        import math

        for i, t in enumerate(NASTY_TEXTS):
            r = out[i]
            assert math.isfinite(r.logit)
            assert r.keep == (r.logit > 0)
            if t is None or not t.strip() or r.n_tokens == 0:
                assert r.logit == b6

    def test_pmi_on_nasty(self, nasty):
        # degenerate docs produce no crash; the repeated doc's
        # self-bigram dominates counts but PMI stays finite
        import math

        rows = lexical.pmi_collocations(nasty, min_count=2, top_n=20).collect()
        for r in rows:
            assert math.isfinite(r.pmi)
            assert r.n_pair >= 2

    def test_domain_kl_on_nasty(self, nasty):
        import math

        rows = lm.domain_kl_report(nasty).collect()
        # every domain with >= 1 token scores; KL >= 0 up to rounding
        assert rows
        for r in rows:
            assert math.isfinite(r.kl_nats)
            assert r.kl_nats >= -1e-6
            assert r.n_tokens >= 1

    def test_length_batches_on_nasty(self, nasty):
        from faiss_vector_search_spark.operators import chunking

        rows = chunking.length_bucket_batches(
            nasty, batch_size=4, bucket_width=8, n_shards=2
        ).collect()
        # every doc lands in exactly one batch (NULL/empty -> bucket 0)
        assert sum(r.n_docs for r in rows) == N
        for r in rows:
            assert r.padding >= 0 and 0.0 <= r.pad_frac <= 1.0

    def test_token_budget_sample_on_nasty(self, nasty):
        from faiss_vector_search_spark.operators import textstats

        out = textstats.token_budget_sample(
            nasty, {"src0": 50, "src1": 50, "src2": 50}
        ).collect()
        by_dom: dict = {}
        for r in out:
            by_dom.setdefault(r.source, 0)
            by_dom[r.source] += r.n_tokens
        for dom, total in by_dom.items():
            assert total <= 50
        # zero-token docs cost nothing and may be included by the
        # running-sum rule; totals stay within budget regardless

    def test_hard_negatives_on_tiny_corpus(self, spark):
        from faiss_vector_search_spark.operators import knn

        # single-label corpus: no valid negative exists -> empty, not
        # an error
        emb = spark.createDataFrame(
            [(i, [1.0, 0.0], 0) for i in range(4)],
            "vec_id bigint, embedding array<double>, label int",
        )
        anchors = emb.where(F.col("vec_id") == 0).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
            F.col("label").alias("query_label"),
        )
        assert knn.hard_negatives(emb, anchors, k=3).count() == 0

    def test_bm25_index_on_nasty_corpus(self, spark, nasty, tmp_path):
        # build over the adversarial corpus (NULL/empty docs dropped by
        # the dl>0 contract), probe with a unicode query
        path = str(tmp_path / "idx")
        lexical.lexical_index_save(nasty, path)
        out = lexical.bm25_index_search(spark, path, "the quick fox", k=5)
        got = out.collect()
        assert got  # the control doc matches
        direct = lexical.bm25_search(nasty, "the quick fox", k=5).collect()
        assert [(r["doc_id"], r["score"]) for r in direct] == [
            (r["doc_id"], r["score"]) for r in got
        ]


class TestWave4OnNasty:
    """Wave-4 text operators over the adversarial corpus: no
    exception, contractual grain and bounds on NULL/unicode/RTL/
    control-char/degenerate docs."""

    def test_ngram_novelty_bounds_and_grain(self, nasty):
        out = textstats.ngram_novelty(nasty, w=8).collect()
        for r in out:
            assert 0.0 <= r["novelty"] <= 1.0
            assert 0 <= r["n_novel"] <= r["n_grams"]
        # 'the '*500: every window is the same gram -> nothing novel
        by_id = {r["doc_id"]: r for r in out}
        rep = by_id[10]
        assert rep["novelty"] == 0.0

    def test_curriculum_order_is_permutation(self, nasty):
        out = textstats.curriculum_order(nasty).collect()
        n = len(out)
        assert n > 0  # the control docs score
        assert sorted(r["pos"] for r in out) == list(range(1, n + 1))

    def test_ccnet_buckets_grain(self, nasty):
        out = textstats.ccnet_buckets(nasty).collect()
        for r in out:
            assert r["tercile"] in (1, 2, 3)
            assert r["bucket"] in ("head", "middle", "tail")

    def test_maxsim_on_nasty_and_unicode_query(self, nasty):
        out = lexical.maxsim_search(nasty, "quick brown fox", k=5).collect()
        assert out and out[0]["doc_id"] == 12  # the english control
        # unicode query tokens carry no ascii tokens -> clean error,
        # not a crash deeper in the plan
        with pytest.raises(ValueError):
            lexical.maxsim_search(nasty, "日本語 🎉", k=5)

    def test_matryoshka_prefix_exceeds_dim(self, spark):
        emb = spark.createDataFrame(
            [(i, [float(i), 1.0], 0) for i in range(5)], EMB_SCHEMA
        )
        q = emb.where(F.col("vec_id") == 0).select(
            F.col("embedding").alias("query_vec")
        )
        # slice past the end truncates -> behaves as prefix=dim
        out = knn.matryoshka_rerank_search(emb, q, k=3, prefix=64, shortlist=5)
        assert out.count() == 3


class TestWave6Degenerates:
    """NULL / empty / degenerate inputs through the round-6 operators:
    a bad row must neither crash (ANSI division, descending sequence)
    nor silently skew."""

    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_c4_rules_null_and_empty_text(self, spark):
        from faiss_vector_search_spark.operators import textstats as ts

        docs = self._docs(spark, [(1, None), (2, ""), (3, "ok line here now fine.")])
        out = {r["doc_id"]: r for r in ts.c4_rules(docs).collect()}
        # NULL text: flags must not crash; keep is falsy
        assert not out[1]["keep"]
        assert out[2]["n_lines_kept"] == 0 and out[2]["keep"] is False

    def test_boilerplate_null_text_and_source(self, spark):
        from faiss_vector_search_spark.operators import dedup

        docs = spark.createDataFrame(
            [(1, None, "x"), (2, "a\nb", None), (3, "a\nb", "x"),
             (4, "a\nc", "x"), (5, "a\nd", "x")],
            "doc_id long, text string, source string",
        )
        out = {r["doc_id"]: r for r in
               dedup.domain_boilerplate_strip(docs, min_docs=3).collect()}
        assert len(out) == 5          # every input row survives
        # 'a' appears in 3 docs of source x -> stripped there
        assert out[3]["clean_text"] == "b"
        # the NULL-source doc forms its own group; nothing repeats
        assert out[2]["n_dropped"] == 0

    def test_ngram_lookup_empty_corpus(self, spark):
        from faiss_vector_search_spark.operators import lexical

        docs = self._docs(spark, []).where(F.lit(False))
        out = lexical.ngram_count_lookup(docs, ["a b"]).collect()
        assert [tuple(r) for r in out] == [("a b", 0, 0)]

    def test_knn_classify_corpus_smaller_than_k(self, spark):
        from faiss_vector_search_spark.operators import knn

        emb = spark.createDataFrame(
            [(0, [1.0, 0.0], 3), (1, [0.9, 0.1], 3)],
            "vec_id long, embedding array<double>, label int",
        )
        q = emb.where(F.col("vec_id") == 0).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        (r,) = knn.knn_classify(emb, q, k=10).collect()
        assert r["pred_label"] == 3 and r["votes"] == 1
        # confidence divides by the ACTUAL neighbor count (1 here,
        # self excluded), not the requested k — a unanimous vote on a
        # small corpus reads 1.0
        assert r["confidence"] == 1.0

    def test_temperature_sample_empty_corpus(self, spark):
        from faiss_vector_search_spark.operators import textstats as ts

        docs = spark.createDataFrame([], "doc_id long, source string")
        assert ts.domain_temperature_sample(docs, n_total=10).count() == 0

    def test_chunk_search_no_hits(self, spark):
        from faiss_vector_search_spark.operators import embed

        docs = self._docs(spark, [(1, "alpha beta"), (2, "gamma delta")])
        out = embed.chunk_text_search(docs, "zzzz qqqq wwww", k=3).collect()
        assert out == []

    def test_event_funnel_no_step_one_events(self, spark):
        import datetime as dt

        from faiss_vector_search_spark.operators import analytics as an

        events = spark.createDataFrame(
            [(0, 1, "click", dt.datetime(2024, 1, 1))],
            "event_id long, user_id long, event_type string, ts timestamp",
        )
        out = {r["step"]: r for r in an.event_funnel(events).collect()}
        assert out["view"]["n_users"] == 0
        assert out["view"]["conversion"] == 0.0  # 0/0 guarded
        assert out["purchase"]["n_users"] == 0
