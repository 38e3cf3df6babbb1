"""Gates for the span-level dedup family: repeated_spans (blocked
ExactSubstr) and fuzzy_decontaminate (MinHash corpus-vs-benchmark).

Ground truth is computed with plain Python over tiny hand-built docs,
so span boundaries, self-repeat semantics, and cross-engine hash
profiles are each pinned independently of the Spark plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from faiss_vector_search_spark import io as fio
from faiss_vector_search_spark.operators import dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _spans_reference(texts: dict[int, str], w: int, min_count: int):
    """Driver-side truth: hash every w-token window, count globally,
    merge consecutive repeated positions per doc."""
    import re

    wins = {}  # (doc, pos 1-based) -> gram
    counts = {}
    for did, text in texts.items():
        toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        for i in range(len(toks) - w + 1):
            g = " ".join(toks[i : i + w])
            wins[(did, i + 1)] = g
            counts[g] = counts.get(g, 0) + 1
    hits = sorted(
        (did, pos) for (did, pos), g in wins.items() if counts[g] >= min_count
    )
    spans = []
    for did, pos in hits:
        if spans and spans[-1][0] == did and spans[-1][2] == pos - 1 + w - 1:
            d, s, _, n = spans[-1]
            spans[-1] = (d, s, pos + w - 1, n + 1)
        else:
            spans.append((did, pos, pos + w - 1, 1))
    return sorted(spans)


def test_repeated_spans_match_reference(spark):
    texts = {
        1: "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        # doc 2 shares doc 1's first 8-token run, shifted right by one
        2: "prefix alpha beta gamma delta epsilon zeta eta theta tail",
        3: "unrelated words that never repeat anywhere in this corpus",
        # doc 4 repeats ITS OWN 8-gram (self-repeat counts, like
        # ExactSubstr): two copies of the same 8 tokens
        4: "a b c d e f g h a b c d e f g h",
    }
    docs = _docs(spark, list(texts.items()))
    got = sorted(
        tuple(r)
        for r in dedup.repeated_spans(docs, w=8, min_count=2).collect()
    )
    assert got == _spans_reference(texts, w=8, min_count=2)


def test_repeated_spans_short_docs_and_min_count(spark):
    texts = {1: "too short", 2: "also short", 3: "three times x " * 4}
    docs = _docs(spark, list(texts.items()))
    # w larger than every doc -> no windows at all
    assert dedup.repeated_spans(docs, w=50, min_count=2).count() == 0
    # raising min_count above the actual repeat count empties the result
    w3 = dedup.repeated_spans(docs, w=3, min_count=99)
    assert w3.count() == 0


def test_repeated_spans_hash_profiles_agree(spark, sf_small):
    """xxhash64 (production) and md5 (oracle) must find the same spans
    — gram identity differs only in collision probability."""
    docs = fio.load_table(spark, sf_small, "documents")
    a = sorted(
        tuple(r) for r in dedup.repeated_spans(docs, hash_fn="md5").collect()
    )
    b = sorted(
        tuple(r)
        for r in dedup.repeated_spans(docs, hash_fn="xxhash64").collect()
    )
    assert a == b
    assert len(a) > 0  # the corpus plants near-dups; spans must exist


def test_fuzzy_decontaminate_catches_paraphrase(spark):
    base = (
        "the quick brown fox jumps over the lazy dog near the old river "
        "bank while birds sing in the tall green trees above and the sun "
        "sets slowly behind distant purple mountains casting long warm "
        "shadows across the quiet meadow where children played all day"
    )
    rows = [
        (1, base),
        # light edit: one word changed -> high Jaccard, shared 3-gram
        # shingle mass stays above 0.8
        (2, base.replace("lazy", "sleepy")),
        (3, "completely different content about database query planners"),
    ]
    docs = _docs(spark, [(i, t) for i, t, in rows])
    bench = _docs(spark, [(100, base)])
    out = dedup.fuzzy_decontaminate(
        docs, bench, threshold=0.8, hash_fn="xxhash64"
    ).collect()
    hits = {(r.doc_id, r.bench_id) for r in out}
    assert (1, 100) in hits  # exact copy
    assert (2, 100) in hits  # paraphrase-level edit
    assert all(d != 3 for d, _ in hits)
    for r in out:
        assert r.jaccard >= 0.8


def test_fuzzy_decontaminate_disjoint_is_empty(spark):
    docs = _docs(spark, [(1, "apples oranges pears grapes melons kiwis")])
    bench = _docs(spark, [(9, "submarine telescope galaxy quantum physics")])
    assert dedup.fuzzy_decontaminate(docs, bench).count() == 0


def test_fuzzy_decontaminate_benchmark_broadcasts(spark, sf_small):
    """Plan gate: the benchmark side must reach the candidate join as
    a broadcast — the corpus never shuffles for contamination checks."""
    docs = fio.load_table(spark, sf_small, "documents")
    bench = docs.where(F.col("doc_id") % 50 == 0)
    plan = dedup.fuzzy_decontaminate(
        docs, bench, hash_fn="xxhash64"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_strip_repeated_spans_keep_first(spark):
    texts = {
        1: "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        2: "prefix alpha beta gamma delta epsilon zeta eta theta tail",
        3: "unrelated words entirely",
        4: "a b c d e f g h a b c d e f g h",  # self-repeat
        5: "",
    }
    docs = _docs(spark, list(texts.items()))
    got = {
        r.doc_id: r
        for r in dedup.strip_repeated_spans(docs, w=8, min_count=2).collect()
    }
    assert len(got) == len(texts)  # every doc survives (possibly empty)
    # global first occurrence (doc 1) keeps its text verbatim
    assert got[1].clean_text == texts[1]
    assert got[1].n_tokens_removed == 0
    # the later copy loses exactly the shared 8-token run
    assert got[2].clean_text == "prefix tail"
    assert got[2].n_tokens_removed == 8
    # self-repeat: the SECOND in-doc copy goes, the first stays
    assert got[4].clean_text == "a b c d e f g h"
    assert got[4].n_tokens_removed == 8
    assert got[3].n_tokens_removed == 0
    assert got[5].clean_text == "" and got[5].n_tokens == 0


def test_strip_conserves_tokens(spark, sf_small):
    """n_tokens == |tokens(clean_text)| + n_tokens_removed for every
    doc, and stripping strictly reduces the corpus's repeated-window
    mass on a corpus with planted near-dups."""
    import re

    from faiss_vector_search_spark import io as fio

    docs = fio.load_table(spark, sf_small, "documents")
    out = dedup.strip_repeated_spans(docs, w=8, min_count=2).collect()
    for r in out:
        kept = [t for t in re.split(r"[^a-z0-9]+", r.clean_text.lower()) if t]
        assert len(kept) == r.n_tokens - r.n_tokens_removed
    before = sum(
        r.n_windows for r in dedup.repeated_spans(docs, w=8).collect()
    )
    cleaned = docs.sparkSession.createDataFrame(
        [(r.doc_id, r.clean_text) for r in out], "doc_id long, text string"
    )
    after = sum(
        r.n_windows for r in dedup.repeated_spans(cleaned, w=8).collect()
    )
    assert before > 0 and after < before
