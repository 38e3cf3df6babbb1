"""Gates for the corpus-curation operators (SURVEY.md §2d):
benchmark decontamination, PII redaction, repetition scoring — the
oracle hash pins sf0.01 behavior; these pin SEMANTICS on planted
inputs the synthetic corpus doesn't contain."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from faiss_vector_search_spark.operators import dedup, textstats


@pytest.fixture(scope="module")
def planted_docs(spark):
    eight = "alpha beta gamma delta epsilon zeta eta theta"
    return spark.createDataFrame(
        [
            (1, f"prefix words {eight} suffix words here now"),
            (2, "totally unrelated text with no overlap at all present"),
            (3, "call me at 415-555-0199 or mail bob@example.com today"),
            (4, "ssn 123-45-6789 appears here"),
            (5, "spam spam spam spam spam spam spam spam spam spam"),
            (6, "each word appears exactly once in this sentence friend"),
        ],
        "doc_id bigint, text string",
    )


def test_decontaminate_flags_only_overlapping_docs(spark, planted_docs):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id bigint, text string",
    )
    out = {
        r.doc_id: (r.n_shared_grams, r.n_benchmark_docs)
        for r in dedup.decontaminate(planted_docs, bench, n=8).collect()
    }
    assert 1 in out and out[1] == (1, 1)
    assert 2 not in out
    assert 5 not in out  # repeated token ≠ benchmark overlap


def test_decontaminate_benchmark_side_broadcasts(spark, planted_docs):
    bench = planted_docs.limit(1)
    df = dedup.decontaminate(planted_docs, bench, n=8)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_redact_pii_counts_and_placeholders(planted_docs):
    out = {r.doc_id: r for r in textstats.redact_pii(planted_docs).collect()}
    r3 = out[3]
    assert r3.n_emails == 1 and r3.n_phones == 1 and r3.n_ssn == 0
    assert "<EMAIL>" in r3.clean_text and "<PHONE>" in r3.clean_text
    assert "bob@example.com" not in r3.clean_text
    r4 = out[4]
    # SSN substitutes FIRST — the looser phone pattern must not eat it
    assert r4.n_ssn == 1 and r4.n_phones == 0
    assert "<ID>" in r4.clean_text
    r2 = out[2]
    assert (r2.n_ssn, r2.n_emails, r2.n_phones) == (0, 0, 0)
    assert r2.clean_text == "totally unrelated text with no overlap at all present"


def test_repetition_score_separates_spam_from_prose(planted_docs):
    out = {
        r.doc_id: r for r in textstats.repetition_score(planted_docs).collect()
    }
    spam, prose = out[5], out[6]
    assert spam.top_token_ratio == 1.0
    assert spam.distinct_ratio == pytest.approx(0.1)
    assert spam.rep_3gram_ratio > 0.8
    assert prose.distinct_ratio == 1.0
    assert prose.rep_3gram_ratio == 0.0
    assert prose.top_token_ratio == pytest.approx(1 / prose.n_tokens, abs=1e-6)


def test_repetition_score_skips_tiny_docs(spark):
    docs = spark.createDataFrame(
        [(1, "two words"), (2, "three word doc")], "doc_id bigint, text string"
    )
    out = textstats.repetition_score(docs).collect()
    assert [r.doc_id for r in out] == [2]


def test_curation_ops_stay_jvm_side(spark, planted_docs):
    for df in (
        textstats.redact_pii(planted_docs),
        textstats.repetition_score(planted_docs),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
