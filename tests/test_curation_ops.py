"""Gates for the r5 curation additions: normalize_text (canonical
cleanup) and DSIR importance resampling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from faiss_vector_search_spark.operators import lm, textstats


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_normalize_text_cases(spark):
    rows = [
        (1, "hello\x00\x01world"),          # control chars -> spaces
        (2, "a  b\t\tc\n\nd"),               # whitespace runs
        (3, "wow!!!! really???? yes"),       # punctuation squeeze
        (4, "wait....... what"),             # long dot runs -> ellipsis
        (5, "  padded  "),                   # trim
        (6, "already clean text"),           # untouched
    ]
    got = {
        r.doc_id: r
        for r in textstats.normalize_text(_docs(spark, rows)).collect()
    }
    assert got[1].norm_text == "hello world"
    assert got[2].norm_text == "a b c d"
    assert got[3].norm_text == "wow! really? yes"
    assert got[4].norm_text == "wait... what"
    assert got[5].norm_text == "padded"
    assert got[6].norm_text == "already clean text"
    assert got[6].changed is False and got[6].n_chars_removed == 0
    assert got[3].changed is True and got[3].n_chars_removed == 6


def test_normalize_text_idempotent(spark, sf_small):
    """Normalizing a normalized corpus is the identity — the property
    that makes the pass safe to re-run in an incremental pipeline."""
    from faiss_vector_search_spark import io as fio

    docs = fio.load_table(spark, sf_small, "documents")
    once = textstats.normalize_text(docs).select(
        F.col("doc_id"), F.col("norm_text").alias("text")
    )
    twice = textstats.normalize_text(once)
    assert twice.where(F.col("changed")).count() == 0


def test_normalize_text_is_scan_speed(spark, sf_small):
    """Plan gate: pure projection — no exchange, no join."""
    from faiss_vector_search_spark import io as fio

    docs = fio.load_table(spark, sf_small, "documents")
    plan = textstats.normalize_text(docs)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan


def test_dsir_prefers_target_like_docs(spark):
    """Docs sharing the target's vocabulary must outrank docs that
    look like the generic source."""
    target = _docs(spark, [
        (900, "physics quantum relativity entanglement particle wave"),
        (901, "quantum field particle boson fermion spin"),
    ])
    corpus = _docs(spark, [
        (1, "quantum particle spin measurement physics wave"),  # target-like
        (2, "recipe flour sugar butter oven bake cake"),        # not
        (3, "football stadium goal referee crowd match"),       # not
        (4, "entanglement relativity boson quantum physics"),   # target-like
    ])
    imp = {
        r.doc_id: r.importance
        for r in lm.dsir_importance(corpus, target).collect()
    }
    assert min(imp[1], imp[4]) > max(imp[2], imp[3])
    top2 = [r.doc_id for r in lm.dsir_sample(corpus, target, n=2).collect()]
    assert set(top2) == {1, 4}


def test_dsir_importance_is_mean_log_ratio(spark):
    """Pin the math on a tiny corpus against a driver-side replay."""
    import math

    target = _docs(spark, [(10, "aa bb")])
    corpus = _docs(spark, [(1, "aa cc")])
    got = lm.dsir_importance(corpus, target).collect()[0]
    # vocab: aa(cs1,ct1) bb(cs0,ct1) cc(cs1,ct0); Ns=2, Nt=2, V=3
    def r(ct, cs):
        return round(
            math.log((ct + 1) / (2 + 3)) - math.log((cs + 1) / (2 + 3)), 8
        )
    want = round((r(1, 1) + r(0, 1)) / 2, 6)
    assert got.n_tokens == 2
    assert got.importance == pytest.approx(want, abs=1e-9)


def test_table_profile_stats(spark):
    from faiss_vector_search_spark.operators import analytics

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b"), (None, "b")],
        "k long, v string",
    )
    got = {r.column: r for r in analytics.table_profile(df, ("k", "v")).collect()}
    assert got["k"].n_rows == 4 and got["k"].n_nulls == 1
    assert got["k"].n_distinct == 2
    assert got["k"].min_value == "1" and got["k"].max_value == "2"
    assert got["v"].n_nulls == 1 and got["v"].n_distinct == 2
    assert got["v"].min_value == "a" and got["v"].max_value == "b"
