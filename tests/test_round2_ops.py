"""Property gates for the §2d round-2 operators: sketch error bounds,
window multiplicity, rollup consistency, scaling range — the checks
that hold beyond what the sf0.01 oracle hash pins down."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from faiss_vector_search_spark import io as fio
from faiss_vector_search_spark.operators import analytics, lexical, textstats


@pytest.fixture(scope="module")
def events(spark, sf_medium):
    return fio.load_table(spark, sf_medium, "events").cache()


@pytest.fixture(scope="module")
def docs(spark, sf_medium):
    return fio.load_table(spark, sf_medium, "documents").cache()


def test_hll_error_bounded_vs_exact(events):
    exact = {
        r.event_type: r.n_users
        for r in analytics.distinct_users_by_type(events).collect()
    }
    approx = {
        r.event_type: r.n_users_approx
        for r in analytics.approx_distinct_users(events, rsd=0.05).collect()
    }
    assert exact.keys() == approx.keys()
    for et, n in exact.items():
        assert abs(approx[et] - n) / n <= 0.15, (et, n, approx[et])


def test_hopping_window_multiplicity(events):
    """Every event lands in exactly window/hop windows: total n_events
    across windows = 2 × corpus."""
    total = (
        analytics.hopping_window_agg(events)
        .agg(F.sum("n_events"))
        .first()[0]
    )
    assert total == 2 * events.count()


def test_hopping_windows_align_to_hop(events):
    starts = analytics.hopping_window_agg(events).select("window_start_us")
    misaligned = starts.where(
        F.col("window_start_us") % 1_800_000_000 != 0
    ).count()
    assert misaligned == 0


def test_rollup_levels_are_consistent(spark, sf_medium):
    li = fio.load_table(spark, sf_medium, "lineitem")
    out = analytics.pricing_rollup(li).collect()
    detail = sum(r.n_rows for r in out if r.level == 0)
    subtotal = sum(r.n_rows for r in out if r.level == 1)
    grand = [r.n_rows for r in out if r.level == 3]
    assert len(grand) == 1
    assert detail == subtotal == grand[0] == li.count()


def test_minmax_scaled_in_unit_range(events):
    stats = (
        analytics.minmax_scale_events(events)
        .agg(F.min("scaled").alias("lo"), F.max("scaled").alias("hi"))
        .first()
    )
    assert stats.lo >= 0.0 and stats.hi <= 1.0
    # every type hits both ends of its range
    per_type = (
        analytics.minmax_scale_events(events)
        .groupBy("event_type")
        .agg(F.min("scaled").alias("lo"), F.max("scaled").alias("hi"))
        .collect()
    )
    for r in per_type:
        assert r.lo == 0.0 and r.hi == 1.0


def test_rolling_counts_capped_at_frame(events):
    out = analytics.rolling_user_activity(events, frame=5)
    assert out.where(F.col("roll_n") > 5).count() == 0
    assert out.where(F.col("roll_n") < 1).count() == 0
    assert out.count() == events.count()


def test_tfidf_ranks_dense_per_doc(docs):
    out = analytics  # noqa: F841  (clarity: lexical op under test)
    tfidf = lexical.tfidf_topk_terms(docs, k=5).cache()
    per_doc = tfidf.groupBy("doc_id").agg(
        F.count("*").alias("n"),
        F.min("rk").alias("lo"),
        F.max("rk").alias("hi"),
    )
    bad = per_doc.where(
        (F.col("lo") != 1) | (F.col("hi") != F.col("n")) | (F.col("n") > 5)
    )
    assert bad.count() == 0


def test_quantiles_monotone_per_type(events):
    rows = analytics.event_value_quantiles(events).collect()
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r.event_type, {})[r.pos] = r.q
    for et, qs in by_type.items():
        assert qs[1] <= qs[2] <= qs[3] <= qs[4], (et, qs)


def test_doc_length_histogram_covers_corpus(docs):
    h = textstats.doc_length_histogram(docs)
    assert h.agg(F.sum("n_docs")).first()[0] == docs.count()
    bad = h.where(
        (F.col("min_chars") < F.col("bucket") * 50)
        & (F.col("bucket") < 19)
    )
    assert bad.count() == 0


def test_hash_split_stable_under_corpus_growth(docs):
    """A doc's split assignment must not change when the corpus
    grows — the property random splits lack."""
    full = {
        r.doc_id: r.split for r in textstats.hash_split(docs).collect()
    }
    subset = {
        r.doc_id: r.split
        for r in textstats.hash_split(docs.where("doc_id < 100")).collect()
    }
    assert subset == {k: v for k, v in full.items() if k < 100}
    # proportions roughly honored
    from collections import Counter
    c = Counter(full.values())
    n = len(full)
    assert 0.7 < c["train"] / n < 0.9
    assert c["train"] + c["val"] + c["test"] == n


def test_hash_split_rejects_bad_weights(docs):
    with pytest.raises(ValueError, match="sum to 1"):
        textstats.hash_split(docs, splits=(("a", 0.5), ("b", 0.2)))
