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


# --- round-2 session additions: cube / Q7 / Q19 / gap fill / deciles ------


def test_cube_levels_are_consistent(spark, sf_medium):
    li = fio.load_table(spark, sf_medium, "lineitem")
    out = analytics.pricing_cube(li).collect()
    total = li.count()
    # every grouping-set slice partitions the corpus
    for level in (0, 1, 2):
        assert sum(r.n_rows for r in out if r.level == level) == total
    grand = [r for r in out if r.level == 3]
    assert len(grand) == 1 and grand[0].n_rows == total
    # cube ⊇ rollup: every rollup cell appears identically in the cube
    rollup = {
        (r.l_returnflag, r.l_linestatus, r.level): r.n_rows
        for r in analytics.pricing_rollup(li).collect()
    }
    cube = {
        (r.l_returnflag, r.l_linestatus, r.level): r.n_rows for r in out
    }
    for key, n in rollup.items():
        assert cube[key] == n


def test_gap_fill_spine_is_complete_and_filled(events):
    out = analytics.events_gap_fill(events).collect()
    by_user: dict[int, list] = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r)
    assert len(by_user) == events.select("user_id").distinct().count()
    for rows in by_user.values():
        rows.sort(key=lambda r: r.hour_ts)
        # contiguous hourly spine, no holes
        for a, b in zip(rows, rows[1:]):
            assert (b.hour_ts - a.hour_ts).total_seconds() == 3600
        # forward fill leaves no nulls (spine starts at first observation)
        assert rows[0].is_observed
        assert all(r.value_filled is not None for r in rows)
        # gap rows repeat the last observed value
        last_obs = None
        for r in rows:
            if r.is_observed:
                last_obs = r.value_filled
            else:
                assert r.value_filled == last_obs


def test_gap_fill_observed_rows_match_hourly_means(events):
    out = analytics.events_gap_fill(events)
    n_obs = out.where("is_observed").count()
    n_hours = (
        events.select(
            "user_id",
            (analytics._ts_us(events) / (3600 * 1_000_000)).cast("bigint").alias("b"),
        )
        .distinct()
        .count()
    )
    assert n_obs == n_hours


def test_disjunctive_revenue_equals_union_of_branches(spark, sf_medium):
    li = fio.load_table(spark, sf_medium, "lineitem")
    part = fio.load_table(spark, sf_medium, "part")
    out = {
        r.p_brand: (r.n_items, r.revenue)
        for r in analytics.disjunctive_revenue(li, part).collect()
    }
    joined = li.join(part, F.col("l_partkey") == F.col("p_partkey"))
    branches = {
        "Brand#1": (1, 15, 1.0, 20.0),
        "Brand#12": (10, 30, 5.0, 30.0),
        "Brand#23": (20, 50, 10.0, 40.0),
    }
    for brand, (lo_sz, hi_sz, lo_q, hi_q) in branches.items():
        ref = (
            joined.where(
                (F.col("p_brand") == brand)
                & F.col("p_size").between(lo_sz, hi_sz)
                & F.col("l_quantity").between(lo_q, hi_q)
            )
            .agg(
                F.count("*").alias("n"),
                F.round(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
                ).alias("rev"),
            )
            .first()
        )
        assert out[brand][0] == ref.n


def test_trade_volume_has_both_directions_no_self_pairs(spark, sf_medium):
    t = lambda n: fio.load_table(spark, sf_medium, n)  # noqa: E731
    out = analytics.nation_trade_volume(
        t("lineitem"), t("orders"), t("customer"), t("supplier"), t("nation")
    ).collect()
    pairs = {(r.supp_nation, r.cust_nation) for r in out}
    assert pairs == {("NATION_1", "NATION_2"), ("NATION_2", "NATION_1")}
    assert all(r.revenue > 0 and 1995 <= r.ship_year <= 2001 for r in out)


def test_quality_deciles_partition_the_scored_corpus(docs):
    out = sorted(
        textstats.quality_deciles(docs).collect(), key=lambda r: r.decile
    )
    assert [r.decile for r in out] == list(range(1, 11))
    scored = textstats.quality_score(docs).count()
    assert sum(r.n_docs for r in out) == scored
    # ntile balance: bucket sizes differ by at most one
    sizes = [r.n_docs for r in out]
    assert max(sizes) - min(sizes) <= 1
    # decile score ranges are monotonic and non-overlapping
    for a, b in zip(out, out[1:]):
        assert a.max_q <= b.min_q


def test_grouping_sets_levels_partition_corpus(events):
    out = analytics.events_grouping_sets(events).collect()
    total = events.count()
    for level in (0, 1, 2):
        assert sum(r.n_events for r in out if r.level == level) == total
    # no grand-total row — that's what distinguishes these sets from CUBE
    assert not any(r.level == 3 for r in out)


def test_promo_profit_plan_broadcasts_all_dims(spark, sf_medium):
    t = lambda n: fio.load_table(spark, sf_medium, n)  # noqa: E731
    df = analytics.promo_profit_by_nation(
        t("lineitem"), t("part"), t("supplier"), t("nation")
    )
    plan_buf = df._jdf.queryExecution().executedPlan().toString()
    assert plan_buf.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan_buf  # fact stream never shuffles for joins
