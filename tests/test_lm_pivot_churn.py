"""Gates for the bigram-LM fluency scorer, explicit-values PIVOT, and
cohort-churn set operation (SURVEY.md §2e #124-126)."""

from __future__ import annotations

import contextlib
import io as pyio

import pytest
from pyspark.sql import functions as F

from faiss_vector_search_spark import io as fio
from faiss_vector_search_spark.functions import text as text_fn
from faiss_vector_search_spark.operators import analytics, lm


def plan_of(df, mode: str = "formatted") -> str:
    buf = pyio.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def n_shuffles(df) -> int:
    # "Exchange hashpartitioning" only appears on one line in SIMPLE
    # mode; formatted mode splits the operator name from its arguments
    # and silently under-counts.
    return plan_of(df, "simple").count("Exchange hashpartitioning")


@pytest.fixture(scope="module")
def docs(spark, sf_small):
    return fio.load_table(spark, sf_small, "documents")


@pytest.fixture(scope="module")
def events(spark, sf_small):
    return fio.load_table(spark, sf_small, "events")


# --- bigram LM ------------------------------------------------------------


def test_lm_probabilities_sum_to_one_per_context(docs):
    model = lm.bigram_lm_train(docs)
    sums = (
        model.groupBy("prev")
        .agg(F.sum(F.col("prob").cast("double")).alias("s"))
        .collect()
    )
    assert sums
    for r in sums:
        # each context's outgoing probabilities are an 8-dp-rounded
        # partition of 1 — allow rounding slack of one ulp per branch
        assert abs(r.s - 1.0) < 1e-4, f"P(.|{r.prev}) sums to {r.s}"


def test_lm_score_bounds_and_coverage(docs):
    model = lm.bigram_lm_train(docs)
    out = lm.bigram_lm_score(docs, model).collect()
    # mirror the engine's tokens() (empty strings filtered): a raw
    # split() counts the empty trailing element of "word." and would
    # overshoot on any doc with one real token plus trailing punct
    n_scoreable = docs.where(F.size(text_fn.tokens(F.col("text"))) >= 2).count()
    assert len(out) == n_scoreable
    for r in out:
        assert 0.0 <= r.fluency <= 1.0
        assert r.n_transitions >= 1


def test_lm_scores_new_docs_with_unseen_fallback(spark, docs):
    model = lm.bigram_lm_train(docs)
    new = spark.createDataFrame(
        [(900001, "zzzunseen wordpair table scan value")], ["doc_id", "text"]
    )
    row = lm.bigram_lm_score(new, model, unseen_prob=0.0).collect()[0]
    # the unseen transition scores 0 instead of dropping the row
    assert row.n_transitions == 4
    assert 0.0 <= row.fluency < 1.0


def test_lm_train_shuffles_fact_once(docs):
    # exactly two exchanges: the map-side-combined (prev, cur) agg
    # (the only one that sees exploded-fact-sized data) and the
    # context-total window's re-cluster on prev (model-sized)
    model = lm.bigram_lm_train(docs)
    assert n_shuffles(model) == 2, plan_of(model, "simple")


# --- pivot ----------------------------------------------------------------


def test_pivot_counts_match_long_form(events):
    wide = {
        r.user_id: r for r in analytics.event_type_pivot(events).collect()
    }
    long = (
        events.groupBy("user_id", "event_type").count().collect()
    )
    for r in long:
        assert getattr(wide[r.user_id], f"n_{r.event_type}") == r["count"]
    # absent types are zero-filled
    totals = events.groupBy("user_id").count().collect()
    for t in totals:
        w = wide[t.user_id]
        assert (
            w.n_click + w.n_error + w.n_purchase + w.n_signup + w.n_view
            == t["count"]
        )


def test_pivot_single_shuffle_no_domain_scan(events):
    out = analytics.event_type_pivot(events)
    # conditional-agg pivot → ONE map-side-combinable aggregate pair,
    # one exchange, one scan (the built-in pivot() plans two of each)
    assert n_shuffles(out) == 1, plan_of(out, "simple")
    # simple mode: formatted repeats the node name in the detail block
    assert plan_of(out, "simple").count("Scan parquet") == 1


# --- churn ----------------------------------------------------------------


def test_churned_buyers_against_manual_sets(spark, sf_small):
    orders = fio.load_table(spark, sf_small, "orders")
    customer = fio.load_table(spark, sf_small, "customer")
    nation = fio.load_table(spark, sf_small, "nation")
    out = analytics.churned_buyers(orders, customer, nation)
    total = sum(r.n_churned for r in out.collect())

    def buyers(year):
        return {
            r.o_custkey
            for r in orders.where(
                (F.col("o_orderdate") >= F.lit(f"{year}-01-01").cast("timestamp"))
                & (
                    F.col("o_orderdate")
                    < F.lit(f"{year + 1}-01-01").cast("timestamp")
                )
            )
            .select("o_custkey")
            .distinct()
            .collect()
        }

    assert total == len(buyers(1996) - buyers(1997))


# --- weighted sampling ----------------------------------------------------


def test_weighted_sample_plan_and_determinism(spark, sf_small):
    from faiss_vector_search_spark.operators import textstats

    docs = fio.load_table(spark, sf_small, "documents")
    out = textstats.weighted_sample(docs, n=50, weight_col=F.col("n_chars"))
    assert "TakeOrderedAndProject" in plan_of(out, "simple")
    a = [r.doc_id for r in out.collect()]
    b = [r.doc_id for r in out.collect()]
    assert a == b and len(a) == 50 and len(set(a)) == 50


def test_weighted_sample_favors_heavy_rows(spark):
    from faiss_vector_search_spark.operators import textstats

    # 500 light rows (w=1) + 500 heavy rows (w=100): heavy rows should
    # dominate the sample (E[heavy share] ≈ 100/101 per draw)
    rows = [(i, 1.0 if i < 500 else 100.0) for i in range(1000)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    picked = {
        r.doc_id
        for r in textstats.weighted_sample(
            df, n=100, weight_col=F.col("w")
        ).collect()
    }
    heavy = sum(1 for i in picked if i >= 500)
    assert heavy >= 85, f"only {heavy}/100 heavy rows sampled"


def test_gopher_rules_survives_empty_and_zero_weight(spark):
    """ANSI-mode hardening: empty docs must not throw DIVIDE_BY_ZERO,
    they must fail their flags; zero-weight rows must never sample."""
    from faiss_vector_search_spark.operators import textstats

    docs = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "the cat and the dog went to the "
                                  "park with a ball of yarn and that "
                                  "was the best day of the summer for them")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in textstats.gopher_rules(docs).collect()}
    assert out[1].keep is False and out[1].ok_word_len is False
    assert out[2].keep is False
    df = spark.createDataFrame(
        [(i, 0.0 if i < 5 else 1.0) for i in range(20)], ["doc_id", "w"]
    )
    picked = {
        r.doc_id
        for r in textstats.weighted_sample(df, n=15, weight_col=F.col("w")).collect()
    }
    assert picked == set(range(5, 20))  # zero-weight rows excluded


# --- window breadth -------------------------------------------------------


def test_time_range_rolling_uses_event_time_not_row_count(spark):
    from faiss_vector_search_spark.operators import analytics
    import datetime as dt

    base = dt.datetime(2000, 1, 1, 12, 0, 0)
    rows = [
        (1, base, 1, "click", 1.0, None),
        (2, base + dt.timedelta(minutes=30), 1, "click", 1.0, None),
        (3, base + dt.timedelta(minutes=200), 1, "click", 1.0, None),
    ]
    ev = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double, props string"
    )
    out = {r.event_id: r.n_trailing for r in
           analytics.time_range_rolling(ev, trailing_minutes=60).collect()}
    # event 2 sees event 1 (30 min apart); event 3 sees only itself
    # (200 min gap) — a ROWS-2 frame would wrongly include event 2
    assert out == {1: 1, 2: 2, 3: 1}


def test_value_rank_profile_single_window_pass(spark, sf_small):
    from faiss_vector_search_spark.operators import analytics

    ev = fio.load_table(spark, sf_small, "events")
    out = analytics.value_rank_profile(ev)
    plan = plan_of(out, "simple")
    assert n_shuffles(out) == 1, plan       # one window exchange
    assert plan.count("Sort ") <= 2, plan   # one logical sort (AQE may split)
    rows = out.where(F.col("event_type") == "click").collect()
    assert max(r.pct_rank for r in rows) == 1.0
    assert max(r.cume for r in rows) == 1.0
    assert {r.decile for r in rows} == set(range(1, 11))


def test_unpivot_inverts_pivot_sparsely(spark, sf_small):
    from faiss_vector_search_spark.operators import analytics

    ev = fio.load_table(spark, sf_small, "events")
    m = analytics.event_type_pivot(ev)
    long = analytics.unpivot_user_matrix(m)
    got = {(r.user_id, r.event_type): r.n_events for r in long.collect()}
    want = {
        (r.user_id, r.event_type): r["count"]
        for r in ev.groupBy("user_id", "event_type").count().collect()
    }
    assert got == want  # exact sparse inverse
    assert "Exchange" not in plan_of(long, "simple").split("HashAggregate")[0]


# --- phrase search --------------------------------------------------------


def test_phrase_search_counts_and_punctuation_contract(spark):
    from faiss_vector_search_spark.operators import lexical

    docs = spark.createDataFrame(
        [
            (1, "table scan beats table scan here"),   # 2 hits
            (2, "table scan once"),                    # 1 hit
            (3, "scan table reversed"),                # 0
            (4, "table, scan punctuated"),             # tokens match, text doesn't
            (5, "no phrase at all"),
        ],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: r.n_hits
        for r in lexical.phrase_search(docs, "table scan").collect()
    }
    assert got == {1: 2, 2: 1}
    # without the prefilter the punctuated doc matches on token positions
    got2 = {
        r.doc_id: r.n_hits
        for r in lexical.phrase_search(
            docs, "table scan", use_prefilter=False
        ).collect()
    }
    assert got2 == {1: 2, 2: 1, 4: 1}


def test_phrase_search_plan_shape(spark, sf_small):
    from faiss_vector_search_spark.operators import lexical

    docs = fio.load_table(spark, sf_small, "documents")
    out = lexical.phrase_search(docs, "table scan")
    plan = plan_of(out)
    # Contains prefilter evaluates in the post-scan Filter (parquet
    # can't push Contains) and the tokenizer is staged: split() must
    # appear exactly once in the filter condition, not once per
    # element_at branch
    assert "Contains(lower(text" in plan, plan
    assert "TakeOrderedAndProject" in plan_of(out, "simple")
    # the staged token array keeps the tokenizer OUT of the pre-
    # projection Filter entirely (the positivity filter runs above
    # the top-k); split() appears only in the match projection
    pre_filter = plan.split("Condition : ((isnotnull")[-1].split("\n")[0]
    assert "split(lower" not in pre_filter, pre_filter


def test_near_search_window_and_order_semantics(spark):
    from faiss_vector_search_spark.operators import lexical

    docs = spark.createDataFrame(
        [
            (1, "table x scan"),                 # distance 2, in window
            (2, "scan y z table"),               # reversed, distance 3
            (3, "table a b c d e f scan"),       # distance 7, out of window
            (4, "table scan table"),             # two pairs
            (5, "no match here"),
        ],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: r.n_pairs
        for r in lexical.near_search(docs, "table", "scan", window=3).collect()
    }
    assert got == {1: 1, 2: 1, 4: 2}


def test_near_search_empty_docs_and_words(spark):
    from faiss_vector_search_spark.operators import lexical

    docs = spark.createDataFrame(
        [(1, ""), (2, "table next to scan")], ["doc_id", "text"]
    )
    # empty token arrays must not trip sequence(1,0)/element_at(0)
    got = {r.doc_id for r in
           lexical.near_search(docs, "table", "scan", window=3).collect()}
    assert got == {2}
    import pytest as _pytest
    with _pytest.raises(ValueError):
        lexical.near_search(docs, " ", "scan")


def test_quality_is_null_for_empty_docs_and_profile_mean_aligns(spark):
    from pyspark.sql import functions as F2
    from faiss_vector_search_spark.operators import textstats

    docs = spark.createDataFrame(
        [(1, "", "en", "s", 0), (2, "the cat and the dog went to the park "
                                    "with a ball of red yarn today", "en", "s", 66)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    _, quality = textstats.quality_exprs(F2.col("text"))
    rows = {r.doc_id: r.q for r in
            docs.select("doc_id", quality.alias("q")).collect()}
    assert rows[1] is None          # empty doc: NULL, not 0.375
    assert rows[2] is not None
    prof = {r.metric: r.value for r in
            textstats.corpus_profile(docs).collect()}
    # the mean covers ONLY the scoreable doc — same set as the oracle
    assert abs(prof["mean_quality"] - rows[2]) < 1e-9
