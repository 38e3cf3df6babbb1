"""Property gates for the round-3 operators: outer-join histogram
conservation, max-of-agg consistency, EXISTS/NOT-EXISTS equivalence
to a direct reformulation, line-dedup invariants on synthetic docs,
and exact mixture proportions — the semantics the sf0.01 oracle hash
alone does not explain."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from faiss_vector_search_spark import io as fio
from faiss_vector_search_spark.operators import analytics, dedup, textstats


@pytest.fixture(scope="module")
def tabs(spark, sf_medium):
    return {
        n: fio.load_table(spark, sf_medium, n)
        for n in ("customer", "orders", "lineitem", "supplier", "part")
    }


@pytest.fixture(scope="module")
def docs(spark, sf_medium):
    return fio.load_table(spark, sf_medium, "documents").cache()


class TestCustomerOrderDistribution:
    def test_conserves_customers_and_orders(self, tabs):
        dist = analytics.customer_order_distribution(
            tabs["customer"], tabs["orders"]
        )
        agg = dist.agg(
            F.sum("custdist").alias("n_cust"),
            F.sum(F.col("c_count") * F.col("custdist")).alias("n_orders"),
        ).first()
        assert agg.n_cust == tabs["customer"].count()
        assert (
            agg.n_orders
            == tabs["orders"]
            .where(F.col("o_orderpriority") != "5-LOW")
            .join(tabs["customer"], F.col("o_custkey") == F.col("c_custkey"), "left_semi")
            .count()
        )

    def test_zero_bucket_counts_orderless_customers(self, tabs):
        dist = analytics.customer_order_distribution(
            tabs["customer"], tabs["orders"]
        )
        zero = {r.c_count: r.custdist for r in dist.collect()}.get(0, 0)
        with_orders = (
            tabs["orders"]
            .where(F.col("o_orderpriority") != "5-LOW")
            .select("o_custkey")
            .distinct()
            .join(
                tabs["customer"],
                F.col("o_custkey") == F.col("c_custkey"),
                "left_semi",
            )
            .count()
        )
        assert zero == tabs["customer"].count() - with_orders


class TestPromoRevenueShare:
    def test_share_matches_two_pass_recompute(self, tabs):
        row = analytics.promo_revenue_share(
            tabs["lineitem"], tabs["part"]
        ).first()
        assert 0.0 <= row.promo_share <= 100.0
        rev = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        base = tabs["lineitem"].where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        ).join(
            tabs["part"], F.col("l_partkey") == F.col("p_partkey")
        )
        total = base.agg(rev).first()[0]
        promo = base.where(F.col("p_type") == "PROMO").agg(rev).first()[0]
        assert row.promo_share == pytest.approx(100.0 * promo / total, abs=1e-5)
        assert row.total_revenue == pytest.approx(total, abs=0.02)

    def test_plan_broadcasts_part_dim(self, tabs):
        df = analytics.promo_revenue_share(tabs["lineitem"], tabs["part"])
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan


class TestTopSupplierRevenue:
    def test_winner_achieves_recomputed_max(self, tabs):
        out = analytics.top_supplier_revenue(
            tabs["lineitem"], tabs["supplier"]
        ).collect()
        assert len(out) >= 1
        per_supp = (
            tabs["lineitem"]
            .where(
                (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
                & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
            )
            .groupBy("l_suppkey")
            .agg(
                F.round(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
                ).alias("rev")
            )
        )
        mx = per_supp.agg(F.max("rev")).first()[0]
        assert {r.total_revenue for r in out} == {mx}
        winners = {
            r.l_suppkey for r in per_supp.where(F.col("rev") == mx).collect()
        }
        assert {r.s_suppkey for r in out} == winners

    def test_no_global_sort_in_plan(self, tabs):
        df = analytics.top_supplier_revenue(tabs["lineitem"], tabs["supplier"])
        plan = df._jdf.queryExecution().executedPlan().toString()
        # max-of-agg broadcasts a scalar back; it must not plan a
        # global ordering of the revenue view
        assert "TakeOrderedAndProject" not in plan
        assert plan.count("BroadcastHashJoin") >= 2


class TestSoleReturnedSupplier:
    def test_equals_direct_reformulation(self, tabs):
        """The semi+anti pair must equal the direct per-order
        formulation: orders with >= 2 suppliers and EXACTLY ONE
        returning supplier, counted per that supplier."""
        li = tabs["lineitem"]
        per_order = (
            li.select("l_orderkey", "l_suppkey", "l_returnflag")
            .groupBy("l_orderkey")
            .agg(
                F.count_distinct("l_suppkey").alias("n_supp"),
                F.count_distinct(
                    F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
                ).alias("n_ret"),
                F.first(
                    F.when(F.col("l_returnflag") == "R", F.col("l_suppkey")),
                    ignorenulls=True,
                ).alias("any_ret_supp"),
            )
            .where((F.col("n_supp") >= 2) & (F.col("n_ret") == 1))
        )
        # n_ret == 1 makes any_ret_supp deterministic (single candidate)
        expected = {
            (r.any_ret_supp, r.cnt)
            for r in per_order.groupBy("any_ret_supp")
            .agg(F.count("*").alias("cnt"))
            .collect()
        }
        got = {
            (r.s_suppkey, r.numwait)
            for r in analytics.sole_returned_supplier(
                li, tabs["supplier"]
            ).collect()
        }
        assert got == expected

    def test_plan_single_scan_no_self_joins(self, tabs):
        # r11 rewrite: the EXISTS + NOT EXISTS self-join pair is a
        # per-order decision, so the plan is ONE lineitem scan feeding
        # stacked aggregations — no semi/anti self-joins, no repeated
        # scans (the former shape read lineitem three times)
        df = analytics.sole_returned_supplier(tabs["lineitem"], tabs["supplier"])
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "LeftSemi" not in plan and "LeftAnti" not in plan
        assert plan.count("Scan parquet") <= 2  # lineitem + supplier


class TestLineDedup:
    @pytest.fixture(scope="class")
    def synth(self, spark):
        shared = " ".join(f"boiler{i}" for i in range(10))
        rows = [
            (1, shared + " alpha beta gamma one two three four five six seven"),
            (2, shared + " delta epsilon zeta one two three four five six eight"),
            (3, "unique words only here nothing repeats across any documents at all"),
        ]
        return spark.createDataFrame(rows, ["doc_id", "text"])

    def test_shared_span_dropped_unique_kept(self, synth):
        out = {r.doc_id: r for r in dedup.line_dedup(synth).collect()}
        # docs 1 and 2 lose exactly the shared 10-token span
        for d in (1, 2):
            assert out[d].n_dropped == 1 and out[d].n_kept == out[d].n_lines - 1
            assert "boiler0" not in out[d].clean_text
        # doc 3 is untouched: clean_text == its normalized token stream
        assert out[3].n_dropped == 0
        assert out[3].clean_text == (
            "unique words only here nothing repeats across any documents at all"
        )

    def test_counts_are_conserved(self, docs):
        out = dedup.line_dedup(docs)
        assert (
            out.where(
                F.col("n_kept") + F.col("n_dropped") != F.col("n_lines")
            ).count()
            == 0
        )
        assert out.count() == docs.count()

    def test_hash_profiles_agree(self, docs):
        md5 = dedup.line_dedup(docs, hash_fn="md5")
        xx = dedup.line_dedup(docs, hash_fn="xxhash64")
        assert md5.exceptAll(xx).count() == 0 and xx.exceptAll(md5).count() == 0


class TestDomainMixSample:
    MIX = {"src0": 400, "src1": 300, "src2": 200, "src3": 100}

    def test_proportions_are_exact_quotas(self, docs):
        out = textstats.domain_mix_sample(docs, self.MIX)
        got = {r.source: r.cnt for r in out.groupBy("source").agg(F.count("*").alias("cnt")).collect()}
        n_d = {
            r.source: r.cnt
            for r in docs.where(F.col("source").isin(*self.MIX))
            .groupBy("source")
            .agg(F.count("*").alias("cnt"))
            .collect()
        }
        n_out = min(n_d[d] * 1000 // w for d, w in self.MIX.items())
        expected = {d: n_out * w // 1000 for d, w in self.MIX.items()}
        assert got == {d: c for d, c in expected.items() if c > 0}

    def test_deterministic_and_domain_closed(self, docs):
        a = sorted(map(tuple, textstats.domain_mix_sample(docs, self.MIX).collect()))
        b = sorted(map(tuple, textstats.domain_mix_sample(docs, self.MIX).collect()))
        assert a == b
        assert {s for _, s in a} <= set(self.MIX)

    def test_rejects_bad_weights(self, docs):
        with pytest.raises(ValueError, match="per-mille"):
            textstats.domain_mix_sample(docs, {"src0": 400, "src1": 300})


class TestReturnedItemReport:
    def test_topk_is_suffix_of_full_ranking(self, tabs, spark, sf_medium):
        nation = fio.load_table(spark, sf_medium, "nation")
        out = analytics.returned_item_report(
            tabs["customer"], tabs["orders"], tabs["lineitem"], nation
        ).collect()
        assert 0 < len(out) <= 20
        revs = [r.revenue for r in out]
        assert revs == sorted(revs, reverse=True)
        # every reported row's revenue recomputes exactly (full
        # ranking rebuilt without the top-k operator)
        full = (
            tabs["lineitem"]
            .where(F.col("l_returnflag") == "R")
            .join(
                tabs["orders"].where(
                    (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
                    & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
                ),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .join(
                tabs["customer"], F.col("o_custkey") == F.col("c_custkey")
            )
            .groupBy("c_custkey")
            .agg(
                F.round(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                    2,
                ).alias("revenue")
            )
        )
        top = {(r.c_custkey, r.revenue) for r in out}
        allrows = {(r.c_custkey, r.revenue) for r in full.collect()}
        assert top <= allrows
        cutoff = min(r.revenue for r in out)
        better = [r for r in allrows if r[1] > cutoff]
        assert len(better) <= 20

    def test_nation_broadcast_filters_pushed(self, tabs, spark, sf_medium):
        nation = fio.load_table(spark, sf_medium, "nation")
        df = analytics.returned_item_report(
            tabs["customer"], tabs["orders"], tabs["lineitem"], nation
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)" in plan


class TestSupplierCountByPart:
    def test_excluded_suppliers_never_counted(self, tabs):
        out = analytics.supplier_count_by_part(
            tabs["lineitem"], tabs["part"], tabs["supplier"]
        )
        assert out.count() > 0
        # recompute one group straight from the tables
        bad = {
            r.s_suppkey
            for r in tabs["supplier"]
            .where(F.col("s_acctbal") < 0)
            .collect()
        }
        row = out.first()
        pairs = (
            tabs["lineitem"]
            .join(
                tabs["part"].where(
                    (F.col("p_brand") == row.p_brand)
                    & (F.col("p_type") == row.p_type)
                    & (F.col("p_size") == row.p_size)
                ),
                F.col("l_partkey") == F.col("p_partkey"),
            )
            .select("l_suppkey")
            .distinct()
            .collect()
        )
        expect = len({r.l_suppkey for r in pairs} - bad)
        assert row.supplier_cnt == expect

    def test_plan_has_anti_join_and_broadcast_part(self, tabs):
        df = analytics.supplier_count_by_part(
            tabs["lineitem"], tabs["part"], tabs["supplier"]
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "LeftAnti" in plan and "BroadcastHashJoin" in plan


class TestApproxQuantiles:
    def test_rank_error_bounded(self, spark, sf_medium):
        """Each sketch quantile's RANK must be within 2/accuracy of
        the target rank (percentile_approx returns real data points,
        so the gate is rank-based, not value-based; 6dp output
        rounding adds the <=-rank slack)."""
        events = fio.load_table(spark, sf_medium, "events")
        acc = 10000
        eps = 2.0 / acc
        approx = analytics.approx_event_value_quantiles(events, acc).collect()
        from faiss_vector_search_spark.operators.analytics import QUANTILE_PROBS

        n_by_type = {
            r.event_type: r.n
            for r in events.groupBy("event_type").agg(F.count("*").alias("n")).collect()
        }
        for row in approx:
            p = QUANTILE_PROBS[row.pos - 1]
            n = n_by_type[row.event_type]
            # 6dp rounding can nudge q below its sample; measure the
            # rank window around the rounded value generously
            r_lo, r_hi = (
                events.where(F.col("event_type") == row.event_type)
                .agg(
                    F.sum((F.col("value") < row.q - 1e-6).cast("long")),
                    F.sum((F.col("value") <= row.q + 1e-6).cast("long")),
                )
                .first()
            )
            target = p * n
            assert r_lo - eps * n <= target <= r_hi + eps * n, (
                row.event_type, p, row.q, r_lo, r_hi, n,
            )

    def test_same_shape_as_exact_twin(self, spark, sf_medium):
        events = fio.load_table(spark, sf_medium, "events")
        a = analytics.approx_event_value_quantiles(events)
        e = analytics.event_value_quantiles(events)
        assert a.columns == e.columns
        assert a.count() == e.count()
