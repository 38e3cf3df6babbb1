"""Relational/analytics plans (SURVEY.md §2c): classic join/agg/window
shapes over the TPC-H-ish tables plus event sessionization — the
"rest of the engine" a reference user gets from a general query
layer.

Plan-shape notes (100 TB posture):
- dims (nation, customer at rollup grain) broadcast; facts never
  round-trip through the driver.
- aggregations are partial (map-side combine) by construction of
  groupBy + sum/count.
- sessionization shuffles once on user_id and runs lag/sum windows
  within the partition — the canonical Spark formulation.
- money sums round to 2dp, ratios to 6dp, emitted as plain DOUBLE:
  rounded doubles are bit-identical across Spark and DuckDB, and
  float64 surfaces identically from toPandas/.df() (a DECIMAL output
  would string-format differently — '1.00' vs '1.0' — and fail the
  driver's value hash even when values are equal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEC = "double"
MONEY = "double"


def pricing_summary(lineitem: DataFrame, cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1 shape: one wide partial-aggregable groupBy."""
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        lineitem.where(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).cast(MONEY).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).cast(MONEY).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).cast(MONEY).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).cast(MONEY).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).cast(DEC).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).cast(DEC).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).cast(DEC).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def top_customers_by_nation(
    customer: DataFrame, orders: DataFrame, nation: DataFrame, top_n: int = 3
) -> DataFrame:
    """Revenue per customer, top-N per nation. Customer/nation joins
    broadcast; fact aggregates before joining dims (agg-below-join
    keeps the shuffle on the pre-aggregated, smaller side)."""
    rev = orders.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).cast(MONEY).alias("revenue")
    )
    joined = (
        rev.join(
            F.broadcast(customer.select("c_custkey", "c_name", "c_nationkey")),
            rev["o_custkey"] == F.col("c_custkey"),
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    w = Window.partitionBy("n_name").orderBy(
        F.col("revenue").desc(), F.col("c_custkey").asc()
    )
    return (
        joined.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= top_n)
        .select(
            "n_name",
            "c_custkey",
            "revenue",
            F.col("rk").cast("int").alias("rk"),
        )
    )


def part_revenue_share(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Revenue by brand with share-of-total window over the aggregate
    (window input is ~|brands| rows — the expensive work happened in
    the partial agg below it)."""
    rev = (
        lineitem.join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            lineitem["l_partkey"] == F.col("p_partkey"),
        )
        .groupBy("p_brand")
        .agg(
            # keep the per-brand revenue DECIMAL *internally*: the
            # share-of-total window then sums decimals exactly, so the
            # grand total can't drift by summation order the way a
            # double sum could. Only the output columns are double.
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).cast("decimal(18,2)").alias("rev_d")
        )
    )
    total = Window.partitionBy()
    # divide as doubles (exact decimal total → correctly-rounded double)
    # so the ratio is bit-identical to the oracle's double division.
    return rev.select(
        "p_brand",
        F.col("rev_d").cast("double").alias("revenue"),
        F.round(
            F.col("rev_d").cast("double")
            / F.sum("rev_d").over(total).cast("double"),
            6,
        ).alias("share"),
    )


SESSION_GAP_MIN = 30


def _ts_us(events: DataFrame):
    """Event time in µs since epoch. The events parquet stores
    TIMESTAMP(NANOS) which we read as long ns (see io.load_table);
    ns→µs truncation matches DuckDB's micros-at-read truncation."""
    if dict(events.dtypes)["ts"] == "bigint":
        # integer div — ts ~1.7e18 exceeds double's 2^53 exact range,
        # so float division would corrupt the low digits.
        return F.expr("ts div 1000")
    return F.unix_micros("ts")


def event_hour(events: DataFrame):
    """Tumbling-hour bucket as a timestamp, nanos-safe."""
    if dict(events.dtypes)["ts"] == "bigint":
        return F.date_trunc("hour", F.timestamp_micros(_ts_us(events)))
    return F.date_trunc("hour", F.col("ts"))


def sessionize(events: DataFrame, gap_minutes: int = SESSION_GAP_MIN) -> DataFrame:
    """Gap-based sessionization: one shuffle on user_id, then
    lag + running-sum windows inside each partition. Output: per-user
    session count and event count."""
    gap_us = gap_minutes * 60 * 1_000_000
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts_us").asc(), F.col("event_id").asc()
    )
    with_new = events.select(
        "user_id",
        "event_id",
        _ts_us(events).alias("ts_us"),
    ).withColumn(
        "new_session",
        F.when(
            F.col("ts_us") - F.lag("ts_us").over(w) > gap_us, 1
        ).otherwise(0),
    )
    return with_new.groupBy("user_id").agg(
        (F.sum("new_session") + 1).cast("bigint").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


def tumbling_window_agg(events: DataFrame) -> DataFrame:
    """Hourly tumbling windows per event type (the batch equivalent of
    the streaming windowed agg in streaming/)."""
    return (
        events.groupBy(
            event_hour(events).alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).cast(MONEY).alias("sum_value"),
            F.round(F.avg("value"), 6).cast(DEC).alias("avg_value"),
        )
    )


def shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    cutoff: str = "1998-06-30",
    top_n: int = 10,
) -> DataFrame:
    """TPC-H Q3 shape: segment-filtered customers, straddling-date
    join, revenue per order, top-N. Customer dim broadcasts; the
    orders/lineitem join shuffles on orderkey with both sides
    pre-filtered at the scan (pushed date predicates)."""
    cust = customer.where(F.col("c_mktsegment") == segment).select("c_custkey")
    ords = orders.where(
        F.col("o_orderdate") < F.lit(cutoff).cast("timestamp")
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    items = lineitem.where(
        F.col("l_shipdate") > F.lit(cutoff).cast("timestamp")
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        ords.join(F.broadcast(cust), ords["o_custkey"] == cust["c_custkey"])
        .join(items, ords["o_orderkey"] == items["l_orderkey"])
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(revenue, 2).cast(MONEY).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(top_n)
    )


def regional_supplier_volume(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    region_name: str = "ASIA",
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q5 shape: six-way join keeping only orders where customer
    and supplier share a nation in the region; revenue per nation.

    All dims (region→nation→customer/supplier keys) broadcast; the
    only big shuffle is lineitem⋈orders on orderkey. The
    same-nation predicate rides the joins, not a post-filter."""
    nat = nation.join(
        F.broadcast(region.where(F.col("r_name") == region_name)),
        nation["n_regionkey"] == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    cust = customer.join(
        F.broadcast(nat), customer["c_nationkey"] == nat["n_nationkey"]
    ).select("c_custkey", F.col("n_nationkey").alias("cn_key"), "n_name")
    supp = supplier.join(
        F.broadcast(nat.select("n_nationkey")),
        supplier["s_nationkey"] == nat["n_nationkey"],
    ).select("s_suppkey", F.col("s_nationkey").alias("sn_key"))
    ords = orders.where(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        lineitem.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(ords, F.col("l_orderkey") == ords["o_orderkey"])
        .join(F.broadcast(cust), F.col("o_custkey") == cust["c_custkey"])
        .join(F.broadcast(supp), F.col("l_suppkey") == supp["s_suppkey"])
        .where(F.col("cn_key") == F.col("sn_key"))
        .groupBy("n_name")
        .agg(F.round(revenue, 2).cast(MONEY).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


def asof_join_events(
    events: DataFrame,
    left_type: str = "purchase",
    right_type: str = "view",
) -> DataFrame:
    """As-of join: each ``left_type`` event matched to the most recent
    ``right_type`` event at-or-before it for the same user — the
    operator Spark lacks natively (time-series point-in-time joins).

    Union-tag formulation: tag both sides, union, ONE shuffle on
    user_id, one sort on (ts, side, id), and a running ``last(...,
    ignoreNulls)`` window carries the latest right-side id forward
    into each left row. This is the scale shape — a naive
    per-left-row lookup is a correlated O(n·m) join; this is
    O((n+m) log(n+m)) partition-local after a single exchange.
    Tie-break: same-timestamp right events sort before left (side 0 <
    side 1) so "at-or-before" includes ties; among equal-ts right
    events the highest event_id wins.
    """
    base = events.select(
        "user_id", "event_id", _ts_us(events).alias("ts_us"), "event_type"
    )
    right = base.where(F.col("event_type") == right_type).select(
        "user_id",
        "ts_us",
        F.lit(0).alias("side"),
        F.col("event_id"),
        F.col("event_id").alias("r_event_id"),
    )
    left = base.where(F.col("event_type") == left_type).select(
        "user_id",
        "ts_us",
        F.lit(1).alias("side"),
        F.col("event_id"),
        F.lit(None).cast("bigint").alias("r_event_id"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts_us").asc(), F.col("side").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        right.unionByName(left)
        .withColumn("matched", F.last("r_event_id", ignorenulls=True).over(w))
        .where(F.col("side") == 1)
        .select(
            F.col("event_id"),
            F.col("user_id"),
            F.col("ts_us"),
            F.col("matched").alias("matched_event_id"),
        )
    )


def range_join_events(
    events: DataFrame,
    left_type: str = "error",
    right_type: str = "click",
    window_us: int = 60_000_000,
) -> DataFrame:
    """Range join: count ``right_type`` events within ±window of each
    ``left_type`` event — the interval-predicate join that naively
    plans as an O(n·m) nested loop.

    Bucketization makes it scan-shaped: both sides bucket by
    ``ts div window``; a left row can only match rights in its own or
    the two adjacent buckets, so exploding the left to 3 candidate
    buckets turns the theta join into an equi-join on bucket + a
    residual |Δt| filter. Join input is 3·n rows instead of n·m
    pairs; the equi-join shuffles on bucket and AQE splits any hot
    bucket."""
    base = events.select(
        "event_id", _ts_us(events).alias("ts_us"), "event_type"
    )
    left = base.where(F.col("event_type") == left_type).select(
        F.col("event_id"),
        F.col("ts_us"),
        F.explode(
            F.array(
                F.expr(f"ts_us div {window_us} - 1"),
                F.expr(f"ts_us div {window_us}"),
                F.expr(f"ts_us div {window_us} + 1"),
            )
        ).alias("bucket"),
    )
    right = base.where(F.col("event_type") == right_type).select(
        F.col("ts_us").alias("r_ts_us"),
        F.expr(f"ts_us div {window_us}").alias("bucket"),
    )
    matches = (
        left.join(right, "bucket")
        .where(F.abs(F.col("r_ts_us") - F.col("ts_us")) <= window_us)
        .groupBy("event_id")
        .agg(F.count("*").alias("n_nearby"))
    )
    all_left = base.where(F.col("event_type") == left_type).select("event_id")
    return all_left.join(matches, "event_id", "left").select(
        "event_id",
        F.coalesce(F.col("n_nearby"), F.lit(0)).cast("bigint").alias("n_nearby"),
    )


def order_priority_check(
    orders: DataFrame,
    lineitem: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1996-07-01",
    min_discount: float = 0.08,
) -> DataFrame:
    """TPC-H Q4 shape: orders per priority having at least one
    qualifying lineitem — the EXISTS pattern, planned as a left-semi
    join (probe side streams, no duplication, no distinct needed)."""
    ords = orders.where(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
    )
    qualifying = lineitem.where(F.col("l_discount") >= min_discount).select(
        F.col("l_orderkey")
    )
    return (
        ords.join(
            qualifying, ords["o_orderkey"] == qualifying["l_orderkey"], "leftsemi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )
