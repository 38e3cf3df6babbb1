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
    """Event time in µs since epoch. Current testdata stores µs
    timestamps (io.load_table normalizes the naive parquet encoding
    to UTC); the bigint branch keeps older nanos-as-long layouts
    working."""
    if dict(events.dtypes)["ts"] == "bigint":
        # integer div — ts ~1.7e18 exceeds double's 2^53 exact range,
        # so float division would corrupt the low digits.
        return F.expr("ts div 1000")
    return F.unix_micros("ts")


def event_hour(events: DataFrame):
    """Tumbling-hour bucket as a timestamp, encoding-agnostic."""
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


def session_stats(
    events: DataFrame, gap_minutes: int = SESSION_GAP_MIN
) -> DataFrame:
    """Session-grained output (one row per session: bounds, size,
    value sum) — :func:`sessionize` rolled one level finer. Same
    single user_id shuffle: lag flags session starts, a running sum
    numbers sessions within the partition, then a groupBy on
    (user, session_id) that re-uses the same partitioning."""
    gap_us = gap_minutes * 60 * 1_000_000
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts_us").asc(), F.col("event_id").asc()
    )
    flagged = events.select(
        "user_id", "event_id", _ts_us(events).alias("ts_us"), "value"
    ).withColumn(
        "new_session",
        F.when(F.col("ts_us") - F.lag("ts_us").over(w) > gap_us, 1).otherwise(0),
    )
    numbered = flagged.withColumn(
        "session_id",
        F.sum("new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint"),
    )
    return numbered.groupBy("user_id", "session_id").agg(
        F.min("ts_us").alias("start_us"),
        F.max("ts_us").alias("end_us"),
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
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


def rolling_user_activity(events: DataFrame, frame: int = 5) -> DataFrame:
    """Per-user rolling activity: moving event count and value average
    over the last ``frame`` events (ROWS frame, not RANGE — the
    training-telemetry "recent behavior" feature shape). One shuffle
    on user_id; the frame computation is partition-local."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts_us").asc(), F.col("event_id").asc())
        .rowsBetween(-(frame - 1), 0)
    )
    return events.select(
        "event_id", "user_id", _ts_us(events).alias("ts_us"), "value"
    ).select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("roll_n"),
        F.round(F.avg("value").over(w), 6).alias("roll_avg"),
    )


def hopping_window_agg(
    events: DataFrame,
    window_us: int = 3_600_000_000,
    hop_us: int = 1_800_000_000,
) -> DataFrame:
    """Hopping (sliding) window aggregation: 1-hour windows every 30
    minutes — each event lands in window_us/hop_us windows. The batch
    equivalent of Structured Streaming's sliding ``F.window``; the
    explode is scan-side (window_us/hop_us rows per event), then one
    partial-aggregable groupBy — no shuffle amplification beyond the
    window multiplicity."""
    if window_us % hop_us != 0:
        raise ValueError("window_us must be a multiple of hop_us")
    r = window_us // hop_us
    base = events.select(
        _ts_us(events).alias("ts_us"), "event_type", "value"
    )
    starts = F.array(
        *[
            (F.expr(f"ts_us div {hop_us}") - i) * hop_us
            for i in range(r)
        ]
    )
    return (
        base.select(
            F.explode(starts).alias("window_start_us"), "event_type", "value"
        )
        .groupBy("window_start_us", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


def customers_without_orders(
    customer: DataFrame, orders: DataFrame, since: str = "1997-06-01"
) -> DataFrame:
    """TPC-H Q22 shape: well-funded customers (above the positive-
    balance average) with no order since ``since``, rolled up per
    nation — the NOT EXISTS pattern planned as a left-anti join
    (probe side streams, no row duplication; the date filter is
    pushed to the orders scan). The scalar average broadcasts."""
    avg_bal = customer.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("ab")
    )
    rich = customer.crossJoin(F.broadcast(avg_bal)).where(
        F.col("c_acctbal") > F.col("ab")
    )
    recent = orders.where(
        F.col("o_orderdate") >= F.lit(since).cast("timestamp")
    ).select("o_custkey")
    return (
        rich.join(recent, rich["c_custkey"] == recent["o_custkey"], "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


def small_quantity_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q17 shape: revenue from lineitems whose quantity is below
    half the part's average quantity, per brand. The correlated scalar
    subquery becomes a pre-aggregation joined back on partkey — the
    per-part avg table is |parts| rows (shuffles tiny), the fact scan
    stays single-pass."""
    part_avg = lineitem.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.5).alias("half_avg_qty")
    )
    return (
        lineitem.join(part_avg, "l_partkey")
        .where(F.col("l_quantity") < F.col("half_avg_qty"))
        .join(F.broadcast(part.select("p_partkey", "p_brand")),
              F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        )
    )


def pricing_rollup(lineitem: DataFrame) -> DataFrame:
    """ROLLUP aggregation: per (returnflag, linestatus), per
    returnflag subtotals, and a grand total in one pass — Spark plans
    a single shuffle with grouping-set expansion, not three scans.
    ``level`` = grouping bitmask (0 = detail row, 3 = grand total)."""
    return (
        lineitem.rollup("l_returnflag", "l_linestatus")
        .agg(
            # grouping() is only resolvable inside the rollup aggregate
            (
                F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus")
            ).cast("int").alias("level"),
            F.count("*").alias("n_rows"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .select("l_returnflag", "l_linestatus", "level", "n_rows", "sum_qty")
    )


def minmax_scale_events(events: DataFrame) -> DataFrame:
    """Per-type min-max feature scaling of the value column — the
    normalization step of a feature pipeline. min/max are exact (no
    summation-order sensitivity), so the scaled doubles are bit-
    deterministic cross-engine. Two-pass shape: tiny per-type
    min/max aggregate broadcast back onto the scan."""
    stats = events.groupBy("event_type").agg(
        F.min("value").alias("vmin"), F.max("value").alias("vmax")
    )
    return (
        events.join(F.broadcast(stats), "event_type")
        .select(
            "event_id",
            "event_type",
            F.when(F.col("vmax") == F.col("vmin"), F.lit(0.0))
            .otherwise(
                F.round(
                    (F.col("value") - F.col("vmin"))
                    / (F.col("vmax") - F.col("vmin")),
                    6,
                )
            )
            .alias("scaled"),
        )
    )


def distinct_users_by_type(events: DataFrame) -> DataFrame:
    """Exact distinct users per event type (the oracle-gated twin of
    :func:`approx_distinct_users`)."""
    return events.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )


def approx_distinct_users(events: DataFrame, rsd: float = 0.05) -> DataFrame:
    """HyperLogLog++ distinct users per event type — the 100 TB path:
    mergeable sketch, map-side partial, shuffles one sketch per
    (partition, type) instead of the user_id universe. Approximate, so
    rows-only gated (tests bound the error vs the exact twin)."""
    return events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd).alias("n_users_approx"),
        F.count("*").alias("n_events"),
    )


QUANTILE_PROBS = (0.25, 0.5, 0.75, 0.9)


def event_value_quantiles(events: DataFrame) -> DataFrame:
    """Exact interpolated percentiles of value per event type (the
    distribution-profiling step before outlier filtering). Spark's
    ``percentile`` and DuckDB's ``quantile_cont`` share the linear-
    interpolation definition and agree bitwise; rounded to 6dp for
    the gate anyway. At 100 TB swap in ``percentile_approx``
    (mergeable t-digest-style sketch) — exact percentile shuffles the
    per-group value multiset."""
    probs = ", ".join(f"{p}D" for p in QUANTILE_PROBS)
    return (
        events.groupBy("event_type")
        .agg(F.expr(f"percentile(value, array({probs}))").alias("qs"))
        .select(
            "event_type",
            F.posexplode("qs").alias("pos", "q"),
        )
        .select(
            "event_type",
            (F.col("pos") + 1).cast("int").alias("pos"),
            F.round("q", 6).alias("q"),
        )
    )


def json_props_rollup(events: DataFrame) -> DataFrame:
    """Aggregate over a JSON payload column: extract ``$.k`` from
    props (semi-structured telemetry) and roll up per k — JSON
    parsing stays JVM-side (``get_json_object``), no Python in the
    loop."""
    return (
        events.select(
            F.get_json_object("props", "$.k").cast("int").alias("k"),
            "value",
        )
        .groupBy("k")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
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


def pricing_cube(lineitem: DataFrame) -> DataFrame:
    """CUBE aggregation: every grouping-set slice over
    (returnflag, linestatus) — detail cells, both one-dimension
    marginals, and the grand total — in ONE shuffle with grouping-set
    expansion (Spark expands the input ~4x map-side; no multi-scan
    union). ``level`` is the grouping bitmask (0 = detail, 1 = per
    returnflag, 2 = per linestatus, 3 = grand total), the same
    encoding as :func:`pricing_rollup`."""
    return (
        lineitem.cube("l_returnflag", "l_linestatus")
        .agg(
            (
                F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus")
            ).cast("int").alias("level"),
            F.count("*").alias("n_rows"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
        )
        .select(
            "l_returnflag", "l_linestatus", "level", "n_rows", "sum_qty",
            "avg_price",
        )
    )


def nation_trade_volume(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    nation_a: str = "NATION_1",
    nation_b: str = "NATION_2",
) -> DataFrame:
    """TPC-H Q7 shape: shipped revenue between two trading nations per
    (supplier nation, customer nation, ship year). Join topology for
    scale: the two big fact tables (lineitem, orders) shuffle-join on
    orderkey; supplier and customer are mid-size dimension joins; the
    25-row nation table broadcasts onto BOTH legs, and the nation-name
    filter applies at the dimension side so non-qualifying suppliers /
    customers drop BEFORE the fact join (Catalyst pushes the IN filter
    into the broadcast build side, shrinking the probe output)."""
    n1 = nation.where(F.col("n_name").isin(nation_a, nation_b)).select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.where(F.col("n_name").isin(nation_a, nation_b)).select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    supp = supplier.join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey")
    ).select("s_suppkey", "supp_nation")
    cust = customer.join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey")
    ).select("c_custkey", "cust_nation")
    return (
        lineitem.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        # cross-pair trades only (a nation does not "trade with" itself)
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        .agg(
            F.count("*").alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
    )


def disjunctive_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR-of-ANDs predicate mixing
    part attributes (brand, size) with lineitem attributes (quantity).
    The part side broadcasts; the disjunction stays ONE whole-stage-
    codegen filter after the join — no union-of-three-scans rewrite
    needed — while the part-only prefilter (brand IN ..., the union of
    branch brands) is pushed to the part scan so the broadcast build
    side only carries qualifying brands."""
    branches = [
        ("Brand#1", 1, 15, 1.0, 20.0),
        ("Brand#12", 10, 30, 5.0, 30.0),
        ("Brand#23", 20, 50, 10.0, 40.0),
    ]
    p = part.where(
        F.col("p_brand").isin([b[0] for b in branches])
    ).select("p_partkey", "p_brand", "p_size")
    cond = None
    for brand, lo_sz, hi_sz, lo_q, hi_q in branches:
        c = (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(lo_sz, hi_sz)
            & F.col("l_quantity").between(lo_q, hi_q)
        )
        cond = c if cond is None else cond | c
    return (
        lineitem.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .where(cond)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
    )


HOUR_US = 3_600 * 1_000_000


def events_gap_fill(events: DataFrame) -> DataFrame:
    """Time-series regularization: resample each user's event stream
    onto an hourly spine (min..max observed hour per user) and
    forward-fill the per-hour mean value across gaps — the
    gap-repair step before windowed feature extraction on irregular
    telemetry. Plan shape: one shuffle on user_id for the per-hour
    aggregate, a tiny per-user bounds aggregate whose sequence()
    spine explodes WITHOUT re-shuffling (same user_id partitioning),
    and one ordered window per user for the fill. The spine is
    bounded by (users x hours-of-history), independent of event
    count — at 100 TB the spine is orders of magnitude smaller than
    the input."""
    hourly = (
        events.select(
            "user_id", (_ts_us(events) / HOUR_US).cast("bigint").alias("bucket"),
            "value",
        )
        .groupBy("user_id", "bucket")
        .agg(F.round(F.avg("value"), 6).alias("v"))
    )
    spine = (
        hourly.groupBy("user_id")
        .agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
        .select(
            "user_id",
            F.explode_outer(F.sequence(F.col("lo"), F.col("hi"))).alias("bucket"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(hourly, ["user_id", "bucket"], "left")
        .select(
            "user_id",
            F.timestamp_micros(F.col("bucket") * HOUR_US).alias("hour_ts"),
            F.last("v", ignorenulls=True).over(w).alias("value_filled"),
            F.col("v").isNotNull().alias("is_observed"),
        )
    )


def promo_profit_by_nation(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    p_type: str = "PROMO",
) -> DataFrame:
    """TPC-H Q9 shape: margin contribution of one product line per
    (supplier nation, ship year). Join topology: the part-type filter
    prunes the smallest dimension FIRST and broadcasts, shrinking the
    fact stream before the supplier/nation legs (also broadcast) —
    the single shuffle left is the final groupBy. Margin proxy =
    revenue − 0.8 × retailprice × qty (the schema carries no
    partsupp.supplycost)."""
    p = part.where(F.col("p_type") == p_type).select(
        "p_partkey", "p_retailprice"
    )
    s = supplier.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        supplier["s_nationkey"] == nation["n_nationkey"],
    ).select("s_suppkey", F.col("n_name").alias("nation"))
    return (
        lineitem.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("nation", F.year("l_shipdate").cast("int").alias("ship_year"))
        .agg(
            F.count("*").alias("n_items"),
            F.round(
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    - F.lit(0.8) * F.col("p_retailprice") * F.col("l_quantity")
                ),
                2,
            ).alias("margin"),
        )
    )


def events_grouping_sets(events: DataFrame) -> DataFrame:
    """Arbitrary GROUPING SETS — the slices a dashboard actually
    wants ((type, hour), (type), (hour)) WITHOUT the grand total a
    cube would force, still one shuffle with grouping-set expansion.
    ``level`` bitmask: 0 = cell, 1 = per type, 2 = per hour.

    The hour bucket materializes as a real column first: grouping()
    resolves grouping columns by NAME, and an inline expression
    appears as three distinct exprs (one per set) it cannot match."""
    base = events.select(
        "event_type", event_hour(events).alias("hour"), "value"
    )
    return (
        base.groupingSets(
            [["event_type", "hour"], ["event_type"], ["hour"]],
            "event_type",
            "hour",
        )
        .agg(
            (
                F.grouping("event_type") * 2 + F.grouping("hour")
            ).cast("int").alias("level"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select("event_type", "hour", "level", "n_events", "sum_value")
    )


def customer_order_distribution(
    customer: DataFrame, orders: DataFrame, exclude_priority: str = "5-LOW"
) -> DataFrame:
    """TPC-H Q13 shape: the distribution of orders-per-customer,
    INCLUDING zero-order customers — the outer-join-then-histogram
    pattern (how many customers placed 0, 1, 2, ... orders).

    Two-level aggregation: customer LEFT OUTER orders (filter on the
    orders side stays in the join, not a WHERE, so empty-match
    customers survive with count 0), count per customer, then a
    second tiny groupBy over the counts. The first shuffle is on
    custkey; the second input is |customers| rows of two ints —
    negligible at any scale."""
    filt = orders.where(F.col("o_orderpriority") != exclude_priority).select(
        "o_custkey", "o_orderkey"
    )
    per_cust = (
        customer.select("c_custkey")
        .join(filt, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


def promo_revenue_share(
    lineitem: DataFrame,
    part: DataFrame,
    start: str = "1997-01-01",
    end: str = "1997-04-01",
) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregation — the share of
    revenue from PROMO parts in a date window, computed as
    sum(CASE)/sum in ONE pass over the filtered fact (no second scan,
    no self-join). The part dim broadcasts; the date filter pushes to
    the lineitem scan."""
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit(start).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(end).cast("timestamp"))
        )
        .join(
            F.broadcast(part.select("p_partkey", "p_type")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                6,
            ).alias("promo_share"),
            F.round(F.sum(rev), 2).alias("total_revenue"),
        )
    )


def top_supplier_revenue(
    lineitem: DataFrame,
    supplier: DataFrame,
    start: str = "1997-01-01",
    end: str = "1997-04-01",
) -> DataFrame:
    """TPC-H Q15 shape: max-of-aggregate — the top supplier(s) by
    quarterly revenue. The revenue view aggregates once (one shuffle
    on suppkey, |suppliers| rows out); its scalar max broadcasts back
    onto itself, so no global sort and no second fact scan. Equality
    against the max is exact: both sides are the same ROUND(_,2)ed
    sum from the same derived table."""
    rev = (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit(start).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(end).cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_revenue")
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("max_revenue"))
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select("s_suppkey", "s_name", "total_revenue")
    )


def sole_returned_supplier(
    lineitem: DataFrame, supplier: DataFrame
) -> DataFrame:
    """TPC-H Q21 shape: the EXISTS + NOT EXISTS self-join pair — per
    supplier, the orders where it shipped a RETURNED line ('R') while
    other suppliers shared the order AND none of THEM had a return
    (the "sole responsible supplier" pattern; Q21 proper keys on
    receipt-vs-commit lateness, which these tables don't carry —
    returnflag is the analogous per-line fault signal).

    A (returned, other-supplier, no-other-return) triple over an order
    is a PER-ORDER decision: (o, s) qualifies iff the order has ≥ 2
    distinct suppliers and exactly one of them — s — shipped a
    returned line. So the EXISTS + NOT EXISTS self-join pair collapses
    to two stacked codegen aggregations: pair-grain (orderkey,
    suppkey) → max(returned) flags, then order-grain counts + the
    lone returned suppkey via max(when(ret, suppkey)) — exact because
    the _nr == 1 filter guarantees a single candidate. One lineitem
    scan and two exchanges replace the former three scans, three
    pair-distinct exchanges and two self-join exchanges (0.99 →
    0.76 s at sf0.1, identical rows; the win compounds at scale where
    the extra scans are not cache-resident). All aggregates are
    primitive (no collect_set), so a mega-order cannot blow a group
    buffer. numwait is the per-supplier qualifying-order count,
    exactly the pair-grained count the join form produced.
    """
    per_order = (
        lineitem.groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(F.col("l_returnflag") == "R").alias("_ret"))
        .groupBy("l_orderkey")
        .agg(
            F.count("*").alias("_ns"),
            F.sum(F.col("_ret").cast("int")).alias("_nr"),
            F.max(F.when(F.col("_ret"), F.col("l_suppkey"))).alias(
                "l_suppkey"
            ),
        )
        .where((F.col("_ns") >= 2) & (F.col("_nr") == 1))
        .select("l_suppkey")
    )
    return (
        per_order.groupBy("l_suppkey")
        .agg(F.count("*").alias("numwait"))
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select("s_suppkey", "s_name", "numwait")
    )


def approx_event_value_quantiles(
    events: DataFrame, accuracy: int = 10000
) -> DataFrame:
    """The 100 TB twin of :func:`event_value_quantiles`:
    ``percentile_approx`` (a mergeable Greenwald-Khanna-style sketch)
    replaces the exact per-group value-multiset shuffle with map-side
    partial sketches of bounded size — rank error ≤ 1/accuracy.
    Same output shape as the exact operator so the two are drop-in
    swappable; gated by a rank-error-bound pytest against the exact
    twin (sketch internals are engine-specific, so no SQL oracle)."""
    probs = ", ".join(f"{p}D" for p in QUANTILE_PROBS)
    return (
        events.groupBy("event_type")
        .agg(
            F.expr(
                f"percentile_approx(value, array({probs}), {accuracy})"
            ).alias("qs")
        )
        .select("event_type", F.posexplode("qs").alias("pos", "q"))
        .select(
            "event_type",
            (F.col("pos") + 1).cast("int").alias("pos"),
            F.round("q", 6).alias("q"),
        )
    )


def returned_item_report(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    start: str = "1997-01-01",
    end: str = "1997-04-01",
    k: int = 20,
) -> DataFrame:
    """TPC-H Q10 shape: top-k customers by revenue lost to returned
    items in a quarter — fact-fact join (returned lines × windowed
    orders) then rollup to customer grain with the nation dim
    broadcast. The orderdate filter pushes to the orders scan and the
    returnflag filter to the lineitem scan, so the join sees only the
    slivers. Top-k ties break on custkey for cross-engine
    determinism."""
    rev = F.sum(
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
    )
    return (
        lineitem.where(F.col("l_returnflag") == "R")
        .join(
            orders.where(
                (F.col("o_orderdate") >= F.lit(start).cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(end).cast("timestamp"))
            ).select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            customer.select("c_custkey", "c_name", "c_acctbal", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(F.round(rev, 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(k)
    )


def supplier_count_by_part(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    sizes: tuple[int, ...] = (1, 4, 7),
) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part attribute
    group, EXCLUDING a disqualified supplier set — the anti-join +
    count-distinct combination. The (partkey, suppkey) pairs play
    partsupp (these tables carry no separate partsupp); disqualified
    = negative-balance suppliers (Q16 proper keys on a complaints
    LIKE over a comment attribute these tables don't carry — both
    are supplier-side predicates feeding a NOT IN). Pairs dedup
    BEFORE the joins so everything downstream is pair-grained; the
    filtered part dim broadcasts."""
    bad = supplier.where(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("bad_sk")
    )
    pairs = lineitem.select("l_partkey", "l_suppkey").distinct()
    return (
        pairs.join(bad, F.col("l_suppkey") == F.col("bad_sk"), "left_anti")
        .join(
            F.broadcast(
                part.where(F.col("p_size").isin(*sizes)).select(
                    "p_partkey", "p_brand", "p_type", "p_size"
                )
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


def discount_revenue_delta(
    lineitem: DataFrame,
    start: str = "1997-01-01",
    end: str = "1998-01-01",
    disc_lo: float = 0.05,
    disc_hi: float = 0.07,
    qty_max: float = 24.0,
) -> DataFrame:
    """TPC-H Q6 shape: the would-be revenue delta from dropping a
    discount band — a single filtered scan folding to one row.

    The pure-pushdown showcase: every predicate (date range, discount
    band, quantity cap) reaches the parquet scan as PushedFilters, the
    projection reads three columns, and the only "shuffle" is the
    final single-row partial-agg merge. At 100 TB this runs at scan
    bandwidth; there is nothing else in the plan."""
    return (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit(start).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(end).cast("timestamp"))
            & (F.col("l_discount") >= disc_lo)
            & (F.col("l_discount") <= disc_hi)
            & (F.col("l_quantity") < qty_max)
        )
        .agg(
            # same exact-decimal pattern as nation_market_share: the
            # per-row double product is one IEEE multiply (bit-identical
            # across engines) and its true value has ≤4 decimal digits,
            # so the DECIMAL(25,8) cast is exact; summing decimals is
            # immune to summation order, unlike ROUND(sum(double), 2)
            # which flips cents whenever partial-sum order differs.
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * F.col("l_discount")).cast(
                        "decimal(25,8)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue_delta"),
            F.count("*").alias("n_lines"),
        )
    )


def large_volume_customers(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    qty_threshold: float = 250.0,
    top_n: int = 100,
) -> DataFrame:
    """TPC-H Q18 shape: orders whose total line quantity exceeds a
    threshold, with their customer — the aggregate-HAVING-then-join
    decorrelation of ``o_orderkey IN (SELECT ... HAVING sum > t)``.

    The lineitem rollup happens FIRST (one shuffle on orderkey,
    partial-aggregated map-side), and only the few surviving orderkeys
    join back — broadcast, since a HAVING this selective yields a tiny
    set at any scale. Customer resolves last, also broadcast at the
    rollup's cardinality. The fact table is read once."""
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .where(F.col("total_qty") > qty_threshold)
    )
    return (
        orders.join(F.broadcast(big), orders["o_orderkey"] == big["l_orderkey"])
        .join(
            F.broadcast(customer.select("c_custkey", "c_name")),
            orders["o_custkey"] == F.col("c_custkey"),
        )
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_totalprice").alias("totalprice"),
            "total_qty",
        )
        .orderBy(F.col("totalprice").desc(), F.col("o_orderkey").asc())
        .limit(top_n)
    )


def nation_market_share(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    region_name: str = "ASIA",
    target_nation: str | None = None,
) -> DataFrame:
    """TPC-H Q8 shape: a supplier nation's share of revenue into one
    market (region), per order year — sum(CASE)/sum over a multi-dim
    join. ``target_nation`` defaults to the region's first nation
    alphabetically so the query is self-contained on any seed.

    Shape: region→nation→customer prune broadcasts onto orders, the
    one fact-fact shuffle is lineitem⋈orders on orderkey, supplier
    nationality broadcasts onto the result, and the share divides two
    partial-agg sums in the same single groupBy — the fact stream is
    never scanned or shuffled twice."""
    rnat = nation.join(
        F.broadcast(region.where(F.col("r_name") == region_name)),
        nation["n_regionkey"] == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    cust = customer.join(
        F.broadcast(rnat.select("n_nationkey")),
        customer["c_nationkey"] == F.col("n_nationkey"),
    ).select("c_custkey")
    supp = supplier.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        supplier["s_nationkey"] == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    if target_nation is None:
        # scalar from the tiny nation dim: a broadcast 1-row cross
        # join, same trick as top_supplier_revenue's max broadcast
        target = F.broadcast(
            rnat.agg(F.min("n_name").alias("target_nation"))
        )
    else:
        target = F.broadcast(
            rnat.sparkSession.range(1).select(
                F.lit(target_nation).alias("target_nation")
            )
        )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        lineitem.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(
            orders.join(
                F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"]
            ).select("o_orderkey", F.year("o_orderdate").alias("o_year")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == supp["s_suppkey"])
        .crossJoin(target)
    )
    # two-level agg over exact decimals: the per-row revenue double is
    # bit-identical in both engines (one IEEE multiply); casting it to
    # DECIMAL(25,8) is also identical, because the true value has ≤4
    # decimal digits so the 8-digit cast boundary sits far outside the
    # double's error. All sums above are then exact — immune to
    # summation order — unlike a group-level ROUND(sum,2), which flips
    # cents whenever the engines' double sums differ in the last bit.
    rev_d = F.sum(rev.cast("decimal(25,8)")).cast("decimal(30,8)")
    per_nation = joined.groupBy("o_year", "supp_nation", "target_nation").agg(
        rev_d.alias("rev_d")
    )
    tgt_rev = F.sum(
        F.when(F.col("supp_nation") == F.col("target_nation"), F.col("rev_d"))
        .otherwise(F.lit(0).cast("decimal(30,8)"))
    )
    return (
        per_nation.groupBy("o_year")
        .agg(
            F.round(
                tgt_rev.cast("double") / F.sum("rev_d").cast("double"), 6
            ).alias("mkt_share"),
            F.sum("rev_d").cast("double").alias("total_revenue"),
        )
        .orderBy("o_year")
    )


def session_window_agg(
    events: DataFrame, gap_minutes: int = SESSION_GAP_MIN
) -> DataFrame:
    """Gap sessionization via Spark's NATIVE ``session_window`` —
    the built-in (Catalyst-planned) twin of the manual lag/running-sum
    formulation in :func:`session_stats`, and the batch twin of the
    streaming session-window agg. One shuffle on (user_id, window);
    the session merge runs inside the agg operator, no row-by-row
    window functions at all.

    Bounds follow the operator's contract: start = first event,
    end = last event + gap (session_stats emits last-event time
    instead — both are emitted here as epoch µs for the oracle)."""
    sw = F.session_window("ts", f"{gap_minutes} minutes")
    return (
        events.groupBy(F.col("user_id"), sw.alias("sw"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("sw.start")).alias("start_us"),
            F.unix_micros(F.col("sw.end")).alias("end_us"),
            "n_events",
            "sum_value",
        )
    )

def min_cost_supplier(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = "ASIA",
    sizes: tuple[int, ...] = (1, 4, 7),
    top_n: int = 100,
) -> DataFrame:
    """TPC-H Q2 shape: per part, the regional supplier offering the
    minimum cost — the correlated scalar ``= (SELECT min(..) ..)``
    subquery decorrelated into a partition-window min.

    These tables carry no partsupp, so supply cost is the supplier's
    best observed unit price ``min(l_extendedprice / l_quantity)``
    over its lineitems for that part. min() of per-row IEEE divisions
    is summation-order-free, so the window-min equality compare is
    bit-exact across engines with no rounding contract.

    Scale shape: the region→nation→supplier chain collapses to a tiny
    broadcast BEFORE the fact scan (pairs from disqualified suppliers
    never aggregate). Two exchanges total, and only the FIRST carries
    fact-sized data: the (partkey, suppkey) agg keeps map-side combine
    on the raw lineitems, so the second exchange (the window's
    partkey re-cluster) moves only the rollup — pair-granularity, a
    tiny fraction of the fact. (Pre-partitioning by partkey alone
    would fuse the two into one exchange but would shuffle RAW
    lineitems with no partial agg — strictly worse at 100 TB.) This
    is also why window-min beats self-join-on-min: the join
    formulation shuffles the rollup twice and scans it twice."""
    rsup = (
        supplier.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region.where(F.col("r_name") == region_name)),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                ).select("n_nationkey", "n_name")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    costs = (
        lineitem.join(
            F.broadcast(rsup.select("s_suppkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost"))
    )
    w = Window.partitionBy("l_partkey")
    best = costs.withColumn("min_cost", F.min("cost").over(w)).where(
        F.col("cost") == F.col("min_cost")
    )
    return (
        best.join(
            F.broadcast(
                part.where(F.col("p_size").isin(*sizes)).select(
                    "p_partkey", "p_brand"
                )
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(rsup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            F.round("cost", 6).alias("cost"),
        )
        .orderBy(
            F.col("s_acctbal").desc(),
            F.col("n_name").asc(),
            F.col("s_name").asc(),
            F.col("p_partkey").asc(),
        )
        .limit(top_n)
    )


def important_parts(
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    nation_name: str = "NATION_0",
    fraction: float = 0.001,
    top_n: int = 100,
) -> DataFrame:
    """TPC-H Q11 shape: parts whose traded value (through one
    nation's suppliers) exceeds a fraction of the GLOBAL such value —
    the HAVING-over-global-scalar-subquery pattern.

    The scalar total is a single-row agg cross-joined (broadcast)
    onto the per-part rollup: at any scale the fact scans once into
    the partkey agg, the grand total derives from re-aggregating that
    rollup output (NOT a second fact scan), and the comparison is a
    map over the rollup. Exact DECIMAL sums both levels, so the
    threshold compare never depends on double summation order."""
    nkey = (
        nation.where(F.col("n_name") == nation_name)
        .select("n_nationkey")
    )
    nsup = supplier.join(
        F.broadcast(nkey), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    per_part = (
        lineitem.join(
            F.broadcast(nsup), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .groupBy("l_partkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(25,8)"
                )
            ).alias("value_d")
        )
    )
    total = per_part.agg(
        F.sum("value_d").cast("decimal(38,8)").alias("total_d")
    )
    # Threshold compare runs in DOUBLE on both engines: the exact
    # decimals cast to the identical nearest double, so the boundary
    # can never flip between Spark and the oracle.
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(
            F.col("value_d").cast("double")
            > F.col("total_d").cast("double") * F.lit(fraction)
        )
        .select(
            "l_partkey",
            F.round(F.col("value_d"), 2).cast("double").alias("value"),
        )
        .orderBy(F.col("value").desc(), F.col("l_partkey").asc())
        .limit(top_n)
    )


def ship_delay_priority(
    lineitem: DataFrame,
    orders: DataFrame,
    year: int = 1997,
    fast_days: int = 30,
    medium_days: int = 90,
) -> DataFrame:
    """TPC-H Q12 shape: line counts by urgency class per shipping
    bucket — the join + CASE-conditional-aggregation pattern.

    These tables carry no l_shipmode/commitdate/receiptdate, so the
    bucket is the order→ship latency (datediff orderdate→shipdate):
    FAST ≤ fast_days < MEDIUM ≤ medium_days < SLOW. Counts only, so
    the gate is exact with no float contract. The orders side
    projects two columns into the join; the date-range filter on
    shipdate reaches the parquet scan."""
    j = lineitem.where(
        (F.col("l_shipdate") >= F.lit(f"{year}-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(f"{year + 1}-01-01").cast("timestamp"))
    ).join(
        orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (
        F.when(delay <= fast_days, "FAST")
        .when(delay <= medium_days, "MEDIUM")
        .otherwise("SLOW")
    )
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        j.groupBy(bucket.alias("ship_bucket"))
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).cast("bigint").alias(
                "high_line_count"
            ),
            F.sum(F.when(urgent, 0).otherwise(1)).cast("bigint").alias(
                "low_line_count"
            ),
        )
        .orderBy("ship_bucket")
    )


def excess_parts(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    year: int = 1997,
    share: float = 0.3,
    name_token: str = "widget",
) -> DataFrame:
    """TPC-H Q20 shape: suppliers holding an outsized share of a
    part family's yearly volume — the nested IN(agg-threshold)
    subquery chain, decorrelated into rollup → threshold join →
    distinct-part count per supplier.

    Without partsupp, "availability" is the supplier's shipped
    quantity: a (part, supplier) pair is in excess when its year
    volume exceeds ``share`` × the part's total year volume across
    all suppliers. Quantities cast to DECIMAL(20,2) per row before
    summing, so both rollups and the share compare are exact.

    Scale shape: the (partkey, suppkey) agg keeps map-side combine on
    the raw fact, so of the plan's exchanges only that first one
    carries fact-sized data — the window's partkey re-cluster and the
    final supplier rollup move pair-granularity rows only (same
    two-exchange trade as min_cost_supplier); the name-filtered part
    dim broadcasts."""
    fam = part.where(
        F.col("p_name").contains(name_token)
    ).select("p_partkey")
    pair_qty = (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit(f"{year}-01-01").cast("timestamp"))
            & (
                F.col("l_shipdate")
                < F.lit(f"{year + 1}-01-01").cast("timestamp")
            )
        )
        .join(F.broadcast(fam), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(20,2)")).alias("pair_qty")
        )
    )
    w = Window.partitionBy("l_partkey")
    excess = pair_qty.withColumn(
        "part_qty", F.sum("pair_qty").over(w)
    ).where(
        # exact decimals → identical doubles → flip-free compare
        F.col("pair_qty").cast("double")
        > F.col("part_qty").cast("double") * F.lit(share)
    )
    return (
        excess.groupBy("l_suppkey")
        .agg(
            F.count_distinct("l_partkey").cast("bigint").alias("n_excess"),
            F.round(F.sum("pair_qty"), 2).cast("double").alias("excess_qty"),
        )
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_name", "s_acctbal")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select("s_name", "s_acctbal", "n_excess", "excess_qty")
        .orderBy(F.col("s_name").asc())
    )

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def event_type_pivot(
    events: DataFrame, types: tuple[str, ...] = EVENT_TYPES
) -> DataFrame:
    """Per-user event matrix: one row per user, one count column per
    event type — the wide-format feature extraction every training
    pipeline runs before a model join.

    Expressed as conditional aggregation (a CASE-counting column per
    type), NOT ``RelationalGroupedDataset.pivot``: the built-in pivot
    plans TWO shuffles even with explicit values (a (user, type)
    pre-agg exchange, then a pivotfirst exchange on user) and without
    explicit values adds a whole distinct-scan job to discover the
    domain. The conditional-agg form is one map-side-combinable
    aggregate — one shuffle on user_id, one pass over the fact, which
    is the plan you want 1000 executors to run."""
    return events.groupBy("user_id").agg(
        *[
            F.count(F.when(F.col("event_type") == t, 1))
            .cast("bigint")
            .alias(f"n_{t}")
            for t in types
        ]
    )


def churned_buyers(
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    year_a: int = 1996,
    year_b: int = 1997,
) -> DataFrame:
    """Buyers active in ``year_a`` but gone in ``year_b``, rolled up
    per nation — the EXCEPT / anti-join set operation (cohort churn).

    Both cohort sets are distinct-custkey aggregates of the SAME
    orders scan (Catalyst reuses the exchange); the except runs as a
    left-anti join of two already-small id sets, then the nation dim
    broadcasts onto the survivors. The fact table never shuffles more
    than the two cohort rollups it already needed."""
    def cohort(year: int) -> DataFrame:
        return (
            orders.where(
                (F.col("o_orderdate") >= F.lit(f"{year}-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(f"{year + 1}-01-01").cast("timestamp"))
            )
            .select("o_custkey")
            .distinct()
        )

    churned = cohort(year_a).join(cohort(year_b), on="o_custkey", how="left_anti")
    return (
        churned.join(
            customer.select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(F.count("*").cast("bigint").alias("n_churned"))
        .orderBy(F.col("n_churned").desc(), F.col("n_name").asc())
    )

def time_range_rolling(
    events: DataFrame, trailing_minutes: int = 60
) -> DataFrame:
    """Trailing time-RANGE window per user: sum/count of events in the
    last ``trailing_minutes`` BY EVENT TIME, not by row count — the
    frame `rolling_user_activity`'s ROWS-frame cannot express when
    events are irregularly spaced (a rows-frame mixes hours and
    seconds of history depending on activity).

    RANGE frames need a numeric ordering key, so time becomes epoch
    micros; the frame is then an exact integer interval — no float,
    no rounding. One shuffle on user_id (the window partition), the
    same partitioning any per-user feature job already pays."""
    us = 60_000_000 * trailing_minutes
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-us, 0)
    )
    return events.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        F.count("*").over(w).cast("bigint").alias("n_trailing"),
        F.round(F.sum("value").over(w), 2).alias("sum_trailing"),
    )


def value_rank_profile(events: DataFrame) -> DataFrame:
    """Rank-statistic profile of event values within their type:
    percent_rank, cume_dist, and decile — the remaining window
    ranking family in one pass (ntile/row_number live in other
    operators). All three share ONE (event_type, value) sort, so
    Catalyst plans a single window exchange + sort.

    percent_rank/cume_dist are exact rational counts divided once per
    row — deterministic cross-engine with a rounding contract only on
    the final output."""
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").asc(), F.col("event_id").asc()
    )
    return events.select(
        "event_id",
        "event_type",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(10).over(w).cast("int").alias("decile"),
    )


def unpivot_user_matrix(matrix: DataFrame, types: tuple[str, ...] = EVENT_TYPES) -> DataFrame:
    """Melt the wide per-user event matrix back to long form —
    `stack()` (UNPIVOT): one generator expression per row, no join,
    no shuffle; the inverse of :func:`event_type_pivot` minus the
    zero rows (unpivot drops them so long form stays sparse, matching
    what a groupBy of the raw facts would produce)."""
    pairs = ", ".join(f"'{t}', n_{t}" for t in types)
    return (
        matrix.select(
            "user_id",
            F.expr(
                f"stack({len(types)}, {pairs}) AS (event_type, n_events)"
            ),
        )
        .where(F.col("n_events") > 0)
        .select("user_id", "event_type", F.col("n_events").cast("bigint").alias("n_events"))
    )


def table_profile(
    df: DataFrame,
    cols: tuple[str, ...],
) -> DataFrame:
    """ANALYZE-TABLE-style column statistics — the catalog pass a
    cost-based optimizer (and any data-quality monitor) feeds on:
    per column, row count, null count, exact distinct count, and
    min/max rendered as strings so heterogeneous column types share
    one tidy schema.

    Plan shape: one small aggregation PER COLUMN, unioned — each
    branch's scan prunes to its single column and its exact-distinct
    shuffle carries only that column's near-distinct data. A single
    wide agg would need Catalyst's EXPAND (duplicating every row once
    per distinct column) and compiles a 5×-wider codegen unit
    (measured 18.8 s vs 4.8 s first-run compile at 5 columns; steady
    state identical) — the union is both the cheaper plan and the one
    that scales column count linearly. At warehouse scale swap the
    exact distincts for approx_count_distinct (the engine's HLL
    rollup) to avoid the distinct shuffles entirely; exact is the
    oracle profile. min/max cast to string BEFORE aggregating, so the
    ordering (and the oracle hash) is lexicographic in both engines."""
    import functools

    parts = [
        df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count(c).alias("_nn"),
            F.countDistinct(c).alias("n_distinct"),
            F.min(F.col(c).cast("string")).alias("min_value"),
            F.max(F.col(c).cast("string")).alias("max_value"),
        ).select(
            F.lit(c).alias("column"),
            F.col("n_rows").cast("bigint").alias("n_rows"),
            (F.col("n_rows") - F.col("_nn")).cast("bigint").alias("n_nulls"),
            F.col("n_distinct").cast("bigint").alias("n_distinct"),
            "min_value",
            "max_value",
        )
        for c in cols
    ]
    return functools.reduce(lambda a, b: a.unionByName(b), parts)


def event_funnel(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    broadcast_steps: bool = True,
    horizon_s: float | None = None,
) -> DataFrame:
    """Ordered-funnel analysis: how many users progress through the
    ``steps`` sequence with STRICTLY increasing timestamps (a later
    step only counts if it happens after the user's earliest
    qualifying occurrence of the previous step) — the product-
    analytics primitive behind conversion reports.

    ``horizon_s`` adds the conversion-window constraint every product
    funnel carries: a later step only counts if it also falls within
    ``horizon_s`` seconds of the user's STEP-1 anchor time (the
    earliest qualifying step-1 event). The anchor rides the cascade
    as one extra timestamp column; the comparison is integer
    microseconds (``unix_micros``), so it is exact cross-engine.
    ``None`` (default) keeps the unbounded funnel.

    Plan: a cascade of per-user conditional mins. Step 1 is one
    map-side-combinable groupBy(user); each later step filters the
    event scan to its type (pushed to the parquet scan), joins the
    previous step's user→timestamp frame, and takes min(ts > prev_ts)
    per user. ``broadcast_steps=True`` (default) pins the per-step
    user frame broadcast — right while distinct users fit an executor
    (the user frame is previous-step-users-sized, monotonically
    shrinking); at billions of users pass False and the join runs
    key-partitioned on user_id, which both sides already aggregate
    by. Only (user, ts) pairs move after the scans; no window over
    the full event stream, no collect. Output: one row per step —
    (step_idx, step, n_users, conversion) with conversion relative to
    step 1 (NULL-safe 0-user steps report 0.0).
    """
    if not steps:
        raise ValueError("event_funnel needs at least one step")
    cur = (
        events.where(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("_t"))
        .withColumn("_t0", F.col("_t"))
    )
    frames = [cur]
    for s in steps[1:]:
        prev = cur.select(user_col, "_t", "_t0")
        if broadcast_steps:
            prev = F.broadcast(prev)
        stepped = (
            events.where(F.col(type_col) == s)
            .join(prev, user_col)
            .where(F.col(ts_col) > F.col("_t"))
        )
        if horizon_s is not None:
            stepped = stepped.where(
                F.unix_micros(F.col(ts_col))
                <= F.unix_micros(F.col("_t0")) + int(horizon_s * 1_000_000)
            )
        nxt = stepped.groupBy(user_col).agg(
            F.min(ts_col).alias("_t"), F.min("_t0").alias("_t0")
        )
        frames.append(nxt)
        cur = nxt
    import functools

    counts = functools.reduce(
        DataFrame.unionByName,
        [
            f.agg(F.count("*").cast("bigint").alias("n_users")).select(
                F.lit(i + 1).alias("step_idx"),
                F.lit(s).alias("step"),
                "n_users",
            )
            for i, (s, f) in enumerate(zip(steps, frames))
        ],
    )
    first = counts.where(F.col("step_idx") == 1).select(
        F.col("n_users").alias("_n1")
    )
    return (
        counts.crossJoin(F.broadcast(first))
        .select(
            "step_idx", "step", "n_users",
            F.when(F.col("_n1") > 0,
                   F.round(F.col("n_users") / F.col("_n1"), 6))
            .otherwise(F.lit(0.0)).alias("conversion"),
        )
        .orderBy("step_idx")
    )
