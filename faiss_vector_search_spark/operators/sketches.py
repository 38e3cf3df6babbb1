"""Mergeable-sketch analytics — the incremental-maintenance tier for
100 TB: persist tiny per-slice sketches once, answer rollup questions
later by UNIONING sketches instead of rescanning raw data. All
sketches here are Spark built-ins (Datasketches HLL, approx_top_k),
map-side partial-aggregated, JVM-only.

Why this matters at scale: "distinct users last N days" over raw
events re-reads N days of fact data every time; over a sketch store
it reads N rows of ~KB binaries. The union is exact over the
sketches (no re-estimation error stacking) — the only error is the
sketch's own, fixed at build time by lgConfigK.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def save_distinct_sketches(
    events: DataFrame,
    path: str,
    key_col: str = "user_id",
    slice_col: str = "event_type",
    mode: str = "append",
) -> None:
    """Persist one HLL sketch of ``key_col`` per slice value. Append
    mode supports incremental batches: the same slice may appear in
    many files; union_distinct_counts merges them losslessly."""
    (
        events.groupBy(slice_col)
        .agg(F.expr(f"hll_sketch_agg({key_col})").alias("sketch"))
        .write.mode(mode)
        .parquet(path)
    )


def union_distinct_counts(
    spark: SparkSession,
    path: str,
    slice_col: str = "event_type",
    slices: list | None = None,
) -> DataFrame:
    """Per-slice distinct estimates from the sketch store — raw data
    never re-read. Always appends one NULL-slice row holding the union
    over the SELECTED slices: the grand total when ``slices=None``, the
    total of just those slices otherwise (the slice filter is applied
    before every union). One more union over the same tiny scan."""
    store = spark.read.parquet(path)
    if slices is not None:
        store = store.where(F.col(slice_col).isin(*slices))
    per_slice = store.groupBy(slice_col).agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sketch))").alias(
            "approx_distinct"
        )
    )
    total = store.agg(
        # typed to the store's own slice column so unionByName never
        # coerces (or fails on) a non-string slice_col
        F.lit(None).cast(store.schema[slice_col].dataType).alias(slice_col),
        F.expr("hll_sketch_estimate(hll_union_agg(sketch))").alias(
            "approx_distinct"
        ),
    )
    return per_slice.unionByName(total)


def bigram_heavy_hitters(
    docs: DataFrame,
    k: int = 20,
    max_tracked: int = 10000,
    text_col: str = "text",
    tie_break: str = "sketch",
) -> DataFrame:
    """Top-k bigrams via the approx_top_k frequent-items sketch — the
    bounded-memory scale path for corpus n-gram stats: the exact
    groupBy(bigram) shuffles |distinct bigrams| rows (unbounded), the
    sketch shuffles one ~max_tracked-entry summary per partition.

    ``tie_break``: ``"sketch"`` returns the sketch's own k-boundary
    order (cheapest); ``"lexical"`` (the r11 oracle-gated profile)
    over-fetches 2k entries from the sketch, re-sorts by (count desc,
    bigram asc) and cuts at k — a TOTAL deterministic order, so when
    the sketch is exact (distinct bigrams ≤ max_tracked, the driver-
    gate regime; counts are exact because nothing was ever evicted)
    the result equals the exact SQL top-k under the same tie-break,
    provided the boundary tie group fits in the 2k over-fetch
    (pytest-gated on the corpus). At 100 TB counts are approximate
    and the key's guarantee degrades to the sketch's — the documented
    frequent-items posture, unchanged."""
    from ..functions.text import tokens

    if tie_break not in ("sketch", "lexical"):
        raise ValueError(f"unknown tie_break: {tie_break}")
    fetch = 2 * k if tie_break == "lexical" else k

    # stage the token array as a COLUMN before the transform: the
    # lambda's element_at(toks, i+2) is an interpreted HOF body with
    # no CSE, so an inlined tokenizer expression would re-run
    # lower+split+filter over the whole text PER BIGRAM POSITION —
    # O(tokens · chars) per doc (measured 9x on this op: 4.97→0.55 s
    # at sf0.1, 7.28→0.77 s at sf1)
    staged = docs.select(tokens(F.col(text_col)).alias("_toks"))
    bigrams = F.transform(
        F.slice(
            F.col("_toks"), 1,
            F.greatest(F.size(F.col("_toks")) - 1, F.lit(0)),
        ),
        lambda t, i: F.concat_ws(
            " ", t, F.element_at(F.col("_toks"), i + 2)
        ),
    )
    out = (
        staged.select(F.explode(bigrams).alias("bigram"))
        .agg(
            F.expr(
                f"approx_top_k(bigram, {fetch}, {max_tracked})"
            ).alias("top")
        )
        .select(F.explode("top").alias("e"))
        .select(
            F.col("e.item").alias("bigram"),
            F.col("e.count").alias("n"),
        )
    )
    if tie_break == "lexical":
        out = out.orderBy(
            F.col("n").desc(), F.col("bigram").asc()
        ).limit(k)
    return out
