"""Salted-join gates: result-equivalence with the plain join and the
salt actually spreading a hot key across buckets."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from faiss_vector_search_spark.functions.skew import SALT_COL, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    """90% of fact rows share key 1 (the hot key)."""
    facts = spark.range(1000).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 10 == 0, F.col("id") % 5 + 2)
        .otherwise(F.lit(1))
        .alias("k"),
        (F.col("id") * 3).alias("payload"),
    )
    dims = spark.createDataFrame(
        [(i, f"dim_{i}") for i in range(1, 7)], "k long, label string"
    )
    return facts, dims


def test_salted_inner_join_equals_plain(spark, skewed):
    facts, dims = skewed
    plain = {
        (r.row_id, r.label)
        for r in facts.join(dims, "k").select("row_id", "label").collect()
    }
    salted = {
        (r.row_id, r.label)
        for r in salted_join(
            facts, dims, "k", salt_source=F.col("row_id"), n_salts=8
        )
        .select("row_id", "label")
        .collect()
    }
    assert salted == plain


def test_salted_left_join_keeps_unmatched(spark, skewed):
    facts, dims = skewed
    out = salted_join(
        facts, dims, "k", salt_source=F.col("row_id"), n_salts=4, how="left"
    )
    assert out.count() == facts.count()
    assert out.where(F.col("label").isNull()).count() == facts.join(
        dims, "k", "left_anti"
    ).count()


def test_hot_key_spreads_across_salts(spark, skewed):
    facts, _ = skewed
    salted = facts.withColumn(
        SALT_COL, F.pmod(F.xxhash64(F.col("row_id")), F.lit(8)).cast("int")
    )
    per_salt = (
        salted.where(F.col("k") == 1)
        .groupBy(SALT_COL)
        .count()
        .collect()
    )
    assert len(per_salt) == 8  # every bucket hit
    counts = [r["count"] for r in per_salt]
    assert max(counts) < sum(counts) * 0.5  # no bucket dominates


def test_rejects_unsupported_join_type(spark, skewed):
    facts, dims = skewed
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(facts, dims, "k", salt_source=F.col("row_id"), how="full")
