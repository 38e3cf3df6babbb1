"""Deterministic scale-up of the driver's sf0.1 testdata for the
100x rehearsal (VERDICT r3 item 5).

The driver only ships sf<=0.1; the rehearsal needs sf1/sf10 (10x /
100x the bench SF) to demonstrate that the committed plan shapes —
partition pruning on persisted IVF tiers, no-cartesian semdedup,
bucketed LSH joins, pushed-down curation filters — hold when the data
is 100x bigger. This script replicates sf0.1 `reps` times with
key-space shifting, exactly the way a larger TPC-H SF extends the key
space, so per-key densities, join fan-outs, and value distributions
match the originals:

- Fact/dim keys shift by ``r * N_base`` per replica r, so foreign keys
  stay consistent and join selectivities are unchanged.
- ``documents.text`` gets a per-replica token suffix (replica 0 stays
  byte-exact), so each replica preserves the original's internal
  near-dup structure while cross-replica shingle overlap is zero —
  corpus-level duplicate DENSITY stays constant instead of every doc
  acquiring ``reps-1`` artificial twins (which would grow candidate
  pairs quadratically in reps by construction, not by engine
  behavior).
- ``embeddings.embedding`` gets a per-replica isometry (coordinate
  roll + deterministic sign flips; replica 0 exact): norms and ALL
  within-replica pairwise angles are preserved, while cross-replica
  similarity is ~random. Cluster count grows ~reps-fold, which is the
  realistic regime for the nlist ~ sqrt(N) IVF guidance.
- ``events`` keeps the same 30-day time range with reps-times the
  users, so windowed aggregations see higher per-window density —
  the scale direction that actually stresses them.

Everything is driven by deterministic hashes of (replica, position);
no RNG, so re-runs are byte-stable.

Usage: python scripts/make_scale_data.py OUT_DIR REPS [SRC_DIR]
e.g.   python scripts/make_scale_data.py /root/repo/_scaledata/sf1 10
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import DataFrame, functions as F

sys.path.insert(0, ".")

from faiss_vector_search_spark.session import get_spark  # noqa: E402

DIM = 64
# Small enough that documents/embeddings split into multiple files at
# sf10 — one ~50 MB parquet file is a SINGLE scan split under the
# default 128 MB maxPartitionBytes, which serializes every map-only
# pass over that table (observed in the r4 rehearsal: doc/embedding
# scans ran 1 task wide; recorded times are therefore conservative
# upper bounds for a real many-file layout).
TARGET_ROWS_PER_FILE = 125_000


def _replicate(df: DataFrame, reps: int) -> DataFrame:
    """Cross the table with replica ids 0..reps-1 (broadcast 1-row
    array explode — no shuffle of the base table)."""
    return df.withColumn(
        "r", F.explode(F.sequence(F.lit(0), F.lit(reps - 1)))
    )


def _write(df: DataFrame, out_dir: str, name: str, approx_rows: int) -> None:
    n_files = max(1, -(-approx_rows // TARGET_ROWS_PER_FILE))  # ceil
    path = os.path.join(out_dir, f"{name}.parquet")
    df.repartition(n_files).write.mode("overwrite").parquet(path)
    print(f"  wrote {name}: ~{approx_rows} rows, {n_files} file(s)")


def main() -> None:
    out_dir = sys.argv[1]
    reps = int(sys.argv[2])
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    spark = get_spark(app_name="fvs-make-scale-data", master="local[32]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    def t(name: str) -> DataFrame:
        return spark.read.parquet(os.path.join(src, f"{name}.parquet"))

    counts = {
        name: t(name).count()
        for name in ("customer", "supplier", "part", "orders", "lineitem",
                     "events", "documents", "embeddings")
    }
    n_users = t("events").agg(F.max("user_id")).collect()[0][0] + 1

    os.makedirs(out_dir, exist_ok=True)

    # Dimension tables that do not scale with SF: byte-copy.
    for name in ("region", "nation"):
        t(name).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet")
        )
        print(f"  copied {name}")

    cust = _replicate(t("customer"), reps).select(
        (F.col("c_custkey") + F.col("r") * counts["customer"]).alias("c_custkey"),
        F.format_string("Customer#%09d",
                        F.col("c_custkey") + F.col("r") * counts["customer"]
                        ).alias("c_name"),
        "c_nationkey", "c_acctbal", "c_mktsegment",
    )
    _write(cust, out_dir, "customer", counts["customer"] * reps)

    supp = _replicate(t("supplier"), reps).select(
        (F.col("s_suppkey") + F.col("r") * counts["supplier"]).alias("s_suppkey"),
        F.format_string("Supplier#%09d",
                        F.col("s_suppkey") + F.col("r") * counts["supplier"]
                        ).alias("s_name"),
        "s_nationkey", "s_acctbal",
    )
    _write(supp, out_dir, "supplier", counts["supplier"] * reps)

    part = _replicate(t("part"), reps).select(
        (F.col("p_partkey") + F.col("r") * counts["part"]).alias("p_partkey"),
        "p_name", "p_brand", "p_type", "p_size", "p_retailprice",
    )
    _write(part, out_dir, "part", counts["part"] * reps)

    orders = _replicate(t("orders"), reps).select(
        (F.col("o_orderkey") + F.col("r") * counts["orders"]).alias("o_orderkey"),
        (F.col("o_custkey") + F.col("r") * counts["customer"]).alias("o_custkey"),
        "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority",
    )
    _write(orders, out_dir, "orders", counts["orders"] * reps)

    li = _replicate(t("lineitem"), reps).select(
        (F.col("l_orderkey") + F.col("r") * counts["orders"]).alias("l_orderkey"),
        (F.col("l_partkey") + F.col("r") * counts["part"]).alias("l_partkey"),
        (F.col("l_suppkey") + F.col("r") * counts["supplier"]).alias("l_suppkey"),
        "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
        "l_tax", "l_returnflag", "l_linestatus", "l_shipdate",
    )
    _write(li, out_dir, "lineitem", counts["lineitem"] * reps)

    ev = _replicate(t("events"), reps).select(
        (F.col("event_id") + F.col("r") * counts["events"]).alias("event_id"),
        "ts",
        (F.col("user_id") + F.col("r") * n_users).alias("user_id"),
        "event_type", "value", "props",
    )
    _write(ev, out_dir, "events", counts["events"] * reps)

    # documents: replica 0 byte-exact; replicas r>0 suffix every token
    # with a CONSTANT-WIDTH 3-char tag ("x" + two base-26 letters) so
    # within-replica shingle sets are images of the originals
    # (near-dup structure preserved), cross-replica overlap is zero,
    # AND per-token length shift is identical for every replica —
    # a variable-width "xr<r>" suffix made length-sensitive quality
    # filters reject 4-char-suffix replicas (r >= 10) that 3-char
    # replicas passed, so filter selectivity silently depended on SF.
    docs = _replicate(t("documents"), reps)
    tag = F.concat(
        F.lit("$1x"),
        F.expr("char(97 + cast(r / 26 as int))"),
        F.expr("char(97 + cast(r % 26 as int))"),
    )
    new_text = F.when(F.col("r") == 0, F.col("text")).otherwise(
        F.regexp_replace(F.col("text"), F.lit(r"(\S+)"), tag)
    )
    docs = docs.select(
        (F.col("doc_id") + F.col("r") * counts["documents"]).alias("doc_id"),
        new_text.alias("text"),
        "lang", "source",
        F.length(new_text).cast("bigint").alias("n_chars"),
    )
    _write(docs, out_dir, "documents", counts["documents"] * reps)

    # embeddings: per-replica isometry. new[i] = sign(r,i) *
    # old[(i + roll(r)) % DIM]; norms and within-replica angles exact,
    # cross-replica ~orthogonal. Replica 0 identity.
    #
    # PLANTED NEAR-DUPS: the base corpus has no real near-duplicate
    # pairs (max pairwise cos = 0.60), so a near-dup rehearsal on pure
    # replicas measures only the random tail. In each replica r>0, 1%
    # of vectors (base id % 100 == 1) become a small-jitter copy of
    # their id-predecessor's vector in the SAME replica (cos ≈ 0.99).
    # Clique size is exactly 2, so true near-dup pairs grow linearly
    # with N: 0.01·N_base·(reps-1) pairs, never a quadratic
    # duplicate-clique artifact of the replication itself.
    roll = F.pmod(F.xxhash64(F.lit("roll"), F.col("r")), F.lit(DIM))
    idx = F.sequence(F.lit(0), F.lit(DIM - 1))

    def isometry(vec):
        return F.transform(
            idx,
            lambda i: (
                F.when(
                    F.pmod(
                        F.xxhash64(F.lit("sign"), F.col("r"), i), F.lit(2)
                    ) == 0,
                    F.lit(1.0),
                ).otherwise(F.lit(-1.0))
                * F.element_at(
                    vec, (F.pmod(i + roll, F.lit(DIM)) + 1).cast("int")
                )
            ).cast("float"),
        )

    jittered_prev = F.transform(
        isometry(F.col("prev_emb")),
        lambda x, i: (
            x
            + (
                F.pmod(
                    F.xxhash64(F.lit("jit"), F.col("vec_id"), F.col("r"), i),
                    F.lit(1001),
                )
                - F.lit(500)
            )
            / F.lit(500.0)
            * F.lit(0.03)
        ).cast("float"),
    )
    base_emb = t("embeddings")
    prev = base_emb.select(
        (F.col("vec_id") + 1).alias("vec_id"),
        F.col("embedding").alias("prev_emb"),
    )
    emb = (
        _replicate(base_emb, reps)
        .join(prev, "vec_id", "left")
        .select(
            (F.col("vec_id") + F.col("r") * counts["embeddings"]).alias(
                "out_id"
            ),
            F.when(F.col("r") == 0, F.col("embedding"))
            .when(
                (F.col("vec_id") % 100 == 1) & F.col("prev_emb").isNotNull(),
                jittered_prev,
            )
            .otherwise(isometry(F.col("embedding")))
            .alias("embedding"),
            "label",
        )
        .withColumnRenamed("out_id", "vec_id")
    )
    _write(emb, out_dir, "embeddings", counts["embeddings"] * reps)

    print(f"done: {out_dir} at {reps}x {src}")


if __name__ == "__main__":
    main()
