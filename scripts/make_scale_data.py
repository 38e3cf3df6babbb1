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
# Floor on files per scaled table: a row-count target alone still
# emits ONE file for small-but-hot tables (sf1 documents = 50k rows =
# 1 file = every map pass serial on 1 task). 8 files ≈ the minimum
# that lets local[32] overlap scan tasks the way a real many-file
# lake layout would.
MIN_FILES = 8


def _replicate(df: DataFrame, reps: int) -> DataFrame:
    """Cross the table with replica ids 0..reps-1 (broadcast 1-row
    array explode — no shuffle of the base table)."""
    return df.withColumn(
        "r", F.explode(F.sequence(F.lit(0), F.lit(reps - 1)))
    )


def _write(df: DataFrame, out_dir: str, name: str, approx_rows: int) -> None:
    n_files = max(MIN_FILES, -(-approx_rows // TARGET_ROWS_PER_FILE))  # ceil
    path = os.path.join(out_dir, f"{name}.parquet")
    df.repartition(n_files).write.mode("overwrite").parquet(path)
    print(f"  wrote {name}: ~{approx_rows} rows, {n_files} file(s)")


def _gauss(tag: str, *keys):
    """Deterministic standard-normal from xxhash64 via Box–Muller:
    u1, u2 uniform on (0,1] from two salted hashes, z = √(−2 ln u1)
    · cos(2π u2). No RNG — byte-stable across re-runs like the rest
    of the generator."""
    u1 = (F.pmod(F.xxhash64(F.lit(tag + "1"), *keys), F.lit(1_000_000))
          + F.lit(1.0)) / F.lit(1_000_001.0)
    u2 = (F.pmod(F.xxhash64(F.lit(tag + "2"), *keys), F.lit(1_000_000))
          + F.lit(1.0)) / F.lit(1_000_001.0)
    return F.sqrt(F.lit(-2.0) * F.log(u1)) * F.cos(F.lit(2.0 * 3.141592653589793) * u2)


def clustered_embeddings_df(spark, n: int,
                            n_clusters: int | None = None,
                            spread: float = 0.5,
                            salt: str = "",
                            id_offset: int = 0) -> DataFrame:
    """Synthesize a CLUSTERED embeddings corpus (Gaussian mixture) of
    the same schema as the replica corpus — the r4 recall tables were
    measured on a documented worst-case near-random corpus, so a
    reader can't separate index quality from corpus pathology; this
    is the structured counterpart (VERDICT r4 ask #3).

    vec(id) = L2-normalized( center(cid) + spread·noise(id) ) with
    cid = hash(id) mod C, centers and noise i.i.d.-style N(0,1) from
    deterministic hashes. E[cos] between same-cluster members is
    ≈ 1/(1+spread²) (0.8 at the 0.5 default) — tight enough that a
    trained coarse quantizer can win, far enough below 0.99 that the
    planted near-dup truth stays unambiguous.

    PLANTED NEAR-DUPS: same rule as the replica corpus (id % 100 == 1
    ⇒ jittered copy of id−1's vector, cos ≈ 0.99, clique size exactly
    2) so the planted-pair recall gates run unchanged on either
    corpus. Because vec() is a pure function of id, the partner's
    vector is recomputed inline — no self-join.

    ``salt`` shifts BOTH the center and noise hash streams, so a
    salted batch draws from n_clusters brand-new mixture components —
    the "new domain arrives in ingest" drift batch for the lifecycle
    rehearsal (scripts/scale_drift.py). ``id_offset`` shifts vec_ids
    so the batch appends cleanly after an existing corpus.
    """
    if n_clusters is None:
        n_clusters = max(32, n // 200)
    idx = F.sequence(F.lit(0), F.lit(DIM - 1))

    def raw_vec(vid):
        cid = F.pmod(F.xxhash64(F.lit("cl" + salt), vid), F.lit(n_clusters))
        return F.transform(
            idx,
            lambda i: _gauss("c" + salt, cid, i)
            + F.lit(spread) * _gauss("n" + salt, vid, i),
        )

    def unit(vec):
        norm = F.sqrt(F.aggregate(
            vec, F.lit(0.0), lambda acc, x: acc + x * x))
        # stage the norm via array_repeat (evaluated once) so the
        # interpreted lambda doesn't recompute the fold per component
        return F.zip_with(
            vec, F.array_repeat(norm, DIM),
            lambda x, nn: (x / nn).cast("float"),
        )

    base = spark.range(n).select(
        (F.col("id") + id_offset).alias("vec_id")
    )
    vid = F.col("vec_id")
    jitter = F.transform(
        unit(raw_vec(vid - 1)),
        lambda x, i: (
            x.cast("double")
            + (F.pmod(F.xxhash64(F.lit("jit"), vid, i), F.lit(1001))
               - F.lit(500)) / F.lit(500.0) * F.lit(0.03)
        ),
    )
    return base.select(
        "vec_id",
        F.when(vid % 100 == 1, unit(jitter))
        .otherwise(unit(raw_vec(vid)))
        .alias("embedding"),
        F.pmod(F.xxhash64(F.lit("lb"), vid), F.lit(8)).cast("int")
        .alias("label"),
    )


def make_clustered_embeddings(spark, out_dir: str, n: int,
                              n_clusters: int | None = None,
                              spread: float = 0.5) -> None:
    """Write :func:`clustered_embeddings_df` as a scaled-corpus dir."""
    emb = clustered_embeddings_df(spark, n, n_clusters, spread)
    os.makedirs(out_dir, exist_ok=True)
    _write(emb, out_dir, "embeddings", n)
    print(f"done: {out_dir} clustered embeddings n={n} "
          f"C={n_clusters if n_clusters else max(32, n // 200)}")


def realistic_docs_df(spark, n: int,
                      n_tokens: int = 60, vocab: int = 50_000) -> DataFrame:
    """Synthesize a REALISTIC-duplicate-density documents corpus (r5
    verdict ask #5): the replica corpora carry sf0.1's planted dup
    structure ×100, which at sf10 manufactures 33.5M simhash candidate
    pairs by construction — output-bound by corpus pathology, not
    engine behavior. Web-scale dedup literature (Manku WWW'07,
    RefinedWeb) sees ~10-30% of docs with a near-dup, cliques of 2-3.

    Here: docs come in groups of 20 ids; within a group, ids with
    id%20 ∈ {1,2} are near-copies of the group head (~2% of token
    positions re-drawn, hash-deterministic) — cliques of exactly 3,
    10% of docs carrying duplicate mass; every other doc's token
    stream is salted by its own id, so cross-doc overlap is random.
    Text is ``n_tokens`` tokens from a ``vocab``-sized vocabulary,
    Zipf-ish via squared-uniform hashing. Pure column arithmetic —
    byte-stable, no RNG, no shuffle."""
    base = spark.range(n).select(F.col("id").alias("doc_id"))
    is_dup = F.col("doc_id") % 20 <= 2
    head = (F.col("doc_id") / 20).cast("bigint") * 20
    src = F.when(is_dup, head).otherwise(F.col("doc_id"))
    idx = F.sequence(F.lit(0), F.lit(n_tokens - 1))

    def tok(seed_col, i):
        u = F.pmod(F.xxhash64(F.lit("rt"), seed_col, i), F.lit(1_000_000))
        # squared-uniform ≈ Zipf-ish head-heavy rank draw
        rank = (u * u / F.lit(1_000_000.0 * 1_000_000.0)
                * F.lit(float(vocab))).cast("bigint")
        return F.concat(F.lit("w"), rank)

    text = F.concat_ws(
        " ",
        F.transform(
            idx,
            lambda i: F.when(
                is_dup
                & (F.pmod(F.xxhash64(F.lit("pos"), F.col("doc_id"), i),
                          F.lit(50)) == 0),
                tok(F.col("doc_id"), i),     # the re-drawn edit position
            ).otherwise(tok(src, i)),
        ),
    )
    return base.select(
        "doc_id", text.alias("text"),
        F.lit("en").alias("lang"),
        F.concat(F.lit("dom"), F.pmod(F.col("doc_id"), F.lit(20)))
        .alias("source"),
    )


def make_realistic_docs(spark, out_dir: str, n: int) -> None:
    os.makedirs(out_dir, exist_ok=True)
    _write(realistic_docs_df(spark, n), out_dir, "documents", n)
    print(f"done: {out_dir} realistic documents n={n}")


def main() -> None:
    if sys.argv[1] == "--realistic-docs":
        # Usage: make_scale_data.py --realistic-docs OUT_DIR N
        spark = get_spark(app_name="fvs-make-realistic",
                          master="local[32]", shuffle_partitions=32)
        spark.sparkContext.setLogLevel("ERROR")
        make_realistic_docs(spark, sys.argv[2], int(sys.argv[3]))
        return
    if sys.argv[1] == "--clustered":
        # Usage: make_scale_data.py --clustered OUT_DIR N [C]
        spark = get_spark(app_name="fvs-make-clustered",
                          master="local[32]", shuffle_partitions=32)
        spark.sparkContext.setLogLevel("ERROR")
        make_clustered_embeddings(
            spark, sys.argv[2], int(sys.argv[3]),
            int(sys.argv[4]) if len(sys.argv) > 4 else None,
        )
        return
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
