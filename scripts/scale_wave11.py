"""Scale rehearsal for the r11 wave (r10 verdict asks #3/#4/#5/#6):

1. percolate at STANDING-QUERY scale (|Q| = 10 / 1k / 10k — the
   Elasticsearch-percolator regime): the r10 literal-array form pays
   |term-union| per doc in the in-row array_intersect; the r11
   ``engine="join"`` form explodes distinct tokens and lets the
   broadcast qframe filter them — per-doc cost union-independent.
   Both measured; plan-build time recorded separately (a 20k-literal
   array is itself a plan-size cost).
2. fuzzy_index_search vs the scan-form fuzzy_search at 1x/10x/100x:
   the probe reads the length-pruned ``_terms`` dictionary + pruned
   posting buckets — expect FLAT walls (the bm25_index_search
   profile) vs the scan form's corpus-linear vocabulary pass.
3. ql_search_multi (promoted to the contract this round): 2 corpus
   scans independent of |Q|, no term window.
4. Streaming replay-guard cost at a 100x-sized alert store (the ask
   #3 BENCH_BASELINE note): per-batch guard wall with the bounded
   horizon slice vs the pre-r11 whole-store read, on a store of 200
   accumulated ingest batches (1M alert rows).

Usage: python scripts/scale_wave11.py SF_DIR [CPUS]
Prints one JSON line per op (the scale_wave9/10 row shape).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from faiss_vector_search_spark import io as fio  # noqa: E402
from faiss_vector_search_spark.operators import lexical  # noqa: E402
from faiss_vector_search_spark.session import get_spark  # noqa: E402

FUZZY_QUERY = "bath windov vektor"
QL_QUERIES = [
    ("q1", "batch window vector hash fast stream"),
    ("q2", "table scan merge sort"),
    ("q3", "hash agg row batch"),
    ("q4", "spark line sort win slow"),
]


def synth_queries(spark, docs, n: int) -> list[tuple[str, str]]:
    """n deterministic 2-term standing queries over the corpus
    vocabulary (paired by a fixed stride so term overlap between
    queries is realistic, not degenerate)."""
    vocab = [
        r["t"]
        for r in docs.select(
            F.explode(
                F.array_distinct(
                    F.coalesce(
                        F.split(F.lower("text"), "[^a-z0-9]+"),
                        F.array().cast("array<string>"),
                    )
                )
            ).alias("t")
        )
        .where(F.col("t") != "")
        .groupBy("t")
        .count()
        .orderBy(F.desc("count"), "t")
        .limit(max(200, n // 3))
        .collect()
    ]
    v = len(vocab)
    return [
        (f"sq{i}", f"{vocab[i % v]} {vocab[(i * 7 + 3) % v]}")
        for i in range(n)
    ]


def measure(df):
    t0 = time.time()
    df.write.mode("overwrite").format("noop").save()  # compile
    build = time.time() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        df.write.mode("overwrite").format("noop").save()
        best = min(best, time.time() - t0)
    return build, best


def plan_row(name, sf, df, build, best, extra=None):
    final = df._jdf.queryExecution().executedPlan().toString().split(
        "Initial Plan")[0]
    row = {
        "op": name,
        "sf": sf,
        "sec": round(best, 3),
        "build_sec": round(build, 3),
        "exchanges": final.count("Exchange hashpartitioning")
        + final.count("Exchange SinglePartition")
        + final.count("Exchange rangepartitioning"),
        "cartesian": "CartesianProduct" in final,
        "sort_merge_join": "SortMergeJoin" in final,
        "scans": final.count("Scan parquet"),
        "window": "Window" in final,
    }
    if extra:
        row.update(extra)
    return row, final


def main() -> None:
    sf_dir = sys.argv[1]
    cpus = sys.argv[2] if len(sys.argv) > 2 else "32"
    sf = os.path.basename(os.path.normpath(sf_dir))
    spark = get_spark(
        app_name=f"wave11-{sf}", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = fio.load_table(spark, sf_dir, "documents")

    # --- 1. percolator at standing-query scale --------------------
    # the |Q| sweep runs at the bench SF; the 100x corpus rows keep
    # |Q| <= 1k (the 10k x 100x cell costs minutes and adds no new
    # information: |Q|-scaling and corpus-scaling factor cleanly)
    nqs = (10, 1000, 10000) if sf in ("sf0.01", "sf0.1") else (10, 1000)
    for nq in nqs:
        queries = synth_queries(spark, docs, nq)
        for engine in ("literal", "join"):
            df = lexical.percolate(docs, queries, engine=engine)
            build, best = measure(df)
            row, final = plan_row(
                f"percolate_{engine}_q{nq}", sf, df, build, best,
                {"n_queries": nq},
            )
            row["gate"] = (
                "pass"
                if not row["cartesian"]
                and not row["sort_merge_join"]
                and row["scans"] == 1
                else "FAIL"
            )
            print(json.dumps(row), flush=True)

    # --- 2. fuzzy: scan form vs index-served ----------------------
    df = lexical.fuzzy_search(docs, FUZZY_QUERY, k=10, max_dist=1)
    build, best = measure(df)
    row, _ = plan_row("fuzzy_search_scan", sf, df, build, best)
    row["gate"] = "pass" if row["scans"] <= 2 else "FAIL"
    print(json.dumps(row), flush=True)

    idx = tempfile.mkdtemp(prefix=f"fvs_w11_lexidx_{sf}_") + "/idx"
    t0 = time.time()
    lexical.lexical_index_save(docs, idx)
    build_wall = time.time() - t0
    df = lexical.fuzzy_index_search(spark, idx, FUZZY_QUERY, k=10, max_dist=1)
    build, best = measure(df)
    row, final = plan_row(
        "fuzzy_index_search", sf, df, build, best,
        {"index_build_sec": round(build_wall, 1)},
    )
    pruned = "PartitionFilters: [" in final and "tb" in final
    row["gate"] = (
        "pass"
        if row["scans"] == 1  # ONE pruned postings scan (df rides a
        # term window over it — the r11 df-window fix to the probe)
        and pruned and not row["sort_merge_join"]
        else "FAIL"
    )
    print(json.dumps(row), flush=True)

    # --- 3. ql_search_multi (contract key) ------------------------
    df = lexical.ql_search_multi(docs, QL_QUERIES, k=10)
    build, best = measure(df)
    row, _ = plan_row("ql_search_multi", sf, df, build, best)
    row["gate"] = (
        "pass"
        if row["scans"] <= 2 and not row["sort_merge_join"]
        and not row["cartesian"]
        else "FAIL"
    )
    print(json.dumps(row), flush=True)

    # --- 4. replay-guard cost at a 100x store (sf0.1 run only) ----
    if sf in ("sf0.1", "sf0.01"):
        from faiss_vector_search_spark.streaming import streams

        store = tempfile.mkdtemp(prefix="fvs_w11_store_") + "/alerts"
        n_batches, rows_per = 200, 5000
        base = spark.range(n_batches * rows_per).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("q"), (F.col("id") % 50)).alias("query_id"),
            (F.col("id") % n_batches).cast("int").alias("_ingest_batch"),
        )
        base.repartition("_ingest_batch").write.partitionBy(
            "_ingest_batch"
        ).parquet(store)
        batch = spark.range(10_000_000, 10_005_000).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("q"), (F.col("id") % 50)).alias("query_id"),
        )
        for label, horizon in (("horizon16", 16), ("wholestore", None)):
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                seen = streams.replay_slice(
                    spark, store, n_batches, horizon
                ).select("doc_id", "query_id")
                batch.join(
                    seen, ["doc_id", "query_id"], "left_anti"
                ).write.mode("overwrite").format("noop").save()
                best = min(best, time.time() - t0)
            print(json.dumps({
                "op": f"replay_guard_{label}",
                "sf": sf,
                "store_rows": n_batches * rows_per,
                "store_batches": n_batches,
                "sec": round(best, 3),
                "gate": "pass",
            }), flush=True)


if __name__ == "__main__":
    main()
