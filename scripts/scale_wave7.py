"""Scale rehearsal for the r7 wave operators: time each op at a
replica SF (sf0.1 / _scaledata/sf1 / _scaledata/sf10) with plan gates —
would this op survive 100x?

Also the r6-verdict ask #3 measurement: domain_boilerplate_strip on a
BOILERPLATE-HEAVY corpus (>=10k distinct repeated lines per domain),
with the retired per-line ``array_contains`` probe re-implemented
inline as the comparison engine — records the map-probe speedup and
an order-insensitive output checksum proving both engines produce
identical rows.

Usage: python scripts/scale_wave7.py SF_DIR [CPUS]
Prints one JSON line per op (same row shape as scale_wave3/4/6.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from faiss_vector_search_spark import io as fio  # noqa: E402
from faiss_vector_search_spark.operators import (  # noqa: E402
    analytics,
    dedup,
    embed,
    evaluate,
    lexical,
    rerank,
)
from faiss_vector_search_spark.session import get_spark  # noqa: E402

RAG_QUERY = "batch window vector hash fast stream"
SUITE = [("q1", RAG_QUERY), ("q2", "table scan merge sort"),
         ("q3", "hash agg row batch"), ("q4", "spark line sort win slow")]


def bp_heavy(docs):
    """Boilerplate-heavy corpus: every doc carries 30 lines drawn from
    a per-domain pool of 12,000 distinct boilerplate lines (each line
    lands in >= 3 docs at sf1+), plus its real text — the regime where
    a per-line array_contains scan is O(12k) per line."""
    import functools

    lines = [
        F.concat(F.lit(f"nav {j} for "), F.col("source"), F.lit(" #"),
                 ((F.col("doc_id") * 7 + F.lit(j)) % 12_000)
                 .cast("string"))
        for j in range(30)
    ]
    body = functools.reduce(
        lambda a, b: F.concat(a, F.lit("\n"), b), lines
    )
    return docs.select(
        "doc_id", "source",
        F.concat(body, F.lit("\n"),
                 F.replace(F.col("text"), F.lit(" "), F.lit("\n")))
        .alias("text"),
    )


def bp_strip_array_contains(docs, min_docs=3):
    """The RETIRED r6 engine, inline for the before/after measurement:
    raw-line frequency shuffle + per-line array_contains probe."""
    lines_col = F.split(F.col("text"), "\n")
    base = docs.select(
        F.col("doc_id"), F.col("source"), lines_col.alias("_lines"))
    stream = base.select(
        "doc_id", "source", F.explode_outer("_lines").alias("line"))
    bp = (
        stream.groupBy("source", "line")
        .agg(F.count_distinct(F.col("doc_id")).alias("_nd"))
        .where(F.col("_nd") >= min_docs)
        .groupBy("source")
        .agg(F.array_sort(F.collect_set("line")).alias("_bp"))
    )
    joined = base.join(F.broadcast(bp), "source", "left")
    kept = F.filter(
        F.col("_lines"),
        lambda ln: ~F.coalesce(
            F.array_contains(F.col("_bp"), ln), F.lit(False)),
    )
    staged = joined.select(
        "doc_id", "source",
        F.size("_lines").cast("bigint").alias("n_lines"),
        kept.alias("_kept"),
    )
    return staged.select(
        "doc_id", "source",
        F.array_join(F.col("_kept"), "\n").alias("clean_text"),
        "n_lines",
        F.size("_kept").cast("bigint").alias("n_kept"),
        (F.col("n_lines") - F.size("_kept")).cast("bigint")
        .alias("n_dropped"),
    )


def checksum(df):
    """Order-insensitive whole-output checksum (decimal sum: a long
    sum of 64-bit hashes overflows under ANSI)."""
    return str(df.select(
        F.sum(F.xxhash64(*df.columns).cast("decimal(38,0)")).alias("h")
    ).first()["h"])


def main() -> None:
    sf_dir = sys.argv[1]
    cpus = sys.argv[2] if len(sys.argv) > 2 else "32"
    sf = os.path.basename(os.path.normpath(sf_dir))
    spark = get_spark(
        app_name=f"wave7-{sf}", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = fio.load_table(spark, sf_dir, "documents")
    events = fio.load_table(spark, sf_dir, "events")
    heavy = bp_heavy(docs)

    def suite():
        results = lexical.bm25_search_multi(docs, SUITE, k=10).select(
            "query_tag", "doc_id", "rank")
        truth = embed.text_search_multi(
            docs, SUITE, dim=64, k=5, hash_fn="xxhash64"
        ).select("query_tag", "doc_id")
        return evaluate.retrieval_metrics_by_query(results, truth, k=10)

    ops = {
        "retrieval_eval_suite": suite,
        "bm25_search_multi": lambda: lexical.bm25_search_multi(
            docs, SUITE, k=10),
        "text_search_multi": lambda: embed.text_search_multi(
            docs, SUITE, dim=64, k=5, hash_fn="xxhash64"),
        "event_funnel_horizon": lambda: analytics.event_funnel(
            events, horizon_s=48 * 3600),
        "cross_rerank": lambda: rerank.cross_encoder_rerank(
            docs, RAG_QUERY, k=5, shortlist=20, hash_fn="xxhash64"),
        "hybrid_search_suite": lambda: lexical.hybrid_rrf_multi(
            lexical.bm25_search_multi(docs, SUITE, k=20).select(
                "query_tag", "doc_id", "score"),
            embed.text_search_multi(
                docs, SUITE, dim=64, k=20, hash_fn="xxhash64"
            ).select("query_tag", "doc_id", "score"),
            k=10),
        "chunk_search_ivf": lambda: embed.chunk_text_search_ivf(
            docs, RAG_QUERY, k=5, nlist=16, nprobe=4, hash_fn="xxhash64"),
        "bp_heavy_intersect": lambda: dedup.domain_boilerplate_strip(
            heavy, min_docs=3),
        # the retired engine never finishes the full 10x corpus
        # (4.2M lines x 18k-line pool = ~77e9 comparisons; >590 s),
        # so the apples-to-apples number runs both engines on the
        # same deterministic 1/6 subset (pool still saturated) with
        # an output-equality checksum
        "bp_heavy_intersect_sub": lambda: dedup.domain_boilerplate_strip(
            heavy.where(F.col("doc_id") % 6 == 0), min_docs=3),
        "bp_heavy_array_contains_sub": lambda: bp_strip_array_contains(
            heavy.where(F.col("doc_id") % 6 == 0), min_docs=3),
    }
    for name, fn in ops.items():
        df = fn()
        df.write.mode("overwrite").format("noop").save()  # compile
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            df.write.mode("overwrite").format("noop").save()
            best = min(best, time.time() - t0)
        rows = df.count()
        plan = df._jdf.queryExecution().executedPlan().toString()
        final = plan.split("Initial Plan")[0]
        row = {
            "op": name,
            "sf": sf,
            "sec": round(best, 3),
            "rows": rows,
            "exchanges": final.count("Exchange hashpartitioning")
            + final.count("Exchange SinglePartition")
            + final.count("Exchange rangepartitioning"),
            "cartesian": "CartesianProduct" in final,
            "sort_merge_join": "SortMergeJoin" in final,
            "scans": final.count("Scan parquet"),
        }
        gates = {
            "retrieval_eval_suite": not row["sort_merge_join"]
            and not row["cartesian"],
            # corpus passes bounded by ENGINE STRUCTURE (stats agg +
            # match stream + df agg = 3, same as single-query BM25),
            # not by |Q| — the multi-query point
            "bm25_search_multi": not row["sort_merge_join"]
            and not row["cartesian"] and row["scans"] <= 3,
            "text_search_multi": not row["sort_merge_join"]
            and not row["cartesian"] and row["scans"] <= 1,
            "event_funnel_horizon": not row["sort_merge_join"]
            and not row["cartesian"],
            "cross_rerank": not row["sort_merge_join"]
            and not row["cartesian"],
            "hybrid_search_suite": not row["sort_merge_join"]
            and not row["cartesian"],
            "chunk_search_ivf": not row["sort_merge_join"]
            and not row["cartesian"],
            "bp_heavy_intersect": not row["sort_merge_join"]
            and not row["cartesian"] and "BroadcastHashJoin" in final,
        }
        row["gate"] = bool(gates.get(name, True))
        if name.endswith("_sub"):
            row["checksum"] = checksum(df)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
