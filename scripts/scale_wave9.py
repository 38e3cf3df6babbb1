"""Scale rehearsal for the r9 wave: the retrieval-eval/suite family
(the r8 verdict's ask #6 — these keys had no committed 10x/100x rows)
plus the two serving-path promotions, timed at a replica SF
(sf0.1 / _scaledata/sf1 / _scaledata/sf10) with plan gates.

The r9 claims under measurement:

1. Retrieval-metric union rewrite (evaluate.py): the old left-join
   form consumed the truth frame twice — at 100x that re-planned the
   entire dense truth ENGINE (a corpus pass) twice per evaluation,
   and the suite's macro row duplicated the whole tree again. The
   union + in-row-explode form reads each corpus engine once, so the
   eval harness scales with the ENGINES (two corpus passes for the
   suite), not with the metric plumbing. Gate: no SortMergeJoin, no
   CartesianProduct, scan count stays at the engine budget.
2. bm25/hybrid exchange fusion (lexical.py): driver-side (tag, term)
   dedup, df as a plain count over the per-(doc, term) tf frame, and
   one repartition(tag) for the scoring agg + rank window (suite) /
   fusion groupBy + final window (hybrid). Hash-identical outputs —
   the correctness side is the driver gate; here we record walls +
   exchange counts across SFs.
3. Promoted serving paths: bm25_index_search (probe cost tracks query
   terms' postings, not corpus size) and chunk_search_persisted at
   the full-probe exact dial vs the pruned production dial.

Usage: python scripts/scale_wave9.py SF_DIR [CPUS]
Prints one JSON line per op (same row shape as scale_wave3/4/6/7/8.py).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from faiss_vector_search_spark import io as fio  # noqa: E402
from faiss_vector_search_spark.operators import (  # noqa: E402
    classifier,
    dedup,
    embed,
    evaluate,
    lexical,
)
from faiss_vector_search_spark.session import get_spark  # noqa: E402

RAG_QUERY = "batch window vector hash fast stream"
EVAL_QUERIES = (
    RAG_QUERY,
    "table scan merge sort",
    "hash agg row batch",
    "spark line sort win slow",
)


def main() -> None:
    sf_dir = sys.argv[1]
    cpus = sys.argv[2] if len(sys.argv) > 2 else "32"
    sf = os.path.basename(os.path.normpath(sf_dir))
    spark = get_spark(
        app_name=f"wave9-{sf}", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = fio.load_table(spark, sf_dir, "documents")
    tagged = [(f"q{i}", q) for i, q in enumerate(EVAL_QUERIES, 1)]

    # persisted stores built once per run, timed as their own rows
    lex_path = tempfile.mkdtemp(prefix=f"fvs_wave9_{sf}_") + "/lexidx"
    t0 = time.time()
    lexical.lexical_index_save(docs, lex_path)
    lex_build = round(time.time() - t0, 3)
    chunk_path = tempfile.mkdtemp(prefix=f"fvs_wave9_{sf}_") + "/chunkidx"
    t0 = time.time()
    embed.chunk_index_build(docs, chunk_path, nlist=16, hash_fn="xxhash64")
    chunk_build = round(time.time() - t0, 3)
    print(json.dumps({"op": "lexical_index_build", "sf": sf,
                      "sec": lex_build, "rows": None}), flush=True)
    print(json.dumps({"op": "chunk_index_build", "sf": sf,
                      "sec": chunk_build, "rows": None}), flush=True)

    def eval_single():
        lex = lexical.bm25_search(docs, RAG_QUERY, k=10)
        results = lex.select(
            "doc_id",
            F.row_number().over(
                Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
            ).alias("rank"),
        )
        truth = embed.text_search(
            docs, RAG_QUERY, dim=64, k=5, hash_fn="xxhash64"
        ).select("doc_id")
        return evaluate.retrieval_metrics(results, truth, k=10)

    def eval_suite():
        results = lexical.bm25_search_multi(docs, tagged, k=10).select(
            "query_tag", "doc_id", "rank")
        truth = embed.text_search_multi(
            docs, tagged, dim=64, k=5, hash_fn="xxhash64"
        ).select("query_tag", "doc_id")
        return evaluate.retrieval_metrics_by_query(results, truth, k=10)

    def hybrid_suite():
        lex = lexical.bm25_search_multi(docs, tagged, k=20).select(
            "query_tag", "doc_id", "score")
        den = embed.text_search_multi(
            docs, tagged, dim=64, k=20, hash_fn="xxhash64"
        ).select("query_tag", "doc_id", "score")
        return lexical.hybrid_rrf_multi(lex, den, k=10)

    ops = {
        "retrieval_eval": eval_single,
        "retrieval_eval_suite": eval_suite,
        "hybrid_search_suite": hybrid_suite,
        "bm25_search": lambda: lexical.bm25_search(docs, RAG_QUERY, k=10),
        "bm25_search_multi": lambda: lexical.bm25_search_multi(
            docs, tagged, k=10),
        "bm25_index_search": lambda: lexical.bm25_index_search(
            spark, lex_path, RAG_QUERY, k=10),
        "chunk_search_ivf_full_probe": lambda: embed.chunk_search_persisted(
            spark, chunk_path, RAG_QUERY, k=5, nprobe=16,
            hash_fn="xxhash64"),
        "chunk_search_ivf_pruned": lambda: embed.chunk_search_persisted(
            spark, chunk_path, RAG_QUERY, k=5, nprobe=4,
            hash_fn="xxhash64"),
        # r9 new operators (SURVEY #208/#209)
        "contamination_report": lambda: dedup.contamination_report(
            docs.where(F.col("doc_id") % 50 != 0),
            docs.where(F.col("doc_id") % 50 == 0),
            n=8, hash_fn="xxhash64"),
        "classifier_calibration": lambda: (
            classifier.quality_calibration_report(
                docs, classifier.load_model(), n_bins=10, hash_fn="md5")),
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
        # the whole family must stay SMJ/cartesian-free at every SF;
        # the eval harness additionally must not grow its corpus-scan
        # budget past the two stage-1 engines (bm25 reads the corpus
        # twice: stats + matched; dense reads it once)
        gates = {
            "retrieval_eval": not row["sort_merge_join"]
            and not row["cartesian"] and row["scans"] <= 3,
            "retrieval_eval_suite": not row["sort_merge_join"]
            and not row["cartesian"] and row["scans"] <= 3,
            "hybrid_search_suite": not row["sort_merge_join"]
            and not row["cartesian"] and row["scans"] <= 3,
            "bm25_index_search": not row["sort_merge_join"]
            and "PartitionFilters: [" in plan
            and "PartitionFilters: []" not in plan,
            "chunk_search_ivf_pruned": not row["sort_merge_join"]
            and "PartitionFilters: [" in plan
            and "PartitionFilters: []" not in plan,
            # benchmark side broadcasts; corpus never shuffles pre-join
            "contamination_report": not row["sort_merge_join"]
            and "BroadcastHashJoin" in final,
            # both signals chain off ONE scan: join-free by construction
            "classifier_calibration": not row["sort_merge_join"]
            and "Join" not in final and row["scans"] <= 1,
        }
        if name in gates:
            row["gate"] = bool(gates[name])
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
