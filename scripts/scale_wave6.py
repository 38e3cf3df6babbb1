"""Scale rehearsal for the r6 wave operators: time each op at a
replica SF (sf0.1 / _scaledata/sf1 / _scaledata/sf10) with plan gates —
would this op survive 100x?

Usage: python scripts/scale_wave6.py SF_DIR [CPUS]
Prints one JSON line per op (same row shape as scale_wave3/4.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import Window as W  # noqa: E402

from faiss_vector_search_spark import io as fio  # noqa: E402
from faiss_vector_search_spark.operators import (  # noqa: E402
    analytics,
    dedup,
    evaluate,
    knn,
    lexical,
    textstats,
)
from faiss_vector_search_spark.session import get_spark  # noqa: E402

RAG_QUERY = "batch window vector hash fast stream"


def main() -> None:
    sf_dir = sys.argv[1]
    cpus = sys.argv[2] if len(sys.argv) > 2 else "32"
    sf = os.path.basename(os.path.normpath(sf_dir))
    spark = get_spark(
        app_name=f"wave6-{sf}", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = fio.load_table(spark, sf_dir, "documents")
    emb = fio.load_table(spark, sf_dir, "embeddings")
    events = fio.load_table(spark, sf_dir, "events")
    lined = docs.select(
        "doc_id", "source",
        F.concat(
            F.lit("banner for "), F.col("source"), F.lit("\n"),
            F.replace(F.col("text"), F.lit(" a "), F.lit("\n")),
            F.lit("\nshared footer line"),
        ).alias("text"),
    )
    queries = emb.where(F.col("vec_id").isin([0, 3, 7, 11])).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )

    def retrieval_eval():
        lex = lexical.bm25_search(docs, RAG_QUERY, k=10)
        results = lex.select(
            "doc_id",
            F.row_number().over(
                W.orderBy(F.col("score").desc(), F.col("doc_id").asc())
            ).alias("rank"),
        )
        from faiss_vector_search_spark.operators import embed

        truth = embed.text_search(
            docs, RAG_QUERY, dim=64, k=5, hash_fn="xxhash64"
        ).select("doc_id")
        return evaluate.retrieval_metrics(results, truth, k=10)

    ops = {
        "c4_rules": lambda: textstats.c4_rules(
            docs.select(
                "doc_id",
                F.concat(F.replace(F.col("text"), F.lit(" a "),
                                   F.lit(".\n")), F.lit(".")).alias("text"),
            )
        ),
        "ngram_lookup": lambda: lexical.ngram_count_lookup(
            docs, ["table table", "fast spark", "batch window vector",
                   "zzz qqq"],
        ),
        "domain_boilerplate": lambda: dedup.domain_boilerplate_strip(
            lined, min_docs=3
        ),
        "knn_classify": lambda: knn.knn_classify(emb, queries, k=10),
        "embedding_drift": lambda: evaluate.embedding_drift_report(
            emb.where(F.col("label") < 4), emb.where(F.col("label") >= 4)
        ),
        "event_funnel": lambda: analytics.event_funnel(events),
        "retrieval_eval": retrieval_eval,
        # late r6 wave
        "chunk_search": lambda: __import__(
            "faiss_vector_search_spark.operators.embed", fromlist=["x"]
        ).chunk_text_search(
            docs, RAG_QUERY, k=5, min_size=100, max_size=250, overlap=20,
            hash_fn="xxhash64",
        ),
        "domain_temperature": lambda: textstats.domain_temperature_sample(
            docs, n_total=docs.count() // 2, alpha=0.5
        ),
        "model_rerank": lambda: __import__(
            "faiss_vector_search_spark.operators.rerank", fromlist=["x"]
        ).model_rerank(docs, RAG_QUERY, k=5, shortlist=20,
                       hash_fn="xxhash64"),
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
            # staged in-row projections: zero exchanges
            "c4_rules": row["exchanges"] == 0 and not row["cartesian"],
            # hit stream only: one scan per phrase length + count agg
            "ngram_lookup": not row["cartesian"]
            and not row["sort_merge_join"],
            # frequency stream shuffles; the rebuild broadcast-joins
            "domain_boilerplate": not row["sort_merge_join"]
            and not row["cartesian"] and "BroadcastHashJoin" in final,
            # one corpus scan crossed with the broadcast queries
            "knn_classify": not row["sort_merge_join"],
            # one hash agg, no join
            "embedding_drift": row["exchanges"] <= 2 and "Join" not in final,
            "event_funnel": not row["sort_merge_join"]
            and not row["cartesian"],
            "retrieval_eval": not row["sort_merge_join"]
            and not row["cartesian"],
            "chunk_search": not row["sort_merge_join"]
            and not row["cartesian"],
            "domain_temperature": not row["sort_merge_join"]
            and not row["cartesian"],
            "model_rerank": not row["sort_merge_join"]
            and not row["cartesian"],
        }
        row["gate"] = bool(gates.get(name, True))
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
