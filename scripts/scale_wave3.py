"""Scale rehearsal for the r5 third-wave operators: time each op at a
replica SF (sf0.1 / _scaledata/sf1 / _scaledata/sf10) with the same
plan gates the sf*_r5ops sweep records — would this op survive 100×?

Usage: python scripts/scale_wave3.py SF_DIR [CPUS]
Prints one JSON line per op (same row shape as scale_rehearsal.py).
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
from faiss_vector_search_spark.operators import (  # noqa: E402
    chunking,
    classifier,
    knn,
    lexical,
    lm,
    textstats,
)
from faiss_vector_search_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    cpus = sys.argv[2] if len(sys.argv) > 2 else "32"
    sf = os.path.basename(os.path.normpath(sf_dir))
    spark = get_spark(
        app_name=f"wave3-{sf}", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    docs = fio.load_table(spark, sf_dir, "documents")
    emb = fio.load_table(spark, sf_dir, "embeddings")
    n_docs = docs.count()
    model = classifier.load_model()
    anchors = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        F.col("label").alias("query_label"),
    )
    lex_path = tempfile.mkdtemp(prefix=f"fvs_w3_{sf}_") + "/idx"
    t0 = time.time()
    lexical.lexical_index_save(docs, lex_path)
    build_sec = round(time.time() - t0, 3)
    print(json.dumps({"op": "lexical_index_build", "sf": sf,
                      "build_sec": build_sec}), flush=True)

    ops = {
        "pmi_collocations": lambda: lexical.pmi_collocations(
            docs, min_count=5, top_n=50
        ),
        "domain_kl": lambda: lm.domain_kl_report(docs),
        "length_batches": lambda: chunking.length_bucket_batches(
            docs, batch_size=32, bucket_width=64, n_shards=8,
            hash_fn="xxhash64",
        ),
        "quality_classifier": lambda: classifier.score_quality_classifier(
            docs, model, hash_fn="md5"
        ),
        "hard_negatives": lambda: knn.hard_negatives(emb, anchors, k=5),
        # budgets scale with the corpus so the op does real per-domain
        # work at every SF (a fixed cap would select ~0 docs at 100x)
        "token_budget_sample": lambda: textstats.token_budget_sample(
            docs,
            {f"src{i}": max(200, n_docs // 4) for i in range(20)},
        ),
        "bm25_index_search": lambda: lexical.bm25_index_search(
            spark, lex_path, "batch window vector hash fast stream", k=10
        ),
    }
    for name, fn in ops.items():
        df = fn()
        df.write.mode("overwrite").format("noop").save()  # compile
        best = float("inf")
        # noop write, NOT count(): count() on a projection-only op
        # collapses to the parquet row-count and never runs the
        # expressions (caught on quality_classifier: 0.09 s at every
        # SF was the metadata count, not the fold)
        for _ in range(3):
            t0 = time.time()
            df.write.mode("overwrite").format("noop").save()
            best = min(best, time.time() - t0)
        rows = df.count()
        df.collect()
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
            "partition_pruned": "PartitionFilters: [is" in final
            or ("PartitionFilters: [" in final
                and "PartitionFilters: []" not in final),
            "scans": final.count("Scan parquet"),
        }
        gates = {
            "pmi_collocations": not row["sort_merge_join"]
            and not row["cartesian"] and row["scans"] <= 2,
            "domain_kl": row["scans"] == 1,
            "length_batches": not row["cartesian"],
            "quality_classifier": row["exchanges"] == 0,
            "hard_negatives": not row["sort_merge_join"]
            and not row["cartesian"],
            "bm25_index_search": row["partition_pruned"],
            "token_budget_sample": not row["cartesian"]
            and not row["sort_merge_join"],
        }
        row["gates_ok"] = bool(gates[name])
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
