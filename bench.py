"""Headline benchmark: runs the engine's flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query is forced to full materialization with the noop sink (so
column pruning can't skip the measured work). One warm-up pass of the
first query absorbs JVM/codegen warm-up.
"""

from __future__ import annotations

import json
import os
import sys
import time

HEADLINE = [
    "knn_topk_ip",
    "knn_batch",
    "ivf_search",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "lang_id",
    "quality_score",
    "doc_fingerprint",
    "chunk_fixed",
    "events_sessionize",
    "events_tumbling",
    "tpch_q1",
    "top_customers_by_nation",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from faiss_vector_search_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(
        app_name="fvs-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    def run(name: str) -> float:
        t0 = time.time()
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        return time.time() - t0

    run(HEADLINE[0])  # warm-up: JVM, codegen, parquet footer cache

    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in qs:
            continue
        timings[name] = round(run(name), 3)

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
