"""Scale rehearsal for the r5 wave-4 operators: time each op at a
replica SF (sf0.1 / _scaledata/sf1 / _scaledata/sf10) with plan gates —
would this op survive 100×?

Usage: python scripts/scale_wave4.py SF_DIR [CPUS]
Prints one JSON line per op (same row shape as scale_wave3.py).
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
    chunking,
    dedup,
    knn,
    lexical,
    textstats,
    transform,
)
from faiss_vector_search_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    cpus = sys.argv[2] if len(sys.argv) > 2 else "32"
    sf = os.path.basename(os.path.normpath(sf_dir))
    spark = get_spark(
        app_name=f"wave4-{sf}", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    docs = fio.load_table(spark, sf_dir, "documents")
    emb = fio.load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("query_vec")
    )

    ops = {
        "ngram_novelty": lambda: textstats.ngram_novelty(
            docs, w=8, hash_fn="xxhash64"
        ),
        "maxsim_search": lambda: lexical.maxsim_search(
            docs, "batch window vector hash fast stream",
            k=10, hash_fn="xxhash64",
        ),
        "curriculum_order": lambda: textstats.curriculum_order(docs),
        "ccnet_buckets": lambda: textstats.ccnet_buckets(docs),
        "matryoshka_rerank_search": lambda: knn.matryoshka_rerank_search(
            emb, q, k=10, prefix=16, shortlist=100
        ),
        # training (PCA one-pass + Lloyd) happens inside the op — its
        # wall is the BUILD cost; the search phase is the 0-exchange
        # scan the plan gate pins
        "pca_ivf_search": lambda: transform.pca_ivf_search(
            emb, q, out_dim=16, nlist=16, nprobe=4, k=10, shortlist=100
        ),
        "fim_transform": lambda: chunking.fim_transform(
            docs, rate_permille=500, min_chars=20, hash_fn="xxhash64"
        ),
        "zipf_profile": lambda: textstats.zipf_profile(docs, top_n=100),
        # constant-work by design: bounded sample, quadratic part is
        # sample_k^2/2 pairs at ANY corpus size
        "self_similarity": lambda: dedup.self_similarity_report(
            docs, sample_k=40, shingle_n=2
        ),
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
            # gram rollup + owner rollup (both map-side combined) and
            # the arithmetic count branch: 2 scans, <= 3 exchanges,
            # text never shuffles
            "ngram_novelty": row["exchanges"] <= 3 and row["scans"] <= 2
            and not row["cartesian"],
            # one doc-keyed agg, zero joins
            "maxsim_search": row["exchanges"] <= 1 and row["scans"] == 1
            and not row["cartesian"],
            "curriculum_order": not row["cartesian"]
            and not row["sort_merge_join"],
            "ccnet_buckets": not row["cartesian"]
            and not row["sort_merge_join"],
            # TakeOrdered twice + broadcast semi-join: no exchange
            "matryoshka_rerank_search": row["exchanges"] == 0
            and not row["sort_merge_join"],
            # the op trains per call, so the plan embeds the Lloyd
            # aggregation's exchange (build-time, by design); the
            # probe+rerank phase itself is exchange-free — matryoshka
            # (same search shape, no training) pins that at 0
            "pca_ivf_search": row["exchanges"] <= 2
            and not row["sort_merge_join"] and not row["cartesian"],
            # one zero-shuffle zero-join projection
            "fim_transform": row["exchanges"] == 0 and row["scans"] == 1
            and not row["cartesian"],
            # rollup + totals + top-100 head: token explode scans twice
            "zipf_profile": row["scans"] <= 2 and not row["cartesian"]
            and not row["sort_merge_join"],
            # the quadratic pair join is over the BOUNDED sample
            # (broadcast NL join is expected and fine at 40 rows)
            "self_similarity": not row["sort_merge_join"],
        }
        row["gates_ok"] = bool(gates[name])
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
