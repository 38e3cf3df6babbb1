"""Recall-at-scale measurement for the 100x rehearsal: run the
engine's own recall_report (operators/evaluate.py) on the scaled
corpora with scale-sized parameters (nlist ~ sqrt(N), log2-scaled LSH
bits, bounded-sample PQ training, arrow engines), so the rehearsal
records not just that index searches stay fast at 100x the vectors,
but what recall@10 each ANN tier still delivers there.

Usage: python scripts/scale_recall.py SF_DIR [CPUS] [NPROBE] [kmeans]
Prints one JSON line: per-tier recall plus the parameters used.
NPROBE overrides the default nlist//32 — the recall/scan-fraction
dial; run twice to record the tradeoff curve's slope at scale.
A 4th arg "kmeans" trains the coarse quantizer (arrow Lloyd,
bounded sample) instead of the seeded default — the dial that
decides whether residual encoding helps or halves (BENCH_BASELINE
residual table); record BOTH rows.
"""

from __future__ import annotations

import json
import math
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from faiss_vector_search_spark import io as fio  # noqa: E402
from faiss_vector_search_spark.operators import evaluate  # noqa: E402
from faiss_vector_search_spark.operators.lsh import lsh_bits_for  # noqa: E402
from faiss_vector_search_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    cpus = sys.argv[2] if len(sys.argv) > 2 else "32"
    label = sf_dir.rstrip("/").rsplit("/", 1)[-1]

    spark = get_spark(
        app_name="fvs-scale-recall",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    emb = fio.load_table(spark, sf_dir, "embeddings").cache()
    n = emb.count()
    nlist = max(16, int(math.sqrt(n)))
    nprobe = (
        int(sys.argv[3]) if len(sys.argv) > 3 else max(4, nlist // 32)
    )
    bits = lsh_bits_for(n, target_bucket_size=64)
    # id-strided query sample across the whole corpus (every replica
    # orientation is represented)
    qids = tuple(i * (n // 8) + 2 for i in range(8))

    quantizer = "seeded"
    cents = None
    if len(sys.argv) > 4 and sys.argv[4] == "kmeans":
        from faiss_vector_search_spark.operators import ivf as ivf_mod

        quantizer = "kmeans"
        cents = ivf_mod.kmeans_centroids(
            emb, nlist, iters=5, engine="arrow", train_sample=20_000
        ).cache()
        cents.count()

    t0 = time.time()
    report = evaluate.recall_report(
        emb,
        centroids=cents,
        query_ids=qids,
        k=10,
        nlist=nlist,
        nprobe=nprobe,
        pq_m=16,
        pq_ksub=64,
        pq_iters=4,
        lsh_tables=24,
        lsh_bits=bits,
        lsh_multiprobe=4,
        engine="arrow",
        pq_train_sample=20_000,
        include_opq=True,
        include_residual=True,
    )
    recalls = {r.tier: r.recall_at_k for r in report.collect()}
    print(json.dumps({
        "metric": "scale_recall_report",
        "sf": label,
        "n_vec": n,
        "k": 10,
        "nlist": nlist,
        "nprobe": nprobe,
        "quantizer": quantizer,
        "lsh_bits": bits,
        "lsh_tables": 24,
        "wall_sec": round(time.time() - t0, 1),
        "recall_at_10": recalls,
    }), flush=True)


if __name__ == "__main__":
    main()
