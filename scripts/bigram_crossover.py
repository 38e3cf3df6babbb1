"""Measure the exact-vs-sketch crossover for corpus n-gram stats
(VERDICT r2 ask #3: demonstrate where approx_top_k beats the exact
groupBy, or demote the claim).

The claim under test (operators/sketches.py:bigram_heavy_hitters): the
exact ``groupBy(bigram).count`` shuffles |distinct bigrams| rows —
unbounded state — while the sketch shuffles one ~max_tracked summary
per partition; the sketch should win once distinct n-grams outgrow
executor memory, and lose below that (interpreted sketch updates vs
whole-stage-codegen hash agg).

Method: the sf0.1 documents corpus has a fixed (and tiny, ~1k)
distinct-bigram count, so cardinality is scaled SYNTHETICALLY: each
bigram row explodes R ways with a per-ROW salt
(``pmod(xxhash64(bigram, rid, s), 1000003)``), so distinct values grow
~linearly with row volume for BOTH paths identically — a stand-in for
sf1+/sf10 where the real vocabulary explodes. Memory is constrained
(driver = executor in local mode) so the exact path's hash aggregate
actually faces its unbounded state. Run:

    SPARK_DRIVER_MEMORY=1g python scripts/bigram_crossover.py

Prints one JSON line per (R, path) with wall seconds; paste the table
into BENCH_BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pyspark.sql import functions as F

    from faiss_vector_search_spark import io as fio
    from faiss_vector_search_spark.functions.text import tokens
    from faiss_vector_search_spark.session import get_spark

    spark = get_spark(
        app_name="bigram-crossover", master="local[8]", shuffle_partitions=8
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = fio.load_table(spark, sf_dir, "documents")

    toks = tokens(F.col("text"))
    bigrams = F.transform(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda t, i: F.concat_ws(" ", t, F.element_at(toks, i + 2)),
    )

    def salted(repl: int):
        """bigram stream with ~repl× rows and distinct count ≈ rows:
        the salt includes a per-row id, so aggregate state grows
        linearly with volume — the unbounded-state regime the sketch
        is built for (sf0.1's own vocabulary is only ~1k bigrams, far
        below any memory bound; heavy hitters keep their counts, the
        salted tail is the state ballast)."""
        base = docs.select(F.explode(bigrams).alias("bigram")).withColumn(
            "rid", F.monotonically_increasing_id()
        )
        if repl == 1:
            return base.select("bigram")
        return base.select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(repl - 1)),
                    lambda s: F.concat_ws(
                        "#",
                        F.col("bigram"),
                        F.pmod(F.xxhash64("bigram", F.col("rid"), s), 1000003),
                    ),
                )
            ).alias("bigram")
        )

    def exact_topk(stream, k=20):
        return (
            stream.groupBy("bigram")
            .agg(F.count("*").alias("n"))
            .orderBy(F.col("n").desc(), F.col("bigram"))
            .limit(k)
        )

    def sketch_topk(stream, k=20, max_tracked=10000):
        return (
            stream.agg(
                F.expr(f"approx_top_k(bigram, {k}, {max_tracked})").alias("top")
            )
            .select(F.explode("top").alias("e"))
            .select(F.col("e.item").alias("bigram"), F.col("e.count").alias("n"))
        )

    def run(df) -> float:
        df.write.mode("overwrite").format("noop").save()  # codegen compile
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            df.write.mode("overwrite").format("noop").save()
            best = min(best, time.time() - t0)
        return round(best, 3)

    for repl in (1, 32):
        stream = salted(repl)
        distinct = stream.agg(
            F.approx_count_distinct("bigram")
        ).first()[0]
        ex = run(exact_topk(stream))
        sk = run(sketch_topk(stream))
        print(
            json.dumps(
                {
                    "repl": repl,
                    "distinct_bigrams": distinct,
                    "exact_sec": ex,
                    "sketch_sec": sk,
                    "sketch_wins": sk < ex,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    sys.exit(main())
