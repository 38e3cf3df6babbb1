"""Scale rehearsal for the r11 OPTIMIZATION round: measure the
rewritten production engines at 1x/10x(/100x) the bench SF against
inline reconstructions of the forms they replaced, so the committed
sf0.1 wins are shown to compound (not shrink) with data size.

Ops covered (the round's structural rewrites):
- span window hashing (repeated_spans / strip_repeated_spans,
  token-hash combine vs string-gram)
- fingerprint_overlap (vectorized XXH64 winnow vs in-row SQL)
- decontaminate (token-hash-combined grams vs string shingles)
- ngram_novelty (window_hashes vs per-position gram strings)
- tfidf_topk_terms (df-as-window vs df-agg + join)
- sole_returned_supplier (stacked aggregations vs self-join pair)
- dedup_simhash (hamming filter before the pair dedup)

Usage: python scripts/scale_opt_r11.py SF_DIR [CPUS]
Prints one JSON line per (op, form): {"op", "form", "sec", "rows"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from faiss_vector_search_spark import io as fio  # noqa: E402
from faiss_vector_search_spark.functions.hashing import hashed  # noqa: E402
from faiss_vector_search_spark.functions.text import (  # noqa: E402
    positional_windows,
    tokens,
)
from faiss_vector_search_spark.operators import (  # noqa: E402
    analytics,
    dedup,
    lexical,
    textstats,
)
from faiss_vector_search_spark.session import get_spark  # noqa: E402


def wall(df, op, form, n=2):
    df.write.mode("overwrite").format("noop").save()
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        df.write.mode("overwrite").format("noop").save()
        best = min(best, time.time() - t0)
    print(json.dumps({"op": op, "form": form, "sec": round(best, 3)}),
          flush=True)


def old_repeated_spans(docs, w=8, min_count=2):
    from pyspark.sql import Window

    tokd = docs.select(
        F.col("doc_id"), tokens(F.col("text")).alias("_toks")
    ).where(F.size("_toks") >= w)
    wins = tokd.select(
        F.col("doc_id"),
        F.explode(positional_windows(F.col("_toks"), w)).alias("t"),
    ).select(
        F.col("doc_id"),
        F.col("t.pos").cast("bigint").alias("pos"),
        hashed(F.col("t.gram"), seed=0, hash_fn="xxhash64").alias("gh"),
    )
    repeated = (wins.groupBy("gh").agg(F.count(F.lit(1)).alias("cnt"))
                .where(F.col("cnt") >= min_count).select("gh"))
    hits = wins.join(repeated, "gh").select("doc_id", "pos")
    rn = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(F.col("pos").asc())
    )
    return (hits.withColumn("_grp", F.col("pos") - rn)
            .groupBy("doc_id", "_grp")
            .agg(F.min("pos").alias("span_start"),
                 (F.max("pos") + F.lit(w - 1)).cast("bigint")
                 .alias("span_end"),
                 F.count(F.lit(1)).alias("n_windows"))
            .select("doc_id", "span_start", "span_end", "n_windows"))


def old_grams(df, out_id, n=8):
    sh = dedup._shingle_sets(df, n, "doc_id", "text")
    return sh.select(
        F.col("doc_id").alias(out_id),
        F.explode_outer(F.col("shingles")).alias("_g"),
    ).select(out_id,
             hashed(F.col("_g"), seed=17, hash_fn="xxhash64").alias("g"))


def old_decon(docs, benchmark, n=8):
    cg = old_grams(docs, "c_id", n)
    bg = old_grams(benchmark, "b_id", n).distinct()
    return (cg.join(F.broadcast(bg), "g")
            .groupBy(F.col("c_id").alias("doc_id"))
            .agg(F.count_distinct("g").alias("n_shared_grams"),
                 F.count_distinct("b_id").alias("n_benchmark_docs")))


def main():
    sf_dir = sys.argv[1]
    cpus = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="fvs-scale-opt-r11",
                      master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    docs = fio.load_table(spark, sf_dir, "documents")
    li = fio.load_table(spark, sf_dir, "lineitem")
    sup = fio.load_table(spark, sf_dir, "supplier")
    bench_set = docs.where(F.col("doc_id") % 100 == 7).select(
        "doc_id", "text")

    wall(old_repeated_spans(docs), "repeated_spans", "old-string-gram")
    wall(dedup.repeated_spans(docs, w=8, min_count=2, hash_fn="xxhash64"),
         "repeated_spans", "r11-token-hash")
    wall(dedup.strip_repeated_spans(docs, w=8, min_count=2,
                                    hash_fn="xxhash64"),
         "strip_repeated_spans", "r11-token-hash")
    wall(textstats.fingerprint_overlap_search(
        docs, query_doc_id=7, gram=8, w=4, min_shared=2,
        hash_fn="xxhash64", engine="sql"),
        "fingerprint_overlap", "old-sql-winnow")
    wall(textstats.fingerprint_overlap_search(
        docs, query_doc_id=7, gram=8, w=4, min_shared=2,
        hash_fn="xxhash64", engine="arrow"),
        "fingerprint_overlap", "r11-arrow-xxh64")
    wall(old_decon(docs, bench_set), "decontaminate", "old-string-shingle")
    wall(dedup.decontaminate(docs, bench_set, n=8, hash_fn="xxhash64"),
         "decontaminate", "r11-token-hash")
    wall(textstats.ngram_novelty(docs, w=8, hash_fn="xxhash64"),
         "ngram_novelty", "r11-window-hashes")
    wall(lexical.tfidf_topk_terms(docs, k=5),
         "tfidf_topk_terms", "r11-window-df")
    wall(analytics.sole_returned_supplier(li, sup),
         "sole_returned_supplier", "r11-single-scan")
    wall(dedup.simhash_pairs(docs, max_hamming=3, bands=4,
                             hash_fn="xxhash64"),
         "dedup_simhash", "r11-filter-first")


if __name__ == "__main__":
    main()
