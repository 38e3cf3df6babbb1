"""A/B: strip_repeated_spans / repeated_spans with the (id,pos,gh)
triples staged behind repartition(gh) (ReusedExchange, one tokenize
pass) vs the current two-evaluation form. Equality-checked, noop sink,
min of 2, same session. AB_SF_DIR picks the corpus.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from faiss_vector_search_spark import io as fio
from faiss_vector_search_spark.operators import dedup
from faiss_vector_search_spark.operators.dedup import (
    _span_window_hashes, tokens,
)

SF = os.environ.get("AB_SF_DIR", "/root/testdata/sf0.1")


def staged_repeated_spans(docs, w=8, min_count=2, id_col="doc_id",
                          text_col="text", hash_fn="xxhash64"):
    tokd = docs.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks")
    ).where(F.size("_toks") >= w)
    wins = _span_window_hashes(tokd, w, id_col, hash_fn).repartition("gh")
    repeated = (
        wins.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= min_count)
        .select("gh")
    )
    hits = wins.join(repeated, "gh").select(id_col, "pos")
    rn = F.row_number().over(
        Window.partitionBy(id_col).orderBy(F.col("pos").asc())
    )
    return (
        hits.withColumn("_grp", F.col("pos") - rn)
        .groupBy(id_col, "_grp")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(w - 1)).cast("bigint").alias("span_end"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .select(id_col, "span_start", "span_end", "n_windows")
    )


def staged_strip(docs, w=8, min_count=2, id_col="doc_id",
                 text_col="text", hash_fn="xxhash64"):
    tokd = docs.select(
        F.col(id_col),
        F.coalesce(
            tokens(F.col(text_col)), F.array().cast("array<string>")
        ).alias("_toks"),
    )
    wins = (
        _span_window_hashes(tokd.where(F.size("_toks") >= w), w, id_col,
                            hash_fn)
        .withColumn("okey", F.col(id_col) * 1_000_000 + F.col("pos"))
        .repartition("gh")
    )
    owners = (
        wins.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("cnt"), F.min("okey").alias("own"))
        .where(F.col("cnt") >= min_count)
        .select("gh", "own")
    )
    redundant = (
        wins.join(owners, "gh")
        .where(F.col("okey") != F.col("own"))
        .select(id_col, "pos")
    )
    rn = F.row_number().over(
        Window.partitionBy(id_col).orderBy(F.col("pos").asc())
    )
    spans = (
        redundant.withColumn("_grp", F.col("pos") - rn)
        .groupBy(id_col, "_grp")
        .agg(F.min("pos").alias("s"), (F.max("pos") + F.lit(w - 1)).alias("e"))
        .groupBy(id_col)
        .agg(F.collect_list(F.struct("s", "e")).alias("_spans"))
    )
    joined = tokd.join(F.broadcast(spans), id_col, "left")
    pos_toks = F.when(
        F.size("_toks") == 0,
        F.array().cast("array<struct<tok:string,p:int>>"),
    ).otherwise(
        F.zip_with(
            F.col("_toks"),
            F.sequence(F.lit(1), F.greatest(F.size("_toks"), F.lit(1))),
            lambda t, p: F.struct(t.alias("tok"), p.alias("p")),
        )
    )
    kept = F.filter(
        pos_toks,
        lambda s: ~F.exists(
            F.coalesce(
                F.col("_spans"),
                F.array().cast("array<struct<s:bigint,e:bigint>>"),
            ),
            lambda sp: (s["p"] >= sp["s"]) & (s["p"] <= sp["e"]),
        ),
    )
    return joined.select(
        F.col(id_col),
        F.array_join(F.transform(kept, lambda s: s["tok"]), " ").alias(
            "clean_text"
        ),
        F.size("_toks").cast("bigint").alias("n_tokens"),
        (F.size("_toks") - F.size(kept)).cast("bigint").alias(
            "n_tokens_removed"
        ),
    )


def timeit(label, make, reps=2):
    best = None
    for _ in range(reps):
        t0 = time.monotonic()
        make().write.format("noop").mode("overwrite").save()
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    print(f"AB {label}: {best:.3f} s", flush=True)
    return best


def main():
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.driver.memory", "48g")
        .appName("ab_spans_stage")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = fio.load_table(spark, SF, "documents")

    spark.sparkContext.setJobDescription("equality: repeated_spans")
    a = dedup.repeated_spans(docs)
    b = staged_repeated_spans(docs)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    spark.sparkContext.setJobDescription("equality: strip")
    c = dedup.strip_repeated_spans(docs)
    d = staged_strip(docs)
    assert c.exceptAll(d).count() == 0 and d.exceptAll(c).count() == 0
    print("equality ok", flush=True)

    spark.sparkContext.setJobDescription("repeated_spans CUR")
    t1 = timeit("repeated_spans_current", lambda: dedup.repeated_spans(docs))
    spark.sparkContext.setJobDescription("repeated_spans STAGED")
    t2 = timeit("repeated_spans_staged", lambda: staged_repeated_spans(docs))
    spark.sparkContext.setJobDescription("strip CUR")
    t3 = timeit("strip_current", lambda: dedup.strip_repeated_spans(docs))
    spark.sparkContext.setJobDescription("strip STAGED")
    t4 = timeit("strip_staged", lambda: staged_strip(docs))
    print(f"RESULT {SF}: repeated {t1:.3f}->{t2:.3f}  strip {t3:.3f}->{t4:.3f}",
          flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
