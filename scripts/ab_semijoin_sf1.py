"""Semi-join crossover A/B at sf1 (10x sf0.1 replica): the r12
minhash_lsh_pairs candidate-prefiltered shingle build vs the r11
full-corpus shingle build, same session, noop sink, min of 2.
Also times the fuzzy_decontaminate variant of the same change.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from faiss_vector_search_spark import io as fio
from faiss_vector_search_spark.operators import dedup
from faiss_vector_search_spark.operators.dedup import (
    JACCARD_DECIMALS, _band_structs, _jaccard, _shingle_sets,
    minhash_signatures,
)

SF = os.environ.get("AB_SF_DIR", "/tmp/scaledata/sf1")


def old_pairs(docs, n=3, num_hashes=16, bands=4, threshold=0.8,
              id_col="doc_id", text_col="text", hash_fn="xxhash64"):
    """r11 form: full-corpus shingles on the verify side."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(docs, n, num_hashes, id_col, text_col,
                             hash_fn, engine="auto")
    band_structs = _band_structs(bands, rows_per_band, hash_fn)
    banded = (
        sig.select(F.col(id_col), F.explode(band_structs).alias("bs"))
        .select(F.col(id_col), F.col("bs.band").alias("band"),
                F.col("bs.bval").alias("bval"))
        .repartition("band", "bval")
    )
    left = banded.select(F.col(id_col).alias("doc_a"), "band", "bval")
    right = banded.select(F.col(id_col).alias("doc_b"), "band", "bval")
    cand = (
        left.join(right, ["band", "bval"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    sh = _shingle_sets(docs, n, id_col, text_col)
    return (
        cand.join(sh.select(F.col(id_col).alias("doc_a"),
                            F.col("shingles").alias("sh_a")), "doc_a")
        .join(sh.select(F.col(id_col).alias("doc_b"),
                        F.col("shingles").alias("sh_b")), "doc_b")
        .select("doc_a", "doc_b",
                F.round(_jaccard(F.col("sh_a"), F.col("sh_b")),
                        JACCARD_DECIMALS).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def timeit(label, make):
    best = None
    for _ in range(2):
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
        .config("spark.sql.shuffle.partitions", "64")
        .appName("ab_semijoin_sf1")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = fio.load_table(spark, SF, "documents")

    spark.sparkContext.setJobDescription("equality check")
    a = dedup.minhash_lsh_pairs(docs, threshold=0.8, hash_fn="xxhash64")
    b = old_pairs(docs)
    na = a.count()
    nx = a.exceptAll(b).count()
    xn = b.exceptAll(a).count()
    print(f"pairs new={na} new-old={nx} old-new={xn}", flush=True)
    assert nx == 0 and xn == 0

    spark.sparkContext.setJobDescription("minhash semijoin NEW")
    t_new = timeit("minhash_semijoin_new", lambda: dedup.minhash_lsh_pairs(
        docs, threshold=0.8, hash_fn="xxhash64"))
    spark.sparkContext.setJobDescription("minhash fullcorpus OLD")
    t_old = timeit("minhash_fullcorpus_old", lambda: old_pairs(docs))
    print(f"RESULT sf1 minhash verify: old={t_old:.3f} new={t_new:.3f}",
          flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
