"""A/B: r12 fused-scan curation_score (quality+logit on one staged
projection) vs the r11 three-branch form. Equality-checked row-for-row,
noop sink, min of 2, same session.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from faiss_vector_search_spark import io as fio
from faiss_vector_search_spark.operators import classifier as classifier_mod
from faiss_vector_search_spark.operators import curation
from faiss_vector_search_spark.operators import lm as lm_mod
from faiss_vector_search_spark.operators import textstats as textstats_mod

SF = os.environ.get("AB_SF_DIR", "/root/testdata/sf0.1")


def old_curation_score(docs, weights=(0.4, 0.3, 0.3), id_col="doc_id",
                       text_col="text", hash_fn="xxhash64"):
    w_q, w_f, w_c = (float(w) for w in weights)
    q = textstats_mod.quality_score(docs, id_col=id_col, text_col=text_col)
    q = q.select(F.col(id_col), F.col("quality"))
    lm_model = lm_mod.bigram_lm_train(docs, id_col=id_col, text_col=text_col)
    f = lm_mod.bigram_lm_score(
        docs, lm_model, id_col=id_col, text_col=text_col
    ).select(F.col(id_col), F.col("fluency"))
    c = classifier_mod.score_quality_classifier(
        docs, classifier_mod.load_model(), id_col=id_col,
        text_col=text_col, hash_fn=hash_fn,
    ).select(F.col(id_col), F.col("logit"))
    joined = q.join(f, id_col).join(c, id_col)
    mm = F.broadcast(
        joined.agg(
            F.min("quality").alias("q_min"), F.max("quality").alias("q_max"),
            F.min("fluency").alias("f_min"), F.max("fluency").alias("f_max"),
            F.min("logit").alias("c_min"), F.max("logit").alias("c_max"),
        )
    )

    def norm(x, mn, mx):
        return F.when(
            F.col(mx) > F.col(mn),
            (F.col(x) - F.col(mn)) / (F.col(mx) - F.col(mn)),
        ).otherwise(F.lit(0.5))

    return joined.crossJoin(mm).select(
        F.col(id_col), "quality", "fluency", "logit",
        F.round(
            F.lit(w_q) * norm("quality", "q_min", "q_max")
            + F.lit(w_f) * norm("fluency", "f_min", "f_max")
            + F.lit(w_c) * norm("logit", "c_min", "c_max"),
            6,
        ).alias("curation_score"),
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
        .appName("ab_curation")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = fio.load_table(spark, SF, "documents")

    spark.sparkContext.setJobDescription("equality")
    a = curation.curation_score(docs)
    b = old_curation_score(docs)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    print(f"equality ok over {a.count()} rows", flush=True)

    spark.sparkContext.setJobDescription("curation NEW fused")
    t_new = timeit("curation_new", lambda: curation.curation_score(docs))
    spark.sparkContext.setJobDescription("curation OLD 3-branch")
    t_old = timeit("curation_old", lambda: old_curation_score(docs))
    print(f"RESULT {SF}: curation {t_old:.3f}->{t_new:.3f}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
