"""A/B + equality: df_engine="twotier" (salted window + broadcast
hot-term dfs) vs the default "window" for bm25_search and
tfidf_topk_terms. hot_min_df is forced low here so the corpus
actually exercises the hot tier. Noop sink, min of 2, same session.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

from faiss_vector_search_spark import io as fio
from faiss_vector_search_spark.operators import lexical

SF = os.environ.get("AB_SF_DIR", "/root/testdata/sf0.1")
QUERY = "lorem data word vector batch"


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
        .appName("ab_df_twotier")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = fio.load_table(spark, SF, "documents")

    # force the hot tier on this corpus: any term in >= 50 docs is hot
    import faiss_vector_search_spark.operators.lexical as lx
    orig = lx._attach_df

    def forced(tf, id_col="doc_id", df_engine="window", **kw):
        return orig(tf, id_col, df_engine, hot_min_df=50, n_salt=8)

    lx._attach_df = forced
    try:
        spark.sparkContext.setJobDescription("equality bm25")
        a = lexical.bm25_search(docs, QUERY, k=10)
        b = lexical.bm25_search(docs, QUERY, k=10, df_engine="twotier")
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
        spark.sparkContext.setJobDescription("equality tfidf")
        c = lexical.tfidf_topk_terms(docs)
        d = lexical.tfidf_topk_terms(docs, df_engine="twotier")
        assert c.exceptAll(d).count() == 0 and d.exceptAll(c).count() == 0
        print("equality ok (hot tier forced at df>=50)", flush=True)

        spark.sparkContext.setJobDescription("tfidf WINDOW")
        t1 = timeit("tfidf_window", lambda: lexical.tfidf_topk_terms(docs))
        spark.sparkContext.setJobDescription("tfidf TWOTIER")
        t2 = timeit("tfidf_twotier", lambda: lexical.tfidf_topk_terms(
            docs, df_engine="twotier"))
        print(f"RESULT {SF}: tfidf window={t1:.3f} twotier={t2:.3f}",
              flush=True)
    finally:
        lx._attach_df = orig
    spark.stop()


if __name__ == "__main__":
    main()
