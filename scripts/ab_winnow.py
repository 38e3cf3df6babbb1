"""A/B: r12 cross-doc-batched winnow kernels vs the r11 per-doc-loop
kernels — fingerprint_overlap_search (xx family, engine='arrow') and
winnow_fingerprints (poly family, engine='arrow'). Old kernels inline;
equality-checked; noop sink; min of 2; same session.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

from faiss_vector_search_spark import io as fio
from faiss_vector_search_spark.operators import textstats

SF = os.environ.get("AB_SF_DIR", "/root/testdata/sf0.1")


def old_fp_sets_xx(docs, k=8, w=4, id_col="doc_id", text_col="text",
                   seed=11):
    from faiss_vector_search_spark.functions.xxh import (
        xxh64_bytes, xxh64_fixed_np, xxh64_int_chain, xxh64_int_chain_np,
    )

    null_fp = xxh64_int_chain(42, seed)

    def doc_fps(t):
        if t is None:
            return [null_fp]
        n = len(t)
        if n >= k and k < 32 and t.isascii():
            b = np.frombuffer(t.encode("ascii"), dtype=np.uint8)
            grams = np.lib.stride_tricks.sliding_window_view(b, k)
            h = xxh64_int_chain_np(xxh64_fixed_np(grams, 42), seed)
        else:
            npos = max(n - (k - 1), 1)
            h = np.array(
                [xxh64_int_chain(
                    xxh64_bytes(t[i:i + k].encode("utf-8"), 42), seed)
                 for i in range(npos)],
                dtype=np.int64,
            )
        if w > 1:
            pad = np.full(w - 1, np.iinfo(np.int64).max, dtype=np.int64)
            h = np.lib.stride_tricks.sliding_window_view(
                np.concatenate([h, pad]), w
            ).min(axis=1)
        return np.unique(h).tolist()

    def kernel(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {id_col: pdf[id_col].values,
                 "fps": [doc_fps(t) for t in pdf[text_col].values]}
            )

    return docs.select(id_col, text_col).mapInPandas(
        kernel, schema=f"{id_col} long, fps array<bigint>"
    )


def old_winnow_arrow(docs, k=8, w=4, id_col="doc_id", text_col="text"):
    def kernel(batches):
        for pdf in batches:
            ids, ns, mns, mxs = [], [], [], []
            for i, t in zip(pdf[id_col].values, pdf[text_col].values):
                fps = textstats.winnow_numpy_doc(t, k, w)
                ids.append(i)
                if not fps:
                    ns.append(1)
                    mns.append(None)
                    mxs.append(None)
                else:
                    ns.append(len(fps))
                    mns.append(fps[0])
                    mxs.append(fps[-1])
            yield pd.DataFrame(
                {id_col: pd.Series(ids, dtype="int64"),
                 "n_fingerprints": pd.Series(ns, dtype="int64"),
                 "min_fp": pd.Series(mns, dtype="object"),
                 "max_fp": pd.Series(mxs, dtype="object")}
            )

    return docs.select(id_col, text_col).mapInPandas(
        kernel,
        schema=f"{id_col} long, n_fingerprints bigint, "
               "min_fp bigint, max_fp bigint",
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
        .appName("ab_winnow")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = fio.load_table(spark, SF, "documents")

    spark.sparkContext.setJobDescription("equality fps xx")
    a = textstats.winnow_fp_sets_arrow_xx(docs, 8, 4)
    b = old_fp_sets_xx(docs, 8, 4)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    spark.sparkContext.setJobDescription("equality winnow poly")
    c = textstats.winnow_fingerprints(docs, k=8, w=4, engine="arrow")
    d = old_winnow_arrow(docs, 8, 4)
    assert c.exceptAll(d).count() == 0 and d.exceptAll(c).count() == 0
    print("equality ok", flush=True)

    spark.sparkContext.setJobDescription("fp_overlap NEW")
    t1 = timeit("fp_overlap_new", lambda: textstats.fingerprint_overlap_search(
        docs, query_doc_id=7, gram=8, w=4, min_shared=2,
        hash_fn="xxhash64", engine="arrow"))
    spark.sparkContext.setJobDescription("fps_sets OLD kernel")
    t2 = timeit("fp_sets_old_kernel", lambda: old_fp_sets_xx(docs, 8, 4))
    spark.sparkContext.setJobDescription("fps_sets NEW kernel")
    t3 = timeit("fp_sets_new_kernel",
                lambda: textstats.winnow_fp_sets_arrow_xx(docs, 8, 4))
    spark.sparkContext.setJobDescription("doc_fingerprint NEW")
    t4 = timeit("doc_fingerprint_new", lambda: textstats.winnow_fingerprints(
        docs, k=8, w=4, engine="arrow"))
    spark.sparkContext.setJobDescription("doc_fingerprint OLD")
    t5 = timeit("doc_fingerprint_old", lambda: old_winnow_arrow(docs, 8, 4))
    print(f"RESULT {SF}: fp_sets {t2:.3f}->{t3:.3f}  "
          f"doc_fingerprint {t5:.3f}->{t4:.3f}  overlap_new={t1:.3f}",
          flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
