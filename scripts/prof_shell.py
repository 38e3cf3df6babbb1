"""Interactive profiling shell for the r11 optimization round.

Starts a bench-identical session (local[32], 32 shuffle partitions)
and defines helpers:

  t(df, label="", n=3)  -> min-of-n noop-sink seconds (after a warmup)
  ex(df)                -> explain formatted
  H                     -> bench.build_headline() map
  tq("key")             -> time a headline query by key

Usage: python -i scripts/prof_shell.py
"""

import time

import sys
sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: F401

from bench import build_headline
from faiss_vector_search_spark import io as fio  # noqa: F401
from faiss_vector_search_spark.session import get_spark

SF = "/root/testdata/sf0.1"
spark = get_spark(app_name="fvs-prof-r11", master="local[32]",
                  shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")

H = build_headline()


def t(df, label="", n=3):
    df.write.mode("overwrite").format("noop").save()
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        df.write.mode("overwrite").format("noop").save()
        best = min(best, time.time() - t0)
    print(f"{label or 'df'}: {best:.3f}s")
    return best


def ex(df):
    df.explain("formatted")


def tq(key, n=3):
    return t(H[key](spark, SF), label=key, n=n)


print("ready: t(df), ex(df), tq(key), H, spark, SF")
