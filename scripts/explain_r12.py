"""Capture .explain("formatted") for bench-profile queries into
plans/r12/<key>_<suffix>.txt — the optimization round's before/after
plan evidence (r12 deliverable).

Run: python scripts/explain_r12.py <suffix> key1 key2 ...
     python scripts/explain_r12.py before strip_repeated_spans ...

Keys resolve against bench.build_headline() (the measured profiles);
a key absent there falls back to the declared queries() map. AQE off
so the static plan carries codegen/pushdown annotations (the
plan_audit.py convention).
"""

from __future__ import annotations

import contextlib
import io as pyio
import os
import sys


def main() -> None:
    suffix = sys.argv[1]
    keys = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    sys.path.insert(0, ".")
    import __spark_entry__ as entrymod
    from bench import build_headline
    from faiss_vector_search_spark.session import get_spark

    spark = get_spark(
        app_name="fvs-explain-r12", master="local[8]", shuffle_partitions=8
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    headline = build_headline()
    declared = entrymod.queries()
    os.makedirs("plans/r12", exist_ok=True)
    for key in keys:
        fn = headline.get(key) or declared.get(key)
        if fn is None:
            print(f"{key}: NOT FOUND", file=sys.stderr)
            continue
        df = fn(spark, sf_dir)
        buf = pyio.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = f"plans/r12/{key}_{suffix}.txt"
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
