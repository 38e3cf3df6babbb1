"""Noise-normalized floor measurement (r10 verdict ask #1).

Floor re-certification failed in r9 AND r10 because the standing rule
("commit floors only from a run whose sanity keys sit within 15% of
their floors") never found a quiet window — 14 probes over ~5 h never
satisfied it; the box's throughput drifts 2-3x on noisy-neighbor
virtualization. This protocol stops waiting for a quiet box and
NORMALIZES instead:

- Bench keys measure in small groups (default 4), each group
  BRACKETED by a min-of-3 measurement of the sanity key
  ``knn_topk_ip`` (committed r1 floor 0.299 s).
- The group's noise factor = min(pre, post sanity) / sanity_floor —
  the box's current slowdown multiple, sampled within seconds of the
  group's own runs (min-of-pre/post: the box only ever gets SLOWER
  than its best, so the smaller bracket is the closer bound on the
  group's true capacity).
- normalized(key) = measured(key) / factor — what the key would have
  measured on a floor-speed box, under the multiplicative-slowdown
  model (co-tenant steal scales all CPU-bound work roughly equally;
  the same model the r9/r10 sanity RULE assumed, now applied as a
  correction instead of a gate).
- ``text_search`` (floor 0.357 s) measures at the start and end as an
  independent cross-check of the model: its normalized value should
  land near its floor if the factor is honest.

Output: one JSON line per key (raw, factor, normalized) +
artifacts/floor_r11_normalized.json with the full table. The
committed floor table in BENCH_BASELINE (r11 section) is the
normalized column; raw walls and factors stay alongside so any later
round can audit the correction.

Usage: python scripts/floor_protocol.py [SF_DIR] [CPUS] [GROUP]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from faiss_vector_search_spark.session import get_spark  # noqa: E402

SANITY_KEY = "knn_topk_ip"
SANITY_FLOOR = 0.299  # committed r1 floor (BENCH_BASELINE)
CHECK_KEY = "text_search"
CHECK_FLOOR = 0.357


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = sys.argv[2] if len(sys.argv) > 2 else "32"
    group = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    spark = get_spark(
        app_name="fvs-floor-protocol",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    headline = bench.build_headline(cpus)

    skip = set(filter(None, os.environ.get("SPARK_GRAFT_SKIP", "").split(",")))
    skip.add("semdedup_oracle")  # documented small-SF-only oracle profile

    def run(fn) -> float:
        df = fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()  # compile
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            df.write.mode("overwrite").format("noop").save()
            best = min(best, time.time() - t0)
        return best

    sanity_fn = headline[SANITY_KEY]
    run(sanity_fn)  # warm the session before the first bracket

    results: dict[str, dict] = {}
    keys = [k for k in headline if k not in skip]
    t_check0 = run(headline[CHECK_KEY])
    s_pre = run(sanity_fn)
    for gi in range(0, len(keys), group):
        batch = keys[gi:gi + group]
        walls = {}
        for k in batch:
            try:
                walls[k] = run(headline[k])
            except Exception as e:  # record, don't abort the sweep
                walls[k] = None
                print(json.dumps({"key": k, "error": str(e)[:200]}),
                      flush=True)
        s_post = run(sanity_fn)
        factor = max(1.0, min(s_pre, s_post) / SANITY_FLOOR)
        for k, w in walls.items():
            if w is None:
                continue
            results[k] = {
                "raw": round(w, 3),
                "factor": round(factor, 3),
                "normalized": round(w / factor, 3),
                "sanity_pre": round(s_pre, 3),
                "sanity_post": round(s_post, 3),
            }
            print(json.dumps({"key": k, **results[k]}), flush=True)
        s_pre = s_post  # the post bracket opens the next group
    t_check1 = run(headline[CHECK_KEY])

    summary = {
        "protocol": "interleaved-sanity-normalized",
        "sanity_key": SANITY_KEY,
        "sanity_floor": SANITY_FLOOR,
        "group": group,
        "sf_dir": sf_dir,
        "check_key": CHECK_KEY,
        "check_floor": CHECK_FLOOR,
        "check_raw_start": round(t_check0, 3),
        "check_raw_end": round(t_check1, 3),
        "keys": results,
    }
    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/floor_r11_normalized.json", "w") as fh:
        json.dump(summary, fh, indent=1)
        fh.write("\n")
    print(json.dumps({
        "done": len(results),
        "median_factor": sorted(
            r["factor"] for r in results.values()
        )[len(results) // 2],
    }), flush=True)


if __name__ == "__main__":
    main()
