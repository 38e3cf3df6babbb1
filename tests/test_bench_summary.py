"""The driver captures only the last 2000 chars of bench.py stdout and
parses the final JSON line from that tail. BENCH_r03/r04/r05 all came
back "parsed": null because the summary line outgrew the budget as the
query count grew. These tests pin the guarantee: the final line fits
the tail budget and stays parseable JSON at ANY query count."""

import json
import sys

sys.path.insert(0, "/root/repo")

from bench import _TAIL_BUDGET, final_summary_line


def _summary(timings):
    return {
        "metric": "headline_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": 0.1,
    }


def _check(timings):
    line = final_summary_line(_summary(timings), timings)
    assert len(line) <= _TAIL_BUDGET, (len(line), _TAIL_BUDGET)
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_sec"
    assert parsed["unit"] == "sec"
    assert parsed["sf"] == 0.1
    assert abs(parsed["value"] - sum(timings.values())) < 0.5 + 0.005 * len(timings)
    return parsed


def test_small_map_keeps_full_precision():
    timings = {f"q{i}": 0.123 + i for i in range(5)}
    parsed = _check(timings)
    assert parsed["queries"] == timings
    assert "queries_truncated" not in parsed


def test_current_contract_size_fits():
    # ~157 keys with realistic operator-name lengths
    timings = {f"operator_name_with_length_{i:03d}": 1.234 + 0.001 * i
               for i in range(160)}
    parsed = _check(timings)
    assert len(parsed["queries"]) >= 10


def test_300_queries_fits_and_keeps_slowest():
    timings = {f"very_long_operator_key_name_number_{i:04d}": float(i) / 10
               for i in range(300)}
    parsed = _check(timings)
    assert parsed["queries_truncated"] is True
    assert parsed["n_queries"] == 300
    # the truncated map is exactly the 10 slowest keys
    slowest = sorted(timings, key=lambda k: -timings[k])[:10]
    assert set(parsed["queries"]) == set(slowest)


def test_pathological_key_lengths_still_fit():
    timings = {"k" * 400 + str(i): 1.0 for i in range(50)}
    line = final_summary_line(_summary(timings), timings)
    assert len(line) <= _TAIL_BUDGET
    json.loads(line)
