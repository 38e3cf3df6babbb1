"""Bloom-filter semi-join — the 100 TB pre-shuffle filter: when the
key set is too large to broadcast *exactly* but its bloom bitmap is
tiny, filter the fact scan against the bitmap BEFORE any shuffle, then
(optionally) finish with the exact join on the ~fpp-sized survivor
stream. This is the pattern Spark's runtime row-level filtering
injects automatically for shuffle joins; here it is explicit, so it
also covers cases the optimizer won't (pre-filtering before a window,
a write, or an applyInPandas).

Everything is declarative and JVM-side:

- build: keys explode to k positions (``xxhash64(key, i) mod bits``),
  fold into per-word ``bit_or`` masks (32-bit lanes in longs — the
  same signed-shift-free convention as operators/binary.py), then one
  final agg packs a DENSE ``array<long>`` of ``bits/32`` words. The
  shuffle is |keys|·k position rows; the result is ONE row of
  ``bits/8`` bytes.
- probe: the 1-row bitmap cross-joins (broadcast) onto the fact;
  membership is k O(1) ``element_at`` lookups + bit tests in
  whole-stage codegen. No false negatives, by construction.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _positions(key, bits: int, num_hashes: int):
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(bits)) for i in range(num_hashes)
    ]


def bloom_build(
    keys: DataFrame,
    key_col: str,
    bits: int = 1 << 20,
    num_hashes: int = 5,
) -> DataFrame:
    """One-row DataFrame carrying the dense bitmap (``array<long>`` of
    32-bit lanes) plus its parameters, ready to broadcast."""
    if bits % 32:
        raise ValueError(f"bits must be a multiple of 32, got {bits}")
    nwords = bits // 32
    pos = F.explode(F.array(*_positions(F.col(key_col), bits, num_hashes)))
    words = (
        keys.select(pos.alias("p"))
        .select(
            (F.col("p") / 32).cast("int").alias("word"),
            # 2^(p mod 32) is exact in double for bit < 32
            F.pow(F.lit(2.0), (F.col("p") % 32).cast("double"))
            .cast("long")
            .alias("bitval"),
        )
        .groupBy("word")
        .agg(F.bit_or("bitval").alias("mask"))
    )
    # densify driver-side: the sparse (word, mask) set is at most
    # nwords rows (~bits/8 bytes total) — the same bounded
    # model-state collection as k-means centroids. (An expression-side
    # densify via MapType element_at is O(nwords) PER LOOKUP —
    # quadratic single-row work that dominated the whole build.)
    dense = [0] * nwords
    for r in words.collect():
        dense[r.word] = r.mask
    spark = keys.sparkSession
    return spark.createDataFrame([(dense,)], "bloom_bits array<bigint>")


def bloom_might_contain(key, bloom_col, bits: int, num_hashes: int = 5):
    """Boolean Column: every one of the k bits is set (no false
    negatives; ~fpp false positives)."""
    def bit_set(p):
        word = F.element_at(bloom_col, (p / 32).cast("int") + F.lit(1))
        # (word >> bit) & 1 without shift-by-column: exact double pow
        return (
            (word / F.pow(F.lit(2.0), (p % 32).cast("double"))).cast("long")
            % 2
        ) == 1

    return reduce(
        lambda a, b: a & b,
        [bit_set(p) for p in _positions(key, bits, num_hashes)],
    )


def bloom_semi_join(
    fact: DataFrame,
    keys: DataFrame,
    key_col: str,
    fact_key_col: str | None = None,
    bits: int = 1 << 20,
    num_hashes: int = 5,
    exact: bool = True,
) -> DataFrame:
    """Semi-join ``fact`` to ``keys`` with a bloom pre-filter.

    ``exact=True`` finishes with the real semi-join over the (already
    ~fpp-sized) survivor stream — same answer as a direct semi-join,
    but the shuffle/broadcast sees only surviving rows. ``exact=False``
    keeps the pure scan-side filter (no false negatives, ~fpp false
    positives) for probabilistic pipelines.

    ``xxhash64`` is type-sensitive (hash of 1 as INT != 1 as BIGINT),
    so the probe side is cast to the build side's key type before
    hashing — otherwise mismatched key types (int vs bigint, decimal
    vs double) would make build and probe positions disagree and the
    pre-filter would silently drop matching rows, which ``exact=True``
    could never recover. try_cast, NOT cast: under ANSI mode (the
    Spark 4 default this repo runs) a plain cast THROWS on any probe
    value outside the build type's range (a bigint fact key past int
    range, a non-numeric string) and kills the job; try_cast yields
    NULL, might_contain evaluates false, and the row is dropped —
    correct, because a value the cast cannot represent could not have
    equi-joined a build key anyway. No false negatives either way:
    a genuinely equal pair's probe value casts to the build value."""
    fk = fact_key_col or key_col
    build_type = keys.schema[key_col].dataType
    probe = F.col(fk)
    if fact.schema[fk].dataType != build_type:
        probe = probe.try_cast(build_type)  # ANSI-safe: NULL, not throw
    bloom = F.broadcast(bloom_build(keys, key_col, bits, num_hashes))
    pre = (
        fact.crossJoin(bloom)
        .where(bloom_might_contain(probe, F.col("bloom_bits"), bits, num_hashes))
        .drop("bloom_bits")
    )
    if not exact:
        return pre
    return pre.join(
        keys.select(F.col(key_col).alias(fk)).distinct(), on=fk, how="left_semi"
    )
