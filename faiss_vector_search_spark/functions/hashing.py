"""Cross-engine-deterministic hashing primitives.

The driver's correctness gate re-runs every query in DuckDB, so gated
operators must hash identically in both engines. md5 is the common
denominator:

    Spark : conv(substr(md5(s), 1, 15), 16, 10)  -> bigint
    DuckDB: ('0x' || substr(md5(s), 1, 15))::BIGINT

15 hex chars = 60 bits, always non-negative, fits BIGINT in both.

Hot paths at 100 TB should NOT pay md5-string cost: every operator that
takes a ``hash_fn`` accepts ``"xxhash64"`` (Spark's JVM xxHash64,
whole-stage codegen) for production and ``"md5"`` only for the
oracle-gated profile. Seeded variants prefix the seed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MD5_HEX_CHARS = 15  # 60 bits < 63 → non-negative bigint in both engines


def md5_int(col: Column, seed: int | None = None) -> Column:
    """60-bit integer hash via md5 — identical in Spark and DuckDB."""
    s = col.cast("string")
    if seed is not None:
        s = F.concat(F.lit(f"s{seed}:"), s)
    return F.conv(F.substring(F.md5(s), 1, MD5_HEX_CHARS), 16, 10).cast("bigint")


def md5_int_sql(expr: str, seed: int | None = None) -> str:
    """DuckDB rendering of :func:`md5_int` for oracle queries."""
    s = f"'s{seed}:' || ({expr})" if seed is not None else f"({expr})"
    return f"(('0x' || substr(md5({s}), 1, {MD5_HEX_CHARS}))::BIGINT)"


def fast_int(col: Column, seed: int = 0) -> Column:
    """xxHash64-based integer hash — the production (JVM) path."""
    return F.xxhash64(col, F.lit(seed))


def hashed(col: Column, seed: int = 0, hash_fn: str = "xxhash64") -> Column:
    """Dispatch between the oracle-deterministic and fast hash."""
    if hash_fn == "md5":
        return md5_int(col, seed)
    if hash_fn == "xxhash64":
        return fast_int(col, seed)
    raise ValueError(f"unknown hash_fn: {hash_fn}")
