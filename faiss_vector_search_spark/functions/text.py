"""Text primitives shared by dedup / text-analysis operators.

All are pure Column expressions (split/transform/filter) — the 100 TB
scan stays in whole-stage codegen. Regexes are restricted to the subset
with identical semantics in Java regex (Spark) and RE2 (DuckDB):
character classes, ``+``, no lookaround.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tokenization: lowercase, split on runs of non-alphanumerics.
TOKEN_SPLIT_RE = "[^a-z0-9]+"


def tokens(text: Column) -> Column:
    """lowercased word tokens, empty strings removed."""
    return F.filter(
        F.split(F.lower(text), TOKEN_SPLIT_RE), lambda t: t != ""
    )


def tokens_sql(expr: str) -> str:
    """DuckDB rendering of :func:`tokens`."""
    return (
        f"list_filter(regexp_split_to_array(lower({expr}), '{TOKEN_SPLIT_RE}'),"
        f" t -> t <> '')"
    )


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from a (materialized) token
    array. ``element_at`` per offset, not ``slice``: slice allocates
    an array per position, element_at is O(1) reads."""
    k = F.size(toks) - (n - 1)
    joined = F.transform(
        # sequence(0, k-1) would count DOWN for k<=0 — guard to empty.
        F.when(k <= 0, F.array().cast("array<int>")).otherwise(
            F.sequence(F.lit(0), k - 1)
        ),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j + 1) for j in range(n)]
        ),
    )
    return F.array_distinct(joined)


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles joined by a single space.

    Prefer tokenizing into a real column first and calling
    :func:`shingles_from_tokens` — referencing this whole expression
    from a filter makes Catalyst substitute (and re-evaluate) it below
    the projection."""
    return shingles_from_tokens(tokens(text), n)


def shingles_sql(expr: str, n: int = 3) -> str:
    """DuckDB rendering of :func:`shingles` (empty list when too short)."""
    toks = tokens_sql(expr)
    return (
        f"(WITH t AS (SELECT {toks} AS toks) "
        f"SELECT CASE WHEN len(toks) < {n} THEN [] ELSE "
        f"list_distinct(list_transform(generate_series(1, len(toks) - {n - 1}),"
        f" i -> array_to_string(toks[i:i+{n - 1}], ' '))) END FROM t)"
    )


def positional_windows(toks: Column, w: int) -> Column:
    """(pos, gram) structs for EVERY w-token window, 1-based position,
    duplicates kept — the positional twin of
    :func:`shingles_from_tokens` (which distincts and drops position).
    Used by span-level dedup, where *where* a gram sits matters."""
    k = F.size(toks) - (w - 1)
    return F.transform(
        F.when(k <= 0, F.array().cast("array<int>")).otherwise(
            F.sequence(F.lit(1), k)
        ),
        lambda i: F.struct(
            i.alias("pos"),
            F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(w)]
            ).alias("gram"),
        ),
    )


def token_hashes(toks: Column, seed: int = 0) -> Column:
    """Per-token xxhash64 array — stage this as a REAL column before
    feeding :func:`positional_window_hashes` (an inline subexpression
    would be re-evaluated per window position by the interpreted
    higher-order-function lambda: O(|toks|²) hash calls)."""
    return F.transform(toks, lambda t: F.xxhash64(t, F.lit(seed)))


def window_hashes(staged: Column, w: int) -> Column:
    """array<bigint> of the xxhash64 of every w-token window —
    :func:`positional_window_hashes` without the position struct, for
    consumers that only need gram identity (novelty, decontamination):
    no per-window struct allocation. ``staged`` is a materialized
    :func:`token_hashes` column."""
    k = F.size(staged) - (w - 1)
    return F.transform(
        F.when(k <= 0, F.array().cast("array<int>")).otherwise(
            F.sequence(F.lit(1), k)
        ),
        lambda i: F.xxhash64(
            *[F.element_at(staged, i + j) for j in range(w)]
        ),
    )


def positional_window_hashes(staged: Column, w: int) -> Column:
    """(pos, gh) structs: the xxhash64 of every w-token window, 1-based
    position — :func:`positional_windows` fused with the gram hash for
    the PRODUCTION profile. ``staged`` is a materialized
    :func:`token_hashes` column; the window hash is one fixed-width
    ``xxhash64(h_i..h_{i+w-1})`` over w longs per position, instead of
    allocating a w-token gram string and re-hashing ~w tokens of bytes
    at every position. Same 64-bit gram identity (two windows collide
    iff their token-hash tuples collide), measured ~1.4× faster per
    corpus pass at sf0.1 — and span-dedup runs this pipeline twice
    (dictionary pass + join-back pass), so the saving doubles. The md5
    (oracle) profile keeps the string-gram path: its gh values are
    pinned by the DuckDB oracle."""
    k = F.size(staged) - (w - 1)
    return F.transform(
        F.when(k <= 0, F.array().cast("array<int>")).otherwise(
            F.sequence(F.lit(1), k)
        ),
        lambda i: F.struct(
            i.alias("pos"),
            F.xxhash64(
                *[F.element_at(staged, i + j) for j in range(w)]
            ).alias("gh"),
        ),
    )
