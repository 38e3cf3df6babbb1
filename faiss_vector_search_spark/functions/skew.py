"""Skew-handling join primitives (SURVEY.md §4).

First line of defense at scale is AQE (`spark.sql.adaptive.
skewJoin.enabled`, on in session.py): it *splits* oversized shuffle
partitions at runtime. Salting is the structural fix for the case AQE
can't help — one ultra-hot key whose rows must all meet the same dim
row (AQE can split the fact side's partition, but every split still
joins the single dim row, and a sort-merge join still sorts the hot
key's rows together). Salting rewrites the join key itself:

    fact:  (key, salt)   salt = hash(row-unique col) % n_salts
    dim:   (key, salt)   replicated n_salts times (one per salt)

so the hot key's rows spread over ``n_salts`` tasks. Cost: the dim
side grows n_salts× (fine for dims; wrong tool for fact-fact joins —
bucket those instead).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    facts: DataFrame,
    dims: DataFrame,
    key: str,
    salt_source: Column,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``facts ⋈ dims`` on ``key`` with salted keys.

    ``salt_source`` must be a row-unique (or near-unique) fact column
    — salting by the join key itself would put every row of the hot
    key back in one bucket. The dim side replicates via an in-row
    ``explode(sequence(...))`` (no shuffle; dims stay small).

    Output = exactly the rows of the unsalted join, salt column
    dropped. ``how`` supports the fact-preserving joins (inner/left).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salted_facts = facts.withColumn(
        SALT_COL, F.pmod(F.xxhash64(salt_source), F.lit(n_salts)).cast("int")
    )
    salted_dims = dims.withColumn(
        SALT_COL,
        # sequence(int, int) already yields int elements; explode
        # cannot be nested inside another expression (e.g. a cast)
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))),
    )
    return salted_facts.join(salted_dims, [key, SALT_COL], how).drop(SALT_COL)
