"""Deduplication operators for LLM training-data pipelines
(SURVEY.md §2b #18-23). Beyond the reference's surface — the reference
retrieves similar documents (components/core/search_service.py); these
operators *remove or pair* similar documents at corpus scale.

Scale design
------------
The only O(n²) computations here are the small-SF oracle variants
(`ngram_jaccard_pairs`, `embedding_cosine_pairs`). The scale paths —
MinHash-LSH and SimHash banding — generate candidate pairs through
*blocking joins* whose cost is (docs × bands) rows hashed plus
within-bucket pairs, i.e. ~linear when near-dup density is sparse.
Skewed buckets (a viral boilerplate string) are handled by AQE skew
splitting; verification joins broadcast the candidate-pair side.

Every operator takes ``hash_fn``: ``"xxhash64"`` (JVM, production) or
``"md5"`` (cross-engine deterministic, used by the oracle-gated
queries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hashed
from ..functions.text import shingles, tokens

JACCARD_DECIMALS = 6


def exact_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact dedup via content-hash groupBy (map-side partial agg):
    keep the lowest id per distinct text, report the copy count."""
    return (
        docs.select(F.col(id_col), F.md5(F.col(text_col)).alias("h"))
        .groupBy("h")
        .agg(
            F.min(id_col).alias(id_col),
            F.count("*").alias("n_copies"),
        )
        .select(id_col, "n_copies")
    )


def _shingle_sets(
    docs: DataFrame, n: int, id_col: str, text_col: str
) -> DataFrame:
    """(id, shingles) for docs with at least n tokens."""
    return docs.select(
        F.col(id_col), shingles(F.col(text_col), n).alias("shingles")
    ).where(F.size("shingles") >= 1)


def _jaccard(a, b):
    inter = F.size(F.array_intersect(a, b)).cast("double")
    return inter / (F.size(a) + F.size(b) - inter)


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact all-pairs n-gram Jaccard (the oracle baseline; O(n²) —
    small-SF only, the scale path is :func:`minhash_lsh_pairs`)."""
    sh = _shingle_sets(docs, n, id_col, text_col)
    a = sh.select(
        F.col(id_col).alias("doc_a"), F.col("shingles").alias("sh_a")
    )
    b = sh.select(
        F.col(id_col).alias("doc_b"), F.col("shingles").alias("sh_b")
    )
    return (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.round(
                _jaccard(F.col("sh_a"), F.col("sh_b")), JACCARD_DECIMALS
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def minhash_signatures(
    docs: DataFrame,
    n: int = 3,
    num_hashes: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "md5",
) -> DataFrame:
    """(id, shingles, sig_0..sig_{H-1}): per-seed min-hash over the
    doc's shingle set. One explode + H min-aggregations — map-side
    combinable, shuffle carries H longs per doc."""
    sh = _shingle_sets(docs, n, id_col, text_col)
    exploded = sh.select(
        F.col(id_col), F.col("shingles"), F.explode("shingles").alias("s")
    )
    aggs = [
        F.min(hashed(F.col("s"), seed=i, hash_fn=hash_fn)).alias(f"sig_{i}")
        for i in range(num_hashes)
    ]
    return exploded.groupBy(id_col, "shingles").agg(*aggs)


def minhash_lsh_pairs(
    docs: DataFrame,
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "md5",
) -> DataFrame:
    """MinHash + banded LSH near-dup pairs, verified with exact
    Jaccard. rows/band = num_hashes/bands; a pair collides with
    probability 1-(1-j^r)^b — at 16/4 the 0.8-Jaccard collision
    probability is ≈0.93, and every surviving pair is *verified*, so
    precision is exact and only recall is probabilistic."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(docs, n, num_hashes, id_col, text_col, hash_fn)

    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                hashed(
                    F.concat_ws(
                        "_",
                        *[
                            F.col(f"sig_{b * rows_per_band + r}")
                            for r in range(rows_per_band)
                        ],
                    ),
                    seed=100 + b,
                    hash_fn=hash_fn,
                ).alias("bval"),
            )
            for b in range(bands)
        ]
    )
    banded = sig.select(
        F.col(id_col), F.col("shingles"), F.explode(band_structs).alias("bs")
    ).select(
        F.col(id_col),
        F.col("shingles"),
        F.col("bs.band").alias("band"),
        F.col("bs.bval").alias("bval"),
    )

    left = banded.select(
        F.col(id_col).alias("doc_a"),
        F.col("shingles").alias("sh_a"),
        "band",
        "bval",
    )
    right = banded.select(
        F.col(id_col).alias("doc_b"),
        F.col("shingles").alias("sh_b"),
        "band",
        "bval",
    )
    cand = (
        left.join(right, ["band", "bval"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sh_a", "sh_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return (
        cand.select(
            "doc_a",
            "doc_b",
            F.round(
                _jaccard(F.col("sh_a"), F.col("sh_b")), JACCARD_DECIMALS
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


SIMHASH_BITS = 60  # md5_int yields 60 bits; keeps sign-free shifts in
#                   both engines (Spark long >> and DuckDB BIGINT >>)


def simhash(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "md5",
) -> DataFrame:
    """(id, simhash): 60-bit SimHash over the distinct-token set.
    bit_j = sign of Σ_tokens (±1 by bit j of the token hash)."""
    toks = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("tok"),
    ).withColumn("h", hashed(F.col("tok"), seed=7, hash_fn=hash_fn))
    # (j, 2^j) as literal pairs — shift amounts must be foldable, so
    # carry the mask instead of shifting by a column.
    bit_masks = F.array(
        *[
            F.struct(F.lit(j).alias("j"), F.lit(1 << j).alias("mask"))
            for j in range(SIMHASH_BITS)
        ]
    )
    per_bit = (
        toks.select(F.col(id_col), F.col("h"), F.explode(bit_masks).alias("bm"))
        .select(
            F.col(id_col),
            F.col("bm.j").alias("j"),
            F.col("bm.mask").alias("mask"),
            F.when(
                F.col("h").bitwiseAND(F.col("bm.mask")) != 0, F.lit(1)
            )
            .otherwise(F.lit(-1))
            .alias("contrib"),
        )
        .groupBy(id_col, "j", "mask")
        .agg(F.sum("contrib").alias("s"))
    )
    return per_bit.groupBy(id_col).agg(
        F.sum(
            F.when(F.col("s") > 0, F.col("mask")).otherwise(F.lit(0).cast("bigint"))
        ).alias("simhash")
    )


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    bands: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "md5",
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming, blocked on
    ``bands`` equal bit-slices (pigeonhole: any pair within
    ``bands-1`` bit flips shares at least one slice — exact recall for
    max_hamming < bands, never O(n²))."""
    width = SIMHASH_BITS // bands
    sh = simhash(docs, id_col, text_col, hash_fn)
    slices = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("simhash"), b * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("bval"),
            )
            for b in range(bands)
        ]
    )
    banded = sh.select(
        F.col(id_col), F.col("simhash"), F.explode(slices).alias("bs")
    ).select(
        F.col(id_col),
        F.col("simhash"),
        F.col("bs.band").alias("band"),
        F.col("bs.bval").alias("bval"),
    )
    left = banded.select(
        F.col(id_col).alias("doc_a"), F.col("simhash").alias("sim_a"), "band", "bval"
    )
    right = banded.select(
        F.col(id_col).alias("doc_b"), F.col("simhash").alias("sim_b"), "band", "bval"
    )
    return (
        left.join(right, ["band", "bval"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(
                F.col("sim_a").bitwiseXOR(F.col("sim_b"))
            ).alias("hamming"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
        .where(F.col("hamming") <= max_hamming)
    )


def embedding_cosine_pairs(
    emb: DataFrame,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact pairwise cosine near-dup pairs (IP on normalized
    vectors). O(n²) oracle baseline — the scale path is LSH bucketing
    in `operators/lsh.py`."""
    from ..functions.vector import ip_score

    a = emb.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a")
    )
    b = emb.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b")
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                ip_score(F.col("v_a"), F.col("v_b")), JACCARD_DECIMALS
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )
