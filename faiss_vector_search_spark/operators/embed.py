"""Deterministic text embedding — the Spark stand-in for the
reference's sentence-transformers EmbeddingService
(components/core/embedding_service.py:64-122).

The container has no sentence-transformers; a real deployment would
wrap the model in an Arrow-batched ``mapInPandas`` (GPU executors,
batch_size from config — see `sources/multimodal.py` for the stub
pattern). What we ship instead is a *feature-hashing* embedder: token
→ md5-bucket → per-bucket counts → optional L2 normalize. It is fully
deterministic, cross-engine reproducible (oracle-able), and exercises
the exact same Spark plumbing (explode → groupBy → dense vector
assembly) a learned embedder's preprocessing would.

Scale: explode+groupBy(doc_id, bucket) has map-side partial
aggregation; the dense-assembly groupBy(doc_id) shuffles one row per
(doc, distinct bucket) — ~tokens-bounded, not dim-bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hashed
from ..functions.text import tokens


def token_buckets(
    docs: DataFrame,
    dim: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "md5",
) -> DataFrame:
    """Long-form feature hashing: (doc_id, bucket, cnt)."""
    # explode_outer + null-filter: plain explode infers a pre-filter
    # that re-evaluates the tokenizer; the filter on the *generated*
    # column cannot be pushed below the generate.
    toks = docs.select(
        F.col(id_col), F.explode_outer(tokens(F.col(text_col))).alias("tok")
    ).where(F.col("tok").isNotNull())
    return (
        toks.withColumn("bucket", F.pmod(hashed(F.col("tok"), 0, hash_fn), dim))
        .groupBy(id_col, "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def embed_documents(
    docs: DataFrame,
    dim: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    normalize: bool = True,
    hash_fn: str = "md5",
) -> DataFrame:
    """(doc_id, embedding: array<double>) — dense hashed-count vector,
    L2-normalized like encode(normalize_embeddings=True)."""
    long = token_buckets(docs, dim, id_col, text_col, hash_fn)
    dense = (
        long.groupBy(id_col)
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("bucket", "cnt")))
            ).alias("m")
        )
        .select(
            F.col(id_col),
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: F.coalesce(
                    F.element_at(F.col("m"), i.cast("bigint")), F.lit(0)
                ).cast("double"),
            ).alias("embedding"),
        )
    )
    if normalize:
        from ..functions.vector import normalize as l2norm

        dense = dense.withColumn("embedding", l2norm(F.col("embedding")))
    return dense
