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


def text_search(
    docs: DataFrame,
    query_text: str,
    dim: int = 64,
    k: int = 5,
    hash_fn: str = "md5",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """End-to-end text retrieval — the reference's query→embed→top-k
    pipeline (search_service.py:246-334 ``search_detailed``) over the
    feature-hash embedder.

    Cosine is computed in *long form* on the sparse bucket counts:
    dot = Σ cnt_d·cnt_q over shared buckets, norms = √Σ cnt² — all
    integer sums, so the result is exactly reproducible cross-engine
    (no float summation order to drift). The query side is a handful
    of buckets → broadcast; per-doc work is one partial-aggregated
    groupBy, no dense vectors materialized."""
    spark = docs.sparkSession
    d = token_buckets(docs, dim, id_col, text_col, hash_fn)
    qdf = spark.createDataFrame([(0, query_text)], f"qid int, {text_col} string")
    qb = token_buckets(qdf, dim, "qid", text_col, hash_fn).select(
        "bucket", F.col("cnt").alias("qcnt")
    )
    qn2 = qb.agg(F.sum(F.col("qcnt") * F.col("qcnt")).alias("qn2"))
    # ONE per-doc aggregation computes both the norm and the dot: the
    # broadcast left-join tags each (doc,bucket) with the query count
    # (0 where the query misses), so norm+dot share a single shuffle.
    dots = (
        d.join(F.broadcast(qb), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.sum(F.col("cnt") * F.col("cnt")).alias("dn2"),
            F.sum(
                F.col("cnt") * F.coalesce(F.col("qcnt"), F.lit(0))
            ).alias("dot"),
        )
        .where(F.col("dot") > 0)
    )
    return (
        dots.crossJoin(F.broadcast(qn2))
        .select(
            F.col(id_col),
            F.round(
                F.col("dot")
                / (
                    F.sqrt(F.col("dn2").cast("double"))
                    * F.sqrt(F.col("qn2").cast("double"))
                ),
                6,
            ).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def label_centroids(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-label centroid vectors, long form (label, pos, centroid) —
    the class-prototype computation of retrieval/classification
    pipelines (and the aggregation step of k-means).

    Oracle-profile determinism: per-dimension sums run as a *sorted
    fold* (collect → sort → sequential aggregate), the same order
    DuckDB's list_sum(list_sort(...)) uses — double addition is
    order-sensitive, and a plain F.avg's partial-agg order isn't
    reproducible cross-engine. Production at scale would use F.avg
    (same values modulo last-ulp) and skip the collect_list."""
    from pyspark.sql import functions as F

    comps = emb.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col)).alias("pos", "val"),
    ).select("label", "pos", F.col("val").cast("double").alias("val"))
    return (
        comps.groupBy("label", "pos")
        .agg(
            F.aggregate(
                F.sort_array(F.collect_list("val")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("s"),
            F.count("*").alias("n"),
        )
        .select(
            "label",
            (F.col("pos") + 1).cast("int").alias("pos"),
            F.round(F.col("s") / F.col("n"), 6).alias("centroid"),
        )
    )
