"""Index lifecycle — Spark re-expression of the reference's index
persistence and incremental adds (components/core/index_service.py:
103-141 save/load/clear; :143-203 add_vectors; components2/
faiss_retriever.py:194-296 add_task_output / add_knowledge_documents).

A FAISS index file + metadata.pkl becomes a *parquet table of vectors
with their metadata and (for IVF) list assignment* — the natural
cluster-scale representation:

- save: write partitioned by ``list_id`` → probes prune partitions.
- load: ``spark.read.parquet`` (schema travels with the data; no
  sidecar pickle).
- add:  append new rows, id-deduplicated with a left-anti join
  (FAISS add() trusts the caller on dupes; an engine should not).
- clear: overwrite with an empty frame of the same schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def save_index(df: DataFrame, path: str, partition_by: str | None = "list_id") -> None:
    writer = df.write.mode("overwrite")
    if partition_by and partition_by in df.columns:
        writer = writer.partitionBy(partition_by)
    writer.parquet(path)


def load_index(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def add_vectors(
    index: DataFrame,
    new: DataFrame,
    id_col: str = "vec_id",
) -> DataFrame:
    """Append ``new`` rows whose id is not already indexed.

    The anti-join build side is the *new* batch (small) → broadcast;
    the existing index never shuffles. Mirrors add_vectors' append
    semantics plus id safety.
    """
    fresh = new.join(
        index.select(id_col), on=id_col, how="left_anti"
    )
    return index.unionByName(fresh, allowMissingColumns=True)


def index_stats(
    index: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """get_stats parity (faiss_retriever.py:297-321): ntotal, dim,
    mean vector norm (≈1.0 ⇒ normalized corpus ⇒ IP == cosine)."""
    from ..functions.vector import norm

    return index.agg(
        F.count("*").alias("num_documents"),
        F.max(F.size(F.col(vec_col))).alias("dimension"),
        F.round(F.avg(norm(F.col(vec_col))), 6).alias("avg_norm"),
        F.count_distinct(F.col(id_col)).alias("distinct_ids"),
    )


def reconstruct(
    index: DataFrame,
    ids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """FAISS ``reconstruct_batch``: fetch the stored vectors for a set
    of ids, one (id, pos, component) row per dimension.

    The id set broadcasts onto the index scan (a semi-join the parquet
    reader can turn into row-group pruning when the index is written
    sorted/partitioned by id); the corpus never shuffles. Components
    posexplode so results are scalar rows — the same cross-engine
    output contract as vector_normalize."""
    hit = index.join(F.broadcast(ids.select(id_col)), on=id_col, how="left_semi")
    return hit.select(
        id_col, F.posexplode(F.col(vec_col)).alias("pos", "component")
    ).select(
        id_col,
        (F.col("pos") + 1).cast("int").alias("pos"),
        F.round(F.col("component").cast("double"), 6).alias("component"),
    )


def remove_vectors(
    index: DataFrame,
    ids: DataFrame,
    id_col: str = "vec_id",
) -> DataFrame:
    """FAISS ``remove_ids``: drop the given ids from the index.

    Left-anti with the (small) id set broadcast — the surviving corpus
    is a filtered scan, never shuffled. Persisted indexes rewrite only
    via save_index on the result (delete-as-rewrite, the parquet
    contract)."""
    return index.join(F.broadcast(ids.select(id_col)), on=id_col, how="left_anti")


def clear_index(spark: SparkSession, path: str) -> None:
    """``clear``: overwrite with an empty frame of the same schema
    (reference index_service.py:103-141 resets index + metadata). The
    schema survives so a subsequent load/add still binds."""
    schema = spark.read.parquet(path).schema
    spark.createDataFrame([], schema).write.mode("overwrite").parquet(path)

def merge_stores(
    indexes: list[DataFrame],
    id_col: str = "vec_id",
) -> DataFrame:
    """FAISS ``merge_from`` / ``IndexShards`` composition: combine
    several flat stores into one searchable corpus, keeping the FIRST
    store's copy whenever an id appears in more than one shard
    (FAISS merge_from trusts the caller on dupes; an engine should
    not silently double-count a vector).

    Later shards anti-join against only the *ids* seen so far — at
    shard counts that matter the accumulated id set is the small side
    and broadcasts; no shard's vector payload ever shuffles, and the
    result is a plain union Catalyst plans as a parallel multi-scan.
    """
    if not indexes:
        raise ValueError("merge_stores needs at least one index")
    merged = indexes[0]
    seen_ids = indexes[0].select(id_col)
    for shard in indexes[1:]:
        fresh = shard.join(
            F.broadcast(seen_ids), on=id_col, how="left_anti"
        )
        merged = merged.unionByName(fresh, allowMissingColumns=True)
        seen_ids = seen_ids.union(shard.select(id_col)).distinct()
    return merged


def index_size_report(spark, tiers: dict[str, str]) -> DataFrame:
    """The FAISS memory-planning question ("how big is each index?")
    as a storage rollup: per named tier (a path holding a persisted
    index's parquet data), file count, on-disk bytes, row count, and
    bytes per row — the observed side of the float32 → SQ8 (4x) → PQ
    (32x) → binary (32x) compression ladder, measured on the store
    instead of asserted from theory.

    Driver-side metadata only (Hadoop ``getContentSummary`` + the
    parquet footer row counts) — nothing scans data; HDFS/S3-correct
    via the session's Hadoop FS, not ``os.walk``."""
    rows = []
    hconf = spark._jsc.hadoopConfiguration()
    for name in sorted(tiers):
        path = tiers[name]
        jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
        fs = jpath.getFileSystem(hconf)
        summ = fs.getContentSummary(jpath)
        n_bytes = int(summ.getLength())
        n_files = int(summ.getFileCount())
        n_rows = spark.read.parquet(path).count()
        rows.append((
            name, n_files, n_bytes, n_rows,
            round(n_bytes / n_rows, 2) if n_rows else None,
        ))
    return spark.createDataFrame(
        rows,
        "tier string, n_files bigint, n_bytes bigint, n_rows bigint, "
        "bytes_per_row double",
    )
