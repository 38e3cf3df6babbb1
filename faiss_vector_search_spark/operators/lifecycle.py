"""Persisted-index lifecycle — incremental adds and retrain guards for
the IVF-family indexes, the cluster-scale analogue of the reference's
add-to-trained-index behavior (components/core/index_service.py:143-203
``add_vectors``: append vectors + train-if-needed + persist).

The flat store already has :func:`index_store.add_vectors` (union +
anti-join). These operators extend the same append semantics to the
PERSISTED, list-partitioned tiers (ivf.save_ivf / pq.save_ivfpq /
sq.save_ivfsq / binary.save_ivfbin), where the point of the layout is
that a write must not touch what a probe would not read:

- **append**: the new batch coarse-assigns against the SAVED centroids
  (map-only, no retrain), encodes with the SAVED codebooks/bounds where
  the tier compresses, id-dedups against ONLY the touched list
  partitions, and lands as *appended files in just those partitions* —
  untouched lists are never read, never rewritten. Append-mode file
  adds beat a dynamic-partition overwrite here: no read-modify-write of
  existing rows (and no self-overwrite hazard of rewriting a path that
  is also the read source). Many small appended files are the normal
  parquet trade — `maintenance.compact_parquet` is the periodic fix.
- **dedup contract**: an identical (id, vector) re-add is always caught
  — deterministic assignment sends it to the same list the original
  lives in. A *changed* vector under an existing id may assign to a
  different list and is NOT caught: that is an update, not an append —
  remove_vectors + append, or rebuild.
- **retrain guard**: the reference trains its IVF quantizer once a
  big-enough batch arrives (index_service.py:179-185, ``len(vectors) >=
  100``). At cluster scale the analogous trigger is drift: when the
  corpus outgrows what the current centroids were trained on, list
  sizes skew and fixed-nprobe recall decays. :func:`should_retrain`
  flags that from persisted metadata; :func:`retrain_ivf` re-runs Lloyd
  on the current corpus and rewrites the index + train-size watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _append_to_lists(
    spark: SparkSession,
    table_path: str,
    assigned_new: DataFrame,
    id_col: str,
) -> list[int]:
    """Shared tail of every tier's append: dedup against the touched
    partitions only, append-mode write (new files only). Returns the
    touched list ids."""
    touched = sorted(
        r.list_id
        for r in assigned_new.select("list_id").distinct().collect()
    )
    if not touched:
        return []
    existing = spark.read.parquet(table_path).where(
        F.col("list_id").isin(touched)
    )
    fresh = assigned_new.join(
        existing.select(id_col), on=id_col, how="left_anti"
    )
    fresh.write.mode("append").partitionBy("list_id").parquet(table_path)
    return touched


def ivf_append(
    spark: SparkSession,
    path: str,
    new: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[int]:
    """Incremental add into a persisted IVF-flat index (ivf.save_ivf
    layout): assign with the saved centroids, append to the touched
    list partitions. Returns the touched list ids."""
    from .ivf import assign_lists

    cents = spark.read.parquet(f"{path}/_centroids")
    assigned = assign_lists(new, cents, vec_col=vec_col)
    return _append_to_lists(spark, f"{path}/vectors", assigned, id_col)


def ivfpq_append(
    spark: SparkSession,
    path: str,
    new: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[int]:
    """Incremental add into a persisted IVF-PQ index (pq.save_ivfpq
    layout): assign with the saved coarse centroids, PQ-encode with the
    saved codebooks (codes quantize the raw vector, so the shared
    codebooks stay valid for appended rows), append to touched lists."""
    from .ivf import assign_lists
    from .pq import pq_encode

    cents = spark.read.parquet(f"{path}/_centroids")
    books = spark.read.parquet(f"{path}/_codebooks")
    assigned = assign_lists(new, cents, vec_col=vec_col)
    codes = pq_encode(
        assigned, books, id_col=id_col, vec_col=vec_col,
        keep_cols=("list_id",),
    )
    return _append_to_lists(spark, f"{path}/codes", codes, id_col)


def ivfsq_append(
    spark: SparkSession,
    path: str,
    new: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[int]:
    """Incremental add into a persisted IVF-SQ8 index (sq.save_ivfsq
    layout): assign with saved centroids, encode with the saved global
    bounds, append to touched lists. A new component outside the
    trained [min,max] clamps to the boundary code (sq._code_expr
    floors/leasts) — drift past the bounds is a retrain trigger, not a
    correctness break."""
    from .ivf import assign_lists
    from .sq import sq_encode

    cents = spark.read.parquet(f"{path}/_centroids")
    bounds = spark.read.parquet(f"{path}/_bounds")
    assigned = assign_lists(new, cents, vec_col=vec_col)
    codes = sq_encode(
        assigned, bounds, id_col=id_col, vec_col=vec_col,
        keep_cols=("list_id",),
    )
    return _append_to_lists(spark, f"{path}/codes", codes, id_col)


def ivfbin_append(
    spark: SparkSession,
    path: str,
    new: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[int]:
    """Incremental add into a persisted IVF-binary index
    (binary.save_ivfbin layout): float-space assignment against the
    saved centroids, sign-bit pack, append to touched lists."""
    from .binary import binarize
    from .ivf import assign_lists

    cents = spark.read.parquet(f"{path}/_centroids")
    assigned = assign_lists(new, cents, vec_col=vec_col)
    codes = binarize(assigned, vec_col=vec_col)
    return _append_to_lists(spark, f"{path}/codes", codes, id_col)


def write_train_meta(
    spark: SparkSession, path: str, trained_on: int
) -> None:
    """Record the corpus size the current quantizer was trained on —
    the watermark :func:`should_retrain` compares against."""
    spark.createDataFrame(
        [(int(trained_on),)], "trained_on bigint"
    ).write.mode("overwrite").parquet(f"{path}/_meta")


def should_retrain(
    spark: SparkSession,
    path: str,
    table: str = "vectors",
    growth_factor: float = 4.0,
    min_train_points: int = 100,
) -> bool:
    """Drift guard for a persisted IVF-family index.

    Reference behavior (index_service.py:179-185): an untrained IVF
    quantizer trains once ≥100 vectors arrive. The persisted-tier
    analogue: retrain when ntotal has grown past ``growth_factor ×``
    the size the centroids were trained on (watermark in
    ``<path>/_meta``; absent watermark falls back to the reference's
    min-points rule). The count is a metadata-only scan of the
    partitioned table — no vector data is read."""
    ntotal = spark.read.parquet(f"{path}/{table}").count()
    try:
        trained_on = (
            spark.read.parquet(f"{path}/_meta").first().trained_on
        )
    except Exception:
        trained_on = None
    if not trained_on:
        return ntotal >= min_train_points
    return ntotal >= growth_factor * trained_on


def retrain_ivf(
    spark: SparkSession,
    path: str,
    nlist: int | None = None,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    engine: str = "sql",
    train_sample: int | None = None,
) -> DataFrame:
    """Retrain a persisted IVF-FLAT index on its CURRENT corpus: Lloyd
    refinement seeded from the saved centroids' count, full reassign,
    rewrite, watermark update. Returns the new centroids.

    The flat tier stores the original vectors, so retraining is
    self-contained; the compressed tiers (PQ/SQ8/binary) store codes
    only — retrain those from the source corpus via their save_*
    builders. The corpus is localCheckpoint-ed before the overwrite
    (Spark cannot overwrite a path it is still reading); a production
    deployment would instead write a new snapshot version
    (maintenance.write_snapshot) and flip readers atomically."""
    from .ivf import kmeans_centroids, save_ivf

    vecs = (
        spark.read.parquet(f"{path}/vectors")
        .drop("list_id")
        .localCheckpoint()
    )
    if nlist is None:
        nlist = spark.read.parquet(f"{path}/_centroids").count()
    # engine/train_sample: the production retrain profile (arrow BLAS
    # Lloyd over a bounded id-strided sample) — the same knobs the
    # scale rehearsal forced on first-time training
    cents = kmeans_centroids(
        vecs, nlist, iters, id_col, vec_col,
        train_sample=train_sample, engine=engine,
    )
    save_ivf(vecs, cents, path, vec_col=vec_col, assign_engine=engine)
    write_train_meta(spark, path, vecs.count())
    return cents
