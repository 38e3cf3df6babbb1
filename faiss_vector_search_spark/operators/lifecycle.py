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


def index_health_report(
    spark: SparkSession,
    path: str,
    query_ids: tuple = (0, 1, 2, 3),
    k: int = 10,
    nprobe: int = 4,
    target_recall: float = 0.9,
    nprobe_grid: tuple | None = None,
    growth_factor: float = 4.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One-call health check for a persisted IVF-FLAT index: the
    reference's get_stats echo + train-when-needed loop
    (index_service.py:179-185) run END TO END against the on-disk
    index, as a (metric, value) DataFrame an operator can alert on.

    Sections (all bounded, none scan unprobed lists more than once):

    - **layout**: ntotal + per-list row counts from one group-by over
      the partition column (n_lists rows to the driver). ``list_
      balance`` = max/avg list size — the skew number that predicts
      probe-tail latency at 1000 executors.
    - **recall at the current dial**: exact truth for the sampled
      queries (ONE corpus scan, all queries batched via a broadcast
      cross-join + per-query rank window), then
      :func:`ivf.ivf_search_persisted_batch` at ``nprobe`` — N queries
      share one partition-pruned scan.
    - **nprobe recommendation**: walk the dial grid (powers of two up
      to nlist by default) with the same batched probe, early-stopping
      at ``target_recall`` — the :func:`evaluate.nprobe_for_recall`
      walk, but over the PERSISTED assignment: the build already paid
      for list_id, so each grid step costs one pruned scan, never a
      re-assignment. ``recommended_nprobe`` = -1 if even a full scan
      misses the target (only possible under sampling noise).
    - **retrain verdict**: :func:`should_retrain` against the
      ``_meta`` watermark (growth_ratio = -1 when no watermark).

    Rows-only by design (kmeans assignment + probe recall have no SQL
    twin); gated by tests/test_lifecycle.py properties instead.
    """
    from .ivf import ivf_search_persisted_batch
    from ..functions import vector as V

    vecs = spark.read.parquet(f"{path}/vectors")
    sizes = {
        r["list_id"]: r["n"]
        for r in vecs.groupBy("list_id").agg(F.count("*").alias("n")).collect()
    }
    ntotal = sum(sizes.values())
    n_lists = len(sizes)
    avg_sz = ntotal / n_lists if n_lists else 0.0

    qdf = (
        vecs.where(F.col(id_col).isin(list(query_ids)))
        .select(F.col(id_col).alias("query_id"),
                F.col(vec_col).alias("query_vec"))
    )
    from pyspark.sql import Window

    exact = (
        vecs.crossJoin(F.broadcast(qdf))
        .select(
            "query_id", F.col(id_col),
            V.ip_score(F.col(vec_col), F.col("query_vec")).alias("score"),
        )
        .withColumn(
            "_r",
            F.row_number().over(
                Window.partitionBy("query_id")
                .orderBy(F.col("score").desc(), F.col(id_col).asc())
            ),
        )
        .where(F.col("_r") <= k)
        .select("query_id", id_col)
    )
    truth: dict = {}
    for r in exact.collect():
        truth.setdefault(r["query_id"], set()).add(r[id_col])
    denom = max(1, sum(len(v) for v in truth.values()))

    def recall_at(p: int) -> float:
        got = ivf_search_persisted_batch(
            spark, path, qdf, nprobe=p, k=k,
            id_col=id_col, vec_col=vec_col,
        ).select("query_id", id_col).collect()
        hit = sum(1 for r in got if r[id_col] in truth.get(r["query_id"], ()))
        return round(hit / denom, 4)

    if nprobe_grid is None:
        g, p = [], 1
        while p < n_lists:
            g.append(p)
            p *= 2
        nprobe_grid = tuple(g + [n_lists])
    recall_current = recall_at(min(nprobe, n_lists))
    curve: dict[int, float] = {min(nprobe, n_lists): recall_current}
    recommended, rec_recall = -1, max(curve.values())
    for p in nprobe_grid:
        rc = curve.get(p)
        if rc is None:
            rc = recall_at(p)
            curve[p] = rc
        if rc >= target_recall:
            recommended, rec_recall = p, rc
            break
        rec_recall = max(rec_recall, rc)

    try:
        trained_on = spark.read.parquet(f"{path}/_meta").first().trained_on
    except Exception:
        trained_on = None
    growth = round(ntotal / trained_on, 4) if trained_on else -1.0
    retrain = should_retrain(spark, path, growth_factor=growth_factor)

    rows = [
        ("n_vectors", float(ntotal)),
        ("n_lists", float(n_lists)),
        ("list_rows_min", float(min(sizes.values()) if sizes else 0)),
        ("list_rows_max", float(max(sizes.values()) if sizes else 0)),
        ("list_rows_avg", round(avg_sz, 4)),
        ("list_balance", round(max(sizes.values()) / avg_sz, 4)
         if sizes and avg_sz else -1.0),
        ("current_nprobe", float(min(nprobe, n_lists))),
        ("recall_at_current", recall_current),
        ("target_recall", float(target_recall)),
        ("recommended_nprobe", float(recommended)),
        ("recall_at_recommended", float(rec_recall)),
        ("trained_on", float(trained_on) if trained_on else -1.0),
        ("growth_ratio", float(growth)),
        ("should_retrain", 1.0 if retrain else 0.0),
    ]
    return spark.createDataFrame(rows, "metric string, value double")


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
