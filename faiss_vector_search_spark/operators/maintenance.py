"""Table maintenance for a long-lived 100 TB corpus store
(SURVEY.md §2d): small-file compaction and partition-level upsert.

Streaming ingestion (streaming/streams.py) and incremental index adds
(operators/index_store.py) inevitably produce many small files — the
classic HDFS/object-store killer: a 100 TB table in 1 MB files is
100M objects, and every scan pays per-file open/list overhead.
Compaction rewrites a table into target-size files; partition upsert
replaces only the partitions a batch touches (dynamic partition
overwrite) instead of rewriting the table.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

DEFAULT_TARGET_FILE_BYTES = 128 * 1024 * 1024


def table_bytes(spark: SparkSession, path: str) -> int:
    """On-disk size of a table directory via the Hadoop FileSystem
    API — works the same on local FS, HDFS, and object stores."""
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(
        spark.sparkContext._jsc.hadoopConfiguration()
    )
    return fs.getContentSummary(hpath).getLength()


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    shuffle: bool = False,
) -> dict[str, int]:
    """Rewrite ``src`` parquet into ``dst`` with ~``target_file_bytes``
    files. ``shuffle=False`` (default) uses ``coalesce`` — a narrow
    dependency, no shuffle: tasks just concatenate input splits, so
    compaction reads and writes each byte exactly once.
    ``shuffle=True`` uses ``repartition`` for when the rewrite should
    also rebalance pathological input skew (pays one full shuffle).

    Returns {files_in, files_out, bytes} for the caller's bookkeeping.
    """
    df = spark.read.parquet(src)
    files_in = len(df.inputFiles())
    n_bytes = table_bytes(spark, src)
    n_out = max(1, math.ceil(n_bytes / target_file_bytes))
    out = df.repartition(n_out) if shuffle else df.coalesce(n_out)
    out.write.mode("overwrite").parquet(dst)
    files_out = len(spark.read.parquet(dst).inputFiles())
    return {"files_in": files_in, "files_out": files_out, "bytes": n_bytes}


def upsert_partitions(
    updates: DataFrame,
    path: str,
    partition_col: str,
) -> None:
    """Replace exactly the partitions present in ``updates``, leaving
    every other partition untouched (dynamic partition overwrite) —
    the idempotent daily-batch pattern: re-running a day's load
    replaces that day, never truncates the table. Static overwrite
    mode (the default) would drop ALL partitions first; this sets the
    dynamic mode on the writer itself so the session conf is not
    mutated."""
    (
        updates.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )


def upsert_merge(
    spark: SparkSession,
    updates: DataFrame,
    path: str,
    partition_col: str,
    key_cols: list[str],
) -> None:
    """Keyed merge into a partitioned parquet table (the MERGE /
    upsert-by-key pattern, emulated without a table format): rows in
    ``updates`` replace existing rows with the same key; untouched
    keys in the SAME partition survive (a bare dynamic overwrite
    would drop them); untouched partitions are never read or written.

    Plan: touched-partition values collect (tiny — bounded by the
    batch's distinct partitions), the existing read prunes to exactly
    those partitions, survivors come from a broadcast anti-join on the
    key, and the merged frame is localCheckpoint-materialized before
    the write because Spark cannot overwrite a path it is still
    reading lazily.
    """
    parts = [r[0] for r in updates.select(partition_col).distinct().collect()]
    if not parts:
        return
    try:
        existing = spark.read.parquet(path).where(
            F.col(partition_col).isin(parts)
        )
    except AnalysisException:  # first write: table does not exist yet
        updates.write.partitionBy(partition_col).parquet(path)
        return
    survivors = existing.join(
        F.broadcast(updates.select(*key_cols).distinct()),
        on=key_cols,
        how="left_anti",
    )
    merged = survivors.unionByName(updates).localCheckpoint(eager=True)
    upsert_partitions(merged, path, partition_col)


# --- Z-order clustering layout -------------------------------------------


def _interleave_bits(a, b, bits: int):
    """Morton/Z-value of two ``bits``-bit bucket ids — pure integer
    Column arithmetic (a's bit i lands at position 2i+1, b's at 2i)."""
    z = F.lit(0)
    for i in range(bits):
        abit = F.shiftright(a, i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(b, i).bitwiseAND(F.lit(1))
        z = (
            z
            + abit * F.lit(1 << (2 * i + 1))
            + bbit * F.lit(1 << (2 * i))
        )
    return z


def _bucket(col, lo, hi, bits: int):
    """Equi-width bucket id in [0, 2^bits) over [lo, hi]."""
    n = 1 << bits
    return F.least(
        F.lit(n - 1),
        F.greatest(
            F.lit(0),
            F.floor(
                (col.cast("double") - lo) * n / (hi - lo + 1e-12)
            ).cast("int"),
        ),
    )


def zorder_write(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    bits: int = 3,
) -> None:
    """Z-order clustering layout: co-locate rows by the interleaved
    bucket bits of TWO columns so range predicates on EITHER OR BOTH
    prune the scan — the OPTIMIZE ZORDER strategy of the lakehouse
    table formats, expressed as plain parquet partitioning (one
    directory per z-value, 2^(2·bits) total).

    A single-column sort gives perfect pruning on that column and
    none on the second; Z-ordering spends the same file count to give
    ~sqrt pruning on each. Bucket bounds persist alongside
    (``_zmeta``) so readers bucketize predicates identically.

    At 100 TB: 6 bits → 64 partitions is far too coarse; raise
    ``bits`` so partitions land near the target file size, or keep a
    partition grain this coarse and rely on parquet row-group min/max
    within files (write sorts by z within partitions for exactly that
    reason)."""
    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(F.col(col_a).cast("double")),
        F.max(F.col(col_a).cast("double")),
        F.min(F.col(col_b).cast("double")),
        F.max(F.col(col_b).cast("double")),
    ).first()
    z = _interleave_bits(
        _bucket(F.col(col_a), lo_a, hi_a, bits),
        _bucket(F.col(col_b), lo_b, hi_b, bits),
        bits,
    )
    (
        df.withColumn("z", z)
        .repartition("z")
        .sortWithinPartitions("z")
        .write.mode("overwrite")
        .partitionBy("z")
        .parquet(f"{path}/data")
    )
    meta = df.sparkSession.createDataFrame(
        [(col_a, float(lo_a), float(hi_a)), (col_b, float(lo_b), float(hi_b))],
        ["col", "lo", "hi"],
    )
    meta.coalesce(1).write.mode("overwrite").parquet(f"{path}/_zmeta")


def zorder_scan(
    spark: SparkSession,
    path: str,
    a_range: tuple[float, float],
    b_range: tuple[float, float],
    col_a: str,
    col_b: str,
    bits: int = 3,
) -> DataFrame:
    """Read a z-ordered table with a 2-D range predicate: enumerate
    the z-values whose (a, b) bucket pair intersects the query box —
    driver-side over at most 2^(2·bits) ints — and push them into the
    partition filter, then apply the exact residual predicate. The
    scan reads only the matching directories (PartitionFilters), a
    fraction ~(sel_a × sel_b) of the data."""
    meta = {r.col: (r.lo, r.hi) for r in
            spark.read.parquet(f"{path}/_zmeta").collect()}
    n = 1 << bits

    def bucket_of(v, lo, hi):
        return min(n - 1, max(0, int((v - lo) * n / (hi - lo + 1e-12))))

    def brange(rng, col):
        lo, hi = meta[col]
        return range(bucket_of(rng[0], lo, hi), bucket_of(rng[1], lo, hi) + 1)

    def interleave(ab, bb):
        z = 0
        for i in range(bits):
            z += ((ab >> i) & 1) << (2 * i + 1)
            z += ((bb >> i) & 1) << (2 * i)
        return z

    zs = sorted(
        {
            interleave(ab, bb)
            for ab in brange(a_range, col_a)
            for bb in brange(b_range, col_b)
        }
    )
    return (
        spark.read.parquet(f"{path}/data")
        .where(F.col("z").isin(zs))
        .where(
            F.col(col_a).cast("double").between(*a_range)
            & F.col(col_b).cast("double").between(*b_range)
        )
        .drop("z")
    )


# --- versioned snapshot store (poor-man's time travel) ---------------------

_MANIFEST = "_versions.json"


def _snap_table(path: str, version: int) -> str:
    """Deterministic catalog name for a bucketed snapshot version
    (hash of the store path — ``hash()`` is session-random, md5 is
    not)."""
    import hashlib

    h = hashlib.md5(path.encode()).hexdigest()[:10]
    return f"snap_{h}_v{version}"


def write_snapshot(
    df, path: str, bucket_by: tuple[str, int] | None = None
) -> int:
    """Write a new immutable table version under ``path/v=<n>`` and
    record it in the manifest LAST — readers pinned to any committed
    version are never disturbed (writers never mutate old data; the
    manifest append is the commit point). Returns the new version.

    This is the lakehouse snapshot-isolation pattern in plain
    parquet: concurrent readers of version n keep a consistent view
    while version n+1 lands; rollback = read an older version.
    Single-writer by contract (no manifest CAS on plain files).

    ``bucket_by=(key_col, n_buckets)`` stores the version BUCKETED
    and in-bucket SORTED on the key (registered in the session
    catalog — the bucket spec lives in table metadata): every later
    key-equi-join between versions, most importantly
    :func:`snapshot_diff`'s full outer join, is then EXCHANGE-FREE
    (plan-gated in tests) — at 100 TB the diff's cost collapses from
    two corpus shuffles to a co-located per-bucket merge, which is
    the difference between "CDC read per ingest batch" being routine
    and being a capacity event. A LOCAL per-bucket sort remains under
    the merge join (Spark's bucketed reader does not propagate the
    written sortBy order without the legacy
    ``bucketedTableScan.outputOrdering`` conf; a local sort moves no
    data — the claim is no network, not no CPU). All
    versions of one store must share the same bucket spec. In
    production the catalog must be a persistent metastore; with the
    in-memory catalog the spec (not the data) is lost on restart and
    reads degrade to plain parquet.

    Manifest I/O is deliberately driver-local-FS (``open``/
    ``os.replace`` for the atomic commit) — ``path`` must be a local
    or NFS-mounted path. On HDFS/S3 the commit point needs a store
    with atomic rename or CAS (a Delta/Iceberg-style log); this
    operator models the versioning semantics, not that log."""
    import json
    import os

    spark = df.sparkSession
    version = latest_version(spark, path) + 1
    if bucket_by is not None:
        key_col, n_buckets = bucket_by
        (
            # repartition on the key first: one writer task per bucket
            # -> ONE sorted file per bucket. Spark only elides the
            # reader-side sort when a bucket is a single file; multiple
            # files per bucket keep the exchange away but re-add the
            # sort under the merge join.
            df.repartition(n_buckets, F.col(key_col))
            .write.mode("errorifexists")
            .format("parquet")
            .option("path", f"{path}/v={version}")
            .bucketBy(n_buckets, key_col)
            .sortBy(key_col)
            .saveAsTable(_snap_table(path, version))
        )
    else:
        df.write.mode("errorifexists").parquet(f"{path}/v={version}")
    manifest = os.path.join(path, _MANIFEST)
    versions = _read_manifest(manifest)
    versions.append(version)
    tmp = manifest + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"versions": versions}, f)
    os.replace(tmp, manifest)  # atomic commit
    return version


def _read_manifest(manifest: str) -> list:
    import json
    import os

    if not os.path.exists(manifest):
        return []
    with open(manifest) as f:
        return json.load(f)["versions"]


def latest_version(spark: SparkSession, path: str) -> int:
    import os

    versions = _read_manifest(os.path.join(path, _MANIFEST))
    return max(versions) if versions else -1


def read_snapshot(spark: SparkSession, path: str, version: int | None = None):
    """Read a pinned (or the latest committed) version. Uncommitted
    in-flight writes are invisible — only manifest versions load.

    If the version was written ``bucket_by`` and its catalog entry is
    live, the bucketed read (spec attached — joins on the key skip
    the exchange) is returned; otherwise the plain parquet scan of
    the same files."""
    import os

    versions = _read_manifest(os.path.join(path, _MANIFEST))
    if not versions:
        raise ValueError(f"no committed versions at {path}")
    if version is None:
        version = max(versions)
    if version not in versions:
        raise ValueError(f"version {version} not in {sorted(versions)}")
    table = _snap_table(path, version)
    if spark.catalog.tableExists(table):
        return spark.table(table)
    return spark.read.parquet(f"{path}/v={version}")


def snapshot_diff(
    spark: SparkSession,
    path: str,
    from_version: int,
    to_version: int,
    key_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Row-level diff between two committed snapshot versions — the
    "what changed between yesterday's corpus and today's" audit every
    data-versioning workflow needs (the lakehouse CDC read, expressed
    over the plain-parquet snapshot store).

    Returns one row per changed key: ``change ∈ {added, removed,
    changed}`` plus the key columns. ``changed`` means the key exists
    in both versions with different non-key content (md5 over the
    canonical concat of the remaining columns, sorted by name — no
    row-by-row driver compare).

    Plan: full outer join on the key over the two pinned version
    scans; unchanged rows (the overwhelming majority between adjacent
    versions) drop before anything else happens, so the output is
    change-sized. At 100 TB both sides would be bucketed on the key
    (sources/bucketed.py) to make this join exchange-free."""

    old = read_snapshot(spark, path, from_version)
    new = read_snapshot(spark, path, to_version)
    if set(old.columns) != set(new.columns):
        raise ValueError(
            f"schema drift between v{from_version} and v{to_version}: "
            f"{sorted(set(old.columns) ^ set(new.columns))}"
        )
    keys = list(key_cols)
    others = sorted(c for c in old.columns if c not in keys)

    def digested(df, tag):
        return df.select(
            *keys,
            F.md5(
                F.concat_ws(
                    "\x1f", *[F.coalesce(F.col(c).cast("string"),
                                         F.lit("\x00")) for c in others]
                )
            ).alias(f"_h_{tag}"),
        )

    j = digested(old, "old").join(digested(new, "new"), keys, "full_outer")
    return j.select(
        *keys,
        F.when(F.col("_h_old").isNull(), F.lit("added"))
        .when(F.col("_h_new").isNull(), F.lit("removed"))
        .otherwise(F.lit("changed"))
        .alias("change"),
    ).where(
        F.col("_h_old").isNull()
        | F.col("_h_new").isNull()
        | (F.col("_h_old") != F.col("_h_new"))
    )


def profile_delta(
    spark: SparkSession,
    path: str,
    from_version: int,
    to_version: int,
    old_profile: DataFrame,
    cols: tuple[str, ...],
    key_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Incremental ANALYZE: advance a table's column statistics from
    one snapshot version to the next by touching ONLY the changed rows
    — the maintenance pass that keeps catalog/CBO stats fresh without
    rescanning a 100 TB table per ingest batch.

    ``old_profile`` is a :func:`analytics.table_profile`-shaped frame
    for ``from_version`` (column / n_rows / n_nulls / min_value /
    max_value; any extra columns ignored). Row and null counts update
    EXACTLY (adds minus removes). min/max update exactly under
    appends and under removals that don't touch the boundary; a
    removal OF the current extreme can only be repaired by a rescan,
    so each output row carries ``minmax_exact`` — False means the
    bounds are still VALID CONTAINMENT (never narrower than truth)
    but possibly loose, the standard stale-stats posture engines take
    after deletes. Exact distinct counts are not incrementally
    maintainable at all; that tier is the mergeable HLL sketch store
    (operators/sketches.py), not this pass.

    Plan: the change set comes from :func:`snapshot_diff`
    (change-sized); added/removed rows are recovered by broadcast
    semi-joins of the diff keys onto the two pinned version scans, and
    all statistics aggregate over those change-sized frames — the
    unchanged mass is never read past the semi-join's pruned scan.
    """
    import functools

    diff = snapshot_diff(spark, path, from_version, to_version,
                         key_cols=key_cols).cache()
    keys = list(key_cols)
    new_keys = diff.where(F.col("change") != "removed").select(*keys)
    old_keys = diff.where(F.col("change") != "added").select(*keys)
    added = read_snapshot(spark, path, to_version).join(
        F.broadcast(new_keys), on=keys, how="left_semi"
    )
    removed = read_snapshot(spark, path, from_version).join(
        F.broadcast(old_keys), on=keys, how="left_semi"
    )

    def stats(df, tag):
        parts = [
            df.agg(
                F.count(F.lit(1)).alias(f"{tag}_rows"),
                F.count(c).alias(f"{tag}_nn"),
                F.min(F.col(c).cast("string")).alias(f"{tag}_min"),
                F.max(F.col(c).cast("string")).alias(f"{tag}_max"),
            ).select(F.lit(c).alias("column"), "*")
            for c in cols
        ]
        return functools.reduce(lambda a, b: a.unionByName(b), parts)

    base = old_profile.select(
        "column",
        F.col("n_rows").cast("bigint").alias("o_rows"),
        F.col("n_nulls").cast("bigint").alias("o_nulls"),
        F.col("min_value").alias("o_min"),
        F.col("max_value").alias("o_max"),
    )
    j = (
        base.join(stats(added, "a"), on="column", how="left")
        .join(stats(removed, "r"), on="column", how="left")
    )
    a_rows = F.coalesce(F.col("a_rows"), F.lit(0))
    r_rows = F.coalesce(F.col("r_rows"), F.lit(0))
    a_nulls = a_rows - F.coalesce(F.col("a_nn"), F.lit(0))
    r_nulls = r_rows - F.coalesce(F.col("r_nn"), F.lit(0))
    # a removal of the boundary value makes the carried bound loose
    boundary_removed = (
        (F.col("r_min").isNotNull() & (F.col("r_min") == F.col("o_min")))
        | (F.col("r_max").isNotNull() & (F.col("r_max") == F.col("o_max")))
    )
    out = j.select(
        "column",
        (F.col("o_rows") + a_rows - r_rows).cast("bigint").alias("n_rows"),
        (F.col("o_nulls") + a_nulls - r_nulls).cast("bigint").alias("n_nulls"),
        F.least(F.col("o_min"), F.coalesce(F.col("a_min"), F.col("o_min")))
        .alias("min_value"),
        F.greatest(F.col("o_max"), F.coalesce(F.col("a_max"), F.col("o_max")))
        .alias("max_value"),
        (~F.coalesce(boundary_removed, F.lit(False))).alias("minmax_exact"),
    )
    # the result is len(cols) rows: materialize it eagerly so the
    # change-set cache can be released HERE — a per-ingest-batch pass
    # must not leak cached blocks into a long-lived session
    rows = out.collect()
    diff.unpersist()
    return spark.createDataFrame(rows, out.schema)


def write_training_shards(
    docs: DataFrame,
    path: str,
    token_budget: int = 100_000,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Token-budgeted training-shard export: write the corpus as
    ``shard=N`` parquet partitions of ~``token_budget`` tokens each
    plus a ``_manifest`` table — the hand-off format a training job's
    data loader consumes (shards are the unit of loader parallelism
    and of resume bookkeeping).

    Shard count = ceil(total_tokens / budget) (ONE metadata-cheap
    aggregation); assignment is hash(id) mod n_shards — deterministic
    under re-runs and independent of row order, so a re-export after
    an append moves only what the modulus moves (the
    :func:`textstats.hash_split` posture; exact-budget bin packing is
    :func:`chunking.pack_sequences`, which trades a per-shard
    sequential fold for tighter bins — the loader only needs
    approximate balance, so the stateless hash wins at corpus scale).
    The write repartitions BY the shard column, so each shard lands as
    one file inside its partition directory.

    Returns the manifest (shard, n_docs, n_tokens) — also persisted at
    ``<path>/_manifest`` for sessions that only read.
    """
    from ..functions.hashing import hashed
    from ..functions.text import tokens

    # coalesce BEFORE size: size(NULL) is -1 under Spark's legacy
    # sizeOfNull, which would silently skew total/n_shards/assignment
    # for NULL-text docs (a NULL doc carries 0 tokens here, matching
    # the oracle's COALESCE(len(toks), 0) semantics)
    with_n = docs.withColumn(
        "_n_tokens",
        F.size(
            F.coalesce(
                tokens(F.col(text_col)), F.array().cast("array<string>")
            )
        ).cast("bigint"),
    )
    total = with_n.agg(F.sum("_n_tokens").alias("t")).first().t or 0
    n_shards = max(1, math.ceil(total / token_budget))
    sharded = with_n.withColumn(
        "shard",
        F.pmod(hashed(F.col(id_col), seed=41, hash_fn=hash_fn),
               F.lit(n_shards)).cast("int"),
    )
    (
        sharded.repartition("shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(f"{path}/shards")
    )
    manifest = (
        sharded.groupBy("shard")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("_n_tokens").cast("bigint").alias("n_tokens"),
        )
        .orderBy("shard")
    )
    manifest.write.mode("overwrite").parquet(f"{path}/_manifest")
    spark = docs.sparkSession
    return spark.read.parquet(f"{path}/_manifest").orderBy("shard")
