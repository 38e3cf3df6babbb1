"""Random-hyperplane LSH for cosine ANN — the 100 TB scale path for
similarity search and embedding near-dup (SURVEY.md §2b #23).

Charikar-style signatures: L tables × B hyperplane bits. A vector's
bucket in table t is the sign-pattern of its dots with that table's
planes. Near vectors collide in ≥1 table with high probability;
within-bucket verification makes precision exact.

Signature computation is a single Arrow-batched ``mapInPandas`` doing
one (batch × dim) @ (dim × L·B) matmul per batch — the pattern a GPU
embedder would use, and ~100× cheaper than per-element JVM folds for
wide signature banks. Planes are deterministic (seeded Gaussian,
broadcast via closure: L·B·dim doubles ≈ KBs).

Bucket joins shuffle only (id, table, bucket) triples — never the
vectors themselves; vectors re-join candidates by id afterwards.

Parameter tuning: per-table collision probability for two vectors at
angle θ is ``(1 - θ/π)^n_bits``; over L tables, ``1-(1-p)^L``. The
defaults (4 bits × 24 tables for top-k, 5 × 24 for near-dup) target
the *weak*-similarity regime of the test corpus (top-10 neighbors at
cos 0.21-0.37). Real embedding corpora with near-dups at cos ≥ 0.8
should raise n_bits to 10-16 (fewer, smaller buckets → candidate set
~L·n/2^bits stays sublinear at 100 TB) and can drop tables to 4-8.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .knn import SCORE_DECIMALS


def _planes(dim: int, n_tables: int, n_bits: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_tables * n_bits, dim))


def lsh_bits_for(
    n: int, target_bucket_size: int = 64, min_bits: int = 4
) -> int:
    """Bucket-bit sizing rule: ``ceil(log2(n / target_bucket_size))``,
    floored at ``min_bits``.

    A FIXED n_bits does not survive a scale-up: buckets hold
    ``n / 2^bits`` vectors, so the in-bucket candidate-pair stage costs
    ``L · n²/2^bits`` — quadratic in corpus size. Measured in the r4
    100× rehearsal (scripts/scale_rehearsal.py): near_dup_lsh at the
    small-SF default ``n_bits=5`` took 54× the wall time at 10× the
    vectors. Growing bits with log₂(n) pins the bucket size, making
    candidate pairs ``L · n · target/2`` — linear, constant per-vector
    cost, which is the only posture that holds at 100 TB.

    The price is per-table recall ``p^bits`` (module docstring); spend
    tables or query-side multi-probe (:func:`query_probe_buckets`) to
    buy it back. For weak-similarity thresholds (cos ≲ 0.5) no
    affordable bit count blocks well — use the IVF-blocked
    :func:`~faiss_vector_search_spark.operators.dedup.semdedup` family
    there instead; hyperplane LSH is the high-similarity
    (near-duplicate) tool."""
    import math

    return max(min_bits, math.ceil(math.log2(max(1.0, n / target_bucket_size))))


def lsh_buckets(
    vectors: DataFrame,
    dim: int = 64,
    n_tables: int = 24,
    n_bits: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, table, bucket): one row per (vector, table)."""
    planes = _planes(dim, n_tables, n_bits, seed)
    weights = (1 << np.arange(n_bits)).astype(np.int64)

    def sigs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            bits = (mat @ planes.T) > 0  # (n, L*B)
            bits = bits.reshape(len(pdf), n_tables, n_bits)
            buckets = bits @ weights  # (n, L)
            out = pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy().repeat(n_tables),
                    "table": np.tile(np.arange(n_tables), len(pdf)),
                    "bucket": buckets.reshape(-1),
                }
            )
            yield out

    return vectors.select(id_col, vec_col).mapInPandas(
        sigs, schema=f"{id_col} bigint, table int, bucket bigint"
    )


def query_probe_buckets(
    query: DataFrame,
    dim: int = 64,
    n_tables: int = 24,
    n_bits: int = 4,
    seed: int = 42,
    multiprobe: int = 0,
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """The query's (table, bucket) probe set, optionally multi-probe
    (Lv et al., VLDB'07, public): beyond the home bucket, probe the
    buckets reached by flipping the ``multiprobe`` LEAST-CONFIDENT
    bits — the hyperplanes whose dot product with the query is
    closest to zero, i.e. exactly where a true neighbor most likely
    landed on the other side.

    Multi-probe trades query-side probes for index-side tables: the
    corpus is hashed ONCE into fewer tables (smaller index, less
    shuffle at build) while recall is recovered at query time from
    (1 + multiprobe) probes per table. At 100 TB the corpus-side cost
    is the one that matters, so this is the right direction to spend."""
    pairs = _probe_pairs(
        query, dim, n_tables, n_bits, seed, multiprobe, query_vec_col
    )
    spark = query.sparkSession
    if not pairs:
        # empty query set → empty probe set; the bucket join then
        # yields an empty result, matching the old lsh_buckets-based
        # path's behavior
        return spark.createDataFrame([], "table int, bucket bigint")
    return spark.createDataFrame(pairs, "table int, bucket bigint")


def _probe_pairs(
    query: DataFrame,
    dim: int,
    n_tables: int,
    n_bits: int,
    seed: int,
    multiprobe: int,
    query_vec_col: str,
) -> list:
    """The sorted, deduplicated (table, bucket) probe pairs of
    :func:`query_probe_buckets`, as driver-side values — query-sized
    state (the probe-map convention), usable both as a literal frame
    and inside the fused candidate kernel of :func:`ann_lsh_search`."""
    planes = _planes(dim, n_tables, n_bits, seed)
    weights = (1 << np.arange(n_bits)).astype(np.int64)
    qrows = [r[query_vec_col] for r in query.select(query_vec_col).collect()]
    if not qrows:
        return []
    qv = np.vstack(qrows).astype(np.float64)
    margins = qv @ planes.T  # (q, L*B)
    rows = []
    for qi in range(margins.shape[0]):
        m = margins[qi].reshape(n_tables, n_bits)
        bits = m > 0
        for t in range(n_tables):
            home = int(bits[t] @ weights)
            rows.append((t, home))
            # flip bits in increasing |margin| order, one at a time
            for b in np.argsort(np.abs(m[t]))[:multiprobe]:
                rows.append((t, home ^ int(weights[b])))
    return sorted(set(rows))


def ann_lsh_search(
    corpus: DataFrame,
    query: DataFrame,
    k: int = 10,
    dim: int = 64,
    n_tables: int = 24,
    n_bits: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_vec_col: str = "query_vec",
    multiprobe: int = 0,
    corpus_buckets: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k: candidates = union of the query's buckets
    across tables (plus ``multiprobe`` bit-flip perturbations per
    table), then exact IP scoring of candidates only.

    Pass a precomputed ``corpus_buckets`` (from :func:`lsh_buckets`
    with the SAME dim/tables/bits/seed) to amortize the corpus-side
    hashing across many searches — the standing-index usage, and what
    `evaluate.recall_report` does across its query sample."""
    from ..functions import vector as V

    if corpus_buckets is None:
        # Fused candidate kernel: the query's probe set is driver-side
        # literal state (query-sized, same collect query_probe_buckets
        # already does), so the SAME matmul pass that hashed the corpus
        # can ALSO decide bucket membership in-kernel and emit only the
        # candidate (id, vector) rows. Versus the bucket-join form this
        # removes, per search: the L-fold (id, table, bucket) row
        # blow-up out of the Arrow stage, the broadcast bucket join,
        # the candidate distinct exchange (each corpus row emits at
        # most once per batch by construction), and the second corpus
        # scan + semi-join that re-attached vectors to candidate ids
        # (plan before/after: plans/r12/ann_lsh_search_*.txt). The
        # bucket math is byte-identical to lsh_buckets + the
        # query_probe_buckets join (equality gate in test_opt_r12);
        # scoring below is untouched JVM ip_score on the original
        # float vectors, which round-trip Arrow exactly.
        probe_pairs = _probe_pairs(
            query, dim, n_tables, n_bits, seed, multiprobe, query_vec_col
        )
        by_table: dict[int, list] = {}
        for t, b in probe_pairs:
            by_table.setdefault(t, []).append(b)
        probes = {
            t: np.asarray(bs, dtype=np.int64) for t, bs in by_table.items()
        }
        planes = _planes(dim, n_tables, n_bits, seed)
        weights = (1 << np.arange(n_bits)).astype(np.int64)
        vec_type = corpus.schema[vec_col].dataType.simpleString()

        def cand_kernel(
            batches: Iterator[pd.DataFrame],
        ) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if pdf.empty or not probes:
                    continue
                mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
                bits = (mat @ planes.T) > 0  # (n, L*B)
                buckets = (
                    bits.reshape(len(pdf), n_tables, n_bits) @ weights
                )  # (n, L)
                mask = np.zeros(len(pdf), dtype=bool)
                for t, bs in probes.items():
                    mask |= np.isin(buckets[:, t], bs)
                if not mask.any():
                    continue
                yield pdf.loc[mask, [id_col, vec_col]]

        cands = corpus.select(id_col, vec_col).mapInPandas(
            cand_kernel, schema=f"{id_col} bigint, {vec_col} {vec_type}"
        )
    else:
        query_buckets = query_probe_buckets(
            query, dim, n_tables, n_bits, seed, multiprobe, query_vec_col
        )
        cand_ids = (
            corpus_buckets.join(
                F.broadcast(query_buckets), ["table", "bucket"]
            )
            .select(id_col)
            .distinct()
        )
        cands = corpus.join(cand_ids, id_col, "leftsemi")
    return (
        cands.crossJoin(F.broadcast(query.select(query_vec_col)))
        .select(
            F.col(id_col),
            F.round(
                V.ip_score(F.col(vec_col), F.col(query_vec_col)), SCORE_DECIMALS
            ).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def cap_bucket_size(
    buckets: DataFrame, max_bucket_size: int, keys=("table", "bucket")
) -> DataFrame:
    """Drop buckets larger than ``max_bucket_size`` before a bucket
    self-join — the skew guard for degenerate buckets (all-zero
    vectors, boilerplate-heavy corpora) whose self-join would go
    quadratic. A dropped bucket only loses pairs whose *every* shared
    bucket is oversized; with multiple tables the pair usually
    survives elsewhere. Production LSH dedup pipelines cap buckets for
    exactly this reason; AQE's skew-join splitting spreads the work
    but cannot shrink the O(|bucket|²) pair count itself."""
    keys = list(keys)
    counts = buckets.groupBy(*keys).count()
    ok = counts.where(F.col("count") <= max_bucket_size).select(*keys)
    return buckets.join(F.broadcast(ok), keys, "leftsemi")


def near_dup_lsh(
    emb: DataFrame,
    threshold: float = 0.45,
    dim: int = 64,
    n_tables: int = 24,
    n_bits: int = 5,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int | None = None,
    engine: str = "sql",
) -> DataFrame:
    """Embedding near-dup pairs via bucket-blocked candidate
    generation + exact cosine verification — the scale variant of
    ``dedup.embedding_cosine_pairs`` (same output contract).
    ``max_bucket_size`` enables the skew guard (see
    :func:`cap_bucket_size`).

    SIZE ``n_bits`` WITH THE CORPUS: pass
    ``n_bits=lsh_bits_for(corpus_rows)`` — the small-SF default (5)
    keeps only 32 buckets per table, so candidate pairs grow
    quadratically with corpus size (measured 54× wall at 10× vectors
    in the r4 rehearsal; see :func:`lsh_bits_for`).

    ``engine`` picks the pair-VERIFY implementation (same candidate
    semantics): "sql" = candidate equi-join + per-pair interpreted
    cosine fold, deterministic oracle profile; "arrow" = per-(table,
    bucket) Gram matmul via applyInPandas — the decisive difference
    is DATA MOVEMENT, not just BLAS-vs-fold: the sql shape ships two
    64-float vectors per candidate PAIR (~49 GB at sf10's 48M
    candidates; a per-pair-batch arrow verify won back only 13%),
    the bucket shape ships each vector once per table (~2.4 GB at
    sf10) and the quadratic work happens in-memory per bucket —
    measured 113.8→14.9 s at sf10 (**7.6x**; sf1→sf10 now scales
    8.5→14.9 = 1.8x at 10x vectors — bucket-hashing-bound instead of
    pair-bound). Pair-set
    equality vs sql is pytest-gated (tests/test_lsh.py); a pair
    found in several tables computes bit-identical cosine in each,
    so the cross-table distinct dedups exactly."""
    from ..functions import vector as V

    # repartition on the join keys: the explicit exchange becomes the
    # shared subplan both sides of the self-join (and the bucket-cap
    # count) re-read via ReusedExchange — the signature mapInPandas
    # then runs ONCE instead of once per consumer branch. The arrow
    # verify repartitions itself (bucket-sorted stream), so it takes
    # the raw bucket frame and skips this exchange.
    raw_buckets = lsh_buckets(emb, dim, n_tables, n_bits, seed, id_col,
                              vec_col)
    if engine == "arrow":
        b = raw_buckets
        if max_bucket_size is not None:
            # the cap's count branch and the verify both consume the
            # bucket frame — stage it behind the same explicit
            # exchange the sql path uses so the signature mapInPandas
            # runs ONCE (ReusedExchange), not once per consumer
            # (r12, the ADVICE r11 duplication note)
            b = cap_bucket_size(b.repartition("table", "bucket"),
                                max_bucket_size)
        return _near_dup_buckets_arrow(b, emb, threshold, id_col, vec_col)
    buckets = raw_buckets.repartition("table", "bucket")
    if max_bucket_size is not None:
        buckets = cap_bucket_size(buckets, max_bucket_size)
    if engine != "sql":
        raise ValueError(f"unknown near_dup_lsh engine: {engine}")
    left = buckets.select(
        F.col(id_col).alias("id_a"), "table", "bucket"
    )
    right = buckets.select(
        F.col(id_col).alias("id_b"), "table", "bucket"
    )
    cand = (
        left.join(right, ["table", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"))
    vb = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                V.ip_score(F.col("v_a"), F.col("v_b")), SCORE_DECIMALS
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def _near_dup_buckets_arrow(
    buckets: DataFrame, emb: DataFrame, threshold: float,
    id_col: str, vec_col: str,
) -> DataFrame:
    """Arrow verify for near_dup_lsh: one Gram matmul per (table,
    bucket) group. Each vector ships once per table it hashes into
    instead of once per candidate pair, and the quadratic pair work
    runs as in-memory BLAS inside the (capped) bucket. Duplicate
    pairs across tables compute bit-identical cosines, so the final
    distinct collapses them exactly; zero-norm vectors yield NaN
    which the threshold comparison drops (the sql try_divide NULL
    behaves the same).

    r11: the per-group stage is ``mapInPandas`` over a
    bucket-co-partitioned, bucket-sorted stream, NOT
    ``groupBy().applyInPandas`` — applyInPandas materializes ONE
    pandas frame + one Python call PER GROUP, and with L·2^bits
    groups the per-group overhead dominated the whole operator
    (measured 2.3 s of the key's 2.67 s at sf0.1 for 768 groups of
    ~60 rows; at production bucket counts it is the same per-group
    constant times millions). The kernel walks contiguous
    (table, bucket) runs inside each Arrow batch and carries the
    possibly-split trailing run over to the next batch (groups never
    span partitions — the repartition hashes each group to one);
    per-bucket math is unchanged, so the pair set is identical
    (pytest pair-set equality vs the sql engine still gates it)."""
    import numpy as np
    import pandas as pd

    def bucket_pairs(ids, vecs):
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        x = np.vstack([np.asarray(v, dtype=np.float64) for v in vecs])[order]
        norms = np.linalg.norm(x, axis=1)
        g = x @ x.T
        denom = np.outer(norms, norms)
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = np.round(g / denom, 6)
        ia, ib = np.triu_indices(len(ids), 1)
        keep = cos[ia, ib] >= threshold  # NaN -> False
        return (ids[ia[keep]], ids[ib[keep]], cos[ia[keep], ib[keep]])

    def emit(pdf: "pd.DataFrame") -> "pd.DataFrame":
        out_a, out_b, out_c = [], [], []
        tb = pdf["table"].values
        bk = pdf["bucket"].values
        ids = pdf[id_col].values
        vecs = pdf["_v"].values
        # contiguous runs of (table, bucket) — the stream is sorted
        cuts = np.flatnonzero((tb[1:] != tb[:-1]) | (bk[1:] != bk[:-1])) + 1
        bounds = np.concatenate(([0], cuts, [len(pdf)]))
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            if hi - lo < 2:
                continue
            a, b, c = bucket_pairs(ids[lo:hi], vecs[lo:hi])
            out_a.append(a)
            out_b.append(b)
            out_c.append(c)
        if not out_a:
            return pd.DataFrame(
                {"id_a": pd.Series(dtype="int64"),
                 "id_b": pd.Series(dtype="int64"),
                 "cosine": pd.Series(dtype="float64")}
            )
        return pd.DataFrame(
            {"id_a": np.concatenate(out_a),
             "id_b": np.concatenate(out_b),
             "cosine": np.concatenate(out_c)}
        )

    def kernel(batches):
        buf = None
        for pdf in batches:
            if buf is not None and len(buf):
                pdf = pd.concat([buf, pdf], ignore_index=True)
                buf = None
            if not len(pdf):
                continue
            # hold back the trailing (table, bucket) run: an Arrow
            # batch boundary can split a group, the partition cannot
            tb = pdf["table"].values
            bk = pdf["bucket"].values
            same = (tb == tb[-1]) & (bk == bk[-1])
            # suffix start = first index of the trailing run
            nonlast = np.flatnonzero(~same)
            start = (nonlast[-1] + 1) if len(nonlast) else 0
            buf = pdf.iloc[start:]
            head = pdf.iloc[:start]
            if len(head):
                yield emit(head)
        if buf is not None and len(buf):
            yield emit(buf)

    grouped = buckets.join(
        emb.select(F.col(id_col), F.col(vec_col).alias("_v")), id_col
    )
    return grouped.repartition("table", "bucket").sortWithinPartitions(
        "table", "bucket"
    ).mapInPandas(
        kernel, schema="id_a long, id_b long, cosine double"
    ).distinct()
