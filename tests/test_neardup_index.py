"""Persisted near-dup index gates: probe correctness vs the batch
operator, partition pruning on (band, bucket), incremental append
without rewriting untouched partitions, and meta-enforced banding."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from faiss_vector_search_spark import io as fio
from faiss_vector_search_spark.operators import dedup


def _index(spark, sf_small, tmp_path_factory):
    docs = fio.load_table(spark, sf_small, "documents")
    path = str(tmp_path_factory.mktemp("ndidx") / "index")
    dedup.neardup_index_save(docs, path)
    return docs, path


def test_query_matches_batch_operator(spark, sf_small, tmp_path_factory):
    """Probing the index with the corpus itself must reproduce the
    batch pair miner (plus trivial self-matches at jaccard 1.0)."""
    docs, path = _index(spark, sf_small, tmp_path_factory)
    probe = docs.where(F.col("doc_id") < 100)
    got = {
        (r.batch_id, r.doc_id): r.jaccard
        for r in dedup.neardup_index_query(
            spark, path, probe, threshold=0.8
        ).collect()
    }
    # every probed doc self-matches exactly
    for r in probe.select("doc_id").collect():
        assert got.get((r.doc_id, r.doc_id)) == 1.0
    # non-self hits == the batch miner's pairs touching the probe set
    batch_pairs = {
        tuple(sorted((r.doc_a, r.doc_b))): r.jaccard
        for r in dedup.minhash_lsh_pairs(
            docs, hash_fn="xxhash64", threshold=0.8
        ).collect()
    }
    got_pairs = {
        tuple(sorted((b, d))): j for (b, d), j in got.items() if b != d
    }
    want = {
        p: j for p, j in batch_pairs.items() if p[0] < 100 or p[1] < 100
    }
    assert got_pairs == want


def test_probe_prunes_partitions(spark, sf_small, tmp_path_factory):
    """The bands scan must carry PartitionFilters on band/bucket —
    the posting-list read, not a full index scan."""
    docs, path = _index(spark, sf_small, tmp_path_factory)
    probe = docs.where(F.col("doc_id") == 0)
    out = dedup.neardup_index_query(spark, path, probe)
    import contextlib
    import io as pyio

    buf = pyio.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    # the probe's 4 bands x 1 bucket each -> at most 4 directories
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "band" in m.group(1) and "bucket" in m.group(1)


def test_append_only_touches_new_partitions(
    spark, sf_small, tmp_path_factory
):
    """Appending a batch rewrites nothing: pre-existing band files are
    byte-stable (same set, same mtimes), and the appended docs become
    findable."""
    docs, path = _index(spark, sf_small, tmp_path_factory)
    bands_dir = f"{path}/bands"

    def file_states():
        states = {}
        for root, _, files in os.walk(bands_dir):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(root, f)
                    states[p] = os.path.getmtime(p)
        return states

    before = file_states()
    new_doc = spark.createDataFrame(
        [(999_999, "a brand new document about distributed query engines "
                   "and columnar execution at scale")],
        "doc_id long, text string",
    )
    dedup.neardup_index_append(new_doc, path)
    after = file_states()
    for p, mtime in before.items():
        assert p in after and after[p] == mtime  # untouched
    assert len(after) > len(before)  # new files landed
    # the appended doc is now findable (self-match through the index)
    hits = dedup.neardup_index_query(spark, path, new_doc).collect()
    assert any(r.doc_id == 999_999 and r.jaccard == 1.0 for r in hits)


def test_disjoint_probe_is_empty(spark, sf_small, tmp_path_factory):
    _, path = _index(spark, sf_small, tmp_path_factory)
    probe = _docs = spark.createDataFrame(
        [(5, "zyzzyva qwertyuiop asdfghjkl zxcvbnm plmoknijb uhbygvtfc")],
        "doc_id long, text string",
    )
    assert dedup.neardup_index_query(spark, path, probe).count() == 0
