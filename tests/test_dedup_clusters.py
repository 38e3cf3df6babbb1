"""Connected-components gate: the distributed min-label propagation
must produce exactly the components a driver-side union-find computes
from the same pairs."""

from __future__ import annotations

from pyspark.sql import functions as F

from faiss_vector_search_spark import io as fio
from faiss_vector_search_spark.operators import dedup


def _union_find(ids, pairs):
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in ids}


def test_clusters_match_union_find(spark, sf_small):
    docs = fio.load_table(spark, sf_small, "documents")
    pairs = dedup.minhash_lsh_pairs(
        docs, n=3, num_hashes=16, bands=4, threshold=0.5, hash_fn="xxhash64"
    ).cache()
    got = {
        r.doc_id: r.cluster_id
        for r in dedup.dedup_clusters(docs, pairs).collect()
    }
    ids = [r.doc_id for r in docs.select("doc_id").collect()]
    edge_list = [(r.doc_a, r.doc_b) for r in pairs.collect()]
    assert edge_list, "test needs near-dup pairs"
    want = _union_find(ids, edge_list)
    assert got == want

    # cluster_id is the component minimum, and every pair is intra-cluster
    assert all(cid <= d for d, cid in got.items())
    assert all(got[a] == got[b] for a, b in edge_list)
