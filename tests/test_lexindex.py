"""Persisted inverted-index gates: probe == batch BM25 byte-identical,
partition-pruned postings scan, append-only file behavior."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from faiss_vector_search_spark import io as fio
from faiss_vector_search_spark.operators import lexical

QUERY = "batch window vector hash fast stream"


@pytest.fixture(scope="module")
def built(spark, sf_small):
    docs = fio.load_table(spark, sf_small, "documents")
    path = os.path.join(tempfile.mkdtemp(prefix="fvs_lexidx_"), "idx")
    lexical.lexical_index_save(docs, path)
    return docs, path


def _files(root):
    out = {}
    for dirpath, _dirs, names in os.walk(root):
        for n in names:
            if n.endswith(".parquet"):
                p = os.path.join(dirpath, n)
                out[p] = os.path.getsize(p)
    return out


class TestProbe:
    def test_matches_batch_bm25_exactly(self, spark, built):
        docs, path = built
        direct = lexical.bm25_search(docs, QUERY, k=10).collect()
        probed = lexical.bm25_index_search(spark, path, QUERY, k=10).collect()
        # byte-identical scores: same exact tf/df/dl/N integers, same
        # sorted contribution fold
        assert [(r["doc_id"], r["score"]) for r in direct] == [
            (r["doc_id"], r["score"]) for r in probed
        ]

    def test_partition_pruning_and_pushed_terms(self, spark, built):
        _docs, path = built
        df = lexical.bm25_index_search(spark, path, QUERY, k=10)
        plan = df._jdf.queryExecution().executedPlan().toString()
        scan = next(
            ln for ln in plan.splitlines()
            if "Scan parquet" in ln and "postings" in ln
        )
        assert "PartitionFilters: [" in scan
        # tb is a partition column with an isin predicate
        assert "tb" in scan.split("PartitionFilters:")[1][:200]
        assert "PushedFilters:" in scan and "In(term" in scan

    def test_disjoint_query_empty_and_blank_raises(self, spark, built):
        _docs, path = built
        assert (
            lexical.bm25_index_search(
                spark, path, "zzzzqqqq wwwwvvvv", k=5
            ).count()
            == 0
        )
        with pytest.raises(ValueError):
            lexical.bm25_index_search(spark, path, "   ", k=5)


class TestAppend:
    def test_append_updates_results_and_keeps_files(self, spark, sf_small):
        docs = fio.load_table(spark, sf_small, "documents")
        half_a = docs.where(F.col("doc_id") % 2 == 0)
        half_b = docs.where(F.col("doc_id") % 2 == 1)
        path = os.path.join(tempfile.mkdtemp(prefix="fvs_lexidx_"), "idx")
        lexical.lexical_index_save(half_a, path)
        before = _files(f"{path}/postings")
        lexical.lexical_index_append(half_b, path)
        after = _files(f"{path}/postings")
        # append-only: every pre-existing posting file survives
        # byte-stable; new files appear
        for p, size in before.items():
            assert after.get(p) == size
        assert len(after) > len(before)
        # the probed index now equals batch BM25 over the FULL corpus
        # (meta N/sum_dl updated exactly)
        direct = lexical.bm25_search(docs, QUERY, k=10).collect()
        probed = lexical.bm25_index_search(spark, path, QUERY, k=10).collect()
        assert [(r["doc_id"], r["score"]) for r in direct] == [
            (r["doc_id"], r["score"]) for r in probed
        ]


FUZZY_QUERY = "bath windov vektor"  # one-edit typos of corpus terms


class TestFuzzyIndexProbe:
    """r10 verdict ask #4: fuzzy retrieval served from the persisted
    term dictionary — equal to the corpus-vocab-scan form, with the
    length window pruning the _terms partitions."""

    @pytest.mark.parametrize("max_dist", [0, 1])
    def test_matches_scan_form(self, spark, built, max_dist):
        docs, path = built
        scan = lexical.fuzzy_search(
            docs, FUZZY_QUERY, k=10, max_dist=max_dist
        ).collect()
        probed = lexical.fuzzy_index_search(
            spark, path, FUZZY_QUERY, k=10, max_dist=max_dist
        ).collect()
        assert [(r["doc_id"], r["score"]) for r in scan] == [
            (r["doc_id"], r["score"]) for r in probed
        ]

    def test_terms_scan_is_length_pruned(self, spark, built):
        _docs, path = built
        q_terms = lexical.query_terms(FUZZY_QUERY)
        lengths = {
            ln
            for q in q_terms
            for ln in range(max(1, len(q) - 1), len(q) + 2)
        }
        cand = spark.read.parquet(f"{path}/_terms").where(
            F.col("tl").isin(sorted(lengths))
        )
        plan = cand._jdf.queryExecution().executedPlan().toString()
        scan = next(
            ln for ln in plan.splitlines()
            if "Scan parquet" in ln and "_terms" in ln
        )
        # the length window reaches the source as a PARTITION filter:
        # the probe reads only the edit-ball's length directories
        assert "PartitionFilters: [" in scan
        assert "tl" in scan.split("PartitionFilters:")[1][:200]
        # and those directories exist on disk (layout proof)
        dirs = {
            n for n in os.listdir(f"{path}/_terms") if n.startswith("tl=")
        }
        assert dirs and all(n.split("=")[1].isdigit() for n in dirs)

    def test_no_expansion_returns_empty(self, spark, built):
        _docs, path = built
        out = lexical.fuzzy_index_search(
            spark, path, "zzzzqqqqxxyy", k=5, max_dist=1
        )
        assert out.count() == 0
        assert out.columns == ["doc_id", "score"]

    def test_append_extends_dictionary(self, spark, sf_small, tmp_path):
        docs = fio.load_table(spark, sf_small, "documents")
        path = str(tmp_path / "idx")
        lexical.lexical_index_save(docs.where("doc_id < 250"), path)
        spark_df = docs.sparkSession.createDataFrame(
            [(900001, "zzznewterm appears here zzznewterm")],
            "doc_id bigint, text string",
        )
        lexical.lexical_index_append(spark_df, path)
        hit = lexical.fuzzy_index_search(
            spark, path, "zzznewterms", k=5, max_dist=1
        ).collect()
        assert [r["doc_id"] for r in hit] == [900001]


class TestQLIndexProbe:
    """r11 #216: Dirichlet QL served from the persisted index —
    score-identical to the scan form (same exact tf/dl/ctf/|C|
    integers, same sorted fold)."""

    def test_matches_scan_form(self, spark, built):
        docs, path = built
        direct = lexical.ql_search(docs, QUERY, k=10, mu=1000.0).collect()
        probed = lexical.ql_index_search(
            spark, path, QUERY, k=10, mu=1000.0
        ).collect()
        assert [(r["doc_id"], r["score"]) for r in direct] == [
            (r["doc_id"], r["score"]) for r in probed
        ]

    def test_matches_after_append(self, spark, sf_small, tmp_path):
        docs = fio.load_table(spark, sf_small, "documents")
        path = str(tmp_path / "idx")
        lexical.lexical_index_save(docs.where("doc_id % 2 = 0"), path)
        lexical.lexical_index_append(docs.where("doc_id % 2 = 1"), path)
        direct = lexical.ql_search(docs, QUERY, k=10).collect()
        probed = lexical.ql_index_search(spark, path, QUERY, k=10).collect()
        assert [(r["doc_id"], r["score"]) for r in direct] == [
            (r["doc_id"], r["score"]) for r in probed
        ]

    def test_disjoint_query_empty_and_blank_raises(self, spark, built):
        _docs, path = built
        out = lexical.ql_index_search(
            spark, path, "zzzzqqqq wwwwvvvv", k=5
        )
        assert out.count() == 0
        assert out.columns == ["doc_id", "score"]
        with pytest.raises(ValueError):
            lexical.ql_index_search(spark, path, "   ", k=5)

    def test_probe_plan_is_pruned_single_scan(self, spark, built):
        _docs, path = built
        df = lexical.ql_index_search(spark, path, QUERY, k=10)
        plan = df._jdf.queryExecution().executedPlan().toString().split(
            "Initial Plan")[0]
        assert plan.count("Scan parquet") == 1
        scan = next(
            ln for ln in plan.splitlines()
            if "Scan parquet" in ln and "postings" in ln
        )
        assert "PartitionFilters: [" in scan
        assert "tb" in scan.split("PartitionFilters:")[1][:200]
