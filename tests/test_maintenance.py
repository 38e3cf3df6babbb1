"""Gates for the table-maintenance + storage-layout operators
(SURVEY.md §2d): small-file compaction, dynamic-partition upsert,
bucketed co-located joins, CSV quarantine ingest."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from faiss_vector_search_spark import io as fio
from faiss_vector_search_spark.operators import maintenance
from faiss_vector_search_spark.sources import bucketed, delimited, jsonl


class TestCompaction:
    def test_compact_reduces_files_preserves_rows(self, spark, sf_small, tmp_path):
        docs = fio.load_table(spark, sf_small, "documents")
        src = str(tmp_path / "fragmented")
        # simulate streaming ingest fallout: one file per row-group sliver
        docs.repartition(64).write.parquet(src)
        dst = str(tmp_path / "compacted")
        stats = maintenance.compact_parquet(
            spark, src, dst, target_file_bytes=16 * 1024 * 1024
        )
        assert stats["files_in"] == 64
        assert stats["files_out"] < stats["files_in"]
        out = spark.read.parquet(dst)
        assert out.count() == docs.count()
        # content identical, not just counts
        assert out.exceptAll(docs).count() == 0

    def test_compact_no_shuffle_by_default(self, spark, sf_small, tmp_path):
        """coalesce compaction must not plan an exchange."""
        docs = fio.load_table(spark, sf_small, "documents")
        src = str(tmp_path / "frag2")
        docs.repartition(16).write.parquet(src)
        df = spark.read.parquet(src).coalesce(2)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestPartitionUpsert:
    def _seed(self, spark, path):
        df = spark.createDataFrame(
            [(1, "a", 1.0), (2, "a", 2.0), (3, "b", 3.0), (4, "b", 4.0)],
            "id int, day string, v double",
        )
        df.write.partitionBy("day").parquet(path)

    def test_upsert_replaces_only_touched_partition(self, spark, tmp_path):
        path = str(tmp_path / "t")
        self._seed(spark, path)
        updates = spark.createDataFrame(
            [(30, "b", 30.0)], "id int, day string, v double"
        )
        maintenance.upsert_partitions(updates, path, "day")
        out = spark.read.parquet(path)
        # partition a untouched, partition b fully replaced
        assert sorted(r.id for r in out.where("day = 'a'").collect()) == [1, 2]
        assert sorted(r.id for r in out.where("day = 'b'").collect()) == [30]

    def test_upsert_is_idempotent(self, spark, tmp_path):
        path = str(tmp_path / "t2")
        self._seed(spark, path)
        updates = spark.createDataFrame(
            [(10, "a", 10.0)], "id int, day string, v double"
        )
        maintenance.upsert_partitions(updates, path, "day")
        maintenance.upsert_partitions(updates, path, "day")
        out = spark.read.parquet(path)
        assert out.count() == 3  # {10:a, 3:b, 4:b} — re-run didn't duplicate


class TestBucketedJoin:
    @pytest.fixture(scope="class")
    def tables(self, spark, sf_small, tmp_path_factory):
        d = tmp_path_factory.mktemp("buckets")
        docs = fio.load_table(spark, sf_small, "documents")
        stats = docs.select(
            "doc_id", F.length("text").alias("n")
        )
        bucketed.save_bucketed(
            docs, "b_docs", str(d / "docs"), "doc_id", n_buckets=8
        )
        bucketed.save_bucketed(
            stats, "b_stats", str(d / "stats"), "doc_id", n_buckets=8
        )
        yield "b_docs", "b_stats"
        spark.sql("DROP TABLE IF EXISTS b_docs")
        spark.sql("DROP TABLE IF EXISTS b_stats")

    def test_bucketed_join_has_no_exchange(self, spark, tables):
        left, right = tables
        thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = bucketed.load_bucketed(spark, left).join(
                bucketed.load_bucketed(spark, right), "doc_id"
            )
            j.collect()
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan  # the whole point of bucketing
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)

    def test_bucketed_join_matches_plain_join(self, spark, sf_small, tables):
        left, right = tables
        docs = fio.load_table(spark, sf_small, "documents")
        expected = docs.count()
        got = (
            bucketed.load_bucketed(spark, left)
            .join(bucketed.load_bucketed(spark, right), "doc_id")
            .count()
        )
        assert got == expected


class TestDelimitedSource:
    def _write(self, tmp_path):
        p = tmp_path / "docs.csv"
        p.write_text(
            "doc_id,text,lang,source\n"
            '1,"hello world",en,web\n'
            "2,short,en,book\n"
            "not,a,valid,row,extra,cols\n"
            '3,"quoted, with comma",es,web\n'
        )
        return str(p)

    def test_read_csv_parses_and_quarantines(self, spark, tmp_path):
        df = delimited.read_delimited(spark, self._write(tmp_path))
        clean, bad = jsonl.split_corrupt(df)
        assert clean.count() == 3
        assert bad.count() == 1
        assert "extra,cols" in bad.first().bad_line
        row3 = clean.where("doc_id = 3").first()
        assert row3.text == "quoted, with comma" and row3.lang == "es"

    def test_csv_docs_flow_into_operators(self, spark, tmp_path):
        from faiss_vector_search_spark.operators import textstats

        df = delimited.read_delimited(spark, self._write(tmp_path))
        clean, _ = jsonl.split_corrupt(df)
        out = textstats.token_count(clean)
        assert out.count() == 3


class TestZOrder:
    @pytest.fixture(scope="class")
    def zpath(self, spark, sf_small, tmp_path_factory):
        events = fio.load_table(spark, sf_small, "events")
        path = str(tmp_path_factory.mktemp("zorder") / "events_z")
        maintenance.zorder_write(events, path, "user_id", "value", bits=3)
        return path

    def test_scan_equals_full_filter(self, spark, sf_small, zpath):
        events = fio.load_table(spark, sf_small, "events")
        a, b = (10.0, 30.0), (5.0, 50.0)
        got = maintenance.zorder_scan(
            spark, zpath, a, b, "user_id", "value", bits=3
        )
        want = events.where(
            F.col("user_id").cast("double").between(*a)
            & F.col("value").cast("double").between(*b)
        )
        assert got.count() == want.count() > 0
        assert (
            got.select(sorted(got.columns))
            .exceptAll(want.select(sorted(want.columns)))
            .count()
            == 0
        )

    def test_2d_predicate_prunes_partitions(self, spark, zpath):
        import os
        import re

        total_parts = len(
            [d for d in os.listdir(f"{zpath}/data") if d.startswith("z=")]
        )
        pruned = maintenance.zorder_scan(
            spark, zpath, (10.0, 30.0), (5.0, 50.0), "user_id", "value", bits=3
        )
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        m = re.search(r"PartitionFilters: \[z#\d+ IN \(([^)]*)\)", plan)
        assert m, plan[:500]
        n_selected = len(m.group(1).split(","))
        assert 0 < n_selected < total_parts, (n_selected, total_parts)

    def test_interleave_matches_reference_bits(self, spark):
        df = spark.range(1).select(
            *[
                maintenance._interleave_bits(F.lit(a), F.lit(b), 3).alias(
                    f"z_{a}_{b}"
                )
                for a, b in [(0, 0), (7, 7), (5, 2), (1, 6)]
            ]
        )
        row = df.first()

        def ref(a, b):
            z = 0
            for i in range(3):
                z += ((a >> i) & 1) << (2 * i + 1)
                z += ((b >> i) & 1) << (2 * i)
            return z

        for a, b in [(0, 0), (7, 7), (5, 2), (1, 6)]:
            assert row[f"z_{a}_{b}"] == ref(a, b)


class TestVersionedSnapshots:
    def test_versions_are_immutable_and_pinnable(self, spark, tmp_path):
        from faiss_vector_search_spark.operators import maintenance as mt

        path = str(tmp_path / "t")
        df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, v string")
        df2 = spark.createDataFrame([(1, "a2"), (3, "c")], "id bigint, v string")
        v0 = mt.write_snapshot(df1, path)
        v1 = mt.write_snapshot(df2, path)
        assert (v0, v1) == (0, 1)
        old = {(r.id, r.v) for r in mt.read_snapshot(spark, path, v0).collect()}
        new = {(r.id, r.v) for r in mt.read_snapshot(spark, path).collect()}
        assert old == {(1, "a"), (2, "b")}
        assert new == {(1, "a2"), (3, "c")}
        assert mt.latest_version(spark, path) == 1

    def test_uncommitted_writes_invisible(self, spark, tmp_path):
        from faiss_vector_search_spark.operators import maintenance as mt

        path = str(tmp_path / "t")
        mt.write_snapshot(
            spark.createDataFrame([(1,)], "id bigint"), path
        )
        # simulate an in-flight (crashed) write: data dir exists but
        # was never committed to the manifest
        spark.createDataFrame([(99,)], "id bigint").write.parquet(
            f"{path}/v=7"
        )
        assert mt.latest_version(spark, path) == 0
        rows = {r.id for r in mt.read_snapshot(spark, path).collect()}
        assert rows == {1}
        import pytest as _pytest

        with _pytest.raises(ValueError):
            mt.read_snapshot(spark, path, 7)


class TestSnapshotDiff:
    def test_added_removed_changed(self, spark, tmp_path):
        from faiss_vector_search_spark.operators import maintenance as mt

        path = str(tmp_path / "snap")
        v0 = spark.createDataFrame(
            [(1, "a", "s1"), (2, "b", "s1"), (3, "c", "s2")],
            "doc_id bigint, text string, source string",
        )
        mt.write_snapshot(v0, path)
        v1 = spark.createDataFrame(
            [(2, "b", "s1"),          # unchanged
             (3, "c CHANGED", "s2"),  # changed
             (4, "d", "s3")],         # added; 1 removed
            "doc_id bigint, text string, source string",
        )
        mt.write_snapshot(v1, path)
        diff = {
            r["doc_id"]: r["change"]
            for r in mt.snapshot_diff(spark, path, 0, 1).collect()
        }
        assert diff == {1: "removed", 3: "changed", 4: "added"}

    def test_identical_versions_empty_and_schema_drift_raises(
        self, spark, tmp_path
    ):
        import pytest as _pytest

        from faiss_vector_search_spark.operators import maintenance as mt

        path = str(tmp_path / "snap2")
        df = spark.createDataFrame(
            [(1, "a")], "doc_id bigint, text string"
        )
        mt.write_snapshot(df, path)
        mt.write_snapshot(df, path)
        assert mt.snapshot_diff(spark, path, 0, 1).count() == 0
        drifted = spark.createDataFrame(
            [(1, "a", 9)], "doc_id bigint, text string, extra int"
        )
        mt.write_snapshot(drifted, path)
        with _pytest.raises(ValueError, match="schema drift"):
            mt.snapshot_diff(spark, path, 1, 2).collect()

    def test_null_content_distinguished(self, spark, tmp_path):
        """NULL vs empty-string content must not hash-collide (the
        \\x00 sentinel in the digest)."""
        from faiss_vector_search_spark.operators import maintenance as mt

        path = str(tmp_path / "snap3")
        mt.write_snapshot(
            spark.createDataFrame([(1, None)], "doc_id bigint, text string"),
            path,
        )
        mt.write_snapshot(
            spark.createDataFrame([(1, "")], "doc_id bigint, text string"),
            path,
        )
        rows = mt.snapshot_diff(spark, path, 0, 1).collect()
        assert [(r["doc_id"], r["change"]) for r in rows] == [(1, "changed")]
