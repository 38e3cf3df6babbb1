"""Round-9 ADVICE + verdict gates.

1. Contradictory-rank result duplicates collapse to min(rank) in the
   retrieval metrics (ADVICE r8: the (query, id, rank) distinct only
   handled exact-dup rows — the same id at two ranks still
   double-counted n_hits and its DCG term).
2. The two-phase kNN engine accepts STRING query/corpus ids (ADVICE
   r8: the output schema pinned query_id to bigint and id unboxing
   assumed numpy scalars).
3. The persisted miners' label scans prune to the probed lists
   (ADVICE r8: hard_negatives_persisted / training_triplets_persisted
   read the full vectors table while their docstrings claimed the
   probed-lists scan path).
4. A fragmented MP4 track whose samples are ALL flagged non-sync
   reports keyframe=False for every frame (ADVICE r8: the empty-set
   sentinel could not represent "no sync samples").
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


class TestMinRankCollapse:
    def test_suite_duplicate_rank_result_counts_once(self, spark):
        from faiss_vector_search_spark.operators import evaluate

        results = spark.createDataFrame(
            # doc 10 appears at rank 1 AND rank 3 — must score once,
            # at its best rank
            [("q1", 10, 1), ("q1", 10, 3), ("q1", 11, 2)],
            "query_tag string, doc_id long, rank int",
        )
        truth = spark.createDataFrame(
            [("q1", 10), ("q1", 12)], "query_tag string, doc_id long"
        )
        rows = {r["query_tag"]: r for r in evaluate
                .retrieval_metrics_by_query(results, truth, k=10).collect()}
        q = rows["q1"]
        assert q["n_hits"] == 1 and q["n_relevant"] == 2
        assert q["recall_at_k"] == pytest.approx(0.5)
        assert q["mrr"] == 1.0  # best rank wins
        # dcg = 1/log2(1+1) for doc 10 at rank 1 ONLY; idcg over 2
        import math
        exp = round(1.0 / (1.0 + 1.0 / math.log2(3)), 6)
        assert q["ndcg_at_k"] == pytest.approx(exp, abs=1e-9)

    def test_single_query_duplicate_rank_result_counts_once(self, spark):
        from faiss_vector_search_spark.operators import evaluate

        results = spark.createDataFrame(
            [(10, 2), (10, 5), (11, 1)], "doc_id long, rank int")
        truth = spark.createDataFrame([(10,)], "doc_id long")
        (m,) = evaluate.retrieval_metrics(results, truth, k=10).collect()
        assert m["n_hits"] == 1 and m["n_relevant"] == 1
        assert m["recall_at_k"] == 1.0
        assert m["mrr"] == 0.5  # min(rank) = 2
        import math
        assert m["ndcg_at_k"] == pytest.approx(
            round(1.0 / math.log2(3), 6), abs=1e-9)

    def test_unjudged_query_rows_drop(self, spark):
        from faiss_vector_search_spark.operators import evaluate

        results = spark.createDataFrame(
            [("q1", 10, 1), ("q9", 20, 1)],
            "query_tag string, doc_id long, rank int",
        )
        truth = spark.createDataFrame(
            [("q1", 10)], "query_tag string, doc_id long")
        rows = {r["query_tag"]: r for r in evaluate
                .retrieval_metrics_by_query(results, truth, k=10).collect()}
        assert set(rows) == {"q1", "MACRO"}
        assert rows["MACRO"]["recall_at_k"] == 1.0


class TestTwoPhaseStringIds:
    def _frames(self, spark):
        rows = [
            ("a", [1.0, 0.0], "x"), ("b", [0.9, 0.1], "x"),
            ("c", [0.0, 1.0], "y"), ("d", [0.1, 0.9], "y"),
            ("e", [0.7, 0.3], "x"),
        ]
        corpus = spark.createDataFrame(
            rows, "vec_id string, embedding array<double>, label string")
        queries = spark.createDataFrame(
            [("a", [1.0, 0.0], "x"), ("c", [0.0, 1.0], "y")],
            "query_id string, query_vec array<double>, query_label string",
        )
        return corpus, queries

    def test_knn_classify_string_ids_two_phase_equals_window(self, spark):
        from faiss_vector_search_spark.operators import knn

        corpus, queries = self._frames(spark)
        got = sorted(
            tuple(r) for r in knn.knn_classify(
                corpus, queries, k=3, engine="two_phase").collect())
        want = sorted(
            tuple(r) for r in knn.knn_classify(
                corpus, queries, k=3, engine="window").collect())
        assert got == want and got

    def test_hard_negatives_string_ids_two_phase_equals_window(self, spark):
        from faiss_vector_search_spark.operators import knn

        corpus, queries = self._frames(spark)
        got = sorted(
            tuple(r) for r in knn.hard_negatives(
                corpus, queries, k=2, engine="two_phase").collect())
        want = sorted(
            tuple(r) for r in knn.hard_negatives(
                corpus, queries, k=2, engine="window").collect())
        assert got == want and got

    def test_training_triplets_string_ids(self, spark):
        from faiss_vector_search_spark.operators import knn

        corpus, queries = self._frames(spark)
        got = sorted(
            tuple(r) for r in knn.training_triplets(
                corpus, queries, engine="two_phase").collect())
        want = sorted(
            tuple(r) for r in knn.training_triplets(
                corpus, queries, engine="window").collect())
        assert got == want and got


class TestPersistedMinerLabelScanPruning:
    @pytest.fixture()
    def store(self, spark, sf_small, tmp_path):
        from faiss_vector_search_spark import io as fio
        from faiss_vector_search_spark.operators import ivf

        emb = fio.load_table(spark, sf_small, "embeddings")
        path = str(tmp_path / "idx")
        ivf.save_ivf(emb, ivf.seeded_centroids(emb, nlist=8), path)
        return emb, path

    def _vector_scans_all_pruned(self, df) -> bool:
        import contextlib
        import io as pyio
        import re

        buf = pyio.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        text = buf.getvalue()
        # every scan of the index's vectors table must carry a
        # non-empty PartitionFilters (the probed-list prune)
        scans = [
            s for s in text.split("\n\n")
            if "/vectors" in s and "Location" in s
        ]
        assert scans, "no vectors scans found in the plan"
        return all(
            "PartitionFilters: [" in s
            and not re.search(r"PartitionFilters: \[\]", s)
            for s in scans
        )

    def test_hard_negatives_persisted_prunes_label_scan(self, spark, store):
        from faiss_vector_search_spark.operators import knn

        emb, path = store
        anchors = emb.where(F.col("vec_id") < 4).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
            F.col("label").alias("query_label"),
        )
        df = knn.hard_negatives_persisted(
            spark, path, anchors, k=3, nprobe=2)
        assert self._vector_scans_all_pruned(df)
        rows = df.collect()
        assert rows and all(r["rank"] <= 3 for r in rows)

    def test_training_triplets_persisted_prunes_label_scan(
        self, spark, store
    ):
        from faiss_vector_search_spark.operators import knn

        emb, path = store
        anchors = emb.where(F.col("vec_id") < 4).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
            F.col("label").alias("query_label"),
        )
        df = knn.training_triplets_persisted(
            spark, path, anchors, nprobe=2, pool=10)
        assert self._vector_scans_all_pruned(df)
        assert df.count() == 4


class TestAllNonSyncFragmentKeyframes:
    def test_all_non_sync_fragment_track_has_no_keyframes(self, spark):
        """moov declares zero samples; every fragment sample is
        explicitly non-sync -> mp4_sample_frames must report
        keyframe=False for every frame (the old empty-set sentinel
        read the empty merged set as "all sync")."""
        import struct

        from faiss_vector_search_spark.sources import mp4, multimodal

        def b(t, body):
            return struct.pack(">I", len(body) + 8) + t + body

        def full(t, flags, body):
            return b(t, struct.pack(">I", flags) + body)

        ftyp = b(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
        tkhd = full(b"tkhd", 7, b"\x00" * 8 + struct.pack(">I", 1)
                    + b"\x00" * 68)
        mdhd = full(b"mdhd", 0, struct.pack(">IIII", 0, 0, 1000, 0)
                    + b"\x00" * 4)
        hdlr = full(b"hdlr", 0, b"\x00" * 4 + b"vide" + b"\x00" * 12)
        stsd = full(b"stsd", 0, struct.pack(">I", 1)
                    + b(b"avc1", b"\x00" * 70))
        # empty sample tables: moov declares ZERO samples
        stts = full(b"stts", 0, struct.pack(">I", 0))
        stsc = full(b"stsc", 0, struct.pack(">I", 0))
        stsz = full(b"stsz", 0, struct.pack(">II", 0, 0))
        stco = full(b"stco", 0, struct.pack(">I", 0))
        stbl = b(b"stbl", stsd + stts + stsc + stsz + stco)
        minf = b(b"minf", stbl)
        mdia = b(b"mdia", mdhd + hdlr + minf)
        trak = b(b"trak", tkhd + mdia)
        mvhd = full(b"mvhd", 0, b"\x00" * 96)
        # trex defaults: duration 100, size 0, flags NON-sync
        trex = full(b"trex", 0, struct.pack(
            ">IIIII", 1, 1, 100, 0, 0x00010000))
        mvex = b(b"mvex", trex)
        moov = b(b"moov", mvhd + trak + mvex)

        samples = [b"AA", b"BB", b"CC"]
        mfhd = full(b"mfhd", 0, struct.pack(">I", 1))
        tfhd = full(b"tfhd", 0x20000, struct.pack(">I", 1))
        trun = full(
            b"trun", 0x201,
            struct.pack(">Ii", len(samples), 0)
            + b"".join(struct.pack(">I", len(s)) for s in samples),
        )
        moof = b(b"moof", mfhd + b(b"traf", tfhd + trun))
        doff = len(moof) + 8
        moof = b(b"moof", mfhd + b(b"traf", tfhd + full(
            b"trun", 0x201,
            struct.pack(">Ii", len(samples), doff)
            + b"".join(struct.pack(">I", len(s)) for s in samples),
        )))
        mdat = b(b"mdat", b"".join(samples))
        payload = ftyp + moov + moof + mdat

        (tr,) = mp4.mp4_demux(payload)
        assert tr["n_samples"] == 3
        assert tr["keyframes"] == set()
        assert tr["all_sync"] is False

        items = spark.createDataFrame(
            [(1, "video", payload, {})], multimodal.ITEM_SCHEMA)
        out = mp4.mp4_sample_frames(items, every_n=1).collect()
        assert [r.keyframe for r in out] == [False, False, False]

    def test_unfragmented_no_stss_still_all_sync(self, spark):
        """The no-stss moov convention (every sample sync) must keep
        working through the explicit all_sync flag."""
        from faiss_vector_search_spark.sources import mp4

        # reuse the suite's standard builder via the existing tests'
        # helper shape: simplest is a demux-level assertion on a
        # minimal unfragmented file without stss
        import struct

        def b(t, body):
            return struct.pack(">I", len(body) + 8) + t + body

        def full(t, flags, body):
            return b(t, struct.pack(">I", flags) + body)

        samples = [b"aa", b"bb"]
        ftyp = b(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
        tkhd = full(b"tkhd", 7, b"\x00" * 8 + struct.pack(">I", 1)
                    + b"\x00" * 68)
        mdhd = full(b"mdhd", 0, struct.pack(">IIII", 0, 0, 1000, 0)
                    + b"\x00" * 4)
        hdlr = full(b"hdlr", 0, b"\x00" * 4 + b"vide" + b"\x00" * 12)
        stsd = full(b"stsd", 0, struct.pack(">I", 1)
                    + b(b"avc1", b"\x00" * 70))
        stts = full(b"stts", 0, struct.pack(">III", 1, 2, 100))
        stsc = full(b"stsc", 0, struct.pack(">IIII", 1, 1, 2, 1))
        stsz = full(b"stsz", 0, struct.pack(">II", 0, 2)
                    + b"".join(struct.pack(">I", len(s)) for s in samples))
        # stco patched after assembly below
        probe = ftyp
        stco = full(b"stco", 0, struct.pack(">II", 1, 0))
        stbl = b(b"stbl", stsd + stts + stsc + stsz + stco)
        minf = b(b"minf", stbl)
        mdia = b(b"mdia", mdhd + hdlr + minf)
        trak = b(b"trak", tkhd + mdia)
        mvhd = full(b"mvhd", 0, b"\x00" * 96)
        moov = b(b"moov", mvhd + trak)
        mdat = b(b"mdat", b"".join(samples))
        payload = probe + moov + mdat
        off = len(probe) + len(moov) + 8
        payload = payload.replace(
            full(b"stco", 0, struct.pack(">II", 1, 0)),
            full(b"stco", 0, struct.pack(">II", 1, off)),
        )
        (tr,) = mp4.mp4_demux(payload)
        assert tr["all_sync"] is True
        assert tr["keyframes"] == set()
