"""Plumbing gates for the ingestion sources (SURVEY.md §2a #16/#17,
§2b #29): binaryFile scans, Arrow-batched decode operators, and the
build-from-dir pipeline — decode kernels injected as deterministic
fakes where the real libraries are absent from the container."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from faiss_vector_search_spark import io as fio
from faiss_vector_search_spark.sources import docx, multimodal, text_dir


@pytest.fixture(scope="module")
def text_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("txts")
    for i in range(6):
        body = "\n\n".join(
            f"file{i} para{j} " + "lorem word text data " * 12 for j in range(8)
        )
        (d / f"doc_{i}.txt").write_text(body)
    (d / "ignore.bin").write_bytes(b"\x00\x01")
    return str(d)


class TestTextDir:
    def test_read_text_dir(self, spark, text_files):
        df = text_dir.read_text_dir(spark, text_files).cache()
        assert df.count() == 6  # glob pruned the .bin
        row = df.orderBy("path").first()
        assert row.text.startswith("file0 para0")
        assert row.n_bytes == len(row.text.encode())
        assert df.select("doc_id").distinct().count() == 6

    def test_doc_ids_stable_across_reads(self, spark, text_files):
        a = {r.doc_id for r in text_dir.read_text_dir(spark, text_files).collect()}
        b = {r.doc_id for r in text_dir.read_text_dir(spark, text_files).collect()}
        assert a == b

    def test_build_index_from_dir(self, spark, text_files):
        idx = text_dir.build_index_from_dir(
            spark, text_files, dim=32, min_size=200, max_size=400, overlap=40
        ).cache()
        n = idx.count()
        assert n >= 12  # >1 chunk per doc
        assert idx.select("vec_id").distinct().count() == n
        assert set(idx.columns) == {
            "vec_id", "doc_id", "chunk_id", "chunk", "embedding",
        }
        norms = idx.select(
            F.aggregate(
                F.transform("embedding", lambda x: x * x),
                F.lit(0.0),
                lambda a, x: a + x,
            ).alias("n2")
        ).collect()
        assert all(abs(r.n2 - 1.0) < 1e-9 for r in norms)


def _make_docx(paragraphs) -> bytes:
    """Minimal valid OPC .docx built with stdlib zipfile only —
    independent of the decoder under test."""
    import io
    import zipfile

    ns = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    body = "".join(
        f"<w:p><w:r><w:t xml:space=\"preserve\">{p}</w:t></w:r></w:p>"
        for p in paragraphs
    )
    xml = (f'<?xml version="1.0" encoding="UTF-8"?>'
           f'<w:document xmlns:w="{ns}"><w:body>{body}</w:body></w:document>')
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("[Content_Types].xml", "<Types/>")
        z.writestr("word/document.xml", xml)
    return buf.getvalue()


class TestDocx:
    def test_stdlib_decoder_extracts_paragraphs(self):
        data = _make_docx(["Hello world", "", "Second paragraph"])
        assert docx.stdlib_docx_decoder(data) == \
            "Hello world\n\nSecond paragraph"

    def test_stdlib_decoder_handles_runs_tabs_breaks(self):
        import io
        import zipfile

        ns = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
        xml = (f'<w:document xmlns:w="{ns}"><w:body><w:p>'
               f'<w:r><w:t>a</w:t></w:r><w:r><w:tab/><w:t>b</w:t>'
               f'<w:br/><w:t>c</w:t></w:r></w:p></w:body></w:document>')
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            z.writestr("word/document.xml", xml)
        assert docx.stdlib_docx_decoder(buf.getvalue()) == "a\tb\nc"

    def test_default_decoder_is_functional_without_library(self):
        # python-docx is absent in this container: the default path
        # must fall through to the stdlib decoder and WORK
        data = _make_docx(["real decode"])
        assert docx.default_docx_decoder(data) == "real decode"

    def test_read_docx_dir_end_to_end_no_injection(self, spark, tmp_path):
        for i in range(3):
            (tmp_path / f"f{i}.docx").write_bytes(
                _make_docx([f"doc {i} first", f"doc {i} second"])
            )
        rows = docx.read_docx_dir(spark, str(tmp_path)).orderBy("path").collect()
        assert len(rows) == 3
        assert rows[1].text == "doc 1 first\n\ndoc 1 second"

    def test_read_docx_dir_with_injected_decoder(self, spark, tmp_path):
        for i in range(3):
            (tmp_path / f"f{i}.docx").write_bytes(f"RAW{i}".encode() * 10)
        (tmp_path / "other.txt").write_text("skip me")

        def fake_decoder(data: bytes) -> str:
            return f"decoded:{len(data)}"

        df = docx.read_docx_dir(spark, str(tmp_path), decoder=fake_decoder).cache()
        rows = df.orderBy("path").collect()
        assert len(rows) == 3
        assert all(r.text == f"decoded:{r.n_bytes}" for r in rows)
        assert len({r.doc_id for r in rows}) == 3


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (i, "image", bytes(range(256)) * (i + 1), {"src": f"img{i}"})
        for i in range(4)
    ]
    return spark.createDataFrame(rows, multimodal.ITEM_SCHEMA).cache()


class TestMultimodal:
    def test_read_media_dir(self, spark, tmp_path):
        for i in range(3):
            (tmp_path / f"a{i}.jpg").write_bytes(b"\xff\xd8" + bytes(100))
        df = multimodal.read_media_dir(spark, str(tmp_path), "image", "*.jpg")
        rows = df.collect()
        assert len(rows) == 3
        assert all(r.modality == "image" for r in rows)
        assert all(r.meta["n_bytes"] == "102" for r in rows)

    def test_decode_images_default_is_stubbed(self, spark, media):
        with pytest.raises(Exception) as exc_info:
            multimodal.decode_images(media).collect()
        assert "NotImplementedError" in str(exc_info.value) or isinstance(
            exc_info.value, NotImplementedError
        )

    def test_decode_images_with_fake_kernel(self, spark, media):
        def fake_kernel(payload: bytes):
            return len(payload) % 1000, len(payload) // 1000, 3

        out = multimodal.decode_images(media, kernel=fake_kernel)
        rows = {r.item_id: r for r in out.collect()}
        assert len(rows) == 4
        assert rows[1].width == 512 % 1000 and rows[1].channels == 3

    def test_extract_features_deterministic(self, spark, media):
        a = multimodal.extract_features(media, dim=16).orderBy("item_id").collect()
        b = multimodal.extract_features(media, dim=16).orderBy("item_id").collect()
        assert [r.features for r in a] == [r.features for r in b]
        for r in a:
            v = np.array(r.features)
            assert v.shape == (16,)
            assert abs(np.linalg.norm(v) - 1.0) < 1e-5

    def test_sample_frames_explode_shape(self, spark, media):
        out = multimodal.sample_frames(media, frame_bytes=256, every_n=2)
        rows = out.collect()
        # item i has 256*(i+1) bytes → i+1 frames → ceil((i+1)/2) sampled
        expect = sum((i + 1 + 1) // 2 for i in range(4))
        assert len(rows) == expect
        assert all(len(r.frame) == 256 for r in rows)
        assert all(r.frame_idx % 2 == 0 for r in rows)


class TestPipelineCompositions:
    def test_docx_to_index_pipeline(self, spark, tmp_path):
        """read_docx_dir → chunk → embed: the reference's
        process_docx_files + IndexManager.build flow end-to-end with an
        injected decoder."""
        from faiss_vector_search_spark.operators import chunking, embed

        for i in range(3):
            (tmp_path / f"r{i}.docx").write_bytes(f"PAYLOAD{i}".encode() * 40)

        def decoder(data: bytes) -> str:
            return "\n\n".join(
                f"para {j} " + data[:24].decode(errors="replace") for j in range(6)
            )

        docs = docx.read_docx_dir(spark, str(tmp_path), decoder=decoder)
        chunks = chunking.chunk_greedy(
            docs, min_size=40, max_size=120, overlap=10
        )
        keyed = chunks.select(
            (F.col("doc_id") * 1000 + F.col("chunk_id")).alias("vec_id"),
            F.col("chunk").alias("text"),
        )
        vecs = embed.embed_documents(keyed, dim=32, id_col="vec_id")
        rows = vecs.collect()
        assert len(rows) >= 3
        assert all(len(r.embedding) == 32 for r in rows)

    def test_multimodal_features_feed_lsh_dedup(self, spark):
        """extract_features output plugs straight into the embedding
        near-dup operator: byte-identical payloads must collide."""
        from faiss_vector_search_spark.operators import lsh

        payloads = [bytes(range(256)) * 4, bytes(range(256)) * 4,
                    bytes(reversed(range(256))) * 3, b"\x01\x02" * 300]
        items = spark.createDataFrame(
            [(i, "image", p, {}) for i, p in enumerate(payloads)],
            multimodal.ITEM_SCHEMA,
        )
        feats = multimodal.extract_features(items, dim=16).select(
            F.col("item_id").alias("vec_id"),
            F.col("features").alias("embedding"),
        )
        pairs = lsh.near_dup_lsh(
            feats, threshold=0.999, dim=16, n_tables=8, n_bits=2
        ).collect()
        assert {(r.id_a, r.id_b) for r in pairs} >= {(0, 1)}


class TestJsonl:
    def _write(self, tmp_path):
        lines = [
            '{"doc_id": 1, "text": "hello world", "lang": "en", "source": "web", "meta": {"k": "v"}}',
            '{"doc_id": 2, "text": "bonjour", "lang": "fr", "source": "web"}',
            'this is not json at all',
            '{"doc_id": 4, "text": "ok", "lang": "en", "source": "books", "meta": {}}',
        ]
        p = tmp_path / "docs.jsonl"
        p.write_text("\n".join(lines))
        return str(p)

    def test_read_jsonl_parses_and_quarantines(self, spark, tmp_path):
        from faiss_vector_search_spark.sources import jsonl

        df = jsonl.read_jsonl(spark, self._write(tmp_path))
        clean, bad = jsonl.split_corrupt(df)
        assert clean.count() == 3
        assert {r.doc_id for r in clean.collect()} == {1, 2, 4}
        assert bad.count() == 1
        assert "not json" in bad.first().bad_line

    def test_jsonl_roundtrip(self, spark, tmp_path):
        from faiss_vector_search_spark.sources import jsonl

        df = jsonl.read_jsonl(spark, self._write(tmp_path))
        clean, _ = jsonl.split_corrupt(df)
        out = str(tmp_path / "out")
        jsonl.write_jsonl(clean.select("doc_id", "text", "lang"), out)
        back = spark.read.schema("doc_id bigint, text string, lang string").json(out)
        assert {(r.doc_id, r.text) for r in back.collect()} == {
            (r.doc_id, r.text) for r in clean.collect()
        }

    def test_jsonl_feeds_the_engine(self, spark, tmp_path):
        """Ingested JSONL flows straight into the operator surface."""
        from faiss_vector_search_spark.operators import textstats
        from faiss_vector_search_spark.sources import jsonl

        clean, _ = jsonl.split_corrupt(
            jsonl.read_jsonl(spark, self._write(tmp_path))
        )
        out = textstats.token_count(clean)
        assert out.count() == 3


class TestPythonDataSource:
    """Spark 4 Python DataSource connector (sources/pydatasource.py):
    partition-parallel synthetic events with source-side pushdown."""

    @staticmethod
    def _read(spark, **opts):
        from faiss_vector_search_spark.sources import pydatasource

        pydatasource.register(spark)
        r = spark.read.format("synthetic_events")
        for k, v in opts.items():
            r = r.option(k, v)
        return r.load()

    def test_deterministic_and_partition_count_independent(self, spark):
        a = self._read(spark, rows=1500, partitions=8)
        b = self._read(spark, rows=1500, partitions=3)
        assert a.count() == b.count() == 1500
        assert a.rdd.getNumPartitions() == 8
        ra = sorted((r.event_id, r.event_type, r.value) for r in a.collect())
        rb = sorted((r.event_id, r.event_type, r.value) for r in b.collect())
        assert ra == rb

    def test_equality_filter_pushed_into_source(self, spark):
        df = self._read(spark, rows=1000).where("event_type = 'click'")
        plan = df._jdf.queryExecution().executedPlan().toString()
        filter_lines = [l for l in plan.splitlines() if "Filter " in l]
        # only the null guard survives; the equality ran at the source
        assert all("click" not in l for l in filter_lines)
        full = self._read(spark, rows=1000).collect()
        want = sorted(r.event_id for r in full if r.event_type == "click")
        assert sorted(r.event_id for r in df.collect()) == want

    def test_unsupported_filter_stays_in_plan(self, spark):
        df = self._read(spark, rows=1000).where("value > 50.0")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert any(
            "50.0" in l for l in plan.splitlines() if "Filter" in l
        )  # Spark still evaluates what the source declined
        assert all(r.value > 50.0 for r in df.collect())


class TestLoadTableSessionHygiene:
    """load_table must not mutate session-global conf (the UTC /
    nanosAsLong contract is pinned once at session build by
    session.get_spark); a loader that flips session settings makes a
    foreign caller's behavior depend on load order."""

    def test_load_table_leaves_session_conf_untouched(self, spark, sf_small):
        key = "spark.sql.session.timeZone"
        before = spark.conf.get(key)
        try:
            spark.conf.set(key, "America/New_York")
            fio.load_table(spark, sf_small, "documents")  # plan only
            assert spark.conf.get(key) == "America/New_York"
        finally:
            spark.conf.set(key, before)

    def test_factory_session_pins_the_timestamp_contract(self, spark):
        # the shared fixture session comes from session.get_spark()
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        assert (
            spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"
        )

    def test_path_exists_hadoop_fs(self, spark, tmp_path, sf_small):
        assert fio.path_exists(spark, f"{sf_small}/documents.parquet")
        assert not fio.path_exists(spark, str(tmp_path / "nope"))
        # URI-schemed local path resolves through the same FS API
        assert fio.path_exists(spark, f"file://{sf_small}/documents.parquet")

    def test_timestamps_read_as_utc_instants(self, spark, sf_small):
        import duckdb

        got = (
            fio.load_table(spark, sf_small, "events")
            .select(F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss"))
            .first()[0]
        )
        want = duckdb.sql(
            f"SELECT strftime(min(ts), '%Y-%m-%d %H:%M:%S') "
            f"FROM '{sf_small}/events.parquet'"
        ).fetchone()[0]
        assert got == want


class TestBuiltinCodecs:
    """The pure-numpy BMP/WAV codecs (public struct layouts, no
    library): real decode in this container, upgrading the decode
    stubs to functional operators for these formats."""

    def _bmp_bytes_reference(self):
        """Hand-packed 3x2 24bpp BMP, bottom-up, stride padded 9->12.
        Built with struct only — independent of bmp_encode."""
        import struct

        # image rows top-to-bottom: row0 = red,green,blue; row1 = 3x gray
        # BMP stores BGR bottom-up: file row0 = image row1
        px_row1 = bytes([128, 128, 128] * 3) + b"\x00\x00\x00"
        px_row0 = bytes([0, 0, 255, 0, 255, 0, 255, 0, 0]) + b"\x00\x00\x00"
        data = px_row1 + px_row0
        header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
        header += struct.pack("<IiiHHIIiiII", 40, 3, 2, 1, 24, 0,
                              len(data), 2835, 2835, 0, 0)
        return header + data

    def test_bmp_decode_hand_packed_reference(self):
        img = multimodal.bmp_decode(self._bmp_bytes_reference())
        assert img.shape == (2, 3, 3)
        # row 0 after un-flip: red,green,blue in BGR storage order
        assert img[0, 0].tolist() == [0, 0, 255]     # red as BGR
        assert img[0, 1].tolist() == [0, 255, 0]
        assert img[0, 2].tolist() == [255, 0, 0]
        assert (img[1] == 128).all()

    @pytest.mark.parametrize("shape", [(2, 3, 3), (5, 5, 1), (4, 2, 4)])
    def test_bmp_roundtrip(self, shape):
        import numpy as np

        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        out = multimodal.bmp_decode(multimodal.bmp_encode(img))
        assert (out == img).all()

    def test_bmp_rejects_non_bmp(self):
        with pytest.raises(ValueError, match="not a BMP"):
            multimodal.bmp_decode(b"\xff\xd8" + bytes(100))

    def test_decode_images_works_on_bmp_without_kernel(self, spark):
        import numpy as np

        rng = np.random.default_rng(3)
        rows = [
            (i, "image",
             multimodal.bmp_encode(
                 rng.integers(0, 256, size=(4 + i, 6, 3), dtype=np.uint8)),
             {})
            for i in range(3)
        ]
        items = spark.createDataFrame(rows, multimodal.ITEM_SCHEMA)
        out = {r.item_id: r for r in multimodal.decode_images(items).collect()}
        assert len(out) == 3
        for i in range(3):
            assert (out[i].width, out[i].height, out[i].channels) == (6, 4 + i, 3)

    def test_resize_images_nearest_neighbor(self, spark):
        import numpy as np

        img = np.zeros((4, 4, 3), dtype=np.uint8)
        img[:2, 2:] = 50   # quadrants
        img[2:, :2] = 150
        img[2:, 2:] = 250
        items = spark.createDataFrame(
            [(1, "image", multimodal.bmp_encode(img), {})],
            multimodal.ITEM_SCHEMA,
        )
        row = multimodal.resize_images(items, 2, 2).collect()[0]
        assert (row.width, row.height) == (2, 2)
        small = multimodal.bmp_decode(bytes(row.payload))
        assert small[0, 0].tolist() == [0, 0, 0]
        assert small[0, 1].tolist() == [50, 50, 50]
        assert small[1, 0].tolist() == [150, 150, 150]
        assert small[1, 1].tolist() == [250, 250, 250]

    def _wav_bytes(self, rate=8000, n_ch=1, amp=16384, n=8000):
        import struct

        import numpy as np

        t = np.arange(n)
        samples = (amp * np.sin(2 * np.pi * 440 * t / rate)).astype("<i2")
        if n_ch == 2:
            samples = np.repeat(samples, 2)
        data = samples.tobytes()
        fmt = struct.pack("<HHIIHH", 1, n_ch, rate, rate * 2 * n_ch,
                          2 * n_ch, 16)
        return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
                + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(data)) + data)

    def test_wav_decode_and_audio_stats(self, spark):
        items = spark.createDataFrame(
            [(1, "audio", self._wav_bytes(), {}),
             (2, "audio", self._wav_bytes(rate=16000, n_ch=2, n=4000), {})],
            multimodal.ITEM_SCHEMA,
        )
        out = {r.item_id: r for r in multimodal.audio_stats(items).collect()}
        assert out[1].sample_rate == 8000 and out[1].n_channels == 1
        assert out[1].n_frames == 8000 and out[1].duration_sec == 1.0
        # sine rms = amp/sqrt(2) in [-1,1] units = 0.3536
        assert abs(out[1].rms - 16384 / 32768 / 2 ** 0.5) < 0.01
        assert out[2].sample_rate == 16000 and out[2].n_channels == 2
        assert out[2].duration_sec == 0.25

    def test_wav_rejects_malformed(self):
        with pytest.raises(ValueError, match="not a WAV"):
            multimodal.wav_decode(b"OggS" + bytes(50))
        with pytest.raises(ValueError, match="missing fmt/data"):
            multimodal.wav_decode(b"RIFF\x04\x00\x00\x00WAVE")


class TestPngCodec:
    def _png_reference_decode(self, payload):
        """Slow pure-Python per-byte reference unfilter."""
        import struct
        import zlib

        pos, idat, meta = 8, [], None
        while pos + 8 <= len(payload):
            ln, ctype = struct.unpack_from(">I4s", payload, pos)
            body = payload[pos + 8:pos + 8 + ln]
            if ctype == b"IHDR":
                meta = struct.unpack(">IIBBBBB", body)
            elif ctype == b"IDAT":
                idat.append(body)
            pos += 12 + ln
        w, h, _, color, _, _, _ = meta
        ch = {0: 1, 2: 3, 6: 4}[color]
        raw = zlib.decompress(b"".join(idat))
        stride = 1 + w * ch
        out = []
        for y in range(h):
            row = raw[y * stride:(y + 1) * stride]
            f, line = row[0], list(row[1:])
            prev = out[y - 1] if y else [0] * len(line)
            rec = []
            for i, x in enumerate(line):
                a = rec[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                if f == 0: pred = 0
                elif f == 1: pred = a
                elif f == 2: pred = b
                elif f == 3: pred = (a + b) >> 1
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec.append((x + pred) & 0xFF)
            out.append(rec)
        import numpy as np

        return np.array(out, dtype=np.uint8).reshape(h, w, ch)

    def _png_with_filters(self, img, filters):
        """Encode with a CHOSEN filter per row (deltas computed by
        inverting the reference predictor), to exercise every type."""
        import struct
        import zlib

        import numpy as np

        h, w, ch = img.shape
        flat = img.reshape(h, w * ch).astype(int)
        lines = []
        for y, f in zip(range(h), filters):
            prev = flat[y - 1] if y else np.zeros(w * ch, dtype=int)
            cur = flat[y]
            line = []
            for i in range(w * ch):
                a = cur[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                if f == 0: pred = 0
                elif f == 1: pred = a
                elif f == 2: pred = b
                elif f == 3: pred = (a + b) >> 1
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line.append((cur[i] - pred) & 0xFF)
            lines.append(bytes([f]) + bytes(line))
        def chunk(ctype, body):
            return (struct.pack(">I", len(body)) + ctype + body
                    + struct.pack(">I", zlib.crc32(ctype + body)))
        ihdr = struct.pack(">IIBBBBB", w, h, 8, {1: 0, 3: 2, 4: 6}[ch], 0, 0, 0)
        return (multimodal.PNG_SIG + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(b"".join(lines)))
                + chunk(b"IEND", b""))

    @pytest.mark.parametrize("shape", [(3, 4, 3), (5, 2, 1), (2, 2, 4)])
    def test_roundtrip_filter0(self, shape):
        import numpy as np

        img = np.random.default_rng(5).integers(0, 256, shape, dtype=np.uint8)
        assert (multimodal.png_decode(multimodal.png_encode(img)) == img).all()

    def test_all_filter_types_match_reference(self):
        import numpy as np

        img = np.random.default_rng(9).integers(0, 256, (5, 6, 3), dtype=np.uint8)
        payload = self._png_with_filters(img, [0, 1, 2, 3, 4])
        got = multimodal.png_decode(payload)
        assert (got == img).all()
        assert (got == self._png_reference_decode(payload)).all()

    def test_decode_images_and_resize_on_png(self, spark):
        import numpy as np

        img = np.random.default_rng(4).integers(0, 256, (8, 6, 3), dtype=np.uint8)
        items = spark.createDataFrame(
            [(1, "image", multimodal.png_encode(img), {})],
            multimodal.ITEM_SCHEMA,
        )
        d = multimodal.decode_images(items).collect()[0]
        assert (d.width, d.height, d.channels) == (6, 8, 3)
        r = multimodal.resize_images(items, 3, 4).collect()[0]
        small = multimodal.png_decode(bytes(r.payload))
        assert small.shape == (4, 3, 3)
        # nearest-neighbor: every output pixel exists in the input
        assert (small == img[::2, ::2]).all()

    def test_rejects_unsupported(self):
        with pytest.raises(ValueError, match="not a PNG"):
            multimodal.png_decode(b"GIF89a" + bytes(50))


class TestJpegCodec:
    """Baseline JPEG (ITU-T T.81 SOF0, pure numpy+stdlib — r5 verdict
    ask #6): the decoder is gated against the module's independent
    encoder (a separate implementation of the bit layout), round-trips
    at quant=1 being exact up to DCT/color rounding."""

    def _rng(self, seed=0):
        import numpy as np

        return np.random.default_rng(seed)

    def test_gray_roundtrip_near_lossless(self):
        import numpy as np
        from faiss_vector_search_spark.sources import jpeg

        img = self._rng(1).integers(0, 256, (24, 17, 1), dtype=np.uint8)
        dec = jpeg.jpeg_decode(jpeg.jpeg_encode(img, quant=1))
        assert dec.shape == (24, 17, 1)
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 1

    def test_rgb_roundtrip_near_lossless(self):
        import numpy as np
        from faiss_vector_search_spark.sources import jpeg

        img = self._rng(2).integers(0, 256, (16, 16, 3), dtype=np.uint8)
        dec = jpeg.jpeg_decode(jpeg.jpeg_encode(img, quant=1))
        assert dec.shape == (16, 16, 3)
        # DCT rounding + YCbCr<->RGB rounding: within 2 levels per px
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2

    def test_non_multiple_of_8_dims_crop_exactly(self):
        import numpy as np
        from faiss_vector_search_spark.sources import jpeg

        img = self._rng(3).integers(0, 256, (11, 13, 3), dtype=np.uint8)
        dec = jpeg.jpeg_decode(jpeg.jpeg_encode(img, quant=1))
        assert dec.shape == (11, 13, 3)
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2

    def test_420_subsampling_decodes_smooth_image(self):
        import numpy as np
        from faiss_vector_search_spark.sources import jpeg

        yy, xx = np.mgrid[0:32, 0:24]
        smooth = np.stack(
            [np.clip(yy * 4, 0, 255), np.clip(xx * 5, 0, 255),
             np.clip(yy + xx, 0, 255)], axis=-1
        ).astype(np.uint8)
        dec = jpeg.jpeg_decode(jpeg.jpeg_encode(smooth, quant=1,
                                                subsample=True))
        assert dec.shape == (32, 24, 3)
        # luma is full-res (tight); chroma is 2x2-averaged + replicated
        err = np.abs(dec.astype(int) - smooth.astype(int))
        assert err.mean() < 4.0
        assert err.max() <= 24  # bounded by the chroma gradient step

    def test_quantization_is_lossy_but_bounded(self):
        import numpy as np
        from faiss_vector_search_spark.sources import jpeg

        img = self._rng(4).integers(0, 256, (16, 16, 1), dtype=np.uint8)
        dec = jpeg.jpeg_decode(jpeg.jpeg_encode(img, quant=16))
        # flat q=16: error bounded by half a step through the IDCT
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 64
        assert len(jpeg.jpeg_encode(img, quant=16)) < len(
            jpeg.jpeg_encode(img, quant=1))

    def test_rejects_arithmetic_and_non_jpeg(self):
        import struct

        import pytest as _pytest
        from faiss_vector_search_spark.sources import jpeg

        with _pytest.raises(ValueError, match="not a JPEG"):
            jpeg.jpeg_decode(b"GIF89a" + bytes(50))
        # SOF9 (arithmetic sequential) stays rejected with a clear error
        sof9 = (b"\xff\xd8" + b"\xff\xc9"
                + struct.pack(">H", 11)
                + struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
        with _pytest.raises(ValueError, match="arithmetic"):
            jpeg.jpeg_decode(sof9 + b"\xff\xd9")

    def test_progressive_decodes_identical_to_baseline(self):
        """The progressive (SOF2) decode path, gated against the
        module's independent progressive encoder: for the same image
        and quantizer, decode(progressive) must equal
        decode(baseline) EXACTLY — both reconstruct the same
        quantized coefficients, just staged differently."""
        import numpy as np
        from faiss_vector_search_spark.sources import jpeg

        cases = [
            # flat: every AC band empty -> multi-block EOB runs
            (np.full((40, 56, 3), 130, np.uint8), 2, False),
            # hot pixel far into the image: ZRL + isolated coefs
            (None, 1, False),
            # noisy + strong quant: EOB runs + refinement bits mixed
            (self._rng(11).normal(128, 40, (64, 80, 3))
             .clip(0, 255).astype(np.uint8), 8, False),
            # 4:2:0: non-interleaved AC grids differ from the padded
            # interleaved grid per component
            (self._rng(12).normal(128, 40, (30, 42, 3))
             .clip(0, 255).astype(np.uint8), 4, True),
            # grayscale: single-component (non-interleaved DC too)
            (self._rng(13).integers(0, 256, (19, 21, 1), np.uint8)
             .astype(np.uint8), 2, False),
        ]
        hot = np.full((48, 64, 1), 128, np.uint8)
        hot[37, 53] = 255
        cases[1] = (hot, 1, False)
        for img, q, sub in cases:
            base = jpeg.jpeg_decode(
                jpeg.jpeg_encode(img, quant=q, subsample=sub))
            prog = jpeg.jpeg_decode(
                jpeg.jpeg_encode_progressive(img, quant=q, subsample=sub))
            assert np.array_equal(base, prog), (img.shape, q, sub)

    def test_progressive_roundtrip_near_lossless(self):
        import numpy as np
        from faiss_vector_search_spark.sources import jpeg

        img = self._rng(21).integers(0, 256, (24, 17, 3), dtype=np.uint8)
        enc = jpeg.jpeg_encode_progressive(img, quant=1)
        assert b"\xff\xc2" in enc  # really SOF2
        dec = jpeg.jpeg_decode(enc)
        assert dec.shape == (24, 17, 3)
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2

    def test_decode_images_and_resize_on_jpeg(self, spark):
        import numpy as np
        from faiss_vector_search_spark.sources import jpeg

        img = self._rng(5).integers(0, 256, (16, 12, 3), dtype=np.uint8)
        items = spark.createDataFrame(
            [(1, "image", jpeg.jpeg_encode(img, quant=1), {})],
            multimodal.ITEM_SCHEMA,
        )
        d = multimodal.decode_images(items).collect()[0]
        assert (d.width, d.height, d.channels) == (12, 16, 3)
        r = multimodal.resize_images(items, 6, 8).collect()[0]
        small = jpeg.jpeg_decode(bytes(r.payload))
        assert small.shape == (8, 6, 3)
        # nearest-neighbor resample of a near-lossless decode: each
        # output pixel within codec rounding of its source pixel
        err = np.abs(small.astype(int) - img[::2, ::2].astype(int))
        assert err.max() <= 4


class TestMp4Demux:
    """Pure-stdlib ISO-BMFF demux gated on a hand-packed MP4: sample
    byte ranges, timestamps, chunk mapping (stsc runs), keyframes,
    and the Spark frame-sampling operator."""

    @staticmethod
    def _box(btype: bytes, body: bytes) -> bytes:
        import struct

        return struct.pack(">I", len(body) + 8) + btype + body

    def _build(self):
        """2 tracks: video (5 samples in chunks of 3+2, stss [1,4])
        and audio (2 samples, 1 chunk). Returns (payload, vid_samples)
        where vid_samples = the exact coded bytes per video sample."""
        import struct

        b = self._box
        vid = [bytes([0xA0 + i]) * (10 + i) for i in range(5)]
        aud = [b"\x01\x02\x03", b"\x04\x05"]
        ftyp = b(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isomiso2")
        data = b"".join(vid) + b"".join(aud)
        mdat = b(b"mdat", data)
        base = len(ftyp) + 8  # first byte of mdat data
        v_chunk1 = base
        v_chunk2 = base + sum(len(s) for s in vid[:3])
        a_chunk1 = base + sum(len(s) for s in vid)

        def full(btype, body):
            return b(btype, b"\x00\x00\x00\x00" + body)

        def stbl(codec, sizes, stts_runs, stsc_runs, chunk_offs, stss=None):
            boxes = [
                full(b"stsd", struct.pack(">I", 1)
                     + struct.pack(">I", 16) + codec + bytes(8)),
                full(b"stts", struct.pack(">I", len(stts_runs))
                     + b"".join(struct.pack(">II", *r) for r in stts_runs)),
                full(b"stsc", struct.pack(">I", len(stsc_runs))
                     + b"".join(struct.pack(">III", *r) for r in stsc_runs)),
                full(b"stsz", struct.pack(">III", 0, len(sizes), 0)[:8]
                     + struct.pack(f">{len(sizes)}I", *sizes)),
                full(b"stco", struct.pack(">I", len(chunk_offs))
                     + b"".join(struct.pack(">I", o) for o in chunk_offs)),
            ]
            if stss:
                boxes.append(full(b"stss", struct.pack(">I", len(stss))
                                  + b"".join(struct.pack(">I", s)
                                             for s in stss)))
            return b(b"stbl", b"".join(boxes))

        def trak(tid, handler, timescale, st):
            tkhd = full(b"tkhd", struct.pack(">IIII", 0, 0, tid, 0))
            mdhd = full(b"mdhd", struct.pack(">IIII", 0, 0, timescale, 0))
            hdlr = full(b"hdlr", struct.pack(">I", 0) + handler + bytes(13))
            minf = b(b"minf", st)
            mdia = b(b"mdia", mdhd + hdlr + minf)
            return b(b"trak", tkhd + mdia)

        v_st = stbl(b"avc1", [len(s) for s in vid], [(5, 100)],
                    [(1, 3, 1), (2, 2, 1)], [v_chunk1, v_chunk2],
                    stss=[1, 4])
        a_st = stbl(b"mp4a", [len(s) for s in aud], [(2, 1024)],
                    [(1, 2, 1)], [a_chunk1])
        moov = b(b"moov", trak(1, b"vide", 1000, v_st)
                 + trak(2, b"soun", 44100, a_st))
        return ftyp + mdat + moov, vid, aud

    def test_demux_sample_tables(self):
        from faiss_vector_search_spark.sources import mp4

        payload, vid, aud = self._build()
        tracks = {t["track_id"]: t for t in mp4.mp4_demux(payload)}
        v = tracks[1]
        assert (v["handler"], v["codec"], v["timescale"]) == \
            ("vide", "avc1", 1000)
        assert v["n_samples"] == 5
        # byte ranges recover the EXACT coded samples across the
        # 3+2 chunk split
        got = [payload[o:o + s] for o, s, _ in v["samples"]]
        assert got == vid
        assert [d for _, _, d in v["samples"]] == [0, 100, 200, 300, 400]
        assert v["keyframes"] == {1, 4}
        a = tracks[2]
        assert a["handler"] == "soun" and a["n_samples"] == 2
        assert [payload[o:o + s] for o, s, _ in a["samples"]] == aud

    def test_rejects_non_mp4_and_inconsistent_tables(self):
        import struct

        import pytest as _pytest
        from faiss_vector_search_spark.sources import mp4

        with _pytest.raises(ValueError, match="not an MP4"):
            mp4.mp4_demux(b"RIFF" + bytes(50))
        # stsz declaring MORE samples than the chunk tables cover must
        # fail with the module's malformed-file posture at demux time,
        # not as an IndexError inside a frame-sampling task
        payload, vid, _ = self._build()
        six = payload.replace(
            struct.pack(">III", 0, 5, 0)[:8]
            + struct.pack(">5I", *[len(s) for s in vid]),
            struct.pack(">III", 0, 6, 0)[:8]
            + struct.pack(">5I", *[len(s) for s in vid])[:20],
        )
        assert six != payload  # the splice actually hit
        with _pytest.raises(ValueError, match="sample-count mismatch"):
            mp4.mp4_demux(six)

    def _build_fragmented(self):
        """Hand-packed DASH-style fMP4: moov with EMPTY sample tables
        + mvex/trex defaults (dur=100, flags=non-sync), then two
        moof+mdat fragments exercising the two base-offset modes:

        frag 1 — tfhd default-base-is-moof, tfdt v0 t=0, trun with
        explicit data-offset + first-sample-flags (sync) + per-sample
        sizes [10, 11, 12];
        frag 2 — tfhd explicit base-data-offset + default size 9 +
        default flags sync, tfdt v1 (64-bit) t=300, trun with
        per-sample durations [50, 60] and a data-offset of 8
        (mdat body relative to the explicit base = the moof start).

        Returns (payload, coded_samples, expected_dts).
        """
        import struct

        b = self._box

        def full(btype, body, version=0):
            return b(btype, bytes([version, 0, 0, 0]) + body)

        def full_flags(btype, flags, body, version=0):
            return b(btype, struct.pack(">I", (version << 24) | flags)
                     + body)

        # moov: one video track, empty tables, trex defaults
        def stbl_empty(codec):
            return b(b"stbl", b"".join([
                full(b"stsd", struct.pack(">I", 1)
                     + struct.pack(">I", 16) + codec + bytes(8)),
                full(b"stts", struct.pack(">I", 0)),
                full(b"stsc", struct.pack(">I", 0)),
                full(b"stsz", struct.pack(">II", 0, 0)),
                full(b"stco", struct.pack(">I", 0)),
            ]))

        tkhd = full(b"tkhd", struct.pack(">IIII", 0, 0, 1, 0))
        mdhd = full(b"mdhd", struct.pack(">IIII", 0, 0, 1000, 0))
        hdlr = full(b"hdlr", struct.pack(">I", 0) + b"vide" + bytes(13))
        trak = b(b"trak", tkhd + b(b"mdia", mdhd + hdlr
                                   + b(b"minf", stbl_empty(b"avc1"))))
        # trex body: track_id, desc_idx, dur, size, flags (non-sync)
        trex = full(b"trex", struct.pack(">IIIII", 1, 1, 100, 0,
                                         0x00010000))
        moov = b(b"moov", trak + b(b"mvex", trex))
        ftyp = b(b"ftyp", b"isom" + struct.pack(">I", 0) + b"iso6")

        s1 = [bytes([0xB0 + i]) * (10 + i) for i in range(3)]   # 10,11,12
        s2 = [bytes([0xC0 + i]) * 9 for i in range(2)]

        # ---- fragment 1: default-base-is-moof ----
        mfhd = full(b"mfhd", struct.pack(">I", 1))
        tfhd1 = full_flags(b"tfhd", 0x20000, struct.pack(">I", 1))
        tfdt1 = full(b"tfdt", struct.pack(">I", 0), version=0)
        # trun: data-offset | first-sample-flags | sample-size
        trun1_body = struct.pack(">I", 3)           # sample_count
        trun1_body += struct.pack(">i", 0)          # data offset (patched)
        trun1_body += struct.pack(">I", 0x0)        # first flags: SYNC
        trun1_body += b"".join(struct.pack(">I", len(s)) for s in s1)
        trun1 = full_flags(b"trun", 0x1 | 0x4 | 0x200, trun1_body)
        traf1 = b(b"traf", tfhd1 + tfdt1 + trun1)
        moof1 = b(b"moof", mfhd + traf1)
        # data offset = moof size + mdat header (8) from moof start
        doff1 = len(moof1) + 8
        trun1 = full_flags(
            b"trun", 0x1 | 0x4 | 0x200,
            struct.pack(">I", 3) + struct.pack(">i", doff1)
            + struct.pack(">I", 0x0)
            + b"".join(struct.pack(">I", len(s)) for s in s1))
        moof1 = b(b"moof", mfhd + b(b"traf", tfhd1 + tfdt1 + trun1))
        mdat1 = b(b"mdat", b"".join(s1))

        # ---- fragment 2: explicit base-data-offset ----
        base2 = len(ftyp) + len(moov) + len(moof1) + len(mdat1)
        tfhd2 = full_flags(
            b"tfhd", 0x1 | 0x10 | 0x20,
            struct.pack(">I", 1) + struct.pack(">Q", base2)
            + struct.pack(">I", 9) + struct.pack(">I", 0x0))  # size 9, SYNC
        tfdt2 = full(b"tfdt", struct.pack(">Q", 300), version=1)
        trun2_body = struct.pack(">I", 2)
        trun2_body += struct.pack(">i", 0)  # patched below
        trun2_body += b"".join(struct.pack(">I", d) for d in (50, 60))
        trun2 = full_flags(b"trun", 0x1 | 0x100, trun2_body)
        moof2 = b(b"moof", mfhd + b(b"traf", tfhd2 + tfdt2 + trun2))
        doff2 = len(moof2) + 8  # mdat body relative to base2 (=moof2 start)
        trun2 = full_flags(
            b"trun", 0x1 | 0x100,
            struct.pack(">I", 2) + struct.pack(">i", doff2)
            + b"".join(struct.pack(">I", d) for d in (50, 60)))
        moof2 = b(b"moof", mfhd + b(b"traf", tfhd2 + tfdt2 + trun2))
        mdat2 = b(b"mdat", b"".join(s2))

        payload = ftyp + moov + moof1 + mdat1 + moof2 + mdat2
        return payload, s1 + s2, [0, 100, 200, 300, 350]

    def test_fragmented_demux(self):
        from faiss_vector_search_spark.sources import mp4

        payload, coded, dts = self._build_fragmented()
        (tr,) = mp4.mp4_demux(payload)
        assert (tr["track_id"], tr["handler"], tr["codec"]) == \
            (1, "vide", "avc1")
        assert tr["n_samples"] == 5
        assert [payload[o:o + s] for o, s, _ in tr["samples"]] == coded
        assert [d for _, _, d in tr["samples"]] == dts
        # sync flags: frag1 first-sample-flags marks sample 1 sync,
        # samples 2-3 inherit the trex non-sync default; frag2's tfhd
        # default flags mark samples 4-5 sync
        assert tr["keyframes"] == {1, 4, 5}

    def test_fragmented_spark_sampling_and_encrypted_rejection(self, spark):
        import pytest as _pytest
        from faiss_vector_search_spark.sources import mp4

        payload, coded, dts = self._build_fragmented()
        items = spark.createDataFrame(
            [(7, "video", payload, {})], multimodal.ITEM_SCHEMA
        )
        out = mp4.mp4_sample_frames(items, every_n=2).collect()
        assert [(r.frame_idx, bytes(r.frame)) for r in out] == \
            [(0, coded[0]), (2, coded[2]), (4, coded[4])]
        assert [r.dts for r in out] == [dts[0], dts[2], dts[4]]
        assert [r.keyframe for r in out] == [True, False, True]
        # a senc box in any traf = CENC-encrypted fragment -> clear error
        enc = payload.replace(
            b"tfdt", b"senc", 1  # first traf's tfdt becomes a senc box
        )
        with _pytest.raises(ValueError, match="encrypted fMP4"):
            mp4.mp4_demux(enc)

    def test_spark_frame_sampling(self, spark):
        from faiss_vector_search_spark.sources import mp4

        payload, vid, aud = self._build()
        items = spark.createDataFrame(
            [(1, "video", payload, {})], multimodal.ITEM_SCHEMA
        )
        out = mp4.mp4_sample_frames(items, every_n=2).collect()
        # video samples 0, 2, 4 (every 2nd); audio track filtered out
        assert [(r.frame_idx, bytes(r.frame)) for r in out] == \
            [(0, vid[0]), (2, vid[2]), (4, vid[4])]
        assert all(r.track_id == 1 for r in out)
        assert [r.dts for r in out] == [0, 200, 400]
        # stss [1,4]: 1-based samples 1 and 4 -> 0-based idx 0 is key,
        # 2 is not, 4 is not (sample 4 is 0-based 3)
        assert [r.keyframe for r in out] == [True, False, False]

    def test_multi_traf_implicit_base_and_trex_sync_default(self):
        """ISO 14496-12 §8.8.7: with neither base-data-offset nor
        default-base-is-moof set, the FIRST traf of a moof anchors at
        the moof start and each LATER traf anchors at the END of the
        previous traf's data. Also: a track whose sync flags come
        ONLY from the trex defaults (no tfhd/trun flag boxes) must
        still surface its fragment keyframes."""
        import struct

        from faiss_vector_search_spark.sources import mp4

        b = self._box

        def full(btype, body, version=0):
            return b(btype, bytes([version, 0, 0, 0]) + body)

        def full_flags(btype, flags, body, version=0):
            return b(btype, struct.pack(">I", (version << 24) | flags) + body)

        def stbl_empty():
            return b(b"stbl", b"".join([
                full(b"stsd", struct.pack(">I", 1)
                     + struct.pack(">I", 16) + b"avc1" + bytes(8)),
                full(b"stts", struct.pack(">I", 0)),
                full(b"stsc", struct.pack(">I", 0)),
                full(b"stsz", struct.pack(">II", 0, 0)),
                full(b"stco", struct.pack(">I", 0)),
            ]))

        def trak(tid):
            tkhd = full(b"tkhd", struct.pack(">IIII", 0, 0, tid, 0))
            mdhd = full(b"mdhd", struct.pack(">IIII", 0, 0, 1000, 0))
            hdlr = full(b"hdlr", struct.pack(">I", 0) + b"vide" + bytes(13))
            return b(b"trak", tkhd + b(b"mdia", mdhd + hdlr
                                       + b(b"minf", stbl_empty())))

        # trex: track1 non-sync default, track2 SYNC default (flags 0)
        trex1 = full(b"trex", struct.pack(">IIIII", 1, 1, 100, 0, 0x00010000))
        trex2 = full(b"trex", struct.pack(">IIIII", 2, 1, 100, 0, 0x0))
        moov = b(b"moov", trak(1) + trak(2) + b(b"mvex", trex1 + trex2))
        ftyp = b(b"ftyp", b"isom" + struct.pack(">I", 0) + b"iso6")

        s1 = [b"\xa1" * 4, b"\xa2" * 5]   # track 1: 9 bytes
        s2 = [b"\xb1" * 3, b"\xb2" * 3]   # track 2: 6 bytes

        mfhd = full(b"mfhd", struct.pack(">I", 1))
        # traf1: NO base flags; trun carries an explicit data offset
        # (patched to point at the mdat body, relative to moof start)
        tfhd1 = full_flags(b"tfhd", 0x0, struct.pack(">I", 1))

        def trun1(doff):
            return full_flags(
                b"trun", 0x1 | 0x200,
                struct.pack(">I", 2) + struct.pack(">i", doff)
                + b"".join(struct.pack(">I", len(s)) for s in s1))

        # traf2: NO base flags and NO trun data offset -> the base must
        # resolve to the end of traf1's data, not the moof start
        tfhd2 = full_flags(b"tfhd", 0x0, struct.pack(">I", 2))
        trun2 = full_flags(
            b"trun", 0x200,
            struct.pack(">I", 2)
            + b"".join(struct.pack(">I", len(s)) for s in s2))
        traf2 = b(b"traf", tfhd2 + trun2)
        moof = b(b"moof", mfhd + b(b"traf", tfhd1 + trun1(0)) + traf2)
        doff = len(moof) + 8
        moof = b(b"moof", mfhd + b(b"traf", tfhd1 + trun1(doff)) + traf2)
        mdat = b(b"mdat", b"".join(s1) + b"".join(s2))
        payload = ftyp + moov + moof + mdat

        tr1, tr2 = sorted(mp4.mp4_demux(payload),
                          key=lambda t: t["track_id"])
        assert [payload[o:o + s] for o, s, _ in tr1["samples"]] == s1
        assert [payload[o:o + s] for o, s, _ in tr2["samples"]] == s2
        # track1: trex default flags are NON-sync and nothing overrides
        assert tr1["keyframes"] == set()
        # track2: trex default flags are SYNC — recorded even though no
        # tfhd/trun flag box ever appeared for the track
        assert tr2["keyframes"] == {1, 2}

    def test_fragment_sync_merge_keeps_implicit_moov_syncs(self):
        """A moov track with NO stss (= every sample sync) that gains
        fragment samples must keep its moov samples classified sync:
        the merged set enumerates them instead of silently flipping
        them non-sync when the set goes non-empty."""
        import struct

        from faiss_vector_search_spark.sources import mp4

        b = self._box

        def full(btype, body, version=0):
            return b(btype, bytes([version, 0, 0, 0]) + body)

        def full_flags(btype, flags, body, version=0):
            return b(btype, struct.pack(">I", (version << 24) | flags) + body)

        moov_samples = [b"\xc1" * 6, b"\xc2" * 7]
        ftyp = b(b"ftyp", b"isom" + struct.pack(">I", 0) + b"iso6")
        mdat0 = b(b"mdat", b"".join(moov_samples))
        data0 = len(ftyp) + 8  # first byte of the moov-sample data

        # real sample tables, NO stss box -> all samples sync per spec
        stbl = b(b"stbl", b"".join([
            full(b"stsd", struct.pack(">I", 1)
                 + struct.pack(">I", 16) + b"avc1" + bytes(8)),
            full(b"stts", struct.pack(">III", 1, 2, 100)),
            full(b"stsc", struct.pack(">IIII", 1, 1, 2, 1)),
            full(b"stsz", struct.pack(">II", 0, 2)
                 + b"".join(struct.pack(">I", len(s)) for s in moov_samples)),
            full(b"stco", struct.pack(">II", 1, data0)),
        ]))
        tkhd = full(b"tkhd", struct.pack(">IIII", 0, 0, 1, 0))
        mdhd = full(b"mdhd", struct.pack(">IIII", 0, 0, 1000, 0))
        hdlr = full(b"hdlr", struct.pack(">I", 0) + b"vide" + bytes(13))
        trex = full(b"trex", struct.pack(">IIIII", 1, 1, 100, 0, 0x00010000))
        moov = b(b"moov", b(b"trak", tkhd + b(b"mdia", mdhd + hdlr
                                              + b(b"minf", stbl)))
                 + b(b"mvex", trex))

        frag = [b"\xd1" * 5]
        mfhd = full(b"mfhd", struct.pack(">I", 1))
        tfhd = full_flags(b"tfhd", 0x20000, struct.pack(">I", 1))

        def trun(doff):
            # first-sample-flags SYNC + per-sample size
            return full_flags(
                b"trun", 0x1 | 0x4 | 0x200,
                struct.pack(">I", 1) + struct.pack(">i", doff)
                + struct.pack(">I", 0x0)
                + struct.pack(">I", len(frag[0])))

        moof = b(b"moof", mfhd + b(b"traf", tfhd + trun(0)))
        moof = b(b"moof", mfhd + b(b"traf", tfhd + trun(len(moof) + 8)))
        payload = ftyp + mdat0 + moov + moof + b(b"mdat", frag[0])

        (tr,) = mp4.mp4_demux(payload)
        assert [payload[o:o + s] for o, s, _ in tr["samples"]] == \
            moov_samples + frag
        # moov samples 1-2 stay sync (enumerated), fragment sample 3 sync
        assert tr["keyframes"] == {1, 2, 3}


class TestJpegCrawlRealism:
    """r7 verdict ask #7: per-scan DNL (height-0 SOF + post-scan
    define-number-of-lines) and EXIF orientation — the two T.81/TIFF
    layout residuals web crawls actually contain, gated on hand-packed
    fixtures spliced from the module's independent encoder."""

    def _splice_dnl(self, payload: bytes, height: int) -> bytes:
        """Zero the SOF height and append a DNL segment before EOI."""
        import struct

        i = payload.index(b"\xff\xc0")
        # SOF0 body: len(2) prec(1) H(2) W(2) ... -> H at i+5
        patched = payload[:i + 5] + b"\x00\x00" + payload[i + 7:]
        assert patched.endswith(b"\xff\xd9")
        dnl = b"\xff\xdc" + struct.pack(">HH", 4, height)
        return patched[:-2] + dnl + b"\xff\xd9"

    def test_dnl_height_resolves(self):
        import numpy as np
        from faiss_vector_search_spark.sources import jpeg

        img = np.random.default_rng(5).integers(
            0, 256, (24, 17, 1), dtype=np.uint8)
        plain = jpeg.jpeg_encode(img, quant=1)
        dnl = self._splice_dnl(plain, 24)
        assert dnl != plain
        dec = jpeg.jpeg_decode(dnl)
        assert dec.shape == (24, 17, 1)
        assert (dec == jpeg.jpeg_decode(plain)).all()

    def test_dnl_missing_is_clear_error(self):
        import numpy as np
        import pytest as _pytest
        from faiss_vector_search_spark.sources import jpeg

        img = np.random.default_rng(6).integers(
            0, 256, (16, 16, 1), dtype=np.uint8)
        payload = jpeg.jpeg_encode(img, quant=1)
        i = payload.index(b"\xff\xc0")
        zeroed = payload[:i + 5] + b"\x00\x00" + payload[i + 7:]
        with _pytest.raises(ValueError, match="no DNL"):
            jpeg.jpeg_decode(zeroed)

    def test_dnl_contradicting_frame_height_rejected(self):
        import numpy as np
        import pytest as _pytest
        from faiss_vector_search_spark.sources import jpeg

        img = np.random.default_rng(7).integers(
            0, 256, (16, 16, 1), dtype=np.uint8)
        payload = jpeg.jpeg_encode(img, quant=1)
        import struct

        bad = payload[:-2] + b"\xff\xdc" + struct.pack(">HH", 4, 99) \
            + b"\xff\xd9"
        with _pytest.raises(ValueError, match="contradicts"):
            jpeg.jpeg_decode(bad)

    @staticmethod
    def _app1(orientation: int, byte_order: bytes) -> bytes:
        import struct

        e = "<" if byte_order == b"II" else ">"
        tiff = byte_order + struct.pack(e + "HI", 42, 8)
        tiff += struct.pack(e + "H", 1)  # one IFD entry
        tiff += struct.pack(e + "HHI", 0x0112, 3, 1)
        tiff += struct.pack(e + "H", orientation) + b"\x00\x00"
        tiff += struct.pack(e + "I", 0)  # next IFD
        body = b"Exif\x00\x00" + tiff
        return b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body

    @pytest.mark.parametrize("bo", [b"II", b"MM"])
    def test_orientation_parses_both_byte_orders(self, bo):
        import numpy as np
        from faiss_vector_search_spark.sources import jpeg

        img = np.random.default_rng(8).integers(
            0, 256, (8, 8, 1), dtype=np.uint8)
        payload = jpeg.jpeg_encode(img, quant=1)
        tagged = payload[:2] + self._app1(6, bo) + payload[2:]
        assert jpeg.jpeg_orientation(tagged) == 6
        assert jpeg.jpeg_orientation(payload) == 1  # absent -> identity

    def test_apply_orientation_geometry(self):
        import numpy as np
        from faiss_vector_search_spark.sources import jpeg

        img = np.arange(6, dtype=np.uint8).reshape(2, 3, 1)
        # orientation 6: stored row 0 is the RIGHT edge -> rotate CW
        rot = jpeg.apply_exif_orientation(img, 6)
        assert rot.shape == (3, 2, 1)
        assert rot[0, -1, 0] == img[0, 0, 0]   # stored top-left -> top-right
        assert (jpeg.apply_exif_orientation(img, 3)
                == img[::-1, ::-1]).all()
        assert (jpeg.apply_exif_orientation(img, 1) == img).all()
        # round-trip pairs: (2,2) (3,3) (4,4) (5,5) (6,8) (7,7)
        for a, b in [(2, 2), (3, 3), (4, 4), (5, 5), (6, 8), (8, 6), (7, 7)]:
            back = jpeg.apply_exif_orientation(
                jpeg.apply_exif_orientation(img, a), b)
            assert (back == img).all(), (a, b)

    def test_decode_applies_orientation_on_opt_in(self):
        import numpy as np
        from faiss_vector_search_spark.sources import jpeg

        img = np.random.default_rng(9).integers(
            0, 256, (16, 8, 1), dtype=np.uint8)
        payload = jpeg.jpeg_encode(img, quant=1)
        tagged = payload[:2] + self._app1(6, b"II") + payload[2:]
        plain = jpeg.jpeg_decode(tagged)
        assert plain.shape == (16, 8, 1)  # default: stored order
        oriented = jpeg.jpeg_decode(tagged, apply_orientation=True)
        assert oriented.shape == (8, 16, 1)
        assert (oriented == jpeg.apply_exif_orientation(plain, 6)).all()
