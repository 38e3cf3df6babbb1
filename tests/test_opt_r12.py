"""Round-12 optimization gates: every engine/plan rewrite this round
must produce BYTE-IDENTICAL output to the form it replaced. Pinned on
the sf0.001 fixtures plus adversarial inputs, mirroring
tests/test_opt_r11.py.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from faiss_vector_search_spark import io as fio

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return fio.load_table(spark, SF, "documents")


class TestXxh64VarlenKernel:
    """The generalized fixed-length kernel (k >= 32 stripe loop) and
    the length-bucketed batch hasher must equal the pure-python
    reference bit-for-bit — the foundation under the arrow minhash
    signature stage."""

    def test_fixed_np_all_length_classes(self):
        import random

        import numpy as np

        from faiss_vector_search_spark.functions.xxh import (
            xxh64_bytes,
            xxh64_fixed_np,
        )

        random.seed(7)
        # crosses the stripe boundary (32), multiples of 32, and every
        # tail combination (8/4/1-byte remainders)
        for k in [0, 1, 3, 4, 7, 8, 9, 15, 31, 32, 33, 36, 40,
                  47, 63, 64, 65, 100, 129]:
            rows = [bytes(random.randrange(256) for _ in range(k))
                    for _ in range(13)]
            mat = (np.zeros((13, 0), dtype=np.uint8) if k == 0 else
                   np.frombuffer(b"".join(rows), dtype=np.uint8)
                   .reshape(-1, k))
            for seed in (42, 0, 11, 2**63):
                got = xxh64_fixed_np(mat, seed)
                ref = np.array([xxh64_bytes(r, seed) for r in rows],
                               dtype=np.uint64)
                assert (got == ref).all(), (k, seed)

    def test_bytes_many_np(self):
        import random

        import numpy as np

        from faiss_vector_search_spark.functions.xxh import (
            xxh64_bytes,
            xxh64_bytes_many_np,
        )

        random.seed(11)
        items = [bytes(random.randrange(97, 123)
                       for _ in range(random.randrange(0, 120)))
                 for _ in range(300)]
        got = xxh64_bytes_many_np(items, 42)
        ref = np.array([xxh64_bytes(b, 42) for b in items],
                       dtype=np.uint64)
        assert (got == ref).all()


class TestMinhashArrowSignatures:
    """minhash_signatures engine='arrow' must be bit-identical to the
    min(xxhash64(s, lit(i))) aggregation it replaces, through to the
    LSH pair set."""

    def _frames(self, base, **kw):
        from faiss_vector_search_spark.operators import dedup

        a = (dedup.minhash_signatures(base, hash_fn="xxhash64",
                                      engine="arrow", **kw)
             .toPandas().sort_values("doc_id").reset_index(drop=True))
        b = (dedup.minhash_signatures(base, hash_fn="xxhash64",
                                      engine="sql", **kw)
             .toPandas().sort_values("doc_id").reset_index(drop=True))
        return a, b

    def test_corpus_signatures_identical(self, docs):
        import pandas as pd

        a, b = self._frames(docs, n=3, num_hashes=16)
        assert len(a) > 0
        pd.testing.assert_frame_equal(a, b)

    def test_adversarial_shapes(self, spark):
        import pandas as pd

        rows = [
            (1, "a b c d e f"),
            (2, ""),                      # no tokens -> filtered
            (3, "x y"),                   # < n tokens -> filtered
            (4, "Hello WORLD foo bar baz hello world foo"),
            (5, None),                    # NULL text -> filtered
            (6, "ünïcode stays ascii after regex 123 abc xyz qq"),
            (7, "a a a a a a a a"),       # one distinct shingle
            (8, " ".join(f"tok{i}" for i in range(200))),
        ]
        d = spark.createDataFrame(rows, "doc_id long, text string")
        a, b = self._frames(d, n=3, num_hashes=16)
        pd.testing.assert_frame_equal(a, b)

    def test_pair_set_identical(self, docs):
        import pandas as pd

        from faiss_vector_search_spark.operators import dedup

        pa = (dedup.minhash_lsh_pairs(docs, threshold=0.8,
                                      hash_fn="xxhash64", engine="arrow")
              .toPandas().sort_values(["doc_a", "doc_b"])
              .reset_index(drop=True))
        pb = (dedup.minhash_lsh_pairs(docs, threshold=0.8,
                                      hash_fn="xxhash64", engine="sql")
              .toPandas().sort_values(["doc_a", "doc_b"])
              .reset_index(drop=True))
        pd.testing.assert_frame_equal(pa, pb)

    def test_arrow_rejects_md5(self, docs):
        from faiss_vector_search_spark.operators import dedup

        with pytest.raises(ValueError, match="xxhash64"):
            dedup.minhash_signatures(docs, hash_fn="md5", engine="arrow")

    def test_auto_routes_md5_to_sql(self, docs):
        # the oracle profile must keep the declarative pipeline
        from faiss_vector_search_spark.operators import dedup

        plan = dedup.minhash_signatures(
            docs, hash_fn="md5", engine="auto"
        )._jdf.queryExecution().executedPlan().toString()
        assert "MapInPandas" not in plan
        assert "md5" in plan


class TestWinnowPolyBatched:
    """r12 _winnow_arrow: the cross-doc batched poly/fmix64 kernel
    must reproduce winnow_numpy_doc per doc exactly (n/min/max of the
    distinct fingerprint set), including NULL/short/astral-char
    docs."""

    def test_corpus_and_adversarial(self, spark, docs):
        import pandas as pd

        from faiss_vector_search_spark.operators import textstats

        rows = [
            (100001, None),
            (100002, ""),
            (100003, "short"),
            (100004, "exactly8"),
            (100005, "\U0001F600\U0001F600\U0001F600\U0001F600 astral"),
            (100006, "ünïcode nön-äscii text fast lane"),
            (100007, "a" * 8),
            (100008, "a" * 500),
        ]
        extra = spark.createDataFrame(rows, "doc_id long, text string")
        d = docs.select("doc_id", "text").unionByName(extra)
        got = (textstats.winnow_fingerprints(d, k=8, w=4, engine="arrow")
               .toPandas().sort_values("doc_id").reset_index(drop=True))
        want_rows = []
        for r in d.select("doc_id", "text").collect():
            fps = textstats.winnow_numpy_doc(r.text, 8, 4)
            if not fps:
                want_rows.append((r.doc_id, 1, None, None))
            else:
                want_rows.append((r.doc_id, len(fps), fps[0], fps[-1]))
        want = pd.DataFrame(
            want_rows,
            columns=["doc_id", "n_fingerprints", "min_fp", "max_fp"],
        ).sort_values("doc_id").reset_index(drop=True)
        got["min_fp"] = got["min_fp"].astype("object")
        got["max_fp"] = got["max_fp"].astype("object")
        want["min_fp"] = want["min_fp"].astype("object")
        want["max_fp"] = want["max_fp"].astype("object")
        pd.testing.assert_frame_equal(
            got.astype({"n_fingerprints": "int64"}),
            want.astype({"n_fingerprints": "int64"}),
        )


class TestTwoTierDf:
    """r12 df_engine='twotier' (salted window + broadcast hot-term
    dfs) must score identically to the default window df — forced
    low hot_min_df so the fixture corpus exercises the hot tier."""

    def test_bm25_and_tfidf_identical(self, docs, monkeypatch):
        import pandas as pd

        import faiss_vector_search_spark.operators.lexical as lx

        orig = lx._attach_df

        def forced(tf, id_col="doc_id", df_engine="window", **kw):
            return orig(tf, id_col, df_engine, hot_min_df=5, n_salt=4)

        monkeypatch.setattr(lx, "_attach_df", forced)
        a = (lx.bm25_search(docs, "lorem data word", k=10)
             .toPandas().reset_index(drop=True))
        b = (lx.bm25_search(docs, "lorem data word", k=10,
                            df_engine="twotier")
             .toPandas().reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b)
        c = (lx.tfidf_topk_terms(docs)
             .toPandas().sort_values(["doc_id", "rk"])
             .reset_index(drop=True))
        d = (lx.tfidf_topk_terms(docs, df_engine="twotier")
             .toPandas().sort_values(["doc_id", "rk"])
             .reset_index(drop=True))
        pd.testing.assert_frame_equal(c, d)


class TestSimhashArrow:
    """simhash engine='arrow' must be bit-identical to the 60-way
    conditional-sum aggregation it replaces, through to the pair set
    of both simhash_pairs engines."""

    def _frames(self, base):
        from faiss_vector_search_spark.operators import dedup

        a = (dedup.simhash(base, hash_fn="xxhash64", engine="arrow")
             .toPandas().sort_values("doc_id").reset_index(drop=True))
        b = (dedup.simhash(base, hash_fn="xxhash64", engine="sql")
             .toPandas().sort_values("doc_id").reset_index(drop=True))
        return a, b

    def test_corpus_identical(self, docs):
        import pandas as pd

        a, b = self._frames(docs)
        assert len(a) > 0
        pd.testing.assert_frame_equal(a, b)

    def test_adversarial_shapes(self, spark):
        import pandas as pd

        rows = [
            (1, "a b c"),
            (2, ""),                      # no tokens -> absent
            (3, None),                    # NULL text -> absent
            (4, "solo"),                  # single token
            (5, "dup dup dup dup"),       # distinct collapses to one
            (6, "Hello, WORLD!  mixed-CASE punct..."),
            (7, "ünïcode ödd çhars splït to ascii残り"),
            (8, " ".join(f"tok{i}" for i in range(500))),
            (9, "7 seven 42 x0 00"),      # numeric tokens
        ]
        d = spark.createDataFrame(rows, "doc_id long, text string")
        a, b = self._frames(d)
        pd.testing.assert_frame_equal(a, b)

    def test_pair_set_identical(self, docs):
        import pandas as pd

        from faiss_vector_search_spark.operators import dedup

        pa = (dedup.simhash_pairs(docs, max_hamming=3, bands=4,
                                  hash_fn="xxhash64", sig_engine="arrow")
              .toPandas().sort_values(["doc_a", "doc_b"])
              .reset_index(drop=True))
        pb = (dedup.simhash_pairs(docs, max_hamming=3, bands=4,
                                  hash_fn="xxhash64", sig_engine="sql")
              .toPandas().sort_values(["doc_a", "doc_b"])
              .reset_index(drop=True))
        pd.testing.assert_frame_equal(pa, pb)

    def test_auto_routes_md5_to_sql(self, docs):
        from faiss_vector_search_spark.operators import dedup

        plan = dedup.simhash(
            docs, hash_fn="md5", engine="auto"
        )._jdf.queryExecution().executedPlan().toString()
        assert "MapInPandas" not in plan
        assert "md5" in plan


class TestVerifySemijoinEquality:
    """The r12 candidate-prefiltered verify-side shingle builds
    (minhash_lsh_pairs, fuzzy_decontaminate) must return exactly the
    old full-corpus-shingle rows — on the md5 ORACLE profile, which
    the declared queries run."""

    def test_minhash_pairs_md5(self, docs):
        import pandas as pd
        from pyspark.sql import functions as F

        from faiss_vector_search_spark.operators import dedup
        from faiss_vector_search_spark.operators.dedup import (
            JACCARD_DECIMALS, _band_structs, _jaccard, _shingle_sets,
        )

        new = (dedup.minhash_lsh_pairs(docs, threshold=0.8, hash_fn="md5")
               .toPandas().sort_values(["doc_a", "doc_b"])
               .reset_index(drop=True))

        # old (r11) verify: full-corpus shingles
        sig = dedup.minhash_signatures(docs, 3, 16, hash_fn="md5")
        bs = _band_structs(4, 4, "md5")
        banded = (
            sig.select(F.col("doc_id"), F.explode(bs).alias("bs"))
            .select("doc_id", F.col("bs.band").alias("band"),
                    F.col("bs.bval").alias("bval"))
            .repartition("band", "bval")
        )
        cand = (
            banded.select(F.col("doc_id").alias("doc_a"), "band", "bval")
            .join(banded.select(F.col("doc_id").alias("doc_b"),
                                "band", "bval"), ["band", "bval"])
            .where(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
            .dropDuplicates(["doc_a", "doc_b"])
        )
        sh = _shingle_sets(docs, 3, "doc_id", "text")
        old = (
            cand.join(sh.select(F.col("doc_id").alias("doc_a"),
                                F.col("shingles").alias("sh_a")), "doc_a")
            .join(sh.select(F.col("doc_id").alias("doc_b"),
                            F.col("shingles").alias("sh_b")), "doc_b")
            .select("doc_a", "doc_b",
                    F.round(_jaccard(F.col("sh_a"), F.col("sh_b")),
                            JACCARD_DECIMALS).alias("jaccard"))
            .where(F.col("jaccard") >= 0.8)
            .toPandas().sort_values(["doc_a", "doc_b"])
            .reset_index(drop=True)
        )
        assert len(new) > 0
        pd.testing.assert_frame_equal(new, old)

    def test_fuzzy_decontaminate_md5(self, spark, docs):
        import pandas as pd

        from faiss_vector_search_spark import io as fio
        from faiss_vector_search_spark.operators import dedup

        from pyspark.sql import functions as F

        from faiss_vector_search_spark.operators.dedup import (
            JACCARD_DECIMALS, _band_structs, _jaccard, _shingle_sets,
        )

        # the declared query's stand-in benchmark: every 50th doc
        bench = docs.where(F.col("doc_id") % 50 == 0)
        new = (dedup.fuzzy_decontaminate(docs, bench, threshold=0.8,
                                         hash_fn="md5")
               .toPandas().sort_values(["doc_id", "bench_id"])
               .reset_index(drop=True))

        # old (r11) form: full-corpus sh_d
        bstructs = _band_structs(4, 4, "md5")

        def banded(frame, out_id):
            sig = dedup.minhash_signatures(frame, 3, 16, hash_fn="md5")
            return sig.select(
                F.col("doc_id").alias(out_id), F.explode(bstructs).alias("bs")
            ).select(out_id, F.col("bs.band").alias("band"),
                     F.col("bs.bval").alias("bval"))

        cand = (
            banded(docs, "doc_id")
            .join(F.broadcast(banded(bench, "bench_id")), ["band", "bval"])
            .select("doc_id", "bench_id")
            .dropDuplicates(["doc_id", "bench_id"])
        )
        sh_d = _shingle_sets(docs, 3, "doc_id", "text")
        sh_b = _shingle_sets(bench, 3, "doc_id", "text").select(
            F.col("doc_id").alias("bench_id"), F.col("shingles").alias("sh_b")
        )
        old = (
            cand.join(sh_d, "doc_id")
            .join(F.broadcast(sh_b), "bench_id")
            .select("doc_id", "bench_id",
                    F.round(_jaccard(F.col("shingles"), F.col("sh_b")),
                            JACCARD_DECIMALS).alias("jaccard"))
            .where(F.col("jaccard") >= 0.8)
            .select("doc_id", "bench_id", "jaccard")
            .toPandas().sort_values(["doc_id", "bench_id"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            new[sorted(new.columns)], old[sorted(old.columns)]
        )


def _old_line_dedup(docs, span=10, max_docs=1, hash_fn="xxhash64",
                    id_col="doc_id", text_col="text"):
    """The r11 line_dedup (kept-line collect_list reassembly) — the
    reference the r12 dropped-positions in-row rebuild must equal."""
    from faiss_vector_search_spark.functions.hashing import hashed
    from faiss_vector_search_spark.functions.text import tokens

    toks = tokens(F.col(text_col))
    n_lines = F.ceil(F.size("toks") / F.lit(span)).cast("int")
    base = docs.select(F.col(id_col), toks.alias("toks")).select(
        F.col(id_col),
        F.when(
            F.size("toks") > 0,
            F.transform(
                F.sequence(F.lit(0), n_lines - 1),
                lambda i: F.array_join(
                    F.slice(F.col("toks"), i * span + 1, span), " "
                ),
            ),
        ).otherwise(F.array().cast("array<string>")).alias("lines"),
        n_lines.alias("n_lines"),
    )
    lines = base.select(
        F.col(id_col), F.col("n_lines"),
        F.posexplode_outer("lines").alias("pos", "line"),
    )
    drop = (
        lines.select(
            F.col(id_col),
            hashed(F.col("line"), seed=23, hash_fn=hash_fn).alias("lh"),
        )
        .groupBy("lh")
        .agg(F.count_distinct(F.col(id_col)).alias("n"))
        .where(F.col("n") > max_docs)
        .select("lh")
    )
    kept = lines.withColumn(
        "lh", hashed(F.col("line"), seed=23, hash_fn=hash_fn)
    ).join(drop, "lh", "left_anti")
    clean = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            " ",
        ).alias("clean_text"),
        F.count("*").cast("bigint").alias("n_kept"),
    )
    return (
        base.select(id_col, "n_lines")
        .join(clean, id_col, "left_outer")
        .select(
            F.col(id_col),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
            F.col("n_lines").cast("bigint").alias("n_lines"),
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("bigint")
            .alias("n_kept"),
            (F.col("n_lines") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .cast("bigint").alias("n_dropped"),
        )
    )


class TestLineDedupInRowRebuild:
    """r12 line_dedup: dropped-positions decision stream + in-row
    rebuild must equal the r11 kept-line-shuffle form row for row,
    including the tokenless-doc NULL-row semantics."""

    def _assert_equal(self, d, **kw):
        import pandas as pd

        from faiss_vector_search_spark.operators import dedup

        a = (dedup.line_dedup(d, **kw).toPandas()
             .sort_values("doc_id").reset_index(drop=True))
        b = (_old_line_dedup(d, **kw).toPandas()
             .sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b)

    def test_corpus_both_profiles(self, docs):
        self._assert_equal(docs, hash_fn="xxhash64")
        self._assert_equal(docs, hash_fn="md5")

    def test_adversarial_shapes(self, spark):
        cases = [
            # two tokenless docs group together and both drop
            [(1, "alpha beta gamma"), (2, ""), (3, None), (4, "zz yy")],
            # a SOLE tokenless doc's NULL row survives (n_kept=1)
            [(1, "alpha beta gamma"), (2, ""), (4, "zz yy")],
            # cross-doc duplicate lines drop everywhere
            [(1, ("x " * 25).strip()), (2, ("x " * 25).strip()),
             (3, "unique stuff here")],
            # in-doc duplicate line is NOT dropped (distinct-doc count)
            [(1, " ".join(f"w{i}" for i in range(10)) + " "
              + " ".join(f"w{i}" for i in range(10)))],
            # short tail line
            [(1, " ".join(f"t{i}" for i in range(35)))],
        ]
        for rows in cases:
            d = spark.createDataFrame(rows, "doc_id long, text string")
            self._assert_equal(d)


class TestCurriculumJoinElimination:
    """curriculum_order's domain column now rides the quality scan as
    an extra_cols passenger instead of a corpus self-join on the id:
    the output must equal the r11 join-based formulation row-for-row
    (and quality_score's default-signature output must be untouched)."""

    @staticmethod
    def _old_curriculum_order(docs, id_col="doc_id", text_col="text",
                              domain_col="source"):
        from pyspark.sql import Window

        from faiss_vector_search_spark.operators import textstats

        scored = textstats.quality_score(
            docs, id_col=id_col, text_col=text_col
        )
        j = docs.select(id_col, domain_col).join(scored, on=id_col)
        w = Window.partitionBy(domain_col).orderBy(
            F.col("quality").desc(), F.col(id_col).asc()
        )
        ranked = j.select(
            F.col(id_col), F.col(domain_col), F.col("quality"),
            F.row_number().over(w).alias("rank"),
        )
        counts = sorted(
            (r[0], r[1])
            for r in ranked.groupBy(domain_col).count().collect()
        )
        r = F.col("rank")
        pos = F.lit(1).cast("long")
        for dom, c in counts:
            pos = pos + F.least(F.lit(int(c)), r - 1)
            pos = pos + F.when(
                (F.col(domain_col) > dom) & (F.lit(int(c)) >= r), 1
            ).otherwise(0)
        return ranked.select(
            pos.cast("bigint").alias("pos"),
            F.col(id_col), F.col(domain_col), F.col("quality"),
            F.col("rank").cast("bigint").alias("rank"),
        )

    def test_corpus_equality(self, docs):
        import pandas as pd

        from faiss_vector_search_spark.operators import textstats

        a = (textstats.curriculum_order(docs).toPandas()
             .sort_values("pos").reset_index(drop=True))
        b = (self._old_curriculum_order(docs).toPandas()
             .sort_values("pos").reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b)

    def test_adversarial_shapes(self, spark):
        import pandas as pd

        from faiss_vector_search_spark.operators import textstats

        rows = [
            (1, "alpha beta gamma delta words here ok", "web"),
            (2, "", "web"),                      # zero tokens: dropped
            (3, None, "books"),                  # NULL text: dropped
            (4, "the of and to in quality text sample", "books"),
            (5, "zz", "code"),                   # singleton domain
            (6, "the and of to a in is it", "web"),
        ]
        d = spark.createDataFrame(rows, "doc_id long, text string, source string")
        a = (textstats.curriculum_order(d).toPandas()
             .sort_values("pos").reset_index(drop=True))
        b = (self._old_curriculum_order(d).toPandas()
             .sort_values("pos").reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b)
        # interleave invariant: pos is a permutation of 1..n
        assert sorted(a["pos"].tolist()) == list(range(1, len(a) + 1))

    def test_quality_score_default_signature_unchanged(self, docs):
        from faiss_vector_search_spark.operators import textstats

        out = textstats.quality_score(docs)
        assert out.columns == ["doc_id", "n_tokens", "quality"]


class TestAnnLshFusedCandidates:
    """ann_lsh_search's fused candidate kernel (corpus_buckets=None)
    must return exactly the bucket-join path's rows: same planes, same
    bucket math, same probe set — only the plan shape changed (no
    bucket blow-up, no broadcast join, no distinct, no second corpus
    scan). The join path stays live for standing corpus_buckets."""

    @pytest.fixture(scope="class")
    def emb(self, spark):
        return fio.load_table(spark, SF, "embeddings")

    @pytest.fixture(scope="class")
    def query(self, spark, emb):
        row = emb.orderBy("vec_id").first()
        return spark.createDataFrame(
            [(list(row["embedding"]),)], "query_vec array<float>"
        )

    def _both(self, emb, query, **kw):
        from faiss_vector_search_spark.operators import lsh

        fused = lsh.ann_lsh_search(emb, query, **kw)
        buckets = lsh.lsh_buckets(
            emb,
            dim=kw.get("dim", 64),
            n_tables=kw.get("n_tables", 24),
            n_bits=kw.get("n_bits", 4),
            seed=kw.get("seed", 42),
        )
        joined = lsh.ann_lsh_search(
            emb, query, corpus_buckets=buckets, **kw
        )
        return fused, joined

    def test_equality_home_buckets(self, emb, query):
        import pandas as pd

        fused, joined = self._both(emb, query, k=10, dim=64)
        pd.testing.assert_frame_equal(fused.toPandas(), joined.toPandas())

    def test_equality_multiprobe(self, emb, query):
        import pandas as pd

        fused, joined = self._both(
            emb, query, k=10, dim=64, multiprobe=2, n_tables=8
        )
        pd.testing.assert_frame_equal(fused.toPandas(), joined.toPandas())

    def test_empty_query(self, spark, emb):
        from faiss_vector_search_spark.operators import lsh

        q0 = spark.createDataFrame([], "query_vec array<float>")
        assert lsh.ann_lsh_search(emb, q0, k=10, dim=64).count() == 0

    def test_fused_candidate_set_matches_bucket_join(self, emb, query):
        """The kernel's candidate ids equal the bucket-join candidate
        ids exactly (not just the top-k survivors)."""
        from faiss_vector_search_spark.operators import lsh

        pairs = lsh._probe_pairs(query, 64, 24, 4, 42, 0, "query_vec")
        buckets = lsh.lsh_buckets(emb, dim=64)
        qb = query.sparkSession.createDataFrame(
            pairs, "table int, bucket bigint"
        )
        join_ids = sorted(
            r[0] for r in buckets.join(qb, ["table", "bucket"])
            .select("vec_id").distinct().collect()
        )
        # drive the fused kernel's candidate frame via its public
        # surface: top-k with k >= |candidates| returns every candidate
        fused_all = lsh.ann_lsh_search(emb, query, k=len(join_ids) + 50,
                                       dim=64)
        fused_ids = sorted(r["vec_id"] for r in fused_all.collect())
        assert fused_ids == join_ids
