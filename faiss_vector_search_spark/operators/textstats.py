"""Text-analysis operators for training-data pipelines
(SURVEY.md §2b #25-28): language ID, quality scoring, token counting,
winnowing fingerprints.

Everything is built-in Column expressions — language ID is a broadcast
lexicon join, fingerprinting is a window-min over k-gram hashes. No
Python touches the hot path, so these run at scan speed on a 100 TB
corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import hashed
from ..functions.text import tokens

# Tiny per-language stopword lexicon for the n-gram/stopword-vote
# language heuristic. Deliberately small and public-knowledge.
LANG_LEXICON: list[tuple[str, str]] = [
    ("en", "the"), ("en", "and"), ("en", "of"), ("en", "to"),
    ("en", "a"), ("en", "in"), ("en", "is"),
    ("es", "el"), ("es", "la"), ("es", "de"), ("es", "que"),
    ("es", "y"), ("es", "los"),
    ("de", "der"), ("de", "die"), ("de", "und"), ("de", "das"),
    ("de", "ist"), ("de", "nicht"),
    ("fr", "le"), ("fr", "les"), ("fr", "des"), ("fr", "et"),
    ("fr", "est"), ("fr", "une"),
]


def lexicon_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(LANG_LEXICON, ["lex_lang", "word"])


def lang_id(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Stopword-vote language ID: per-language stopword-hit counts,
    argmax per doc (ties → lexicographic lang), docs with no hits →
    'und'.

    The lexicon is a compile-time literal, so this is a PURE
    PROJECTION: the token array is staged once per doc, each
    language's hit count is a ``size(filter(...))`` over it, and the
    argmax is a ``greatest`` over (count, rank) structs where rank
    encodes the lexicographic tie-break (earlier lang = higher rank).
    Zero joins, zero shuffles, zero explode — language ID runs at
    scan speed on a 100 TB corpus and pipelines into the same stage
    as any other per-doc score. (The earlier formulation exploded
    tokens into a broadcast lexicon join + window argmax + corpus-
    grain backfill join — two corpus shuffles and a sort-merge join
    this projection simply doesn't have.)"""
    langs = sorted({lang for lang, _ in LANG_LEXICON})
    words = {
        lang: [w for lg, w in LANG_LEXICON if lg == lang] for lang in langs
    }
    n = len(langs)
    # stage the token array as a real column: HOF lambdas run
    # interpreted with no CSE, so each language's filter must reference
    # a staged column, not re-tokenize (SURVEY §4 discipline)
    staged = docs.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks")
    )

    def hit_filter(word_list):
        # closure factory, NOT a default arg: pyspark derives the SQL
        # lambda's arity from the Python signature, so an extra bound
        # parameter would become a second lambda variable
        return lambda t: t.isin(*word_list)

    counts = staged.select(
        F.col(id_col),
        *[
            F.size(F.filter(F.col("_toks"), hit_filter(words[lang])))
            .cast("bigint")
            .alias(f"_c_{lang}")
            for lang in langs
        ],
    )
    best = F.greatest(
        *[
            F.struct(
                F.col(f"_c_{lang}").alias("c"),
                F.lit(n - 1 - i).alias("r"),
            )
            for i, lang in enumerate(langs)
        ]
    )
    scored = counts.select(F.col(id_col), best.alias("_best"))
    lang_by_rank = F.array(*[F.lit(lang) for lang in reversed(langs)])
    return scored.select(
        F.col(id_col),
        F.when(
            F.col("_best.c") > 0,
            F.element_at(lang_by_rank, F.col("_best.r") + 1),
        )
        .otherwise("und")
        .alias("pred_lang"),
        F.when(F.col("_best.c") > 0, F.col("_best.c"))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("n_hits"),
    )


def quality_exprs(text_col, toks=None) -> tuple:
    """(n_tokens, quality) Column pair for one text column — exposed
    so pipelines can fold the score into an existing projection
    instead of a second scan + join.

    ``toks``: pass an already-STAGED token-array column to avoid
    re-tokenizing. The default inlines ``tokens(text_col)``, which
    this function references four times (size, stopword filter,
    mean-word-length fold, n_tokens) — and split+filter inside
    interpreted higher-order exprs gets re-evaluated per reference
    (the SURVEY §4 interpreted-HOF discipline; staging measured
    1.5x on quality_score at sf1)."""
    en_stop = [w for lang, w in LANG_LEXICON if lang == "en"]
    toks = tokens(text_col) if toks is None else toks
    n_chars = F.length(text_col).cast("double")
    n_toks = F.size(toks).cast("double")
    n_stop = F.size(
        F.filter(toks, lambda t: t.isin(*en_stop))
    ).cast("double")
    n_punct = F.length(
        F.regexp_replace(F.lower(text_col), "[a-z0-9 ]", "")
    ).cast("double")
    # try_divide: ANSI Spark (the 4.x default) throws on x/0, so one
    # empty document would kill the whole scan; try_divide yields NULL
    # like the DuckDB oracle's plain division. NOTE the NULL does NOT
    # propagate through least()/greatest() (both skip NULLs — an empty
    # doc would otherwise score 0.375), so quality is explicitly
    # nulled for zero-token docs below: the oracle computes quality
    # only over its len(toks) > 0 CTE, and any downstream mean or
    # quality>=t gate must see the same scoreable-row set.
    mean_wl = F.try_divide(
        F.aggregate(
            F.transform(toks, lambda t: F.length(t).cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        n_toks,
    )
    len_score = F.least(n_chars / 500.0, F.lit(1.0))
    stop_score = F.least(F.try_divide(n_stop, n_toks) * 5.0, F.lit(1.0))
    punct_pen = F.greatest(
        F.lit(0.0), F.lit(1.0) - F.try_divide(n_punct, n_chars) * 10.0
    )
    # wl_score carries the zero-token NULL (an unconditional
    # otherwise(0.5) would swallow it): NULL + the other scores nulls
    # the whole sum, so quality is NULL exactly when n_toks == 0
    # (least/greatest skip NULLs, so no other term can carry it). The
    # second branch tests n_toks — size only — and runs only when the
    # band check came back false/NULL, which is the cheapest way to
    # distinguish "out of band" from "no tokens at all".
    wl_score = F.when((mean_wl >= 3.0) & (mean_wl <= 8.0), 1.0).when(
        n_toks > 0, 0.5
    )
    quality = F.round(
        (len_score + stop_score + punct_pen + wl_score) / 4.0, 6
    )
    return n_toks.cast("bigint"), quality


def quality_score(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    extra_cols: tuple = (),
) -> DataFrame:
    """Heuristic quality score in [0,1]: length, stopword ratio,
    punctuation penalty, mean-word-length band — the standard cheap
    pre-filters an LLM data pipeline applies before expensive stages.

    Two-projection shape: the token array is staged as a real column
    first so the four token-consuming score terms read it instead of
    re-running split+filter per term (CollapseProject keeps the
    non-cheap duplicate staged).

    ``extra_cols``: doc-functional passenger columns carried through
    both projections unchanged (the lm.py extra_cols convention) — a
    consumer that only needs to ATTACH a column it already has on the
    doc row (e.g. the domain for curriculum interleaving) rides the
    one scan instead of paying a corpus self-join on the id."""
    passengers = [F.col(c) for c in extra_cols]
    staged = docs.select(
        F.col(id_col),
        *passengers,
        F.col(text_col),
        tokens(F.col(text_col)).alias("_toks"),
    )
    n_tokens, quality = quality_exprs(F.col(text_col), F.col("_toks"))
    return staged.select(
        F.col(id_col),
        *passengers,
        n_tokens.alias("n_tokens"),
        quality.alias("quality"),
    ).where(F.col("n_tokens") > 0)


def token_count(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Whitespace tokens, BPE-ish regex tokens (letter runs / digit
    runs / single symbols), and distinct token count. The token array
    stages as a real column (two consumers: size + array_distinct)."""
    bpe_re = "[a-z]+|[0-9]+|[^a-z0-9 ]"
    return docs.select(
        F.col(id_col),
        F.col(text_col),
        tokens(F.col(text_col)).alias("_toks"),
    ).select(
        F.col(id_col),
        F.size(F.col("_toks")).cast("bigint").alias("ws_tokens"),
        F.size(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(bpe_re), 0)
        ).cast("bigint").alias("bpe_tokens"),
        F.size(F.array_distinct(F.col("_toks"))).cast("bigint")
        .alias("distinct_tokens"),
    )


def winnow_fp_sets(
    docs: DataFrame,
    k: int = 8,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "md5",
) -> DataFrame:
    """(id, fps array): the distinct winnowing fingerprint SET per doc
    — the in-row pipeline :func:`winnow_fingerprints` summarizes,
    exposed for set-level consumers (fingerprint_overlap_search)."""
    hash_arr = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(text_col) - (k - 1), F.lit(1))),
        lambda i: hashed(F.col(text_col).substr(i, F.lit(k)), seed=11, hash_fn=hash_fn),
    )
    # least() of w gets, not array_min(slice(...)): slice allocates a
    # fresh array per position; get() is an O(1) read that yields null
    # past the array end (ANSI-safe, unlike element_at), and least()
    # skips nulls — matching the window shrinking at the tail.
    wmins = F.transform(
        F.sequence(F.lit(0), F.size(F.col("h_arr")) - 1),
        lambda i: F.least(*[F.get(F.col("h_arr"), i + j) for j in range(w)])
        if w > 1
        else F.get(F.col("h_arr"), i),
    )
    return docs.select(F.col(id_col), hash_arr.alias("h_arr")).select(
        F.col(id_col), F.array_distinct(wmins).alias("fps")
    )


def winnow_fp_sets_arrow_xx(
    docs: DataFrame,
    k: int = 8,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 11,
) -> DataFrame:
    """Arrow engine for :func:`winnow_fp_sets` in the xxhash64
    PRODUCTION hash family — BYTE-IDENTICAL fingerprints to the SQL
    pipeline (``xxhash64(substr(text, i, k), seed)`` per position),
    not a parallel family like the winnow_fingerprints "arrow" engine.

    The SQL form evaluates one interpreted hash expression per char
    position (2.6 s per corpus pass at sf0.1 — the entire cost of
    fingerprint_overlap); here ASCII docs hash every position with a
    handful of vectorized u64 ops (functions/xxh.py reproduces
    Spark's XXH64 exactly, including the hashInt seed-chaining of the
    int literal), and non-ASCII / short docs fall back to the
    pure-python reference of the same bits. The per-doc semantics
    mirror the SQL expression precisely: positions 1..max(len−k+1, 1)
    (an empty string hashes one empty gram; NULL text hashes one
    NULL-skipped chain value), windows shrink at the tail, and the
    output array is the DISTINCT fingerprint set (sorted here — set
    consumers only). Equality with the SQL plan is pytest-gated."""
    import numpy as np
    import pandas as pd

    from ..functions.xxh import (
        xxh64_bytes,
        xxh64_fixed_np,
        xxh64_int_chain,
        xxh64_int_chain_np,
    )

    null_fp = xxh64_int_chain(42, seed)  # xxhash64(NULL, seed): string
    #                                      arg skipped, int hashed at 42

    def doc_fps(t):
        if t is None:
            return [null_fp]
        n = len(t)
        if n >= k and k < 32 and t.isascii():
            b = np.frombuffer(t.encode("ascii"), dtype=np.uint8)
            grams = np.lib.stride_tricks.sliding_window_view(b, k)
            h = xxh64_int_chain_np(xxh64_fixed_np(grams, 42), seed)
        else:
            npos = max(n - (k - 1), 1)
            h = np.array(
                [
                    xxh64_int_chain(
                        xxh64_bytes(t[i:i + k].encode("utf-8"), 42), seed
                    )
                    for i in range(npos)
                ],
                dtype=np.int64,
            )
        if w > 1:
            pad = np.full(w - 1, np.iinfo(np.int64).max, dtype=np.int64)
            h = np.lib.stride_tricks.sliding_window_view(
                np.concatenate([h, pad]), w
            ).min(axis=1)
        return np.unique(h).tolist()

    # r12: the ASCII len>=k fast lane hashes docs in CHUNKS of 32 —
    # one concatenated buffer per chunk, one vectorized XXH64 pass
    # over every position (virtual sliding view, boundary positions
    # hashed-and-discarded), one padded sliding-min; per-doc distinct
    # stays a small C call per doc. 32 docs ≈ 15k positions keeps the
    # whole 20-op hash chain L2-resident while amortizing numpy
    # per-op overhead ~32× (pure-numpy isolation, 10k docs: per-doc
    # 1.56 s, chunk32 0.61 s; a WHOLE-batch version was tried first
    # and REJECTED at 2.06 s — a multi-MB working set turns the chain
    # memory-bandwidth-bound). doc_fps stays the bit-identical slow
    # lane (NULL / short / non-ASCII docs) and the pytest reference.
    _CH = 32
    imax = np.iinfo(np.int64).max

    def kernel(batches):
        for pdf in batches:
            texts = pdf[text_col].values
            nrows = len(pdf)
            out = [None] * nrows
            fast = [
                i for i, t in enumerate(texts)
                if t is not None and len(t) >= k and k < 32 and t.isascii()
            ]
            fastset = set(fast)
            for i in range(nrows):
                if i not in fastset:
                    out[i] = doc_fps(texts[i])
            for c0 in range(0, len(fast), _CH):
                idxs = fast[c0:c0 + _CH]
                nf = len(idxs)
                lens = np.fromiter(
                    (len(texts[i]) for i in idxs), dtype=np.int64, count=nf
                )
                npos = lens - (k - 1)
                buf = np.frombuffer(
                    "".join(texts[i] for i in idxs).encode("ascii"),
                    dtype=np.uint8,
                )
                g = np.zeros(nf, dtype=np.int64)
                np.cumsum(lens[:-1], out=g[1:])
                S = int(npos.sum())
                s_base = np.zeros(nf, dtype=np.int64)
                np.cumsum(npos[:-1], out=s_base[1:])
                doc_of = np.repeat(np.arange(nf), npos)
                starts = g[doc_of] + (
                    np.arange(S) - np.repeat(s_base, npos)
                )
                grams = np.lib.stride_tricks.sliding_window_view(buf, k)
                h_all = xxh64_int_chain_np(xxh64_fixed_np(grams, 42), seed)
                h = h_all[starts]
                if w > 1:
                    ins = np.arange(S) + np.repeat(
                        np.arange(nf) * (w - 1), npos
                    )
                    padded = np.full(
                        S + nf * (w - 1), imax, dtype=np.int64
                    )
                    padded[ins] = h
                    h = np.lib.stride_tricks.sliding_window_view(
                        padded, w
                    ).min(axis=1)[ins]
                for li in range(nf):
                    out[idxs[li]] = np.unique(
                        h[s_base[li]:s_base[li] + npos[li]]
                    ).tolist()
            yield pd.DataFrame(
                {id_col: pdf[id_col].values, "fps": out}
            )

    return docs.select(id_col, text_col).mapInPandas(
        kernel, schema=f"{id_col} long, fps array<bigint>"
    )


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 8,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "md5",
    engine: str = "sql",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03):
    hash every char k-gram, slide a w-window over the hash sequence,
    keep each window's minimum. Returns one summary row per doc
    (n_fingerprints / min / max) — join-able as a compact sketch.

    The whole sliding-window pipeline is array transforms *inside the
    row* — no explode, no per-gram shuffle, no sort. A doc's grams
    never leave their scan partition; the alternative (explode 15M+
    gram rows and window-min over a doc-partitioned sort) shuffles and
    sorts the entire gram stream for a per-doc-local computation.

    ``engine``: "sql" (default) hashes each gram with ``hash_fn``
    (md5 = the oracle profile, xxhash64 = the JVM production hash);
    "arrow" is a numpy engine — one vectorized polynomial rolling
    hash + fmix64 finalizer + padded sliding-min per doc, C speed
    instead of one interpreted hash call per gram. A DIFFERENT hash
    family, so summaries are not comparable across engines (any
    consistent family is a valid winnowing instance); the numpy
    vectorization is equality-gated against a plain-Python reference
    of the same family (tests/test_round3_additions.py), and the
    algorithm (positions, tail-shrinking windows, distinct) mirrors
    this path exactly."""
    if engine == "arrow":
        return _winnow_arrow(docs, k, w, id_col, text_col)
    if engine != "sql":
        raise ValueError(f"unknown winnow engine: {engine}")
    fps = winnow_fp_sets(docs, k, w, id_col, text_col, hash_fn)
    return fps.select(
        F.col(id_col),
        F.size("fps").cast("bigint").alias("n_fingerprints"),
        F.array_min("fps").alias("min_fp"),
        F.array_max("fps").alias("max_fp"),
    )


def winnow_numpy_doc(text: str, k: int, w: int):
    """One doc's winnowing fingerprint SET under the numpy engine's
    hash family (polynomial over UTF-16 units + fmix64). Exposed so
    tests can check the Schleimer guarantee (shared substrings ⇒
    shared fingerprints) and so the vectorized engine has a
    same-family reference surface. Returns a sorted list of signed
    int64 fingerprints (empty for NULL text)."""
    import numpy as np

    if text is None:
        return []
    units = np.frombuffer(
        text.encode("utf-16-le"), dtype=np.uint16
    ).astype(np.uint64)
    L = len(units)
    B = np.uint64(1000003)
    with np.errstate(over="ignore"):
        if L >= k:
            pows = B ** np.arange(k - 1, -1, -1, dtype=np.uint64)
            win = np.lib.stride_tricks.sliding_window_view(units, k)
            h = (win * pows).sum(axis=1, dtype=np.uint64)
        else:  # short doc: one gram = the whole text (sql substr tail)
            pows = B ** np.arange(max(L, 1) - 1, -1, -1, dtype=np.uint64)
            h = np.array(
                [(units * pows).sum(dtype=np.uint64)] if L else [np.uint64(0)],
                dtype=np.uint64,
            )
        # fmix64 finalizer: the raw polynomial is monotone-ish in the
        # leading unit, which would bias window minima
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(33)
    if w > 1:
        pad = np.full(w - 1, np.iinfo(np.uint64).max, dtype=np.uint64)
        h = np.lib.stride_tricks.sliding_window_view(
            np.concatenate([h, pad]), w
        ).min(axis=1)
    return sorted(np.unique(h.view(np.int64)).tolist())


def _winnow_arrow(
    docs: DataFrame, k: int, w: int, id_col: str, text_col: str
) -> DataFrame:
    """Arrow engine for :func:`winnow_fingerprints`. r12: docs with
    >= k UTF-16 units vectorize ACROSS docs in CHUNKS of 32 — one
    concatenated unit buffer per chunk, k shifted multiply-add passes
    for every gram hash of every doc (no (S,k) materialization), one
    padded sliding-min; per-doc distinct count/min/max stay small C
    calls. 32 docs keeps the working set L2-resident while amortizing
    numpy per-op overhead (pure-numpy isolation, 10k docs: per-doc
    loop 1.56 s, whole-batch 3.39 s, chunk32 0.79 s — the same cache
    economics as the XXH64 winnow kernel). :func:`winnow_numpy_doc`
    stays the bit-identical slow lane (NULL / short docs) and the
    pytest reference. NULL text mirrors the sql path's shape (one
    NULL fingerprint row)."""
    import numpy as np
    import pandas as pd

    B = np.uint64(1000003)
    _CH = 32

    def kernel(batches):
        for pdf in batches:
            ids = pdf[id_col].values
            texts = pdf[text_col].values
            nrows = len(pdf)
            ns = np.empty(nrows, dtype=np.int64)
            mns = [None] * nrows
            mxs = [None] * nrows
            units_list = [None] * nrows
            fast = []
            for i, t in enumerate(texts):
                if t is None:
                    ns[i] = 1  # NULL text: [null] after distinct in sql
                    continue
                u = np.frombuffer(
                    t.encode("utf-16-le"), dtype=np.uint16
                )
                if len(u) >= k:
                    fast.append(i)
                    units_list[i] = u
                else:
                    fps = winnow_numpy_doc(t, k, w)
                    ns[i] = len(fps)
                    mns[i] = fps[0]
                    mxs[i] = fps[-1]
            with np.errstate(over="ignore"):
                pows = B ** np.arange(k - 1, -1, -1, dtype=np.uint64)
                for c0 in range(0, len(fast), _CH):
                    idxs = fast[c0:c0 + _CH]
                    nf = len(idxs)
                    lens = np.fromiter(
                        (len(units_list[i]) for i in idxs),
                        dtype=np.int64, count=nf,
                    )
                    npos = lens - (k - 1)
                    U = np.concatenate(
                        [units_list[i] for i in idxs]
                    ).astype(np.uint64)
                    g = np.zeros(nf, dtype=np.int64)
                    np.cumsum(lens[:-1], out=g[1:])
                    S = int(npos.sum())
                    doc_of = np.repeat(np.arange(nf), npos)
                    s_base = np.zeros(nf, dtype=np.int64)
                    np.cumsum(npos[:-1], out=s_base[1:])
                    starts = g[doc_of] + (
                        np.arange(S) - np.repeat(s_base, npos)
                    )
                    h = np.zeros(S, dtype=np.uint64)
                    for t_off in range(k):
                        h += U[starts + t_off] * pows[t_off]
                    h ^= h >> np.uint64(33)
                    h *= np.uint64(0xFF51AFD7ED558CCD)
                    h ^= h >> np.uint64(33)
                    if w > 1:
                        ins = np.arange(S) + np.repeat(
                            np.arange(nf) * (w - 1), npos
                        )
                        padded = np.full(
                            S + nf * (w - 1), np.iinfo(np.uint64).max,
                            dtype=np.uint64,
                        )
                        padded[ins] = h
                        h = np.lib.stride_tricks.sliding_window_view(
                            padded, w
                        ).min(axis=1)[ins]
                    h = h.view(np.int64)
                    for li in range(nf):
                        fps = np.unique(
                            h[s_base[li]:s_base[li] + npos[li]]
                        )
                        i = idxs[li]
                        ns[i] = len(fps)
                        mns[i] = int(fps[0])
                        mxs[i] = int(fps[-1])
            yield pd.DataFrame(
                {id_col: pd.Series(ids, dtype="int64"),
                 "n_fingerprints": pd.Series(ns, dtype="int64"),
                 "min_fp": pd.Series(mns, dtype="object"),
                 "max_fp": pd.Series(mxs, dtype="object")}
            )

    return docs.select(id_col, text_col).mapInPandas(
        kernel,
        schema=f"{id_col} long, n_fingerprints bigint, "
               "min_fp bigint, max_fp bigint",
    )


def stratified_sample(
    docs: DataFrame,
    fraction: float,
    strata_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-stratum sampling — the train-set curation op
    (sample x% per language/source so small strata survive).

    Rows rank by md5(id) within their stratum and the top ⌈f·n⌉ win:
    fully reproducible across engines and runs (no RNG state), and
    adding data never *removes* previously-sampled rows' eligibility
    logic. One window per stratum — the shuffle carries (id, stratum)
    only."""
    from ..functions.hashing import md5_int

    w = Window.partitionBy(strata_col).orderBy(
        md5_int(F.col(id_col).cast("string")).asc(), F.col(id_col).asc()
    )
    n = Window.partitionBy(strata_col)
    return (
        docs.select(F.col(id_col), F.col(strata_col))
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n_stratum", F.count("*").over(n))
        .where(F.col("rn") <= F.ceil(F.col("n_stratum") * fraction))
        .select(id_col, strata_col)
    )


def doc_length_histogram(
    docs: DataFrame,
    bucket_width: int = 50,
    n_buckets: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Character-length histogram of the corpus (the quick-look
    distribution check before filtering/chunking decisions). Pure
    integer arithmetic — one map + one partial-aggregable groupBy."""
    bucket = F.least(
        F.floor(F.length(F.col(text_col)) / bucket_width),
        F.lit(n_buckets - 1),
    ).cast("int")
    return (
        docs.select(bucket.alias("bucket"), F.length(text_col).alias("n"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n").cast("bigint").alias("min_chars"),
            F.max("n").cast("bigint").alias("max_chars"),
        )
    )


DEFAULT_SPLITS = (("train", 0.8), ("val", 0.1), ("test", 0.1))


def hash_split(
    docs: DataFrame,
    splits=DEFAULT_SPLITS,
    id_col: str = "doc_id",
    hash_fn: str = "xxhash64",
    seed: int = 31,
) -> DataFrame:
    """Deterministic train/val/test assignment by id hash — the split
    step of a training-data pipeline. Hash-based (not random) so the
    assignment is stable across runs, re-partitioning, and incremental
    corpus growth: a document's split never changes when other
    documents are added. Pure map, no shuffle.

    ``hash_fn``: ``"xxhash64"`` (production) or ``"md5"`` (oracle
    profile). Buckets are hash % 1000 against cumulative per-mille
    thresholds."""
    return docs.select(
        F.col(id_col),
        split_col(splits, id_col=id_col, hash_fn=hash_fn, seed=seed).alias(
            "split"
        ),
    )


def split_col(
    splits=DEFAULT_SPLITS,
    id_col: str = "doc_id",
    hash_fn: str = "xxhash64",
    seed: int = 31,
):
    """The :func:`hash_split` assignment as a bare Column expression —
    so pipelines (e.g. lm.split_kl_report) fold the split label into
    an existing projection instead of a second scan + id join."""
    from ..functions.hashing import hashed

    total = sum(w for _, w in splits)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    bucket = F.pmod(
        hashed(F.col(id_col).cast("string"), seed=seed, hash_fn=hash_fn),
        F.lit(1000),
    )
    expr = None
    acc = 0.0
    for name, w in splits:
        acc += w
        cond = bucket < int(round(acc * 1000))
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
    return expr.otherwise(splits[-1][0])


def quality_deciles(
    docs: DataFrame,
    n_buckets: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    edges: str = "exact",
) -> DataFrame:
    """Corpus quality profile: bucket documents into quality deciles
    and report each decile's population and score range — the
    curation dashboard that decides where to draw the keep/drop
    threshold. ``edges`` picks the binning engine:

    - ``"exact"`` (default, the oracle profile): ntile over a global
      (quality asc, id) sort — exact equal-size deciles, totalized
      ordering, cross-engine deterministic;
    - ``"approx"`` (the 100 TB profile): a SINGLE-SCAN fixed-grid
      histogram — quality is bounded in [0, 1], so one map-side-
      combinable groupBy on a 4-dp grid key (≤ 10001 cells) captures
      the whole distribution; decile edges come from cumulative
      counts over that tiny histogram and the profile aggregates the
      histogram itself. No global sort, no second corpus pass (the
      r9 percentile_approx two-pass form recomputed the quality
      pipeline on a second scan and measured ~2x the exact engine —
      BENCH_BASELINE r10). Approximation surface: documents in the
      same 1e-4 grid cell cannot split across deciles, so a tie-heavy
      corpus can emit FEWER than ``n_buckets`` rows (observed 7/10 at
      the sf10 rehearsal) — each emitted decile then absorbs the tied
      mass. Callers must key on the ``decile`` VALUE, not assume rows
      1..n_buckets all exist; population skew shows up directly in
      the per-row ``n_docs``.
    """
    scored = quality_score(docs, id_col=id_col, text_col=text_col)
    if edges == "exact":
        w = Window.orderBy(F.col("quality").asc(), F.col(id_col).asc())
        binned = scored.select(
            id_col, "quality", F.ntile(n_buckets).over(w).alias("decile")
        )
    elif edges == "approx" and n_buckets == 1:
        # degenerate single-bucket profile: no cut points exist, and
        # percentile_approx rejects an empty percentage list — emit
        # the same all-rows-in-decile-1 frame the exact engine builds
        binned = scored.select(
            id_col, "quality", F.lit(1).alias("decile")
        )
    elif edges == "approx":
        # SINGLE-SCAN fixed-grid histogram engine (r10 rework — the
        # percentile_approx two-pass form recomputed quality_score's
        # text pipeline on a second corpus scan and measured ~2x the
        # exact engine at every feasible SF): quality ∈ [0, 1] by
        # construction, so a 4-dp grid key (≤ 10001 cells) captures
        # the distribution in ONE map-side-combinable aggregation;
        # decile edges are cumulative counts over the TINY histogram
        # (a bounded single-partition window — never the corpus), and
        # the decile profile aggregates the histogram itself. The
        # corpus is read once and never sorted or rescanned; the
        # approximation surface is that same-cell ties cannot split
        # across deciles (cell width 1e-4).
        hist = scored.groupBy(
            F.round(F.col("quality"), 4).alias("_g")
        ).agg(
            F.count("*").alias("_n"),
            F.min("quality").alias("_min"),
            F.max("quality").alias("_max"),
            F.sum(F.col("quality").cast("decimal(28,9)")).alias("_sum"),
        )
        cw = Window.orderBy("_g")
        tw = cw.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        binned_h = hist.select(
            "_n", "_min", "_max", "_sum",
            F.least(
                F.lit(n_buckets),
                F.ceil(
                    F.sum("_n").over(
                        cw.rowsBetween(Window.unboundedPreceding, 0)
                    )
                    * n_buckets
                    / F.sum("_n").over(tw)
                ),
            ).cast("int").alias("decile"),
        )
        return (
            binned_h.groupBy("decile")
            .agg(
                F.sum("_n").cast("bigint").alias("n_docs"),
                F.round(F.min("_min"), 6).alias("min_q"),
                F.round(F.max("_max"), 6).alias("max_q"),
                F.round(
                    (F.sum("_sum") / F.sum("_n")).cast("double"), 6
                ).alias("avg_q"),
            )
        )
    else:
        raise ValueError(f"unknown edges engine: {edges}")
    return (
        binned
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.min("quality"), 6).alias("min_q"),
            F.round(F.max("quality"), 6).alias("max_q"),
            F.round(F.avg("quality"), 6).alias("avg_q"),
        )
    )


def repetition_score(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Intra-document repetition profile — the boilerplate /
    SEO-spam / decode-loop detector that complements
    :func:`quality_score`: distinct-token ratio, most-frequent-token
    share, and repeated-3-gram share. Everything is an in-row array
    expression over one materialized token array: no explode, no
    shuffle, scan-speed at 100 TB. The per-distinct-token count is
    O(distinct × tokens) in-row — bounded by document length, and
    identical in the SQL oracle, which keeps both engines at the
    exact same float operations."""
    toks = tokens(F.col(text_col))
    base = docs.select(F.col(id_col), toks.alias("toks")).where(
        F.size("toks") >= 3
    ).withColumn("_sorted", F.array_sort(F.col("toks")))
    dist = F.array_distinct(F.col("toks"))
    n_toks = F.size("toks").cast("double")
    # r11: max token frequency == LONGEST RUN of the sorted array —
    # an O(T log T) sort + one O(T) fold, replacing the r7 form's
    # O(distinct x T) per-token membership scans (1.17 -> 0.98 s at
    # sf0.1; same integer count, so identical rounded ratios and the
    # quadratic DuckDB oracle twin still compares equal). Tokens are
    # non-empty by construction, so the '' sentinel never matches.
    top_cnt = F.aggregate(
        F.col("_sorted"),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, t: F.struct(
            t.alias("prev"),
            F.when(t == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(t == acc["prev"], acc["run"] + 1)
                .otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    ).cast("double")
    g3 = F.transform(
        F.sequence(F.lit(0), F.size("toks") - 3),
        lambda i: F.concat_ws(
            " ",
            F.element_at("toks", i + 1),
            F.element_at("toks", i + 2),
            F.element_at("toks", i + 3),
        ),
    )
    return base.select(
        id_col,
        F.size("toks").cast("bigint").alias("n_tokens"),
        F.round(F.size(dist) / n_toks, 6).alias("distinct_ratio"),
        F.round(top_cnt / n_toks, 6).alias("top_token_ratio"),
        F.round(
            F.lit(1.0)
            - F.size(F.array_distinct(g3)) / F.size(g3).cast("double"),
            6,
        ).alias("rep_3gram_ratio"),
    )


# Deliberately simple, RE2-compatible patterns (no backrefs, no
# lookaround) so Spark's Java regex and DuckDB's RE2 agree exactly.
PII_EMAIL = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
PII_PHONE = "\\+?[0-9][0-9() -]{7,}[0-9]"
PII_SSN = "[0-9]{3}-[0-9]{2}-[0-9]{4}"


def redact_pii(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """PII scrub — emails, phone-shaped numbers, SSN-shaped ids
    replaced with typed placeholder tokens, plus per-doc counts for
    the removal report. Pure ``regexp_replace`` / ``regexp_count``
    chains: JVM-side, scan-speed, order of substitution fixed
    (SSN before phone — an SSN also matches the looser phone shape).
    """
    t = F.col(text_col)
    n_ssn = F.regexp_count(t, F.lit(PII_SSN))
    t1 = F.regexp_replace(t, PII_SSN, "<ID>")
    n_email = F.regexp_count(t1, F.lit(PII_EMAIL))
    t2 = F.regexp_replace(t1, PII_EMAIL, "<EMAIL>")
    n_phone = F.regexp_count(t2, F.lit(PII_PHONE))
    t3 = F.regexp_replace(t2, PII_PHONE, "<PHONE>")
    return docs.select(
        F.col(id_col),
        n_ssn.cast("bigint").alias("n_ssn"),
        n_email.cast("bigint").alias("n_emails"),
        n_phone.cast("bigint").alias("n_phones"),
        t3.alias("clean_text"),
    )


def domain_mix_sample(
    docs: DataFrame,
    mix: dict[str, int],
    domain_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic domain-mixture resampling — the "data mixing"
    step of a training pipeline: draw the LARGEST corpus whose
    domain proportions exactly match ``mix`` (per-mille weights,
    summing to 1000). Domains outside ``mix`` are dropped.

    The output size is limited by the scarcest domain relative to its
    weight: n_out = min_d floor(n_d * 1000 / w_d), and each domain
    contributes floor(n_out * w_d / 1000) rows — all integer
    arithmetic, so both engines agree exactly. Row selection is the
    md5(id) ranking of :func:`stratified_sample` (stable across runs
    and corpus growth). Plan: one tiny per-domain count (broadcast
    back), one rank window per domain — the only shuffle of the fact
    is the per-domain window, carrying (id, domain) pairs."""
    from ..functions.hashing import md5_int

    if sum(mix.values()) != 1000:
        raise ValueError(
            f"mix weights must be per-mille summing to 1000, got {sum(mix.values())}"
        )
    wcol = None
    for d, w in mix.items():
        c = F.when(F.col(domain_col) == d, F.lit(w))
        wcol = c if wcol is None else wcol.when(F.col(domain_col) == d, F.lit(w))
    rows = (
        docs.select(F.col(id_col), F.col(domain_col))
        .withColumn("w", wcol.cast("bigint"))
        .where(F.col("w").isNotNull())
    )
    counts = rows.groupBy(domain_col, "w").agg(F.count("*").alias("n_d"))
    n_out = counts.agg(
        F.min(F.expr("n_d * 1000 DIV w")).alias("n_out")
    )
    quota = (
        counts.crossJoin(F.broadcast(n_out))
        .select(F.col(domain_col), F.expr("n_out * w DIV 1000").alias("quota"))
    )
    w_rank = Window.partitionBy(domain_col).orderBy(
        md5_int(F.col(id_col).cast("string")).asc(), F.col(id_col).asc()
    )
    return (
        rows.withColumn("rn", F.row_number().over(w_rank))
        .join(F.broadcast(quota), domain_col)
        .where(F.col("rn") <= F.col("quota"))
        .select(id_col, domain_col)
    )


def domain_temperature_sample(
    docs: DataFrame,
    n_total: int,
    alpha: float = 0.5,
    domain_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-based domain mixing (the mT5 / multilingual-LM
    recipe, Xue et al. 2021 §3.1): sample ``n_total`` docs with
    per-domain quotas ∝ n_d^alpha — alpha < 1 UPSAMPLES tail domains
    relative to their natural share, the standard fix for head-domain
    dominance. :func:`domain_mix_sample` takes explicit weights; this
    one derives them from the corpus itself.

    Cross-engine determinism is why alpha is restricted to {1.0,
    0.5}: sqrt is IEEE-754 correctly rounded in every engine, so
    ``floor(sqrt(n_d)·10^6)`` is bit-identical micro-weights and all
    downstream arithmetic is integer (quota = n_total·w_d DIV Σw,
    capped at n_d; selection is the md5-rank stable sample). A
    general pow(n, alpha) differs in last-bit across libm
    implementations and would flip floor boundaries — anyone adding
    alphas should gate those rows-only.

    Plan: one tiny per-domain count broadcast back; one per-domain
    rank window over (id, domain) pairs — same shuffle posture as
    domain_mix_sample.
    """
    from ..functions.hashing import md5_int

    if alpha not in (1.0, 0.5):
        raise ValueError(
            "alpha restricted to 1.0 or 0.5 (IEEE-exact cross-engine); "
            f"got {alpha}"
        )
    rows = docs.select(F.col(id_col), F.col(domain_col))
    counts = rows.groupBy(domain_col).agg(F.count("*").alias("n_d"))
    w = (
        F.floor(F.sqrt(F.col("n_d").cast("double")) * 1_000_000)
        if alpha == 0.5
        else (F.col("n_d") * 1_000_000)
    )
    weighted = counts.select(
        F.col(domain_col), F.col("n_d"), w.cast("bigint").alias("w")
    )
    tot = weighted.agg(F.sum("w").alias("tw"))
    quota = (
        weighted.crossJoin(F.broadcast(tot))
        .select(
            F.col(domain_col),
            F.least(
                F.col("n_d"),
                F.expr(f"CAST({n_total} AS BIGINT) * w DIV tw"),
            ).alias("quota"),
        )
    )
    w_rank = Window.partitionBy(domain_col).orderBy(
        md5_int(F.col(id_col).cast("string")).asc(), F.col(id_col).asc()
    )
    return (
        rows.withColumn("rn", F.row_number().over(w_rank))
        .join(F.broadcast(quota), domain_col)
        .where(F.col("rn") <= F.col("quota"))
        .select(id_col, domain_col)
    )


def token_budget_sample(
    docs: DataFrame,
    budgets: dict[str, int],
    domain_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Token-budget mixture sampling — the unit that actually matters
    to a pretraining run: each domain contributes documents until its
    TOKEN budget is exhausted (domain_mix_sample's row-count quotas
    under-weight long-doc domains). The standard "N billion tokens of
    web, M of code" mixture spec, executed deterministically.

    Docs rank within their domain by md5(id) (the stratified_sample
    ordering: stable across runs AND corpus growth); a doc is kept
    while the RUNNING token total up to and including it stays within
    budget — so the output is the maximal md5-prefix of each domain
    under its cap, all integer arithmetic, engine-exact. The first
    over-budget doc is NOT truncated (document-granular sampling;
    chunking is a separate stage).

    Plan: n_tokens is an in-row projection; rank + running sum share
    ONE window per domain (the only shuffle, carrying (id, domain,
    n_tokens) triples — text never moves); domains outside ``budgets``
    drop at the scan via a pushed IN filter."""
    from pyspark.sql import Window

    from ..functions.hashing import md5_int
    from ..functions.text import tokens

    if not budgets:
        raise ValueError("empty budget map")
    doms = sorted(budgets)
    bcol = None
    for d in doms:
        c = F.when(F.col(domain_col) == d, F.lit(int(budgets[d])))
        bcol = c if bcol is None else bcol.when(
            F.col(domain_col) == d, F.lit(int(budgets[d]))
        )
    sized = docs.where(F.col(domain_col).isin(doms)).select(
        F.col(id_col),
        F.col(domain_col),
        F.coalesce(
            F.size(tokens(F.col(text_col))).cast("bigint"), F.lit(0)
        ).alias("n_tokens"),
        bcol.cast("bigint").alias("budget"),
    )
    w = Window.partitionBy(domain_col).orderBy(
        md5_int(F.col(id_col).cast("string")).asc(), F.col(id_col).asc()
    )
    return (
        sized.withColumn("running", F.sum("n_tokens").over(w))
        .where(F.col("running") <= F.col("budget"))
        .select(id_col, domain_col, "n_tokens", "running")
    )


def char_entropy(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    engine: str = "sql",
) -> DataFrame:
    """Character-level Shannon entropy per document — the classic
    gibberish / low-information filter (random keyboard mash scores
    high, repeated filler scores low, natural prose sits ~4 bits).

    In-row and O(n log n): sort the char array once, find run
    boundaries, diff them into run lengths, fold -Σ p·log2(p) over
    the lengths (a per-distinct-char transform+filter histogram is
    O(distinct × length) — ~50× more work on prose-sized docs). No
    explode, no shuffle — a global char-histogram groupBy would
    shuffle |docs|×|alphabet| rows for a per-doc statistic that never
    needed to leave the row. The fold visits runs in sorted-char
    order, the same order as the SQL oracle (identical float ops).

    ``engine``: "sql" (default) = the oracle-deterministic in-row
    fold above; "arrow" = per-batch numpy histogram (np.unique per
    doc over UTF-16 units — the same units Java's split("") yields) —
    one C-speed pass instead of an interpreted O(n log n) sort +
    boundary filter per row. 6-dp-rounded equality vs sql is
    pytest-gated on the corpus + adversarial unicode docs (float
    summation order can differ in the last ulp, invisible at 6 dp)."""
    if engine == "arrow":
        return _char_entropy_arrow(docs, id_col, text_col)
    if engine != "sql":
        raise ValueError(f"unknown char_entropy engine: {engine}")
    chars = F.filter(
        F.split(F.lower(F.col(text_col)), ""), lambda c: c != F.lit("")
    )
    base = docs.select(
        F.col(id_col), F.array_sort(chars).alias("cs")
    ).where(F.size("cs") > 0)
    n = F.size("cs")
    # 1-based end position of every run of equal chars — materialized
    # as a column: the run-length zip below references it twice, and
    # interpreted higher-order exprs get no common-subexpression
    # elimination, so inlining would run the O(n) boundary filter
    # twice per row (CollapseProject keeps non-cheap duplicated
    # expressions staged).
    ends = F.filter(
        F.sequence(F.lit(1), n),
        lambda i: (i == n)
        | (F.element_at("cs", (i + 1).cast("int")) != F.element_at("cs", i.cast("int"))),
    )
    staged = base.select(F.col(id_col), F.col("cs"), ends.alias("_ends"))
    # run length = this end minus the previous end (0 for the first)
    lens = F.zip_with(
        F.col("_ends"),
        F.concat(F.array(F.lit(0)), F.slice("_ends", 1, F.size("_ends") - 1)),
        lambda e, p: (e - p).cast("double"),
    )
    nd = n.cast("double")
    ent = -F.aggregate(
        lens,
        F.lit(0.0),
        lambda acc, c: acc + (c / nd) * F.log2(c / nd),
    )
    return staged.select(
        F.col(id_col),
        n.cast("bigint").alias("n_chars"),
        F.round(ent, 6).alias("entropy_bits"),
    )


def _char_entropy_arrow(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Arrow engine for :func:`char_entropy`: np.unique over the
    lowered text's UTF-16 code units per doc. Empty/NULL docs are
    dropped, matching the sql path's size > 0 filter."""
    import numpy as np
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            ids, ns, ents = [], [], []
            for i, t in zip(pdf[id_col].values, pdf[text_col].values):
                if t is None:
                    continue
                units = np.frombuffer(
                    t.lower().encode("utf-16-le"), dtype=np.uint16
                )
                if units.size == 0:
                    continue
                _, counts = np.unique(units, return_counts=True)
                p = counts / units.size
                ids.append(i)
                ns.append(units.size)
                ents.append(round(float(-(p * np.log2(p)).sum()), 6))
            yield pd.DataFrame(
                {id_col: pd.Series(ids, dtype="int64"),
                 "n_chars": pd.Series(ns, dtype="int64"),
                 "entropy_bits": pd.Series(ents, dtype="float64")}
            )

    return docs.select(id_col, text_col).mapInPandas(
        kernel, schema=f"{id_col} long, n_chars bigint, entropy_bits double"
    )


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 20,
    max_words: int = 100_000,
    min_mean_wl: float = 3.0,
    max_mean_wl: float = 10.0,
    max_bullet_ratio: float = 0.9,
    max_ellipsis_ratio: float = 0.3,
    min_alpha_ratio: float = 0.8,
    min_stop_hits: int = 2,
    keep_cols: tuple = (),
) -> DataFrame:
    """Gopher-style heuristic quality rules (Rae et al. 2021 §A1.1,
    public): per-document boolean flags + the conjunctive keep
    decision a pretraining pipeline applies before any expensive
    stage. ``keep_cols`` passes input columns through (e.g. the text
    column, so a downstream scorer can chain off the SAME scan
    instead of joining two corpus-sized projections — the
    classifier-calibration composition).

    Rules: word-count band, mean-word-length band, bullet-line and
    ellipsis-line ratios, fraction of words containing an alphabetic
    character, and a minimum count of the 8 canonical stopword hits.

    Staged projections, all in-row (no explode, no join, no shuffle):
    the token/line arrays materialize ONCE, the scalar metrics
    reference those columns, and the flags + keep reference the
    scalars — interpreted higher-order exprs get no common-
    subexpression elimination, so a single flat projection would
    re-tokenize per flag and the keep-conjunction would re-run every
    flag again (~14 tokenizer passes instead of 1). The rules run at
    scan speed and the corpus never moves — the posture a 100 TB
    pre-filter must have."""
    arrays = docs.select(
        F.col(id_col),
        tokens(F.col(text_col)).alias("_toks"),
        F.split(F.col(text_col), "\n").alias("_lines"),
        *[F.col(c) for c in keep_cols],
    )
    toks, lines = F.col("_toks"), F.col("_lines")
    n_words = F.size(toks)
    n_lines = F.size(lines)
    # try_divide, not `/`: Spark 4 defaults to ANSI mode where x/0
    # THROWS — a single empty document would kill the whole 100 TB
    # job. try_divide yields NULL, which is also what the DuckDB
    # oracle's plain division produces, so the engines stay aligned;
    # NULL metrics fail their flag via the coalesce(false) below.
    metrics = arrays.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        n_words.alias("_nw"),
        F.try_divide(
            F.aggregate(
                F.transform(toks, lambda t: F.length(t).cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            n_words.cast("double"),
        ).alias("_mwl"),
        F.size(F.filter(toks, lambda t: t.isin(*GOPHER_STOPWORDS))).alias(
            "_stop"
        ),
        F.try_divide(
            F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))).cast("double"),
            n_words.cast("double"),
        ).alias("_alpha"),
        (
            F.size(
                F.filter(
                    lines,
                    lambda ln: ln.startswith("- ")
                    | ln.startswith("* ")
                    | ln.startswith("•"),
                )
            ).cast("double")
            / n_lines.cast("double")
        ).alias("_bullet"),
        (
            F.size(F.filter(lines, lambda ln: ln.endswith("..."))).cast(
                "double"
            )
            / n_lines.cast("double")
        ).alias("_ellipsis"),
    )
    def _flag(cond):
        # NULL metric (empty doc) → the flag FAILS, not propagates
        return F.coalesce(cond, F.lit(False))

    flags = {
        "ok_words": _flag(
            (F.col("_nw") >= min_words) & (F.col("_nw") <= max_words)
        ),
        "ok_word_len": _flag(
            (F.col("_mwl") >= min_mean_wl) & (F.col("_mwl") <= max_mean_wl)
        ),
        "ok_bullets": _flag(F.col("_bullet") <= max_bullet_ratio),
        "ok_ellipsis": _flag(F.col("_ellipsis") <= max_ellipsis_ratio),
        "ok_alpha": _flag(F.col("_alpha") >= min_alpha_ratio),
        "ok_stop": _flag(F.col("_stop") >= min_stop_hits),
    }
    keep = None
    for c in flags.values():
        keep = c if keep is None else (keep & c)
    return metrics.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        *[c.alias(name) for name, c in flags.items()],
        keep.alias("keep"),
    )

def c4_rules(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_line_words: int = 5,
    min_lines_kept: int = 3,
) -> DataFrame:
    """C4-style cleaning (Raffel et al. 2020 §2.2, the public heuristic
    set): LINE-level filtering + PAGE-level discard flags, the other
    half of the rule-based pre-filter family next to
    :func:`gopher_rules` (page-level only).

    Line rules (a line survives if ALL hold): ends in terminal
    punctuation (``. ! ? "`` after right-trim), has at least
    ``min_line_words`` words, and does not mention "javascript"
    (the C4 boilerplate tell). Page rules: at least ``min_lines_kept``
    surviving lines, no ``{`` anywhere (code tell), no "lorem ipsum".
    ``keep`` is the conjunction; ``clean_text`` is the surviving lines
    rejoined — what the pipeline feeds forward when keep is true.

    Same scale posture as gopher_rules: staged projections, all
    in-row — the line array materializes once, the filtered array
    references it, flags reference the scalars; no explode, no join,
    no shuffle; the corpus never moves. (The fourth C4 rule — the
    three-sentence-span dedup — is corpus-level, not per-doc: that is
    :func:`dedup.line_dedup` / :func:`dedup.repeated_spans`.)
    """
    lines = F.split(F.col(text_col), "\n")
    arrays = docs.select(
        F.col(id_col),
        F.col(text_col),
        F.filter(
            lines,
            lambda ln: F.rtrim(ln).rlike('[.!?"]$')
            & (
                F.size(F.filter(F.split(ln, " "), lambda w: w != ""))
                >= min_line_words
            )
            & ~F.lower(ln).contains("javascript"),
        ).alias("_kept"),
        F.size(lines).alias("n_lines"),
    )
    staged = arrays.select(
        F.col(id_col),
        F.col("n_lines"),
        F.size(F.col("_kept")).alias("n_lines_kept"),
        F.array_join(F.col("_kept"), "\n").alias("clean_text"),
        (~F.col(text_col).contains("{")).alias("ok_brace"),
        (~F.lower(F.col(text_col)).contains("lorem ipsum")).alias("ok_lorem"),
    )
    keep = (
        (F.col("n_lines_kept") >= min_lines_kept)
        & F.col("ok_brace")
        & F.col("ok_lorem")
    )
    return staged.select(
        id_col, "n_lines", "n_lines_kept", "clean_text",
        "ok_brace", "ok_lorem", keep.alias("keep"),
    )


# 2^60 + 1: md5_int yields 60-bit non-negative ints, so (h+1)/DENOM
# is a uniform draw in (0, 1] — never 0, so ln(u) is finite.
_ARES_DENOM = float((1 << 60) + 1)


def weighted_sample(
    docs: DataFrame,
    n: int,
    weight_col,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement —
    Efraimidis–Spirakis A-Res (IPL 2006, public): each row draws a
    uniform u and ranks by u^(1/w); the top-n win with probability
    proportional to their weights. The uniform is md5-derived from the
    id, so the sample is reproducible across engines and runs (no RNG
    state), and re-running on a grown corpus keeps every row's draw
    stable — rows never churn in and out of the sample except by
    displacement.

    Ranking uses the monotone-equivalent ``ln(u)/w`` (avoids pow; one
    log per row), rounded to 12 dp with an id tie-break so the top-n
    boundary is engine-stable. The whole thing compiles to a map +
    TakeOrderedAndProject — k·P rows to the driver, no shuffle of the
    corpus, the same scale posture as flat kNN."""
    from ..functions.hashing import md5_int

    u = (md5_int(F.col(id_col).cast("string"), seed=7) + 1) / F.lit(_ARES_DENOM)
    # Non-positive weights → NULL key, which sorts last under desc, so
    # w<=0 rows are never sampled — the semantically right reading of
    # "no weight". The explicit w>0 gate matters for w<0: ln(u)<0
    # divided by a negative weight is POSITIVE and would otherwise
    # deterministically beat every valid row. try_divide keeps the
    # w→0⁻ ANSI-safety as a second fence.
    w = F.when(weight_col > 0, weight_col).cast("double")
    key = F.round(F.try_divide(F.log(u), w), 12)
    return (
        docs.select(F.col(id_col), key.alias("sample_key"))
        .orderBy(F.col("sample_key").desc(), F.col(id_col).asc())
        .limit(n)
    )

def corpus_profile(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One-query corpus health report — the summary a pipeline
    operator reads before deciding what to run next: volume (docs,
    tokens), duplication (distinct texts, dup rate), per-language
    counts, mean quality, and median length, as (metric, value) rows.

    Every branch is a tiny aggregate of one shared scan; Catalyst
    plans the union as parallel partial aggregations. Mean quality
    sums per-doc 6-dp-rounded scores as exact DECIMALs (summation-
    order-free) and divides once — the same determinism discipline as
    the TPC-H rollups."""
    n_tokens, quality = quality_exprs(F.col(text_col), F.col("_toks"))
    base = docs.select(
        F.col(id_col), F.col(text_col), F.col("n_chars"),
        tokens(F.col(text_col)).alias("_toks"),
    ).select(
        F.col(id_col),
        F.col(text_col),
        F.col("n_chars"),
        n_tokens.alias("_nt"),
        quality.alias("_q"),
    )

    def metric(name, col):
        return base.agg(col.cast("double").alias("value")).select(
            F.lit(name).alias("metric"), "value"
        )

    rows = [
        metric("n_docs", F.count("*")),
        metric("n_tokens", F.sum("_nt")),
        metric("distinct_texts", F.count_distinct(F.col(text_col))),
        metric(
            "dup_rate",
            F.round(
                1.0
                - F.count_distinct(F.col(text_col)).cast("double")
                / F.count("*").cast("double"),
                6,
            ),
        ),
        metric(
            "mean_quality",
            # count("_q") (non-null = scoreable docs), not count(*):
            # empty docs carry a NULL quality and must not dilute the
            # mean — the oracle's n_tokens>0 CTE has the same contract
            F.round(
                F.sum(F.col("_q").cast("decimal(10,6)")).cast("double")
                / F.count("_q").cast("double"),
                6,
            ),
        ),
        metric("median_chars", F.median("n_chars")),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    langs = (
        docs.groupBy("lang")
        .agg(F.count("*").cast("double").alias("value"))
        .select(
            F.concat(F.lit("lang:"), F.col("lang")).alias("metric"), "value"
        )
    )
    return out.unionByName(langs)


def normalize_text(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Canonical text cleanup — the C4/RefinedWeb-style normalization
    pass a pipeline runs before hashing or dedup (control characters
    poison exact-dedup hashes; whitespace and punctuation runs inflate
    shingle diversity between otherwise-identical documents).

    Steps, each a single codegen'd regexp_replace (patterns restricted
    to the Java-regex ∩ RE2 subset — character classes and ``+``, no
    backreferences, which RE2 lacks):
      1. C0/DEL control characters (except tab/newline handled next)
         become spaces;
      2. whitespace runs collapse to one space;
      3. ``!``/``?`` runs squeeze to one; 4+ dot runs to ``...``;
      4. trim.
    Output keeps the cleaned text plus (changed, n_chars_removed) so a
    pipeline can gate on "how much cleanup happened" — heavy removal
    correlates with boilerplate/binary junk. Zero shuffle, zero joins:
    a pure projection at scan speed."""
    s = F.col(text_col)
    s = F.regexp_replace(s, "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]", " ")
    s = F.regexp_replace(s, "[ \\t\\n\\r]+", " ")
    s = F.regexp_replace(s, "!!+", "!")
    s = F.regexp_replace(s, "\\?\\?+", "?")
    s = F.regexp_replace(s, "\\.\\.\\.\\.+", "...")
    s = F.trim(s)
    return docs.select(
        F.col(id_col),
        s.alias("norm_text"),
        (s != F.col(text_col)).alias("changed"),
        (F.length(text_col) - F.length(s)).cast("bigint").alias(
            "n_chars_removed"
        ),
    )


def ngram_novelty(
    docs: DataFrame,
    w: int = 8,
    hash_fn: str = "xxhash64",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a document's
    w-token window occurrences whose gram appears exactly once in the
    whole corpus — a memorization-risk / contribution profile (a doc
    whose grams all repeat elsewhere adds nothing the corpus doesn't
    already have; the flip side of the repeated-span detector, which
    reports the duplicated mass, this reports the unique mass).

    Plan: tokens stage in-row, windows build in-row (one transform
    over the staged array), and only 16-byte ``(doc_id, gram_hash)``
    pairs ever explode — the corpus text never shuffles. A WINDOW
    count over the exploded frame was the first formulation and
    measured SUPERLINEAR at 10x (0.95 -> 14.4 s: windows sort the full
    gram stream with no partial aggregation); the shipped shape is all
    map-side-combinable groupBys — the key insight being that a
    count-1 gram belongs to exactly ONE (doc, pos), so ``min(doc_id)``
    in the same gram rollup recovers its owner with NO join back to
    the exploded frame. Per-doc window totals come from the staged
    array in-row (``size``, zero shuffle); a within-doc repeat is
    corpus count >= 2, hence non-novel by construction.

    Docs with fewer than ``w`` tokens have no windows and emit no row
    (same scoreable-row contract as quality_score's n_tokens > 0).
    """
    staged = docs.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks")
    )
    # The per-doc window TOTAL is pure arithmetic on the token count —
    # max(n_toks - w + 1, 0) — so the counting branch never builds
    # grams at all. (A size(_grams) > 0 filter here measured 60x
    # slower: predicate pushdown re-inlined the tokenizer inside every
    # element_at of the pushed gram transform — the §4 interpreted-HOF
    # re-inline killer, now with the filter as the pusher.)
    per_doc = staged.select(
        F.col(id_col),
        F.greatest(F.size("_toks") - (w - 1), F.lit(0))
        .cast("bigint")
        .alias("n_grams"),
    ).where(F.col("n_grams") > 0)
    if hash_fn == "xxhash64":
        # production gram hash: per-token xxhash64 once, one fixed-
        # width combine per window (the span-dedup r11 hasher, seeded
        # by this op's 23) — no per-position gram-string allocation;
        # same 64-bit gram identity, output measured identical
        from ..functions.text import token_hashes, window_hashes

        th = staged.select(
            F.col(id_col), token_hashes(F.col("_toks"), seed=23).alias("_th")
        )
        exploded = th.select(
            F.col(id_col),
            F.explode(window_hashes(F.col("_th"), w)).alias("gh"),
        )
    else:
        k = F.size(F.col("_toks")) - (w - 1)
        grams = F.transform(
            F.when(k <= 0, F.array().cast("array<int>")).otherwise(
                F.sequence(F.lit(1), k)
            ),
            lambda i: F.concat_ws(
                " ", *[F.element_at(F.col("_toks"), i + j) for j in range(w)]
            ),
        )
        exploded = staged.select(
            F.col(id_col), F.explode(grams).alias("gram")
        ).select(
            F.col(id_col),
            hashed(F.col("gram"), seed=23, hash_fn=hash_fn).alias("gh"),
        )
    novel = (
        exploded.groupBy("gh")
        .agg(F.count("*").alias("c"), F.min(id_col).alias(id_col))
        .where(F.col("c") == 1)
        .groupBy(id_col)
        .agg(F.count("*").cast("bigint").alias("n_novel"))
    )
    return per_doc.join(novel, on=id_col, how="left").select(
        F.col(id_col),
        F.col("n_grams"),
        F.coalesce(F.col("n_novel"), F.lit(0)).cast("bigint").alias("n_novel"),
        F.round(
            F.coalesce(F.col("n_novel"), F.lit(0)).cast("double")
            / F.col("n_grams"),
            6,
        ).alias("novelty"),
    )


def curriculum_order(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    domain_col: str = "source",
) -> DataFrame:
    """Curriculum epoch plan: documents ordered easy-to-hard (quality
    descending as the difficulty proxy) with domains interleaved
    round-robin, so early training batches are both clean AND mixed —
    the standard curriculum + domain-balance ordering for LLM
    pretraining runs.

    The global position is NOT a global row_number (a single ORDER BY
    window serializes the whole corpus through one partition at
    100 TB). Instead: each doc gets a per-domain rank (parallel
    windows, one shuffle of (id, domain, quality) triples), per-domain
    counts collect to the driver (bounded by the domain vocabulary,
    like every dimension broadcast), and the interleaved position is
    computed ARITHMETICALLY in-row:

        pos(rank r, domain j) = 1 + sum_i min(c_i, r-1)     [full earlier rounds]
                                  + #{i < j : c_i >= r}     [same round, earlier domain]

    which reproduces ORDER BY (rank, domain) exactly — gated against
    the oracle's literal global-sort formulation.
    """
    # domain rides the quality scan as a passenger column (extra_cols)
    # instead of a corpus self-join on the id: the r11 plan carried a
    # second parquet scan + BroadcastHashJoin purely to re-attach a
    # column the doc row already had (guide §2.4 — remove shuffles/
    # joins outright). Output rows identical: the inner join on a
    # unique id against a per-row projection of the same frame is
    # exactly "filter to n_tokens > 0 and keep domain".
    j = quality_score(
        docs, id_col=id_col, text_col=text_col, extra_cols=(domain_col,)
    )
    w = Window.partitionBy(domain_col).orderBy(
        F.col("quality").desc(), F.col(id_col).asc()
    )
    ranked = j.select(
        F.col(id_col),
        F.col(domain_col),
        F.col("quality"),
        F.row_number().over(w).alias("rank"),
    )
    # per-domain counts need no window and no rank: count the ranked
    # frame's INPUT (same cardinality — row_number is 1:1). This
    # driver-bounded collect (domain vocabulary) runs at plan-build
    # time; counting pre-window keeps it a scan + map-side-combinable
    # aggregation instead of re-running the join+window pipeline.
    counts = sorted(
        (r[0], r[1])
        for r in j.groupBy(domain_col).count().collect()
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
        F.col(id_col),
        F.col(domain_col),
        F.col("quality"),
        F.col("rank").cast("bigint").alias("rank"),
    )


def ccnet_buckets(
    docs: DataFrame,
    model_docs: DataFrame | None = None,
    hash_fn: str = "xxhash64",
    id_col: str = "doc_id",
    text_col: str = "text",
    domain_col: str = "source",
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al., LREC 2020):
    label every document head / middle / tail by fluency terciles
    WITHIN its domain — the standard "keep the head, audit the middle,
    drop the tail" crawl-filtering gate, using the corpus bigram LM
    (operators/lm.py) as the perplexity stand-in.

    Terciles are per-domain ``ntile(3)`` windows over (fluency desc,
    id) — parallel across domains, integer-exact in both engines, and
    deterministic under ties; no global sort anywhere. Only (id,
    domain, fluency) triples shuffle. Docs the LM cannot score
    (< 2 tokens) emit no row, matching bigram_lm_score's contract.
    """
    from . import lm

    model = lm.bigram_lm_train(
        model_docs if model_docs is not None else docs,
        id_col=id_col,
        text_col=text_col,
    )
    # domain rides the scoring aggregation (extra_cols) instead of a
    # corpus-vs-corpus join back onto docs — one fewer corpus-sized
    # join input; fluency/tercile values unchanged
    j = lm.bigram_lm_score(
        docs, model, id_col=id_col, text_col=text_col,
        extra_cols=(domain_col,),
    )
    w = Window.partitionBy(domain_col).orderBy(
        F.col("fluency").desc(), F.col(id_col).asc()
    )
    t = F.ntile(3).over(w)
    return j.select(
        F.col(id_col),
        F.col(domain_col),
        F.col("fluency"),
        t.cast("int").alias("tercile"),
        F.when(t == 1, "head")
        .when(t == 2, "middle")
        .otherwise("tail")
        .alias("bucket"),
    )


def zipf_profile(
    docs: DataFrame,
    top_n: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Vocabulary-statistics report: total tokens, vocabulary size,
    hapax-legomenon count/fraction, head coverage (mass share of the
    ``top_n`` terms), and the fitted Zipf slope — the corpus-health
    numbers that catch tokenizer regressions, boilerplate floods
    (coverage spikes), and synthetic/duplicated text (hapax collapse)
    before they reach training.

    Plan: ONE map-side-combinable (token, count) rollup; the totals
    are an aggregate of that model-sized frame, the head is
    TakeOrderedAndProject (top_n rows — no global rank window over the
    vocabulary), and the slope is ordinary least squares on
    (ln rank, ln count) over those top_n rows. Cross-engine: every
    ln-derived term rounds to DECIMAL(18,8) BEFORE the order-free
    decimal sums (the lm.py no-raw-double-accumulation discipline);
    the slope combines the exact sums in doubles once, rounded 6.
    """
    toks = docs.select(F.explode(tokens(F.col(text_col))).alias("tok"))
    counts = toks.groupBy("tok").agg(F.count("*").alias("c"))
    tot = counts.agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count("*").cast("bigint").alias("vocab_size"),
        F.sum((F.col("c") == 1).cast("bigint")).alias("hapax_count"),
    )
    top = counts.orderBy(F.col("c").desc(), F.col("tok").asc()).limit(top_n)
    w = Window.orderBy(F.col("c").desc(), F.col("tok").asc())
    DEC = "decimal(18,8)"
    lr = F.log(F.col("r").cast("double"))
    lc = F.log(F.col("c").cast("double"))
    terms = top.select(
        F.col("c"), F.row_number().over(w).alias("r")
    ).select(
        F.col("c"),
        F.round(lr, 8).cast(DEC).alias("x"),
        F.round(lc, 8).cast(DEC).alias("y"),
        F.round(lr * lc, 8).cast(DEC).alias("xy"),
        F.round(lr * lr, 8).cast(DEC).alias("xx"),
    )
    sums = terms.agg(
        F.count("*").cast("double").alias("k"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum("xy").cast("double").alias("sxy"),
        F.sum("xx").cast("double").alias("sxx"),
        F.sum("c").cast("bigint").alias("head_mass"),
    )
    row = tot.crossJoin(sums)
    slope = F.try_divide(
        F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy"),
        F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx"),
    )
    staged = row.select(F.round(slope, 6).alias("_slope"), "*")
    return staged.select(
        F.expr(
            "stack(6, "
            "'n_tokens', cast(n_tokens as double), "
            "'vocab_size', cast(vocab_size as double), "
            "'hapax_count', cast(hapax_count as double), "
            "'hapax_frac', round(cast(hapax_count as double) / vocab_size, 6), "
            "'top_coverage', round(cast(head_mass as double) / n_tokens, 6), "
            "'zipf_slope', _slope) as (metric, value)"
        )
    )


def fingerprint_overlap_search(
    docs: DataFrame,
    query_doc_id: int,
    gram: int = 8,
    w: int = 4,
    min_shared: int = 2,
    hash_fn: str = "md5",
    id_col: str = "doc_id",
    text_col: str = "text",
    top: int | None = None,
    engine: str = "sql",
) -> DataFrame:
    """MOSS-style provenance search (Schleimer et al., SIGMOD'03 §5):
    which documents share winnowing fingerprints with a query doc —
    the plagiarism / copy-lineage question, robust to local edits
    because fingerprints are window-minima of char-gram hashes rather
    than exact spans.

    ``gram`` is the char-gram size (winnowing's k; renamed here so it
    can't read as a top-k). The result is every doc with at least
    ``min_shared`` shared fingerprints, ranked — a provenance report
    wants the full set, not a fixed cut; pass ``top`` to bound it.

    The query doc's fingerprint set is doc-bounded, so it BROADCASTS:
    the corpus fingerprint stream (winnowed, ~|text|/w entries per
    doc, built in-row) filters against it BEFORE any shuffle — only
    matching (id, fp) rows reach the count rollup, which is map-side
    combinable. ``containment`` = shared/|query fps|, the directional
    overlap score a plagiarism report ranks by.

    ``engine``: "sql" (default; required for the md5 oracle profile)
    builds fingerprints with one interpreted hash expression per char
    position; "arrow" (xxhash64 only) is
    :func:`winnow_fp_sets_arrow_xx` — the SAME fingerprints from a
    vectorized kernel, measured 2.6 s → ~0.5 s per corpus pass at
    sf0.1. Output is byte-identical either way (pytest-gated).
    """
    if engine == "arrow":
        if hash_fn != "xxhash64":
            raise ValueError(
                "fingerprint_overlap_search engine='arrow' implements the "
                "xxhash64 production family; md5 (the oracle profile) "
                "keeps engine='sql'"
            )

        # doc filters applied BELOW the kernel: a filter on a
        # mapInPandas output cannot push into the scan, so filtering
        # the fps frame would route the ENTIRE corpus through Python
        # once per branch (q, corpus, qn = three full passes)
        def fpset(side):
            return winnow_fp_sets_arrow_xx(side, gram, w, id_col, text_col)

        q_fps = fpset(docs.where(F.col(id_col) == query_doc_id))
        corpus_fps = fpset(docs.where(F.col(id_col) != query_doc_id))
    elif engine == "sql":
        fps = winnow_fp_sets(docs, gram, w, id_col, text_col, hash_fn)
        # the id predicates push below the in-row winnow projection to
        # the parquet scan, so the q branch prunes to one doc
        q_fps = fps.where(F.col(id_col) == query_doc_id)
        corpus_fps = fps.where(F.col(id_col) != query_doc_id)
    else:
        raise ValueError(f"unknown fingerprint_overlap engine: {engine}")
    # explode_outer, NOT explode: plain explode makes Catalyst infer a
    # size(fps) > 0 filter and push it below the projection, re-
    # inlining the whole winnow pipeline inside its own per-position
    # lambdas — O(|text|^2) hash calls per row (the minhash_signatures
    # lesson; measured as a >100x hang here). The sets are non-empty
    # by construction.
    q = q_fps.select(F.explode_outer("fps").alias("fp"))
    corpus = corpus_fps.select(
        F.col(id_col), F.explode_outer("fps").alias("fp")
    )
    hits = (
        corpus.join(F.broadcast(q), "fp")
        .groupBy(id_col)
        .agg(F.count("*").cast("bigint").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
    qn = q.agg(F.count("*").alias("_nq"))
    out = (
        hits.crossJoin(F.broadcast(qn))
        .select(
            F.col(id_col),
            F.col("n_shared"),
            F.round(
                F.col("n_shared").cast("double") / F.col("_nq"), 6
            ).alias("containment"),
        )
        .orderBy(F.col("n_shared").desc(), F.col(id_col).asc())
    )
    return out.limit(top) if top is not None else out
