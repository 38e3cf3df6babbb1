"""Byte-pair-encoding tokenizer — the real subword tokenizer the
token-counting heuristic (textstats.token_count's BPE-ish regex)
stands in for. Classic word-level BPE (Sennrich et al., ACL 2016,
public): train = iterative merge of the most frequent adjacent symbol
pair over a word-frequency table; apply = replay merges per word.

Scale design
------------
Training state is a WORD-FREQUENCY table, not the corpus: one
map-side-combinable groupBy over the token explode, then the top
``max_words`` (Zipf-bounded — coverage loss beyond the head is
negligible) collect to the driver where the merge loop runs in plain
Python on counts. This is the engine's standing driver-held-model
posture (k-means centroids, PCA bases, SQ bounds): the model is small,
the data pass is one aggregation.

Application is Arrow-batched mapInPandas with the merge ranks as a
per-worker dict — one pass, no shuffle, no join; encoding is
embarrassingly parallel per row.

Determinism: pair selection ties break (count desc, pair lexicographic
asc); word-table truncation ties break (count desc, word asc). Same
corpus → same merges → same ids, across runs and partitionings.

Round-trip contract: BPE of the CANONICAL token stream (functions.text
.tokens: lowercased, split on non-alphanumerics) — decode reproduces
exactly `" ".join(tokens(text))`, gated in tests; raw-byte fidelity is
out of scope by construction (the reference pipeline chunks canonical
text too).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

END = "</w>"  # word-end marker, the classic Sennrich convention


def _word_counts(docs: DataFrame, text_col: str) -> DataFrame:
    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def bpe_train(
    docs: DataFrame,
    num_merges: int = 200,
    max_words: int = 50_000,
    text_col: str = "text",
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus's word-frequency
    table. Returns the ordered merge list (the whole model)."""
    rows = (
        _word_counts(docs, text_col)
        .orderBy(F.col("c").desc(), F.col("w").asc())
        .limit(max_words)
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {
        tuple(r.w) + (END,): r.c for r in rows
    }
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for word, c in vocab.items():
            for a, b in zip(word, word[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for word, c in vocab.items():
            out, i = [], 0
            while i < len(word):
                if (
                    i + 1 < len(word)
                    and word[i] == best[0]
                    and word[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    symbols = list(word) + [END]
    while len(symbols) > 1:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(symbols, symbols[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        symbols[best_i : best_i + 2] = [
            symbols[best_i] + symbols[best_i + 1]
        ]
    return symbols


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, pieces array<string>, n_pieces, n_words): the canonical
    token stream re-segmented into BPE pieces. Pure map — the merge
    ranks ride to workers inside the closure (model-sized), the corpus
    never shuffles."""
    import pandas as pd

    ranks = {tuple(m): i for i, m in enumerate(merges)}

    def kernel(batches):
        import re

        splitter = re.compile(r"[^a-z0-9]+")
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            ids, pieces, n_p, n_w = [], [], [], []
            for i, t in zip(pdf[id_col].values, pdf[text_col].values):
                words = (
                    [w for w in splitter.split(t.lower()) if w]
                    if t is not None
                    else []
                )
                out: list[str] = []
                for w in words:
                    enc = cache.get(w)
                    if enc is None:
                        enc = _encode_word(w, ranks)
                        if len(cache) < 200_000:  # bounded per-worker memo
                            cache[w] = enc
                    out.extend(enc)
                ids.append(i)
                pieces.append(out)
                n_p.append(len(out))
                n_w.append(len(words))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "pieces": pieces,
                    "n_pieces": pd.Series(n_p, dtype="int64"),
                    "n_words": pd.Series(n_w, dtype="int64"),
                }
            )

    return docs.select(id_col, text_col).mapInPandas(
        kernel,
        schema=(
            f"{id_col} long, pieces array<string>, "
            "n_pieces bigint, n_words bigint"
        ),
    )


def bpe_decode_pieces(pieces: list[str]) -> str:
    """Driver-side inverse for the round-trip gate: pieces → canonical
    token stream (words joined by single spaces)."""
    return "".join(pieces).replace(END, " ").strip()


def bpe_fertility_report(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Per-language tokenizer-fit diagnostics: fertility (pieces per
    word) and compression (characters per piece) under a trained BPE
    model — the numbers that expose a tokenizer trained on one
    language shredding another (fertility spikes mean longer
    sequences, more compute, worse effective context for that
    language; the multilingual-tokenizer budget question).

    The encode is :func:`bpe_encode` unchanged (pure Arrow-batched
    map, model in the closure); the report joins its doc-grain output
    back to the narrow (id, lang) projection and rolls up integer
    sums — chars come from the canonical token stream (sum of piece
    lengths), so compression is exact arithmetic, not estimate.
    """
    enc = bpe_encode(docs, merges, id_col=id_col, text_col=text_col)
    per_doc = enc.select(
        F.col(id_col),
        F.col("n_pieces"),
        F.col("n_words"),
        F.aggregate(
            F.transform(F.col("pieces"), lambda p: F.length(p)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("n_chars"),
    )
    labeled = per_doc.join(
        docs.select(F.col(id_col), F.col(lang_col)), on=id_col
    )
    return (
        labeled.groupBy(lang_col)
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_words").cast("bigint").alias("n_words"),
            F.sum("n_pieces").cast("bigint").alias("n_pieces"),
            F.sum("n_chars").cast("bigint").alias("n_chars"),
        )
        .select(
            lang_col,
            "n_docs",
            "n_words",
            "n_pieces",
            F.round(
                F.try_divide(
                    F.col("n_pieces").cast("double"), F.col("n_words")
                ),
                6,
            ).alias("fertility"),
            F.round(
                F.try_divide(
                    F.col("n_chars").cast("double"), F.col("n_pieces")
                ),
                6,
            ).alias("chars_per_piece"),
        )
    )
