"""Document chunking (reference preprocessing/chunk_text_files.py).

Two tiers:

* :func:`chunk_fixed` — fixed-size/overlap chunking as pure built-ins
  (`sequence` → `explode` → `substring`), the scale path: chunk
  boundaries are data-independent, so Catalyst runs it at scan speed
  with zero Python. This is the oracle-gated variant.
* :func:`chunk_greedy` — the reference's greedy size-bounded chunker
  (paragraph → sentence splits, 500-2000 chars, overlap; conversational
  ``K:``/``V:`` turn splitting, chunk_text_files.py:85-273) as an
  Arrow-batched ``applyInPandas`` — inherently sequential *within* a
  document, embarrassingly parallel *across* documents. Gated by
  pytest invariants (size bounds, coverage, turn integrity).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHUNK_SCHEMA = "doc_id bigint, chunk_id int, start int, chunk string"


def chunk_fixed(
    docs: DataFrame,
    size: int = 200,
    overlap: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fixed-stride chunks: start positions 1, 1+stride, … (1-based,
    stride = size - overlap), last chunk may be short."""
    if size <= 0:
        raise ValueError(f"size must be positive, got {size}")
    if not 0 <= overlap < size:
        raise ValueError(
            f"overlap must satisfy 0 <= overlap < size (got overlap="
            f"{overlap}, size={size}): a non-positive stride would make "
            f"the start sequence degenerate or fail at runtime"
        )
    stride = size - overlap
    # greatest(len, 1): an empty-string doc still gets its one (empty)
    # chunk. NULL text stays NULL → explode drops the doc entirely —
    # without the guard, greatest(NULL, 1) = 1 would emit a phantom
    # NULL chunk per NULL-text doc (caught by test_adversarial).
    starts = F.when(
        F.col(text_col).isNotNull(),
        F.sequence(
            F.lit(1), F.greatest(F.length(text_col), F.lit(1)), F.lit(stride)
        ),
    )
    return docs.select(
        F.col(id_col),
        F.explode(starts).alias("start"),
        F.col(text_col),
    ).select(
        F.col(id_col),
        ((F.col("start") - 1) / stride).cast("int").alias("chunk_id"),
        F.col("start").cast("int").alias("start"),
        F.substring(F.col(text_col), F.col("start"), F.lit(size)).alias("chunk"),
    )


# --- greedy reference-style chunker (driver-side algorithm mirrored
# from the *behavior* of chunk_text_files.py:167-273, re-implemented) --


def _split_sentences(text: str) -> list[str]:
    parts = re.split(r"[.!?]+\s+", text)
    return [p.strip() for p in parts if p.strip()]


def _greedy_chunks(
    text: str, min_size: int, max_size: int, overlap: int
) -> list[str]:
    """Greedy paragraph-first packing with sentence fallback and char
    overlap — same contract as the reference's create_regular_chunks:
    chunks between min_size and max_size chars where possible, overlap
    carried from the previous chunk."""
    if not text.strip():
        return []
    paragraphs = [p.strip() for p in text.split("\n\n") if p.strip()]
    if not paragraphs:
        paragraphs = [text.strip()]
    chunks: list[str] = []
    cur = ""
    for para in paragraphs:
        nxt = f"{cur}\n\n{para}" if cur else para
        if cur and len(nxt) > max_size:
            if len(cur) >= min_size:
                chunks.append(cur)
                cur = cur[-overlap:] + "\n\n" + para if overlap else para
            else:
                cur = nxt
        else:
            cur = nxt
    if cur.strip():
        if len(cur) < min_size and chunks:
            chunks[-1] = chunks[-1] + "\n\n" + cur
        else:
            chunks.append(cur)
    # sentence-split any oversized chunk
    out: list[str] = []
    for ch in chunks:
        if len(ch) <= max_size:
            out.append(ch)
            continue
        sub = ""
        for sent in _split_sentences(ch):
            cand = f"{sub} {sent}" if sub else sent
            if sub and len(cand) > max_size:
                if len(sub) >= min_size:
                    out.append(sub)
                    sub = sent
                else:
                    sub = cand
            else:
                sub = cand
        if sub.strip():
            out.append(sub)
    return out


CONV_RE = re.compile(r"(?=(?:^|\s)[KV]:)", re.MULTILINE)


def _conversational_chunks(
    text: str, min_size: int, max_size: int, overlap_turns: int = 1
) -> list[str]:
    """Split at K:/V: speaker turns, packing turns to the size band
    with previous-turn overlap (reference chunk_text_files.py:85-164)."""
    turns = [t.strip() for t in CONV_RE.split(text) if t.strip()]
    if not turns:
        return [text] if text.strip() else []
    chunks: list[str] = []
    cur = ""
    for i, turn in enumerate(turns):
        nxt = f"{cur}\n\n{turn}" if cur else turn
        if cur and len(nxt) > max_size and len(cur) >= min_size:
            chunks.append(cur)
            start = max(0, i - overlap_turns)
            cur = "\n\n".join(turns[start : i + 1])
        else:
            cur = nxt
    if cur.strip():
        if len(cur) < min_size and chunks:
            chunks[-1] = chunks[-1] + "\n\n" + cur
        else:
            chunks.append(cur)
    return chunks


def chunk_greedy(
    docs: DataFrame,
    min_size: int = 500,
    max_size: int = 2000,
    overlap: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Reference-style greedy chunking over a corpus: Arrow-batched
    ``mapInPandas`` — chunking is per-document, so no grouping shuffle
    is needed; each scan partition chunks its own documents.
    Conversational docs (K:/V: markers) use turn-aware splitting."""

    conv_re = re.compile(r"(?:^|\s)[KV]:", re.MULTILINE)

    def chunk_batches(batches):
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                text = text or ""
                if conv_re.search(text):
                    chunks = _conversational_chunks(text, min_size, max_size)
                else:
                    chunks = _greedy_chunks(text, min_size, max_size, overlap)
                pos = 0
                for i, ch in enumerate(chunks):
                    rows.append((doc_id, i, pos, ch))
                    pos += len(ch)
            yield pd.DataFrame(
                rows, columns=["doc_id", "chunk_id", "start", "chunk"]
            )

    return docs.select(F.col(id_col), F.col(text_col)).mapInPandas(
        chunk_batches, schema=CHUNK_SCHEMA
    )


PACK_SCHEMA = (
    "bin_id bigint, doc_ids array<bigint>, total_tokens bigint, n_docs int"
)


def pack_sequences(
    docs: DataFrame,
    max_tokens: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int | None = None,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Token-budget sequence packing: group documents into bins of at
    most ``max_tokens`` whitespace-tokens each — the batch-assembly
    step of an LLM training pipeline (packing short documents together
    instead of padding).

    First-fit-decreasing *within each shard*: docs hash-partition into
    shards (one `repartition`, the only shuffle), each shard packs its
    own docs in one Arrow batch. Packing quality is within a few
    percent of global FFD while staying embarrassingly parallel — a
    global packer would serialize the corpus through one node.
    Oversized docs (> max_tokens) get a bin of their own, never
    dropped. bin_id = shard * 2^40 + local index, collision-free.

    ``hash_fn`` switches the shard hash: ``"xxhash64"`` (JVM,
    production) or ``"md5"`` (cross-engine deterministic — the
    oracle-gated profile, seed 21).
    """
    import pandas as pd

    from ..functions.hashing import hashed
    from ..functions.text import tokens

    spark = docs.sparkSession
    if n_shards is None:
        n_shards = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    shard_hash = hashed(F.col(id_col).cast("string"), seed=21, hash_fn=hash_fn)
    sized = docs.select(
        F.col(id_col),
        # NULL text → 0 tokens, NOT NULL: a NULL n_tok reaches the
        # Arrow packer as NaN and int(NaN) throws — one degenerate row
        # would kill the whole packing job (caught by test_adversarial)
        F.coalesce(
            F.size(tokens(F.col(text_col))).cast("bigint"), F.lit(0)
        ).alias("n_tok"),
        F.pmod(shard_hash, F.lit(n_shards)).alias("shard"),
    ).repartition(n_shards, "shard")

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return pd.DataFrame(
                columns=["bin_id", "doc_ids", "total_tokens", "n_docs"]
            )
        shard = int(pdf["shard"].iloc[0])
        items = sorted(
            zip(pdf[id_col], pdf["n_tok"]), key=lambda x: (-x[1], x[0])
        )
        bins: list[tuple[list, int]] = []  # (ids, remaining)
        for doc_id, n in items:
            n = int(n)
            placed = False
            for b in bins:
                if n <= b[1]:
                    b[0].append(int(doc_id))
                    b[1] -= n  # type: ignore[index]
                    placed = True
                    break
            if not placed:
                bins.append([[int(doc_id)], max(max_tokens - n, 0)])
        tok = dict(zip((int(d) for d in pdf[id_col]), (int(t) for t in pdf["n_tok"])))
        rows = [
            ((shard << 40) + i, ids, sum(tok[d] for d in ids), len(ids))
            for i, (ids, _rem) in enumerate(bins)
        ]
        return pd.DataFrame(
            rows, columns=["bin_id", "doc_ids", "total_tokens", "n_docs"]
        )

    return sized.groupBy("shard").applyInPandas(pack, schema=PACK_SCHEMA)


def length_bucket_batches(
    docs: DataFrame,
    batch_size: int = 32,
    bucket_width: int = 64,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "md5",
) -> DataFrame:
    """Padding-efficiency batch plan: group documents into fixed-size
    training batches bucketed by token length, and report each batch's
    padding waste — the length-bucketed batching every padded-attention
    trainer uses (the complement of :func:`pack_sequences`, which
    concatenates instead of padding).

    Docs bucket by ``n_tokens // bucket_width``, then hash into
    ``n_shards`` shards per bucket (deterministic, :mod:`hashing`
    seed 27) so batch numbering parallelizes — a single global
    row_number per bucket would serialize each bucket through one
    partition at 100 TB, and per-shard numbering changes WHICH docs
    share a batch but not the waste statistics a capacity planner
    reads. Within a shard, docs order by (n_tokens, id) — near-equal
    lengths land in the same batch, minimizing pad-to-batch-max waste.

    Output: one row per (bucket, shard, batch) with n_docs, max/sum
    tokens, padding = n_docs·max − sum, and pad_frac — feeding both the
    trainer's batch manifest and the "how much compute does padding
    burn" report. The window shuffles (bucket, shard)-partitioned
    integer triples only — text never moves.
    """
    from pyspark.sql import Window

    from ..functions.hashing import hashed
    from ..functions.text import tokens

    sized = docs.select(
        F.col(id_col),
        F.coalesce(
            F.size(tokens(F.col(text_col))).cast("bigint"), F.lit(0)
        ).alias("n_tok"),
    ).select(
        F.col(id_col),
        F.col("n_tok"),
        (F.col("n_tok") / bucket_width).cast("bigint").alias("bucket"),
        F.pmod(
            hashed(F.col(id_col).cast("string"), seed=27, hash_fn=hash_fn),
            F.lit(n_shards),
        ).cast("int").alias("shard"),
    )
    w = Window.partitionBy("bucket", "shard").orderBy(
        F.col("n_tok").asc(), F.col(id_col).asc()
    )
    batched = sized.withColumn(
        "batch", ((F.row_number().over(w) - 1) / batch_size).cast("bigint")
    )
    return (
        batched.groupBy("bucket", "shard", "batch")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.max("n_tok").alias("max_tokens"),
            F.sum("n_tok").alias("sum_tokens"),
        )
        .select(
            "bucket",
            "shard",
            "batch",
            "n_docs",
            "max_tokens",
            "sum_tokens",
            (F.col("n_docs") * F.col("max_tokens") - F.col("sum_tokens"))
            .alias("padding"),
            F.round(
                F.when(
                    F.col("max_tokens") > 0,
                    (F.col("n_docs") * F.col("max_tokens") - F.col("sum_tokens"))
                    .cast("double")
                    / (F.col("n_docs") * F.col("max_tokens")).cast("double"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("pad_frac"),
        )
    )


def fim_transform(
    docs: DataFrame,
    rate_permille: int = 500,
    min_chars: int = 20,
    hash_fn: str = "xxhash64",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fill-in-the-middle restructuring (Bavarian et al. 2022, the
    OpenAI FIM recipe; standard for code-model pretraining): for a
    deterministic ``rate_permille``/1000 of eligible documents, cut the
    text at two hash-derived points into (prefix, middle, suffix) and
    emit the PSM ordering ``<PRE>prefix<SUF>suffix<MID>middle`` — the
    model learns infilling from the reordered stream while the
    remaining docs pass through untouched.

    All randomness is md5/xxhash arithmetic on the doc id (the
    hash_split posture): the same doc always gets the same cuts, so
    re-runs are idempotent and the transform is stable under corpus
    growth. Cut placement: cut1 in [10%, 50%), cut2 in [cut1, 90%) —
    pure integer column arithmetic (explicit ``floor``: DuckDB's
    double->BIGINT cast rounds half-even where Spark truncates) in one
    zero-shuffle, zero-join projection; the corpus never moves.

    Output: every input doc with its original ``text_col``, ``fim``
    (applied?), prefix/middle/suffix, and the reassembled ``fim_text``
    (NULL when not applied) — the training mixer consumes
    ``coalesce(fim_text, text)`` with no join back to the source.
    """
    from ..functions.hashing import hashed

    n = F.length(F.col(text_col))
    apply_fim = (n >= min_chars) & (
        F.pmod(hashed(F.col(id_col), seed=31, hash_fn=hash_fn), 1000)
        < rate_permille
    )
    span1 = F.greatest(F.floor(n * 4 / 10), F.lit(1))
    cut1 = F.floor(n / 10) + F.pmod(
        hashed(F.col(id_col), seed=32, hash_fn=hash_fn), span1
    )
    span2 = F.greatest(F.floor(n * 9 / 10) - cut1, F.lit(1))
    cut2 = cut1 + F.pmod(
        hashed(F.col(id_col), seed=33, hash_fn=hash_fn), span2
    )
    staged = docs.select(
        F.col(id_col),
        F.col(text_col),
        apply_fim.alias("_apply"),
        cut1.cast("int").alias("_c1"),
        cut2.cast("int").alias("_c2"),
    )
    prefix = F.substring(F.col(text_col), F.lit(1), F.col("_c1"))
    middle = F.substring(
        F.col(text_col), F.col("_c1") + 1, F.col("_c2") - F.col("_c1")
    )
    suffix = F.substring(
        F.col(text_col), F.col("_c2") + 1, F.length(F.col(text_col))
    )
    return staged.select(
        F.col(id_col),
        F.col(text_col),
        F.col("_apply").alias("fim"),
        F.when(F.col("_apply"), prefix).alias("prefix"),
        F.when(F.col("_apply"), middle).alias("middle"),
        F.when(F.col("_apply"), suffix).alias("suffix"),
        F.when(
            F.col("_apply"),
            F.concat(
                F.lit("<PRE>"), prefix,
                F.lit("<SUF>"), suffix,
                F.lit("<MID>"), middle,
            ),
        ).alias("fim_text"),
    )


