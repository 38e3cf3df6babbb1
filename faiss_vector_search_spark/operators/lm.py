"""Corpus-trained bigram language-model fluency scoring — the
declarative stand-in for the KenLM-perplexity quality filter an LLM
data pipeline runs (CCNet / Gopher both gate on LM perplexity; no LM
toolkit ships in this container, and a count-based bigram model is the
same maximum-likelihood estimator expressed as aggregations).

Train = two aggregations over the token stream (bigram counts and
unigram context counts). Score = mean transition probability per
document. Everything is DataFrame ops — the model IS a table, so
"apply the LM" is a join, which is exactly how a 100 TB corpus wants
to consume a model: broadcast when the vocabulary is small, shuffle
co-partitioned on the bigram key when it isn't.

Cross-engine determinism: each transition probability is ONE IEEE
division of two exact counts, rounded to 8 dp and cast to
DECIMAL(12,8); the per-doc mean divides the exact decimal sum by the
transition count in one double division. No double ever accumulates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

PROB_DECIMALS = 8


def _transitions(
    docs: DataFrame, id_col: str, text_col: str,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, [extra...], prev, cur) rows: in-row zip of the token array
    with its own tail — no self-join, one explode. The token array
    stages as a real column first: the zip references it four times
    (two slices, two sizes), and interpreted higher-order args get no
    CSE, so the inline expression re-tokenized per reference.
    ``extra_cols`` ride along unchanged (doc-functional metadata like
    the domain), so a grouped consumer can keep them without a
    corpus-vs-corpus join back to the source frame."""
    toks = F.col("_toks")
    pairs = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("prev"), b.alias("cur")),
    )
    return docs.select(
        F.col(id_col), *extra_cols, tokens(F.col(text_col)).alias("_toks")
    ).select(
        F.col(id_col), *extra_cols, F.explode(pairs).alias("t")
    ).select(
        id_col, *extra_cols,
        F.col("t.prev").alias("prev"), F.col("t.cur").alias("cur"),
    )


def bigram_lm_train(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Maximum-likelihood bigram model: P(cur|prev) = c(prev,cur) /
    c(prev,·). Returns (prev, cur, prob) with prob an exact
    DECIMAL(12,8) of the rounded division.

    Two aggregations over one transition explode; the context totals
    derive from the bigram rollup itself (window over ``prev``), not
    a second pass over the corpus — the bigram agg keeps map-side
    combine on the exploded fact, so the window's re-cluster moves
    only model-sized rows (distinct bigrams), never the corpus."""
    from pyspark.sql import Window

    counts = (
        _transitions(docs, id_col, text_col)
        .groupBy("prev", "cur")
        .agg(F.count("*").alias("c_bigram"))
    )
    w = Window.partitionBy("prev")
    return counts.withColumn(
        "c_prev", F.sum("c_bigram").over(w)
    ).select(
        "prev",
        "cur",
        F.round(
            F.col("c_bigram").cast("double") / F.col("c_prev").cast("double"),
            PROB_DECIMALS,
        )
        .cast(f"decimal(12,{PROB_DECIMALS})")
        .alias("prob"),
    )


def bigram_lm_score(
    docs: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    unseen_prob: float = 0.0,
    broadcast_model: bool = True,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Mean transition probability per document under a trained bigram
    model — higher = more fluent under the training distribution; the
    gate a pipeline applies is a percentile cut on this score.

    Unseen transitions score ``unseen_prob`` (left join + coalesce),
    so scoring a NEW corpus against a trusted-reference model — the
    real CCNet-style deployment — degrades gracefully instead of
    dropping rows. The model joins broadcast by default (observed
    bigrams are Zipf-bounded); pass ``broadcast_model=False`` to let
    the optimizer shuffle co-partitioned on the bigram key when the
    vocabulary is genuinely huge."""
    # extra_cols are doc-functional metadata (e.g. the domain): they
    # ride the explode and join the grouping key, so a consumer that
    # needs (fluency, domain) avoids a corpus-vs-corpus join back to
    # the source frame (the pre-r11 ccnet_buckets shape)
    m = F.broadcast(model) if broadcast_model else model
    trans = _transitions(docs, id_col, text_col, extra_cols)
    scored = trans.join(m, on=["prev", "cur"], how="left").select(
        F.col(id_col),
        *extra_cols,
        F.coalesce(
            F.col("prob"),
            F.lit(unseen_prob).cast(f"decimal(12,{PROB_DECIMALS})"),
        ).alias("prob"),
    )
    return (
        scored.groupBy(id_col, *extra_cols)
        .agg(
            F.count("*").cast("bigint").alias("n_transitions"),
            F.round(
                F.sum("prob").cast("double") / F.count("*").cast("double"), 6
            ).alias("fluency"),
        )
    )


IMP_DECIMALS = 8


def _token_counts(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, tok) explode of the staged token array."""
    return docs.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks")
    ).select(F.col(id_col), F.explode("_toks").alias("tok"))


def dsir_importance(
    docs: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_model: bool = True,
) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al., NeurIPS
    2023), unigram-feature variant: score each corpus document by the
    mean log-likelihood RATIO between a target-domain unigram model and
    the source-corpus unigram model — positive = looks more like the
    target than like the average source doc. The standard "select
    pretraining data that resembles the high-quality target" curation
    step, expressed entirely as aggregations + one model join.

    Both models are add-1-smoothed over the SHARED vocabulary, so the
    per-token ratio r(t) = ln((c_t(t)+1)/(N_t+V)) − ln((c_s(t)+1)/(N_s+V))
    is one exact-integer-ratio log each, rounded to 8 dp and carried as
    DECIMAL — per-doc means never accumulate raw doubles (the lm.py
    determinism discipline).

    Plan shape for 100 TB: source counts are one map-side-combinable
    groupBy of the token explode; the target side is benchmark-sized;
    the model IS a (token, ratio) table — Zipf-bounded, broadcast by
    default (``broadcast_model=False`` shuffles co-partitioned on the
    token when a vocabulary genuinely outgrows broadcast). Scoring
    re-uses the same explode shape + per-doc mean as bigram_lm_score."""
    src = _token_counts(docs, id_col, text_col).groupBy("tok").agg(
        F.count("*").alias("c_s")
    )
    tgt = _token_counts(target, id_col, text_col).groupBy("tok").agg(
        F.count("*").alias("c_t")
    )
    # shared vocabulary via union + hash re-aggregation, NOT a
    # full_outer join: the join planned as the contract's only
    # SortMergeJoin (r5 PLAN_AUDIT) — two sorted exchanges for what is
    # semantically a merge of two count maps. The union shape is one
    # map-side-combinable hash agg over vocab-sized rows, no sort.
    vocab = (
        src.select("tok", "c_s", F.lit(0).cast("bigint").alias("c_t"))
        .unionByName(
            tgt.select("tok", F.lit(0).cast("bigint").alias("c_s"), "c_t")
        )
        .groupBy("tok")
        .agg(F.sum("c_s").alias("c_s"), F.sum("c_t").alias("c_t"))
    )
    totals = vocab.agg(
        F.sum("c_s").alias("n_s"),
        F.sum("c_t").alias("n_t"),
        F.count("*").alias("v"),
    )
    model = vocab.crossJoin(F.broadcast(totals)).select(
        "tok",
        F.round(
            F.log((F.col("c_t") + 1).cast("double")
                  / (F.col("n_t") + F.col("v")).cast("double"))
            - F.log((F.col("c_s") + 1).cast("double")
                    / (F.col("n_s") + F.col("v")).cast("double")),
            IMP_DECIMALS,
        ).cast(f"decimal(16,{IMP_DECIMALS})").alias("r"),
    )
    m = F.broadcast(model) if broadcast_model else model
    return (
        _token_counts(docs, id_col, text_col)
        .join(m, "tok")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.round(
                F.sum("r").cast("double") / F.count("*").cast("double"), 6
            ).alias("importance"),
        )
    )


def domain_kl_report(
    docs: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-domain distribution-shift report: KL(domain ‖ corpus) over
    unigram distributions — the mixture-monitoring statistic a
    pretraining pipeline tracks per source/dump (a drifting crawl or a
    boilerplate-heavy domain shows up as a KL spike long before it
    shows up in loss curves).

    KL(p_s ‖ q) = Σ_t p_s(t)·ln(p_s(t)/q(t)) needs no smoothing: the
    sum ranges over tokens PRESENT in the domain, and every such token
    is also in the corpus model, so q(t) > 0 wherever p_s(t) > 0.

    Determinism: each term contribution is exact-integer ratios through
    one ln and one multiply, rounded to 8 dp and carried as
    DECIMAL(18,8); per-domain sums add decimals exactly (the lm.py
    no-raw-double-accumulation discipline).

    Plan shape for 100 TB: ONE map-side-combinable groupBy over the
    token explode builds the (domain, token) model; the corpus-model
    and domain-total columns attach as WINDOW sums over the model
    table itself (the bigram_lm_train trick — re-deriving them as
    separate aggregation branches re-scans the corpus once per branch,
    measured 6 scans before this shape), so only model-sized rows ever
    shuffle again; the grand total is the one remaining branch and
    shares the model's exchange (ReusedExchange, not a re-scan)."""
    from pyspark.sql import Window

    dom = (
        docs.select(F.col(group_col), tokens(F.col(text_col)).alias("_toks"))
        .select(F.col(group_col), F.explode("_toks").alias("tok"))
        .groupBy(group_col, "tok")
        .agg(F.count("*").alias("c_st"))
    )
    enriched = dom.withColumn(
        "c_t", F.sum("c_st").over(Window.partitionBy("tok"))
    ).withColumn("n_s", F.sum("c_st").over(Window.partitionBy(group_col)))
    n_total = F.broadcast(dom.agg(F.sum("c_st").alias("n_corpus")))
    contrib = (
        enriched.crossJoin(n_total)
        .select(
            F.col(group_col),
            F.col("c_st"),
            F.round(
                (F.col("c_st").cast("double") / F.col("n_s"))
                * F.log(
                    (F.col("c_st").cast("double") / F.col("n_s"))
                    / (F.col("c_t").cast("double") / F.col("n_corpus"))
                ),
                IMP_DECIMALS,
            )
            .cast(f"decimal(18,{IMP_DECIMALS})")
            .alias("kl_term"),
        )
    )
    return contrib.groupBy(group_col).agg(
        F.sum("c_st").cast("bigint").alias("n_tokens"),
        F.count("*").cast("bigint").alias("n_terms"),
        F.round(F.sum("kl_term").cast("double"), 6).alias("kl_nats"),
    )


def dsir_sample(
    docs: DataFrame,
    target: DataFrame,
    n: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-n corpus documents by DSIR importance (deterministic
    greedy selection — the id tie-break makes the cut engine-stable).
    Compiles to the importance aggregation + TakeOrderedAndProject:
    n·P rows reach the driver, the corpus never globally sorts."""
    imp = dsir_importance(docs, target, id_col, text_col)
    return imp.orderBy(
        F.col("importance").desc(), F.col(id_col).asc()
    ).limit(n).select(id_col, "importance")


def split_kl_report(
    docs: DataFrame,
    splits=None,
    hash_fn: str = "xxhash64",
    seed: int = 31,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Train/val/test distribution-shift audit: KL(split ‖ corpus) per
    hash-split bucket — the "is my validation set measuring the same
    distribution I train on" check. A healthy hash split shows near-
    zero KL for every bucket (the split is content-blind); a KL spike
    in val/test means the id space is correlated with content (e.g.
    ids assigned per-source) and loss comparisons across splits are
    measuring mixture shift, not model quality.

    Pure composition: the split label folds into the projection as
    the :func:`textstats.split_col` expression (no second scan, no id
    join) and the KL machinery is :func:`domain_kl_report` with the
    split as the group — same 1-scan + window-sum plan, same
    DECIMAL(18,8) determinism discipline.
    """
    from .textstats import DEFAULT_SPLITS, split_col

    labeled = docs.select(
        F.col(id_col),
        F.col(text_col),
        split_col(
            splits if splits is not None else DEFAULT_SPLITS,
            id_col=id_col,
            hash_fn=hash_fn,
            seed=seed,
        ).alias("split"),
    )
    return domain_kl_report(
        labeled, group_col="split", id_col=id_col, text_col=text_col
    )
