"""Linear quality classifier over hashed bag-of-words features — the
fastText-style model-based filter (Joulin et al. 2017; the
LLaMA/DataComp "quality classifier" curation stage) that replaces
hand-tuned rules with a trained gate. The standard deployment distills
an expensive signal (human labels, GPT judgments, or — as the
committed model does — the Gopher rule set) into a classifier cheap
enough to run over the whole crawl.

Features per document: L1-normalized hashed-bucket counts (the
fastText mean-pooling shape) plus two in-row shape features a pure
BoW cannot express — ln(n_tokens+1)/10 and mean-word-length/10 —
without which the word-count/word-length Gopher rules are
unlearnable (measured: 0.70 → 0.82 in-sample agreement).

Architecture split (the standing driver-held-model posture, like
centroids/codebooks/BPE merges):

- TRAIN: features assemble DISTRIBUTED (token explode → hashed-bucket
  counts, one map-side-combinable groupBy; the shape features are
  exact integer folds), a bounded id-stride sample collects to the
  driver, and IRLS/Newton logistic regression runs in numpy —
  deterministic (zero init, fixed 50 iterations, ridge-damped exact
  solves; plain GD stalled at 0.72 against IRLS's 0.82 optimum,
  measured). Per-feature standardization folds back into the returned
  weights, so the model applies to RAW features.
- SCORE: a ZERO-SHUFFLE in-row projection. Bucket weights fold into
  the plan as an integer-unit (1e-8) array literal; each doc's logit
  accumulates LONGS over its staged token array — exact, bit-identical
  to the DuckDB oracle's bucket-sum, overflow-safe to ~1e7-token docs
  (|w| ≤ ~100 → 1e10 units/token ≪ 2^63). The only float ops are a
  fixed-order chain of one division + two multiplies + three adds per
  document.

Scale: scoring runs at scan speed on 100 TB (no explode, no join, no
shuffle — the gopher_rules posture); training cost is bounded by
``train_sample`` regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hashed
from ..functions.text import tokens

UNIT_DECIMALS = 8
UNITS = 10**UNIT_DECIMALS
FEATURE_SEED = 37


def _bucket(tok_col, n_buckets: int, hash_fn: str):
    return F.pmod(hashed(tok_col, seed=FEATURE_SEED, hash_fn=hash_fn),
                  F.lit(n_buckets))


def _doc_features(docs, labels, n_buckets, id_col, text_col, label_col,
                  hash_fn):
    """(id, y, n_tok, sum_len, bucket, c) rows: one explode, one
    map-side-combinable groupBy; sum_len is an exact integer fold."""
    return (
        docs.join(labels.select(id_col, label_col), id_col)
        .select(
            F.col(id_col),
            F.col(label_col).cast("double").alias("y"),
            tokens(F.col(text_col)).alias("_toks"),
        )
        .where(F.size("_toks") > 0)
        .select(
            F.col(id_col),
            F.col("y"),
            F.size("_toks").alias("n_tok"),
            F.aggregate(
                F.transform("_toks", lambda t: F.length(t).cast("bigint")),
                F.lit(0).cast("bigint"),
                lambda a, x: a + x,
            ).alias("sum_len"),
            F.explode("_toks").alias("tok"),
        )
        .groupBy(
            id_col, "y", "n_tok", "sum_len",
            _bucket(F.col("tok"), n_buckets, hash_fn).alias("b"),
        )
        .agg(F.count("*").alias("c"))
    )


def train_quality_classifier(
    docs: DataFrame,
    labels: DataFrame,
    n_buckets: int = 64,
    train_sample: int = 10_000,
    iters: int = 50,
    ridge: float = 1e-6,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "label",
    hash_fn: str = "xxhash64",
) -> dict:
    """Train the logistic model on (docs ⋈ labels); ``labels`` carries
    (id_col, label_col ∈ {0,1}). Returns
    ``{"n_buckets", "seed", "units": [int], "w_len", "w_mwl", "bias"}``
    — bucket weights in 1e-8 units, shape-feature weights as floats —
    ready for :func:`score_quality_classifier` or json-commit.

    The id-stride sample cap uses ceiling division (the pq.py:131
    contract: the cap is never a silent no-op). Docs with zero tokens
    carry no signal and are dropped from training."""
    import numpy as np

    n = docs.count()
    corpus = docs
    if n > train_sample:
        stride = max(1, -(-n // train_sample))
        corpus = corpus.where(F.col(id_col) % stride == 0)
    rows = _doc_features(
        corpus, labels, n_buckets, id_col, text_col, label_col, hash_fn
    ).collect()
    if not rows:
        raise ValueError("no labeled training docs with tokens")
    ids = sorted({r[id_col] for r in rows})
    idx = {d: i for i, d in enumerate(ids)}
    X = np.zeros((len(ids), n_buckets + 2))
    y = np.zeros(len(ids))
    for r in rows:
        i = idx[r[id_col]]
        X[i, int(r["b"])] = r["c"] / r["n_tok"]
        X[i, n_buckets] = np.log(r["n_tok"] + 1.0) / 10.0
        X[i, n_buckets + 1] = (r["sum_len"] / r["n_tok"]) / 10.0
        y[i] = r["y"]
    scale = np.maximum(X.std(axis=0), 1e-8)
    Z = np.hstack([X / scale, np.ones((len(y), 1))])
    beta = np.zeros(Z.shape[1])
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-np.clip(Z @ beta, -500, 500)))
        w_irls = p * (1.0 - p) + 1e-6
        h = Z.T @ (Z * w_irls[:, None]) / len(y) + ridge * np.eye(Z.shape[1])
        g = Z.T @ (p - y) / len(y) + ridge * beta
        beta -= np.linalg.solve(h, g)
    w_raw = beta[:-1] / scale
    return {
        "n_buckets": n_buckets,
        "seed": FEATURE_SEED,
        "units": [int(round(v * UNITS)) for v in w_raw[:n_buckets]],
        "w_len": float(w_raw[n_buckets]),
        "w_mwl": float(w_raw[n_buckets + 1]),
        "bias": float(beta[-1]),
    }


def logit_exprs(toks, model: dict, hash_fn: str = "xxhash64") -> tuple:
    """(n_tokens, logit) Column pair over a STAGED token-array column
    — exposed (r12) so pipelines can fold the classifier score into an
    existing projection of the same scan instead of a second corpus
    scan + id join (the quality_exprs convention). ``toks`` MUST be a
    staged real column: the aggregate folds below reference it
    repeatedly and are interpreted HOFs with no CSE."""
    k = int(model["n_buckets"])
    units = F.array(*[F.lit(int(u)).cast("bigint") for u in model["units"]])
    bias = float(model["bias"])
    w_len = float(model["w_len"])
    w_mwl = float(model["w_mwl"])
    usum = F.aggregate(
        toks,
        F.lit(0).cast("bigint"),
        lambda acc, t: acc
        + F.element_at(units, (_bucket(t, k, hash_fn) + 1).cast("int")),
    )
    sum_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda a, x: a + x,
    )
    n_tok = F.coalesce(F.size(toks).cast("bigint"), F.lit(0))
    nd = n_tok.cast("double")
    logit = F.when(n_tok == 0, F.round(F.lit(bias), 6)).otherwise(
        F.round(
            F.lit(bias)
            + (usum.cast("double") / F.lit(float(UNITS))) / nd
            + F.lit(w_len) * (F.log(nd + F.lit(1.0)) / F.lit(10.0))
            + F.lit(w_mwl) * ((sum_len.cast("double") / nd) / F.lit(10.0)),
            6,
        )
    )
    return n_tok, logit


def score_quality_classifier(
    docs: DataFrame,
    model: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "xxhash64",
    keep_cols: tuple = (),
) -> DataFrame:
    """Score every document under a trained model:
    logit = bias + mean_t w[bucket(t)] + w_len·ln(n+1)/10
    + w_mwl·(sum_len/n)/10. Returns (id, n_tokens, logit,
    keep = logit > 0). Zero-token docs score the bare bias (a real
    pipeline rejects them elsewhere; they are not dropped here).

    ``hash_fn`` must match training: ``"xxhash64"`` production,
    ``"md5"`` for the cross-engine oracle profile. Both integer folds
    (bucket units, token lengths) are exact; the float chain has a
    fixed operation order replicated by the oracle SQL. ``keep_cols``
    passes input columns through the staged projections (so a caller
    can chain scoring onto an upstream projection of the same scan
    instead of joining corpus-sized frames)."""
    staged = docs.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks"),
        *[F.col(c) for c in keep_cols],
    )
    n_tok, logit = logit_exprs(F.col("_toks"), model, hash_fn)
    # logit STAGES before keep derives from it: the aggregate folds are
    # interpreted HOFs with no CSE, so referencing the expression twice
    # in one projection would run both folds twice per row (the
    # phrase_search staging lesson)
    scored = staged.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        n_tok.alias("n_tokens"),
        logit.alias("logit"),
    )
    return scored.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        "n_tokens",
        "logit",
        (F.col("logit") > 0).alias("keep"),
    )


def load_model(path: str | None = None) -> dict:
    """Load a committed model json (default: the repo's
    models/quality_lr.json, distilled from gopher_rules at sf0.01 by
    scripts/train_quality_lr.py — deterministic, reproducible)."""
    import json
    import os

    if path is None:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "models", "quality_lr.json",
        )
    with open(path) as f:
        return json.load(f)


def quality_calibration_report(
    docs: DataFrame,
    model: dict,
    n_bins: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "xxhash64",
    edges: str = "exact",
) -> DataFrame:
    """Calibration audit of the model-based filter against the rule
    set it distilled (SURVEY §2 #209): bucket the corpus into
    ``n_bins`` logit deciles and report each decile's Gopher-rule pass
    rate — the table a pipeline owner reads to pick the filtering
    THRESHOLD (e.g. "keep deciles whose rule agreement ≥ 90%") and to
    detect calibration drift after retraining or corpus shift. A
    well-ranked classifier shows pass rates falling monotonically
    from decile 1 (highest logits) down; a flat column means the
    model stopped separating.

    Plan: gopher_rules and the classifier logit compute as CHAINED
    staged projections over ONE corpus scan (``keep_cols``
    passthrough — no join of two corpus-sized signal frames, so
    nothing here can degrade to a sort-merge join); only (id, logit,
    keep) triples enter the binning stage. ``edges`` picks it:

    - ``"exact"`` (default, the oracle profile): ntile over a global
      (logit desc, id) sort — exact equal-size deciles, cross-engine
      deterministic, but the sort serializes through one partition;
    - ``"approx"`` (the 100 TB profile): a SINGLE-SCAN fixed-grid
      histogram keyed on the raw logit clamped to [-20, 20] at 3 dp
      (≤ 40001 cells; clamp∘round is monotone, so deciles by grid
      cell are deciles by logit — and unlike the r10 sigmoid grid the
      resolution is UNIFORM in logit space, so a saturated classifier
      cannot collapse its tails into single cells). The histogram
      aggregates map-side-combinably in the same scan that computes
      the signals, descending cumulative counts over the tiny frame
      assign decile 1 to the highest logits, and the report
      aggregates the histogram itself. No global sort, no second
      corpus pass; same-cell (1e-3-logit) ties cannot split across
      deciles, so tie-heavy corpora can emit < n_bins rows (each
      emitted decile then absorbs the tied mass — callers indexing
      deciles 1..n_bins must key by the ``decile`` VALUE, not row
      position). The structural gates (full partition, ordered mins,
      signal, decile balance under saturation) are pytest-asserted
      for both engines.

    Output: one row per decile —
    (decile, n_docs, min_logit, mean_logit, gopher_pass_rate);
    mean_logit accumulates the 6-dp rounded logits as DECIMAL(18,6)
    (order-free exact sums), pass rate is an exact integer ratio.
    """
    from pyspark.sql import Window

    from . import textstats

    flagged = textstats.gopher_rules(
        docs, id_col=id_col, text_col=text_col, keep_cols=(text_col,)
    ).select(
        F.col(id_col), F.col(text_col), F.col("keep").alias("_rule_keep")
    )
    scored = score_quality_classifier(
        flagged, model, id_col=id_col, text_col=text_col,
        hash_fn=hash_fn, keep_cols=("_rule_keep",),
    )
    triples = scored.select(
        F.col(id_col), F.col("logit"), F.col("_rule_keep")
    )
    if edges == "exact":
        w = Window.orderBy(F.col("logit").desc(), F.col(id_col).asc())
        binned = triples.withColumn("decile", F.ntile(n_bins).over(w))
    elif edges == "approx" and n_bins == 1:
        # degenerate single-bin audit: no cut points exist, and
        # percentile_approx rejects an empty percentage list — bin
        # everything into decile 1 exactly like the ntile engine
        binned = triples.withColumn("decile", F.lit(1))
    elif edges == "approx":
        # SINGLE-SCAN fixed-grid histogram engine (r10 rework — the
        # percentile_approx two-pass form recomputed the logit
        # pipeline on a second corpus scan; BENCH_BASELINE r10).
        # Grid key = the raw logit CLAMPED to [-20, 20] and rounded
        # to 3 dp (≤ 40001 cells) — a monotone non-decreasing map, so
        # deciles by grid cell are deciles by logit. The r10 sigmoid
        # grid saturated beyond |logit| ≈ 9 (cell width ~1 logit at 9,
        # ~6 at 11), and since a cell can never split across deciles a
        # confident classifier's tail collapsed 10%+ of the corpus
        # into one tail decile (the r10 ADVICE finding); the clamped
        # raw-logit grid keeps UNIFORM 1e-3 resolution across the
        # whole practical range instead. Beyond ±20 sigmoid is within
        # 2e-9 of its asymptote — docs there are indistinguishable to
        # the filter, so the clamp's tie surface is semantically
        # empty. The histogram still folds map-side-combinably in the
        # same scan that computes the signals; the DESCENDING
        # cumulative count over the tiny frame assigns decile 1 to
        # the highest logits like the ntile engine. One corpus scan,
        # no global sort; same-cell (1e-3-logit) ties cannot split
        # across deciles — the decile-balance pytest gate bounds the
        # resulting imbalance on a saturated distribution.
        hist = triples.groupBy(
            F.round(
                F.greatest(
                    F.lit(-20.0), F.least(F.lit(20.0), F.col("logit"))
                ),
                3,
            ).alias("_g")
        ).agg(
            F.count("*").alias("_n"),
            F.min("logit").alias("_min"),
            F.sum(F.col("logit").cast("decimal(28,6)")).alias("_sum"),
            F.sum(
                F.when(F.col("_rule_keep"), 1).otherwise(0)
            ).alias("_k"),
        )
        cw = Window.orderBy(F.col("_g").desc())
        tw = cw.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        binned_h = hist.select(
            "_n", "_min", "_sum", "_k",
            F.least(
                F.lit(n_bins),
                F.ceil(
                    F.sum("_n").over(
                        cw.rowsBetween(Window.unboundedPreceding, 0)
                    )
                    * n_bins
                    / F.sum("_n").over(tw)
                ),
            ).cast("int").alias("decile"),
        )
        return (
            binned_h.groupBy("decile")
            .agg(
                F.sum("_n").cast("bigint").alias("n_docs"),
                F.round(F.min("_min"), 6).alias("min_logit"),
                F.round(
                    (F.sum("_sum") / F.sum("_n")).cast("double"), 6
                ).alias("mean_logit"),
                F.round(
                    F.sum("_k") / F.sum("_n").cast("double"), 6
                ).alias("gopher_pass_rate"),
            )
        )
    else:
        raise ValueError(f"unknown edges engine: {edges}")
    return (
        binned.groupBy("decile")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.round(F.min("logit"), 6).alias("min_logit"),
            F.round(
                F.sum(F.col("logit").cast("decimal(18,6)")).cast("double")
                / F.count("*"),
                6,
            ).alias("mean_logit"),
            F.round(
                F.sum(F.when(F.col("_rule_keep"), 1).otherwise(0))
                / F.count("*").cast("double"),
                6,
            ).alias("gopher_pass_rate"),
        )
        .select(
            F.col("decile").cast("int").alias("decile"),
            "n_docs", "min_logit", "mean_logit", "gopher_pass_rate",
        )
        .orderBy("decile")
    )
