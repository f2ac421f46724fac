"""Quality scoring & mixture/subset assignment as Catalyst expressions.

Reference: ``compute_quality_score`` — scoring_and_mixture.py:52-106
(weights 0.4 lang / 0.3 length / 0.2 uniqueness / 0.1 pii, piecewise length
preference), subset split at 0.8 — scoring_and_mixture.py:138-143.
"""

from __future__ import annotations

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


def model_quality_score() -> Column:
    """Stub hook for ML-model quality (reference returns constant 0.5,
    text_clean_and_filter.py:370-378). At scale this becomes a batched
    pandas-UDF inference call; the constant keeps parity."""
    return F.lit(0.5)
