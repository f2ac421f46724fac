"""Quality / token metrics as Catalyst expressions (no UDFs).

Reference semantics:
  * ``compute_quality_metrics`` — text_clean_and_filter.py:206-236
  * ``non_latin_ratio``         — text_clean_and_filter.py:451-469
  * ``compute_token_stats``     — deep_clean_and_pii.py:219-260
  * ``is_repetitive_token_spam``— deep_clean_and_pii.py:418-440

All ratios guard their denominators (Spark 4 runs ANSI mode: x/0 errors
rather than producing null).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from llm_pretraining_data_pipeline_spark.functions.text_norm import _col, ws_tokens

# 34-word stopword set, verbatim from deep_clean_and_pii.py:211-216.
EN_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "for", "on", "at",
    "is", "it", "this", "that", "with", "as", "by", "from", "be", "are",
    "was", "were", "will", "would", "can", "could", "has", "have", "had",
    "about", "into", "over", "after", "before", "between", "up", "down",
]


def _safe_ratio(num: Column, den: Column) -> Column:
    return F.when(den > 0, num.cast("double") / den.cast("double")).otherwise(F.lit(0.0))


def n_chars(c: Column | str) -> Column:
    """len(str(text)); null treated as "" per reference (:216-218)."""
    return F.length(F.coalesce(_col(c), F.lit(""))).cast("long")


def n_words(c: Column | str) -> Column:
    return F.size(ws_tokens(c)).cast("long")


def alpha_ratio(c: Column | str) -> Column:
    """Fraction of characters that are alphabetic (unicode letters)."""
    s = F.coalesce(_col(c), F.lit(""))
    letters = F.length(F.regexp_replace(s, "[^\\p{L}]", ""))
    return _safe_ratio(letters, F.length(s))


def repetition_ratio(c: Column | str) -> Column:
    """1 - unique_words/total_words over whitespace tokens; 0.0 when empty."""
    toks = ws_tokens(c)
    total = F.size(toks)
    uniq = F.size(F.array_distinct(toks))
    return F.when(total > 0, F.lit(1.0) - uniq.cast("double") / total.cast("double")).otherwise(
        F.lit(0.0)
    )


def non_latin_ratio(c: Column | str) -> Column:
    """Of the alphabetic chars, the fraction that are non-ASCII (crude ≈ non-Latin)."""
    s = F.coalesce(_col(c), F.lit(""))
    letters = F.regexp_replace(s, "[^\\p{L}]", "")
    total = F.length(letters)
    non_latin = F.length(F.regexp_replace(letters, "[\\x00-\\x7f]", ""))
    return _safe_ratio(non_latin, total)


# ------------------------------------------------------------- token stats


def token_count(c: Column | str) -> Column:
    return F.size(ws_tokens(c)).cast("long")


def unique_tokens(c: Column | str) -> Column:
    return F.size(F.array_distinct(ws_tokens(c))).cast("long")


def unique_token_ratio(c: Column | str) -> Column:
    toks = ws_tokens(c)
    return _safe_ratio(F.size(F.array_distinct(toks)), F.size(toks))


def stopword_ratio(c: Column | str, stopwords: list[str] | None = None) -> Column:
    """(#tokens whose lowercase form is a stopword) / total tokens."""
    stop = F.array(*[F.lit(w) for w in (stopwords or EN_STOPWORDS)])
    toks = ws_tokens(c)
    hits = F.size(F.filter(toks, lambda t: F.array_contains(stop, F.lower(t))))
    return _safe_ratio(hits, F.size(toks))


def max_token_frequency(c: Column | str) -> Column:
    """max(count of any single token), 0 for empty/null text.

    Single-pass HOF over sorted tokens (run-length max) — O(n log n) per row,
    no shuffle, no UDF; this is the scale path for the repetitive-token-spam
    filter (vs. the reference's per-row Counter, deep_clean_and_pii.py:418-440,
    or an explode+groupBy which would shuffle the whole token stream).
    """
    toks = F.array_sort(ws_tokens(c))
    acc0 = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )

    def merge(acc: Column, t: Column) -> Column:
        run = F.when(t == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            t.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    return F.aggregate(toks, acc0, merge, lambda acc: acc["best"]).cast("long")


def max_token_frequency_ratio(c: Column | str) -> Column:
    """max(count of any single token) / total tokens, 0.0 for empty/null text."""
    return _safe_ratio(max_token_frequency(c), F.size(ws_tokens(c)))


def is_repetitive_token_spam(
    c: Column | str, threshold: float = 0.70, min_tokens: int = 3
) -> Column:
    """True when one token dominates the doc (frac > threshold, ≥ min_tokens)."""
    toks = ws_tokens(c)
    return (F.size(toks) >= min_tokens) & (max_token_frequency_ratio(c) > F.lit(threshold))


def syllable_count(c: Column | str) -> Column:
    """Total syllable estimate: number of vowel-group runs ``[aeiouy]+`` in
    the lowercased text (the standard cheap heuristic behind readability
    filters; runs never span whitespace, so the text-wide count equals the
    per-word sum). Deterministic, regex-only — both engines count the same
    runs (`len(regexp_extract_all(...))`)."""
    return F.size(
        F.regexp_extract_all(
            F.lower(F.coalesce(_col(c).cast("string"), F.lit(""))),
            F.lit("[aeiouy]+"),
            F.lit(0),
        )
    ).cast("long")


def flesch_reading_ease(
    text: Column | str,
    n_sentences: Column,
    round_dp: int = 4,
) -> Column:
    """Flesch Reading Ease = 206.835 − 1.015·(words/sentences) −
    84.6·(syllables/words) — the classic readability score web-corpus
    pipelines bucket on (e.g. educational-quality filtering). Callers
    supply the sentence count (``corpus.split_sentences`` size, floored at
    1) so the sentence definition stays the engine's single shared one.

    Pure per-row expressions, zero shuffle; every ratio is int/int then
    fixed-order double arithmetic, so a 4dp round is cross-engine safe.
    """
    from llm_pretraining_data_pipeline_spark.functions.text_norm import ws_tokens

    t = F.coalesce(_col(text).cast("string"), F.lit(""))
    words = F.size(ws_tokens(t)).cast("long")
    syl = syllable_count(t)
    sents = F.greatest(n_sentences.cast("long"), F.lit(1).cast("long"))
    score = (
        F.lit(206.835)
        - F.lit(1.015) * (words.cast("double") / sents.cast("double"))
        - F.lit(84.6) * (syl.cast("double") / words.cast("double"))
    )
    return F.round(F.when(words > 0, score).otherwise(F.lit(0.0)), round_dp)


# Unicode scripts the mixing detector distinguishes. Java regex uses
# \p{IsXxx}, RE2 \p{Xxx} — the NAME list is the shared contract; each
# engine renders its own property syntax. Kana merges Hiragana+Katakana
# (one writing system for this purpose).
SCRIPT_NAMES = (
    "latin", "cyrillic", "greek", "arabic", "han", "hangul", "kana",
    "devanagari",
)
_SCRIPT_JAVA = {
    "latin": r"\p{IsLatin}", "cyrillic": r"\p{IsCyrillic}",
    "greek": r"\p{IsGreek}", "arabic": r"\p{IsArabic}",
    "han": r"\p{IsHan}", "hangul": r"\p{IsHangul}",
    "kana": r"[\p{IsHiragana}\p{IsKatakana}]",
    "devanagari": r"\p{IsDevanagari}",
}


def script_mix(c: Column | str) -> Column:
    """Struct ``(n_letters, dominant_script, dominant_count,
    mix_ratio)``: per-script letter counts over the fixed SCRIPT_NAMES
    set, the dominant script (max count, ties to the lexicographically
    LARGER name — an arbitrary but engine-agreed rule), and the
    fraction of letters OUTSIDE the dominant script. Mixed-script text
    is a classic corpus pathology: boilerplate-English nav wrapped
    around a foreign-language page, mojibake, and homoglyph spam all
    show up as high mix_ratio; single-script pages score 0.

    ``n_letters`` counts ALL Unicode letters (``\\p{L}``), so scripts
    outside the tracked set still raise ``mix_ratio`` (they are
    letters that are not the dominant script). Empty/letterless text:
    null dominant, 0.0 ratio. Pure per-row Catalyst (one
    regexp_replace + one regexp_count per script), zero shuffle.

    Script property classes include non-letter codepoints (Mc/Mn
    vowel signs, Nd script digits), so for abugida text (e.g. Hindi
    consonant + matra) a raw per-script count would exceed the
    ``\\p{L}`` letter count and drive ``mix_ratio`` negative. All
    counting therefore runs over a letters-only projection of the
    text (``\\P{L}`` stripped first): per-script counts are exact
    script∩letter counts and ``dominant_count <= n_letters`` holds by
    construction (ADVICE r12).
    """
    s = F.coalesce(_col(c).cast("string"), F.lit(""))
    letters = F.regexp_replace(s, F.lit(r"\P{L}"), F.lit(""))
    counts = [
        F.regexp_count(letters, F.lit(_SCRIPT_JAVA[name])).cast("long")
        for name in SCRIPT_NAMES
    ]
    n_letters = F.length(letters).cast("long")
    best = F.array_max(
        F.array(
            *[
                F.struct(cnt.alias("c"), F.lit(name).alias("s"))
                for name, cnt in zip(SCRIPT_NAMES, counts)
            ]
        )
    )
    has = n_letters > 0
    dom_cnt = F.when(has & (best["c"] > 0), best["c"])
    return F.struct(
        n_letters.alias("n_letters"),
        F.when(has & (best["c"] > 0), best["s"]).alias("dominant_script"),
        dom_cnt.alias("dominant_count"),
        F.when(
            has,
            F.round(
                F.lit(1.0)
                - F.coalesce(dom_cnt, F.lit(0)).cast("double")
                / n_letters.cast("double"),
                6,
            ),
        ).otherwise(F.lit(0.0)).alias("mix_ratio"),
    )
