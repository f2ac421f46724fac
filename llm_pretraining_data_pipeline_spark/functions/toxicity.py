"""Keyword-lexicon toxicity heuristic as Catalyst expressions.

Reference: ``toxicity_heuristic`` — text_clean_and_filter.py:301-366.
Token match is over ``re.findall(r"\\w+", text.lower())``; scores are hit
fractions scaled ×5 and clipped to [0,1]; severe_toxicity is the indicator
toxicity ≥ 0.9; n_tokens has a floor of 1 (so empty text scores 0).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from llm_pretraining_data_pipeline_spark.functions.text_norm import _col

# Lexicons verbatim from text_clean_and_filter.py:303-322.
BAD_WORDS = ["fuck", "fucking", "shit", "bitch", "bastard", "asshole", "crap",
             "damn", "dick", "piss"]
INSULT_WORDS = ["idiot", "moron", "stupid", "loser", "dumb"]
THREAT_WORDS = ["kill", "murder", "hurt", "shoot", "stab"]
SEXUAL_WORDS = ["sex", "porn", "nude", "naked"]
SLUR_WORDS = ["nigger", "nigga", "faggot", "retard"]

ALL_LEXICONS = {
    "bad": BAD_WORDS,
    "insult": INSULT_WORDS,
    "threat": THREAT_WORDS,
    "sexual": SEXUAL_WORDS,
    "slur": SLUR_WORDS,
}


def word_tokens(c: Column | str, ascii_only: bool = False) -> Column:
    """``\\w+`` tokens of the lowercased text, empty array for null/empty.

    ``ascii_only=True`` restricts to [a-z0-9_] runs — use this flavor for
    oracle-checked queries (DuckDB's RE2 ``\\w`` is ASCII, Python's is
    unicode; the engine default matches Python via the (?U) flag).
    """
    s = F.lower(F.coalesce(_col(c), F.lit("")))
    pattern = "[a-z0-9_]+" if ascii_only else "(?U)\\w+"
    toks = F.regexp_extract_all(s, F.lit(pattern), F.lit(0))
    return F.coalesce(toks, F.array().cast("array<string>"))


def _hit_count(toks: Column, lexicon: list[str]) -> Column:
    lex = F.array(*[F.lit(w) for w in lexicon])
    return F.size(F.filter(toks, lambda t: F.array_contains(lex, t)))


def _scaled(hits: Column, n: Column) -> Column:
    return F.least(F.lit(1.0), hits.cast("double") / n.cast("double") * F.lit(5.0))


def toxicity_scores(c: Column | str, ascii_only: bool = False) -> dict[str, Column]:
    """All six reference scores as a dict of named column expressions."""
    toks = word_tokens(c, ascii_only=ascii_only)
    n = F.greatest(F.lit(1), F.size(toks))  # max(1, n_tokens), reference :338
    counts = {name: _hit_count(toks, lex) for name, lex in ALL_LEXICONS.items()}
    total = sum(counts.values(), F.lit(0))
    toxicity = _scaled(total, n)
    return {
        "toxicity": toxicity,
        "severe_toxicity": F.when(toxicity >= 0.9, F.lit(1.0)).otherwise(F.lit(0.0)),
        "insult": _scaled(counts["insult"], n),
        "threat": _scaled(counts["threat"], n),
        "identity_attack": _scaled(counts["slur"], n),
        "sexual_explicit": _scaled(counts["sexual"], n),
    }
