"""Text normalisation & canonicalisation as Catalyst column expressions.

Reference semantics (all pandas row loops there, all JVM expressions here):
  * ``normalize_text``      — text_clean_and_filter.py:56-86
  * ``char_len/word_count`` — text_clean_and_filter.py:124-127
  * ``canonicalize_for_exact/near`` — duplication.py:31-56
  * ``pick_text`` fallback  — Export_to_jsonl.py:25-30

Only NFKC unicode normalisation has no Spark builtin; it is the one pandas
UDF in this module (Arrow-batched, optional — ``normalize_text_expr`` can be
built without it for ASCII-ish corpora and for the DuckDB oracle, which has
no NFKC either).
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# U+0000-001F and U+007F-009F, as in reference CONTROL_CHAR_RE
# (text_clean_and_filter.py:50-53). Reference replaces them with a space.
CONTROL_CHAR_CLASS = "[\\x00-\\x1f\\x7f-\\x9f]"

# Python's re module treats the C0 separators \x1c-\x1f as whitespace on top
# of the Unicode White_Space set; Java's (?U)\\s does not — the union below
# makes JVM regex whitespace semantics identical to the reference's Python.
PY_WS_RE = "(?U)[\\s\\x1c-\\x1f]+"

# Null-like literal strings dropped by the prefilter
# (text_clean_and_filter.py:150).
NULL_LIKE_STRINGS = ["nan", "none", "null", "n/a", "null value"]


_NFKC_UDF = None


def nfkc_normalize(c: Column | str) -> Column:
    """NFKC unicode normalisation (the one step with no Spark builtin).

    Arrow-batched pandas UDF, created lazily because UDF registration needs
    an active SparkSession (and the rest of this module must stay importable
    without one).

    Deliberately the PLAIN udf with no ASCII-mask fast path: masking
    pure-ASCII rows to null before the Arrow transfer (NFKC is identity on
    ASCII) was A/B-tested twice — rounds 1 and 3, NOTES_r1.md — and loses
    warm both times (~0.82 s vs 0.73 s per 100k docs at sf0.1: the per-row
    ``rlike`` scan costs more than the null payloads save; steady-state
    NFKC is only ~1.2 µs/row). Masking only wins on cold Python workers,
    which is not the steady-state that matters.
    """
    global _NFKC_UDF
    if _NFKC_UDF is None:

        @F.pandas_udf("string")
        def _nfkc(s: pd.Series) -> pd.Series:
            return s.map(lambda x: unicodedata.normalize("NFKC", x) if isinstance(x, str) else x)

        _NFKC_UDF = _nfkc
    return _NFKC_UDF(_col(c))


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def collapse_ws(c: Column | str) -> Column:
    """Collapse runs of whitespace to single spaces and trim.

    ``(?U)`` makes Java's ``\\s`` match the same Unicode whitespace set
    Python's ``re`` uses (the reference collapses with Python ``\\s+``,
    text_clean_and_filter.py:81).
    """
    return F.trim(F.regexp_replace(_col(c), PY_WS_RE, " "))


def normalize_text_expr(c: Column | str, *, nfkc: bool = True) -> Column:
    """NFKC → strip control chars → collapse whitespace → trim → NULL if empty.

    Null input stays null (reference returns None for NaN).
    """
    s = _col(c).cast("string")
    if nfkc:
        s = nfkc_normalize(s)  # pandas UDF (lazy)
    s = F.regexp_replace(s, CONTROL_CHAR_CLASS, " ")
    s = collapse_ws(s)
    return F.nullif(s, F.lit(""))


def ws_tokens(c: Column | str) -> Column:
    """Whitespace tokenisation matching Python ``str.split()``.

    Python's split() drops empty strings; Spark's ``split`` of an empty
    string yields ``[""]``, so the empty case is special-cased. Null input
    yields an empty array (callers decide null semantics upstream).
    """
    s = _col(c)
    empty = F.array().cast("array<string>")
    pieces = F.filter(F.split(s, PY_WS_RE), lambda t: F.length(t) > 0)
    return F.when(s.isNull(), empty).otherwise(pieces)


def char_len(c: Column | str) -> Column:
    """Length of the (normalised) text; null-propagating like pandas str.len."""
    return F.length(_col(c)).cast("long")


def word_count(c: Column | str) -> Column:
    """Whitespace word count with null→0 (reference fillna("") then split)."""
    return F.size(ws_tokens(F.coalesce(_col(c), F.lit("")))).cast("long")


def canonicalize_for_exact(c: Column | str) -> Column:
    """lower → trim → collapse whitespace; null maps to "" (duplication.py:39-40).

    The null→"" mapping is semantic: it groups all empty docs under one hash
    (a known skew key at scale — the dedup operator salts/AQE-handles it).
    """
    s = _col(c).cast("string")
    return F.coalesce(collapse_ws(F.lower(s)), F.lit(""))


def canonicalize_for_near(c: Column | str, max_chars: int = 500) -> Column:
    """Exact canonical form truncated to the first ``max_chars`` chars."""
    return F.substring(canonicalize_for_exact(c), 1, max_chars)


def pick_text(*cols: Column | str) -> Column:
    """First non-empty (after trim) of the given columns, else "".

    Reference idiom repeated at four export sites (Export_to_jsonl.py:25-30,
    deep_clean_and_pii.py:667-673, duplication.py:240-246,
    scoring_and_mixture.py:185-190).
    """
    candidates = [F.nullif(F.trim(_col(c).cast("string")), F.lit("")) for c in cols]
    return F.coalesce(*candidates, F.lit(""))
