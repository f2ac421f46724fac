"""PII detection & masking as Catalyst expressions.

Reference semantics:
  * ``simple_pii_hits``     — text_clean_and_filter.py:239-261 (email/phone)
  * ``detect_and_mask_pii`` — deep_clean_and_pii.py:264-334 (4 regexes,
    mask order email→phone→cc→iban; the order matters because the phone
    pattern can eat credit-card digit runs).

Patterns are kept RE2-compatible (no backrefs/lookaround) so the DuckDB
oracle can evaluate the identical regex.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from llm_pretraining_data_pipeline_spark.functions.text_norm import _col

# Verbatim from the reference.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
SIMPLE_PHONE_RE = r"\+?\d[\d\- ]{7,}\d"  # text_clean_and_filter.py:255
PHONE_RE = r"\b(?:\+?\d{1,3}[\s\-\.]?)?(?:\(?\d{2,4}\)?[\s\-\.]?)?\d{3,4}[\s\-\.]?\d{3,4}\b"
CREDIT_CARD_RE = r"\b(?:\d[ -]*?){13,16}\b"
IBAN_RE = r"\b[A-Z]{2}\d{2}[A-Z0-9]{10,30}\b"

MASK_ORDER: list[tuple[str, str]] = [
    (EMAIL_RE, "<EMAIL>"),
    (PHONE_RE, "<PHONE>"),
    (CREDIT_CARD_RE, "<CREDIT_CARD>"),
    (IBAN_RE, "<IBAN>"),
]


def count_matches(c: Column | str, pattern: str) -> Column:
    """Count non-overlapping regex matches; 0 for null input."""
    s = F.coalesce(_col(c), F.lit(""))
    return F.regexp_count(s, F.lit(pattern)).cast("long")


def email_hits(c: Column | str) -> Column:
    return count_matches(c, EMAIL_RE)


def simple_phone_hits(c: Column | str) -> Column:
    return count_matches(c, SIMPLE_PHONE_RE)


def phone_hits(c: Column | str) -> Column:
    return count_matches(c, PHONE_RE)


def cc_hits(c: Column | str) -> Column:
    return count_matches(c, CREDIT_CARD_RE)


def iban_hits(c: Column | str) -> Column:
    return count_matches(c, IBAN_RE)


def has_pii(c: Column | str) -> Column:
    return (email_hits(c) + phone_hits(c) + cc_hits(c) + iban_hits(c)) > 0


def mask_pii(c: Column | str) -> Column:
    """Chained replacement in the reference's exact order; null passes through."""
    s = _col(c).cast("string")
    for pattern, placeholder in MASK_ORDER:
        s = F.regexp_replace(s, pattern, placeholder)
    return s
