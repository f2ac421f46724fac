#!/usr/bin/env python
"""Regenerate metrics_vec's JVM-vs-Python word-char exception ranges.

Sweeps every Unicode codepoint (minus surrogates) through the JVM's
``(?U)\\w`` via a Spark job and diffs against the category-based Python
predicate. Run after a JDK/Spark/Python upgrade and paste the output over
``_JVM_ONLY_RANGES`` / ``_PY_ONLY_RANGES`` in functions/metrics_vec.py —
tests/test_metrics_vec.py runs the same sweep and fails if the tables drift.
"""

from __future__ import annotations

import os
import sys
import unicodedata

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from llm_pretraining_data_pipeline_spark.session import get_spark  # noqa: E402

_WORD_CATEGORIES = ("Mn", "Mc", "Me", "Pc", "Nd", "Nl")


def category_predicate(ch: str) -> bool:
    """The un-excepted Python mirror of one-char (?U)\\w."""
    if ch == "_" or ord(ch) in (0x200C, 0x200D):
        return True
    if unicodedata.category(ch) in _WORD_CATEGORIES:
        return True
    return ch.isalpha()


def to_ranges(cps: list[int]) -> list[tuple[int, int]]:
    cps = sorted(cps)
    out: list[list[int]] = []
    for cp in cps:
        if out and cp == out[-1][1] + 1:
            out[-1][1] = cp
        else:
            out.append([cp, cp])
    return [(a, b) for a, b in out]


def sweep(spark) -> tuple[list[tuple[int, int]], list[tuple[int, int]]]:
    cps = list(range(1, 0xD800)) + list(range(0xE000, 0x110000))
    df = spark.createDataFrame(
        [(cp, chr(cp)) for cp in cps], "cp int, ch string"
    ).repartition(32)
    jvm = df.select(
        "cp",
        (F.size(F.regexp_extract_all(F.col("ch"), F.lit("(?U)\\w"), F.lit(0))) > 0).alias("is_w"),
    ).collect()
    jvm_only = [r.cp for r in jvm if r.is_w and not category_predicate(chr(r.cp))]
    py_only = [r.cp for r in jvm if not r.is_w and category_predicate(chr(r.cp))]
    return to_ranges(jvm_only), to_ranges(py_only)


def main() -> int:
    spark = get_spark(app_name="gen_jvm_word_exceptions", master="local[*]")
    jvm_ranges, py_ranges = sweep(spark)

    def fmt(rs):
        return "(" + ", ".join(f"(0x{a:X}, 0x{b:X})" for a, b in rs) + ")"

    print("_JVM_ONLY_RANGES =", fmt(jvm_ranges))
    print("_PY_ONLY_RANGES =", fmt(py_ranges))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
