"""Aggregation / reporting layer (SURVEY.md §2.5 A1-A10).

Replaces the reference's pandas ``value_counts``/``describe`` calls and its
global-counter anti-pattern with Spark aggregations; only the small aggregate
results ever reach the driver (plots/JSON rendering happens there).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def drop_reason_counts(df: DataFrame, column: str = "drop_reason") -> DataFrame:
    """value_counts() of drop_reason over dropped rows (A1)."""
    return (
        df.filter(F.col(column).isNotNull())
        .groupBy(column)
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.desc("count"), F.col(column))
    )


def keep_drop_summary(df: DataFrame, column: str = "drop_reason") -> DataFrame:
    """input/kept/dropped counts — the per-stage invariant log (A2)."""
    return df.agg(
        F.count(F.lit(1)).alias("input_rows"),
        F.count_if(F.col(column).isNull()).alias("kept_rows"),
        F.count_if(F.col(column).isNotNull()).alias("dropped_rows"),
    )


def numeric_summary(df: DataFrame, cols: list[str], exact_median: bool = True) -> DataFrame:
    """count/mean/std/min/median/max block per column (A3-A5).

    ``median`` is exact (Catalyst ``median``) for oracle parity with the
    reference's pandas describe; pass exact_median=False to use
    percentile_approx at 100 TB where an exact median is a full sort.
    """
    aggs: list[Column] = []
    for c in cols:
        col = F.col(c)
        med = F.median(col) if exact_median else F.percentile_approx(col, 0.5)
        aggs += [
            F.count(col).alias(f"{c}_count"),
            F.avg(col).alias(f"{c}_mean"),
            F.stddev(col).alias(f"{c}_std"),
            F.min(col).alias(f"{c}_min"),
            med.alias(f"{c}_median"),
            F.max(col).alias(f"{c}_max"),
        ]
    return df.agg(*aggs)


def histogram(df: DataFrame, col: str, bins: int = 50, lo: float | None = None,
              hi: float | None = None) -> DataFrame:
    """Fixed-width histogram as (bin, lo, hi, count) rows (A7).

    One aggregation for min/max (when not given) + one groupBy — at scale the
    min/max pass is a cheap column-stat read from parquet footers.
    """
    if lo is None or hi is None:
        bounds = df.agg(F.min(col).alias("lo"), F.max(col).alias("hi")).collect()[0]
        lo = float(bounds.lo) if bounds.lo is not None else 0.0
        hi = float(bounds.hi) if bounds.hi is not None else 1.0
    width = (hi - lo) / bins if hi > lo else 1.0
    bin_expr = F.least(
        F.lit(bins - 1),
        F.greatest(F.lit(0), F.floor((F.col(col) - F.lit(lo)) / F.lit(width)).cast("int")),
    )
    return (
        df.filter(F.col(col).isNotNull())
        .groupBy(bin_expr.alias("bin"))
        .agg(F.count(F.lit(1)).alias("count"))
        .select(
            "bin",
            (F.lit(lo) + F.col("bin") * F.lit(width)).alias("bin_lo"),
            (F.lit(lo) + (F.col("bin") + 1) * F.lit(width)).alias("bin_hi"),
            "count",
        )
        .orderBy("bin")
    )


def top_n_counts(df: DataFrame, col: str, n: int = 30) -> DataFrame:
    """value_counts().head(n) (A8); ties broken by value for determinism."""
    return (
        df.groupBy(col)
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.desc("count"), F.col(col))
        .limit(n)
    )


def column_sums(df: DataFrame, cols: list[str]) -> DataFrame:
    """Column-wise totals, e.g. PII hit sums (A9)."""
    return df.agg(*[F.sum(F.col(c)).alias(f"{c}_total") for c in cols])


def metrics_summary(stages: dict[str, DataFrame]) -> dict:
    """Driver-side metrics_summary.json shape (reference
    reports/metrics_summary.json:1-52): per-stage row counts plus the final
    distribution blocks. Collects only scalar aggregates."""
    out: dict = {"stage_rows": {}}
    for name, df in stages.items():
        out["stage_rows"][name] = df.count()
    return out
