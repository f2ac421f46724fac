"""Reporting layer: the reference's metrics_summary.json golden-output shape
(reports/metrics_summary.json:1-52, produced by plots_charts.py:111-340).

Everything heavy is a Spark aggregation; only scalar aggregates and ≤100-row
histograms reach the driver. PNG rendering is gated behind matplotlib
availability (aggregates are the contract; plots are presentation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from llm_pretraining_data_pipeline_spark.operators.aggregates import (
    drop_reason_counts,
    histogram,
)


def _stats_block(df: DataFrame, col: str) -> dict:
    row = df.agg(
        F.count(col).alias("count"),
        F.avg(col).alias("mean"),
        F.min(col).alias("min"),
        F.expr(f"median({col})").alias("median"),
        F.max(col).alias("max"),
    ).collect()[0]
    return {
        "count": int(row["count"] or 0),
        "mean": float(row["mean"]) if row["mean"] is not None else None,
        "min": float(row["min"]) if row["min"] is not None else None,
        "median": float(row["median"]) if row["median"] is not None else None,
        "max": float(row["max"]) if row["max"] is not None else None,
    }


def metrics_summary(result: DataFrame) -> dict:
    """Reference-shaped run summary from the fused pipeline result frame.

    One cache + a handful of aggregation jobs; mirrors the blocks of
    reports/metrics_summary.json (stage counts, n_tokens distribution,
    quality/subset distribution, PII totals, drop reasons).
    """
    result = result.cache()
    kept = result.filter(F.col("drop_reason").isNull())

    summary: dict = {}
    totals = result.agg(
        F.count(F.lit(1)).alias("input_docs"),
        F.count_if(F.col("drop_reason").isNull()).alias("kept_docs"),
    ).collect()[0]
    summary["docs"] = {
        "input": int(totals.input_docs),
        "kept": int(totals.kept_docs),
        "dropped": int(totals.input_docs - totals.kept_docs),
    }
    summary["n_tokens"] = _stats_block(kept, "n_tokens")
    summary["n_tokens"]["total"] = int(
        kept.agg(F.sum("n_tokens")).collect()[0][0] or 0
    )
    summary["quality_score"] = _stats_block(kept, "quality_score")
    summary["subsets"] = {
        r.subset: int(r.cnt)
        for r in kept.groupBy("subset").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    summary["lang"] = {
        r.lang: int(r.cnt)
        for r in kept.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    summary["pii"] = {
        k: int(v or 0)
        for k, v in kept.agg(
            F.sum("pii_email_hits").alias("email"),
            F.sum("pii_phone_hits").alias("phone"),
            F.sum("pii_cc_hits").alias("cc"),
            F.sum("pii_iban_hits").alias("iban"),
            F.count_if(F.col("has_pii")).alias("docs_with_pii"),
        ).collect()[0].asDict().items()
    }
    summary["drop_reasons"] = {
        r["drop_reason"]: int(r["count"]) for r in drop_reason_counts(result).collect()
    }
    result.unpersist()
    return summary


def render_histograms(result: DataFrame, out_dir: str,
                      cols: list[str] | None = None) -> list[str]:
    """S7 plot sink: Spark-side histogram aggregation, matplotlib rendering
    driver-side. Returns written paths; no-op (empty list) without matplotlib."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return []

    import os

    os.makedirs(out_dir, exist_ok=True)
    written = []
    for col in cols or ["n_tokens", "quality_score"]:
        if col not in result.columns:
            continue
        bins = histogram(result.filter(F.col(col).isNotNull()), col, bins=50).collect()
        if not bins:
            continue
        fig, ax = plt.subplots(figsize=(8, 4))
        ax.bar([r.bin_lo for r in bins], [r["count"] for r in bins],
               width=[r.bin_hi - r.bin_lo for r in bins], align="edge")
        ax.set_title(f"{col} distribution")
        path = os.path.join(out_dir, f"{col}_hist.png")
        fig.savefig(path)
        plt.close(fig)
        written.append(path)
    return written
