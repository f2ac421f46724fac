"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship end-to-end document pipeline; ``queries`` /
``oracle_sql`` expose the operator inventory (SURVEY.md §2) with DuckDB
oracle SQL for every SQL-expressible operator. Implementation lives in
``llm_pretraining_data_pipeline_spark``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full 8-stage pipeline over sf0.001 documents, returning
    the per-outcome summary (kept subsets + drop reasons with counts and mean
    quality) — the engine's metrics_summary contract in one DataFrame.

    The language filter is disabled for the synthetic corpus (random word
    soup has no coherent language; the filter itself is exercised by
    tests/test_pipeline_e2e.py with language-bearing fixtures).
    """
    from llm_pretraining_data_pipeline_spark.plans import pipeline as P
    from llm_pretraining_data_pipeline_spark.session import get_spark

    get_spark()  # patch runtime conf (AQE/arrow/UTC) on the driver's session

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    raw = docs.select(
        F.concat(F.lit("http://testdata/"), F.col("doc_id")).alias("url"), "text"
    )
    cfg = P.PipelineConfig(use_nfkc=True, apply_lang_filter=False)
    out = P.run_pipeline(raw, cfg)
    outcome = F.coalesce(
        F.col("drop_reason"), F.concat(F.lit("kept:"), F.col("subset"))
    )
    return (
        out.groupBy(outcome.alias("outcome"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.avg("quality_score"), 6).alias("avg_quality"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .orderBy(F.desc("cnt"), F.col("outcome"))
    )


# Round-6 priority: (a) every query whose implementation or oracle CHANGED
# this round ships with a same-round correctness row (the driver caps each
# round at 50 rows — edits must never ride on a stale green), then (b) the
# queries whose freshest green is still r1/r2 (the tail the r5 cap cut off),
# then the rest. Appended to as round-6 work lands.
_PRIORITY_R6 = [
    # changed this round: URL fragment-first normalisation (ADVICE r5 #1)
    # touches all three URL oracles; emb_pq_codes stringified for the
    # referee (ADVICE r5 #2, never green before); d10 also gains the
    # null/empty solo-key guard (ADVICE r5 #3)
    "emb_pq_codes", "p27_url_normalize", "d10_url_dedup", "a13_domain_stats",
    # new this round: the four TPC-H queries needing partsupp (derived
    # deterministically from lineitem's key pairs) — completes TPC-H 1–22
    "rel_q2_min_cost_supplier", "rel_q11_important_stock",
    "rel_q16_supplier_part_counts", "rel_q20_promotion_suppliers",
    # new this round: C4 cleanup battery + three-sentence span dedup,
    # weighted soft sampling, cross-source n-gram overlap audit
    "f13_c4_filter", "d11_c4_span_dedup",
    "o05_weighted_sample", "a14_source_overlap", "f14_refinedweb_lines",
    "d12_corpus_diff", "p29_extract_links",
    "p30_train_unigram_lm", "p31_trained_lm_score",
    # changed this round: gopher/repetition signals rewritten (join ->
    # inline let-bound lazy expressions) and the C4 bad-word rule made
    # punctuation-tolerant — their oracles must not ride a stale green
    "f11_gopher_filter", "corp_rep_signals", "f13_c4_filter",
    # new: mojibake repair + per-source quality deciles
    "p32_fix_mojibake", "a15_quality_deciles", "p33_meta_robots",
    "o06_hash_split", "p34_bigram_lm_score", "ev_stream_cleanse",
    # stale: freshest green is r1/r2 (the r5 50-row cap left these 17)
    "win_running_quantity", "win_lag_price_delta", "win_range_frame",
    "win_value_family",
    "ev_tumbling_5min", "ev_sliding_10m5m", "ev_hourly_rollup",
    "ev_sessionize", "ev_asof_last_click", "ev_user_stats",
    "ev_json_props", "ev_date_parts",
    "emb_cosine_topk", "emb_knn_join", "emb_label_stats",
    "p25_string_functions", "p26_array_ops",
]


def _registry():
    from llm_pretraining_data_pipeline_spark import queries as q
    from llm_pretraining_data_pipeline_spark import queries_corpus  # noqa: F401 (registers)
    from llm_pretraining_data_pipeline_spark import queries_ext  # noqa: F401 (registers)
    from llm_pretraining_data_pipeline_spark import queries_rel  # noqa: F401 (registers)

    ordered = {n: q.QUERIES[n] for n in _PRIORITY_R6 if n in q.QUERIES}
    ordered.update({n: qd for n, qd in q.QUERIES.items() if n not in ordered})
    return ordered


def _patched(fn: Callable[[SparkSession, str], DataFrame]):
    """Wrap a query callable so an externally-provided SparkSession gets the
    engine's runtime-settable confs (UTC, arrow, AQE, nanosAsLong) before the
    query builds its plan — the driver's session is not built by us."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from llm_pretraining_data_pipeline_spark.session import _apply_runtime_conf, default_parallelism

        _apply_runtime_conf(spark, default_parallelism())
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _patched(qd.spark) for name, qd in _registry().items()}


def oracle_sql() -> dict[str, str]:
    return {name: qd.oracle for name, qd in _registry().items() if qd.oracle is not None}
