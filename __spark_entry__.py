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


# Round-5 priority: (a) every query whose implementation or oracle CHANGED
# this round ships with a same-round correctness row (the driver caps each
# round at 50 rows — edits must never ride on a stale green), then (b) the
# 42 queries whose freshest green is still r1/r2 (VERDICT r4 item 1: a
# three-round-old green is an assumption, not a fact), then the rest.
_PRIORITY_R5 = [
    # new this round: real P8 logistic scorer, trained-centroid IVF recall,
    # SemDeDup semantic dedup, URL stage (normalize/dedup/domain-blocklist)
    "p08_model_quality", "emb_ivf_recall_trained", "emb_semdedup",
    "p27_url_normalize", "d10_url_dedup", "a13_domain_stats",
    "p28_lm_logprob", "f11_gopher_filter", "emb_kmeans_stats",
    "ev_stream_attribution", "emb_pq_codes", "emb_pq_topk", "corp_tfidf_top3", "corp_chunk_spans",
    "f12_source_median_gate", "o04_source_quota", "corp_token_budget",
    "corp_dsir_select",
    # changed this round: exact_dedup narrow_shuffle path + CC zero-iter
    # guard (dedup.py), d03 pins max_bucket_size=None to the oracle contract,
    # emb_ivf_topk staging path made deterministic + cleanup-registered,
    # p20 shares the reworked scoring module
    "d01_exact_dedup", "d02_near_dedup", "d03_minhash_lsh_pairs",
    "d08_minhash_dedup", "d09_incremental_dedup", "emb_ivf_topk",
    "p20_quality_score",
    # stale r1/r2 greens (most recent row three rounds old) — refresh all 42;
    # p22_tokenize doubles as coverage for this round's tokenizer.py edit
    "p22_tokenize", "p23_pick_text", "p10_non_latin_ratio",
    "u02_intersect_except", "s04_jsonl_projection",
    "rel_q1_pricing_summary", "rel_q3_shipping_priority",
    "rel_q5_local_supplier", "rel_q6_revenue_delta", "rel_q12_shipmode_case",
    "rel_q14_promo_ratio", "rel_q19_disjunctive", "rel_in_subquery",
    "rel_having_large_orders", "rel_semi_join", "rel_anti_join",
    "rel_outer_join", "rel_rollup_orders", "rel_cube_lineitem",
    "rel_grouping_sets", "rel_pivot", "rel_distinct_counts",
    "win_above_avg_orders", "win_rank_family", "win_top3_orders_per_customer",
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

    ordered = {n: q.QUERIES[n] for n in _PRIORITY_R5 if n in q.QUERIES}
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
