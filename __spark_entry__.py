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


# Round-7 priority: (a) every query whose implementation or oracle CHANGED
# this round ships with a same-round correctness row (the driver caps each
# round at 50 rows — edits must never ride on a stale green), then (b) the
# 25 queries whose freshest green is still r3 (the only remaining stale
# tail — VERDICT r6 item 1), then the rest. Appended to as round-7 work
# lands.
_PRIORITY_R7 = [
    # changed this round — ADVICE r6: per-operator salted sampling draws
    # (':stratum'/':sample'/':split'), explicit-class sentence boundary
    # (\x0B), \x01 span-identity sentinel, whitespace-anchored href regex
    # (+ data-href/xlink:href fixture decoys), d10 oracle now pins the
    # null/empty solo-key contract with planted NULL/blank URLs
    "corp_stratified_sample", "o05_weighted_sample", "o06_hash_split",
    "d10_url_dedup", "p29_extract_links",
    "f13_c4_filter", "d11_c4_span_dedup",
    # new this round: real pure-stdlib PNG decoder (zlib inflate + all five
    # scanline filters) refereed against a closed-form pixel formula
    "mm_png_features",
    # new this round: arbitrary-length ExactSubstr dedup (shingle-chain
    # stitching into maximal runs, gaps-and-islands oracle); corp_span_dedup
    # re-checked because its interval fold was lifted to a shared helper
    "d13_exact_substr", "corp_span_dedup",
    # new this round: hashed-token logistic quality model — training
    # replayed end-to-end by a SQL CTE-chain referee; frozen-weights scorer
    "p35_hashed_quality_train", "p36_hashed_quality_score",
    # new this round: pure-SQL-text relational surface over registered
    # views; the four partsupp TPC-H queries re-checked (shared CTE moved
    # to sql_views.PARTSUPP_SELECT)
    "rel_sql_surface", "rel_q2_min_cost_supplier", "rel_q11_important_stock",
    "rel_q16_supplier_part_counts", "rel_q20_promotion_suppliers",
    # new this round: Flesch readability + Zipf rank-frequency audit
    "p37_readability", "a16_zipf_slope",
    # new this round: IVF-PQ composed ANN (FAISS IVFPQ shape); streaming
    # model-based quality scoring (integer-exact complete-mode aggregate)
    "emb_ivfpq_topk", "ev_stream_quality",
    # new this round: exact-dup cluster-size audit + token-entropy signal
    # + mixture-weighted interleave (stride-scheduled training order)
    "d14_dup_cluster_stats", "p38_token_entropy", "o08_mixture_interleave",
    # new this round: DCLM-style composite model-quality gate
    "f15_model_quality_filter",
    # stale: freshest driver green is r3 — 24 of VERDICT r6's 25-row list;
    # the 25th, corp_stratified_sample, sits in the changed head above
    # (its draw was salted this round)
    "f01_prefilter", "f03_quality_filter", "f04_low_information",
    "d06_fingerprint",
    "a01_source_counts", "a02_boolean_mask_sums", "a05_numeric_summary",
    "a07_histogram", "a08_top_sources", "a09_lang_breakdown",
    "a10_cleanup_stats", "a12_approx_sketches",
    "rel_q4_order_priority", "rel_q10_returned_items",
    "rel_q13_count_distribution", "rel_q17_small_quantity",
    "rel_q18_large_orders", "rel_q22_idle_customers",
    "p22c_gpt2_golden_parity", "p22d_bpe_roundtrip",
    "corp_mixture_weights", "corp_vocab_top50",
    "corp_pack_spans", "corp_pack_manifest",
]


def _registry():
    from llm_pretraining_data_pipeline_spark import queries as q
    from llm_pretraining_data_pipeline_spark import queries_corpus  # noqa: F401 (registers)
    from llm_pretraining_data_pipeline_spark import queries_ext  # noqa: F401 (registers)
    from llm_pretraining_data_pipeline_spark import queries_rel  # noqa: F401 (registers)

    ordered = {n: q.QUERIES[n] for n in _PRIORITY_R7 if n in q.QUERIES}
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
