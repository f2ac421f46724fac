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


# Round-4 priority: every query whose implementation or oracle CHANGED this
# round ships with a same-round correctness row (the driver caps each round
# at 50 rows — edits must never ride on a stale green). Then the queries the
# r1∪r2∪r3 union left thinnest, then the rest of the registry.
_PRIORITY_R4 = [
    # changed this round: d08 lineage type fix (the r1-r3 red row), IVF query
    # flipped to the indexed probe, LSH bucket cap default in the minhash
    # path, rel_q15 integer-unit sums, decontaminate oracle symmetry,
    # span-dedup interval-merge rebuild
    "d08_minhash_dedup", "emb_ivf_topk", "rel_q15_top_supplier",
    "corp_decontaminate", "corp_span_dedup",
    "d03_minhash_lsh_pairs", "d04_ngram_jaccard_pairs", "d09_incremental_dedup",
    # new this round: OR-amplified embedding LSH + its recall audit, token
    # contract, TPC-H Q21
    "emb_near_dup_lsh_or", "emb_lsh_or_recall", "p22e_token_contract",
    "rel_q21_waiting_suppliers", "emb_ivf_recall2",
    "mm_media_dedup", "mm_frame_plan", "ev_stream_sessionize",
    "f06_token_bounds",
    # neighbors of changed code
    "emb_near_dup_pairs", "emb_near_dup_lsh", "emb_ivf_recall",
    "emb_lsh_bucket_sizes", "d05_simhash", "d07_simhash_pairs",
    # r2-green queries whose freshest row is oldest
    "p01_doc_identity", "p04_char_word_counts", "p05_quality_metrics",
    "p06_pii_hits", "p07_toxicity", "p09_langid", "p09b_langid_trigram",
    "p11_strip_html", "p12_boilerplate_lines", "p15_token_stats",
    "p16_pii_mask", "p17_canonicalize",
    "p20_quality_score", "u01_union_by_name", "o02_shard_assign",
    "o02b_shard_manifest", "o03_toy_sample", "a11_quantiles",
    # r3 greens to keep warm
    "ev_stream_enrich", "ev_stream_dedup", "ev_stream_tumbling",
    "rel_q7_volume_shipping", "rel_q8_market_share", "rel_q9_product_profit",
    "corp_rep_signals", "corp_cross_dup_ngrams", "corp_para_dedup",
    "corp_pack_spans", "corp_pack_manifest",
    "p22c_gpt2_golden_parity", "p22d_bpe_roundtrip", "a12_approx_sketches",
    "f01_prefilter", "f03_quality_filter", "f04_low_information",
    "d01_exact_dedup", "d02_near_dedup", "d06_fingerprint",
    "a01_source_counts", "a05_numeric_summary", "a07_histogram",
]


def _registry():
    from llm_pretraining_data_pipeline_spark import queries as q
    from llm_pretraining_data_pipeline_spark import queries_corpus  # noqa: F401 (registers)
    from llm_pretraining_data_pipeline_spark import queries_ext  # noqa: F401 (registers)
    from llm_pretraining_data_pipeline_spark import queries_rel  # noqa: F401 (registers)

    ordered = {n: q.QUERIES[n] for n in _PRIORITY_R4 if n in q.QUERIES}
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
