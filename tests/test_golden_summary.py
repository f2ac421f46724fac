"""Golden-output contract: the full-pipeline metrics summary over sf0.001
must stay bit-stable across refactors (the engine's analogue of the
reference's reports/metrics_summary.json golden file, SURVEY.md §5)."""

import json
import os

from pyspark.sql import functions as F

from llm_pretraining_data_pipeline_spark.operators import reporting
from llm_pretraining_data_pipeline_spark.plans import pipeline as P

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "metrics_summary_sf0001.json")


def _round(x, nd=9):
    if isinstance(x, float):
        return round(x, nd)
    if isinstance(x, dict):
        return {k: _round(v, nd) for k, v in x.items()}
    return x


def test_metrics_summary_matches_golden(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    raw = docs.select(F.concat(F.lit("http://t/"), F.col("doc_id")).alias("url"), "text")
    out = P.run_pipeline(raw, P.PipelineConfig(use_nfkc=False, apply_lang_filter=False))
    got = _round(reporting.metrics_summary(out))
    expected = json.load(open(GOLDEN))
    assert got == expected
