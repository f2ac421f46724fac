"""Stage-8 exports + reporting contract over a real pipeline run."""

import json
import os

import pytest
from pyspark.sql import functions as F

from llm_pretraining_data_pipeline_spark.operators import reporting, sharding
from llm_pretraining_data_pipeline_spark.plans import exports
from llm_pretraining_data_pipeline_spark.plans import pipeline as P
from llm_pretraining_data_pipeline_spark.sources import io as src


@pytest.fixture(scope="module")
def pipeline_result(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    raw = docs.select(
        F.concat(F.lit("http://t/"), F.col("doc_id")).alias("url"), "text"
    )
    out = P.run_pipeline(
        raw, P.PipelineConfig(use_nfkc=False, apply_lang_filter=False)
    ).cache()
    yield out
    out.unpersist()


class TestExports:
    def test_text_jsonl(self, spark, pipeline_result, tmp_path):
        out = str(tmp_path / "text_jsonl")
        kept = P.kept(pipeline_result)
        exports.write_text_jsonl(kept, out)
        lines = [
            json.loads(l)
            for f in os.listdir(out) if f.startswith("part-")
            for l in open(os.path.join(out, f)).read().splitlines()
        ]
        assert len(lines) == kept.count()
        assert all(list(l.keys()) == ["doc_id", "text", "source"] for l in lines)
        assert all(l["text"].strip() for l in lines)

    def test_sharded_export_with_manifest(self, spark, pipeline_result, tmp_path):
        kept = sharding.assign_shards(P.kept(pipeline_result), docs_per_shard=100)
        out = str(tmp_path / "shards")
        manifest = exports.write_sharded_jsonl(kept, out)
        shard_dirs = sorted(d for d in os.listdir(out) if d.startswith("shard_id="))
        assert len(shard_dirs) == manifest["num_shards"]
        assert manifest["total_docs"] == kept.count()
        assert manifest["total_tokens"] == (
            kept.agg(F.sum("n_tokens")).collect()[0][0]
        )
        exports.write_manifest(manifest, str(tmp_path / "manifest.json"))
        assert json.load(open(tmp_path / "manifest.json")) == manifest

    def test_csv_report_sink(self, spark, pipeline_result, tmp_path):
        from llm_pretraining_data_pipeline_spark.operators.aggregates import (
            drop_reason_counts,
        )

        out = str(tmp_path / "drop_reasons_csv")
        src.write_csv_report(drop_reason_counts(pipeline_result), out)
        files = [f for f in os.listdir(out) if f.endswith(".csv")]
        assert len(files) == 1
        content = open(os.path.join(out, files[0])).read().splitlines()
        assert content[0] == "drop_reason,count"


class TestReporting:
    def test_metrics_summary_shape(self, pipeline_result):
        s = reporting.metrics_summary(pipeline_result)
        assert s["docs"]["input"] == 500
        assert s["docs"]["kept"] + s["docs"]["dropped"] == 500
        assert s["n_tokens"]["total"] > 0
        assert s["n_tokens"]["min"] <= s["n_tokens"]["median"] <= s["n_tokens"]["max"]
        assert 0.0 <= s["quality_score"]["mean"] <= 1.0
        assert sum(s["subsets"].values()) == s["docs"]["kept"]
        assert sum(s["drop_reasons"].values()) == s["docs"]["dropped"]
        assert set(s["pii"]) == {"email", "phone", "cc", "iban", "docs_with_pii"}

    def test_histogram_render_gated(self, pipeline_result, tmp_path):
        paths = reporting.render_histograms(
            P.kept(pipeline_result), str(tmp_path / "plots")
        )
        try:
            import matplotlib  # noqa: F401

            assert len(paths) == 2 and all(os.path.exists(p) for p in paths)
        except ImportError:
            assert paths == []
