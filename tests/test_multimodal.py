"""Multimodal plumbing: schema, Arrow batch shapes, stubbed decode, dedup,
frame-sample plan."""

from pyspark.sql import functions as F

from llm_pretraining_data_pipeline_spark.multimodal import media as M


class TestMultimodal:
    def test_feature_extraction_deterministic(self, spark):
        m = M.synthetic_media(spark, n=30)
        f1 = {r.media_id: (r.content_sha256, tuple(r.feature)) for r in
              M.extract_features(m).collect()}
        f2 = {r.media_id: (r.content_sha256, tuple(r.feature)) for r in
              M.extract_features(m).collect()}
        assert f1 == f2 and len(f1) == 30
        for sha, feat in f1.values():
            assert len(feat) == M.FEATURE_DIM
            assert all(0.0 <= x <= 1.0 for x in feat)

    def test_unknown_kind_flagged_not_fatal(self, spark):
        m = M.synthetic_media(spark, n=6).withColumn(
            "kind", F.when(F.col("media_id") == 0, "hologram").otherwise(F.col("kind"))
        )
        rows = {r.media_id: r for r in M.extract_features(m).collect()}
        assert rows[0].decode_ok is False
        assert all(rows[i].decode_ok for i in range(1, 6))

    def test_media_dedup(self, spark):
        m = M.synthetic_media(spark, n=12)
        doubled = m.union(m.withColumn("media_id", F.col("media_id") + 100))
        out = {r.media_id: r.is_dup for r in M.media_dedup_exact(doubled).collect()}
        assert sum(out.values()) == 12  # every copy marked, no original marked
        assert not any(out[i] for i in range(12))

    def test_frame_sample_plan_is_metadata_only(self, spark, tmp_path):
        # through parquet, so column pruning is observable in the scan schema
        M.synthetic_media(spark, n=9).write.mode("overwrite").parquet(
            str(tmp_path / "media.parquet")
        )
        m = spark.read.parquet(str(tmp_path / "media.parquet"))
        plan = M.frame_sample_plan(m, every_ms=1000)
        rows = plan.collect()
        assert len(rows) > 0
        by_media = {}
        for r in rows:
            by_media.setdefault(r.media_id, []).append(r.frame_ts_ms)
        for ts_list in by_media.values():
            assert ts_list == sorted(ts_list)
            assert ts_list[0] == 0
        # the parquet scan must prune the payload column (ReadSchema excludes it)
        physical = plan._jdf.queryExecution().executedPlan().toString()
        assert "ReadSchema" in physical
        read_schema = physical.split("ReadSchema:")[1].splitlines()[0]
        assert "payload" not in read_schema, read_schema
