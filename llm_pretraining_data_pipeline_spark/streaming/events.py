"""Structured Streaming surface over the events stream.

The reference is strictly batch (SURVEY.md §2.8); this is the prompt-mandated
streaming extension: windowed aggregations with watermarks, session windows,
and a custom stateful sessionizer via ``applyInPandasWithState``.

Local tests drive these with the parquet file source + ``processAllAvailable``
(one synchronous drain), which makes streaming results comparable against the
batch/DuckDB oracle — at scale the same code points at Kafka/files and runs
continuously with the watermark bounding state.
"""

from __future__ import annotations

import uuid
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from llm_pretraining_data_pipeline_spark.sources import io as src


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet with the nano→micro ts conversion
    (schema taken from a static read — streaming sources must declare one)."""
    src.read_events(spark, sf_dir)  # sets nanosAsLong / NTZ-off defensively
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    raw_schema = raw.schema
    # The file stream source needs a directory; expose the single parquet
    # file through a symlinked staging dir (testdata itself is read-only).
    # The staging path is deterministic per source dir and reused across
    # calls, so repeated streams don't leak temp dirs.
    import hashlib
    import os
    import tempfile

    key = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    stage = os.path.join(tempfile.gettempdir(), f"events_stream_{key}")
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "events.parquet")
    target = os.path.abspath(f"{sf_dir}/events.parquet")
    # lexists (not exists): a dangling symlink — testdata moved/recreated —
    # must be replaced, not skipped (exists() follows the link and says False,
    # and the subsequent symlink() would raise FileExistsError).
    if os.path.lexists(link):
        if os.path.islink(link) and os.readlink(link) == target:
            pass  # already points at the current file
        else:
            os.remove(link)
            os.symlink(target, link)
    else:
        os.symlink(target, link)
    stream = spark.readStream.schema(raw_schema).parquet(stage)
    ts_type = dict(raw.dtypes).get("ts")
    if ts_type == "bigint":
        return stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if ts_type == "timestamp_ntz":  # NTZ conf not settable on this session
        return stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def tumbling_counts(stream: DataFrame, width: str = "5 minutes",
                    watermark: str = "10 minutes") -> DataFrame:
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "cnt")
    )


def sliding_value_sums(stream: DataFrame, width: str = "10 minutes",
                       slide: str = "5 minutes", watermark: str = "10 minutes") -> DataFrame:
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width, slide).alias("w"), "event_type")
        .agg(F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "total_value")
    )


def session_window_counts(stream: DataFrame, gap: str = "30 minutes",
                          watermark: str = "30 minutes") -> DataFrame:
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def _drain_to_memory(agg: DataFrame, output_mode: str) -> DataFrame:
    """Run a bounded streaming query to completion into a memory sink and
    return the resulting table (test/driver harness helper)."""
    name = f"stream_out_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    spark = agg.sparkSession
    return spark.table(name)


def run_tumbling_stream_once(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of the ev_tumbling batch query: complete-mode drain of
    the 5-minute tumbling counts. Results equal the batch aggregation because
    processAllAvailable consumes the whole bounded source."""
    stream = read_events_stream(spark, sf_dir)
    agg = (
        stream.groupBy(F.window("ts", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "cnt")
    )
    return _drain_to_memory(agg, "complete")


def run_session_stream_once(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = read_events_stream(spark, sf_dir)
    return _drain_to_memory(session_window_counts(stream), "complete")


def run_stateful_session_stream_once(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded drain of the applyInPandasWithState sessionizer.

    Emission contract on a bounded input (what the DuckDB referee mirrors):
    a session row is emitted iff (a) a later event of the same user closed it
    by exceeding the gap, or (b) it is the user's final session AND the
    event-time timeout fired during the drain — i.e. the final watermark
    (global max ts − 30 min) passed its last event + gap, equivalently
    session_end < max_ts − 60 min. Final sessions newer than that stay open
    in state and are correctly NOT emitted.
    """
    stream = read_events_stream(spark, sf_dir)
    return _drain_to_memory(sessionize_stateful(stream), "append")


# -------------------------------------------------- custom stateful operator


SESSION_OUTPUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, n_events bigint"
)
SESSION_STATE_SCHEMA = "start_us bigint, last_us bigint, n bigint"


def sessionize_stateful(stream: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Custom stateful sessionizer via applyInPandasWithState.

    Keeps (session start, last event, count) per user in state; emits a row
    whenever a gap closes a session, and flushes the open session on event-
    time timeout. This is the template for stateful operators the built-in
    session_window cannot express (e.g. value-dependent gaps).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_seconds * 1_000_000

    def fn(key, pdfs: Iterator["pd.DataFrame"], state: GroupState):
        (user_id,) = key
        rows = []
        if state.hasTimedOut:
            if state.exists:
                start_us, last_us, n = state.get
                rows.append((user_id, start_us, last_us, n))
                state.remove()
        else:
            events = pd.concat(list(pdfs)).sort_values("ts")
            ts_us = (events["ts"].astype("int64") // 1000).tolist()
            if state.exists:
                start_us, last_us, n = state.get
            else:
                start_us = last_us = None
                n = 0
            for t in ts_us:
                if last_us is not None and t - last_us > gap_us:
                    rows.append((user_id, start_us, last_us, n))
                    start_us, n = t, 0
                if start_us is None:
                    start_us = t
                last_us = t
                n += 1
            state.update((start_us, last_us, n))
            state.setTimeoutTimestamp(last_us // 1000 + gap_seconds * 1000)
        out = pd.DataFrame(
            rows, columns=["user_id", "start_us", "last_us", "n"]
        )
        out["session_start"] = pd.to_datetime(out["start_us"], unit="us")
        out["session_end"] = pd.to_datetime(out["last_us"], unit="us")
        yield out[["user_id", "session_start", "session_end", "n"]].rename(
            columns={"n": "n_events"}
        )

    return (
        stream.withWatermark("ts", "30 minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def stream_to_parquet_exactly_once(
    agg: DataFrame, out_dir: str, checkpoint_dir: str
) -> "object":
    """foreachBatch parquet sink with epoch-keyed idempotent writes.

    The memory/file sinks can duplicate rows on retry; foreachBatch +
    overwrite-by-epoch-directory gives exactly-once delivery for aggregation
    outputs (each epoch's directory is rewritten atomically on retry, and
    the checkpoint ties epoch ids to source offsets). Returns the started
    StreamingQuery; caller drives it (processAllAvailable/stop).
    """

    def write_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{out_dir}/epoch={epoch_id}")

    return (
        agg.writeStream.outputMode("update")
        .foreachBatch(write_epoch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


# ------------------------------------------------------------ stream dedup


def dedup_stream(stream: DataFrame, key_cols: list[str] | None = None,
                 watermark: str = "10 minutes",
                 within_watermark: bool = True) -> DataFrame:
    """Streaming exact dedup on ``key_cols`` (default: the event id) — the
    ingest-time twin of the batch exact_dedup operator, for continuous
    document/event feeds where duplicates arrive close together (retries,
    at-least-once sources).

    ``within_watermark=True`` uses dropDuplicatesWithinWatermark: state for a
    key is dropped once the watermark passes it, which BOUNDS state at
    O(keys per watermark window) — the only formulation that survives an
    unbounded 100 TB/day feed. ``False`` falls back to dropDuplicates
    (exact global dedup, state grows with distinct keys forever — use only
    for bounded replays)."""
    keys = key_cols or ["event_id"]
    marked = stream.withWatermark("ts", watermark)
    if within_watermark:
        return marked.dropDuplicatesWithinWatermark(keys)
    return marked.dropDuplicates(keys)


def run_dedup_stream_once(spark: SparkSession, sf_dir: str,
                          copies: int = 3) -> DataFrame:
    """Bounded drain proving the dedup: feed every event ``copies`` times
    (at-least-once delivery simulation), dedup on event_id, count survivors
    per event_type."""
    stream = read_events_stream(spark, sf_dir)
    replicated = stream
    for _ in range(copies - 1):
        replicated = replicated.union(stream)
    deduped = dedup_stream(replicated, ["event_id"])
    agg = deduped.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt"))
    return _drain_to_memory(agg, "complete")


# -------------------------------------------------- stream-static enrichment


def user_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Static per-user dimension derived from historical volume: segment =
    heavy (>=100 events), medium (>=50) or light. Stand-in for the profile
    table a production enrichment join reads from a warehouse."""
    hist = src.read_events(spark, sf_dir).groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_hist")
    )
    return hist.select(
        "user_id",
        F.when(F.col("n_hist") >= 100, F.lit("heavy"))
        .when(F.col("n_hist") >= 50, F.lit("medium"))
        .otherwise(F.lit("light"))
        .alias("segment"),
    )


def run_enriched_stream_once(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join + windowed aggregation: the events stream enriched
    with the (small, broadcast) user-segment dimension, then 15-minute
    tumbling counts and value sums per segment.

    The static side of a stream-static join is re-resolvable per micro-batch
    and broadcast when small — the standard continuous-enrichment shape
    (dimension updates picked up without restarting the query). Results equal
    the batch oracle because processAllAvailable drains the bounded source.
    """
    stream = read_events_stream(spark, sf_dir)
    dim = F.broadcast(user_segments(spark, sf_dir))
    agg = (
        stream.join(dim, "user_id")
        .groupBy(F.window("ts", "15 minutes").alias("w"), "segment")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "segment", "cnt", "total_value")
    )
    return _drain_to_memory(agg, "complete")


def run_attribution_join_once(
    spark: SparkSession, sf_dir: str, window_hours: int = 12,
    watermark: str = "24 hours",
) -> DataFrame:
    """Stream-STREAM join: view→click attribution. Two watermarked streams
    (views, clicks) joined on user with the event-time range condition
    ``view_ts <= click_ts <= view_ts + window`` — the canonical interval
    join Structured Streaming runs with bounded state: each side buffers
    only rows younger than its watermark, and the range condition lets the
    engine evict view state once ``click watermark > view_ts + window``
    (and click state symmetrically). Inner join in append mode; draining
    the bounded source makes the result equal to the batch interval join,
    which is the DuckDB referee (ev_stream_attribution).

    At 100 TB-scale ingest the state size is rate × window per side — the
    window/watermark pair is the knob that keeps it bounded, exactly like
    ``dropDuplicatesWithinWatermark``'s retention.
    """
    stream = read_events_stream(spark, sf_dir)
    views = (
        stream.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", watermark)
    )
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    joined = views.join(
        clicks,
        F.expr(
            f"v_user = c_user AND click_ts >= view_ts "
            f"AND click_ts <= view_ts + interval {window_hours} hours"
        ),
        "inner",
    ).select(
        F.col("v_user").alias("user_id"),
        "view_id",
        "click_id",
        (F.unix_timestamp("click_ts") - F.unix_timestamp("view_ts")).alias(
            "delay_sec"
        ),
    )
    return _drain_to_memory(joined, "append")


def cleanse_text_expr() -> "F.Column":
    """Synthetic per-event document text carrying mojibake + line noise —
    the derived-fixture expression shared verbatim (via the oracle twin)
    with the batch referee. Line 1: mojibake, always retained after
    repair; line 2: too short, dropped; line 3: javascript boilerplate on
    every third event, ordinary otherwise."""
    d = F.col("event_id")
    l1 = F.concat(
        F.lit("Caf\u00c3\u00a9 event number "), (d % 13).cast("string"),
        F.lit(" reports \u00e2\u20ac\u0153ok\u00e2\u20ac\u00a6 status fine."),
    )
    l2 = F.lit("tiny.")
    l3 = F.when(
        d % 3 == 0, F.lit("Please enable javascript to continue now.")
    ).otherwise(F.lit("An ordinary second line with words enough."))
    return F.concat_ws("\n", l1, l2, l3)


def run_cleanse_stream_once(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingestion cleanse: the narrow curation operators
    (mojibake repair -> C4 line retention) composed DIRECTLY onto a
    Structured Streaming source — per-row maps need no state, so the same
    Column expressions that clean a batch corpus clean an unbounded feed —
    then a complete-mode per-type aggregate of the cleaned volume.
    Bounded drain, so the batch oracle applies."""
    from llm_pretraining_data_pipeline_spark.functions.structural import (
        fix_mojibake,
    )
    from llm_pretraining_data_pipeline_spark.operators.corpus import (
        c4_clean_lines,
    )

    stream = read_events_stream(spark, sf_dir)
    docs = stream.select(
        "event_type", cleanse_text_expr().alias("raw")
    ).withColumn("text", fix_mojibake("raw"))
    cleaned = c4_clean_lines(docs, text_col="text")
    agg = cleaned.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_lines_kept").alias("lines_kept"),
        F.sum(F.length("text_c4")).alias("clean_chars"),
    )
    return _drain_to_memory(agg, "complete")


def run_quality_stream_once(
    spark: SparkSession, sf_dir: str, weights: list[float], bias: float
) -> DataFrame:
    """Model-based quality scoring ON the stream: mojibake repair then the
    frozen hashed-token logistic scorer (the p36 expression — literal
    broadcast weights, position-ordered fold) applied per event, then a
    complete-mode per-type aggregate. Per-row scores are 6dp-rounded
    doubles, so the aggregate integer-izes them (micro-units) — the sum is
    then EXACT and order-independent, which is what lets the batch DuckDB
    referee replay a streaming aggregation bit-for-bit. Bounded drain."""
    from llm_pretraining_data_pipeline_spark.functions import scoring
    from llm_pretraining_data_pipeline_spark.functions.structural import (
        fix_mojibake,
    )

    stream = read_events_stream(spark, sf_dir)
    docs = stream.select(
        "event_type", cleanse_text_expr().alias("raw")
    ).withColumn("text", fix_mojibake("raw"))
    scored = scoring.hashed_quality_score(docs, "text", weights, bias)
    agg = scored.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.round(F.col("hashed_quality") * F.lit(1_000_000.0), 0).cast("long")
        ).alias("score_sum_micro"),
    )
    return _drain_to_memory(agg, "complete")


def run_trending_stream_once(
    spark: SparkSession,
    sf_dir: str,
    width: str = "10 minutes",
    slide: str = "5 minutes",
    k: int = 3,
) -> DataFrame:
    """Sliding-window trending top-k: per overlapping window, the ``k``
    most frequent event types — the live "what is spiking right now"
    dashboard query (each event lands in width/slide windows, so bursts
    surface within one slide instead of one full width).

    The STREAM computes the heavy part — the sliding-window counts, the
    state Spark must maintain incrementally; ranking the handful of
    (window, type) rows per window is a presentation step on the drained
    result (streaming aggregations cannot nest a rank, and re-ranking
    per micro-batch in complete mode recomputes the same small frame).
    On the bounded drain the output equals the batch two-windows-per-
    event expansion, which is the DuckDB referee (ev_stream_trending).
    """
    stream = read_events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", width, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "event_type", "cnt")
    )
    drained = _drain_to_memory(agg, "complete")
    from pyspark.sql import Window

    rw = Window.partitionBy("window_start").orderBy(
        F.desc("cnt"), F.col("event_type")
    )
    return (
        drained.withColumn("rank", F.row_number().over(rw).cast("int"))
        .filter(F.col("rank") <= k)
    )


def run_bloom_stream_once(
    spark: SparkSession,
    sf_dir: str,
    m_bits: int = 1024,
    k: int = 3,
) -> DataFrame:
    """Dolma-style Bloom incremental dedup ON THE STREAM: the historical
    filter (built batch-side from the already-ingested slice) is static
    broadcast state, and the probe is k broadcast joins ANDed map-side —
    a STATELESS per-row stage, so the stream holds no aggregation state
    at all (append mode, no watermark needed). This is the nightly-crawl
    shape running continuously: every incoming event/doc answers
    "maybe seen before?" without shuffling the stream or re-reading
    history; hits route to an exact verify downstream, misses are the
    guaranteed-new fast path.

    Fixture-small ``m_bits`` makes false positives real so the referee
    pins the deterministic FP SET (ev_stream_bloom), exactly like d19's
    batch form. Filter updates swap in per micro-batch re-resolution of
    the static side — the same property the enrich stream relies on.
    """
    from llm_pretraining_data_pipeline_spark.operators import bloom
    from llm_pretraining_data_pipeline_spark.sources.io import read_events

    key = F.concat(F.lit("u:"), F.col("user_id").cast("string"))
    hist = (
        read_events(spark, sf_dir)
        .where(F.col("user_id") % 3 == 0)
        .select(key.alias("key"))
        .distinct()
    )
    lanes = bloom.bloom_build(hist, m_bits=m_bits, k=k)
    stream = read_events_stream(spark, sf_dir).withColumn("key", key)
    probed = bloom.bloom_probe(
        stream, lanes, m_bits=m_bits, k=k, out_col="maybe_seen"
    )
    seen = F.col("user_id") % 3 == 0
    out = probed.select(
        "event_id",
        "user_id",
        "maybe_seen",
        seen.alias("seen"),
        (F.col("maybe_seen") & ~seen).alias("false_positive"),
    )
    return _drain_to_memory(out, "append")


def run_cms_stream_once(
    spark: SparkSession,
    sf_dir: str,
    depth: int = 3,
    width: int = 256,
    heavy_threshold: int = 50,
) -> DataFrame:
    """Count-min heavy-hitter monitor ON THE STREAM: the sketch (built
    batch-side over the historical slice) is static broadcast state; every
    streamed event reads its key's estimated historical count via d
    broadcast joins + a map-side least() — stateless per-row, append mode,
    zero aggregation state, the Bloom probe's counting twin
    (``run_bloom_stream_once``). This is the live "is this key already
    hot?" gate: route events of already-heavy users/domains to throttled
    or sampled handling without shuffling the stream or keeping the exact
    historical key set anywhere.

    Fixture-small width makes collision overestimates real; the referee
    replays the exact counter layout (``ev_stream_cms``), and the CMS
    one-sided guarantee (est >= true historical count) is asserted per
    row in pytest.
    """
    from llm_pretraining_data_pipeline_spark.operators import sketch
    from llm_pretraining_data_pipeline_spark.sources.io import read_events

    key = F.concat(F.lit("u:"), F.col("user_id").cast("string"))
    hist = (
        read_events(spark, sf_dir)
        .where(F.col("user_id") % 3 == 0)
        .select(key.alias("key"))
    )
    cms = sketch.cms_build(hist, "key", depth=depth, width=width)
    stream = read_events_stream(spark, sf_dir).withColumn("key", key)
    probed = sketch.cms_estimate(
        stream, cms, "key", depth=depth, width=width, out_col="est_hist_cnt"
    )
    out = probed.select(
        "event_id",
        "user_id",
        "est_hist_cnt",
        (F.col("est_hist_cnt") >= heavy_threshold).alias("is_heavy"),
    )
    return _drain_to_memory(out, "append")


def run_warc_http_stream_once(
    spark: SparkSession, blobs: DataFrame, stage_key: str
) -> DataFrame:
    """Streaming web-archive ingestion — the continuous nightly-crawl
    shape: WARC blobs arrive as FILES, and each micro-batch explodes
    records (``warc_records`` mapInPandas, 1 blob → N rows) and
    HTTP-splits the response payloads (one Arrow ``pandas_udf`` struct)
    — both STATELESS per-row stages, so the query runs in append mode
    with zero aggregation state and the stream itself never shuffles
    (the exact property ``ev_stream_bloom``/``ev_stream_cms`` pin:
    ``stateOperators == []``). Malformed blobs and non-HTTP payloads
    flow through as ``parse_ok=false`` / ``http_ok=false`` DATA rows —
    a poison record cannot kill the continuous ingest.

    ``blobs`` is a bounded batch frame ``(file_id, payload binary)``
    staged to a deterministic parquet dir (keyed by ``stage_key`` PLUS
    the Spark applicationId — two concurrent sessions on one machine
    must not overwrite each other's stage mid-stream; ADVICE r10 —
    reused across calls within a session) that the file-stream source
    consumes; the drain returns the full result as a batch frame for
    the referee.
    """
    from llm_pretraining_data_pipeline_spark.sources import http as H

    stream = _stage_blob_stream(spark, blobs, stage_key)
    resp = H.warc_http_records(stream)
    return _drain_to_memory(resp, "append")


def _stage_blob_stream(
    spark: SparkSession, blobs: DataFrame, stage_key: str
) -> DataFrame:
    """Stage a bounded blob frame to a per-session parquet dir and open
    it as a file-stream source (shared by the WARC-ingest and CDX-build
    streaming entries)."""
    import hashlib
    import os
    import tempfile

    app_id = spark.sparkContext.applicationId
    key = hashlib.sha1(f"{app_id}:{stage_key}".encode()).hexdigest()[:12]
    stage = os.path.join(tempfile.gettempdir(), f"warc_stream_{key}")
    blobs.write.mode("overwrite").parquet(stage)
    schema = spark.read.parquet(stage).schema
    return spark.readStream.schema(schema).parquet(stage)


def run_cdx_incremental_stream_once(
    spark: SparkSession, cur: DataFrame, prev: DataFrame, stage_key: str
) -> DataFrame:
    """Streaming incremental ingest: the new generation's CDX rows
    arrive as a stream (the index grows WITH the crawl —
    ``run_warc_cdx_stream_once``'s output shape) and each micro-batch
    anti-joins against the STATIC previous-generation index, so only
    never-archived content flows downstream — the skip-the-unchanged-web
    gate applied at capture time instead of in a post-pass.
    ``sources/cdx.py::cdx_incremental`` is the single implementation
    under both batch and stream (the ev_stream_warc/ev_stream_cdx
    equivalence discipline); a stream-static LEFT ANTI join is
    stateless on the stream side (the static side builds once per
    micro-batch), so the query runs append-mode with
    ``stateOperators == []``."""
    from llm_pretraining_data_pipeline_spark.sources import cdx as C

    stream = _stage_blob_stream(spark, cur, stage_key)
    return _drain_to_memory(C.cdx_incremental(stream, prev), "append")


def run_near_index_stream_once(
    spark: SparkSession,
    new_docs: DataFrame,
    index: DataFrame,
    stage_key: str,
    **kwargs,
) -> DataFrame:
    """Streaming incremental NEAR dedup (18th streaming query): new
    documents arrive as a stream and each micro-batch band-joins the
    STATIC snapshot LSH index (``minhash_index_frame`` output), emitting
    thresholded verdict pairs — near-duplicates of the historical corpus
    are flagged at capture time, before any byte is curated.
    ``operators/dedup.py::near_dup_verdicts_against_index`` is the
    single implementation under batch and stream (the
    ev_stream_incremental discipline); it is stateless BY CONSTRUCTION —
    stream-static equi-join + in-row expressions, with pair
    deduplication done by the minimum-matching-band canonical witness
    instead of a stateful ``distinct()`` — so the query runs append-mode
    with ``stateOperators == []``."""
    from llm_pretraining_data_pipeline_spark.operators import dedup

    stream = _stage_blob_stream(spark, new_docs, stage_key)
    return _drain_to_memory(
        dedup.near_dup_verdicts_against_index(stream, index, **kwargs),
        "append",
    )


def run_warc_cdx_stream_once(
    spark: SparkSession, blobs: DataFrame, stage_key: str
) -> DataFrame:
    """Streaming CDX sidecar build — the index grows WITH the crawl
    instead of in a post-pass: each micro-batch explodes WARC blobs and
    emits one CDX row per response record (SURT key, timestamp, status,
    mime, entity-body digest, byte range). Every stage — the
    ``warc_records`` explode, the HTTP split, the pure-Catalyst
    SURT/digest expressions — is STATELESS per-row, so the query runs
    append-mode with ``stateOperators == []`` and the stream never
    shuffles; non-HTTP payloads flow through as ``cdx_ok=false`` index
    rows exactly like the batch build (``sources/cdx.py::cdx_records``
    is the single shared implementation, so batch and stream cannot
    drift)."""
    from llm_pretraining_data_pipeline_spark.sources import cdx as C

    stream = _stage_blob_stream(spark, blobs, stage_key)
    return _drain_to_memory(C.cdx_records(stream), "append")
