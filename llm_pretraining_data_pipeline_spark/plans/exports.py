"""Stage 8 export surface (Export_to_jsonl.py, Tokenisation_JSONL_export.py,
sharding.py export paths).

All exports are projected JSONL writes with exact field order via
``to_json(struct(...))`` — one distributed pass, no driver loops (the
reference iterates rows in Python: Export_to_jsonl.py:111, sharding.py:95).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from llm_pretraining_data_pipeline_spark.functions.text_norm import pick_text
from llm_pretraining_data_pipeline_spark.operators.sharding import shard_manifest


def text_export_frame(df: DataFrame, drop_empty_text: bool = True) -> DataFrame:
    """Stage 8 text JSONL projection: doc_id/text/source with the pick_text
    fallback chain (Export_to_jsonl.py:25-30,85-95) and the F7 empty filter."""
    cols = [c for c in ("text_pii_masked", "text_deep_clean", "text_norm", "text")
            if c in df.columns]
    out = df.select(
        F.col("doc_id"),
        pick_text(*cols).alias("text"),
        F.coalesce(F.col("source"), F.lit("")).alias("source"),
    )
    if drop_empty_text:
        out = out.filter(F.length(F.trim(F.col("text"))) > 0)
    return out


def write_text_jsonl(df: DataFrame, path: str, drop_empty_text: bool = True) -> None:
    frame = text_export_frame(df, drop_empty_text)
    frame.select(
        F.to_json(F.struct("doc_id", "text", "source")).alias("value")
    ).write.mode("overwrite").text(path)


def tokenised_export_frame(df: DataFrame, include_attention_mask: bool = True) -> DataFrame:
    """Training JSONL projection (Tokenisation_JSONL_export.py:159-204)."""
    cols = [
        F.col("doc_id"),
        F.col("input_ids"),
        F.col("n_tokens"),
        F.coalesce(F.col("source"), F.lit("")).alias("source"),
    ]
    if include_attention_mask:
        cols.insert(2, F.col("attention_mask"))
    return df.select(*cols)


def write_tokenised_jsonl(df: DataFrame, path: str,
                          include_attention_mask: bool = True) -> None:
    frame = tokenised_export_frame(df, include_attention_mask)
    frame.select(F.to_json(F.struct(*frame.columns)).alias("value")).write.mode(
        "overwrite"
    ).text(path)


def write_sharded_jsonl(df: DataFrame, path: str) -> dict:
    """Sharded training export + manifest (sharding.py:104-177): one
    partitioned distributed write (shard_id directories), manifest aggregates
    collected driver-side (tiny)."""
    frame = df.select(
        "shard_id",
        F.to_json(
            F.struct("doc_id", "input_ids", "attention_mask", "n_tokens")
        ).alias("value"),
    )
    frame.write.mode("overwrite").partitionBy("shard_id").text(path)
    man_rows = shard_manifest(df).collect()
    manifest = {
        "num_shards": len(man_rows),
        "total_docs": int(sum(r.num_docs for r in man_rows)),
        "total_tokens": int(sum(r.total_tokens or 0 for r in man_rows)),
        "shards": [
            {
                "shard_id": int(r.shard_id),
                "num_docs": int(r.num_docs),
                "total_tokens": int(r.total_tokens or 0),
            }
            for r in man_rows
        ],
    }
    return manifest


def write_manifest(manifest: dict, path: str) -> None:
    with open(path, "w") as f:
        json.dump(manifest, f, indent=2)


def write_sharded_corpus_jsonl(
    df: DataFrame,
    path: str,
    num_shards: int,
    fields: tuple[str, ...] = ("doc_id", "text", "source"),
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
) -> dict:
    """Two-level sharded corpus export, the 100 TB write path: HASH
    sharding (``assign_shards_hashed`` — no global order, so no
    single-partition window anywhere in the plan; shard sizes are
    statistically equal), ONE partitioned distributed write
    (``partitionBy('shard_id')`` → every task writes its own shard
    directories in parallel), and a per-shard manifest aggregated from the
    same frame (tiny: num_shards rows to the driver).

    Contrast with ``write_sharded_jsonl`` (positional shards, reference
    parity): that one inherits ``assign_shards``' global row_number and
    serialises the order assignment; this one never does — write
    parallelism is asserted by tests/test_plan_quality.py. Returns the
    manifest dict (write it with ``write_manifest``).
    """
    from llm_pretraining_data_pipeline_spark.operators.sharding import (
        assign_shards_hashed,
        shard_manifest,
    )

    out = assign_shards_hashed(df, num_shards, id_col=id_col)
    # Persist around the two actions: without it the manifest aggregation
    # re-executes the ENTIRE upstream plan a second time after the write
    # (review finding — the bench entry was timing write + full recompute).
    # At extreme scale where caching the corpus is unwanted, export parquet
    # instead and build the manifest from a read-back of the written files.
    out = out.persist()
    try:
        frame = out.select(
            "shard_id",
            F.to_json(F.struct(*[F.col(f) for f in fields])).alias("value"),
        )
        # Cluster by shard BEFORE the write (guide §6: REBALANCE before a
        # partitioned write): each shard lands as ONE file — num_shards
        # files total — instead of up to (write tasks x shards) small
        # files (measured round 16 at 500k docs / 64 shards, interleaved
        # one-JVM A/B: unclustered local[32] wrote 2048 files in
        # 7.5-8.2 s and ran SLOWER than local[8] (0.48 scaling ratio);
        # clustered writes 64 files, see OPTIMIZATION_r16.md for the
        # A/B). The exchange moves already-serialised JSON lines once;
        # shard_id is hash-derived so the shuffle is skew-free, and at
        # scale one-file-per-shard is exactly the sized-shard contract.
        (
            frame.repartition("shard_id")
            .write.mode("overwrite")
            .partitionBy("shard_id")
            .text(path)
        )
        man_rows = shard_manifest(out, token_col=token_col).collect()
    finally:
        out.unpersist()
    # num_shards is the CONFIGURED shard-space size; hash assignment can
    # leave some shards empty on small corpora, so the per-shard list only
    # carries shards that received rows (n_shards_nonempty counts them)
    return {
        "num_shards": int(num_shards),
        "n_shards_nonempty": len(man_rows),
        "total_docs": int(sum(r.num_docs for r in man_rows)),
        "total_tokens": int(sum(r.total_tokens or 0 for r in man_rows)),
        "shards": [
            {
                "shard_id": int(r.shard_id),
                "num_docs": int(r.num_docs),
                "total_tokens": int(r.total_tokens or 0),
            }
            for r in man_rows
        ],
    }


# ------------------------------------------------------------------ WET export
# CommonCrawl publishes extracted text as WET sidecars: WARC files whose
# records are WARC-Type: conversion, payload = the plain text extracted
# from the corresponding response record (ISO 28500 §6.8). Emitting this
# shape closes the engine's ingest→curate→re-publish loop: read .warc(.gz)
# with sources/warc.py, extract main content (p41), export WET — the
# output re-parses through the same strict reader AND through conformant
# external tooling: WARC-Date (mandatory per ISO 28500 §5.4) is emitted
# from the caller-supplied capture/processing date, and record ids are
# urn:uuid-SHAPED (deterministic md5-derived, so referees stay exact).

# Deterministic default so tests/referees are stable; production passes
# the real capture or processing date (ISO-8601 Z, second precision).
DEFAULT_WARC_DATE = "1970-01-01T00:00:00Z"
_WARC_DATE_RE = r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}Z$"


def _check_warc_date(warc_date: str) -> str:
    import re as _re

    # fullmatch, not match: '$' would forgive a trailing newline, which
    # would interpolate a bare LF into every record's header line
    if not _re.fullmatch(_WARC_DATE_RE, warc_date):
        raise ValueError(
            f"warc_date must be ISO-8601 UTC 'YYYY-MM-DDThh:mm:ssZ', "
            f"got {warc_date!r}"
        )
    return warc_date


def _uuid_shaped(seed: "F.Column") -> "F.Column":
    """Deterministic urn:uuid-shaped id from an md5 of the seed string —
    8-4-4-4-12 hex groups, replayable by the DuckDB referee (md5 +
    substr on both engines)."""
    h = F.md5(seed)
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.substring(h, 13, 4),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )


def wet_record_frame(
    df: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    id_col: str = "doc_id",
    keep: tuple[str, ...] = (),
    warc_date: str = DEFAULT_WARC_DATE,
) -> DataFrame:
    """One WARC conversion record (binary) per document — pure Catalyst.

    The record is assembled entirely JVM-side (concat of encoded header
    text + the UTF-8 payload): version line, ``WARC-Type: conversion``,
    target URI, a deterministic urn:uuid-shaped record id (md5-derived
    from the doc id — valid-URI shape for conformant consumers, exactly
    replayable by the referee), the mandatory ``WARC-Date`` (ISO 28500
    §5.4 — pass the real capture/processing date; the deterministic
    default keeps tests stable), ``Content-Type: text/plain``, and a
    ``Content-Length`` computed from the encoded payload's OCTET length
    (not the character count — the strict reader validates it against
    the physical buffer). Zero Python, zero shuffle; rows with a null
    URL or text export as empty string fields rather than corrupt
    records.

    Output: ``(id_col, wet_record binary, record_bytes bigint)``.
    """
    _check_warc_date(warc_date)
    body = F.encode(F.coalesce(F.col(text_col), F.lit("")), "UTF-8")
    uri = F.coalesce(F.col(url_col).cast("string"), F.lit(""))
    rec_id = _uuid_shaped(
        F.concat(F.lit("wet:"), F.col(id_col).cast("string"))
    )
    head = F.concat(
        F.lit("WARC/1.0\r\n"),
        F.lit("WARC-Type: conversion\r\n"),
        F.lit("WARC-Target-URI: "), uri, F.lit("\r\n"),
        F.lit("WARC-Record-ID: <urn:uuid:"), rec_id, F.lit(">\r\n"),
        F.lit(f"WARC-Date: {warc_date}\r\n"),
        F.lit("Content-Type: text/plain\r\n"),
        F.lit("Content-Length: "),
        F.length(body).cast("string"),
        F.lit("\r\n\r\n"),
    )
    rec = F.concat(F.encode(head, "UTF-8"), body, F.encode(F.lit("\r\n\r\n"), "UTF-8"))
    return df.select(
        F.col(id_col),
        *[F.col(k) for k in keep],
        rec.alias("wet_record"),
        F.length(rec).cast("long").alias("record_bytes"),
    )


def _shard_file_frame(
    recs: DataFrame, record_col: str, file_col: str, id_col: str
) -> DataFrame:
    """Shared shard assembly for the WARC-family exporters: group
    per-record frames (already carrying ``shard_id``) into one ordered
    FILE blob per shard. In-shard ordering rides the aggregation as
    ``array_sort`` over (id, record) structs — no window, ONE shuffle.
    array_join over the sorted records is LINEAR in shard bytes; a
    binary aggregate(concat) fold would copy the accumulator per record
    (quadratic). The decode/encode round-trip is exact: every record of
    every caller is valid UTF-8 by construction (ASCII framing +
    UTF-8-encoded payload).
    """
    ordered = F.array_sort(
        F.collect_list(F.struct(F.col(id_col).alias("i"),
                                F.col(record_col).alias("r")))
    )
    return (
        recs.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_records"),
            F.encode(
                F.array_join(
                    F.transform(ordered, lambda x: F.decode(x["r"], "UTF-8")),
                    "",
                ),
                "UTF-8",
            ).alias(file_col),
        )
        .select(
            "shard_id",
            file_col,
            "n_records",
            F.length(file_col).cast("long").alias("file_bytes"),
        )
    )


def wet_shard_frame(
    df: DataFrame,
    num_shards: int,
    url_col: str = "url",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Assemble per-shard WET FILE blobs: hash-assign docs to shards,
    order records within a shard by ``id_col`` (deterministic file
    bytes), and concatenate — one ``(shard_id, wet_file binary, n_records,
    file_bytes)`` row per non-empty shard, ready for a binary sink.

    One shuffle (the shard groupBy, via ``_shard_file_frame``). Size
    shards so a shard's text fits an executor (the same contract as the
    JSONL sharded writer — ``num_shards`` scales with the corpus,
    records never cross shards).
    """
    from llm_pretraining_data_pipeline_spark.operators.sharding import (
        assign_shards_hashed,
    )

    recs = wet_record_frame(
        assign_shards_hashed(df, num_shards, id_col=id_col),
        url_col=url_col, text_col=text_col, id_col=id_col,
        keep=("shard_id",),
    )
    return _shard_file_frame(recs, "wet_record", "wet_file", id_col)


def wat_record_frame(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    meta_cols: tuple[str, ...] = ("http_status", "content_type"),
    keep: tuple[str, ...] = (),
    warc_date: str = DEFAULT_WARC_DATE,
) -> DataFrame:
    """One WARC *metadata* record (binary) per document — the WAT-sidecar
    shape (CC publishes crawl metadata as WARC metadata records with a
    JSON payload). Pure Catalyst like ``wet_record_frame``: the payload
    is ``to_json(struct(url, *meta_cols))`` (field order = struct order,
    nulls omitted — Spark's to_json contract), Content-Type is
    ``application/json``, and Content-Length is the payload's octet
    length. Completes the WARC family triad: warc_records (ingest) /
    wet_record_frame (extracted text) / wat_record_frame (metadata).

    Output: ``(id_col, *keep, wat_record binary, record_bytes bigint)``.
    """
    _check_warc_date(warc_date)
    payload = F.to_json(
        F.struct(
            F.col(url_col).alias("url"),
            *[F.col(c) for c in meta_cols],
        )
    )
    body = F.encode(payload, "UTF-8")
    uri = F.coalesce(F.col(url_col).cast("string"), F.lit(""))
    rec_id = _uuid_shaped(
        F.concat(F.lit("wat:"), F.col(id_col).cast("string"))
    )
    head = F.concat(
        F.lit("WARC/1.0\r\n"),
        F.lit("WARC-Type: metadata\r\n"),
        F.lit("WARC-Target-URI: "), uri, F.lit("\r\n"),
        F.lit("WARC-Record-ID: <urn:uuid:"), rec_id, F.lit(">\r\n"),
        F.lit(f"WARC-Date: {warc_date}\r\n"),
        F.lit("Content-Type: application/json\r\n"),
        F.lit("Content-Length: "),
        F.length(body).cast("string"),
        F.lit("\r\n\r\n"),
    )
    rec = F.concat(
        F.encode(head, "UTF-8"), body, F.encode(F.lit("\r\n\r\n"), "UTF-8")
    )
    return df.select(
        F.col(id_col),
        *[F.col(k) for k in keep],
        rec.alias("wat_record"),
        F.length(rec).cast("long").alias("record_bytes"),
    )


def warc_response_record_frame(
    df: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    id_col: str = "doc_id",
    keep: tuple[str, ...] = (),
    warc_date: str = DEFAULT_WARC_DATE,
    content_type: str = "text/plain; charset=utf-8",
) -> DataFrame:
    """One WARC ``response`` record (binary) per document — WARC
    re-PUBLICATION of a curated corpus (VERDICT r12 item 6): the
    round-trip format real archive pipelines ship, re-ingestable by this
    engine's own ``warc_records``/``warc_http_records``/``cdx_records``
    with no special casing, closing the publish→re-index→selective-read
    loop the same way ``wet_record_frame`` does for WET sidecars.

    The record payload is a complete HTTP/1.1 response message
    (status line + Content-Type + Content-Length + the UTF-8 text), so
    ``Content-Type: application/http; msgtype=response`` per ISO 28500
    §6.3. Headers stamped: ``WARC-Payload-Digest`` over the entity body
    and ``WARC-Block-Digest`` over the whole HTTP message, BOTH as
    ``sha256:<hex>`` — the engine's digest convention, computable
    JVM-side (``sha1:<BASE32>``, the CommonCrawl stamp, has no Catalyst
    base32; ``resolve_revisits`` consumes either identity, so
    round-trips stay closed). Record ids are deterministic uuid-shaped
    md5 derivations (seed ``warc:<id>``) — replayable by the referee.
    Pure Catalyst, zero Python, zero shuffle; null url/text export as
    empty fields rather than corrupt records.

    Output: ``(id_col, *keep, warc_record binary, record_bytes bigint)``.
    Framing is byte-deterministic: ``record_bytes`` is closed-form in
    (uri length, body octet length) — pinned by the s18 oracle and
    tests/test_warc.py::TestWarcResponseExport.
    """
    _check_warc_date(warc_date)
    body = F.encode(F.coalesce(F.col(text_col), F.lit("")), "UTF-8")
    uri = F.coalesce(F.col(url_col).cast("string"), F.lit(""))
    http = F.concat(
        F.encode(
            F.concat(
                F.lit("HTTP/1.1 200 OK\r\n"),
                F.lit(f"Content-Type: {content_type}\r\n"),
                F.lit("Content-Length: "),
                F.length(body).cast("string"),
                F.lit("\r\n\r\n"),
            ),
            "UTF-8",
        ),
        body,
    )
    rec_id = _uuid_shaped(
        F.concat(F.lit("warc:"), F.col(id_col).cast("string"))
    )
    head = F.concat(
        F.lit("WARC/1.0\r\n"),
        F.lit("WARC-Type: response\r\n"),
        F.lit("WARC-Target-URI: "), uri, F.lit("\r\n"),
        F.lit("WARC-Record-ID: <urn:uuid:"), rec_id, F.lit(">\r\n"),
        F.lit(f"WARC-Date: {warc_date}\r\n"),
        F.lit("WARC-Payload-Digest: sha256:"),
        F.sha2(body, 256), F.lit("\r\n"),
        F.lit("WARC-Block-Digest: sha256:"),
        F.sha2(http, 256), F.lit("\r\n"),
        F.lit("Content-Type: application/http; msgtype=response\r\n"),
        F.lit("Content-Length: "),
        F.length(http).cast("string"),
        F.lit("\r\n\r\n"),
    )
    rec = F.concat(
        F.encode(head, "UTF-8"), http, F.encode(F.lit("\r\n\r\n"), "UTF-8")
    )
    return df.select(
        F.col(id_col),
        *[F.col(k) for k in keep],
        rec.alias("warc_record"),
        F.length(rec).cast("long").alias("record_bytes"),
    )


def warc_response_shard_frame(
    df: DataFrame,
    num_shards: int,
    url_col: str = "url",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Assemble per-shard WARC FILE blobs of ``response`` records — the
    publishable artifact (``wet_shard_frame``'s exact discipline via the
    shared ``_shard_file_frame``: hash shard assignment, in-shard order
    by ``id_col`` inside the aggregation — deterministic file bytes, ONE
    shuffle, no window). Output: ``(shard_id, warc_file binary,
    n_records, file_bytes)``.
    """
    from llm_pretraining_data_pipeline_spark.operators.sharding import (
        assign_shards_hashed,
    )

    recs = warc_response_record_frame(
        assign_shards_hashed(df, num_shards, id_col=id_col),
        url_col=url_col, text_col=text_col, id_col=id_col,
        keep=("shard_id",),
    )
    return _shard_file_frame(recs, "warc_record", "warc_file", id_col)
