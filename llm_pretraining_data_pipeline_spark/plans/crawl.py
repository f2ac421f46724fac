"""The crawl→corpus capstone: WARC blobs in, training-ready corpus out.

VERDICT r10 missing-item 2: every stage existed and was individually
benched, but the number a 100 TB operator plans against is the COMPOSED
chain. This module wires it end to end:

  WARC blobs → ``warc_http_records``   (blob → response records → HTTP
                                        split: status/headers/de-chunk/
                                        gunzip/inflate, sources/http.py)
            → HTTP gates               (parse failures, non-kept status,
                                        non-text media types — rejected
                                        rows stay in the frame as
                                        first-match drop reasons)
            → ``http_body_text``       (charset-safe total decode)
            → ``run_web_curation``     (URL dedup → line corrections →
                                        C4 → [Gopher] → span dedup →
                                        exact dedup; plans/web_curation)
            → token counting           (GPT-2-style pre-tokeniser split)

The output keeps EVERY response record with a first-match ``drop_reason``
(null = kept) — the engine's standard cascade contract — so one
aggregation yields the per-stage funnel. Export the kept slice with
``plans.exports.write_sharded_corpus_jsonl`` (the bench's
``crawl_to_corpus_e2e`` does exactly that).

Scale shape: the WARC explode and HTTP split are file-granularity Arrow
stages (no shuffle); the gates and token counts are pure Catalyst
per-row expressions; the only exchanges are web_curation's URL / span /
exact dedup windows on narrow keys. Nothing here adds a shuffle beyond
the curation plan's own.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from llm_pretraining_data_pipeline_spark.functions.tokenizer import (
    GPT2_SPLIT_PATTERN_RE2,
    token_pieces,
)
from llm_pretraining_data_pipeline_spark.plans.web_curation import (
    WebCurationConfig,
    run_web_curation,
)
from llm_pretraining_data_pipeline_spark.sources.http import (
    http_body_text,
    http_body_text_charset,
    warc_http_records,
)


@dataclass(frozen=True)
class CrawlCorpusConfig:
    gzipped: bool = False                 # .warc.gz member blobs
    keep_statuses: tuple = (200,)         # archive convention: 200 only
    # media-type gate: only textual payloads become documents; binary
    # payloads route to the multimodal decoders, not the text pipeline
    text_mime_prefix: str = "text/"
    # WHATWG-faithful charset handling (http_body_text_charset): honor
    # BOM > declared Content-Type charset > <meta charset> sniff, with
    # windows-1252 as the legacy fallback. Default False keeps the
    # content-sniffing decode (valid-UTF-8-else-latin-1) the existing
    # benched funnel and its referees pin; flip for corpora where
    # declared-cp1252 bodies are material.
    charset_aware: bool = False
    # with charset_aware: also honor the WHATWG multi-byte legacy labels
    # (shift_jis/euc-kr/gbk/gb18030/big5, + euc-jp/iso-2022-jp) through
    # http_body_text_charset's gated Arrow stage — the stage's input
    # bytes are NULLED for every row outside the multi-byte gate, so the
    # dominant path stays JVM-side. Off by default: the common funnel
    # plan stays zero-extra-Python. No effect without charset_aware.
    charset_multibyte: bool = False
    # resolve WARC 'revisit' records (crawl-time dedup: a re-fetch whose
    # payload digest matched an earlier capture ships a near-empty
    # record) against the originals IN THIS FRAME by payload digest
    # before the HTTP split, so unchanged-since-last-crawl pages keep
    # their content; unresolved revisits surface with drop_reason
    # 'revisit_unresolved'. Off by default: plain response-only archives
    # pay no digest groupBy/join.
    resolve_revisits: bool = False
    curation: WebCurationConfig = field(default_factory=WebCurationConfig)
    tokenizer_pattern: str = GPT2_SPLIT_PATTERN_RE2


def run_crawl_to_corpus(
    files: DataFrame,
    cfg: CrawlCorpusConfig = CrawlCorpusConfig(),
    robots_rules: DataFrame | None = None,
) -> DataFrame:
    """``(file_id, payload)`` WARC blobs → one row per response record
    with ``url``, ``text_curated``, ``n_tokens`` and a first-match
    ``drop_reason`` spanning the HTTP gates AND the curation cascade.

    HTTP-rejected rows (unparseable message / non-kept status / non-text
    mime) enter the curation plan with their ``url`` and ``text``
    BLANKED: a rejected record must never claim a URL-dedup or
    exact-dedup canonical slot away from a kept capture of the same
    page (null URLs never group in ``url_dedup``; empty texts are
    excluded from exact dedup), and blanking also keeps the dedup
    windows from shuffling text for rows whose verdict is already
    decided. Their final ``drop_reason`` is the HTTP reason, which
    takes precedence over whatever the curation cascade says about the
    blanked row.

    Curation is keyed on ``rec_id`` = ``file_id * 2^32 + rec_index`` —
    a real WARC file holds many response records, and a non-unique id
    would multiply rows at the dedup join-back. The composite is
    NUMERIC so keep-first ordering matches (file order, record order)
    exactly (a ':'-joined string would sort '10:0' before '2:0'). The
    2^32 shift is overflow-proof by construction, not by convention
    (ADVICE r11 — a 2^20 shift could collide a near-2 GB blob of
    minimal ~50-byte records with the next file_id): a blob is one JVM
    byte array, so it holds < 2^31 bytes < 2^26 minimal records, and
    ``file_id`` must stay below 2^31 for the product to fit a bigint —
    a bound enforced here with an in-plan fence rather than assumed.
    """
    if cfg.resolve_revisits:
        from llm_pretraining_data_pipeline_spark.sources.cdx import (
            resolve_revisits,
        )
        from llm_pretraining_data_pipeline_spark.sources.warc import (
            warc_records,
        )

        raw_recs = warc_records(
            files, gzipped=cfg.gzipped,
            headers=("WARC-Payload-Digest",),
        )
        rr = resolve_revisits(raw_recs, checkpoint=True)
        # resolved revisits carry the original's HTTP message and ride
        # the response path; unresolved ones keep their (empty) payload
        # and surface through the dedicated first-match reason below
        rr = rr.withColumn(
            "revisit_unresolved",
            F.col("warc_type").eqNullSafe("revisit")
            & ~F.coalesce(F.col("revisit_resolved"), F.lit(False)),
        ).withColumn(
            "warc_type",
            F.when(
                F.col("warc_type") == "revisit", F.lit("response")
            ).otherwise(F.col("warc_type")),
        )
        recs = warc_http_records(
            records=rr, extra_cols=("revisit_unresolved",)
        )
    else:
        recs = warc_http_records(files, gzipped=cfg.gzipped).withColumn(
            "revisit_unresolved", F.lit(False)
        )
    dec = (
        http_body_text_charset(
            "body", "charset", multibyte=cfg.charset_multibyte
        )
        if cfg.charset_aware
        else http_body_text("body")
    )
    mime_ok = F.coalesce(
        F.col("content_type").startswith(cfg.text_mime_prefix), F.lit(False)
    )
    http_reason = (
        F.when(F.col("revisit_unresolved"), F.lit("revisit_unresolved"))
        .when(~F.col("http_ok"), F.lit("http_unparseable"))
        .when(
            ~F.col("http_status").isin(*cfg.keep_statuses),
            F.lit("http_status_reject"),
        )
        .when(~mime_ok, F.lit("non_text_mime"))
    )
    # rec_index is a 32-bit int (< 2^32 always); file_id gets the lazy
    # in-plan fence — assert_true raises at execution, no eager job.
    fid_ok = (F.col("file_id") >= 0) & (
        F.col("file_id") < F.lit(1 << 31).cast("long")
    )
    rec_id = F.when(
        F.assert_true(
            fid_ok,
            F.lit(
                "run_crawl_to_corpus: file_id must be in [0, 2^31) "
                "for the rec_id = file_id*2^32 + rec_index packing"
            ),
        ).isNull(),
        F.col("file_id").cast("long") * F.lit(1 << 32).cast("long")
        + F.col("rec_index").cast("long"),
    )
    base = recs.select(
        "file_id",
        "rec_index",
        rec_id.alias("rec_id"),
        F.when(http_reason.isNull(), F.col("target_uri")).alias("url"),
        "http_status",
        "content_type",
        "http_ok",
        F.when(http_reason.isNull(), dec["text"]).alias("text"),
        http_reason.alias("_http_reason"),
    )
    cur = run_web_curation(
        base,
        cfg.curation,
        text_col="text",
        id_col="rec_id",
        url_col="url",
        robots_rules=robots_rules,
    )
    out = cur.withColumn(
        "drop_reason",
        F.coalesce(F.col("_http_reason"), F.col("drop_reason")),
    ).drop("_http_reason")
    return out.withColumn(
        "n_tokens",
        F.when(
            F.col("drop_reason").isNull(),
            F.size(
                token_pieces("text_curated", cfg.tokenizer_pattern)
            ).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )


def crawl_funnel_summary(out: DataFrame) -> DataFrame:
    """Per-outcome funnel counts + kept token volume — the one-frame
    capacity-planning report (docs in, docs surviving each gate, tokens
    out)."""
    outcome = F.coalesce(F.col("drop_reason"), F.lit("kept"))
    return (
        out.groupBy(outcome.alias("outcome"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .orderBy(F.desc("n_docs"), "outcome")
    )
