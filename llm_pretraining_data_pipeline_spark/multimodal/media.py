"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Extension surface mandated by the north star (BASELINE.json). The Spark-side
plumbing is real — schema, partition-friendly batch iteration, Arrow transfer
shapes, metadata pushdown — and the IMAGE codec is real too: a pure-stdlib
PNG decoder (``png.py``: zlib inflate + full scanline-filter
reconstruction) drives ``png_feature_stats`` and the PNG branch of
``_decode_payload``. Audio/video decode stays a deterministic byte-level
fingerprint (ffmpeg/torchaudio are not in this container; swap the one
function when they are).

Design for 100 TB:
  * payloads stay in ``binary`` columns co-located with metadata, so filters
    on ``kind``/``meta.width`` prune parquet row groups BEFORE any byte of
    payload is read (column pruning keeps the heavy column out of scans that
    don't need it);
  * all per-payload work runs in ``mapInPandas`` over Arrow batches — one
    Python worker init per partition, zero per-row overhead;
  * derived features land in narrow sibling tables keyed by ``media_id`` so
    downstream joins never drag payload bytes through a shuffle.
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from llm_pretraining_data_pipeline_spark.multimodal import png
from llm_pretraining_data_pipeline_spark.schemas import MEDIA_SCHEMA

FEATURE_DIM = 16

PNG_STATS_SCHEMA = (
    "media_id bigint, width int, height int, bit_depth int, channels int, "
    "n_pixels bigint, px_sum bigint, px_min int, px_max int, "
    "decode_ok boolean, decode_err string"
)


def png_feature_stats(media: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Image payloads → decoded PNG statistics via Arrow-batched
    mapInPandas: the REAL decode step (``png.decode_png`` — zlib inflate +
    scanline filter reconstruction), emitting integer stats a DuckDB
    referee can recompute from a closed-form fixture (``mm_png_features``).

    Rows whose payload fails to decode survive with ``decode_ok=false``
    and the exact error string — a curation pipeline counts those, never
    dies on them. Projects (id, payload) only before the Python exchange.
    """
    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                try:
                    st = png.png_stats(raw)
                    rows.append(
                        (mid, st["width"], st["height"], st["bit_depth"],
                         st["channels"], st["n_pixels"], st["px_sum"],
                         st["px_min"], st["px_max"], True, None)
                    )
                except ValueError as exc:
                    rows.append(
                        (mid, None, None, None, None, None, None, None,
                         None, False, str(exc))
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "width", "height", "bit_depth", "channels",
                    "n_pixels", "px_sum", "px_min", "px_max", "decode_ok",
                    "decode_err",
                ],
            )

    return media.select(id_col, "payload").mapInPandas(
        batches, schema=PNG_STATS_SCHEMA
    )

FEATURE_SCHEMA = (
    "media_id bigint, kind string, byte_len bigint, content_sha256 string, "
    f"feature array<float>, decode_ok boolean"
)


def synthetic_media(spark: SparkSession, n: int = 64, seed: int = 7) -> DataFrame:
    """Deterministic fake media table for tests/benches (payload = seeded
    pseudo-random bytes with a kind-specific magic header)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes([137, 80, 78, 71][i % 3 :][:2]) + rng.bytes(256 + (i % 5) * 64)
        rows.append(
            (
                i,
                i % 17,
                kind,
                bytearray(payload),
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                (640, 480, None, None)
                if kind == "image"
                else (None, None, 5_000 + i, 16_000 if kind == "audio" else None),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_payload(kind: str, payload: bytes) -> list[float]:
    """Feature vector per payload. Images that are valid PNGs go through
    the REAL pure-stdlib decoder (``png.py``: zlib inflate + all five
    scanline filters) and yield dimension/intensity features; other
    payloads (audio/video — their codecs are not in this container, and
    non-PNG image bytes) fall back to the deterministic byte-level
    fingerprint so the operator stays total. Raises on unknown kinds
    exactly like a real codec would.
    """
    if kind not in ("image", "audio", "video"):
        raise NotImplementedError(f"no decoder for kind={kind!r}")
    if kind == "image" and payload[: len(png.PNG_SIGNATURE)] == png.PNG_SIGNATURE:
        try:
            st = png.png_stats(payload)
            denom = max(1, st["n_pixels"] * st["channels"] * 255)
            vec = [
                st["width"] / 65535.0,
                st["height"] / 65535.0,
                st["channels"] / 4.0,
                st["px_sum"] / denom,        # mean intensity in [0, 1]
                st["px_min"] / 255.0,
                st["px_max"] / 255.0,
            ]
            return vec + [0.0] * (FEATURE_DIM - len(vec))
        except ValueError:
            pass  # corrupt or unsupported PNG variant: byte-level fallback
    digest = hashlib.sha256(payload).digest()
    crc = zlib.crc32(payload)
    return [
        ((digest[i] << 8 | digest[i + 1]) ^ (crc & 0xFFFF)) / 65535.0
        for i in range(0, FEATURE_DIM * 2, 2)
    ]


def extract_features(media: DataFrame) -> DataFrame:
    """media → per-item feature rows via Arrow-batched mapInPandas.

    Selects ONLY the columns it needs before the Python exchange so parquet
    scans of a full media table never ship unused metadata through Arrow.
    """
    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            feats, shas, lens, oks = [], [], [], []
            for kind, payload in zip(pdf["kind"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                lens.append(len(raw))
                shas.append(hashlib.sha256(raw).hexdigest())
                try:
                    feats.append(_decode_payload(kind, raw))
                    oks.append(True)
                except NotImplementedError:
                    feats.append([0.0] * FEATURE_DIM)
                    oks.append(False)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "byte_len": lens,
                    "content_sha256": shas,
                    "feature": feats,
                    "decode_ok": oks,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        batches, schema=FEATURE_SCHEMA
    )


def media_dedup_exact(media: DataFrame) -> DataFrame:
    """Exact byte-level dedup over payloads: sha256 + keep-first window —
    the binary-column twin of the text exact-dedup operator."""
    from pyspark.sql import Window

    hashed = media.withColumn("payload_sha", F.sha2(F.col("payload"), 256))
    w = Window.partitionBy("payload_sha").orderBy("media_id")
    return hashed.withColumn("is_dup", F.row_number().over(w) > 1).select(
        "media_id", "payload_sha", "is_dup"
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: expands each video into (media_id,
    frame_ts_ms) rows from metadata alone — no payload decode, so the
    expansion is pure Catalyst (sequence + explode) and the expensive decode
    of chosen frames happens later, only for sampled timestamps."""
    videos = media.filter(F.col("kind") == "video").select(
        "media_id", F.col("meta.duration_ms").alias("duration_ms")
    )
    return videos.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
