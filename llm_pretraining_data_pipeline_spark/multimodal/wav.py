"""Pure-stdlib WAV (RIFF/PCM) codec for the multimodal audio path.

Upgrades the audio modality from the deterministic-fingerprint stand-in to a
REAL decoder, the same way ``png.py`` upgraded images in round 6: RIFF chunk
walk (``fmt `` + ``data``), PCM sample extraction for 8-bit unsigned and
16-bit signed little-endian, mono or interleaved multi-channel. That covers
the engine's fixtures and the dominant uncompressed-audio interchange format;
compressed formats (format codes other than 1/0xFFFE-wrapping-1), 24/32-bit
and IEEE-float samples raise ``ValueError`` naming the exact unsupported
field — a real deployment swaps in soundfile/ffmpeg for the long tail, same
operator shape (see ``media.wav_feature_stats``).

The matching ``encode_wav`` exists so tests and fixtures can build valid
WAVs from closed-form sample functions — the decoder is then verified
END-TO-END: encode(samples) → decode → stats must equal the closed form,
which a DuckDB oracle recomputes independently from the same formula
(the ``mm_wav_features`` referee). All refereed statistics reduce to
integer accumulators (sum of squares, abs-peak, clip/flip counts) so the
parity surface has no float-summation-order hazard.

Decompression-bomb / allocation guards mirror ``png.py``: declared frame
counts are capped BEFORE any sample buffer is allocated, truncated data
chunks raise (never silently zero-pad), and chunk sizes are validated
against the physical payload length.

Everything here is driver/executor-side pure Python over ``bytes`` —
stdlib ``struct``/``array`` only — invoked from Arrow-batched
``mapInPandas`` (one Python init per partition, no per-row overhead).

Reference parity note: the reference pipeline is text-only
(README.md:1-40 — JSONL text documents end-to-end); the audio path is part
of the mandated multimodal extension surface, not a reference port.
"""

from __future__ import annotations

import struct
from array import array

RIFF_MAGIC = b"RIFF"
WAVE_MAGIC = b"WAVE"

# Allocation guard: reject payloads whose DECLARED sample count exceeds this
# before any buffer is allocated. 64M samples ≈ 128 MB of int16 — above any
# real web clip at the sample rates this path sees, far below executor OOM.
DEFAULT_MAX_SAMPLES = 64_000_000

_WAVE_FORMAT_PCM = 1
_WAVE_FORMAT_EXTENSIBLE = 0xFFFE

# KSDATAFORMAT_SUBTYPE_PCM (mmreg.h): the only WAVE_FORMAT_EXTENSIBLE
# SubFormat this PCM decoder accepts. An extensible header wrapping A-law,
# mu-law or float carries bits=8/16 too — without the GUID check those
# payloads would silently decode as PCM and yield wrong statistics.
_KSDATAFORMAT_SUBTYPE_PCM = bytes(
    [0x01, 0x00, 0x00, 0x00, 0x00, 0x00, 0x10, 0x00,
     0x80, 0x00, 0x00, 0xAA, 0x00, 0x38, 0x9B, 0x71]
)


def encode_wav(
    samples,
    sample_rate: int = 16_000,
    channels: int = 1,
    bits: int = 16,
) -> bytes:
    """Build a canonical RIFF/WAVE payload from integer samples.

    ``samples`` is frame-major interleaved (len must be a multiple of
    ``channels``): 16-bit values in [-32768, 32767], 8-bit in [0, 255].
    """
    if bits not in (8, 16):
        raise ValueError(f"encode_wav: unsupported bits={bits}")
    if channels < 1:
        raise ValueError(f"encode_wav: channels={channels}")
    if len(samples) % channels:
        raise ValueError("encode_wav: len(samples) not a multiple of channels")
    if bits == 16:
        data = array("h", samples)
        import sys

        if sys.byteorder == "big":  # pragma: no cover - x86/arm LE everywhere
            data.byteswap()
        body = data.tobytes()
    else:
        body = bytes(samples)
    block_align = channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH",
        _WAVE_FORMAT_PCM,
        channels,
        sample_rate,
        sample_rate * block_align,
        block_align,
        bits,
    )
    chunks = b"".join(
        [
            b"fmt ",
            struct.pack("<I", len(fmt)),
            fmt,
            b"data",
            struct.pack("<I", len(body)),
            body,
            b"" if len(body) % 2 == 0 else b"\x00",  # RIFF word padding
        ]
    )
    return RIFF_MAGIC + struct.pack("<I", 4 + len(chunks)) + WAVE_MAGIC + chunks


def decode_wav(
    data: bytes, max_samples: int = DEFAULT_MAX_SAMPLES
) -> tuple[int, int, int, list[int]]:
    """Decode a RIFF/WAVE payload → (sample_rate, channels, bits, samples).

    ``samples`` are frame-major interleaved ints: 16-bit as signed values,
    8-bit recentred to signed (x - 128) so downstream stats are uniform.
    Raises ``ValueError`` on anything malformed, truncated, compressed, or
    over the ``max_samples`` allocation guard.
    """
    if len(data) < 12 or data[:4] != RIFF_MAGIC or data[8:12] != WAVE_MAGIC:
        raise ValueError("decode_wav: not a RIFF/WAVE payload")
    pos = 12
    fmt_fields = None
    fmt_chunk = b""
    body = None
    while pos + 8 <= len(data):
        ctype = data[pos : pos + 4]
        (csize,) = struct.unpack_from("<I", data, pos + 4)
        start = pos + 8
        if start + csize > len(data):
            raise ValueError(
                f"decode_wav: chunk {ctype!r} declares {csize} bytes, "
                f"payload has {len(data) - start}"
            )
        if ctype == b"fmt ":
            if csize < 16:
                raise ValueError(f"decode_wav: fmt chunk too short ({csize})")
            fmt_fields = struct.unpack_from("<HHIIHH", data, start)
            fmt_chunk = data[start : start + csize]
        elif ctype == b"data":
            body = data[start : start + csize]
        pos = start + csize + (csize & 1)  # chunks are word-aligned
    if fmt_fields is None:
        raise ValueError("decode_wav: missing fmt chunk")
    if body is None:
        raise ValueError("decode_wav: missing data chunk")
    audio_format, channels, sample_rate, _byte_rate, block_align, bits = fmt_fields
    if audio_format not in (_WAVE_FORMAT_PCM, _WAVE_FORMAT_EXTENSIBLE):
        raise ValueError(f"decode_wav: unsupported audio_format={audio_format}")
    if audio_format == _WAVE_FORMAT_EXTENSIBLE:
        # WAVE_FORMAT_EXTENSIBLE does NOT imply PCM — the actual codec is
        # the SubFormat GUID in the extension. Require the full extension
        # (cbSize >= 22) and the PCM GUID, else an extensible A-law/mu-law/
        # float payload with bits=8/16 would decode as PCM garbage.
        if len(fmt_chunk) < 18:
            raise ValueError(
                "decode_wav: extensible fmt chunk missing cbSize"
            )
        (cb_size,) = struct.unpack_from("<H", fmt_chunk, 16)
        if cb_size < 22 or len(fmt_chunk) < 18 + 22:
            raise ValueError(
                f"decode_wav: extensible fmt extension too short "
                f"(cbSize={cb_size}, chunk={len(fmt_chunk)} bytes)"
            )
        sub_format = fmt_chunk[24:40]
        if sub_format != _KSDATAFORMAT_SUBTYPE_PCM:
            raise ValueError(
                f"decode_wav: extensible SubFormat is not PCM "
                f"(guid={sub_format.hex()})"
            )
    if bits not in (8, 16):
        raise ValueError(f"decode_wav: unsupported bits_per_sample={bits}")
    if channels < 1:
        raise ValueError(f"decode_wav: channels={channels}")
    if block_align != channels * bits // 8:
        raise ValueError(
            f"decode_wav: block_align={block_align} inconsistent with "
            f"channels={channels} bits={bits}"
        )
    unit = bits // 8
    if len(body) % unit:
        raise ValueError("decode_wav: data chunk truncated mid-sample")
    n_samples = len(body) // unit
    if n_samples > max_samples:
        raise ValueError(
            f"decode_wav: {n_samples} samples exceeds max_samples={max_samples}"
        )
    if n_samples % channels:
        raise ValueError("decode_wav: data chunk truncated mid-frame")
    if bits == 16:
        arr = array("h")
        arr.frombytes(body)
        import sys

        if sys.byteorder == "big":  # pragma: no cover - x86/arm LE everywhere
            arr.byteswap()
        samples = arr.tolist()
    else:
        samples = [b - 128 for b in body]
    return sample_rate, channels, bits, samples


def wav_stats(
    data: bytes,
    max_samples: int = DEFAULT_MAX_SAMPLES,
    backend: str = "stdlib",
) -> dict:
    """Decode + integer-accumulator audio statistics (the refereed surface).

    Returns sample_rate / channels / bit_depth / n_frames / duration_ms plus:
      * ``sq_sum``  — Σ x² over ALL samples (exact bigint; RMS = the closed
        form sqrt(sq_sum / (n · full_scale²)) is derived downstream so the
        parity surface stays integer);
      * ``peak_abs`` — max |x| over all samples;
      * ``clip_count`` — samples at the rail (±full-scale code);
      * ``flip_count`` — sign changes between consecutive CHANNEL-0 samples
        (sign = x ≥ 0), the zero-crossing numerator.
    """
    decoder = decode_wav if backend == "stdlib" else decode_wav_soundfile
    sample_rate, channels, bits, samples = decoder(data, max_samples)
    n_frames = len(samples) // channels
    full = 32768 if bits == 16 else 128
    sq = 0
    peak = 0
    clip = 0
    for v in samples:
        sq += v * v
        a = -v if v < 0 else v
        if a > peak:
            peak = a
        if v >= full - 1 or v <= -full:
            clip += 1
    flips = 0
    ch0 = samples[::channels]
    prev_nonneg = None
    for v in ch0:
        nonneg = v >= 0
        if prev_nonneg is not None and nonneg != prev_nonneg:
            flips += 1
        prev_nonneg = nonneg
    return {
        "sample_rate": sample_rate,
        "channels": channels,
        "bit_depth": bits,
        "n_frames": n_frames,
        "duration_ms": (n_frames * 1000.0 / sample_rate) if sample_rate else None,
        "sq_sum": sq,
        "peak_abs": peak,
        "clip_count": clip,
        "flip_count": flips,
    }


# ---------------------------------------------------------- optional backend
# The long tail (float/24-bit PCM, A-law/mu-law, FLAC/OGG containers) is
# what `soundfile` (libsndfile) exists for. The swap-in mirrors the
# langdetect/GPT-2 gating pattern: the stdlib decoder stays the refereed
# default; setting SPARK_GRAFT_AUDIO_BACKEND=soundfile (consumed by
# media.wav_feature_stats) routes decode through libsndfile under the
# SAME (sample_rate, channels, bits, samples) contract, and an env-gated
# pytest (tests/test_wav.py::TestSoundfileBackend) proves bit-parity with
# the stdlib decoder on the canonical fixtures when the library is
# installed. Without it, requesting the backend raises with a runbook.


def decode_wav_soundfile(
    data: bytes, max_samples: int = DEFAULT_MAX_SAMPLES
) -> tuple[int, int, int, list[int]]:
    """Decode audio bytes via the optional ``soundfile`` backend under the
    ``decode_wav`` contract: frame-major interleaved ints, 16-bit signed
    values as-is, 8-bit recentred to signed. Formats the stdlib decoder
    rejects (float/24-bit/compressed/FLAC/OGG) decode HERE at 16-bit
    precision — that widened coverage is the point of the swap-in.
    """
    try:
        import soundfile as sf
    except ImportError as exc:  # pragma: no cover - env-gated
        raise RuntimeError(
            "audio backend 'soundfile' requested but the library is not "
            "installed. Runbook: pip install soundfile (bundles "
            "libsndfile on manylinux/macOS wheels), then re-run; the "
            "stdlib RIFF/PCM decoder remains the default backend."
        ) from exc
    import io

    with sf.SoundFile(io.BytesIO(data)) as f:
        sample_rate = int(f.samplerate)
        channels = int(f.channels)
        subtype = f.subtype or ""
        if f.frames > 0 and f.frames * channels > max_samples:
            raise ValueError(
                f"decode_wav_soundfile: {f.frames * channels} samples "
                f"exceeds max_samples={max_samples}"
            )
        # int16 read: PCM_16 round-trips bit-exact; PCM_U8 is scaled by
        # 256, undone below so the recentred 8-bit contract holds; other
        # subtypes quantise to 16-bit (documented precision of the tail)
        frames = f.read(dtype="int16", always_2d=True)
    if subtype == "PCM_U8":
        bits = 8
        samples = [int(v) // 256 for row in frames for v in row]
    else:
        bits = 16
        samples = [int(v) for row in frames for v in row]
    if len(samples) > max_samples:
        raise ValueError(
            f"decode_wav_soundfile: {len(samples)} samples exceeds "
            f"max_samples={max_samples}"
        )
    return sample_rate, channels, bits, samples
