"""Pure-stdlib MP3 (MPEG-1 Layer III) frame-header parser — the
compressed tier of the audio codec set (wav = uncompressed PCM decode,
mp3 = frame-structure triage), scope-matched to ``mp4.py``/``gif.py``:
headers and frame walk, NOT entropy decode. What an audio curation
pipeline needs to route/filter: duration, bitrate (CBR vs VBR), sample
rate, channel mode — before any expensive decoder runs.

Strictness matches the codec family: optional ID3v2 tag skipped by its
syncsafe length, then EVERY frame header validated (sync pattern,
MPEG-1 Layer III only — the dominant real-world shape; other
version/layer combinations raise with a typed message), frame lengths
computed from the header tables and walked to exact end-of-buffer, a
frame-count cap against hostile streams, no trailing garbage.
Malformed input raises ``ValueError`` — callers surface it as
``decode_ok=false`` data rows.
"""

from __future__ import annotations

# MPEG-1 Layer III bitrate table (kbps); index 0 = "free" (refused —
# frame length is then undefined), 15 = invalid.
BITRATES = (
    None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
    320, None,
)
SAMPLE_RATES = (44100, 48000, 32000, None)
SAMPLES_PER_FRAME = 1152
MAX_FRAMES = 1 << 20
CHANNEL_MODES = ("stereo", "joint_stereo", "dual_channel", "mono")


def _id3v2_size(data: bytes) -> int:
    """Bytes to skip for a leading ID3v2 tag (0 when absent). The size
    field is syncsafe (4×7 bits); a set high bit is malformed."""
    if data[:3] != b"ID3" or len(data) < 10:
        return 0
    raw = data[6:10]
    if any(b & 0x80 for b in raw):
        raise ValueError("parse_mp3: non-syncsafe ID3v2 size")
    size = (raw[0] << 21) | (raw[1] << 14) | (raw[2] << 7) | raw[3]
    if 10 + size > len(data):
        raise ValueError("parse_mp3: ID3v2 tag runs past buffer")
    return 10 + size


def parse_mp3(data: bytes, max_frames: int = MAX_FRAMES) -> dict:
    """Walk every frame. Returns ``{n_frames, bitrate_kbps (first
    frame), vbr, sample_rate, channel_mode, n_samples, duration_ms,
    id3_size}``. Raises ``ValueError`` on anything malformed."""
    n = len(data)
    pos = _id3v2_size(data)
    id3_size = pos
    n_frames = 0
    first_bitrate = None
    vbr = False
    sample_rate = None
    channel_mode = None
    while pos < n:
        if pos + 4 > n:
            raise ValueError("parse_mp3: truncated frame header")
        b0, b1, b2, b3 = data[pos : pos + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            raise ValueError(
                f"parse_mp3: lost sync at offset {pos} "
                f"(0x{b0:02X}{b1:02X})"
            )
        version = (b1 >> 3) & 0x3
        layer = (b1 >> 1) & 0x3
        if version != 0x3 or layer != 0x1:
            raise ValueError(
                "parse_mp3: only MPEG-1 Layer III is in scope "
                f"(version bits {version}, layer bits {layer})"
            )
        br_idx = (b2 >> 4) & 0xF
        sr_idx = (b2 >> 2) & 0x3
        padding = (b2 >> 1) & 0x1
        bitrate = BITRATES[br_idx]
        sr = SAMPLE_RATES[sr_idx]
        if bitrate is None:
            raise ValueError(
                f"parse_mp3: free/invalid bitrate index {br_idx}"
            )
        if sr is None:
            raise ValueError("parse_mp3: reserved sample-rate index")
        if sample_rate is None:
            sample_rate = sr
            channel_mode = CHANNEL_MODES[(b3 >> 6) & 0x3]
            first_bitrate = bitrate
        elif sr != sample_rate:
            raise ValueError("parse_mp3: sample rate changes mid-stream")
        if bitrate != first_bitrate:
            vbr = True
        frame_len = (144_000 * bitrate) // sr + padding
        if pos + frame_len > n:
            raise ValueError(
                f"parse_mp3: frame at {pos} declares {frame_len} bytes, "
                f"{n - pos} remain"
            )
        pos += frame_len
        n_frames += 1
        if n_frames > max_frames:
            raise ValueError("parse_mp3: frame cap exceeded")
    if n_frames == 0:
        raise ValueError("parse_mp3: no frames")
    n_samples = n_frames * SAMPLES_PER_FRAME
    return {
        "n_frames": n_frames,
        "bitrate_kbps": first_bitrate,
        "vbr": vbr,
        "sample_rate": sample_rate,
        "channel_mode": channel_mode,
        "n_samples": n_samples,
        "duration_ms": round(n_samples * 1000.0 / sample_rate, 3),
        "id3_size": id3_size,
    }


def encode_mp3_stub(
    n_frames: int,
    bitrate_indices: list[int] | int = 9,  # 128 kbps
    sr_idx: int = 0,
    channel_bits: int = 0,
    id3_payload: bytes | None = None,
) -> bytes:
    """Spec-shaped MPEG-1 Layer III frame chain for fixtures: valid
    headers, deterministic filler payloads (this parser validates
    structure, not entropy data). ``bitrate_indices`` may vary per
    frame (the VBR arm)."""
    if isinstance(bitrate_indices, int):
        bitrate_indices = [bitrate_indices] * n_frames
    if len(bitrate_indices) < n_frames:
        raise ValueError(
            "encode_mp3_stub: bitrate_indices shorter than n_frames "
            "(a silent short file would mislead a fixture's referee)"
        )
    out = bytearray()
    if id3_payload is not None:
        size = len(id3_payload)
        raw = bytes(
            [(size >> 21) & 0x7F, (size >> 14) & 0x7F,
             (size >> 7) & 0x7F, size & 0x7F]
        )
        out += b"ID3\x04\x00\x00" + raw + id3_payload
    for i, br_idx in enumerate(bitrate_indices[:n_frames]):
        b1 = 0xE0 | (0x3 << 3) | (0x1 << 1) | 0x1  # MPEG1, LIII, no CRC
        b2 = (br_idx << 4) | (sr_idx << 2)  # no padding
        b3 = (channel_bits & 0x3) << 6
        header = bytes([0xFF, b1, b2, b3])
        frame_len = (144_000 * BITRATES[br_idx]) // SAMPLE_RATES[sr_idx]
        body = bytes((i + j) % 256 for j in range(frame_len - 4))
        out += header + body
    return bytes(out)
