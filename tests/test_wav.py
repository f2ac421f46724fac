"""WAV codec (multimodal/wav.py) + wav_feature_stats operator tests.

Mirrors the PNG test strategy: encode closed-form samples → decode → stats
must equal the independently-computed closed form; malformed payloads raise
(codec) / survive as decode_ok=false (operator)."""

import struct

import pytest

from llm_pretraining_data_pipeline_spark.multimodal import media, wav


def _saw(n, a=37, b=17):
    return [((b + i * a) % 65536) - 32768 for i in range(n)]


class TestWavCodec:
    def test_roundtrip_mono16(self):
        samples = _saw(500)
        sr, ch, bits, dec = wav.decode_wav(wav.encode_wav(samples, 16_000))
        assert (sr, ch, bits) == (16_000, 1, 16)
        assert dec == samples

    def test_roundtrip_stereo16(self):
        left = _saw(400)
        inter = [v for pair in zip(left, [-v for v in left]) for v in pair]
        sr, ch, bits, dec = wav.decode_wav(wav.encode_wav(inter, channels=2))
        assert ch == 2 and dec == inter

    def test_roundtrip_8bit_recentred(self):
        s8 = [(i * 7 + 3) % 256 for i in range(301)]  # odd len → RIFF pad byte
        _, _, bits, dec = wav.decode_wav(wav.encode_wav(s8, 8000, bits=8))
        assert bits == 8 and dec == [x - 128 for x in s8]

    def test_stats_match_closed_form(self):
        samples = _saw(600)
        st = wav.wav_stats(wav.encode_wav(samples, 8000))
        assert st["sq_sum"] == sum(v * v for v in samples)
        assert st["peak_abs"] == max(abs(v) for v in samples)
        assert st["clip_count"] == sum(
            1 for v in samples if v >= 32767 or v <= -32768
        )
        assert st["flip_count"] == sum(
            1 for x, y in zip(samples, samples[1:]) if (x >= 0) != (y >= 0)
        )
        assert st["n_frames"] == 600
        assert st["duration_ms"] == 600 * 1000.0 / 8000

    def test_stats_zcr_uses_channel0(self):
        left = _saw(400)
        inter = [v for pair in zip(left, [32_000] * 400) for v in pair]
        st = wav.wav_stats(wav.encode_wav(inter, channels=2))
        assert st["flip_count"] == sum(
            1 for x, y in zip(left, left[1:]) if (x >= 0) != (y >= 0)
        )

    def test_rejects_non_riff(self):
        with pytest.raises(ValueError, match="not a RIFF"):
            wav.decode_wav(b"JUNKJUNKJUNKJUNK")

    def test_rejects_truncated_data_chunk(self):
        payload = wav.encode_wav(_saw(100))
        with pytest.raises(ValueError, match="declares"):
            wav.decode_wav(payload[:-9])

    def test_rejects_missing_fmt(self):
        with pytest.raises(ValueError, match="missing fmt"):
            wav.decode_wav(b"RIFF\x04\x00\x00\x00WAVE")

    def test_rejects_float_format(self):
        payload = bytearray(wav.encode_wav(_saw(10)))
        # audio_format field lives at byte 20 (RIFF 12 + 'fmt '+size 8)
        struct.pack_into("<H", payload, 20, 3)  # IEEE float
        with pytest.raises(ValueError, match="audio_format"):
            wav.decode_wav(bytes(payload))

    def test_rejects_24bit(self):
        payload = bytearray(wav.encode_wav(_saw(10)))
        struct.pack_into("<H", payload, 34, 24)  # bits_per_sample
        with pytest.raises(ValueError, match="bits_per_sample|block_align"):
            wav.decode_wav(bytes(payload))

    @staticmethod
    def _extensible(samples, sub_guid, cb_size=22, ext_bytes=22):
        """Rewrap encode_wav output as WAVE_FORMAT_EXTENSIBLE with the given
        SubFormat GUID (valid-bits=16, mask=0x4, standard 22-byte ext)."""
        plain = wav.encode_wav(samples)
        fmt16 = plain[20:36]  # the 16 base fmt fields
        body_chunk = plain[36:]  # 'data' + size + samples
        fmt = bytearray(fmt16)
        struct.pack_into("<H", fmt, 0, 0xFFFE)
        ext = struct.pack("<H", cb_size) + (
            struct.pack("<HI", 16, 0x4) + sub_guid
        )[:ext_bytes]
        fmt_chunk = b"fmt " + struct.pack("<I", 16 + len(ext)) + bytes(fmt) + ext
        chunks = fmt_chunk + body_chunk
        return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks

    _GUID_PCM = bytes(
        [0x01, 0, 0, 0, 0, 0, 0x10, 0, 0x80, 0, 0, 0xAA, 0, 0x38, 0x9B, 0x71]
    )
    _GUID_ALAW = bytes(
        [0x06, 0, 0, 0, 0, 0, 0x10, 0, 0x80, 0, 0, 0xAA, 0, 0x38, 0x9B, 0x71]
    )

    def test_extensible_pcm_guid_decodes(self):
        samples = _saw(40)
        payload = self._extensible(samples, self._GUID_PCM)
        assert wav.decode_wav(payload) == (16_000, 1, 16, samples)

    def test_extensible_alaw_guid_rejected(self):
        # A-law wrapped in 0xFFFE carries bits=8/16 too — without the GUID
        # check it would silently decode as PCM and yield wrong stats
        payload = self._extensible(_saw(40), self._GUID_ALAW)
        with pytest.raises(ValueError, match="SubFormat"):
            wav.decode_wav(payload)

    def test_extensible_short_extension_rejected(self):
        payload = self._extensible(
            _saw(40), self._GUID_PCM, cb_size=6, ext_bytes=6
        )
        with pytest.raises(ValueError, match="extension too short"):
            wav.decode_wav(payload)

    def test_extensible_missing_cbsize_rejected(self):
        plain = wav.encode_wav(_saw(40))
        fmt = bytearray(plain[20:36])
        struct.pack_into("<H", fmt, 0, 0xFFFE)
        raw = (
            b"RIFF" + struct.pack("<I", 4 + 24 + len(plain[36:])) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + bytes(fmt) + plain[36:]
        )
        with pytest.raises(ValueError, match="missing cbSize"):
            wav.decode_wav(raw)

    def test_allocation_guard(self):
        payload = wav.encode_wav(_saw(1000))
        with pytest.raises(ValueError, match="max_samples"):
            wav.decode_wav(payload, max_samples=100)

    def test_mid_frame_truncation(self):
        # stereo with an odd sample count in data: mid-frame cut
        inter = _saw(10)  # 10 samples, claim 2 channels → 5 frames ok; drop 1
        payload = wav.encode_wav(inter[:-1] + [0], channels=2)
        body = bytearray(payload)
        # shrink the data chunk size by one sample (2 bytes) and cut payload
        # → len % unit == 0 but % channels != 0
        (dsz,) = struct.unpack_from("<I", body, 40)
        struct.pack_into("<I", body, 40, dsz - 2)
        with pytest.raises(ValueError, match="mid-frame"):
            wav.decode_wav(bytes(body[:-2]))


class TestWavFeatureStats:
    def test_operator_decodes_and_flags(self, spark):
        rows = [
            (1, bytearray(wav.encode_wav(_saw(300), 16_000))),
            (2, bytearray(wav.encode_wav(_saw(200, a=91), 8000))),
            (3, bytearray(b"RIFFgarbage-not-a-wav")),
            (4, None),
        ]
        df = spark.createDataFrame(rows, "media_id long, payload binary")
        out = {
            r["media_id"]: r
            for r in media.wav_feature_stats(df).collect()
        }
        s1 = _saw(300)
        assert out[1]["decode_ok"] and out[1]["n_frames"] == 300
        assert out[1]["sq_sum"] == sum(v * v for v in s1)
        assert out[1]["sample_rate"] == 16_000
        assert out[2]["decode_ok"] and out[2]["n_frames"] == 200
        assert not out[3]["decode_ok"] and out[3]["decode_err"]
        assert not out[4]["decode_ok"]

    def test_custom_id_col(self, spark):
        df = spark.createDataFrame(
            [(7, bytearray(wav.encode_wav(_saw(50))))], "clip_id long, payload binary"
        )
        out = media.wav_feature_stats(df, id_col="clip_id").collect()
        assert out[0]["clip_id"] == 7 and out[0]["decode_ok"]
