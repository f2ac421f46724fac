"""BMP codec (multimodal/bmp.py) + bmp_feature_stats operator tests.

Mirrors the PNG/WAV test strategy: encode closed-form pixels → decode →
stats must equal the independently-computed closed form across every
layout combination (24/32 bpp × bottom-up/top-down); malformed payloads
raise (codec) / survive as decode_ok=false (operator)."""

import struct

import pytest

from llm_pretraining_data_pipeline_spark.multimodal import bmp, media


def _pix(w, h, seed=0):
    return bytes(
        (5 * x + 11 * y + 7 * seed + 17 * c) % 256
        for y in range(h)
        for x in range(w)
        for c in range(3)
    )


class TestBmpCodec:
    @pytest.mark.parametrize("bpp", [24, 32])
    @pytest.mark.parametrize("top_down", [False, True])
    def test_roundtrip_all_layouts(self, bpp, top_down):
        w, h = 7, 5  # w=7 at 24bpp gives stride 24 (3 pad bytes) — padding real
        pix = _pix(w, h, seed=3)
        payload = bmp.encode_bmp(w, h, pix, bpp=bpp, top_down=top_down)
        dw, dh, dbpp, vals = bmp.decode_bmp(payload)
        assert (dw, dh, dbpp) == (w, h, bpp)
        assert bytes(vals) == pix  # layout-normalised to top-down BGR

    def test_stats_match_closed_form(self):
        w, h, seed = 9, 6, 11
        payload = bmp.encode_bmp(w, h, _pix(w, h, seed))
        st = bmp.bmp_stats(payload)
        vals = [
            (5 * x + 11 * y + 7 * seed + 17 * c) % 256
            for y in range(h) for x in range(w) for c in range(3)
        ]
        assert st["px_sum"] == sum(vals)
        assert st["px_min"] == min(vals) and st["px_max"] == max(vals)
        assert st["n_pixels"] == w * h

    def test_padding_bytes_excluded_from_stats(self):
        # w=1 at 24bpp → stride 4, one zero pad byte per row; px_min must
        # come from pixel data, not padding
        payload = bmp.encode_bmp(1, 3, bytes([9, 9, 9] * 3))
        st = bmp.bmp_stats(payload)
        assert st["px_min"] == 9 and st["px_sum"] == 81

    def test_rejects_non_bm(self):
        with pytest.raises(ValueError, match="not a BM"):
            bmp.decode_bmp(b"XX" + b"\x00" * 60)

    def test_rejects_v5_header(self):
        payload = bytearray(bmp.encode_bmp(4, 4, _pix(4, 4)))
        struct.pack_into("<I", payload, 14, 124)  # BITMAPV5HEADER size
        with pytest.raises(ValueError, match="biSize"):
            bmp.decode_bmp(bytes(payload))

    def test_rejects_rle_compression(self):
        payload = bytearray(bmp.encode_bmp(4, 4, _pix(4, 4)))
        struct.pack_into("<I", payload, 30, 1)  # BI_RLE8
        with pytest.raises(ValueError, match="biCompression"):
            bmp.decode_bmp(bytes(payload))

    def test_rejects_palette_depths(self):
        payload = bytearray(bmp.encode_bmp(4, 4, _pix(4, 4)))
        struct.pack_into("<H", payload, 28, 8)  # 8 bpp paletted
        with pytest.raises(ValueError, match="bpp"):
            bmp.decode_bmp(bytes(payload))

    def test_rejects_truncated_pixel_array(self):
        payload = bmp.encode_bmp(8, 8, _pix(8, 8))
        with pytest.raises(ValueError, match="remain"):
            bmp.decode_bmp(payload[:-5])

    def test_rejects_bad_offset(self):
        payload = bytearray(bmp.encode_bmp(4, 4, _pix(4, 4)))
        struct.pack_into("<I", payload, 10, len(payload) + 10)
        with pytest.raises(ValueError, match="offset"):
            bmp.decode_bmp(bytes(payload))

    def test_allocation_guard_before_decode(self):
        # declared 60k x 60k: the guard must fire from the HEADER alone
        payload = bytearray(bmp.encode_bmp(4, 4, _pix(4, 4)))
        struct.pack_into("<ii", payload, 18, 60_000, 60_000)
        with pytest.raises(ValueError, match="max_pixels"):
            bmp.decode_bmp(bytes(payload))

    def test_encoder_input_validation(self):
        with pytest.raises(ValueError, match="pixel bytes"):
            bmp.encode_bmp(4, 4, b"\x00" * 5)
        with pytest.raises(ValueError, match="bpp"):
            bmp.encode_bmp(4, 4, _pix(4, 4), bpp=16)


class TestBmpFeatureStats:
    def test_operator_decodes_and_flags(self, spark):
        rows = [
            (1, bytearray(bmp.encode_bmp(5, 4, _pix(5, 4, 1), bpp=32))),
            (2, bytearray(bmp.encode_bmp(5, 4, _pix(5, 4, 1), top_down=True))),
            (3, bytearray(b"BMnope")),
        ]
        df = spark.createDataFrame(rows, "media_id long, payload binary")
        out = {r["media_id"]: r for r in media.bmp_feature_stats(df).collect()}
        # bottom-up 32bpp and top-down 24bpp of the SAME pixels: equal stats
        assert out[1]["px_sum"] == out[2]["px_sum"]
        assert out[1]["bpp"] == 32 and out[2]["bpp"] == 24
        assert out[1]["n_pixels"] == 20 and out[1]["decode_ok"]
        assert not out[3]["decode_ok"] and "headers" in out[3]["decode_err"]

    def test_magic_kind_detects_bmp(self, spark):
        from pyspark.sql import functions as F
        rows = [
            (1, bytearray(bmp.encode_bmp(2, 2, _pix(2, 2)))),
            (2, bytearray(b"BM just text that starts with BM....")),
        ]
        df = spark.createDataFrame(rows, "media_id long, payload binary")
        out = {
            r["media_id"]: r["k"]
            for r in df.select(
                "media_id", media.magic_kind("payload").alias("k")
            ).collect()
        }
        assert out[1] == "bmp"
        assert out[2] == "unknown"  # 'BM' text without biSize=40 stays unknown


class TestSoundfileBackend:
    """Env-gated libsndfile swap-in (VERDICT r9 item 8): parity with the
    stdlib decoder on canonical fixtures when the library is present."""

    @staticmethod
    def _require_soundfile():
        return pytest.importorskip(
            "soundfile",
            reason="optional audio backend not installed; runbook: pip "
                   "install soundfile, then "
                   "SPARK_GRAFT_AUDIO_BACKEND=soundfile",
        )

    def test_pcm16_bit_parity(self):
        self._require_soundfile()
        from llm_pretraining_data_pipeline_spark.multimodal import wav
        samples = [((17 + 37 * i) % 65536) - 32768 for i in range(400)]
        payload = wav.encode_wav(samples, sample_rate=8_000, channels=2)
        assert wav.decode_wav_soundfile(payload) == wav.decode_wav(payload)

    def test_u8_recentred_parity(self):
        self._require_soundfile()
        from llm_pretraining_data_pipeline_spark.multimodal import wav
        samples = [(13 + 29 * i) % 256 for i in range(300)]
        payload = wav.encode_wav(samples, bits=8)
        assert wav.decode_wav_soundfile(payload) == wav.decode_wav(payload)

    def test_stats_backend_equivalence(self):
        self._require_soundfile()
        from llm_pretraining_data_pipeline_spark.multimodal import wav
        samples = [((5 + 97 * i) % 65536) - 32768 for i in range(512)]
        payload = wav.encode_wav(samples)
        assert wav.wav_stats(payload, backend="soundfile") == wav.wav_stats(
            payload
        )
