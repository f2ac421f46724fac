"""MP4/ISO-BMFF parser (multimodal/mp4.py) + mp4_meta_stats operator tests."""

import struct

import pytest

from llm_pretraining_data_pipeline_spark.multimodal import media, mp4


class TestMp4Parser:
    def test_roundtrip_v0(self):
        m = mp4.parse_mp4_meta(mp4.encode_mp4_stub(600, 3607, 640, 360))
        assert m == {
            "brand": "isom", "timescale": 600, "duration": 3607,
            "duration_ms": 3607 * 1000.0 / 600, "width": 640, "height": 360,
        }

    def test_roundtrip_v1_64bit_duration(self):
        m = mp4.parse_mp4_meta(
            mp4.encode_mp4_stub(
                90_000, 2**33, 1920, 1080, brand=b"mp42", mvhd_version=1
            )
        )
        assert m["duration"] == 2**33
        assert m["timescale"] == 90_000
        assert m["brand"] == "mp42"
        assert (m["width"], m["height"]) == (1920, 1080)

    def test_rejects_undersized_box(self):
        with pytest.raises(ValueError, match="invalid box size"):
            mp4.parse_mp4_meta(b"\x00\x00\x00\x04ftyp" + b"\x00" * 8)

    def test_rejects_oversized_declared_box(self):
        payload = bytearray(mp4.encode_mp4_stub(600, 100, 64, 64))
        struct.pack_into(">I", payload, 0, 2**31)  # ftyp claims 2 GiB
        with pytest.raises(ValueError, match="declares"):
            mp4.parse_mp4_meta(bytes(payload))

    def test_rejects_truncated_payload(self):
        payload = mp4.encode_mp4_stub(600, 100, 64, 64)
        with pytest.raises(ValueError, match="declares|truncated"):
            mp4.parse_mp4_meta(payload[:30])

    def test_rejects_missing_moov_and_mvhd(self):
        with pytest.raises(ValueError, match="missing moov"):
            mp4.parse_mp4_meta(
                mp4._box(b"ftyp", b"isom\x00\x00\x00\x00isom")
            )
        with pytest.raises(ValueError, match="missing mvhd"):
            mp4.parse_mp4_meta(
                mp4._box(b"moov", mp4._box(b"free", b"\x00" * 8))
            )

    def test_rejects_zero_timescale(self):
        with pytest.raises(ValueError, match="timescale"):
            mp4.parse_mp4_meta(mp4.encode_mp4_stub(0, 5, 1, 1))

    def test_size_zero_box_extends_to_eof(self):
        # rewrite the moov header size field to 0 (= "to end of file")
        payload = bytearray(mp4.encode_mp4_stub(1000, 2500, 320, 240))
        ftyp_size = struct.unpack_from(">I", payload, 0)[0]
        struct.pack_into(">I", payload, ftyp_size, 0)
        m = mp4.parse_mp4_meta(bytes(payload))
        assert m["duration"] == 2500 and m["timescale"] == 1000


class TestMp4MetaStats:
    def test_operator_parses_and_flags(self, spark):
        rows = [
            (1, bytearray(mp4.encode_mp4_stub(600, 1800, 640, 360))),
            (2, bytearray(
                mp4.encode_mp4_stub(90_000, 90_000 * 5 + 1, 1280, 720,
                                    brand=b"mp42", mvhd_version=1))),
            (3, bytearray(b"\x00\x00\x00\x08junk")),
            (4, None),
        ]
        df = spark.createDataFrame(rows, "media_id long, payload binary")
        out = {r["media_id"]: r for r in media.mp4_meta_stats(df).collect()}
        assert out[1]["decode_ok"] and out[1]["duration"] == 1800
        assert out[1]["brand"] == "isom" and out[1]["width"] == 640
        assert out[2]["decode_ok"] and out[2]["duration"] == 450_001
        assert not out[3]["decode_ok"] and out[3]["decode_err"]
        assert not out[4]["decode_ok"]

    def test_custom_id_col(self, spark):
        df = spark.createDataFrame(
            [(9, bytearray(mp4.encode_mp4_stub(600, 60, 32, 32)))],
            "clip_id long, payload binary",
        )
        out = media.mp4_meta_stats(df, id_col="clip_id").collect()
        assert out[0]["clip_id"] == 9 and out[0]["decode_ok"]


class TestMultiTrackDims:
    """Round-9 review finding: audio tkhd (0x0) must not clobber video dims."""

    def _two_trak(self, first_dims, second_dims):
        ts, dur = 600, 1200
        base = mp4.encode_mp4_stub(ts, dur, 1, 1)

        def tkhd(w, h):
            return mp4._box(
                b"tkhd",
                struct.pack(">B3x", 0)
                + b"\x00" * 4      # creation
                + b"\x00" * 4      # modification
                + struct.pack(">I", 1)  # track id
                + b"\x00" * 4      # reserved
                + struct.pack(">I", dur)
                + b"\x00" * 8      # reserved
                + b"\x00" * 6      # layer / alternate_group / volume
                + b"\x00" * 2      # reserved
                + b"\x00" * 36     # matrix
                + struct.pack(">II", w << 16, h << 16),
            )

        mvhd = mp4._box(
            b"mvhd",
            struct.pack(">B3x4s4sII", 0, b"\0" * 4, b"\0" * 4, ts, dur)
            + b"\x00" * 80,
        )
        moov = mp4._box(
            b"moov",
            mvhd
            + mp4._box(b"trak", tkhd(*first_dims))
            + mp4._box(b"trak", tkhd(*second_dims)),
        )
        ftyp = mp4._box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
        del base
        return ftyp + moov

    def test_video_then_audio(self):
        m = mp4.parse_mp4_meta(self._two_trak((640, 360), (0, 0)))
        assert (m["width"], m["height"]) == (640, 360)

    def test_audio_then_video(self):
        m = mp4.parse_mp4_meta(self._two_trak((0, 0), (1280, 720)))
        assert (m["width"], m["height"]) == (1280, 720)
