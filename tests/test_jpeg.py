"""JPEG/JFIF header parser (multimodal/jpeg.py) + jpeg_meta_stats tests."""

import struct

import pytest

from llm_pretraining_data_pipeline_spark.multimodal import jpeg, media


class TestJpegParser:
    def test_roundtrip_baseline(self):
        m = jpeg.parse_jpeg_meta(jpeg.encode_jpeg_stub(640, 480))
        assert m == {
            "width": 640, "height": 480, "components": 3,
            "precision": 8, "progressive": False, "jfif": True,
        }

    def test_roundtrip_progressive_grayscale(self):
        m = jpeg.parse_jpeg_meta(
            jpeg.encode_jpeg_stub(1920, 1080, components=1, progressive=True)
        )
        assert m["progressive"] and m["components"] == 1
        assert (m["width"], m["height"]) == (1920, 1080)

    def test_rejects_missing_soi(self):
        with pytest.raises(ValueError, match="SOI"):
            jpeg.parse_jpeg_meta(b"\x89PNG\r\n\x1a\n")

    def test_rejects_no_frame_header(self):
        with pytest.raises(ValueError, match="EOI before frame"):
            jpeg.parse_jpeg_meta(b"\xff\xd8\xff\xd9")

    def test_rejects_sos_before_sof(self):
        payload = (
            b"\xff\xd8"
            + b"\xff\xda" + struct.pack(">H", 6) + b"\x01\x01\x00\x3f"
        )
        with pytest.raises(ValueError, match="SOS before frame"):
            jpeg.parse_jpeg_meta(payload)

    def test_rejects_truncated_segment(self):
        payload = jpeg.encode_jpeg_stub(64, 64)
        with pytest.raises(ValueError, match="declares|truncated"):
            jpeg.parse_jpeg_meta(payload[:8])

    def test_rejects_oversized_declared_segment(self):
        payload = bytearray(jpeg.encode_jpeg_stub(64, 64))
        struct.pack_into(">H", payload, 4, 0xFFFF)  # APP0 claims 64 KiB
        with pytest.raises(ValueError, match="declares"):
            jpeg.parse_jpeg_meta(bytes(payload))

    def test_rejects_zero_dimension(self):
        payload = bytearray(jpeg.encode_jpeg_stub(64, 64))
        # SOF height field lives 5 bytes into the SOF segment body
        sof_off = payload.index(b"\xff\xc0")
        struct.pack_into(">H", payload, sof_off + 5, 0)
        with pytest.raises(ValueError, match="zero frame"):
            jpeg.parse_jpeg_meta(bytes(payload))

    def test_fill_bytes_before_marker(self):
        payload = jpeg.encode_jpeg_stub(32, 32)
        padded = payload[:2] + b"\xff\xff" + payload[2:]
        assert jpeg.parse_jpeg_meta(padded)["width"] == 32

    def test_rst_standalone_marker_skipped(self):
        payload = jpeg.encode_jpeg_stub(32, 32)
        padded = payload[:2] + b"\xff\xd0" + payload[2:]  # RST0, no length
        assert jpeg.parse_jpeg_meta(padded)["height"] == 32

    def test_encode_rejects_bad_params(self):
        with pytest.raises(ValueError, match="bad dims"):
            jpeg.encode_jpeg_stub(0, 10)
        with pytest.raises(ValueError, match="components"):
            jpeg.encode_jpeg_stub(10, 10, components=4)


class TestJpegMetaStats:
    def test_operator_parses_and_flags(self, spark):
        rows = [
            (1, bytearray(jpeg.encode_jpeg_stub(800, 600))),
            (2, bytearray(
                jpeg.encode_jpeg_stub(320, 200, components=1,
                                      progressive=True))),
            (3, bytearray(b"\xff\xd8\xff\xd9")),
            (4, None),
        ]
        df = spark.createDataFrame(rows, "media_id long, payload binary")
        out = {r["media_id"]: r for r in media.jpeg_meta_stats(df).collect()}
        assert out[1]["decode_ok"] and out[1]["width"] == 800
        assert out[1]["jfif"] and not out[1]["progressive"]
        assert out[2]["progressive"] and out[2]["components"] == 1
        assert not out[3]["decode_ok"] and "frame" in out[3]["decode_err"]
        assert not out[4]["decode_ok"]

    def test_custom_id_col(self, spark):
        df = spark.createDataFrame(
            [(7, bytearray(jpeg.encode_jpeg_stub(48, 48)))],
            "img_id long, payload binary",
        )
        out = media.jpeg_meta_stats(df, id_col="img_id").collect()
        assert out[0]["img_id"] == 7 and out[0]["decode_ok"]
