"""WARC reader (sources/warc.py) parser + warc_records operator tests."""

import pytest

from llm_pretraining_data_pipeline_spark.sources import warc


def _two_record_blob():
    return warc.encode_warc([
        ("response", "https://a.example/x", "r-0", b"hello world"),
        ("metadata", "https://a.example/x", "r-1", b"k=v"),
    ])


class TestWarcParser:
    def test_roundtrip_two_records(self):
        recs = warc.parse_warc(_two_record_blob())
        assert len(recs) == 2
        assert recs[0]["warc_type"] == "response"
        assert recs[0]["payload"] == b"hello world"
        assert recs[0]["content_length"] == 11
        assert recs[0]["record_id"] == "<urn:uuid:r-0>"
        assert recs[1]["warc_type"] == "metadata"
        assert recs[1]["target_uri"] == "https://a.example/x"

    def test_payload_may_contain_crlf(self):
        blob = warc.encode_warc_record(
            "response", "https://a.example", "r", b"a\r\n\r\nb"
        )
        assert warc.parse_warc(blob)[0]["payload"] == b"a\r\n\r\nb"

    def test_rejects_bad_version(self):
        with pytest.raises(ValueError, match="bad version"):
            warc.parse_warc(b"WARC/2.0\r\n\r\n")

    def test_rejects_truncated_headers(self):
        with pytest.raises(ValueError, match="truncated header"):
            warc.parse_warc(_two_record_blob()[:25])

    def test_rejects_missing_content_length(self):
        blob = b"WARC/1.0\r\nWARC-Type: response\r\n\r\n\r\n\r\n"
        with pytest.raises(ValueError, match="Content-Length"):
            warc.parse_warc(blob)

    def test_rejects_overlong_declared_payload(self):
        blob = (
            b"WARC/1.0\r\nContent-Length: 9999\r\n\r\n" + b"x" * 10
        )
        with pytest.raises(ValueError, match="declares"):
            warc.parse_warc(blob)

    def test_rejects_missing_terminator(self):
        good = warc.encode_warc_record("response", "u", "r", b"abc")
        with pytest.raises(ValueError, match="terminator"):
            warc.parse_warc(good[:-4] + b"XXXX")

    def test_rejects_header_without_colon(self):
        blob = b"WARC/1.0\r\nnocolonhere\r\n\r\n\r\n\r\n"
        with pytest.raises(ValueError, match="without colon"):
            warc.parse_warc(blob)

    def test_rejects_empty_blob(self):
        with pytest.raises(ValueError, match="truncated version|empty"):
            warc.parse_warc(b"")

    def test_rejects_negative_and_nonnumeric_length(self):
        with pytest.raises(ValueError, match="negative"):
            warc.parse_warc(b"WARC/1.0\r\nContent-Length: -1\r\n\r\n\r\n\r\n")
        with pytest.raises(ValueError, match="non-numeric"):
            warc.parse_warc(b"WARC/1.0\r\nContent-Length: ten\r\n\r\n\r\n\r\n")

    def test_header_count_cap(self):
        filler = b"".join(
            b"X-H%d: v\r\n" % i for i in range(warc._MAX_HEADERS + 1)
        )
        blob = b"WARC/1.0\r\n" + filler + b"\r\n\r\n\r\n"
        with pytest.raises(ValueError, match="too many header"):
            warc.parse_warc(blob)


class TestWarcRecordsOperator:
    def test_explodes_and_flags(self, spark):
        rows = [
            (1, bytearray(_two_record_blob())),
            (2, bytearray(b"not a warc blob")),
            (3, None),
        ]
        df = spark.createDataFrame(rows, "file_id long, payload binary")
        out = warc.warc_records(df).collect()
        by_file = {}
        for r in out:
            by_file.setdefault(r["file_id"], []).append(r)
        assert len(by_file[1]) == 2 and all(r["parse_ok"] for r in by_file[1])
        assert sorted(r["rec_index"] for r in by_file[1]) == [0, 1]
        assert bytes(by_file[1][0]["payload"]) == b"hello world"
        assert len(by_file[2]) == 1 and not by_file[2][0]["parse_ok"]
        assert "version" in by_file[2][0]["parse_err"]
        assert len(by_file[3]) == 1 and not by_file[3][0]["parse_ok"]


class TestWarcGz:
    """CommonCrawl .warc.gz: per-record gzip members (sources/warc.py)."""

    def test_roundtrip_members(self):
        recs = [("response", "https://a.example", "r-0", b"hello"),
                ("metadata", "https://a.example", "r-1", b"k=v")]
        out = warc.parse_warc_gz(warc.encode_warc_gz(recs))
        assert [r["payload"] for r in out] == [b"hello", b"k=v"]
        assert [r["warc_type"] for r in out] == ["response", "metadata"]

    def test_members_are_individually_seekable(self):
        import gzip
        recs = [("response", "u", "r-0", b"a"), ("response", "u", "r-1", b"b")]
        blob = warc.encode_warc_gz(recs)
        # first member alone must decompress to record 0 (CC seekability)
        m0 = gzip.compress(warc.encode_warc_record(*recs[0]), mtime=0)
        assert blob.startswith(m0)
        assert warc.parse_warc(gzip.decompress(m0))[0]["payload"] == b"a"

    def test_truncated_member_raises(self):
        blob = warc.encode_warc_gz([("response", "u", "r", b"x" * 100)])
        with pytest.raises(ValueError, match="truncated|bad gzip"):
            warc.gunzip_members(blob[: len(blob) // 2])

    def test_trailing_garbage_raises(self):
        blob = warc.encode_warc_gz([("response", "u", "r", b"x")])
        with pytest.raises(ValueError, match="bad gzip"):
            warc.gunzip_members(blob + b"NOTGZIP")

    def test_bomb_cap(self):
        blob = warc.encode_warc_gz([("response", "u", "r", b"\x00" * 10_000)])
        with pytest.raises(ValueError, match="inflates past"):
            warc.gunzip_members(blob, max_member_bytes=1024)

    def test_empty_blob_raises(self):
        with pytest.raises(ValueError, match="empty"):
            warc.gunzip_members(b"")

    def test_operator_gzipped_flag(self, spark):
        good = warc.encode_warc_gz(
            [("response", "https://a.example/x", "r-0", b"hello world")]
        )
        rows = [(1, bytearray(good)), (2, bytearray(good[:10]))]
        df = spark.createDataFrame(rows, "file_id long, payload binary")
        out = {r["file_id"]: r
               for r in warc.warc_records(df, gzipped=True).collect()}
        assert out[1]["parse_ok"] and bytes(out[1]["payload"]) == b"hello world"
        assert not out[2]["parse_ok"] and "gunzip" in out[2]["parse_err"]
