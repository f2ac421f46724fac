"""Brotli meta-block layer (sources/br.py): stored-block round trips,
strict framing, bounded refusals, and the HTTP Content-Encoding hook."""

import pytest

from llm_pretraining_data_pipeline_spark.sources import http
from llm_pretraining_data_pipeline_spark.sources.br import (
    _BitReader,
    _BitWriter,
    _read_window_bits,
    br_decode,
    br_encode_stored,
)


class TestStoredRoundTrip:
    @pytest.mark.parametrize("n", [0, 1, 7, 100, 65535, 65536, 65537, 200_000])
    def test_roundtrip_sizes(self, n):
        data = bytes((i * 131 + 17) % 256 for i in range(n))
        enc = br_encode_stored(data)
        assert br_decode(enc) == data

    def test_multi_chunk_content_order(self):
        data = b"A" * 65536 + b"B" * 65536 + b"C"
        assert br_decode(br_encode_stored(data)) == data

    def test_deterministic(self):
        assert br_encode_stored(b"hello") == br_encode_stored(b"hello")

    def test_empty_stream_is_one_byte(self):
        # WBITS '0' + ISLAST + ISLASTEMPTY = 3 bits, zero-padded
        assert br_encode_stored(b"") == b"\x06"


class TestStrictFraming:
    def test_empty_input_raises(self):
        with pytest.raises(ValueError, match="empty stream"):
            br_decode(b"")

    def test_trailing_garbage_raises(self):
        enc = br_encode_stored(b"hello") + b"JUNK"
        with pytest.raises(ValueError, match="trailing bytes"):
            br_decode(enc)

    def test_nonzero_final_padding_raises(self):
        # the empty stream's 5 padding bits must be zero
        with pytest.raises(ValueError, match="nonzero padding"):
            br_decode(b"\x0e")

    def test_truncated_stream_raises(self):
        enc = br_encode_stored(b"some payload here")
        with pytest.raises(ValueError, match="br:"):
            br_decode(enc[:4])

    def test_bomb_capped_before_allocation(self):
        enc = br_encode_stored(b"\x00" * (1 << 20))
        with pytest.raises(ValueError, match="inflates past"):
            br_decode(enc, max_bytes=1 << 16)

    def test_invalid_wbits_encoding_raises(self):
        # '1' + 3 zero bits + '100' (LSB-first value 1) = reserved
        w = _BitWriter()
        w.write(1, 1)
        w.write(0, 3)
        w.write(1, 3)
        with pytest.raises(ValueError, match="WBITS"):
            br_decode(bytes(w.buf))

    def test_wbits_variants_decode(self):
        # every legal WBITS prefix must parse (content: empty stream)
        for wbits_writer, expect in [
            (lambda w: w.write(0, 1), 16),
            (lambda w: (w.write(1, 1), w.write(3, 3)), 20),
            (lambda w: (w.write(1, 1), w.write(0, 3), w.write(0, 3)), 17),
            (lambda w: (w.write(1, 1), w.write(0, 3), w.write(5, 3)), 13),
        ]:
            w = _BitWriter()
            wbits_writer(w)
            r = _BitReader(bytes(w.buf) + b"\x00")
            assert _read_window_bits(r) == expect


class TestCompressedRefusal:
    def test_compressed_meta_block_refused_with_reason(self):
        # flip the ISUNCOMPRESSED bit (bit 20 = byte 2, bit 4) of a
        # stored one-block stream: the framing is still valid brotli,
        # the block is now compressed, and the refusal must name the
        # missing machinery instead of mis-decoding
        enc = bytearray(br_encode_stored(b"x"))
        enc[2] ^= 0x10
        with pytest.raises(ValueError, match="compressed meta-block"):
            br_decode(bytes(enc))


class _FakeBrotli:
    """Stand-in for the brotli/brotlicffi wheel (absent in-container):
    the one-shot ``decompress`` API both wheels share."""

    def __init__(self, result=None, exc=None):
        self.result, self.exc, self.calls = result, exc, []

    def decompress(self, data):
        self.calls.append(bytes(data))
        if self.exc is not None:
            raise self.exc
        return self.result


class TestExternalDecoder:
    """VERDICT r12 item 4: a compressed meta-block delegates to an
    importable brotli/brotlicffi module; the typed refusal stays the
    no-wheel fallback. Both branches covered (the real wheel is not in
    this container, so the present-module branch uses a fake with the
    same one-shot decompress signature)."""

    @staticmethod
    def _compressed_stream():
        enc = bytearray(br_encode_stored(b"x"))
        enc[2] ^= 0x10  # ISUNCOMPRESSED -> 0: now a compressed block
        return bytes(enc)

    def test_module_present_delegates_full_stream(self, monkeypatch):
        from llm_pretraining_data_pipeline_spark.sources import br

        fake = _FakeBrotli(result=b"decoded page text")
        monkeypatch.setattr(br, "_EXT_CACHE", fake)
        blob = self._compressed_stream()
        assert br_decode(blob) == b"decoded page text"
        # the WHOLE stream is delegated (external decoders need the header)
        assert fake.calls == [blob]

    def test_module_absent_keeps_typed_refusal(self, monkeypatch):
        from llm_pretraining_data_pipeline_spark.sources import br

        monkeypatch.setattr(br, "_EXT_CACHE", None)
        with pytest.raises(ValueError, match="compressed meta-block"):
            br_decode(self._compressed_stream())

    def test_external_output_capped(self, monkeypatch):
        from llm_pretraining_data_pipeline_spark.sources import br

        fake = _FakeBrotli(result=b"z" * 2048)
        monkeypatch.setattr(br, "_EXT_CACHE", fake)
        with pytest.raises(ValueError, match="inflates past"):
            br_decode(self._compressed_stream(), max_bytes=1024)

    def test_external_failure_is_typed(self, monkeypatch):
        from llm_pretraining_data_pipeline_spark.sources import br

        fake = _FakeBrotli(exc=RuntimeError("corrupt stream"))
        monkeypatch.setattr(br, "_EXT_CACHE", fake)
        with pytest.raises(ValueError, match="external decoder failed"):
            br_decode(self._compressed_stream())

    def test_stored_blocks_never_touch_the_module(self, monkeypatch):
        # the validated stdlib path stays primary: a stored-only stream
        # decodes without consulting the external module at all
        from llm_pretraining_data_pipeline_spark.sources import br

        fake = _FakeBrotli(exc=AssertionError("must not be called"))
        monkeypatch.setattr(br, "_EXT_CACHE", fake)
        assert br_decode(br_encode_stored(b"plain")) == b"plain"
        assert fake.calls == []

    def test_http_split_resolves_with_module(self, monkeypatch):
        # end-to-end through parse_http_response: the same br body flips
        # from typed error to decoded text when the wheel appears
        from llm_pretraining_data_pipeline_spark.sources import br

        blob = self._compressed_stream()
        msg = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n"
            b"Content-Encoding: br\r\n"
            + b"Content-Length: %d\r\n\r\n" % len(blob) + blob
        )
        monkeypatch.setattr(br, "_EXT_CACHE", None)
        with pytest.raises(ValueError, match="compressed meta-block"):
            http.parse_http_response(msg)
        monkeypatch.setattr(br, "_EXT_CACHE", _FakeBrotli(result=b"page"))
        assert http.parse_http_response(msg)["body"] == b"page"

    def test_metadata_block_skipped_then_content(self):
        # hand-craft: WBITS, a metadata block skipping 5 bytes, then a
        # stored block 'ok', then final-empty
        w = _BitWriter()
        w.write(0, 1)      # WBITS 16
        w.write(0, 1)      # ISLAST = 0
        w.write(3, 2)      # MNIBBLES code 3 -> metadata
        w.write(0, 1)      # reserved
        w.write(1, 2)      # MSKIPBYTES = 1
        w.write(4, 8)      # MSKIPLEN - 1 = 4
        w.align()
        w.raw(b"META!")    # 5 skipped bytes
        w.write(0, 1)      # ISLAST = 0
        w.write(0, 2)      # 4 nibbles
        w.write(1, 16)     # MLEN - 1 = 1
        w.write(1, 1)      # ISUNCOMPRESSED
        w.align()
        w.raw(b"ok")
        w.write(1, 1)      # ISLAST
        w.write(1, 1)      # ISLASTEMPTY
        w.align()
        assert br_decode(bytes(w.buf)) == b"ok"

    def test_last_metadata_block_raises(self):
        w = _BitWriter()
        w.write(0, 1)      # WBITS
        w.write(1, 1)      # ISLAST = 1
        w.write(0, 1)      # ISLASTEMPTY = 0
        w.write(3, 2)      # metadata
        with pytest.raises(ValueError, match="metadata meta-block"):
            br_decode(bytes(w.buf) + b"\x00")


class TestBrFuzz:
    """Totality over hostile bytes: br_decode must either succeed or
    raise ValueError — never IndexError/OverflowError/hang (the repo's
    parser-fuzz discipline from http/warc)."""

    def test_total_over_byte_soup(self):
        import random
        rng = random.Random(712)
        for trial in range(300):
            blob = bytes(
                rng.randrange(256) for _ in range(rng.randrange(0, 64))
            )
            try:
                out = br_decode(blob, max_bytes=1 << 16)
                assert isinstance(out, bytes)
            except ValueError:
                pass

    def test_total_over_mutated_valid_streams(self):
        import random
        rng = random.Random(1013)
        base = br_encode_stored(bytes(range(256)) * 8)
        for trial in range(300):
            mutated = bytearray(base)
            for _ in range(rng.randrange(1, 4)):
                mutated[rng.randrange(len(mutated))] = rng.randrange(256)
            try:
                br_decode(bytes(mutated), max_bytes=1 << 16)
            except ValueError:
                pass

    def test_truncations_of_valid_stream_never_crash(self):
        base = br_encode_stored(b"payload " * 64)
        for cut in range(len(base)):
            try:
                br_decode(base[:cut], max_bytes=1 << 16)
            except ValueError:
                pass


class TestHttpBrArm:
    def _msg(self, body, ce=b"br"):
        return (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n"
            b"Content-Encoding: " + ce + b"\r\n"
            b"Content-Length: %d\r\n\r\n" % len(body) + body
        )

    def test_stored_br_body_decodes(self):
        body = b"The quick brown fox jumps over the lazy dog." * 10
        out = http.parse_http_response(self._msg(br_encode_stored(body)))
        assert out["body"] == body

    def test_chunked_then_br_order(self):
        body = b"chunk order must hold for br exactly like gzip/deflate"
        enc = br_encode_stored(body)
        half = len(enc) // 2
        cb = (b"%X\r\n" % half + enc[:half] + b"\r\n"
              + b"%X\r\n" % (len(enc) - half) + enc[half:] + b"\r\n0\r\n\r\n")
        msg = (
            b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n"
            b"Content-Encoding: br\r\n\r\n" + cb
        )
        assert http.parse_http_response(msg)["body"] == body

    def test_compressed_br_surfaces_as_typed_error(self, monkeypatch):
        # pinned to the NO-wheel branch so the assertion holds in a
        # wheel-present container too (there the delegation raises the
        # 'external decoder failed' flavor instead)
        from llm_pretraining_data_pipeline_spark.sources import br

        monkeypatch.setattr(br, "_EXT_CACHE", None)
        enc = bytearray(br_encode_stored(b"x"))
        enc[2] ^= 0x10
        with pytest.raises(ValueError, match="compressed meta-block"):
            http.parse_http_response(self._msg(bytes(enc)))


class TestRealWheelEndToEnd:
    """Wheel-gated (VERDICT r13 item 4): in a container that ships a
    real brotli/brotlicffi wheel (the Dockerfile installs one), the
    compressed-br recovery path must decode a REAL stream end-to-end —
    br_decode, the HTTP split, and the distributed src_warc_http
    fixture whose cbr arm flips to assert recovered text."""

    pytestmark = pytest.mark.skipif(
        not __import__(
            "llm_pretraining_data_pipeline_spark.sources.br",
            fromlist=["external_brotli_available"],
        ).external_brotli_available(),
        reason="no brotli/brotlicffi wheel in this container",
    )

    def test_real_compressed_stream_recovers(self):
        from llm_pretraining_data_pipeline_spark.sources.br import (
            _external_decoder,
        )

        body = b"real entropy-coded page content, repeated enough " * 64
        enc = _external_decoder().compress(body)
        assert br_decode(enc) == body
        msg = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n"
            b"Content-Encoding: br\r\n"
            + b"Content-Length: %d\r\n\r\n" % len(enc) + enc
        )
        assert http.parse_http_response(msg)["body"] == body

    def test_fixture_compressed_arm_recovers_text(self, spark):
        import pyspark.sql.functions as F

        from llm_pretraining_data_pipeline_spark import queries_ext as QX
        from llm_pretraining_data_pipeline_spark.sources import http as H

        files = QX._warc_http_blobs(
            spark, "/root/testdata/sf0.001", compressed_br=True
        )
        recs = H.warc_http_records(files)
        cbr = recs.where(
            (F.col("file_id") % 4 == 0) & (F.col("file_id") % 3 != 0)
            & (F.col("file_id") % 5 != 0) & (F.col("file_id") % 7 != 0)
            & (F.col("file_id") % 8 == 4) & (F.col("file_id") % 37 != 0)
        ).collect()
        assert cbr, "fixture has no cbr rows at this SF"
        docs = {
            r["doc_id"]: r["text"]
            for r in spark.read.parquet(
                "/root/testdata/sf0.001/documents.parquet"
            ).collect()
        }
        # wheel container: EVERY cbr row recovers (real compressed
        # streams decode; empty bodies ship stored-empty, also ok)
        for r in cbr:
            assert r["http_ok"] is True
            assert bytes(r["body"]).decode("utf-8") == docs[r["file_id"]]


class TestHeterogeneousClusterGuard:
    """ADVICE r14: the cbr fixture's wheel-present arm branches on the
    DRIVER's probe (closure-captured by value), so the executor-side
    re-probe in _real_br_encode is the only thing standing between a
    driver-has-wheel/executor-lacks-wheel cluster and a silent
    fixture/oracle divergence — both branches of that guard must be
    reachable in-process."""

    def test_guard_fires_when_this_process_lacks_the_wheel(
        self, monkeypatch
    ):
        from llm_pretraining_data_pipeline_spark import queries_ext as QX
        from llm_pretraining_data_pipeline_spark.sources import br

        monkeypatch.setattr(br, "_EXT_CACHE", None)
        with pytest.raises(RuntimeError, match="install it cluster-wide"):
            QX._real_br_encode(b"page body")

    def test_guard_delegates_when_the_wheel_is_present(self, monkeypatch):
        from llm_pretraining_data_pipeline_spark import queries_ext as QX
        from llm_pretraining_data_pipeline_spark.sources import br

        class _FakeCompressor:
            def compress(self, body):
                return b"CBR:" + bytes(body)

        monkeypatch.setattr(br, "_EXT_CACHE", _FakeCompressor())
        assert QX._real_br_encode(b"page body") == b"CBR:page body"
