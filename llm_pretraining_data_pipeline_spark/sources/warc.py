"""Pure-stdlib WARC (ISO 28500) record reader for web-archive ingestion.

CommonCrawl — the substrate of every public pretraining corpus — ships as
WARC files: concatenated records, each a ``WARC/1.x`` version line, CRLF
header block, ``Content-Length``-delimited payload, and a blank-line
separator. A 100 TB crawl ingest is embarrassingly parallel at FILE
granularity: each executor slices its blob into records locally, no
shuffle until the records join the pipeline. ``warc_records`` is that
step — Arrow-batched ``mapInPandas`` exploding one binary blob into one
row per record, the fan-out shape (1 blob → N rows) the other media
operators don't exercise.

The parser is strict the way the codec trio (png/wav/mp4/jpeg) is strict:
the version line must be WARC/1.0 or WARC/1.1, every header line must
contain a colon, ``Content-Length`` is mandatory and validated against
the physical buffer BEFORE the payload slice, the record terminator
(CRLF CRLF) is required, and a header-count cap bounds hostile inputs.
Malformed blobs surface as ``parse_ok=false`` rows with the exact error —
never a partial record list.

``encode_warc`` builds records from closed-form parameters so ingestion
is verified end-to-end (encode → parse → per-record stats recomputed
independently by the DuckDB referee in ``src_warc_records``).
"""

from __future__ import annotations

_CRLF = b"\r\n"
_MAX_HEADERS = 64


def parse_header_lines(
    lines: list[bytes],
    max_headers: int = _MAX_HEADERS,
    merge_repeats: bool = False,
    ctx: str = "parse_warc",
) -> dict[str, str]:
    """Shared strict header-block parser for the WARC and HTTP readers
    (round-10 review: the two loops had drifted — different cap semantics
    and repeat handling — so fixes to one missed the other).

    The cap counts LINES, not distinct keys, so a hostile payload
    repeating one field name millions of times cannot bypass it (and the
    repeated-field merge below stays O(cap²) worst case, not O(n²)).
    Leading-whitespace continuation lines (obs-fold) are rejected —
    RFC 9112 §5.2 says reject or replace, and WARC has no folding at
    all. ``merge_repeats=True`` merges repeated field names into a comma
    list (RFC 9110 §5.2, the HTTP semantics); ``False`` keeps
    last-wins (the WARC reader's historical behavior).
    """
    headers: dict[str, str] = {}
    for n, line in enumerate(lines):
        if n >= max_headers:
            raise ValueError(f"{ctx}: too many header lines")
        if line[:1] in (b" ", b"\t"):
            raise ValueError(
                f"{ctx}: obs-fold continuation line {line[:40]!r}"
            )
        colon = line.find(b":")
        if colon < 1:
            raise ValueError(
                f"{ctx}: header line without colon {line[:40]!r}"
            )
        key = line[:colon].decode("latin-1").strip().lower()
        val = line[colon + 1 :].decode("latin-1").strip()
        if merge_repeats and key in headers:
            headers[key] = headers[key] + ", " + val
        else:
            headers[key] = val
    return headers


def encode_warc_record(
    warc_type: str,
    target_uri: str,
    record_id: str,
    payload: bytes,
    extra_headers: tuple = (),
) -> bytes:
    """One spec-shaped record: version line, headers, payload, separator.

    ``extra_headers`` — ``(name, value)`` pairs emitted verbatim before
    ``Content-Length`` (how fixtures stamp WARC-Payload-Digest /
    WARC-Refers-To-* / WARC-Truncated onto revisit and truncated-capture
    records).
    """
    headers = [
        b"WARC/1.0",
        b"WARC-Type: " + warc_type.encode("ascii"),
        b"WARC-Target-URI: " + target_uri.encode("ascii"),
        b"WARC-Record-ID: <urn:uuid:" + record_id.encode("ascii") + b">",
    ]
    for name, value in extra_headers:
        headers.append(
            name.encode("ascii") + b": " + value.encode("latin-1")
        )
    headers.append(b"Content-Length: " + str(len(payload)).encode("ascii"))
    return _CRLF.join(headers) + _CRLF + _CRLF + payload + _CRLF + _CRLF


def encode_warc(records: list[tuple]) -> bytes:
    """Concatenate records — each ``(warc_type, target_uri, record_id,
    payload)`` with an optional 5th ``extra_headers`` element."""
    return b"".join(encode_warc_record(*r) for r in records)


def parse_warc(data: bytes) -> list[dict]:
    """Parse a WARC blob into records.

    Returns ``[{warc_type, target_uri, record_id, content_length,
    payload, offset, record_bytes}, ...]`` in file order — ``offset`` is
    the record's byte position in ``data`` and ``record_bytes`` its full
    serialized size including the terminator (the (offset, length) pair a
    CDX index stores so a reader can range-fetch one record). Raises
    ``ValueError`` on anything malformed: bad version line, header
    without a colon, missing Content-Length, payload running past the
    buffer, missing record terminator, or trailing garbage.
    """
    records = []
    pos = 0
    n = len(data)
    while pos < n:
        rec_start = pos
        ver_end = data.find(_CRLF, pos)
        if ver_end < 0:
            raise ValueError("parse_warc: truncated version line")
        version = data[pos:ver_end]
        if version not in (b"WARC/1.0", b"WARC/1.1"):
            raise ValueError(
                f"parse_warc: bad version line {version[:20]!r} "
                f"at offset {pos}"
            )
        pos = ver_end + 2
        header_lines: list[bytes] = []
        while True:
            line_end = data.find(_CRLF, pos)
            if line_end < 0:
                raise ValueError("parse_warc: truncated header block")
            line = data[pos:line_end]
            pos = line_end + 2
            if not line:  # blank line ends the header block
                break
            if len(header_lines) >= _MAX_HEADERS:
                raise ValueError("parse_warc: too many header lines")
            header_lines.append(line)
        headers = parse_header_lines(header_lines, ctx="parse_warc")
        if "content-length" not in headers:
            raise ValueError("parse_warc: missing Content-Length header")
        try:
            length = int(headers["content-length"])
        except ValueError:
            raise ValueError(
                f"parse_warc: non-numeric Content-Length "
                f"{headers['content-length']!r}"
            ) from None
        if length < 0:
            raise ValueError(f"parse_warc: negative Content-Length {length}")
        if pos + length + 4 > n:
            raise ValueError(
                f"parse_warc: payload declares {length} bytes, "
                f"{n - pos} remain (incl. terminator)"
            )
        payload = data[pos : pos + length]
        pos += length
        if data[pos : pos + 4] != _CRLF + _CRLF:
            raise ValueError("parse_warc: missing record terminator")
        pos += 4
        records.append(
            {
                "warc_type": headers.get("warc-type"),
                "target_uri": headers.get("warc-target-uri"),
                "record_id": headers.get("warc-record-id"),
                "content_length": length,
                "payload": payload,
                "offset": rec_start,
                "record_bytes": pos - rec_start,
                # full lowercased header map — what warc_records' optional
                # ``headers=`` projection reads (revisit digests, WARC-Date,
                # WARC-Truncated); bounded by _MAX_HEADERS per record.
                "headers": headers,
            }
        )
    if not records:
        raise ValueError("parse_warc: empty blob")
    return records


def encode_warc_gz(records: list[tuple[str, str, str, bytes]]) -> bytes:
    """CommonCrawl-convention compressed WARC: each record is its OWN gzip
    member (mtime=0 for determinism), members concatenated — this is what
    makes .warc.gz files record-seekable without decompressing the file."""
    import gzip

    return b"".join(
        gzip.compress(encode_warc_record(*r), mtime=0) for r in records
    )


def gunzip_members(data: bytes, max_member_bytes: int = 1 << 26) -> list[bytes]:
    """Split a concatenated-gzip-member blob and inflate each member.

    Bounded the way ``png.py`` bounds IDAT inflation: a member whose
    decompressed size exceeds ``max_member_bytes`` raises BEFORE the
    allocation grows past the cap (decompression-bomb guard), a truncated
    member (no deflate final block / CRC trailer) raises via the missing
    ``eof``, and trailing garbage raises rather than being ignored.
    """
    import zlib

    members: list[bytes] = []
    pos = 0
    n = len(data)
    while pos < n:
        dec = zlib.decompressobj(wbits=31)  # gzip wrapper
        try:
            out = dec.decompress(data[pos:], max_member_bytes + 1)
        except zlib.error as exc:
            raise ValueError(
                f"gunzip: bad gzip member at offset {pos}: {exc}"
            ) from None
        if len(out) > max_member_bytes:
            raise ValueError(
                f"gunzip: member at offset {pos} inflates past "
                f"{max_member_bytes} bytes"
            )
        if not dec.eof:
            raise ValueError(f"gunzip: truncated member at offset {pos}")
        members.append(out)
        consumed = (n - pos) - len(dec.unused_data)
        if consumed <= 0:
            raise ValueError(f"gunzip: no progress at offset {pos}")
        pos += consumed
    if not members:
        raise ValueError("gunzip: empty blob")
    return members


def parse_warc_gz(data: bytes, max_member_bytes: int = 1 << 26) -> list[dict]:
    """Parse a .warc.gz blob (concatenated gzip members) into records.

    ``offset``/``record_bytes`` are positions within each INFLATED
    member (CC convention stores compressed member offsets instead; the
    member boundary is the range-fetch unit for .warc.gz)."""
    records: list[dict] = []
    for member in gunzip_members(data, max_member_bytes=max_member_bytes):
        records.extend(parse_warc(member))
    return records


def warc_records(
    df,
    payload_col: str = "payload",
    id_col: str = "file_id",
    gzipped: bool = False,
    passthrough: tuple = (),
    headers: tuple = (),
):
    """Explode WARC blobs into one row per record (Arrow mapInPandas).

    Input: ``(id_col, payload_col binary)``. Output one row per parsed
    record — ``rec_index`` is the record's position within its blob —
    plus a single ``parse_ok=false`` row (NULL record fields, exact error
    string) for blobs that fail to parse, so ingestion errors are data,
    not exceptions, at 100 TB. With ``gzipped=True`` blobs are
    CommonCrawl-style .warc.gz (one gzip member per record), inflated
    with the bounded-member guard before parsing.

    ``passthrough`` — input column names replicated verbatim onto every
    emitted row (appended after ``parse_err``, input types preserved).
    What a selective reader threads its original record identity
    through, and what a filename/shard column rides along on.

    ``headers`` — WARC header NAMES (case-insensitive) projected as
    extra string columns, each named by the lowercased header with
    ``-`` → ``_`` (``"WARC-Payload-Digest"`` → ``warc_payload_digest``);
    null where the record lacks the header. What revisit resolution
    (``sources.cdx.resolve_revisits``) and truncation audits read
    without re-parsing payload bytes.
    """
    import pandas as pd

    passthrough = [c for c in passthrough]
    hdr_keys = [h.lower() for h in headers]
    hdr_cols = [k.replace("-", "_") for k in hdr_keys]
    fields = {f.name: f for f in df.schema.fields}
    extra_ddl = "".join(
        f", {name} {fields[name].dataType.simpleString()}"
        for name in passthrough
    ) + "".join(f", {c} string" for c in hdr_cols)
    schema = (
        f"{id_col} bigint, rec_index int, warc_type string, "
        "target_uri string, record_id string, content_length bigint, "
        "payload binary, offset bigint, record_bytes bigint, "
        "parse_ok boolean, parse_err string" + extra_ddl
    )

    def batches(it):
        for pdf in it:
            rows = []
            extra_series = [pdf[c] for c in passthrough]
            for fid, blob, *extras in zip(
                pdf[id_col], pdf[payload_col], *extra_series
            ):
                raw = bytes(blob) if blob is not None else b""
                try:
                    recs = parse_warc_gz(raw) if gzipped else parse_warc(raw)
                    for i, rec in enumerate(recs):
                        hvals = tuple(
                            rec["headers"].get(k) for k in hdr_keys
                        )
                        rows.append(
                            (fid, i, rec["warc_type"], rec["target_uri"],
                             rec["record_id"], rec["content_length"],
                             rec["payload"], rec["offset"],
                             rec["record_bytes"], True, None, *extras,
                             *hvals)
                        )
                except ValueError as exc:
                    rows.append(
                        (fid, None, None, None, None, None, None, None,
                         None, False, str(exc), *extras,
                         *(None,) * len(hdr_keys))
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "rec_index", "warc_type", "target_uri",
                    "record_id", "content_length", "payload", "offset",
                    "record_bytes", "parse_ok", "parse_err",
                    *passthrough, *hdr_cols,
                ],
            )

    return df.select(id_col, payload_col, *passthrough).mapInPandas(
        batches, schema=schema
    )
