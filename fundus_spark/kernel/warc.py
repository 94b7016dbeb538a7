"""From-scratch WARC/1.0 reading + writing (no warcio/fastwarc).

The reference's CC-NEWS source streams ``.warc.gz`` files through
``fastwarc.ArchiveIterator`` filtered to response records, takes the
URL from the ``WARC-Target-URI`` header, and decodes the HTTP body via
its declared charset (``scraping/html.py:269-306``). This module
reimplements that consumption over STORED bytes: multi-member gzip
(one member per record, the CC-NEWS layout), WARC header block, HTTP
response parsing, charset from Content-Type with a utf-8/replace
fallback (chardet is unavailable here — a decode failure degrades, it
never drops the record silently).
"""

from __future__ import annotations

import gzip
import io
import re
from typing import Iterator, List, Optional, Tuple

_CHARSET_RE = re.compile(r"charset=([A-Za-z0-9_\-]+)", re.I)


class WarcRecord:
    __slots__ = ("record_type", "target_uri", "warc_date", "record_id", "http_status", "content_type", "body")

    def __init__(self, record_type, target_uri, warc_date, record_id, http_status, content_type, body):
        self.record_type = record_type
        self.target_uri = target_uri
        self.warc_date = warc_date
        self.record_id = record_id
        self.http_status = http_status
        self.content_type = content_type
        self.body = body  # decoded str for response records


def _ungzip_all(data: bytes) -> bytes:
    """Decompress a (possibly multi-member) gzip stream member by
    member; pass through uncompressed input. A truncated or corrupt
    tail yields whatever decompressed cleanly — stored crawls truncate,
    and a bad final member must not discard the good records."""
    if data[:2] != b"\x1f\x8b":
        return data
    import zlib

    out = bytearray()
    pos = 0
    while pos < len(data) and data[pos : pos + 2] == b"\x1f\x8b":
        d = zlib.decompressobj(31)
        try:
            out += d.decompress(data[pos:])
        except zlib.error:
            break
        if not d.eof:  # truncated member
            break
        pos = len(data) - len(d.unused_data)
    return bytes(out)


def _parse_headers(block: bytes) -> dict:
    headers: dict = {}
    for line in block.split(b"\r\n"):
        if b":" in line:
            key, _, value = line.partition(b":")
            headers[key.strip().lower().decode("latin-1")] = value.strip().decode("latin-1")
    return headers


def iter_warc_records(data: bytes) -> Iterator[WarcRecord]:
    """Yield records from raw WARC bytes. Malformed trailing garbage
    ends iteration rather than raising (stored crawls truncate)."""
    raw = _ungzip_all(data)
    pos = 0
    n = len(raw)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and raw[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            return
        if not raw[pos:].startswith(b"WARC/"):
            return
        header_end = raw.find(b"\r\n\r\n", pos)
        if header_end < 0:
            return
        headers = _parse_headers(raw[pos:header_end])
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            return
        body_start = header_end + 4
        payload = raw[body_start : body_start + length]
        pos = body_start + length
        record_type = headers.get("warc-type", "")
        status, ctype, text = None, None, None
        if record_type == "response":
            status, ctype, text = _parse_http_response(payload)
        yield WarcRecord(
            record_type=record_type,
            target_uri=headers.get("warc-target-uri"),
            warc_date=headers.get("warc-date"),
            record_id=headers.get("warc-record-id"),
            http_status=status,
            content_type=ctype,
            body=text,
        )


def _parse_http_response(payload: bytes) -> Tuple[Optional[int], Optional[str], Optional[str]]:
    head, _, body = payload.partition(b"\r\n\r\n")
    lines = head.split(b"\r\n")
    status: Optional[int] = None
    if lines and lines[0].startswith(b"HTTP/"):
        parts = lines[0].split()
        if len(parts) >= 2 and parts[1].isdigit():
            status = int(parts[1])
    http_headers = _parse_headers(b"\r\n".join(lines[1:]))
    ctype = http_headers.get("content-type")
    charset = None
    if ctype and (m := _CHARSET_RE.search(ctype)):
        charset = m.group(1)
    try:
        text = body.decode(charset or "utf-8")
    except (UnicodeDecodeError, LookupError):
        # chardet unavailable here: degrade to replacement decoding
        # (reference falls back to chardet, then logs and drops)
        text = body.decode("utf-8", errors="replace")
    return status, ctype, text


def warc_response_records(data: bytes) -> List[WarcRecord]:
    """The reference's consumption shape: response records only
    (fastwarc ``record_types=WarcRecordType.response``)."""
    return [r for r in iter_warc_records(data) if r.record_type == "response"]


# --- writer (test/bench synthesis; one gzip member per record like CC-NEWS) --


def build_warc(records: List[Tuple[str, str, str]], compress: bool = True) -> bytes:
    """records = [(target_uri, warc_date_iso, html_body)] -> WARC bytes."""
    out = io.BytesIO()
    for idx, (uri, date, html) in enumerate(records):
        body = html.encode("utf-8")
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
            + f"Content-Length: {len(body)}\r\n\r\n".encode()
            + body
        )
        header = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Record-ID: <urn:uuid:{idx:032d}>\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            f"WARC-Date: {date}\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode()
        member = header + http + b"\r\n\r\n"
        if compress:
            out.write(gzip.compress(member, mtime=0))
        else:
            out.write(member)
    return out.getvalue()
