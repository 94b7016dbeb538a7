"""From-scratch minimal PDF text extraction (stdlib only).

The north rule includes "PDF/layout parse" next to HTML boilerplate
stripping. No PDF library is available in this environment, so this
module implements the subset needed to extract text from
straightforwardly-encoded PDFs:

* object scan: ``N G obj ... endobj`` (no xref walk — tolerant of
  broken/linearized files, like production text extractors)
* streams: raw or ``/FlateDecode`` (zlib); other filters are skipped
* content streams: tokens inside ``BT``/``ET`` text blocks —
  literal strings ``(...)`` with escape sequences and line
  continuations, hex strings ``<...>``, and the text-showing
  operators ``Tj``, ``'``, ``"``, ``TJ`` (kerning arrays)
* layout heuristic: ``Td``/``TD``/``T*`` with a vertical move and the
  ``'``/``"`` operators start a new line; chunks shown on one line are
  joined directly (the writer in ``sources/pdf_gen.py`` and common
  generators emit one ``Tj`` per line)

Out of scope (skipped silently, never raising): CMap/ToUnicode
remapping, CID fonts, encryption, object streams. ``extract_pdf_text``
on a non-PDF returns ``""``.
"""

from __future__ import annotations

import re
import zlib
from typing import List

__all__ = ["extract_pdf_text", "iter_content_streams"]

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b(.*?)endobj", re.S)
_STREAM_START_RE = re.compile(rb"stream(\r\n|\n|\r)")
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.S)
_FLATE_RE = re.compile(rb"/Filter\s*(?:\[\s*)?/FlateDecode")
_FILTER_RE = re.compile(rb"/Filter\s*(?:\[\s*)?/(\w+)")
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)\b(?!\s+\d+\s+R)")


def _stream_bytes(body: bytes, data: bytes = b"", body_offset: int = 0) -> tuple:
    """(head_dict, raw_stream) or (None, None).

    Prefers slicing exactly ``/Length`` bytes after the ``stream`` EOL —
    binary payloads legitimately END with 0x0D, which an
    optional-\\r-before-endstream regex would eat (1-byte truncation,
    zlib error -5). When ``data``/``body_offset`` are given, the
    /Length slice is taken from the FULL file at the stream's absolute
    offset: the lazy ``(.*?)endobj`` in _OBJ_RE truncates any object
    whose binary payload contains the bytes ``endobj``, so slicing from
    the truncated body would overrun and silently lose that stream.
    Falls back to the endstream regex when /Length is absent or an
    indirect reference."""
    sm = _STREAM_START_RE.search(body)
    if sm is None:
        return None, None
    head = body[: sm.start()]
    start = sm.end()
    lm = _LENGTH_RE.search(head)
    if lm is not None:
        length = int(lm.group(1))
        if data:
            abs_start = body_offset + start
            if abs_start + length <= len(data):
                return head, data[abs_start : abs_start + length]
        elif start + length <= len(body):
            return head, body[start : start + length]
    fallback = _STREAM_RE.search(body)
    if fallback is None:
        return head, None
    return head, fallback.group(1)


def iter_content_streams(data: bytes) -> List[bytes]:
    """Decoded candidate content streams in object order."""
    streams: List[bytes] = []
    for obj in _OBJ_RE.finditer(data):
        head, raw = _stream_bytes(obj.group(3), data=data, body_offset=obj.start(3))
        if raw is None:
            continue
        filt = _FILTER_RE.search(head)
        if filt is None:
            streams.append(raw)
        elif _FLATE_RE.search(head):
            try:
                streams.append(zlib.decompress(raw))
            except zlib.error:
                continue
        # other filters (DCT, LZW, ...): not text content for us — skip
    return streams


_ESCAPES = {
    b"n": b"\n",
    b"r": b"\r",
    b"t": b"\t",
    b"b": b"\b",
    b"f": b"\f",
    b"(": b"(",
    b")": b")",
    b"\\": b"\\",
}


def _parse_literal(stream: bytes, i: int) -> tuple:
    """Parse a ``(...)`` literal starting at ``i`` (which points at the
    opening paren). Returns (bytes, next_index)."""
    out = bytearray()
    depth = 1
    i += 1
    n = len(stream)
    while i < n and depth:
        c = stream[i : i + 1]
        if c == b"\\":
            nxt = stream[i + 1 : i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
            elif nxt.isdigit():  # octal \ddd (1-3 digits)
                j = i + 1
                digits = b""
                while j < n and len(digits) < 3 and stream[j : j + 1].isdigit():
                    digits += stream[j : j + 1]
                    j += 1
                out.append(int(digits, 8) & 0xFF)
                i = j
            elif nxt in (b"\n", b"\r"):  # line continuation
                i += 2
                if nxt == b"\r" and stream[i : i + 1] == b"\n":
                    i += 1
            else:
                out += nxt
                i += 2
        elif c == b"(":
            depth += 1
            out += c
            i += 1
        elif c == b")":
            depth -= 1
            if depth:
                out += c
            i += 1
        else:
            out += c
            i += 1
    return bytes(out), i


def _parse_hex(stream: bytes, i: int) -> tuple:
    j = stream.find(b">", i)
    if j == -1:
        return b"", len(stream)
    hexdigits = re.sub(rb"\s", b"", stream[i + 1 : j])
    if len(hexdigits) % 2:
        hexdigits += b"0"
    try:
        return bytes.fromhex(hexdigits.decode("ascii")), j + 1
    except ValueError:
        return b"", j + 1


_NUM_RE = re.compile(rb"[-+]?\d*\.?\d+")
_OP_RE = re.compile(rb"[A-Za-z'\"*]+")


def _decode(raw: bytes) -> str:
    # PDFDocEncoding ~ latin-1 for the printable range; utf-16 BOM honored
    if raw[:2] in (b"\xfe\xff", b"\xff\xfe"):
        try:
            return raw.decode("utf-16")
        except UnicodeDecodeError:
            return raw.decode("latin-1", errors="replace")
    return raw.decode("latin-1", errors="replace")


def _extract_stream_text(stream: bytes) -> List[str]:
    """Text lines shown by one content stream."""
    lines: List[str] = []
    current: List[str] = []
    in_text = False
    pending: List[bytes] = []  # string operands awaiting an operator
    pending_nums: List[float] = []
    i = 0
    n = len(stream)

    def flush_line() -> None:
        if current:
            lines.append("".join(current))
            current.clear()

    while i < n:
        c = stream[i : i + 1]
        if c in b" \t\r\n\x00":
            i += 1
            continue
        if c == b"(":
            s, i = _parse_literal(stream, i)
            pending.append(s)
            continue
        if c == b"<":
            if stream[i + 1 : i + 2] == b"<":  # dictionary
                i += 2
                continue
            s, i = _parse_hex(stream, i)
            pending.append(s)
            continue
        if c == b"[":
            # TJ array: collect strings, ignore kerning numbers
            j = i + 1
            parts: List[bytes] = []
            while j < n and stream[j : j + 1] != b"]":
                cj = stream[j : j + 1]
                if cj == b"(":
                    s, j = _parse_literal(stream, j)
                    parts.append(s)
                elif cj == b"<":
                    s, j = _parse_hex(stream, j)
                    parts.append(s)
                else:
                    j += 1
            pending.append(b"".join(parts))
            i = j + 1
            continue
        m = _NUM_RE.match(stream, i)
        if m:
            try:
                pending_nums.append(float(m.group()))
            except ValueError:
                pass
            i = m.end()
            continue
        m = _OP_RE.match(stream, i)
        if m:
            op = m.group()
            i = m.end()
            if op == b"BT":
                in_text = True
                pending.clear()
                pending_nums.clear()
                continue
            if op == b"ET":
                flush_line()
                in_text = False
                pending.clear()
                pending_nums.clear()
                continue
            if not in_text:
                pending.clear()
                pending_nums.clear()
                continue
            if op == b"Tj" or op == b"TJ":
                if pending:
                    current.append(_decode(pending[-1]))
            elif op in (b"'", b'"'):
                flush_line()
                if pending:
                    current.append(_decode(pending[-1]))
            elif op in (b"Td", b"TD"):
                # vertical move -> new line (ty != 0)
                if len(pending_nums) >= 2 and pending_nums[-1] != 0:
                    flush_line()
            elif op == b"T*":
                flush_line()
            elif op == b"Tm":
                flush_line()
            pending.clear()
            pending_nums.clear()
            continue
        i += 1  # unknown byte: skip

    flush_line()
    return lines


def extract_pdf_text(data: bytes) -> str:
    """All text lines of the document, pages/streams separated by
    newlines. Non-PDF input yields ``""``."""
    if not data.startswith(b"%PDF"):
        return ""
    lines: List[str] = []
    for stream in iter_content_streams(data):
        lines.extend(_extract_stream_text(stream))
    return "\n".join(lines)
