"""Deterministic minimal PDF writer (fixture generator).

Produces small, valid single-or-multi-page PDFs (Flate-compressed
content streams, proper xref) so the PDF extraction path can be tested
and benchmarked without external data. Pure stdlib; layout is one
``Tj`` per line with ``TD`` line advances — the common shape emitted by
real-world generators.
"""

from __future__ import annotations

import zlib
from typing import List, Sequence

__all__ = ["build_pdf", "pdf_escape"]


def pdf_escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _content_stream(lines: Sequence[str]) -> bytes:
    ops = ["BT", "/F1 12 Tf", "72 720 Td"]
    for k, line in enumerate(lines):
        if k:
            ops.append("0 -14 TD")
        ops.append(f"({pdf_escape(line)}) Tj")
    ops.append("ET")
    return "\n".join(ops).encode("latin-1", errors="replace")


def build_pdf(pages: Sequence[Sequence[str]]) -> bytes:
    """``pages``: list of pages, each a list of text lines."""
    objects: List[bytes] = []

    n_pages = len(pages)
    # object numbering: 1 catalog, 2 pages, 3 font, then per page:
    # (4 + 2i) page, (5 + 2i) content
    kids = " ".join(f"{4 + 2 * i} 0 R" for i in range(n_pages))
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objects.append(f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode())
    objects.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    for i, lines in enumerate(pages):
        objects.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 3 0 R >> >> /Contents {5 + 2 * i} 0 R >>"
            ).encode()
        )
        data = zlib.compress(_content_stream(lines))
        objects.append(
            b"<< /Length " + str(len(data)).encode() + b" /Filter /FlateDecode >>\nstream\n" + data + b"\nendstream"
        )

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for num, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_pos = len(out)
    out += f"xref\n0 {len(objects) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objects) + 1} /Root 1 0 R >>\nstartxref\n{xref_pos}\n%%EOF\n"
    ).encode()
    return bytes(out)
