"""PII scrubbing for training corpora: redact emails, IPv4 addresses,
and international phone numbers, and count redactions per document —
the C4/RefinedWeb-style pre-training hygiene pass.

Pure ``regexp_replace``/``regexp_extract_all`` column algebra (JVM
regex, whole-stage codegen, no Python). The patterns are restricted to
constructs whose semantics are identical in Java regex and RE2-style
engines (ASCII classes, bounded quantifiers, ``\\b``, no lookarounds),
so the DuckDB oracle replays the exact same redactions — the same
portability contract as the BPE pre-tokenizer in ``textstats``.

Scale shape: a narrow per-row map — zero shuffles, pipelined into the
scan. Replacement order is fixed (email, then IPv4, then phone) so
counts and output are deterministic; counts are taken on the ORIGINAL
text, where the three pattern classes are mutually non-overlapping by
construction (emails contain no 9-digit runs or dotted quads, IPv4
octets are too short for the phone rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_PATTERN = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
PHONE_PATTERN = r"\+\d{9,15}\b"


def pii_scrub(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Returns ``(doc_id, clean_text, n_emails, n_ips, n_phones)`` with
    each PII class replaced by a typed placeholder token."""
    col = F.col(text_col)

    def _count(pattern: str):
        # group index 0 (whole match) must be explicit in Spark
        return F.size(F.regexp_extract_all(col, F.lit(pattern), 0)).cast("long")

    clean = F.regexp_replace(col, EMAIL_PATTERN, "<EMAIL>")
    clean = F.regexp_replace(clean, IPV4_PATTERN, "<IP>")
    clean = F.regexp_replace(clean, PHONE_PATTERN, "<PHONE>")
    return df.select(
        F.col(id_col).alias("doc_id"),
        clean.alias("clean_text"),
        _count(EMAIL_PATTERN).alias("n_emails"),
        _count(IPV4_PATTERN).alias("n_ips"),
        _count(PHONE_PATTERN).alias("n_phones"),
    )
