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
scan. Replacement order is fixed (email, then IPv4, then phone), and
each class is COUNTED on the text as it stands when its replacement
runs, so counts always reconcile with the placeholder tokens in the
output even where the pattern classes overlap (a 9-digit run inside an
email local part belongs to the email pass, not the phone pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_PATTERN = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
# Four alternates, leftmost-first in both Java regex and RE2:
#   +4930123456789            compact international
#   +49 30 1234567            separated international (space/dot/dash)
#   (555) 867-5309            US parenthesized area code
#   555-867-5309 / 555.867.5309  US dashed/dotted national
# National formats run AFTER the IPv4 pass, so dotted-quad addresses
# are already <IP> placeholders and cannot be half-eaten as phones.
PHONE_PATTERN = (
    r"(?:\+\d{9,15}\b"
    r"|\+\d{1,3}[ .-]\d{2,4}[ .-]\d{5,10}\b"
    r"|\(\d{3}\) ?\d{3}-\d{4}\b"
    r"|\b\d{3}[.-]\d{3}[.-]\d{4}\b)"
)


def pii_scrub(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Returns ``(doc_id, clean_text, n_emails, n_ips, n_phones)`` with
    each PII class replaced by a typed placeholder token.

    Each count is taken on the text as it stands when that class's
    replacement runs (emails on the original, IPs after the email pass,
    phones after both), so every count equals the number of its
    placeholder tokens in ``clean_text`` even when patterns overlap —
    e.g. a 9-digit run inside an email local part is consumed by the
    email pass and correctly NOT counted as a phone."""
    def _count(col, pattern: str):
        # group index 0 (whole match) must be explicit in Spark
        return F.size(F.regexp_extract_all(col, F.lit(pattern), 0)).cast("long")

    col = F.col(text_col)
    after_email = F.regexp_replace(col, EMAIL_PATTERN, "<EMAIL>")
    after_ip = F.regexp_replace(after_email, IPV4_PATTERN, "<IP>")
    clean = F.regexp_replace(after_ip, PHONE_PATTERN, "<PHONE>")
    return df.select(
        F.col(id_col).alias("doc_id"),
        clean.alias("clean_text"),
        _count(col, EMAIL_PATTERN).alias("n_emails"),
        _count(after_email, IPV4_PATTERN).alias("n_ips"),
        _count(after_ip, PHONE_PATTERN).alias("n_phones"),
    )
