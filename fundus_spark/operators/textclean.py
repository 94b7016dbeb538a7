"""Mojibake repair — the core case of ftfy's ``fix_text`` (Speer 2019,
public knowledge; run by C4/FineWeb-class cleaning pipelines): text
whose UTF-8 bytes were mis-decoded as Latin-1/Windows-1252 ("café" →
"cafÃ©", "don't" with a curly quote → "donâ€™t"). The repair is the
exact inverse: re-encode the characters as Latin-1 and decode the
bytes as UTF-8 — applied ONLY when the string provably IS
Latin-1-viewed UTF-8, so clean text (including genuine Latin-1 text
like "café") passes through byte-identical.

Detection is structural, not marker-sniffing: after folding the 27
Windows-1252-specific characters back to their 0x80–0x9F code points
(``translate`` — CP1252 mojibake like "â€™" contains e.g. € U+20AC),
the string must (a) contain only code points ≤ U+00FF, (b) match the
STRICT UTF-8 byte-structure regex over those code points (lead bytes
C2–F4 only — overlongs, surrogates and > U+10FFFF excluded, the same
sequences both engines' strict decoders accept), and (c) contain at
least one multi-byte lead — i.e. the repair would change something.
A regex-gated repair never throws: every gated string decodes.

Everything is JVM column algebra (``translate`` / ``rlike`` /
``encode`` / ``decode``) — zero shuffle, full pipelining, no UDF; the
DuckDB oracle reproduces the repair exactly (translate + the same
RE2-portable validator + per-char code-point → hex → blob → UTF-8
decode). Single-pass by design: doubly-mojibake'd text repairs one
layer per application (compose twice for ftfy's recursive behavior —
each pass is idempotent on clean output because a repaired string no
longer satisfies the gate unless it is itself mojibake).

Reference scope note: the reference decodes HTTP bodies with
headers/meta-declared charsets (src/fundus/scraping/html.py) and never
repairs already-corrupted text; this operator is part of the
training-data cleaning layer, where crawl corpora arrive pre-corrupted.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Windows-1252 0x80–0x9F: the 27 printable characters CP1252 places
#: where ISO-8859-1 has control codes (0x81/0x8D/0x8F/0x90/0x9D are
#: undefined in CP1252 and stay untouched). Folding them back makes
#: CP1252-mojibake a strict superset of Latin-1-mojibake.
_CP1252_CHARS = "€‚ƒ„…†‡ˆ‰Š‹ŒŽ‘’“”•–—˜™š›œžŸ"
_CP1252_BYTES = "\x80\x82\x83\x84\x85\x86\x87\x88\x89\x8a\x8b\x8c\x8e\x91\x92\x93\x94\x95\x96\x97\x98\x99\x9a\x9b\x9c\x9e\x9f"

#: strict UTF-8 structure over code points <= 0xFF (RFC 3629 table,
#: written with \x{..} escapes that Java regex and RE2 both accept):
#: no C0/C1 overlongs, no E0 overlongs, no ED surrogates, no F0
#: overlongs, nothing above F4 (> U+10FFFF)
_UTF8_BODY = (
    "(?:[\\x{00}-\\x{7f}]"
    "|[\\x{c2}-\\x{df}][\\x{80}-\\x{bf}]"
    "|\\x{e0}[\\x{a0}-\\x{bf}][\\x{80}-\\x{bf}]"
    "|[\\x{e1}-\\x{ec}][\\x{80}-\\x{bf}]{2}"
    "|\\x{ed}[\\x{80}-\\x{9f}][\\x{80}-\\x{bf}]"
    "|[\\x{ee}-\\x{ef}][\\x{80}-\\x{bf}]{2}"
    "|\\x{f0}[\\x{90}-\\x{bf}][\\x{80}-\\x{bf}]{2}"
    "|[\\x{f1}-\\x{f3}][\\x{80}-\\x{bf}]{3}"
    "|\\x{f4}[\\x{80}-\\x{8f}][\\x{80}-\\x{bf}]{3})*"
)
# \A/\z anchors, NOT ^/$: Java's $ matches BEFORE a final line
# terminator (\n, \r, U+0085, U+2028, U+2029), so a ^...$ gate lets
# strings with a trailing raw NEL/line-separator — or a dangling 0x85
# continuation byte from truncated mojibake — through to a decode that
# would throw MALFORMED_CHARACTER_CODING (review finding, reproduced).
# \z is the true end-of-input in Java regex; the DuckDB oracle's
# regexp_full_match is anchor-free full-match and has no such quirk.
_UTF8_FULL = "\\A" + _UTF8_BODY + "\\z"
_HAS_LEAD = "[\\x{c2}-\\x{f4}]"


def _folded(col: Column) -> Column:
    return F.translate(col, _CP1252_CHARS, _CP1252_BYTES)


def mojibake_gate(col: Column) -> Column:
    """True iff ``col`` is provably UTF-8 viewed through
    Latin-1/CP1252 AND the repair would change it (>= 1 multi-byte
    lead). Pure regex — usable as a standalone detector/filter."""
    t = _folded(col)
    return t.rlike(_UTF8_FULL) & t.rlike(_HAS_LEAD)


def fix_mojibake_col(col: Column) -> Column:
    """The repair as a single column expression: the gated fix of
    ``col``, the original byte-identical otherwise. This is what the
    curate chain inlines — a pure projection needs no join-back."""
    repaired = F.decode(F.encode(_folded(col), "ISO-8859-1"), "UTF-8")
    return F.when(mojibake_gate(col), repaired).otherwise(col)


def fix_mojibake(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """``(doc_id, fixed_text, was_fixed)``: repaired text where the
    gate holds, the original byte-identical otherwise. Zero-shuffle
    projection; compose with ``line_dedup``/the curate chain upstream
    of any shingling so repaired duplicates actually deduplicate."""
    col = F.col(text_col)
    gate = mojibake_gate(col)
    return df.select(
        F.col(id_col).alias("doc_id"),
        fix_mojibake_col(col).alias("fixed_text"),
        F.coalesce(gate, F.lit(False)).alias("was_fixed"),
    )


def make_mojibake(col: Column) -> Column:
    """The corruption this module repairs, as a column expression
    (UTF-8 bytes re-read as Latin-1) — the test/oracle generator, and
    exactly inverse to the repair for any string: useful for
    round-trip property checks."""
    return F.decode(F.encode(col, "UTF-8"), "ISO-8859-1")
