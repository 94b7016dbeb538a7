"""Language detection for extracted articles.

The reference computes ``Article.lang`` with seeded langdetect and
falls back to the ``<html lang>`` attribute prefix
(``src/fundus/scraping/article.py:96-112``). langdetect is not
available in this environment, so the order is inverted — the
deterministic ``<html lang>`` declaration (present on virtually every
publisher page and equal to langdetect's answer there) is primary, and
a stopword-density n-gram heuristic over the plaintext is the fallback.
The divergence is documented here on purpose: same column contract,
different estimator when the page carries no declaration.
"""

from __future__ import annotations

import re
from typing import Optional

from .dom import Element

__all__ = ["detect_language", "html_lang", "heuristic_language"]

_WORD_RE = re.compile(r"\w+", re.UNICODE)

_STOPWORDS = {
    "en": frozenset("the a an of and to in is it that was for on are as with his they at be this have from".split()),
    "de": frozenset("der die das und ist ein eine zu den von mit im für auf des sich nicht werden dem".split()),
    "es": frozenset("el la de que y en un una es se no los las por con para del al como".split()),
    "fr": frozenset("le la les des un une et est dans que pour sur pas plus par au il ne ce".split()),
    "it": frozenset("il la le di che e in un una è per non con del si da sono come".split()),
}


def html_lang(doc: Element) -> Optional[str]:
    """``<html lang>`` prefix, e.g. 'en-US' -> 'en' (the reference's
    fallback path, article.py:105-112)."""
    root = doc
    while root.getparent() is not None:
        root = root.getparent()
    if root.tag != "html":
        for node in root.iter():
            if node.tag == "html":
                root = node
                break
    if value := root.get("lang"):
        return value.split("-")[0].lower() or None
    return None


def heuristic_language(text: Optional[str]) -> Optional[str]:
    """Stopword-density vote over the function-word lists; None when no
    list scores a hit (the reference returns None on detector failure)."""
    if not text:
        return None
    words = [w.lower() for w in _WORD_RE.findall(text)]
    if not words:
        return None
    scores = {code: sum(1 for w in words if w in stop) for code, stop in _STOPWORDS.items()}
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    best_code, best_score = ranked[0]
    if best_score == 0:
        return None
    # overlapping function-word lists (la/de/le) can tie; a tie is an
    # ambiguous detection, not a dict-insertion-order coin flip
    if len(ranked) > 1 and ranked[1][1] == best_score:
        return None
    return best_code


def detect_language(doc: Element, plaintext: Optional[str]) -> Optional[str]:
    return html_lang(doc) or heuristic_language(plaintext)
