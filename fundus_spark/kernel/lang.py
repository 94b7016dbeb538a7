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
from .langdata import (
    BG_CHARS,
    CYRILLIC_RANGE,
    DEVANAGARI_MARKERS,
    FA_CHARS,
    MK_CHARS,
    RU_CHARS,
    RU_NOT_BG_CHARS,
    SCRIPT_RANGES,
    SIBLING_CHARGRAMS,
    SIBLING_MARKERS,
    STOPWORDS,
    UK_CHARS,
    UR_CHARS,
    VI_CHARS,
)

__all__ = ["detect_language", "html_lang", "heuristic_language", "script_language"]

_WORD_RE = re.compile(r"\w+", re.UNICODE)

_SCRIPT_RES = [(code, re.compile(f"[{ranges}]")) for code, ranges in SCRIPT_RANGES]
_CYRILLIC_RE = re.compile(f"[{CYRILLIC_RANGE[0]}-{CYRILLIC_RANGE[1]}]")
# one-pass gate: the union of every script range above. The common case
# (Latin text) pays ONE regex scan instead of len(SCRIPT_RES)+1 — this
# runs per document inside the extraction stage, so it is hot.
_ANY_SCRIPT_RE = re.compile(
    "[" + "".join(r for _, r in SCRIPT_RANGES) + f"{CYRILLIC_RANGE[0]}-{CYRILLIC_RANGE[1]}]"
)


def script_language(text: str, min_hits: int = 10) -> Optional[str]:
    """Unicode-script vote for non-Latin scripts (deterministic:
    ranges checked in fixed order; kana beats han so ja beats zh on
    mixed text). Shared scripts get a second-stage vote: Devanagari
    splits hi/mr/ne by function-word markers (hi default), Arabic
    script splits ar/fa/ur by orthography-unique letters (Urdu checked
    first — Persian's extra letters all exist in Urdu), and Cyrillic
    splits ru/uk/bg/mk by orthography-unique letters."""
    sample = text[:4000]
    if _ANY_SCRIPT_RE.search(sample):  # rare path: some non-Latin script present
        for code, pattern in _SCRIPT_RES:
            if len(pattern.findall(sample)) >= min_hits:
                if code == "hi":
                    return _devanagari_language(sample)
                if code == "ar":
                    return _arabic_script_language(sample)
                return code
        if len(_CYRILLIC_RE.findall(sample)) >= min_hits:
            return _cyrillic_language(sample)
    if sum(1 for ch in sample if ch in VI_CHARS) >= min_hits:
        return "vi"
    return None


def _devanagari_language(sample: str) -> str:
    tallies = [
        (code, sum(sample.count(m) for m in markers)) for code, markers in DEVANAGARI_MARKERS
    ]
    best = max(tallies, key=lambda kv: kv[1])
    return best[0] if best[1] > 0 else "hi"


def _arabic_script_language(sample: str) -> str:
    # Urdu first: its retroflex/do-chashmi letters are unique, while
    # Persian's پ/چ/ژ/گ also occur in Urdu text.
    if sum(1 for ch in sample if ch in UR_CHARS) >= 2:
        return "ur"
    if sum(1 for ch in sample if ch in FA_CHARS) >= 2:
        return "fa"
    return "ar"


def _cyrillic_language(sample: str) -> str:
    if sum(1 for ch in sample if ch in MK_CHARS) >= 2:
        return "mk"
    uk = sum(1 for ch in sample if ch in UK_CHARS)
    ru = sum(1 for ch in sample if ch in RU_CHARS)
    if uk > ru:
        return "uk"
    # Bulgarian reads ъ as a frequent vowel; Russian text always shows
    # ы/э/ё long before its rare separator-ъ appears.
    if (
        sum(1 for ch in sample if ch in BG_CHARS) >= 2
        and sum(1 for ch in sample if ch in RU_NOT_BG_CHARS) == 0
    ):
        return "bg"
    return "ru"


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
    """Script vote first (CJK/Cyrillic/Hebrew/Greek/Thai/Arabic/viet
    diacritics), then stopword-density vote over the function-word
    lists; None when nothing scores (the reference returns None on
    detector failure)."""
    if not text:
        return None
    if script := script_language(text):
        return script
    words = [w.lower() for w in _WORD_RE.findall(text)]
    if not words:
        return None
    # count words ONCE, then score each profile over its own (small)
    # word list: O(words + profiles*|list|) instead of O(words*profiles)
    # — identical scores, ~10x less work now that there are 34 profiles
    counts: dict = {}
    for w in words:
        counts[w] = counts.get(w, 0) + 1
    scores = [(code, sum(counts.get(w, 0) for w in stop)) for code, stop in STOPWORDS]
    ranked = sorted(scores, key=lambda kv: -kv[1])  # stable: profile order breaks equal scores
    best_code, best_score = ranked[0]
    if best_score == 0:
        return None
    if len(ranked) > 1 and ranked[1][1] >= max(best_score - 1, 1):
        # near-tie between the top two profiles
        pair = frozenset({best_code, ranked[1][0]})
        if (winner := _sibling_vote(pair, words, text)) is not None:
            return winner
        # overlapping function-word lists (la/de/le) can tie. A WEAK
        # near-tie is an ambiguous detection -> None (not a list-order
        # coin flip); a STRONG exact tie without a sibling profile
        # resolves deterministically by profile order.
        if ranked[1][1] == best_score and best_score < 5:
            return None
    return best_code


def _sibling_vote(pair: frozenset, words: list, text: str) -> Optional[str]:
    """Second-stage vote for sibling languages whose function words
    overlap (da/no): orthography-divergent cognate markers + the
    øj/øy digraph — the from-scratch stand-in for langdetect's
    character n-gram profiles on this pair."""
    for codes, markers in SIBLING_MARKERS:
        if codes != pair:
            continue
        tallies = {code: sum(1 for w in words if w in marker_set) for code, marker_set in markers.items()}
        for grams_pair, grams in SIBLING_CHARGRAMS:
            if grams_pair == pair:
                sample = text[:4000].lower()
                for code, substrings in grams.items():
                    tallies[code] = tallies.get(code, 0) + sum(sample.count(g) for g in substrings)
        ranked = sorted(tallies.items(), key=lambda kv: -kv[1])
        if ranked[0][1] > ranked[1][1]:
            return ranked[0][0]
        return None  # markers silent -> genuinely ambiguous
    return None


def detect_language(doc: Element, plaintext: Optional[str]) -> Optional[str]:
    return html_lang(doc) or heuristic_language(plaintext)
