"""Publisher search / supports API — the registry-level equivalent of
the reference's ``PublisherGroup.search`` / ``Publisher.supports``
(``src/fundus/publishers/base_objects.py:384-420``): select publisher
subsets by supported extraction attributes and languages.

Languages come from the reference's per-group ``default_language``
declarations plus the per-source overrides (both data in the
reference's ``publishers/<cc>/__init__.py`` files); source types have
no analogue over stored tables and are intentionally absent.
"""

from __future__ import annotations

from datetime import datetime
from typing import Dict, FrozenSet, List, Optional, Sequence

from ..kernel import PublisherSpec

# reference: publishers/<cc>/__init__.py `default_language = ...`
GROUP_LANGUAGES: Dict[str, str] = {
    "at": "de", "au": "en", "be": "nl", "ca": "en", "ch": "de", "cn": "zh",
    "cz": "cs", "de": "de", "dk": "da", "es": "es", "fr": "fr", "gl": "kl",
    "id": "id", "il": "he", "ind": "hi", "isl": "is", "it": "it", "jp": "ja",
    "kr": "ko", "lb": "ar", "li": "de", "ls": "en", "lt": "lt", "lu": "de",
    "mx": "es", "my": "ms", "na": "en", "no": "no", "pl": "pl", "pt": "pt",
    "py": "es", "ru": "ru", "se": "sv", "tr": "tr", "tw": "tw", "tz": "sw",
    "ua": "uk", "uk": "en", "us": "en", "vn": "vi", "za": "en",
}

# Per-source language overrides in the reference registry: for each
# publisher, the union of its sources' explicit ``languages={...}``
# kwargs, with unannotated sources inheriting the group default
# (base_objects.py:228-229,331-334). Generated from the reference AST
# by tools/ref_languages.py (the reference can't be imported here) and
# kept honest by tests/test_search_api.py::test_language_table_parity.
LANGUAGE_OVERRIDES: Dict[str, FrozenSet[str]] = {
    "be.PoliticoEu": frozenset({"en"}),
    "de.Correctiv": frozenset({"de", "en"}),
    "de.DW": frozenset({"de", "en"}),
    "es.MallorcaMagazin": frozenset({"de"}),
    "es.MallorcaZeitung": frozenset({"de"}),
    "il.IsraelNachrichten": frozenset({"de"}),
    "ind.TimesOfIndia": frozenset({"en"}),
    "it.Tageszeitung": frozenset({"de"}),
    "jp.TheJapanNews": frozenset({"en"}),
    "lb.LBCGroup": frozenset({"ar", "en"}),
    "mx.MexicoNewsDaily": frozenset({"en"}),
    "na.TheNamibian": frozenset({"en", "kj"}),
    "pt.ThePortugalNews": frozenset(
        {"ar", "br", "de", "en", "es", "fi", "fr", "he", "it", "nl", "pl", "pt", "ru", "se", "tr", "zh"}
    ),
    "py.Wochenblatt": frozenset({"de"}),
    "tw.TaipeiTimes": frozenset({"en"}),
    "tz.DailyNewsTZ": frozenset({"en"}),
    "ua.Pravda": frozenset({"en", "ru", "uk"}),
    "us.APNews": frozenset({"en", "es"}),
    "za.Dizindaba": frozenset({"xh"}),
    "za.EyethuNews": frozenset({"zu"}),
    "za.Ilanga": frozenset({"zu"}),
    "za.Isolezwe": frozenset({"zu"}),
    "za.IsolezweLesiXhosa": frozenset({"xh"}),
}


def publisher_languages(key: str) -> FrozenSet[str]:
    if key in LANGUAGE_OVERRIDES:
        return LANGUAGE_OVERRIDES[key]
    cc = key.split(".", 1)[0]
    lang = GROUP_LANGUAGES.get(cc)
    return frozenset({lang}) if lang else frozenset()


def attribute_names(
    spec: PublisherSpec,
    ts: Optional[datetime] = None,
    include_deprecated: bool = True,
) -> FrozenSet[str]:
    """Attribute names of the version in effect at ``ts`` (latest when
    None) — only output-producing extractors, like the reference's
    ``parser().attributes().names``."""
    version = spec.version_for(ts)
    names = set()
    for e in version.extractors:
        if e.kind != "attribute":
            continue
        if not include_deprecated and e.deprecated is not None:
            continue
        names.add(e.name)
    return frozenset(names)


def supports(spec: PublisherSpec, attributes: Sequence[str]) -> bool:
    """reference ``Publisher.supports``: every named attribute must be
    provided by the publisher's current parser version."""
    if not attributes:
        raise ValueError("Got empty value '[]' for parameter <attributes>.")
    return set(attributes).issubset(attribute_names(spec))


def search(
    registry: Dict[str, PublisherSpec],
    attributes: Optional[List[str]] = None,
    languages: Optional[List[str]] = None,
    include_deprecated_attributes: bool = False,
) -> List[PublisherSpec]:
    """reference ``PublisherGroup.search`` semantics: publishers whose
    current parser provides ALL requested attributes AND that publish
    in at least one requested language."""
    if not (attributes or languages):
        raise ValueError("You have to define at least one search condition")
    wanted_attrs = set(attributes or [])
    wanted_langs = set(languages or [])
    matched: List[PublisherSpec] = []
    for key, spec in sorted(registry.items()):
        if key == "generic":
            continue
        names = attribute_names(spec, include_deprecated=include_deprecated_attributes)
        if not wanted_attrs.issubset(names):
            continue
        if wanted_langs and not (wanted_langs & publisher_languages(key)):
            continue
        matched.append(spec)
    return matched
