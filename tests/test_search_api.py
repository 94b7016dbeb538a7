"""Publisher search/supports API tests (mirrors the reference's
tests/test_collection.py behaviors for search())."""

from __future__ import annotations

import pytest

from fundus_spark.rules import REGISTRY
from fundus_spark.rules.search import attribute_names, publisher_languages, search, supports


def test_search_requires_a_condition():
    with pytest.raises(ValueError):
        search(REGISTRY)


def test_search_by_attributes():
    with_topics = search(REGISTRY, attributes=["topics"])
    assert len(with_topics) > 100
    # publishers without a topics attribute are excluded
    keys = {s.key for s in with_topics}
    assert "za.Dizindaba" not in keys  # no topics extractor
    assert "us.APNews" in keys


def test_search_by_language():
    german = search(REGISTRY, languages=["de"])
    keys = {s.key for s in german}
    assert "de.SpiegelOnline" in keys
    assert "at.ORF" in keys
    assert "ch.NZZ" in keys
    assert "es.MallorcaMagazin" in keys  # German-language paper in es group
    assert "us.APNews" not in keys
    japanese = search(REGISTRY, languages=["ja"])
    assert {s.key for s in japanese} >= {"jp.AsahiShimbun", "jp.YomiuriShimbun"}


def test_search_combined():
    res = search(REGISTRY, attributes=["body", "images"], languages=["en"])
    assert res
    for spec in res:
        assert {"body", "images"}.issubset(attribute_names(spec))
        assert "en" in publisher_languages(spec.key)


def test_supports():
    assert supports(REGISTRY["us.APNews"], ["body", "title"])
    assert not supports(REGISTRY["za.Dizindaba"], ["topics"])
    with pytest.raises(ValueError):
        supports(REGISTRY["us.APNews"], [])


def test_deprecated_attributes_excluded_by_default():
    # pt.ThePortugalNews authors is deprecated as of 2025-10-21
    spec = REGISTRY["pt.ThePortugalNews"]
    hits = search(REGISTRY, attributes=["authors"], languages=["pt"])
    assert spec not in hits
    hits_incl = search(REGISTRY, attributes=["authors"], languages=["pt"], include_deprecated_attributes=True)
    assert spec in hits_incl


def test_language_table_parity_with_reference():
    """GROUP_LANGUAGES + LANGUAGE_OVERRIDES must reproduce the
    reference's per-publisher language sets (union of per-source
    ``languages`` kwargs, unannotated sources inheriting the group's
    ``default_language`` — base_objects.py:228-229,331-334), extracted
    statically from the reference AST by tools/ref_languages.py."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from tools.ref_languages import REF_PUBLISHERS, all_publisher_languages

    if not REF_PUBLISHERS.exists():
        import pytest

        pytest.skip("reference checkout not available")

    ref = all_publisher_languages()
    assert len(ref) > 150
    mismatches = {
        key: (sorted(langs), sorted(publisher_languages(key)))
        for key, langs in ref.items()
        if key in REGISTRY and frozenset(langs) != publisher_languages(key)
    }
    assert not mismatches, mismatches
