"""Nettavisen rule spec — reference
``src/fundus/publishers/no/nettavisen.py`` (image credits via an EXSLT
``re:match`` XPath over the second caption span).
"""

from __future__ import annotations

from ..kernel import CSSSelector, PublisherSpec, VersionSpec, XPath
from ._common import (
    authors_from_meta,
    date_from_meta,
    make_body,
    make_images,
    std_extractors,
    title_from_meta,
    topics_from_meta,
)

_BLOAT = "Les også:"

_SUMMARY = CSSSelector("p.lead-text")
_SUBHEAD = CSSSelector("div.article-body > h2")
_PARAGRAPH = XPath(f"//div[contains(@class,'article-body')] /p[not(re:test(string(), '{_BLOAT}'))]")

_AUTHOR_PATTERN = r"(Foto:\s*).*$"
_IMAGES = make_images(
    _PARAGRAPH,
    image_selector=XPath("//brick-image-v3 | //img"),
    caption_selector=XPath("./ancestor::div[contains(@class, 'image')]//span[1]"),
    author_selector=XPath(f"re:match(./ancestor::div[contains(@class, 'image')]//span[2], '{_AUTHOR_PATTERN}')"),
)

NETTAVISEN = PublisherSpec(
    key="no.Nettavisen",
    versions=(
        VersionSpec(
            name="V1",
            extractors=std_extractors(
                body=make_body(_PARAGRAPH, summary=_SUMMARY, subheadline=_SUBHEAD),
                authors=authors_from_meta("article:author"),
                date=date_from_meta("article:published_time"),
                title=title_from_meta("og:title"),
                topics=topics_from_meta("article:tag"),
                images=_IMAGES,
            ),
        ),
    ),
)
