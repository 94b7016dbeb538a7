"""NRK rule spec — reference ``src/fundus/publishers/no/nrk.py``
(no topics attribute).
"""

from __future__ import annotations

from ..kernel import CSSSelector, Extractor, PublisherSpec, VersionSpec, XPath
from ._common import authors_from_ld, date_from_meta, free_access, make_body, make_images, title_from_meta

_SUBHEAD = CSSSelector("div.article-body > h2")
_PARAGRAPH = CSSSelector("div.article-body > p")
_SUMMARY = CSSSelector("div.article-lead")

_IMAGES = make_images(
    _PARAGRAPH,
    author_selector=XPath("./ancestor::figure/figcaption/small"),
    caption_selector=XPath("./ancestor::figure/figcaption/p"),
    upper_boundary_selector=CSSSelector("header.article-header"),
)

NRK = PublisherSpec(
    key="no.NRK",
    versions=(
        VersionSpec(
            name="V1",
            extractors=(
                Extractor("body", make_body(_PARAGRAPH, summary=_SUMMARY, subheadline=_SUBHEAD)),
                Extractor("title", title_from_meta("og:title")),
                Extractor("publishing_date", date_from_meta("article:published_time")),
                Extractor("authors", authors_from_ld(), default=list),
                Extractor("images", _IMAGES, default=list),
                Extractor("free_access", free_access, default=False),
            ),
        ),
    ),
)
