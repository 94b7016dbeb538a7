"""Die Presse rule spec — reference
``src/fundus/publishers/at/die_presse.py``.
"""

from __future__ import annotations

from ..kernel import PublisherSpec, VersionSpec, XPath
from ._common import authors_from_ld, date_from_ld, make_body, make_images, std_extractors, title_from_ld, topics_from_meta

_PARAGRAPH = XPath(
    r"//div[@id='article-body']/p[text() and not(@class or re:test(string(.), '^\s*\(.+\)\s*$'))]"
)
_SUMMARY = XPath("//p[@class='lead']")
_SUBHEAD = XPath("//div[@id='article-body']//h2[not(@class)]")

_IMAGES = make_images(
    _PARAGRAPH,
    caption_selector=XPath("./ancestor::figure//figcaption//span[not(@class)]"),
    author_selector=XPath("./ancestor::figure//figcaption//span[@class]"),
)

DIE_PRESSE = PublisherSpec(
    key="at.DiePresse",
    versions=(
        VersionSpec(
            name="V1",
            extractors=std_extractors(
                body=make_body(_PARAGRAPH, summary=_SUMMARY, subheadline=_SUBHEAD),
                authors=authors_from_ld(),
                date=date_from_ld(),
                title=title_from_ld("headline"),
                topics=topics_from_meta("keywords"),
                images=_IMAGES,
            ),
        ),
    ),
)
