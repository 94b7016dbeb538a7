"""Global News rule spec — reference
``src/fundus/publishers/ca/global_news.py`` (EXSLT ``re:test`` in the
paragraph selector filters wire-report footers).
"""

from __future__ import annotations

from ..kernel import PublisherSpec, VersionSpec, XPath
from ._common import (
    authors_from_ld,
    date_from_ld,
    make_body,
    make_images,
    std_extractors,
    title_from_ld,
    topics_from_meta,
)

_PARAGRAPH = XPath(
    "//article/ul/li | //article/p[not(text()='—') and text() and"
    " not(re:test(string(), 'This report by .* was first published'))]"
)
_SUBHEAD = XPath("//article/*[self::h3 or (self::p and strong and not(text()))]")

_IMAGES = make_images(
    _PARAGRAPH,
    caption_selector=XPath("./ancestor::figure//figcaption/span"),
    author_selector=XPath("./ancestor::figure//figcaption/cite"),
)

GLOBAL_NEWS = PublisherSpec(
    key="ca.GlobalNews",
    versions=(
        VersionSpec(
            name="V1",
            extractors=std_extractors(
                body=make_body(_PARAGRAPH, subheadline=_SUBHEAD),
                authors=authors_from_ld(),
                date=date_from_ld(),
                title=title_from_ld("headline"),
                topics=topics_from_meta("keywords", result_filter={"Canada"}),
                images=_IMAGES,
            ),
        ),
    ),
)
