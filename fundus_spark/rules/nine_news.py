"""Nine News rule spec — reference
``src/fundus/publishers/au/nine_news.py`` (V1 until 2026-06-15 without
topics; V2 after).
"""

from __future__ import annotations

import datetime
from typing import List

from ..kernel import (
    Extractor,
    ParseContext,
    PublisherSpec,
    VersionSpec,
    XPath,
    generic_nodes_to_text,
    generic_topic_parsing,
)
from ._common import authors_from_ld, date_from_ld, free_access, make_body, make_images, std_extractors, title_from_ld

_BLOAT_REGEX = r"^READ MORE:"
_V1_PARAGRAPH = XPath(
    f"//div[@class='article__body'] "
    f"//div[@class='block-content'] "
    f"/div[child::span and not(re:test(string(), '{_BLOAT_REGEX}'))]"
)
_V1_SUBHEAD = XPath("//div[@class='article__body'] //div[@class='block-content'] /div[child::h3]")

_V1_IMAGES = make_images(
    _V1_PARAGRAPH,
    caption_selector=XPath("./ancestor::figure//figcaption/text()[1]"),
    author_selector=XPath("./ancestor::figure//figcaption/text()[last()]"),
)

_V2_PARAGRAPH = XPath("//article/div/div/p")
_V2_SUBHEAD = XPath("//article/div/div/h2")
_V2_TOPIC = XPath("//ul[@data-ui-testid='footer-tags']//li")


def _topics_v2(ctx: ParseContext) -> List[str]:
    return generic_topic_parsing(generic_nodes_to_text(_V2_TOPIC(ctx.doc)))


_V2_IMAGES = make_images(
    _V2_PARAGRAPH,
    image_selector=XPath("//figure[not(@data-ui-testid or a)]//img"),
    upper_boundary_selector=XPath("//article"),
    caption_selector=XPath("./ancestor::figure//figcaption/p/text()"),
    author_selector=XPath("./ancestor::figure//figcaption//cite"),
)

NINE_NEWS = PublisherSpec(
    key="au.NineNews",
    versions=(
        VersionSpec(
            name="V1",
            valid_until=datetime.date(2026, 6, 15),
            extractors=(
                Extractor("body", make_body(_V1_PARAGRAPH, subheadline=_V1_SUBHEAD)),
                Extractor("publishing_date", date_from_ld()),
                Extractor("title", title_from_ld("headline")),
                Extractor("authors", authors_from_ld(), default=list),
                Extractor("images", _V1_IMAGES, default=list),
                Extractor("free_access", free_access, default=False),
            ),
        ),
        VersionSpec(
            name="V2",
            extractors=std_extractors(
                body=make_body(_V2_PARAGRAPH, subheadline=_V2_SUBHEAD),
                authors=authors_from_ld(),
                date=date_from_ld(),
                title=title_from_ld("headline"),
                topics=_topics_v2,
                images=_V2_IMAGES,
            ),
        ),
    ),
)
