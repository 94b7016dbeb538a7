"""NTV (Türkiye) rule spec — reference
``src/fundus/publishers/tr/ntvtr.py`` (V1 until 2025-11-04, V2 after
with tag-list topics and masthead-stripped title).
"""

from __future__ import annotations

import datetime
import re
from typing import List, Optional

from ..kernel import (
    CSSSelector,
    ParseContext,
    PublisherSpec,
    VersionSpec,
    XPath,
    generic_topic_parsing,
    strip_nodes_to_text,
)
from ._common import (
    authors_from_meta,
    date_from_meta,
    make_body,
    make_images,
    std_extractors,
    title_from_meta,
    topics_from_meta,
)

_V1_PARAGRAPH = XPath("//div[@class='content-news-tag-selector']/p")
_V1_SUMMARY = XPath("//h2[@class='category-detail-sub-title']")

_V1_IMAGES = make_images(
    _V1_PARAGRAPH,
    upper_boundary_selector=CSSSelector("article, div.category-detail-inner"),
    lower_boundary_selector=CSSSelector("div.social:last-of-type"),
    image_selector=XPath("//div[contains(@class, 'img-wrapper')]//img | //picture /img"),
)

_V2_PARAGRAPH = XPath("//div[contains(@class, 'content')]/p[text()]")
_V2_SUMMARY = XPath("//div[contains(@class, 'info-text-card')]//h2")
_V2_SUBHEAD = XPath("//div[contains(@class, 'content')]/p[not(text()) and strong] | //div[@data-imageindex]//h2")
_V2_TOPICS = XPath("(//ul[contains(@class, 'text-[#3D619B]')])[1]/li")


def _title_v2(ctx: ParseContext) -> Optional[str]:
    if title := ctx.meta.get("og:title"):
        return title.replace("| NTV Haber", "").strip()
    return None


def _topics_v2(ctx: ParseContext) -> List[str]:
    return generic_topic_parsing(
        strip_nodes_to_text(_V2_TOPICS(ctx.doc), join_on=","),
        substitution_pattern=re.compile(r"-\s*$"),
        delimiter=",",
    )


_V2_IMAGES = make_images(
    _V2_PARAGRAPH,
    upper_boundary_selector=CSSSelector("h1"),
    lower_boundary_selector=XPath("(//img[@alt='Google Play'])[1]"),
    image_selector=XPath("//div[@property='articleBody']//img[not(@fetchpriority='auto') or @height > 300]"),
    caption_selector=XPath("./ancestor::div[contains(@class,'relative') and p]/p"),
    author_selector=XPath("./ancestor::div[contains(@class,'relative') and (picture or img)]/div"),
)

NTVTR = PublisherSpec(
    key="tr.NTVTR",
    versions=(
        VersionSpec(
            name="V1",
            valid_until=datetime.date(2025, 11, 4),
            extractors=std_extractors(
                body=make_body(_V1_PARAGRAPH, summary=_V1_SUMMARY),
                authors=authors_from_meta("articleAuthor"),
                date=date_from_meta("datePublished"),
                title=title_from_meta("og:title"),
                topics=topics_from_meta("dmp:tags"),
                images=_V1_IMAGES,
            ),
        ),
        VersionSpec(
            name="V2",
            extractors=std_extractors(
                body=make_body(_V2_PARAGRAPH, summary=_V2_SUMMARY, subheadline=_V2_SUBHEAD),
                authors=authors_from_meta("articleAuthor"),
                date=date_from_meta("datePublished"),
                title=_title_v2,
                topics=_topics_v2,
                images=_V2_IMAGES,
            ),
        ),
    ),
)
