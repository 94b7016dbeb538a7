"""AP News rule spec — semantics per reference
``src/fundus/publishers/us/ap_news.py:19-86`` (V1 valid until
2023-07-10, V1_1 after), re-expressed as declarative extractors over
the from-scratch kernel.
"""

from __future__ import annotations

import datetime
import re
from typing import Any, Dict, List, Optional

from ..kernel import (
    Extractor,
    ParseContext,
    PublisherSpec,
    VersionSpec,
    XPath,
    assemble_body,
    free_access_from_ld,
    generic_author_parsing,
    generic_date_parsing,
    generic_topic_parsing,
    image_extraction,
    normalize_whitespace,
)

_V1_AUTHOR = XPath("//div[hasclass('CardHeadline')]/span/span[1]")
_V1_SUBHEAD = XPath("//div[@data-key = 'article']/h2[not(text()='___')]")
_V1_PARAGRAPH = XPath("//div[@data-key = 'article']/p")

_TOPIC_BLOAT = re.compile(r"state wire| news|^.{1}$", flags=re.IGNORECASE)

_V11_AUTHOR = XPath("//div[hasclass('Page-authors')]")
_V11_SUBHEAD = XPath("//div[contains(@class, 'RichTextStoryBody')] /h2[not(text()='___')]")
_V11_PARAGRAPH = XPath(
    "//div[contains(@class, 'RichTextStoryBody')] /p[not(preceding-sibling::*[1][self::h2 and text()='___'])]"
)
_V11_IMAGE = XPath("//*[self::figure or @class='CarouselSlide']//img")
_V11_CAPTION = XPath(
    "./ancestor::figure//figcaption | "
    "./ancestor::div[@class='CarouselSlide']//span[@class='CarouselSlide-infoDescription']"
)
_V11_UPPER = XPath("//div[@class='Page-content' or @class='Body']")
_V11_LOWER = XPath("//footer[hasclass('Page-footer')]")
_V11_IMG_CREDIT = re.compile(r"\s*\((?P<credits>.*)\)$")


def _body_v1(ctx: ParseContext) -> Optional[Dict[str, Any]]:
    return assemble_body(ctx.doc, paragraph_selector=_V1_PARAGRAPH, subheadline_selector=_V1_SUBHEAD)


def _authors(author_selector: XPath):
    def fn(ctx: ParseContext) -> List[str]:
        nodes = author_selector(ctx.doc)
        if not nodes:
            return generic_author_parsing(ctx.ld.xpath_search("NewsArticle/author"))
        author_string = normalize_whitespace(nodes[0].text_content())
        author_string = re.sub(r"^By ", "", author_string)
        return generic_author_parsing(author_string)

    return fn


def _publishing_date(ctx: ParseContext) -> Optional[datetime.datetime]:
    return generic_date_parsing(ctx.ld.xpath_search("NewsArticle/datePublished", scalar=True))


def _title(ctx: ParseContext) -> Optional[str]:
    return ctx.ld.xpath_search("NewsArticle/headline", scalar=True)


def _topics(ctx: ParseContext) -> List[str]:
    return generic_topic_parsing(ctx.meta.get("keywords"), result_filter=_TOPIC_BLOAT)


def _free_access(ctx: ParseContext) -> bool:
    return free_access_from_ld(ctx.ld)


def _body_v11(ctx: ParseContext) -> Optional[Dict[str, Any]]:
    return assemble_body(ctx.doc, paragraph_selector=_V11_PARAGRAPH, subheadline_selector=_V11_SUBHEAD)


def _images_v11(ctx: ParseContext) -> List[Dict[str, Any]]:
    return [
        img.serialize()
        for img in image_extraction(
            doc=ctx.doc,
            paragraph_selector=_V11_PARAGRAPH,
            image_selector=_V11_IMAGE,
            caption_selector=_V11_CAPTION,
            upper_boundary_selector=_V11_UPPER,
            lower_boundary_selector=_V11_LOWER,
            author_selector=_V11_IMG_CREDIT,
        )
    ]


_COMMON = [
    Extractor("publishing_date", _publishing_date),
    Extractor("title", _title),
    Extractor("topics", _topics, default=list),
    Extractor("free_access", _free_access, default=False),
]

AP_NEWS = PublisherSpec(
    key="us.APNews",
    versions=(
        VersionSpec(
            name="V1",
            valid_until=datetime.date(2023, 7, 10),
            extractors=tuple(
                [
                    Extractor("body", _body_v1),
                    Extractor("authors", _authors(_V1_AUTHOR), default=list),
                ]
                + _COMMON
            ),
        ),
        VersionSpec(
            name="V1_1",
            extractors=tuple(
                [
                    Extractor("body", _body_v11),
                    Extractor("authors", _authors(_V11_AUTHOR), default=list),
                    Extractor("images", _images_v11, default=list),
                ]
                + _COMMON
            ),
        ),
    ),
)
