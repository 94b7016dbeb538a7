"""The Intercept rule spec — semantics per reference
``src/fundus/publishers/us/the_intercept.py`` (V1 valid until
2024-02-01, V1_1 after).
"""

from __future__ import annotations

import datetime
from typing import Any, Dict, List, Optional

from ..kernel import (
    CSSSelector,
    Extractor,
    ParseContext,
    PublisherSpec,
    VersionSpec,
    XPath,
    assemble_body,
    free_access_from_ld,
    generic_author_parsing,
    generic_date_parsing,
    image_extraction,
)

_V1_SUMMARY = CSSSelector("h2.Post-excerpt")
_V1_PARAGRAPH = CSSSelector("div.PostContent > div > p:not(p.caption):not(p.PhotoGrid-description)")
_V1_SUBHEAD = CSSSelector("div.PostContent > div > h2")

_V11_SUMMARY = XPath("//p[@class='post__excerpt'] | //h2[preceding-sibling::h1[contains(@class, 'post__title')]]")
_V11_PARAGRAPH = CSSSelector("div.entry-content > div.entry-content__content > p, blockquote > p")
_V11_SUBHEAD = CSSSelector("div.entry-content > div.entry-content__content > h2")

_V11_IMAGE = XPath(
    "//img[(string-length(@alt) > 0 and not(contains(@class, 'attachment') or contains(@class, ':hidden'))) "
    "or @loading='eager']|//figure//img"
)
_V11_CAPTION = XPath(
    "(./parent::article//div[contains(@class, 'image__caption')]/span[not(@class)])[1]|"
    "./ancestor::figure//figcaption/span[@class='photo__caption']"
)
_V11_CREDIT = XPath(
    "(./parent::article//div[contains(@class, 'image__caption')]/span)[last()]|"
    "./ancestor::figure//figcaption/span[@class='photo__credit']"
)


def _body(summary, paragraph, subhead):
    def fn(ctx: ParseContext) -> Optional[Dict[str, Any]]:
        return assemble_body(
            ctx.doc,
            summary_selector=summary,
            subheadline_selector=subhead,
            paragraph_selector=paragraph,
        )

    return fn


def _authors(ctx: ParseContext) -> List[str]:
    return generic_author_parsing(ctx.ld.xpath_search("NewsArticle/author"))


def _publishing_date(ctx: ParseContext) -> Optional[datetime.datetime]:
    return generic_date_parsing(ctx.ld.xpath_search("NewsArticle/datePublished", scalar=True))


def _title(ctx: ParseContext) -> Optional[str]:
    return ctx.ld.xpath_search("NewsArticle/headline", scalar=True)


def _topics(ctx: ParseContext) -> List[str]:
    keywords: List[str] = ctx.ld.xpath_search("NewsArticle/keywords")
    return [keyword[9:] for keyword in keywords if keyword.startswith("Subject: ")]


def _images_v11(ctx: ParseContext) -> List[Dict[str, Any]]:
    return [
        img.serialize()
        for img in image_extraction(
            doc=ctx.doc,
            paragraph_selector=_V11_PARAGRAPH,
            image_selector=_V11_IMAGE,
            caption_selector=_V11_CAPTION,
            author_selector=_V11_CREDIT,
        )
    ]


def _free_access(ctx: ParseContext) -> bool:
    return free_access_from_ld(ctx.ld)


_COMMON = [
    Extractor("authors", _authors, default=list),
    Extractor("publishing_date", _publishing_date),
    Extractor("title", _title),
    Extractor("topics", _topics, default=list),
    Extractor("free_access", _free_access, default=False),
]

THE_INTERCEPT = PublisherSpec(
    key="us.TheIntercept",
    versions=(
        VersionSpec(
            name="V1",
            valid_until=datetime.date(2024, 2, 1),
            extractors=tuple([Extractor("body", _body(_V1_SUMMARY, _V1_PARAGRAPH, _V1_SUBHEAD))] + _COMMON),
        ),
        VersionSpec(
            name="V1_1",
            extractors=tuple(
                [
                    Extractor("body", _body(_V11_SUMMARY, _V11_PARAGRAPH, _V11_SUBHEAD)),
                    Extractor("images", _images_v11, default=list),
                ]
                + _COMMON
            ),
        ),
    ),
)
