"""Fox News rule spec — semantics per reference
``src/fundus/publishers/us/fox_news.py`` (single V1).
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
    generic_topic_parsing,
    image_extraction,
)

_SUMMARY = CSSSelector(".article-meta > h2")
_PARAGRAPH = XPath(
    "(//div[@class='article-body'] | //div[@class='article-body']/div[contains(@class, 'paywall')]) "
    "/p[not(child::script) and text()]"
)
_IMAGE = XPath("//article//picture//img[not(@*[starts-with(name(), 'data-v-')])]")
_CAPTION = XPath("(./ancestor::div[@class='image-ct inline']//div[@class='caption']/p/span)[1]")
_CREDIT = XPath("(./ancestor::div[@class='image-ct inline']//div[@class='caption']/p/span)[last()]")


def _body(ctx: ParseContext) -> Optional[Dict[str, Any]]:
    return assemble_body(ctx.doc, paragraph_selector=_PARAGRAPH, summary_selector=_SUMMARY)


def _authors(ctx: ParseContext) -> List[str]:
    return generic_author_parsing(ctx.meta.get("dc.creator"))


def _publishing_date(ctx: ParseContext) -> Optional[datetime.datetime]:
    return generic_date_parsing(ctx.ld.bf_search("datePublished"))


def _title(ctx: ParseContext) -> Optional[str]:
    return ctx.ld.bf_search("headline")


def _topics(ctx: ParseContext) -> List[str]:
    return generic_topic_parsing(ctx.meta.get("classification-tags"))


def _images(ctx: ParseContext) -> List[Dict[str, Any]]:
    return [
        img.serialize()
        for img in image_extraction(
            doc=ctx.doc,
            paragraph_selector=_PARAGRAPH,
            image_selector=_IMAGE,
            caption_selector=_CAPTION,
            author_selector=_CREDIT,
        )
    ]


def _free_access(ctx: ParseContext) -> bool:
    return free_access_from_ld(ctx.ld)


FOX_NEWS = PublisherSpec(
    key="us.FoxNews",
    versions=(
        VersionSpec(
            name="V1",
            extractors=(
                Extractor("body", _body),
                Extractor("authors", _authors, default=list),
                Extractor("publishing_date", _publishing_date),
                Extractor("title", _title),
                Extractor("topics", _topics, default=list),
                Extractor("images", _images, default=list),
                Extractor("free_access", _free_access, default=False),
            ),
        ),
    ),
)
