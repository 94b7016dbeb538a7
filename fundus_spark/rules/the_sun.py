"""The Sun rule spec — semantics per reference
``src/fundus/publishers/uk/the_sun.py`` (single V1).
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

_SUMMARY = CSSSelector("div[data-gu-name='standfirst'] p")
_PARAGRAPH = XPath("//div[@class='article__content']/p[not(not(text()) and a[strong])]")
_SUBHEAD = CSSSelector("div.article__content > h2.wp-block-heading")
_CAPTION = XPath("./ancestor::figure//figcaption/span[1]")


def _body(ctx: ParseContext) -> Optional[Dict[str, Any]]:
    return assemble_body(
        ctx.doc,
        summary_selector=_SUMMARY,
        paragraph_selector=_PARAGRAPH,
        subheadline_selector=_SUBHEAD,
    )


def _publishing_date(ctx: ParseContext) -> Optional[datetime.datetime]:
    return generic_date_parsing(ctx.ld.bf_search("datePublished"))


def _authors(ctx: ParseContext) -> List[str]:
    return generic_author_parsing(ctx.ld.bf_search("author"))


def _title(ctx: ParseContext) -> Optional[str]:
    return ctx.ld.bf_search("headline")


def _topics(ctx: ParseContext) -> List[str]:
    return generic_topic_parsing(ctx.meta.get("article:tag"))


def _images(ctx: ParseContext) -> List[Dict[str, Any]]:
    return [
        img.serialize()
        for img in image_extraction(doc=ctx.doc, paragraph_selector=_PARAGRAPH, caption_selector=_CAPTION)
    ]


def _free_access(ctx: ParseContext) -> bool:
    return free_access_from_ld(ctx.ld)


THE_SUN = PublisherSpec(
    key="uk.TheSun",
    versions=(
        VersionSpec(
            name="V1",
            extractors=(
                Extractor("body", _body),
                Extractor("publishing_date", _publishing_date),
                Extractor("authors", _authors, default=list),
                Extractor("title", _title),
                Extractor("topics", _topics, default=list),
                Extractor("images", _images, default=list),
                Extractor("free_access", _free_access, default=False),
            ),
        ),
    ),
)
