"""Mitteldeutsche Zeitung rule spec — semantics per reference
``src/fundus/publishers/de/mz.py`` (single V1).
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

_PARAGRAPH = CSSSelector("p.fp-paragraph")
_SUMMARY = CSSSelector("div.fp-article-heading > p")
_SUBHEAD = CSSSelector("div.fp-subheading > h2")
_CAPTION = XPath("./ancestor::div[@class='key-visual-image-wrapper']//span[@data-fp-flag='main-image-caption']")
_CREDIT = XPath("./ancestor::div[@class='key-visual-image-wrapper']//span[@data-fp-flag='main-image-source']")


def _body(ctx: ParseContext) -> Optional[Dict[str, Any]]:
    return assemble_body(
        ctx.doc,
        paragraph_selector=_PARAGRAPH,
        subheadline_selector=_SUBHEAD,
        summary_selector=_SUMMARY,
    )


def _title(ctx: ParseContext) -> Optional[str]:
    return ctx.meta.get("title")


def _authors(ctx: ParseContext) -> List[str]:
    return generic_author_parsing(ctx.meta.get("author"))


def _publishing_date(ctx: ParseContext) -> Optional[datetime.datetime]:
    return generic_date_parsing(ctx.ld.bf_search("datePublished"))


def _topics(ctx: ParseContext) -> List[str]:
    return generic_topic_parsing(ctx.meta.get("keywords"))


def _images(ctx: ParseContext) -> List[Dict[str, Any]]:
    return [
        img.serialize()
        for img in image_extraction(
            doc=ctx.doc,
            paragraph_selector=_PARAGRAPH,
            caption_selector=_CAPTION,
            author_selector=_CREDIT,
        )
    ]


def _free_access(ctx: ParseContext) -> bool:
    return free_access_from_ld(ctx.ld)


MITTELDEUTSCHE_ZEITUNG = PublisherSpec(
    key="de.MitteldeutscheZeitung",
    versions=(
        VersionSpec(
            name="V1",
            extractors=(
                Extractor("body", _body),
                Extractor("title", _title),
                Extractor("authors", _authors, default=list),
                Extractor("publishing_date", _publishing_date),
                Extractor("topics", _topics, default=list),
                Extractor("images", _images, default=list),
                Extractor("free_access", _free_access, default=False),
            ),
        ),
    ),
)
