"""Daily Mail rule spec — semantics per reference
``src/fundus/publishers/uk/daily_mail.py`` (single V1; topics keep
only non-lowercase entries).
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

_PARAGRAPH = CSSSelector("div[itemprop='articleBody'] > p")
_UPPER = CSSSelector("div#content")
_IMAGE = CSSSelector("div.mol-img-group img")
_CAPTION = XPath("./ancestor::div[contains(@class, 'mol-img-group')]/p[@class='imageCaption']")


def _body(ctx: ParseContext) -> Optional[Dict[str, Any]]:
    return assemble_body(ctx.doc, paragraph_selector=_PARAGRAPH)


def _publishing_date(ctx: ParseContext) -> Optional[datetime.datetime]:
    return generic_date_parsing(ctx.ld.bf_search("datePublished"))


def _authors(ctx: ParseContext) -> List[str]:
    return generic_author_parsing(ctx.ld.bf_search("author"))


def _title(ctx: ParseContext) -> Optional[str]:
    return ctx.meta.get("og:title")


def _topics(ctx: ParseContext) -> List[str]:
    return [topic for topic in generic_topic_parsing(ctx.meta.get("keywords")) if topic.casefold() != topic]


def _images(ctx: ParseContext) -> List[Dict[str, Any]]:
    return [
        img.serialize()
        for img in image_extraction(
            doc=ctx.doc,
            paragraph_selector=_PARAGRAPH,
            upper_boundary_selector=_UPPER,
            image_selector=_IMAGE,
            caption_selector=_CAPTION,
        )
    ]


def _free_access(ctx: ParseContext) -> bool:
    return free_access_from_ld(ctx.ld)


DAILY_MAIL = PublisherSpec(
    key="uk.DailyMail",
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
