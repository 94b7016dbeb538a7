"""WDR rule spec — semantics per reference
``src/fundus/publishers/de/wdr.py`` (single V1).
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
)

_PARAGRAPH = XPath(
    "//article//p[starts-with(@class,'text') and not(position()=last())  and not(contains(text(), 'Quelle'))]"
)
_SUMMARY = XPath("//article//p[starts-with(@class,'einleitung')]")
_SUBHEAD = XPath("//article//h2[@class='subtitle small']")
_IMAGE = XPath("//article//picture[not(@data-resp-img-id='LinklistenteaserImageSectionZModA')]//img[@class='img']")
_UPPER = XPath("//div[@class='segment' or @class='section sectionArticle']")
_LOWER = XPath("//div[@class='shareCon']")
_ALT = XPath("./@title")
_CREDIT = re.compile(r"(?i)\|\s*bildquelle:(?P<credits>.+)")
_CAPTION = XPath("./ancestor::div[@class='media mediaA']//p[@class='infotext']")


def _body(ctx: ParseContext) -> Optional[Dict[str, Any]]:
    return assemble_body(
        ctx.doc,
        paragraph_selector=_PARAGRAPH,
        summary_selector=_SUMMARY,
        subheadline_selector=_SUBHEAD,
    )


def _authors(ctx: ParseContext) -> List[str]:
    return generic_author_parsing(ctx.meta.get("Author"))


def _publishing_date(ctx: ParseContext) -> Optional[datetime.datetime]:
    return generic_date_parsing(ctx.ld.bf_search("datePublished"))


def _title(ctx: ParseContext) -> Optional[str]:
    return ctx.meta.get("og:title")


def _topics(ctx: ParseContext) -> List[str]:
    return generic_topic_parsing(ctx.meta.get("Keywords"))


def _images(ctx: ParseContext) -> List[Dict[str, Any]]:
    return [
        img.serialize()
        for img in image_extraction(
            doc=ctx.doc,
            paragraph_selector=_PARAGRAPH,
            image_selector=_IMAGE,
            upper_boundary_selector=_UPPER,
            lower_boundary_selector=_LOWER,
            alt_selector=_ALT,
            author_selector=_CREDIT,
            relative_urls=True,
            caption_selector=_CAPTION,
        )
    ]


def _free_access(ctx: ParseContext) -> bool:
    return free_access_from_ld(ctx.ld)


WDR = PublisherSpec(
    key="de.WDR",
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
