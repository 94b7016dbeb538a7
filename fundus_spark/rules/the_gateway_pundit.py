"""The Gateway Pundit rule spec — semantics per reference
``src/fundus/publishers/us/the_gateway_pundit.py`` (V1 valid until
2026-05-27, V2 after).
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
    generic_nodes_to_text,
    image_extraction,
)

_V1_RELATED = r"^Click\s$"
_V1_PARAGRAPH = XPath(
    f"(//div[@class='entry-content'] | //div[@class='entry-content']/blockquote[not(@class='twitter-tweet')]) "
    f"/p[not(child::img or child::script or re:test(text(), '{_V1_RELATED}')) and text()]"
)
_V1_IMAGE = XPath("//div[@class='entry-content']//img")
_V1_CREDIT = XPath("./ancestor::figure//figcaption")

_V2_RELATED = (
    r"(?i)^(Click|This article appeared originally|(read )?more:|watch:|more from .{0,20}:|trending:"
    r"|this video is)\s*"
)
_V2_AUTHOR = XPath("//span[@class='author-name']")
_V2_SUMMARY = XPath(
    f"//article//p[not(text())]/strong[text() and not(re:test(text(), '{_V2_RELATED}'))] |"
    f"//div[@class='entry-content']/h3"
)
_V2_PARAGRAPH = XPath(
    f"//div[@class='entry-content']//p[not(ancestor::blockquote[@class='twitter-tweet']) "
    f"and not(child::img or child::script or re:test(normalize-space(.), '{_V2_RELATED}')) and text()] |"
    f"//div[@class='entry-content']//ul/li[not(@class)] |"
    f"//div[@class='entry-content']//p[not(text())]/em"
)
_V2_CAPTION = XPath("./ancestor::figure//figcaption")
_V2_CREDIT = re.compile(r"(?i)photo by(?P<credits>.*)$")


def _body_v1(ctx: ParseContext) -> Optional[Dict[str, Any]]:
    return assemble_body(ctx.doc, paragraph_selector=_V1_PARAGRAPH)


def _authors_v1(ctx: ParseContext) -> List[str]:
    return generic_author_parsing(ctx.ld.xpath_search("Article/author"))


def _publishing_date(ctx: ParseContext) -> Optional[datetime.datetime]:
    return generic_date_parsing(ctx.meta.get("article:published_time"))


def _title_v1(ctx: ParseContext) -> Optional[str]:
    if (title := ctx.meta.get("og:title")) is not None:
        title = title.split("|")[0].strip()
    return title


def _images_v1(ctx: ParseContext) -> List[Dict[str, Any]]:
    return [
        img.serialize()
        for img in image_extraction(
            doc=ctx.doc,
            paragraph_selector=_V1_PARAGRAPH,
            image_selector=_V1_IMAGE,
            author_selector=_V1_CREDIT,
        )
    ]


def _body_v2(ctx: ParseContext) -> Optional[Dict[str, Any]]:
    return assemble_body(ctx.doc, summary_selector=_V2_SUMMARY, paragraph_selector=_V2_PARAGRAPH)


def _title_v2(ctx: ParseContext) -> Optional[str]:
    return ctx.ld.xpath_search("Article/headline", scalar=True)


def _authors_v2(ctx: ParseContext) -> List[str]:
    return generic_author_parsing(generic_nodes_to_text(_V2_AUTHOR(ctx.doc)))


def _images_v2(ctx: ParseContext) -> List[Dict[str, Any]]:
    return [
        img.serialize()
        for img in image_extraction(
            doc=ctx.doc,
            paragraph_selector=_V2_PARAGRAPH,
            image_selector=_V1_IMAGE,
            caption_selector=_V2_CAPTION,
            author_selector=_V2_CREDIT,
        )
    ]


def _free_access(ctx: ParseContext) -> bool:
    return free_access_from_ld(ctx.ld)


THE_GATEWAY_PUNDIT = PublisherSpec(
    key="us.TheGatewayPundit",
    versions=(
        VersionSpec(
            name="V1",
            valid_until=datetime.date(2026, 5, 27),
            extractors=(
                Extractor("body", _body_v1),
                Extractor("authors", _authors_v1, default=list),
                Extractor("publishing_date", _publishing_date),
                Extractor("title", _title_v1),
                Extractor("images", _images_v1, default=list),
                Extractor("free_access", _free_access, default=False),
            ),
        ),
        VersionSpec(
            name="V2",
            extractors=(
                Extractor("body", _body_v2),
                Extractor("title", _title_v2),
                Extractor("authors", _authors_v2, default=list),
                Extractor("publishing_date", _publishing_date),
                Extractor("images", _images_v2, default=list),
                Extractor("free_access", _free_access, default=False),
            ),
        ),
    ),
)
