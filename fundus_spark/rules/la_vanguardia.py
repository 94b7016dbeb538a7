"""La Vanguardia rule spec — semantics per reference
``src/fundus/publishers/es/la_vanguardia.py`` (V1 valid until
2026-07-01, V2 after).


Round 2: full golden parity — the former image-position delta was a
missing libxml2 behavior (implied <body>+<p> on >=1000-char whitespace
runs / noscript-in-head nesting), now reproduced in kernel/dom.py.
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
    generic_topic_parsing,
    image_extraction,
)

_V1_PARAGRAPH = XPath(
    "//div[@class='article-modules']//p[@class='paragraph'] | "
    "//div[@class='widget' and not(@id)]//p[not(@class='creditos')]"
)
_V1_SUBHEAD = XPath(
    "//div[@class='article-modules']//h3[@class='subtitle'] | "
    "//div[@class='widget' and not(@id)]//h2|//span[@class='ubicacion']"
)
_V1_SUMMARY = XPath("//h2[@class='epigraph']|//div[@id='slide-content-1']/p")
_V1_IMAGE = XPath("//figure[contains(@class,'composite-image')]//img")
_V1_CAPTION = XPath("./ancestor::figure//figcaption/p")
_V1_CREDIT = XPath("./ancestor::figure//figcaption/span")

_V2_SUMMARY = XPath("//h2[@class='subtitle dot']")
_V2_PARAGRAPH = XPath("//div[@class='article_story']/p")
_V2_SUBHEAD = XPath(
    "//div[@class='article_story']/div[@class='content_component highlight']/h3[@class='title'] | "
    "//h3[contains(@class, 'block-headline')]"
)
_V2_TOPIC = XPath("(//div[@class='tags-container collapse'])[1]/ul/li")
_V2_IMAGE = XPath("//figure[not(contains(@class, 'related') or contains(@class, 'author'))]//img")
_V2_CAPTION = XPath("./ancestor::figure//figcaption/span[@class='caption_text']")
_V2_CREDIT = XPath("./ancestor::figure//figcaption/span[@class='caption_author']")


def _body(summary, paragraph, subhead):
    def fn(ctx: ParseContext) -> Optional[Dict[str, Any]]:
        return assemble_body(
            ctx.doc,
            paragraph_selector=paragraph,
            subheadline_selector=subhead,
            summary_selector=summary,
        )

    return fn


def _publishing_date(ctx: ParseContext) -> Optional[datetime.datetime]:
    return generic_date_parsing(ctx.ld.bf_search("datePublished"))


def _title_v1(ctx: ParseContext) -> Optional[str]:
    return ctx.meta.get("title")


def _title_v2(ctx: ParseContext) -> Optional[str]:
    return ctx.meta.get("og:title")


def _authors_v1(ctx: ParseContext) -> List[str]:
    return [re.sub(r"(?u)\s*​.*", "", author) for author in generic_author_parsing(ctx.ld.bf_search("author"))]


def _authors_v2(ctx: ParseContext) -> List[str]:
    return generic_author_parsing(ctx.ld.bf_search("author"))


def _topics_v2(ctx: ParseContext) -> List[str]:
    return generic_topic_parsing(generic_nodes_to_text(_V2_TOPIC(ctx.doc), normalize=True))


def _images(paragraph, image, caption, credit, relative=False):
    def fn(ctx: ParseContext) -> List[Dict[str, Any]]:
        return [
            img.serialize()
            for img in image_extraction(
                doc=ctx.doc,
                paragraph_selector=paragraph,
                image_selector=image,
                caption_selector=caption,
                author_selector=credit,
                relative_urls=relative,
            )
        ]

    return fn


def _free_access(ctx: ParseContext) -> bool:
    return free_access_from_ld(ctx.ld)


LA_VANGUARDIA = PublisherSpec(
    key="es.LaVanguardia",
    versions=(
        VersionSpec(
            name="V1",
            valid_until=datetime.date(2026, 7, 1),
            extractors=(
                Extractor("body", _body(_V1_SUMMARY, _V1_PARAGRAPH, _V1_SUBHEAD)),
                Extractor("publishing_date", _publishing_date),
                Extractor("title", _title_v1),
                Extractor("authors", _authors_v1, default=list),
                Extractor("images", _images(_V1_PARAGRAPH, _V1_IMAGE, _V1_CAPTION, _V1_CREDIT, True), default=list),
                Extractor("free_access", _free_access, default=False),
            ),
        ),
        VersionSpec(
            name="V2",
            extractors=(
                Extractor("body", _body(_V2_SUMMARY, _V2_PARAGRAPH, _V2_SUBHEAD)),
                Extractor("publishing_date", _publishing_date),
                Extractor("title", _title_v2),
                Extractor("authors", _authors_v2, default=list),
                Extractor("topics", _topics_v2, default=list),
                Extractor("images", _images(_V2_PARAGRAPH, _V2_IMAGE, _V2_CAPTION, _V2_CREDIT), default=list),
                Extractor("free_access", _free_access, default=False),
            ),
        ),
    ),
)
