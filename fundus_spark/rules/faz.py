"""FAZ rule spec — semantics per reference
``src/fundus/publishers/de/faz.py`` (V1 until 2024-04-15, V2 until
2025-02-26, V3 after).
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
    parse_title_from_root,
    strip_nodes_to_text,
)

_V1_PARAGRAPH = CSSSelector("div.atc-Text > p")
_V1_SUMMARY = CSSSelector("div.atc-Intro > p")
_V1_SUBHEAD = CSSSelector("div.atc-Text > h3")
_V1_AUTHOR = CSSSelector(".atc-MetaAuthor")

_V2_SUMMARY = CSSSelector("div.header-teaser")
_V2_PARAGRAPH = CSSSelector(".body-elements__paragraph")
_V2_SUBHEAD = CSSSelector("div.body-elements > h3")
_V2_AUTHOR_META = CSSSelector("div.author-meta")
_V2_TOPIC = XPath("//div[text()=' Schlagworte: '] /a")
_V2_IMAGE = XPath("//figure//img|//picture//img")
_V2_CAPTION = XPath("./ancestor::figure//span")
_V2_CREDIT = XPath("./ancestor::figure//em")

_V3_SUMMARY = CSSSelector("p[data-external-selector='header-teaser']")
_V3_PARAGRAPH = XPath("//*[@data-selector='body-paragraph']")
_V3_SUBHEAD = CSSSelector("div[data-external-selector='body-elements'] > div > h3")
_V3_TOPIC = CSSSelector("nav[aria-label='Themen in diesem Artikel'] a")
_V3_CAPTION = XPath(
    "./ancestor::figure//span | "
    "./ancestor::div[@data-external-selector='article-header']//span[@class='meta2 pr-[10px]']"
)
_V3_CREDIT = XPath(
    "./ancestor::figure//*[self::em or self::small] | "
    "./ancestor::div[@data-external-selector='article-header']//small"
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


def _publishing_date(ctx: ParseContext) -> Optional[datetime.datetime]:
    return generic_date_parsing(ctx.ld.bf_search("datePublished"))


def _topics_v1(ctx: ParseContext) -> List[str]:
    return generic_topic_parsing(ctx.meta.get("keywords"))


def _authors_v1(ctx: ParseContext) -> List[str]:
    if not (author_nodes := _V1_AUTHOR(ctx.doc)):
        return []
    if len(author_nodes) > 1:
        # authors are linked with an <a> tag, cities are not
        author_nodes = [node for node in author_nodes if any(c.tag == "a" for c in node.children)]
    return [text for node in author_nodes if "F.A.Z" not in (text := node.text_content())]


def _title_v1(ctx: ParseContext) -> Optional[str]:
    return ctx.meta.get("og:title")


def _topics_nodes(selector):
    def fn(ctx: ParseContext) -> List[str]:
        topic_string = strip_nodes_to_text(selector(ctx.doc), join_on=",")
        if topic_string is not None:
            topic_string = topic_string.replace(",Alle Themen", "")
            return generic_topic_parsing(topic_string, delimiter=",")
        return []

    return fn


def _authors_v2(ctx: ParseContext) -> List[str]:
    if _V2_AUTHOR_META(ctx.doc):
        return generic_author_parsing(ctx.ld.bf_search("author"))
    return []


def _authors_v3(ctx: ParseContext) -> List[str]:
    return generic_author_parsing(ctx.ld.bf_search("author"))


def _title_v23(ctx: ParseContext) -> Optional[str]:
    return ctx.meta.get("og:title") or parse_title_from_root(ctx.doc)


def _images(paragraph, caption, credit):
    def fn(ctx: ParseContext) -> List[Dict[str, Any]]:
        return [
            img.serialize()
            for img in image_extraction(
                doc=ctx.doc,
                paragraph_selector=paragraph,
                image_selector=_V2_IMAGE,
                caption_selector=caption,
                author_selector=credit,
            )
        ]

    return fn


def _free_access(ctx: ParseContext) -> bool:
    return free_access_from_ld(ctx.ld)


FAZ = PublisherSpec(
    key="de.FAZ",
    versions=(
        VersionSpec(
            name="V1",
            valid_until=datetime.date(2024, 4, 15),
            extractors=(
                Extractor("body", _body(_V1_SUMMARY, _V1_PARAGRAPH, _V1_SUBHEAD)),
                Extractor("topics", _topics_v1, default=list),
                Extractor("publishing_date", _publishing_date),
                Extractor("authors", _authors_v1, default=list),
                Extractor("title", _title_v1),
                Extractor("free_access", _free_access, default=False),
            ),
        ),
        VersionSpec(
            name="V2",
            valid_until=datetime.date(2025, 2, 26),
            extractors=(
                Extractor("body", _body(_V2_SUMMARY, _V2_PARAGRAPH, _V2_SUBHEAD)),
                Extractor("topics", _topics_nodes(_V2_TOPIC), default=list),
                Extractor("publishing_date", _publishing_date),
                Extractor("authors", _authors_v2, default=list),
                Extractor("title", _title_v23),
                Extractor("images", _images(_V2_PARAGRAPH, _V2_CAPTION, _V2_CREDIT), default=list),
                Extractor("free_access", _free_access, default=False),
            ),
        ),
        VersionSpec(
            name="V3",
            extractors=(
                Extractor("body", _body(_V3_SUMMARY, _V3_PARAGRAPH, _V3_SUBHEAD)),
                Extractor("topics", _topics_nodes(_V3_TOPIC), default=list),
                Extractor("publishing_date", _publishing_date),
                Extractor("authors", _authors_v3, default=list),
                Extractor("title", _title_v23),
                Extractor("images", _images(_V3_PARAGRAPH, _V3_CAPTION, _V3_CREDIT), default=list),
                Extractor("free_access", _free_access, default=False),
            ),
        ),
    ),
)
