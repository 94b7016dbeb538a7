"""netzpolitik.org rule spec — semantics per reference
``src/fundus/publishers/de/netzpolitik_org.py`` (single V1).
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
    generic_nodes_to_text,
    generic_topic_parsing,
    image_extraction,
    parse_title_from_root,
)

_PARAGRAPH = CSSSelector("div.entry-content p")
_SUMMARY = CSSSelector("div.entry-excerpt > p")
_SUBHEAD = CSSSelector("div.entry-content > h3")
_AUTHOR = CSSSelector("span > a[rel='author'], .np-intro-author-name-list a")
_TOPIC = CSSSelector("div.entry-footer__tags li, .wp-block-post-terms a")
_BLOAT_TOPICS = {"Netzpolitischer Wochenrückblick"}
_IMAGE = XPath("//figure//img[not(contains(@class, 'author-avatars'))]")
_CAPTION = XPath("./ancestor::figure//figcaption/text()")
_CREDIT = XPath("./ancestor::figure//figcaption/span")


def _title(ctx: ParseContext) -> Optional[str]:
    return ctx.meta.get("og:title") or parse_title_from_root(ctx.doc)


def _body(ctx: ParseContext) -> Optional[Dict[str, Any]]:
    return assemble_body(
        ctx.doc,
        summary_selector=_SUMMARY,
        subheadline_selector=_SUBHEAD,
        paragraph_selector=_PARAGRAPH,
    )


def _topics(ctx: ParseContext) -> List[str]:
    return generic_topic_parsing(
        generic_nodes_to_text(_TOPIC(ctx.doc), normalize=True), result_filter=_BLOAT_TOPICS
    )


def _publishing_date(ctx: ParseContext) -> Optional[datetime.datetime]:
    return generic_date_parsing(ctx.meta.get("article:published_time"))


def _authors(ctx: ParseContext) -> List[str]:
    return generic_author_parsing(generic_nodes_to_text(_AUTHOR(ctx.doc)))


def _images(ctx: ParseContext) -> List[Dict[str, Any]]:
    return [
        img.serialize()
        for img in image_extraction(
            doc=ctx.doc,
            image_selector=_IMAGE,
            paragraph_selector=_PARAGRAPH,
            caption_selector=_CAPTION,
            author_selector=_CREDIT,
        )
    ]


def _free_access(ctx: ParseContext) -> bool:
    return free_access_from_ld(ctx.ld)


NETZPOLITIK_ORG = PublisherSpec(
    key="de.NetzpolitikOrg",
    versions=(
        VersionSpec(
            name="V1",
            extractors=(
                Extractor("title", _title),
                Extractor("body", _body),
                Extractor("topics", _topics, default=list),
                Extractor("publishing_date", _publishing_date),
                Extractor("authors", _authors, default=list),
                Extractor("images", _images, default=list),
                Extractor("free_access", _free_access, default=False),
            ),
        ),
    ),
)
