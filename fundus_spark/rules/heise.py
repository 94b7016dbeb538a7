"""Heise rule spec — semantics per reference
``src/fundus/publishers/de/heise.py`` (single V1; note the reference's
``contains(class, article-content)`` predicate compares element-name
node-sets, which degenerates to always-true — preserved verbatim).
"""

from __future__ import annotations

import datetime
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

_SUMMARY = XPath(
    "//article[not(@data-component='TeaserContainer')]//p[@class='a-article-header__lead'] | "
    "//article[not(@data-component='TeaserContainer')]//div[@id='lead']/p"
)
_SUBHEAD = XPath(
    "//article[not(@data-component='TeaserContainer')]//h3[contains(@class,'subheading')] | "
    "//article[not(@data-component='TeaserContainer')]//h2[@class='heading-h2 replaced-h1']"
)
_PARAGRAPH = XPath(
    "//div[contains(class, article-content)]/p[not(@class"
    " or ((string-length(text()) < 3) and (contains(text(), '(') or contains(span, '(')))"
    " or contains(text(), '=== Anzeige / Sponsorenhinweis')"
    " or contains(text(), 'Tipp: Wir sind bei WhatsApp!')"
    " or contains(a, 'heise+ abonnieren')"
    " or contains(text(), '► '))"
    " or @class='antwort rte__abs--antwort'"
    " or @class='frage rte__abs--frage'"
    " or @class='json-ld-paid-content-marker'] "
    " | //div[contains(class, article-content)]//ul["
    "@class='rte__list rte__list--unordered' or @class='boxtext']/li | "
    "//div[@class='ringCommonDetail ringBlockType-paragraph ']/p"
    " | //div[@class='ringCommonDetail ringBlockType-paragraph ']//ul/li"
)
_UPPER = XPath("//h1[@class='article-headline ' or contains(@class, 'a-article-header__title')]")
_IMAGE = XPath(
    "//div[@class='article-image__gallery-container']//img|"
    "//div[@class='image-container']//img|"
    "//div[@class='article-layout__content']//figure[not(@class)]//noscript//img"
)
_CAPTION = XPath(
    "./ancestor::figure//p[@class='a-caption__text']|"
    "./ancestor::figure//div[@class='text']|"
    "./ancestor::div[@class='article-gallery ']//span[@class='caption']"
)
_CREDIT = XPath(
    "./ancestor::figure//p[@class='a-caption__source']|"
    "./ancestor::div[@class='article-gallery ']//span[@class='copyright']"
)


def _body(ctx: ParseContext) -> Optional[Dict[str, Any]]:
    return assemble_body(
        ctx.doc,
        summary_selector=_SUMMARY,
        subheadline_selector=_SUBHEAD,
        paragraph_selector=_PARAGRAPH,
    )


def _authors(ctx: ParseContext) -> List[str]:
    return generic_author_parsing(ctx.ld.bf_search("author"))


def _publishing_date(ctx: ParseContext) -> Optional[datetime.datetime]:
    return generic_date_parsing(ctx.ld.bf_search("datePublished"))


def _title(ctx: ParseContext) -> Optional[str]:
    return ctx.ld.bf_search("headline")


def _topics(ctx: ParseContext) -> List[str]:
    return generic_topic_parsing(ctx.meta.get("keywords"))


def _images(ctx: ParseContext) -> List[Dict[str, Any]]:
    return [
        img.serialize()
        for img in image_extraction(
            doc=ctx.doc,
            paragraph_selector=_PARAGRAPH,
            upper_boundary_selector=_UPPER,
            image_selector=_IMAGE,
            caption_selector=_CAPTION,
            author_selector=_CREDIT,
        )
    ]


def _free_access(ctx: ParseContext) -> bool:
    return free_access_from_ld(ctx.ld)


HEISE = PublisherSpec(
    key="de.Heise",
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
