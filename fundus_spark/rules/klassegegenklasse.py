"""Klasse Gegen Klasse rule spec — semantics per reference
``src/fundus/publishers/de/klassegegenklasse.py`` (single V1).
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
    strip_nodes_to_text,
)

_PARAGRAPH = XPath(
    "//div[@class='singleContent ']/p[not((not(text()) and em) or re:test(string(.), '^Zum Weiterlesen:'))]"
    " | //ol[@class='footnotesList']/li"
)
_SUMMARY = XPath("//p[@class='singleHeader-excerpt']")
_SUBHEAD = XPath("//div[@class='singleContent ']/h2")
_DATE = XPath("(//div[@class='metaInfoDateTime']/span)[1]")
_AUTHOR = XPath("//ul[@class='metaInfoAuthorList']//li")
_TOPIC = XPath("//ul[@class='singleTagList']//li")
_CREDIT = re.compile(r"(?i)(foto|quelle|bild):\s*(?P<credits>.+)")


def _title(ctx: ParseContext) -> Optional[str]:
    return ctx.meta.get("og:title")


def _body(ctx: ParseContext) -> Optional[Dict[str, Any]]:
    return assemble_body(
        ctx.doc,
        summary_selector=_SUMMARY,
        subheadline_selector=_SUBHEAD,
        paragraph_selector=_PARAGRAPH,
    )


def _authors(ctx: ParseContext) -> List[str]:
    return generic_author_parsing(strip_nodes_to_text(_AUTHOR(ctx.doc)))


def _publishing_date(ctx: ParseContext) -> Optional[datetime.datetime]:
    return generic_date_parsing(strip_nodes_to_text(_DATE(ctx.doc)))


def _topics(ctx: ParseContext) -> List[str]:
    return generic_topic_parsing(generic_nodes_to_text(_TOPIC(ctx.doc), normalize=True))


def _images(ctx: ParseContext) -> List[Dict[str, Any]]:
    return [
        img.serialize()
        for img in image_extraction(doc=ctx.doc, paragraph_selector=_PARAGRAPH, author_selector=_CREDIT)
    ]


def _free_access(ctx: ParseContext) -> bool:
    return free_access_from_ld(ctx.ld)


KLASSE_GEGEN_KLASSE = PublisherSpec(
    key="de.KlasseGegenKlasse",
    versions=(
        VersionSpec(
            name="V1",
            extractors=(
                Extractor("title", _title),
                Extractor("body", _body),
                Extractor("authors", _authors, default=list),
                Extractor("publishing_date", _publishing_date),
                Extractor("topics", _topics, default=list),
                Extractor("images", _images, default=list),
                Extractor("free_access", _free_access, default=False),
            ),
        ),
    ),
)
