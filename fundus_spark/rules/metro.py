"""Metro rule spec — semantics per reference
``src/fundus/publishers/uk/metro.py`` (V1 valid until 2024-11-17,
V1_1 after; bloat paragraphs filtered by re:test).
"""

from __future__ import annotations

import datetime
import re
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

_BLOAT = (
    r"^Got a story|"
    r"^Get in touch with our news team|"
    r"^Get in touch by emailing|"
    r"^If you’ve got a celebrity story|"
    r"^For more stories|"
    r"^Follow Metro|"
    r"^\s*MORE :|"
    r"^Share your views in the comments|"
    r"^Email gamecentral@metro.co.uk|"
    r"^To submit Inbox letters and Reader’s Features more easily|"
    r"^Do you have a story to share?"
)

_V1_SUMMARY = XPath("//article / div[@class='article-body'] / p[1]")
_V1_SUBHEAD = CSSSelector("article > div.article-body > h2")
_V1_PARAGRAPH = XPath(
    f"//article /div[@class='article-body'] /p[position()>1 and not(re:test(string(), '{_BLOAT}'))]"
)

_V11_SUMMARY = XPath("//article//div[@class='article__content__inner']/p[1]")
_V11_PARAGRAPH = XPath("//article//div[@class='article__content__inner']/p[not(@class) and position()>1]")
_V11_SUBHEAD = XPath("//article//div[@class='article__content__inner']/h2")

_UPPER = XPath("//article")
_CREDIT = re.compile(r"(?P<credits>\([^(]+\)$)")


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


def _authors(ctx: ParseContext) -> List[str]:
    return generic_author_parsing(ctx.ld.bf_search("author"))


def _title(ctx: ParseContext) -> Optional[str]:
    return ctx.ld.bf_search("headline")


def _topics(ctx: ParseContext) -> List[str]:
    return generic_topic_parsing(ctx.meta.get("article:tag"))


def _images(paragraph):
    def fn(ctx: ParseContext) -> List[Dict[str, Any]]:
        return [
            img.serialize()
            for img in image_extraction(
                doc=ctx.doc,
                paragraph_selector=paragraph,
                upper_boundary_selector=_UPPER,
                author_selector=_CREDIT,
            )
        ]

    return fn


def _free_access(ctx: ParseContext) -> bool:
    return free_access_from_ld(ctx.ld)


_COMMON = [
    Extractor("publishing_date", _publishing_date),
    Extractor("authors", _authors, default=list),
    Extractor("title", _title),
    Extractor("topics", _topics, default=list),
    Extractor("free_access", _free_access, default=False),
]

METRO = PublisherSpec(
    key="uk.Metro",
    versions=(
        VersionSpec(
            name="V1",
            valid_until=datetime.date(2024, 11, 17),
            extractors=tuple(
                [
                    Extractor("body", _body(_V1_SUMMARY, _V1_PARAGRAPH, _V1_SUBHEAD)),
                    Extractor("images", _images(_V1_PARAGRAPH), default=list),
                ]
                + _COMMON
            ),
        ),
        VersionSpec(
            name="V1_1",
            extractors=tuple(
                [
                    Extractor("body", _body(_V11_SUMMARY, _V11_PARAGRAPH, _V11_SUBHEAD)),
                    Extractor("images", _images(_V11_PARAGRAPH), default=list),
                ]
                + _COMMON
            ),
        ),
    ),
)
