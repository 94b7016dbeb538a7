"""Reuters rule spec — semantics per reference
``src/fundus/publishers/us/reuters.py:16-83`` (V1 valid until
2024-01-01, V1_1 after). Exercises a priority-1 DOM drop_tree mutation.
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
)

_V1_PARAGRAPH = XPath("(//p[starts-with(@data-testid, 'paragraph')])[position() > 1]")
_V1_SUMMARY = XPath("(//p[starts-with(@data-testid, 'paragraph')])[1]")
_SUBHEAD = XPath("//div[contains(@class, 'article-body')] /h2[@data-testid='Heading']")

_V11_PARAGRAPH = XPath("(//div[starts-with(@data-testid, 'paragraph')])[position() > 1]")
_V11_SUMMARY = XPath("(//div[starts-with(@data-testid, 'paragraph')])[1]")
_V11_NEW_TAB_SPAN = XPath(
    "//div[starts-with(@data-testid, 'paragraph')] //span[contains(text(), 'opens new tab')]"
)


def _body(summary_selector, paragraph_selector):
    def fn(ctx: ParseContext) -> Optional[Dict[str, Any]]:
        return assemble_body(
            ctx.doc,
            summary_selector=summary_selector,
            paragraph_selector=paragraph_selector,
            subheadline_selector=_SUBHEAD,
        )

    return fn


def _authors(ctx: ParseContext) -> List[str]:
    return generic_author_parsing(ctx.meta.get("article:author"))


def _publishing_date(ctx: ParseContext) -> Optional[datetime.datetime]:
    return generic_date_parsing(ctx.ld.xpath_search("NewsArticle/datePublished", scalar=True))


def _title(ctx: ParseContext) -> Optional[str]:
    return ctx.ld.xpath_search("NewsArticle/headline", scalar=True)


def _topics(ctx: ParseContext) -> List[str]:
    topics: List[Optional[str]] = [
        ctx.meta.get("article:section"),
        ctx.meta.get("analyticsAttributes.topicChannel"),
        ctx.meta.get("analyticsAttributes.topicSubChannel"),
    ]
    topics.extend(generic_topic_parsing(ctx.meta.get("DCSext.ChannelList"), delimiter=";"))
    return list(dict.fromkeys(topic for topic in topics if topic))


def _drop_new_tab_spans(ctx: ParseContext) -> None:
    """drop_tree: remove the span subtree, preserving its tail on the
    preceding sibling / parent text (lxml drop_tree semantics)."""
    for span in _V11_NEW_TAB_SPAN(ctx.doc):
        parent = span.getparent()
        if parent is None:
            continue
        idx = parent.index(span)
        tail = span.tail or ""
        if tail:
            if idx > 0:
                prev = parent.children[idx - 1]
                prev.tail = (prev.tail or "") + tail
            else:
                parent.text = (parent.text or "") + tail
        parent.remove(span)


def _free_access(ctx: ParseContext) -> bool:
    return free_access_from_ld(ctx.ld)


_COMMON = [
    Extractor("authors", _authors, default=list),
    Extractor("publishing_date", _publishing_date),
    Extractor("title", _title),
    Extractor("topics", _topics, default=list),
    Extractor("free_access", _free_access, default=False),
]

REUTERS = PublisherSpec(
    key="us.Reuters",
    versions=(
        VersionSpec(
            name="V1",
            valid_until=datetime.date(2024, 1, 1),
            extractors=tuple([Extractor("body", _body(_V1_SUMMARY, _V1_PARAGRAPH))] + _COMMON),
        ),
        VersionSpec(
            name="V1_1",
            extractors=tuple(
                [
                    Extractor("_remove_new_tab_span", _drop_new_tab_spans, kind="function", priority=1),
                    Extractor("body", _body(_V11_SUMMARY, _V11_PARAGRAPH)),
                ]
                + _COMMON
            ),
        ),
    ),
)
