"""Shared extractor factories for the most common publisher patterns.

Most reference parsers are combinations of the same six moves: body via
selectors, authors/date from JSON-LD ``bf_search``, title from
``og:title`` or LD headline, topics from meta keywords or LD keywords,
bounded image extraction, default ``free_access``. These factories keep
per-publisher rule modules down to their genuinely publisher-specific
selectors while compiling to the identical kernel calls an explicit
module would make.
"""

from __future__ import annotations

import datetime
from typing import Any, Callable, Dict, List, Optional, Pattern, Sequence, Set, Union

from ..kernel import (
    Extractor,
    ParseContext,
    assemble_body,
    free_access_from_ld,
    generic_author_parsing,
    generic_date_parsing,
    generic_topic_parsing,
    image_extraction,
)

Selector = Callable[[Any], Sequence[Any]]


def make_body(
    paragraph: Selector,
    summary: Optional[Selector] = None,
    subheadline: Optional[Selector] = None,
    tag_filter: Optional[Callable[[Any], object]] = None,
) -> Callable[[ParseContext], Optional[Dict[str, Any]]]:
    def fn(ctx: ParseContext) -> Optional[Dict[str, Any]]:
        return assemble_body(
            ctx.doc,
            paragraph_selector=paragraph,
            summary_selector=summary,
            subheadline_selector=subheadline,
            tag_filter=tag_filter,
        )

    return fn


def authors_from_ld(key: str = "author") -> Callable[[ParseContext], List[str]]:
    def fn(ctx: ParseContext) -> List[str]:
        return generic_author_parsing(ctx.ld.bf_search(key))

    return fn


def authors_from_meta(key: str) -> Callable[[ParseContext], List[str]]:
    def fn(ctx: ParseContext) -> List[str]:
        return generic_author_parsing(ctx.meta.get(key))

    return fn


def date_from_ld(key: str = "datePublished") -> Callable[[ParseContext], Optional[datetime.datetime]]:
    def fn(ctx: ParseContext) -> Optional[datetime.datetime]:
        return generic_date_parsing(ctx.ld.bf_search(key))

    return fn


def date_from_meta(key: str) -> Callable[[ParseContext], Optional[datetime.datetime]]:
    def fn(ctx: ParseContext) -> Optional[datetime.datetime]:
        return generic_date_parsing(ctx.meta.get(key))

    return fn


def title_from_meta(key: str = "og:title") -> Callable[[ParseContext], Optional[str]]:
    def fn(ctx: ParseContext) -> Optional[str]:
        return ctx.meta.get(key)

    return fn


def title_from_ld(key: str = "headline") -> Callable[[ParseContext], Optional[str]]:
    def fn(ctx: ParseContext) -> Optional[str]:
        return ctx.ld.bf_search(key)

    return fn


def topics_from_meta(
    key: str = "keywords",
    delimiter: Union[str, List[str]] = ",",
    substitution_pattern: Optional[Pattern[str]] = None,
    result_filter: Optional[Union[Pattern[str], Set[str]]] = None,
) -> Callable[[ParseContext], List[str]]:
    def fn(ctx: ParseContext) -> List[str]:
        return generic_topic_parsing(
            ctx.meta.get(key),
            delimiter=delimiter,
            substitution_pattern=substitution_pattern,
            result_filter=result_filter,
        )

    return fn


def topics_from_ld(
    key: str = "keywords",
    delimiter: Union[str, List[str]] = ",",
    substitution_pattern: Optional[Pattern[str]] = None,
    result_filter: Optional[Union[Pattern[str], Set[str]]] = None,
) -> Callable[[ParseContext], List[str]]:
    def fn(ctx: ParseContext) -> List[str]:
        return generic_topic_parsing(
            ctx.ld.bf_search(key),
            delimiter=delimiter,
            substitution_pattern=substitution_pattern,
            result_filter=result_filter,
        )

    return fn


def make_images(paragraph: Selector, **kwargs: Any) -> Callable[[ParseContext], List[Dict[str, Any]]]:
    def fn(ctx: ParseContext) -> List[Dict[str, Any]]:
        return [img.serialize() for img in image_extraction(doc=ctx.doc, paragraph_selector=paragraph, **kwargs)]

    return fn


def free_access(ctx: ParseContext) -> bool:
    return free_access_from_ld(ctx.ld)


def std_extractors(
    body: Callable[[ParseContext], Any],
    authors: Callable[[ParseContext], Any],
    date: Callable[[ParseContext], Any],
    title: Callable[[ParseContext], Any],
    topics: Callable[[ParseContext], Any],
    images: Optional[Callable[[ParseContext], Any]] = None,
    extra: Sequence[Extractor] = (),
) -> tuple:
    """The canonical attribute set every reference parser carries."""
    out = [
        Extractor("body", body),
        Extractor("authors", authors, default=list),
        Extractor("publishing_date", date),
        Extractor("title", title),
        Extractor("topics", topics, default=list),
        Extractor("free_access", free_access, default=False),
    ]
    if images is not None:
        out.append(Extractor("images", images, default=list))
    out.extend(extra)
    return tuple(out)
