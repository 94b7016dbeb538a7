"""Financial Post rule spec — reference
``src/fundus/publishers/ca/financial_post.py`` (PostMedia tenant with a
priority-0 whole-document ``<br>``-to-paragraph rewrite).
"""

from __future__ import annotations

from ..kernel import Extractor, ParseContext, PublisherSpec, VersionSpec, XPath, transform_breaks_to_tag
from .postmedia import postmedia_extractors

_PARAGRAPH = XPath(
    "//div[@class='story-v2-content-element-inline']/p[not(starts-with(text(), '—')) and (span[text()] or text())]"
)
_SUBHEAD = XPath(
    "//div[@class='story-v2-content-element-inline']/*[self::h3 or self::b] |"
    "//div[@class='story-v2-content-element-inline']/p/*[(self::strong or self::b) and not(text())]"
)


def _replace_br_tags(ctx: ParseContext) -> None:
    transform_breaks_to_tag(ctx.doc)


FINANCIAL_POST = PublisherSpec(
    key="ca.FinancialPost",
    versions=(
        VersionSpec(
            name="V1",
            extractors=postmedia_extractors(
                paragraph=_PARAGRAPH,
                subheadline=_SUBHEAD,
                extra_bloat=frozenset(
                    {"financialpost.com", "wired", "Business Wire News Releases", "PMN Press Releases"}
                ),
                extra=(Extractor("_replace_br_tags", _replace_br_tags, kind="function", priority=0),),
            ),
        ),
    ),
)
