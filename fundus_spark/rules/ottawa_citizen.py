"""Ottawa Citizen rule spec — reference
``src/fundus/publishers/ca/ottawa_citizen.py`` (PostMedia tenant
inheriting NationalPost V1_1 with its own body selectors).
"""

from __future__ import annotations

from ..kernel import PublisherSpec, VersionSpec, XPath
from .postmedia import postmedia_extractors

_PARAGRAPH = XPath(
    "//div[@class='story-v2-content-element-inline']/p[span[text()] or text()] | "
    "//div[@class='story-v2-content-element-inline']/*[self::ol or self::ul]/li"
)
_SUBHEAD = XPath(
    "//div[@class='story-v2-content-element-inline']/*[(self::h2 or self::h3) and not(re:test(string(), '(?i)^read the questions and answers'))] |"
    "//div[@class='story-v2-content-element-inline']/p/*[(self::strong or self::b) and not(text())]"
)

OTTAWA_CITIZEN = PublisherSpec(
    key="ca.OttawaCitizen",
    versions=(
        VersionSpec(
            name="V1",
            extractors=postmedia_extractors(
                paragraph=_PARAGRAPH,
                subheadline=_SUBHEAD,
                extra_bloat=frozenset({"nationalpost.com", "ottawacitizen.com", "ottawa sun"}),
            ),
        ),
    ),
)
