"""Rule-spec runner: the engine that turns (html, publisher, ts) into an
extraction dict.

Equivalent role to the reference's ``BaseParser.parse``
(``src/fundus/parser/base_parser.py:281-313``) and the version
dispatch of ``ParserProxy`` (``base_parser.py:360-440``), re-designed
as declarative data + pure functions so rule sets broadcast cleanly to
Spark executors:

* A :class:`PublisherSpec` holds ordered :class:`VersionSpec` entries
  (sorted by ``valid_until``); lookup by timestamp picks the first
  version whose ``valid_until`` >= ts (as-of semantics).
* A :class:`VersionSpec` holds ``extractors`` — named steps with an
  optional priority. Steps of kind ``function`` mutate the DOM; steps
  of kind ``attribute`` produce output. Execution order: priority
  ascending with None last, ties by name (reference
  ``base_parser.py:65-71,225``).
* ``error_handling``: ``raise`` | ``suppress`` (typed default +
  failure counter) | ``catch`` (exception object as value).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import date, datetime
from typing import Any, Callable, Dict, List, Literal, Optional, Tuple

from .dom import Element, parse_html
from .jsonld import LinkedData, extract_linked_data
from .meta import harvest_meta

__all__ = ["ParseContext", "Extractor", "VersionSpec", "PublisherSpec", "run_extraction"]


@dataclass
class ParseContext:
    """Per-document shared parse state (reference ``Precomputed``,
    ``base_parser.py:199-205``)."""

    html: str
    doc: Element
    meta: Dict[str, str]
    ld: LinkedData
    cache: Dict[str, Any] = field(default_factory=dict)


@dataclass(frozen=True)
class Extractor:
    name: str
    fn: Callable[[ParseContext], Any]
    kind: Literal["attribute", "function"] = "attribute"
    priority: Optional[int] = None
    default: Any = None
    validate: bool = True
    deprecated: Optional[date] = None


@dataclass(frozen=True)
class VersionSpec:
    name: str
    extractors: Tuple[Extractor, ...]
    valid_until: date = date.max

    def ordered(self, timestamp: Optional[date] = None) -> List[Extractor]:
        kept = [
            e
            for e in self.extractors
            if e.kind == "function" or timestamp is None or e.deprecated is None or e.deprecated > timestamp
        ]
        return sorted(kept, key=lambda e: ((0, e.priority) if e.priority is not None else (1, 0), e.name))


@dataclass(frozen=True)
class PublisherSpec:
    key: str  # e.g. "us.APNews"
    versions: Tuple[VersionSpec, ...]  # any order; sorted on access

    def sorted_versions(self) -> List[VersionSpec]:
        return sorted(self.versions, key=lambda v: v.valid_until)

    def version_for(self, ts: Optional[datetime] = None) -> VersionSpec:
        ordered = self.sorted_versions()
        if ts is None:
            return ordered[-1]
        day = ts.date() if isinstance(ts, datetime) else ts
        for version in ordered:
            if version.valid_until >= day:
                return version
        raise ValueError(
            f"Couldn't find a fitting parser valid at date {day}. "
            f"Last valid date is {ordered[-1].valid_until}"
        )


def build_context(html: str) -> ParseContext:
    doc = parse_html(html)
    return ParseContext(html=html, doc=doc, meta=harvest_meta(doc), ld=extract_linked_data(doc))


def run_extraction(
    spec: PublisherSpec,
    html: str,
    ts: Optional[datetime] = None,
    error_handling: Literal["suppress", "catch", "raise"] = "raise",
    failures: Optional[List[str]] = None,
) -> Dict[str, Any]:
    """``failures``: optional collector; under ``suppress`` each failing
    attribute appends ``"name: ExcType"`` (the reference logs these at
    debug level, ``base_parser.py:300-305``; we surface them as lineage)."""
    version = spec.version_for(ts)
    ctx = build_context(html)
    day = ts.date() if isinstance(ts, datetime) else ts
    out: Dict[str, Any] = {}
    for step in version.ordered(day):
        if step.kind == "function":
            step.fn(ctx)
            continue
        try:
            out[step.name] = step.fn(ctx)
        except Exception as err:  # noqa: BLE001 — parity with reference error handling
            if error_handling == "suppress":
                out[step.name] = step.default() if callable(step.default) else step.default
                if failures is not None:
                    failures.append(f"{step.name}: {type(err).__name__}")
            elif error_handling == "catch":
                out[step.name] = err
            else:
                raise
    return out
