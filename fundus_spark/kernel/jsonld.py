"""JSON-LD harvesting and querying with reference-equal semantics.

Parity targets:
* script extraction + JSON sanitizing — reference
  ``src/fundus/parser/utility.py:208-266``
* ``@graph`` flattening / @type mapping / same-type collisions —
  ``src/fundus/parser/data.py:47-107``
* breadth-first key search — ``data.py:226-291``
* path search: the reference routes queries through an XML
  serialization and XPath (``data.py:145-224``); the observable
  semantics for the query shapes publisher rules use
  (``A/b`` , ``//A/b``, scalar mode, value stringification, empty
  filtering) are reproduced here directly over the JSON tree —
  no XML detour needed.
"""

from __future__ import annotations

import html as _html
import json
import re
from typing import Any, Dict, Iterable, Iterator, List, Optional, Union

from .dom import Element
from .xpath import XPath

__all__ = ["LinkedData", "extract_linked_data", "sanitize_json_text", "parse_json_text"]

_LD_SCRIPT_SELECTOR = XPath("//script[@type='application/ld+json']")

# capture {...} or [ {...} ] (not followed by a closing brace) — same
# capture rule as the reference (utility.py:209-210)
_JSON_BODY = re.compile(r"(?P<json>{[\s\S]*}|\[\s*{[\s\S]*}\s*](?!\s*}))")
_JSON_UNDEFINED = re.compile(r'(?P<key>"[^"]*?"):\s*undefined')
_CTRL_WS = re.compile(r"[\r\n\t]+")

_MISSING = object()


def sanitize_json_text(text: str) -> Optional[str]:
    match = _JSON_BODY.search(text)
    if match is None or not (body := match.group("json")):
        return None
    body = _JSON_UNDEFINED.sub(r"\g<key>:null", body)
    return _CTRL_WS.sub("", body)


def _unescape_strings(obj: Any) -> Any:
    if isinstance(obj, str):
        return _html.unescape(obj)
    if isinstance(obj, list):
        return [_unescape_strings(v) for v in obj]
    if isinstance(obj, dict):
        return {k: _unescape_strings(v) for k, v in obj.items()}
    return obj


def parse_json_text(text: str) -> Optional[Any]:
    if not (body := sanitize_json_text(text)):
        return None
    try:
        return _unescape_strings(json.loads(body))
    except json.JSONDecodeError:
        return None


def _iter_dicts(obj: Any) -> Iterator[Dict[str, Any]]:
    """Flatten arbitrarily nested lists, yielding dicts (the reference
    uses ``more_itertools.collapse(..., base_type=dict)``)."""
    if isinstance(obj, dict):
        yield obj
    elif isinstance(obj, (list, tuple)):
        for item in obj:
            yield from _iter_dicts(item)


class LinkedData:
    """@type -> JSON-LD mapping (reference ``LinkedDataMapping``)."""

    UNKNOWN_TYPE = "UNKNOWN_TYPE"

    def __init__(self, lds: Iterable[Dict[str, Any]] = ()):
        self._by_type: Dict[str, Any] = {}
        for ld in lds:
            if graph := ld.get("@graph"):
                for nested in graph:
                    self.add(nested)
            else:
                self.add(ld)

    def add(self, ld: Dict[str, Any], name: Optional[str] = None) -> None:
        ld_type = name or ld.get("@type")
        if ld_type:
            if isinstance(ld_type, str):
                self._slot(ld, ld_type)
            elif isinstance(ld_type, list):
                for t in ld_type:
                    self._slot(ld, t)
            else:
                raise NotImplementedError(f"Unexpected LD type {type(ld_type)}")
        else:
            self._slot(ld, self.UNKNOWN_TYPE)

    def _slot(self, ld: Dict[str, Any], ld_type: str) -> None:
        existing = self._by_type.get(ld_type)
        if existing is not None:
            if not isinstance(existing, list):
                self._by_type[ld_type] = [existing]
            self._by_type[ld_type].append(ld)
        else:
            self._by_type[ld_type] = ld

    def serialize(self) -> Dict[str, Any]:
        return dict(self._by_type)

    def __bool__(self) -> bool:
        return bool(self._by_type)

    # --- breadth-first key search (parity with data.py:226-291) --------
    def bf_search(self, key: str, depth: Optional[int] = None, default: Any = None) -> Any:
        def collapse_values(node: Dict[str, Any]) -> Iterator[Dict[str, Any]]:
            for value in node.values():
                yield from _iter_dicts(value)

        def recurse(nodes: List[Any], level: int) -> Any:
            if level == depth:
                return _MISSING
            frontier: List[Dict[str, Any]] = []
            for node in nodes:
                if isinstance(node, list):
                    frontier.extend(node)
                    continue
                value = node.get(key, _MISSING)
                if value is not _MISSING:
                    return value
                frontier.extend(collapse_values(node))
            if not frontier:
                return _MISSING
            return recurse(frontier, level + 1)

        result = recurse([self._by_type], 0)
        return default if result is _MISSING else result

    # --- path search (observable parity with data.py:151-224) -----------
    def xpath_search(self, query: str, scalar: bool = False) -> Any:
        query = query.strip()
        # positional index on a parenthesized path: "(//Article//headline)[1]".
        # Parse the index suffix FIRST and re-wrap union inners so
        # "(//A | //B)[1]" means first-of-union (the old inner pattern
        # [^()|]+ silently degraded that to an empty result).
        index: Optional[int] = None
        pos = re.match(r"^\(\s*(?P<inner>.+?)\s*\)\s*\[(?P<n>\d+)\]$", query)
        if pos:
            inner = pos.group("inner").strip()
            index = int(pos.group("n"))
            query = f"({inner})" if "|" in inner else inner
        # parenthesized unions: "(//Article | //NewsArticle) /author"
        # (used by e.g. the NDR parser) — fan out each alternative with
        # the shared tail
        union = re.match(r"^\(\s*(?P<alts>[^()]+\|[^()]+)\s*\)\s*(?P<tail>/.*)?$", query)
        if union:
            tail = union.group("tail") or ""
            matches = []
            for alt in union.group("alts").split("|"):
                matches.extend(_path_matches(self._by_type, _parse_path(alt.strip() + tail)))
        else:
            matches = _path_matches(self._by_type, _parse_path(query))
        if index is not None:
            matches = matches[index - 1 : index]
        values = [v for v in (_stringify(m) for m in matches) if v]
        if scalar:
            if not values:
                return None
            if len(values) == 1:
                return values[0]
            raise ValueError("Got multiple values when expecting a single scalar value")
        return values

    def __repr__(self) -> str:
        keys = ", ".join(self._by_type)
        return f"LinkedData({keys})" if keys else "Empty LinkedData"


def _parse_path(query: str) -> List[Tuple[bool, str]]:
    """Split an LD path query into (descendant, key) steps —
    ``//a/b//c`` -> [(True,'a'), (False,'b'), (True,'c')]. A bare
    leading name keeps the repo's historical direct-child-of-root
    semantics (``NewsArticle/headline``)."""
    return [(m.group(1) == "//", m.group(2)) for m in re.finditer(r"(/{0,2})([^/]+)", query.strip())]


def _path_matches(tree: Dict[str, Any], path: List[Tuple[bool, str]]) -> List[Any]:
    """All values reached by the key path. List values fan out (the
    reference's XML rendering turns JSON lists into repeated sibling
    tags, so an XPath step matches each element); a descendant step
    (``//key``) matches the key at any depth below the current value."""

    def descend(value: Any, rest: List[Tuple[bool, str]]) -> List[Any]:
        out: List[Any] = []
        if isinstance(value, list):
            for item in value:
                out.extend(descend(item, rest))
            return out
        if not rest:
            return [value]
        anywhere, key = rest[0]
        if anywhere:
            out.extend(_find_anywhere(value, key, rest[1:]))
            return out
        if isinstance(value, dict):
            if key == "*":
                # wildcard step: any child key (reference XPath '/*/',
                # e.g. '//BreadcrumbList/itemListElement/*/name')
                for child in value.values():
                    out.extend(descend(child, rest[1:]))
            elif key in value:
                out.extend(descend(value[key], rest[1:]))
        return out

    def _find_anywhere(obj: Any, key: str, rest: List[Tuple[bool, str]]) -> List[Any]:
        found: List[Any] = []

        def walk(o: Any) -> None:
            if isinstance(o, dict):
                for k, v in o.items():
                    if k == key:
                        found.extend(descend(v, rest))
                    walk(v)
            elif isinstance(o, list):
                for item in o:
                    walk(item)

        walk(obj)
        return found

    return descend(tree, path)


def _stringify(value: Any) -> Any:
    """Convert a matched JSON value the way the reference's XML
    round-trip would: scalars become strings (True -> 'True'),
    None -> '', dicts keep structure with stringified leaves."""
    if value is None:
        return ""
    if isinstance(value, bool):
        return str(value)
    if isinstance(value, (int, float)):
        return str(value)
    if isinstance(value, str):
        return value
    if isinstance(value, dict):
        return {k: _stringify(v) for k, v in value.items()}
    if isinstance(value, list):
        return [_stringify(v) for v in value]
    return str(value)


def extract_linked_data(root: Element) -> LinkedData:
    parsed: List[Any] = []
    for node in _LD_SCRIPT_SELECTOR(root):
        if (obj := parse_json_text(node.text_content())) is not None:
            parsed.append(obj)
    return LinkedData(_iter_dicts(parsed))
