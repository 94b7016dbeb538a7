"""<meta> harvesting — parity with reference
``src/fundus/parser/utility.py:269-312``.

Keys resolve name > property > http-equiv > itemprop; a ``class``
attribute namespaces the key (``swiftype:author``); single-attribute
tags (``<meta charset=...>``) key on the attribute name; repeated keys
join their contents with ``,``.
"""

from __future__ import annotations

from typing import Dict, List

from .css import CSSSelector
from .dom import Element

__all__ = ["harvest_meta"]

_META_SELECTOR = CSSSelector("head > meta, body > meta, article > meta")


def harvest_meta(root: Element) -> Dict[str, str]:
    collected: Dict[str, List[str]] = {}
    for node in _META_SELECTOR(root):
        attributes = node.attrib
        if len(attributes) == 1:
            only_key = next(iter(attributes))
            collected.setdefault(only_key, []).append(attributes[only_key])
            continue
        key = (
            attributes.get("name")
            or attributes.get("property")
            or attributes.get("http-equiv")
            or attributes.get("itemprop")
        )
        if not key:
            continue
        if ns := attributes.get("class"):
            key = f"{ns}:{key}"
        if content := attributes.get("content"):
            collected.setdefault(key, []).append(content)
    return {key: values[0] if len(values) == 1 else ",".join(values) for key, values in collected.items()}
