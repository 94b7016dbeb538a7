"""DOM rewrite helpers used by ``@function`` rule steps.

``transform_breaks_to_tag`` mirrors the reference's
``src/fundus/parser/utility.py:315-376``: serialize the element,
split its inner HTML on literal ``<br>`` tags, and re-attach each
fragment wrapped in a new tag (default ``<p class='br-wrap'>``) —
either appended to the cleared element or replacing it in its parent.
Used by 9 reference publisher parsers (e.g.
``publishers/de/berliner_zeitung.py``).
"""

from __future__ import annotations

import re
from typing import List, Optional

from .dom import VOID_ELEMENTS, Comment, Element, parse_html

__all__ = ["serialize_html", "transform_breaks_to_tag"]

# serialized without a closing tag, matching lxml's method="html"
# output (<br/> prints as "<br>"). MUST be the same set the DOM builder
# treats as childless — libxml2's HTML4 empty list, NOT the HTML5 void
# list — or a serialize->reparse round trip (transform_breaks_to_tag)
# silently drops children of elements like <source>.
_VOID = VOID_ELEMENTS | {"br"}

_TEXT_ESCAPES = {"&": "&amp;", "<": "&lt;", ">": "&gt;"}


def _escape_text(s: str) -> str:
    return re.sub(r"[&<>]", lambda m: _TEXT_ESCAPES[m.group()], s)


def _escape_attr(s: str) -> str:
    return s.replace("&", "&amp;").replace('"', "&quot;")


def serialize_html(el: Element) -> str:
    """Outer-HTML serialization (lxml ``tostring(method='html')``
    equivalent for the subset our DOM represents)."""
    parts: List[str] = []

    def walk(node: Element) -> None:
        if isinstance(node, Comment):
            parts.append(f"<!--{node.text or ''}-->")
            if node.tail:
                parts.append(_escape_text(node.tail))
            return
        attrs = "".join(f' {name}="{_escape_attr(value)}"' for name, value in node.attrib.items())
        parts.append(f"<{node.tag}{attrs}>")
        if node.tag not in _VOID:
            if node.text:
                # script/style are CDATA in HTML serialization: lxml's
                # method='html' emits their text raw, never re-escaped
                parts.append(node.text if node.tag in ("script", "style") else _escape_text(node.text))
            for child in node.children:
                walk(child)
            parts.append(f"</{node.tag}>")
        if node.tail:
            parts.append(_escape_text(node.tail))

    tail, el.tail = el.tail, None  # outer serialization excludes the tail
    try:
        walk(el)
    finally:
        el.tail = tail
    return "".join(parts)


def serialize_xml(el: Element) -> str:
    """``lxml.etree.tostring(doc)`` analogue (XML method): EVERY empty
    element self-closes as ``<tag/>``, including non-void ones. The
    reference's il Giornale preprocess serializes this way and then
    re-parses with the HTML parser — which treats ``<div/>`` as an OPEN
    tag, nesting following siblings inside the 'empty' element. Rules
    that mirror that round trip must use this serializer."""
    parts: List[str] = []

    def walk(node: Element) -> None:
        if isinstance(node, Comment):
            parts.append(f"<!--{node.text or ''}-->")
            if node.tail:
                parts.append(_escape_text(node.tail))
            return
        attrs = "".join(f' {name}="{_escape_attr(value)}"' for name, value in node.attrib.items())
        if not node.text and not node.children:
            parts.append(f"<{node.tag}{attrs}/>")
        else:
            parts.append(f"<{node.tag}{attrs}>")
            if node.text:
                parts.append(_escape_text(node.text))
            for child in node.children:
                walk(child)
            parts.append(f"</{node.tag}>")
        if node.tail:
            parts.append(_escape_text(node.tail))

    tail, el.tail = el.tail, None
    try:
        walk(el)
    finally:
        el.tail = tail
    return "".join(parts)


def _fragment(html: str) -> Optional[Element]:
    """Parse an HTML fragment (the ``lxml.html.fromstring`` analogue):
    a fragment whose body holds a single element returns that element;
    a multi-rooted one returns a ``body``-tagged wrapper — exactly what
    lxml's fromstring does (it hands back the parsed <body> element).
    Children that land at html level (e.g. scripts after an embedded
    ``</head>``) are kept in document order; dropping them would lose
    content (il Giornale's whole-document rewrap depends on this).

    Documented deviation vs lxml: bare leading text ('text<div>..')
    never lands in ``body.text`` here — the parser's implied-<p> rule
    (libxml2 parity, kernel/dom.py) wraps it in a synthesized <p>
    element, so the text survives as a child instead of as wrapper
    ``.text`` (lxml would hand back a div-wrapper with ``.text``).
    Content-equal either way; pinned by
    ``test_fragment_keeps_leading_text`` in tests/test_kernel_units.py."""
    doc = parse_html(html)
    children: list = []
    root = None
    for node in doc.iter():
        if node.tag == "html":
            root = node
            break
    if root is None:
        return None
    for node in root.children:
        if node.tag in ("head", "body") and not isinstance(node, Comment):
            children.extend(node.children)
        else:
            children.append(node)
    if not children:
        return None
    if len(children) == 1:
        return children[0]
    wrapper = Element("body")
    for child in children:
        wrapper.append(child)
    return wrapper


_INNER_RE = re.compile(r"^<[^>]*?>\s*(?P<content>.*?)\s*<[^>]*?>\s*$", re.S)
_DUNDER_RE = re.compile(r"^__(.*?)__$")


def transform_breaks_to_tag(element: Element, tag: str = "p", replace: bool = False, **attribs: str) -> None:
    # NOTE: despite the reference docstring's claim of a br-wrap default,
    # its code adds NO attributes when none are passed — match the code.
    if attribs:
        attribs = {_DUNDER_RE.sub(r"\1", key): value for key, value in attribs.items()}

    raw_html = serialize_html(element)
    match = _INNER_RE.match(raw_html)
    if not match:
        return None
    content = match.group("content")
    paragraphs = [text.strip() for text in content.split("<br>") if text.strip()]
    if not paragraphs:
        return None

    attr_str = " ".join(f"{name}='{value}'" for name, value in attribs.items()) if attribs else ""
    wrapped = [f"<{tag}{' ' + attr_str}>{paragraph}</{tag}>" for paragraph in paragraphs]

    if replace:
        parent = element.getparent()
        if parent is None:
            raise NotImplementedError("Cannot replace elements without parent element")
        previous_attrs = dict(element.attrib)
        previous_index = parent.index(element)
        parent.remove(element)
        for new_index, paragraph in enumerate(wrapped, previous_index):
            new_paragraph = _fragment(paragraph)
            if new_paragraph is None:
                continue
            new_paragraph.attrib.update(previous_attrs)
            new_paragraph.tail = None
            parent.insert(new_index, new_paragraph)
    else:
        for child in list(element.children):
            element.remove(child)
        element.tail = None
        element.text = None
        for paragraph in wrapped:
            new_paragraph = _fragment(paragraph)
            if new_paragraph is not None:
                new_paragraph.tail = None
                element.append(new_paragraph)
    return None
