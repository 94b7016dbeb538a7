"""Pure-stdlib HTML DOM: tree builder with libxml2-style error recovery.

The reference engine (fundus) leans on lxml/libxml2 for HTML parsing
(``lxml.html.document_fromstring``, see reference
``src/fundus/parser/base_parser.py:277-279``). lxml is not available in
this environment, so this module implements an equivalent DOM from
scratch on top of :class:`html.parser.HTMLParser`:

* ``Element`` mirrors the lxml text/tail model: ``text`` is the text
  before the first child, every node's ``tail`` is the text that
  follows it inside its parent.
* The tree builder applies HTML5-ish implied-end-tag recovery (a subset
  of what libxml2 does): block elements close an open ``<p>``, ``<li>``
  closes ``<li>``, table parts close each other, void elements never
  take children, an implicit ``<html>``/``<head>``/``<body>`` skeleton
  is created.
* ``Comment`` nodes participate in document order (lxml's ``iter()``
  yields comments too, and the reference's depth-first indexing relies
  on that — see reference ``src/fundus/parser/data.py:572``).

Only behaviors the extraction kernel needs are implemented; this is not
a general-purpose browser parser.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Dict, Iterator, List, Optional, Tuple

__all__ = ["Element", "Comment", "parse_html", "document_order_index"]


# libxml2's HTML4 element table (the reference's parser) — NOT the
# HTML5 void list: html5-void elements unknown to HTML4 (source, track,
# wbr, embed, ...) are parsed as CONTAINERS by libxml2, nesting
# following siblings inside them (observable in goldens: NTVTR's
# `//picture/img` must NOT match an img behind three open <source>s).
VOID_ELEMENTS = frozenset(
    "area base basefont br col frame hr img input isindex link meta param".split()
)

# libxml2's html40ElementTable: elements KNOWN to its HTML4 model. For
# these, a trailing '/' in a start tag is ignored garbage (<div/> stays
# OPEN); for unknown elements (source, picture, svg, custom tags, ...)
# libxml2 honors XML empty-element syntax (<source/> is closed).
HTML4_ELEMENTS = frozenset(
    (
        "a abbr acronym address applet area b base basefont bdo big blockquote body br button caption "
        "center cite code col colgroup dd del dfn dir div dl dt em fieldset font form frame frameset "
        "h1 h2 h3 h4 h5 h6 head hr html i iframe img input ins isindex kbd label legend li link map "
        "menu meta noframes noscript object ol optgroup option p param pre q s samp script select "
        "small span strike strong style sub sup table tbody td textarea tfoot th thead title tr tt u ul var"
    ).split()
)

# Tags whose start auto-closes an open <p>. Parity note: this is the
# HTML 4.01 block set that libxml2 (the reference's lxml backend) uses —
# NOT the HTML5 list. HTML5-only elements (section, article, aside,
# figure, header, footer, nav, ...) are unknown to libxml2 and stay
# NESTED inside <p>, and golden bodies rely on that (e.g. RollingStone
# embeds a <section> "Trending" module inside a body paragraph).
_P_CLOSERS = frozenset(
    (
        "address blockquote center dir div dl fieldset form "
        "h1 h2 h3 h4 h5 h6 hr menu ol p pre table ul"
    ).split()
)

# tag -> set of open tags that the new tag auto-closes (nearest first)
_SIBLING_CLOSERS: Dict[str, frozenset] = {
    "li": frozenset({"li"}),
    "dt": frozenset({"dt", "dd"}),
    "dd": frozenset({"dt", "dd"}),
    "tr": frozenset({"tr", "td", "th"}),
    "td": frozenset({"td", "th"}),
    "th": frozenset({"td", "th"}),
    "thead": frozenset({"tr", "td", "th", "tbody", "tfoot", "thead", "caption", "colgroup"}),
    "tbody": frozenset({"tr", "td", "th", "tbody", "tfoot", "thead", "caption", "colgroup"}),
    "tfoot": frozenset({"tr", "td", "th", "tbody", "thead", "caption", "colgroup"}),
    "option": frozenset({"option"}),
    "optgroup": frozenset({"option", "optgroup"}),
    "a": frozenset({"a"}),
    "button": frozenset({"button"}),
}

# Elements whose open presence bounds sibling auto-closing (scope
# boundaries): never auto-close past these.
_HEAD_TAGS = frozenset("title meta link base basefont style script noscript template isindex".split())


class Element:
    """An HTML element with lxml-compatible text/tail semantics."""

    __slots__ = ("tag", "attrib", "text", "tail", "_children", "_parent")

    def __init__(self, tag: str, attrib: Optional[Dict[str, str]] = None):
        self.tag = tag
        self.attrib: Dict[str, str] = attrib if attrib is not None else {}
        self.text: Optional[str] = None
        self.tail: Optional[str] = None
        self._children: List["Element"] = []
        self._parent: Optional["Element"] = None

    # --- tree accessors -------------------------------------------------
    def getparent(self) -> Optional["Element"]:
        return self._parent

    def append(self, child: "Element") -> None:
        child._parent = self
        self._children.append(child)

    def insert(self, index: int, child: "Element") -> None:
        child._parent = self
        self._children.insert(index, child)

    def remove(self, child: "Element") -> None:
        self._children.remove(child)
        child._parent = None

    def index(self, child: "Element") -> int:
        return self._children.index(child)

    def __len__(self) -> int:
        return len(self._children)

    def __iter__(self) -> Iterator["Element"]:
        return iter(self._children)

    def __getitem__(self, i):
        return self._children[i]

    @property
    def children(self) -> List["Element"]:
        return self._children

    def iterchildren(self) -> Iterator["Element"]:
        return iter(self._children)

    def iter(self) -> Iterator["Element"]:
        """Depth-first traversal including self and comments."""
        stack: List[Element] = [self]
        while stack:
            node = stack.pop()
            yield node
            stack.extend(reversed(node._children))

    def iterancestors(self) -> Iterator["Element"]:
        node = self._parent
        while node is not None:
            yield node
            node = node._parent

    # --- attribute access -----------------------------------------------
    def get(self, key: str, default: Optional[str] = None) -> Optional[str]:
        return self.attrib.get(key, default)

    def set(self, key: str, value: str) -> None:
        self.attrib[key] = value

    def classes(self) -> List[str]:
        return (self.attrib.get("class") or "").split()

    # --- text -----------------------------------------------------------
    def text_content(self) -> str:
        """All text of self and descendants, comments excluded, like
        lxml's ``Element.text_content()``."""
        parts: List[str] = []

        def walk(node: "Element") -> None:
            if node.text:
                parts.append(node.text)
            for child in node._children:
                if not isinstance(child, Comment):
                    walk(child)
                if child.tail:
                    parts.append(child.tail)

        walk(self)
        return "".join(parts)

    def deepcopy(self) -> "Element":
        clone = Comment(self.text or "") if isinstance(self, Comment) else Element(self.tag, dict(self.attrib))
        clone.text = self.text
        clone.tail = self.tail
        for child in self._children:
            clone.append(child.deepcopy())
        return clone

    def __repr__(self) -> str:
        return f"<Element {self.tag} at 0x{id(self):x}>"


class Comment(Element):
    """Comment pseudo-element; has no tag match, no attributes."""

    __slots__ = ()

    def __init__(self, text: str = ""):
        super().__init__("#comment")
        self.text = text

    def __repr__(self) -> str:
        return f"<Comment at 0x{id(self):x}>"


class ProcessingInstruction(Comment):
    """``<?...?>`` node. libxml2 keeps PIs in the tree and ``iter()``
    yields them, so they count toward document-order positions (golden
    image positions depend on this); like comments they contribute no
    text and match no tag test."""

    __slots__ = ()

    def __init__(self, text: str = ""):
        super().__init__(text)
        self.tag = "#pi"

    def __repr__(self) -> str:
        return f"<PI at 0x{id(self):x}>"


def document_order_index(root: Element) -> Dict[int, int]:
    """Depth-first index keyed by ``id(node)`` (elements are not hashable
    by value). Mirrors the reference's DF indexing of ``doc.iter()``."""
    return {id(node): i for i, node in enumerate(root.iter())}


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root: Optional[Element] = None
        self._stack: List[Element] = []
        self._phase = "initial"  # initial -> head -> body
        self._head: Optional[Element] = None
        self._body: Optional[Element] = None

    # --- skeleton management ---------------------------------------------
    def _ensure_root(self, attrs: Optional[Dict[str, str]] = None) -> Element:
        if self.root is None:
            self.root = Element("html", attrs or {})
            self._stack = [self.root]
        elif attrs:
            # merge attributes of a late/duplicate <html> tag
            for k, v in attrs.items():
                self.root.attrib.setdefault(k, v)
        return self.root

    def _ensure_head(self) -> Element:
        root = self._ensure_root()
        if self._head is None:
            self._head = Element("head")
            if self._body is not None:
                root.insert(root.index(self._body), self._head)
            else:
                # after any pre-head comments (libxml2 keeps document
                # order: <html><!--c--><head> indexes the comment first)
                root.append(self._head)
        self._phase = "head"
        return self._head

    def _ensure_body(self) -> Element:
        root = self._ensure_root()
        if self._body is None:
            self._body = Element("body")
            root.append(self._body)
        if self._phase != "body":
            self._phase = "body"
            # anything still open belongs to head; reset insertion point
            self._stack = [root, self._body]
        return self._body

    def _insertion_parent(self) -> Element:
        return self._stack[-1]

    # --- implied end tags --------------------------------------------------
    def _imply_end_tags(self, tag: str) -> None:
        # libxml2 parity (the reference's lxml backend): auto-close only
        # while the CURRENT node (stack top) is closed by the new tag —
        # an intervening element (even an unknown one like <section>)
        # shields everything beneath it. HTML5's scope-based algorithm
        # would close an open <p> across unknown elements; libxml2 does
        # not, and golden bodies depend on the difference.
        closers = _SIBLING_CLOSERS.get(tag)
        while len(self._stack) > 1:
            top = self._stack[-1].tag
            if tag in _P_CLOSERS and top == "p":
                self._stack.pop()
                continue
            if closers and top in closers:
                self._stack.pop()
                continue
            break

    def _pop_to(self, node: Element) -> None:
        while self._stack and self._stack[-1] is not node:
            self._stack.pop()
        if self._stack:
            self._stack.pop()

    # --- parser callbacks ---------------------------------------------------
    def handle_starttag(self, tag: str, attrs: List[Tuple[str, Optional[str]]]) -> None:
        attrib: Dict[str, str] = {}
        for name, value in attrs:
            if name not in attrib:
                attrib[name] = value if value is not None else ""

        if tag == "html":
            # a nested <html> inside body content is a misplaced tag —
            # libxml2 drops it in place (e.g. HankookIlbo embeds a full
            # html/head/body skeleton inside articleBody)
            if self._phase != "body":
                self._ensure_root(attrib)
            return
        if tag == "head":
            if self._phase != "body":
                self._ensure_head()
                self._stack = [self.root, self._head]  # type: ignore[list-item]
            return
        if tag == "body":
            body = self._ensure_body()
            for k, v in attrib.items():
                body.attrib.setdefault(k, v)
            return

        if self._phase in ("initial", "head"):
            # inside an open head container (<noscript> in head): ALL
            # children nest there — libxml2 keeps e.g. noscript>img in
            # head rather than implying body (LaVanguardia golden)
            if self._stack and self._stack[-1] not in (self.root, self._head):
                el = Element(tag, attrib)
                self._stack[-1].append(el)
                if tag not in VOID_ELEMENTS:
                    self._stack.append(el)
                return
            if tag in _HEAD_TAGS:
                head = self._ensure_head()
                el = Element(tag, attrib)
                head.append(el)
                if tag not in VOID_ELEMENTS:
                    self._stack = [self.root, head, el]  # type: ignore[list-item]
                return
            self._ensure_body()

        if len(self._stack) < 2 and self._phase == "body":
            self._ensure_body()

        self._imply_end_tags(tag)
        el = Element(tag, attrib)
        self._insertion_parent().append(el)
        if tag not in VOID_ELEMENTS:
            self._stack.append(el)

    def handle_startendtag(self, tag: str, attrs: List[Tuple[str, Optional[str]]]) -> None:
        # Empty-tag semantics fitted to the golden corpus (generated
        # with lxml 5.x / libxml2 >= 2.12, whose HTML parser differs
        # from the system 2.9.14 here): elements KNOWN to the HTML4
        # table ignore the trailing slash — <div/> stays OPEN and nests
        # following siblings (il Giornale's rewrap depends on it) —
        # while HTML5-era elements like <source/> are childless
        # (Correctiv's golden depends on THAT).
        if tag in VOID_ELEMENTS or tag in HTML4_ELEMENTS:
            self.handle_starttag(tag, attrs)
            if tag in ("script", "style"):
                # slash ignored -> the element is OPEN, so subsequent
                # content is CDATA until the next real end tag (il
                # Giornale's rewrap re-parses <script/> this way)
                self.set_cdata_mode(tag)
        else:
            self.handle_starttag(tag, attrs)
            self.handle_endtag(tag)

    def handle_endtag(self, tag: str) -> None:
        if tag == "br":
            # browsers turn a stray </br> into <br>, but libxml2 (the
            # reference's parser) just drops it — golden document-order
            # positions (NTV) depend on libxml2's behavior
            return
        if tag in VOID_ELEMENTS:
            return
        if tag == "html":
            return
        if tag == "head":
            # head closed; subsequent content goes to body lazily
            if self._phase == "head":
                self._phase = "initial-after-head"
                self._stack = [self.root] if self.root is not None else []
            return
        if tag == "body":
            return
        for node in reversed(self._stack):
            if node.tag == tag:
                self._pop_to(node)
                return
            if node.tag in ("html", "body"):
                break
        # no matching open tag: ignore stray end tag

    def handle_data(self, data: str) -> None:
        if not data:
            return
        if self._phase in ("initial", "head", "initial-after-head"):
            # text inside an open head element (title/script/style/...)
            # belongs to that element; only bare text promotes to body
            inside_head_element = bool(self._stack) and self._stack[-1] not in (self.root, self._head)
            if not inside_head_element:
                # libxml2 parity (verified against libxml2.so directly):
                # text while still in head/html context implies <body>
                # AND a synthesized <p> wrapping it; the <p> stays open,
                # nesting following comments/scripts until a p-closing
                # element arrives. Blank runs only count as content when
                # they span libxml2's 1000-byte char-data chunk (a
                # non-final chunk is not followed by '<', so areBlanks
                # reports content) — observable in Publico's golden
                # image positions, which sit one node after a 1826-byte
                # whitespace run in <head>.
                if not data.strip() and len(data) < 1000:
                    return
                self._ensure_body()
                implied_p = Element("p")
                self._insertion_parent().append(implied_p)
                self._stack.append(implied_p)
        parent = self._insertion_parent()
        if parent._children:
            last = parent._children[-1]
            last.tail = (last.tail or "") + data
        else:
            parent.text = (parent.text or "") + data

    def handle_comment(self, data: str) -> None:
        self._append_non_element(Comment(data))

    def handle_pi(self, data: str) -> None:
        self._append_non_element(ProcessingInstruction(data))

    def _append_non_element(self, node: "Comment") -> None:
        if self._phase == "body":
            self._insertion_parent().append(node)
            return
        if self.root is None:
            # pre-<html> comments/PIs live outside the root in libxml2
            # and are not reachable from root.iter() — drop
            return
        if self._stack and self._stack[-1] not in (self.root, self._head):
            # inside an open head element (e.g. <noscript> in head)
            self._stack[-1].append(node)
        elif self._phase == "head" and self._head is not None:
            self._head.append(node)
        else:
            # between <html> and <head>, or between </head> and <body>
            self.root.append(node)

    def handle_decl(self, decl: str) -> None:
        pass

    def unknown_decl(self, data: str) -> None:
        pass

    def close_all(self) -> Element:
        self.close()
        if self.root is None:
            self._ensure_root()
        if self._body is None:
            self._ensure_body()
        return self.root  # type: ignore[return-value]


def parse_html(html: str) -> Element:
    """Parse an HTML string into an Element tree rooted at ``<html>``.

    Equivalent entry point to the reference's
    ``lxml.html.document_fromstring`` (``base_parser.py:277``).
    """
    builder = _TreeBuilder()
    builder.feed(html)
    return builder.close_all()
