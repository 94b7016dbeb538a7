"""Bounded image harvesting — parity with reference
``src/fundus/parser/utility.py:624-1005`` and the image data model of
``src/fundus/parser/data.py:413-566``.

Pipeline per document: depth-first index -> bounds (first upper
boundary node .. last of paragraphs/lower boundary) -> per <img>:
srcset/src attribute-suffix harvesting, srcset descriptor parsing,
dimension calculus (width/height/ratio/dpr/url-pattern), caption/alt/
author enrichment with multilingual credit-keyword cleanup, version
ordering. Images serialize as plain dicts matching the golden JSONs.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, List, Optional, Pattern, Sequence, Tuple, Union
from urllib.parse import urljoin, urlparse

from .dom import Comment, Element
from .generics import generic_author_parsing
from .text import generic_nodes_to_text
from .xpath import AttrNode, XPath

__all__ = ["image_extraction", "parse_srcset", "ImageVersion", "Image"]


def is_valid_url(url: str) -> bool:
    parsed = urlparse(url)
    return bool(parsed.scheme in ("http", "https") and parsed.netloc)


def remove_query_parameters(url: str) -> str:
    if "?" in url or "#" in url:
        return urljoin(url, urlparse(url).path)
    return url


class Dimension:
    __slots__ = ("width", "height")

    def __init__(self, width: int, height: int):
        self.width = width
        self.height = height

    def scale(self, factor: float) -> "Dimension":
        if isinstance(factor, int):
            return Dimension(self.width * factor, self.height * factor)
        return Dimension(round(self.width * factor), round(self.height * factor))

    def key(self) -> Tuple[int, int]:
        return (self.width, self.height)

    def __eq__(self, other: object) -> bool:
        return isinstance(other, Dimension) and self.key() == other.key()

    def __hash__(self) -> int:
        return hash(self.key())

    def serialize(self) -> Dict[str, int]:
        return {"width": self.width, "height": self.height}

    @classmethod
    def from_ratio(
        cls, width: Optional[float] = None, height: Optional[float] = None, ratio: Optional[float] = None
    ) -> Optional["Dimension"]:
        if width and height:
            return cls(round(width), round(height))
        if width is not None:
            return cls(round(width), round((width / ratio) if ratio else 0))
        if height is not None:
            return cls(round((height * ratio) if ratio else 0), round(height))
        return None


_FILE_FORMATS = ["png", "jpg", "jpeg", "webp"]


class ImageVersion:
    __slots__ = ("url", "query_width", "size", "type")

    def __init__(
        self,
        url: str,
        query_width: Optional[str] = None,
        size: Optional[Dimension] = None,
        type: Optional[str] = None,
    ):
        self.url = url
        self.query_width = query_width
        self.size = size
        self.type = type
        if not self.type:
            fmt = remove_query_parameters(url).split(".")[-1]
            if fmt in _FILE_FORMATS:
                self.type = "image/" + ("jpeg" if fmt == "jpg" else fmt)

    def __eq__(self, other: object) -> bool:
        return isinstance(other, ImageVersion) and self.url == other.url

    def __hash__(self) -> int:
        return hash(self.url)

    def sort_key(self) -> Tuple:
        # total order: size, then query_width, then type, then url — with
        # None sorting first at each tier (reference data.py:509-527)
        return (
            (0,) if self.size is None else (1, self.size.width, self.size.height),
            (0,) if self.query_width is None else (1, self.query_width),
            (0,) if self.type is None else (1, self.type),
            self.url,
        )

    def serialize(self) -> Dict[str, Any]:
        return {
            "url": self.url,
            "query_width": self.query_width,
            "size": self.size.serialize() if self.size else None,
            "type": self.type,
        }


class ImageURLError(Exception):
    pass


class Image:
    __slots__ = ("versions", "is_cover", "description", "caption", "authors", "position")

    def __init__(
        self,
        versions: List[ImageVersion],
        is_cover: bool,
        description: Optional[str],
        caption: Optional[str],
        authors: List[str],
        position: int,
    ):
        for version in versions:
            if not is_valid_url(version.url):
                raise ImageURLError(f"url {version.url} is not a valid URL")
        self.versions = versions
        self.is_cover = is_cover
        self.description = description
        self.caption = caption
        self.authors = authors
        self.position = position

    def serialize(self) -> Dict[str, Any]:
        return {
            "versions": [v.serialize() for v in self.versions],
            "is_cover": self.is_cover,
            "description": self.description,
            "caption": self.caption,
            "authors": self.authors,
            "position": self.position,
        }


# --- srcset / src harvesting -------------------------------------------------

_SRCSET_PATTERN = re.compile(r"(?P<url>\S+)\s*(?P<descriptor>[0-9.]+[wx])?(,?\s*)")


def parse_srcset(srcset: str) -> Dict[str, str]:
    urls: Dict[str, str] = {}
    for match in _SRCSET_PATTERN.finditer(srcset.strip()):
        urls[match.group("descriptor") or "1x"] = match.group("url")
    return dict(sorted(urls.items(), key=lambda item: float(item[0][:-1])))


def _suffix_attr_values(node: Element, suffix: str) -> List[str]:
    """Values of attributes whose NAME ends with ``suffix`` and whose
    value starts with http or / — the reference encodes this as an
    attribute-name XPath (utility.py:679-684)."""
    return [
        value
        for name, value in node.attrib.items()
        if name.endswith(suffix) and (value.startswith("http") or value.startswith("/"))
    ]


def parse_urls(node: Element) -> Optional[Dict[str, str]]:
    def longest(strings: List[str]) -> str:
        return sorted(strings, key=len)[-1]

    if srcset := _suffix_attr_values(node, "srcset"):
        return parse_srcset(longest(srcset))
    if src := _suffix_attr_values(node, "src"):
        return {"1x": longest(src)}
    return None


# --- dimensions ---------------------------------------------------------------


class _DimensionCalculator:
    def __init__(self, width: Optional[float], height: Optional[float], ratio: Optional[float]):
        self.width = width
        self.height = height
        self.ratio = ratio

    def calculate(
        self, width: Optional[float] = None, height: Optional[float] = None, dpr: Optional[float] = None
    ) -> Optional[Dimension]:
        if not (width or height):
            width = self.width
            height = self.height
        if dimension := Dimension.from_ratio(width, height, self.ratio):
            return dimension.scale(dpr or 1)
        return None


_MEDIA_PARAM = re.compile(r"\(\s*(?P<param>[\w-]+)\s*:\s*(?P<value>[\d./]+)(?P<unit>[a-z]*)\)")
_WIDTH_X_HEIGHT = re.compile(r"(?P<width>[0-9]+)x(?P<height>[0-9]+)")


def _match_dict(pattern: Pattern[str], string: str) -> Dict[str, float]:
    out: Dict[str, float] = {}
    for match in pattern.finditer(string):
        for key, value in match.groupdict().items():
            if value is not None:
                out[key] = float(value)
    return out


def _numeric_attr(node: Element, name: str) -> Optional[float]:
    raw = node.get(name)
    if raw and raw.replace(".", "", 1).isdigit():
        return float(raw) or None
    return None


def get_versions_from_node(
    source: Element, ratio: Optional[float], size_pattern: Optional[Pattern[str]]
) -> List[ImageVersion]:
    if not (urls := parse_urls(source)):
        return []

    query_width = None
    for param, value, unit in _MEDIA_PARAM.findall(source.get("media", "").split(",")[0]):
        if param in ("min-width", "max-width") and unit == "px":
            query_width = f"{param}:{value}"

    width = _numeric_attr(source, "width")
    height = _numeric_attr(source, "height")
    if width and height:
        ratio = width / height
    calculator = _DimensionCalculator(width, height, ratio)

    versions: List[ImageVersion] = []
    for descriptor, url in urls.items():
        kwargs: Dict[str, float] = {}
        if descriptor is not None:
            if m := re.search(r"(?P<multiplier>[0-9.]+)x", descriptor):
                kwargs["dpr"] = float(m.group("multiplier"))
            elif m := re.search(r"(?P<width>[0-9]+)(px|w)", descriptor):
                kwargs["width"] = float(m.group("width"))
        if size_pattern is not None and (matched := _match_dict(size_pattern, url)):
            kwargs.update(matched)
        elif not (calculator.width or kwargs.get("width")) and (m := _WIDTH_X_HEIGHT.search(url)):
            kwargs.update({k: float(v) for k, v in m.groupdict().items() if v is not None})
        version = ImageVersion(
            url=url, query_width=query_width, size=calculator.calculate(**kwargs), type=source.get("type")
        )
        if version not in versions:
            versions.append(version)
    return versions


_PICTURE_SOURCES = XPath("./ancestor::picture//source")


def parse_versions(img_node: Element, size_pattern: Optional[Pattern[str]] = None) -> List[ImageVersion]:
    default_width = img_node.get("width")
    default_height = img_node.get("height")
    if (
        default_width
        and default_width != "auto"
        and default_height
        and default_height != "auto"
        and float(default_height) != 0.0
    ):
        ratio: Optional[float] = float(default_width) / float(default_height)
    else:
        ratio = None

    versions: List[ImageVersion] = []
    for source in list(_PICTURE_SOURCES(img_node)) + [img_node]:
        for version in get_versions_from_node(source, ratio, size_pattern):
            if version not in versions:
                versions.append(version)
    return sorted(versions, key=ImageVersion.sort_key)


# --- credits cleanup ------------------------------------------------------------

_CREDIT_KEYWORDS = [
    "Источник",
    "коллаж",
    "Джерело",
    "Фото",
    "колаж",
    "fotograf",
    "credits?",
    "quellen?",
    "bild(rechte)?",
    "sources?",
    r"(((f|ph)oto(graph)?s?|image|illustrations?|cartoons?|pictures?)\s*)+(by|:|courtesy)",
    "©",
    "– alle rechte vorbehalten",
    "copyright",
    "all rights reserved",
    "courtesy of",
    "＝",
]
_CREDIT_PREFIX = re.compile(r"(?is)^(" + r"|".join(_CREDIT_KEYWORDS) + r"):?\s*")


def image_author_parsing(authors: Union[str, List[str]]) -> List[str]:
    def clean(author: str) -> str:
        author = re.sub(r"^\((.*)\)$", r"\1", author).strip()
        author = re.sub(_CREDIT_PREFIX, "", author, count=1)
        author = re.sub(r"(?i)/?copyright.*", "", author)
        return author.strip()

    if isinstance(authors, list):
        return generic_author_parsing([clean(a) for a in authors])
    return generic_author_parsing(clean(authors))


# --- bounded harvest --------------------------------------------------------------


def _determine_bounds(
    doc: Element,
    index: Dict[int, int],
    paragraph_selector: Callable[[Element], Sequence[Element]],
    upper_boundary_selector: Callable[[Element], Sequence[Element]],
    lower_boundary_selector: Optional[Callable[[Element], Sequence[Element]]],
) -> Optional[Tuple[int, Optional[int], int]]:
    upper_nodes = [list(upper_boundary_selector(doc))[0]]  # IndexError intended if absent
    paragraph_nodes = list(paragraph_selector(doc))
    lower_nodes = list(lower_boundary_selector(doc)) if lower_boundary_selector else []

    all_indices = sorted(index[id(n)] for n in upper_nodes + paragraph_nodes + lower_nodes)
    if len(all_indices) < 2:
        return None
    paragraph_indices = sorted(index[id(n)] for n in paragraph_nodes)
    return (all_indices[0], paragraph_indices[0] if paragraph_indices else None, all_indices[-1])


_OG_URL = XPath("//meta[@property='og:url']/@content")

_DEFAULT_IMAGE_SELECTOR = XPath("//figure//img")
_DEFAULT_UPPER_BOUNDARY = XPath("//main")
_DEFAULT_CAPTION = XPath("./ancestor::figure//figcaption")
_DEFAULT_ALT = XPath("./@alt")
_DEFAULT_AUTHOR = XPath(
    "(./ancestor::figure//*[(contains(@class, 'copyright') or contains(@class, 'credit')) and text()])[1]"
)
_DEFAULT_SIZE_PATTERN = re.compile(
    r"width([=-])(?P<width>[0-9.]+)|height([=-])(?P<height>[0-9.]+)|dpr=(?P<dpr>[0-9.]+|)"
)


def _as_texts(values: Sequence) -> List[Union[Element, str]]:
    out: List[Union[Element, str]] = []
    for v in values:
        if isinstance(v, AttrNode):
            out.append(v.value)
        else:
            out.append(v)
    return out


def image_extraction(
    doc: Element,
    paragraph_selector: Callable[[Element], Sequence[Element]],
    image_selector: Callable[[Element], Sequence[Element]] = _DEFAULT_IMAGE_SELECTOR,
    upper_boundary_selector: Callable[[Element], Sequence[Element]] = _DEFAULT_UPPER_BOUNDARY,
    lower_boundary_selector: Optional[Callable[[Element], Sequence[Element]]] = None,
    caption_selector: Callable[[Element], Sequence[Element]] = _DEFAULT_CAPTION,
    alt_selector: Callable[[Element], Sequence] = _DEFAULT_ALT,
    author_selector: Union[Callable, Pattern[str], List[Pattern[str]]] = _DEFAULT_AUTHOR,
    relative_urls: Union[bool, Callable] = False,
    size_pattern: Pattern[str] = _DEFAULT_SIZE_PATTERN,
) -> List[Image]:
    index = {id(node): i for i, node in enumerate(doc.iter())}

    bounds = _determine_bounds(doc, index, paragraph_selector, upper_boundary_selector, lower_boundary_selector)
    if not bounds:
        raise ValueError("Bounds could not be determined")
    upper, first_paragraph, lower = bounds

    domain: Optional[str] = None
    if relative_urls:
        selector = _OG_URL if isinstance(relative_urls, bool) else relative_urls
        matches = selector(doc)
        if isinstance(matches, str):
            # selectors like string(//link[@rel='canonical']/@href)
            # return a plain string, not a node list
            value: Any = matches
        else:
            value = matches[0].value if matches and isinstance(matches[0], AttrNode) else (matches[0] if matches else "")
        if not value:
            raise ValueError("Could not determine domain")
        domain = value if isinstance(value, str) else value.text_content()

    image_nodes: List[Tuple[int, Element, bool]] = []
    for node in image_selector(doc):
        position = index[id(node)]
        if upper < position < lower:
            image_nodes.append((position, node, position < (first_paragraph or 0)))

    images: List[Image] = []
    for position, node, is_cover in image_nodes:
        versions = parse_versions(node, size_pattern)
        if not versions:
            continue
        if domain is not None:
            for version in versions:
                version.url = urljoin(domain, version.url)

        def nodes_to_text(values: Sequence) -> Optional[str]:
            return " ".join(generic_nodes_to_text(_as_texts(values), normalize=True)) or None

        caption = nodes_to_text(caption_selector(node))
        description = nodes_to_text(alt_selector(node))

        authors: List[str] = []
        selector = author_selector
        if isinstance(selector, re.Pattern):
            selector = [selector]
        if isinstance(selector, list):
            for pattern in selector:
                if caption and (m := re.search(pattern, caption)):
                    authors = [m.group("credits")]
                    caption = re.sub(pattern, "", caption).strip() or None
                    break
            if not authors:
                for pattern in selector:
                    if description and (m := re.search(pattern, description)):
                        authors = [m.group("credits")]
                        break
        else:
            if author_nodes := selector(node):
                authors = generic_nodes_to_text(_as_texts(author_nodes), normalize=True)
        authors = image_author_parsing(authors)

        try:
            images.append(
                Image(
                    versions=versions,
                    caption=caption,
                    authors=authors,
                    description=description,
                    is_cover=is_cover,
                    position=position,
                )
            )
        except ImageURLError:
            continue
    return images
