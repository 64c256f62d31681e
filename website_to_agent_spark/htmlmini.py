"""Minimal HTML DOM on top of stdlib ``html.parser``.

The reference engine (`/root/reference/src/crawl4ai_client.py:80`,
`/root/reference/src/url_seeder.py:157`) parses with BeautifulSoup's
``html.parser`` tree builder — a thin wrapper over the same stdlib
``html.parser.HTMLParser`` used here.  BeautifulSoup is not available in
this environment, so this module re-implements, from the reference's
*observable semantics*, exactly the DOM surface the extraction pipeline
needs:

- ``find`` / ``find_all`` in document (pre-)order, with attribute match
- ``select_one`` for the selector cascade
  ``main, article, .content, .main-content, #content, #main``
  (`crawl4ai_client.py:102`)
- ``get_text(separator, strip)`` with BeautifulSoup semantics: the
  stripped non-empty strings in document order joined by ``separator``
- ``decompose`` (`crawl4ai_client.py:83-84`)
- ``str(node)`` minimal-formatter serialization (``& < >`` escaped in
  text, attribute values double-quoted), used for ``cleaned_html``

It is deliberately dependency-free so the identical code runs inside
Arrow-batched pandas UDFs on executors and inside the single-threaded
reference-semantics simulator that defines the byte-identity oracle
(``website_to_agent_spark.reference_sim``).

Known/assumed divergences from real BeautifulSoup (bs4 is not
installable here, so these are documented assumptions; the adversarial
corpus in ``fixtures.ADVERSARIAL_HTML`` pins the behavior we implement
against HAND-DERIVED expectations in tests/test_extract.py):

- Comments and ``<![CDATA[...]]>`` blocks contribute NO text here
  (html.parser's default comment/unknown-decl handlers are no-ops).
  bs4 wraps them in ``Comment``/``CData`` — subclasses of
  ``NavigableString`` — and ``get_text()`` may include them depending
  on bs4 version. For web-content extraction, excluding them is the
  behavior a user wants; flagged as the one semantic judgment call.
- Mis-nested inline tags (``<b><i>x</b></i>``): html.parser reports
  tags in source order and we close the open stack leniently; bs4's
  html.parser builder produces the same text order (verified against
  the stdlib parser semantics, not against bs4 itself).
- Entity handling matches ``convert_charrefs=True`` exactly (named +
  numeric refs decoded; bare ``&`` and unknown entities pass through) —
  identical machinery to bs4-on-html.parser.
- Attribute names are lower-cased and unquoted values accepted, as in
  html.parser; bs4 additionally normalizes some multi-valued
  attributes (``class`` → list) which this DOM does not need.
"""

from __future__ import annotations

from html import escape
from html.parser import HTMLParser
from typing import Iterator, Optional, Sequence, Union

# Tags that never take content (HTML void elements).
VOID_ELEMENTS = frozenset(
    {
        "area", "base", "br", "col", "embed", "hr", "img", "input",
        "link", "meta", "param", "source", "track", "wbr",
    }
)


class Node:
    """An element node. Text children are plain ``str`` entries."""

    __slots__ = ("name", "attrs", "children", "parent")

    def __init__(self, name: str, attrs: Optional[dict] = None):
        self.name = name
        self.attrs: dict = attrs or {}
        self.children: list[Union["Node", str]] = []
        self.parent: Optional["Node"] = None

    # -- tree walking ------------------------------------------------
    def iter_nodes(self) -> Iterator["Node"]:
        """Pre-order iteration over descendant element nodes."""
        for child in self.children:
            if isinstance(child, Node):
                yield child
                yield from child.iter_nodes()

    def strings(self) -> Iterator[str]:
        """All text strings under this node, document order."""
        for child in self.children:
            if isinstance(child, Node):
                yield from child.strings()
            else:
                yield child

    # -- bs4-compatible surface ---------------------------------------
    def get(self, key: str, default=None):
        return self.attrs.get(key, default)

    def get_text(self, separator: str = "", strip: bool = False) -> str:
        """BeautifulSoup ``get_text`` semantics (`crawl4ai_client.py:116,165`):
        with ``strip=True``, each string is stripped and empties dropped
        before joining with ``separator``."""
        if strip:
            parts = [s.strip() for s in self.strings()]
            parts = [p for p in parts if p]
        else:
            parts = list(self.strings())
        return separator.join(parts)

    def find(self, name=None, attrs: Optional[dict] = None) -> Optional["Node"]:
        for node in self.iter_nodes():
            if _matches(node, name, attrs):
                return node
        return None

    def find_all(self, name=None, attrs: Optional[dict] = None,
                 href: Optional[bool] = None) -> list["Node"]:
        out = []
        for node in self.iter_nodes():
            if _matches(node, name, attrs):
                if href and "href" not in node.attrs:
                    continue
                out.append(node)
        return out

    def select_one(self, selector: str) -> Optional["Node"]:
        """Single simple selector: ``tag``, ``.class`` or ``#id`` —
        the only forms the reference cascade uses
        (`crawl4ai_client.py:102`)."""
        selector = selector.strip()
        for node in self.iter_nodes():
            if _matches_selector(node, selector):
                return node
        return None

    def decompose(self) -> None:
        """Detach this node from its parent (`crawl4ai_client.py:84`)."""
        if self.parent is not None:
            self.parent.children = [
                c for c in self.parent.children if c is not self
            ]
            self.parent = None

    # -- serialization -------------------------------------------------
    def __str__(self) -> str:
        return serialize(self)

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"<Node {self.name} attrs={self.attrs} kids={len(self.children)}>"


def _matches(node: Node, name, attrs: Optional[dict]) -> bool:
    if name is not None:
        if isinstance(name, (list, tuple, set, frozenset)):
            if node.name not in name:
                return False
        elif node.name != name:
            return False
    if attrs:
        for k, v in attrs.items():
            if node.attrs.get(k) != v:
                return False
    return True


def _matches_selector(node: Node, selector: str) -> bool:
    if selector.startswith("."):
        classes = node.attrs.get("class", "")
        return selector[1:] in classes.split()
    if selector.startswith("#"):
        return node.attrs.get("id") == selector[1:]
    return node.name == selector


def serialize(node: Node) -> str:
    """Minimal-formatter HTML serialization (bs4 ``str(tag)`` analogue)."""
    out: list[str] = []
    _serialize_into(node, out)
    return "".join(out)


def _serialize_into(node: Node, out: list[str]) -> None:
    if node.name != "[document]":
        attrs = "".join(
            f' {k}="{escape(v, quote=True)}"' for k, v in node.attrs.items()
        )
        out.append(f"<{node.name}{attrs}>")
    for child in node.children:
        if isinstance(child, Node):
            _serialize_into(child, out)
        else:
            out.append(escape(child, quote=False))
    if node.name != "[document]" and node.name not in VOID_ELEMENTS:
        out.append(f"</{node.name}>")


class _TreeBuilder(HTMLParser):
    """Builds a Node tree. ``convert_charrefs=True`` (the default)
    matches bs4's html.parser builder: entity references arrive decoded
    in ``handle_data``. Comments, doctypes and processing instructions
    are dropped (excluded from ``get_text`` like modern bs4)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("[document]")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = Node(tag, {k: (v if v is not None else "") for k, v in attrs})
        node.parent = self.stack[-1]
        self.stack[-1].children.append(node)
        if tag not in VOID_ELEMENTS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        node = Node(tag, {k: (v if v is not None else "") for k, v in attrs})
        node.parent = self.stack[-1]
        self.stack[-1].children.append(node)

    def handle_endtag(self, tag):
        # Pop to the matching open tag if one exists (html.parser
        # builder behavior: stray end tags are ignored).
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].name == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


def parse(html: str) -> Node:
    """Parse an HTML string into a document Node."""
    builder = _TreeBuilder()
    try:
        builder.feed(html)
        builder.close()
    except Exception:
        # html.parser is tolerant; on a truly broken input keep
        # whatever tree was built so far (reference catches parse
        # exceptions and degrades, `url_seeder.py:176-178`).
        pass
    return builder.root
