"""Main-content extraction from HTML (Readability/trafilatura-style).

A lightweight DOM walk over stdlib ``html.parser`` (forgiving: never
throws on malformed markup) collects text into *blocks* (nearest
block-level ancestor), tracking per-block link-character counts. Blocks
are scored by text length × (1 - link_density)²; the block *parent*
whose children score highest wins, and its low-link-density children
are emitted in document order joined by "\\n\\n" — the boilerplate
(nav/header/footer/aside/script/style, link-dense sidebars) scores ~0
and is dropped.

This is the engine's DOM route of the reference's per-document router
(the reference routes PDF pages between text-layer and OCR —
core_document_processing.py:32-89; web pages add the third, DOM,
route per the north star).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

# Readability-style class/id heuristics: blocks whose class/id match
# UNLIKELY (and not POSITIVE) are demoted to score 0 and never emitted —
# this is how "comments"/"sidebar"/"widget" boilerplate loses even when
# the real content is short.
UNLIKELY_RE = re.compile(
    r"comment|combx|community|disqus|extra|foot|header|menu|related|remark"
    r"|rss|share|shoutbox|sidebar|skyscraper|sponsor|ad-break|agegate"
    r"|pagination|pager|popup|tweet|twitter|widget|banner|breadcrumb|social",
    re.I,
)
POSITIVE_RE = re.compile(
    r"article|body|content|entry|hentry|main|page|post|text|blog|story", re.I
)

# subtrees dropped entirely (boilerplate / non-content by construction)
DROP_TAGS = frozenset(
    {"script", "style", "noscript", "template", "head", "title",
     "nav", "header", "footer", "aside", "form", "button", "iframe", "svg"}
)
# tags that open a new text block
BLOCK_TAGS = frozenset(
    {"p", "div", "article", "main", "section", "td", "th", "li", "blockquote",
     "pre", "h1", "h2", "h3", "h4", "h5", "h6", "body", "table", "ul", "ol", "tr"}
)
VOID_TAGS = frozenset(
    {"br", "hr", "img", "input", "meta", "link", "area", "base", "col",
     "embed", "source", "track", "wbr"}
)


class _Block:
    __slots__ = ("bid", "parent", "order", "parts", "link_chars", "tag", "bad")

    def __init__(self, bid: int, parent: int, order: int, tag: str, bad: bool):
        self.bid = bid
        self.parent = parent
        self.order = order
        self.parts: list[str] = []
        self.link_chars = 0
        self.tag = tag
        self.bad = bad

    @property
    def text(self) -> str:
        return "".join(self.parts)


class _DomCollector(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.drop_depth = 0
        self.link_depth = 0
        self.block_stack: list[int] = [0]
        self.blocks: dict[int, _Block] = {0: _Block(0, -1, 0, "root", False)}
        self._next = 1

    def handle_starttag(self, tag, attrs):
        if tag in VOID_TAGS:
            return
        if tag in DROP_TAGS:
            self.drop_depth += 1
            return
        if self.drop_depth:
            return
        if tag == "a":
            self.link_depth += 1
        if tag in BLOCK_TAGS:
            parent = self.blocks[self.block_stack[-1]]
            hint = " ".join(
                v for k, v in attrs if v and k in ("class", "id", "role")
            )
            bad = parent.bad or bool(
                hint
                and UNLIKELY_RE.search(hint)
                and not POSITIVE_RE.search(hint)
            )
            bid = self._next
            self._next += 1
            self.blocks[bid] = _Block(bid, parent.bid, bid, tag, bad)
            self.block_stack.append(bid)

    def handle_endtag(self, tag):
        if tag in DROP_TAGS:
            if self.drop_depth:
                self.drop_depth -= 1
            return
        if self.drop_depth:
            return
        if tag == "a" and self.link_depth:
            self.link_depth -= 1
        if tag in BLOCK_TAGS and len(self.block_stack) > 1:
            # forgiving close: pop until the matching tag if present
            tags = [self.blocks[b].tag for b in self.block_stack[1:]]
            if tag in tags:
                while len(self.block_stack) > 1:
                    done = self.block_stack.pop()
                    if self.blocks[done].tag == tag:
                        break

    def handle_data(self, data):
        if self.drop_depth or not data:
            return
        blk = self.blocks[self.block_stack[-1]]
        blk.parts.append(data)
        if self.link_depth:
            blk.link_chars += len(data)


def _score(blk: _Block) -> float:
    t = blk.text.strip()
    if not t or blk.bad:
        return 0.0
    ld = blk.link_chars / max(1, len(blk.text))
    return len(t) * (1.0 - ld) ** 2


# Fast tokenizer: one regex pass over the markup instead of stdlib
# html.parser (whose per-char position tracking dominated the profile at
# ~0.8 ms/page). Semantics match _DomCollector: same DROP/BLOCK/VOID
# handling, forgiving close, entity unescape on text nodes.
_TOKEN_RE = re.compile(
    r"<!--.*?(?:-->|$)"              # comments
    r"|<!\[CDATA\[.*?(?:\]\]>|$)"    # cdata
    r"|<!(?:[^>]*)>"                 # doctype / declarations
    r"|<(/?)([a-zA-Z][a-zA-Z0-9-]*)((?:\"[^\"]*\"|'[^']*'|[^>\"'])*)>?",
    re.S,
)
_ATTR_RE = re.compile(
    r"(class|id|role)\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s>]+))", re.I
)
_RAWTEXT_END = {
    "script": re.compile(r"</script\s*>", re.I),
    "style": re.compile(r"</style\s*>", re.I),
}


def _fast_feed(parser: _DomCollector, text: str) -> None:
    pos = 0
    n = len(text)
    while pos < n:
        lt = text.find("<", pos)
        if lt == -1:
            parser.handle_data(_unescape(text[pos:]))
            break
        if lt > pos:
            parser.handle_data(_unescape(text[pos:lt]))
        m = _TOKEN_RE.match(text, lt)
        if m is None:
            # stray '<' — treat as text (forgiving, like html.parser)
            parser.handle_data("<")
            pos = lt + 1
            continue
        pos = m.end()
        tag = m.group(2)
        if tag is None:
            continue  # comment/doctype/cdata
        tag = tag.lower()
        if m.group(1):  # end tag
            parser.handle_endtag(tag)
            continue
        attrs_src = m.group(3) or ""
        attrs = (
            [
                (k.lower(), v1 if v1 is not None else (v2 if v2 is not None else v3))
                for k, v1, v2, v3 in _ATTR_RE.findall(attrs_src)
            ]
            if ("class" in attrs_src or "id" in attrs_src or "role" in attrs_src)
            else []
        )
        parser.handle_starttag(tag, attrs)
        if attrs_src.rstrip().endswith("/"):
            parser.handle_endtag(tag)
            continue
        if tag in _RAWTEXT_END:
            # raw-text element: skip straight to its close tag
            end = _RAWTEXT_END[tag].search(text, pos)
            if end is None:
                break
            parser.handle_endtag(tag)
            pos = end.end()


def _unescape(s: str) -> str:
    if "&" in s:
        import html as _html

        return _html.unescape(s)
    return s


def extract_main_content(html_bytes: bytes) -> tuple[str, bool]:
    """Return (main_text, parse_ok).

    parse_ok=False only when no scoring text block exists (empty or
    fully-boilerplate page) — the tokenizer itself never raises.
    """
    try:
        text = html_bytes.decode("utf-8", errors="replace")
    except Exception:
        return "", False
    parser = _DomCollector()
    try:
        _fast_feed(parser, text)
    except Exception:
        return "", False

    leaves = [b for b in parser.blocks.values() if b.text.strip()]
    if not leaves:
        return "", False
    # score parents by the sum of their children's scores
    parent_scores: dict[int, float] = {}
    for b in leaves:
        s = _score(b)
        if s > 0:
            parent_scores[b.parent] = parent_scores.get(b.parent, 0.0) + s
    if not parent_scores:
        return "", False
    best_parent = max(parent_scores, key=lambda k: (parent_scores[k], -k))
    kids = sorted(
        (b for b in leaves if b.parent == best_parent), key=lambda b: b.order
    )
    out = [
        b.text.strip()
        for b in kids
        if not b.bad
        and b.text.strip()
        and b.link_chars / max(1, len(b.text)) < 0.5
    ]
    if not out:
        return "", False
    return "\n\n".join(out), True
