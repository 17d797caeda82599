"""A5 (SURVEY.md §2-A): single-pass byte/DOM-stream tokenization of text
spans into blocks with word / link-word accounting.

Replaces the reference's DOM parse (no lxml/bs4 in env — SURVEY §0
[ENV]) with a one-pass tag scanner: tags never nest inside tags, block
boundaries are <p> <div> <h1>–<h6> <br> <li> <tr> and their closers plus
blank lines, and <a …>…</a> tracks link text for the Kohlschütter
features (words, link_words, chars per block).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_TAG = re.compile(r"<[^>]*>")
_BLANKLINE = re.compile(r"\n\s*\n")
_BLOCK_TAGS = {
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "br", "li", "tr",
    "ul", "ol", "table", "td", "th", "blockquote", "section", "article",
    "header", "footer", "nav",
}


@dataclass
class Block:
    """One text block with Kohlschütter shallow features."""

    text: str
    words: int
    link_words: int

    @property
    def chars(self) -> int:
        return len(self.text)


def tokenize(html: str) -> list[Block]:
    """Single pass over the pseudo-HTML: split into blocks at block-level
    tags / blank lines, counting words and link words. Empty blocks are
    dropped. Deterministic, pure string processing. Link accounting is
    chunk-level (the link depth is constant between two tags), so no
    per-word state is kept."""
    # Normalize blank-line paragraph breaks to an explicit break tag so
    # the scan below has a single boundary mechanism.
    if "\n" in html:
        html = _BLANKLINE.sub("<br>", html)
    blocks: list[Block] = []
    words: list[str] = []
    link_words = 0
    link_depth = 0
    pos = 0

    def flush() -> None:
        nonlocal link_words
        if words:
            blocks.append(Block(" ".join(words), len(words), link_words))
            words.clear()
            link_words = 0

    for m in _TAG.finditer(html):
        chunk = html[pos : m.start()]
        if chunk:
            toks = chunk.split()
            if toks:
                words.extend(toks)
                if link_depth > 0:
                    link_words += len(toks)
        # lowercase only the NAME token, not the whole tag body (round
        # 7: attrs never influence the outcome and lowercasing them was
        # measurable); closing/name logic otherwise byte-equivalent
        tag = m.group(0)[1:-1].strip()
        closing = tag.startswith("/")
        body = tag.lstrip("/")
        name = body.split(None, 1)[0].rstrip("/").lower() if body else ""
        if name == "a":
            link_depth = max(0, link_depth - 1) if closing else link_depth + 1
        elif name in _BLOCK_TAGS:
            flush()
        pos = m.end()
    tail = html[pos:]
    if tail:
        toks = tail.split()
        if toks:
            words.extend(toks)
            if link_depth > 0:
                link_words += len(toks)
    flush()
    return blocks
