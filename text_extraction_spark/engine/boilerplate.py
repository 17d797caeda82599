"""A6 (SURVEY.md §2-A): Kohlschütter-style shallow-text-feature
boilerplate classification.

Implements the densitometric decision rules of Kohlschütter, Fankhauser
& Nejdl, *Boilerplate Detection Using Shallow Text Features* (WSDM
2010) — the paper's published NumWordsRulesClassifier over
(prev, curr, next) block features. Thresholds are kept as exact
rationals (1/3, 5/9) and evaluated in integer arithmetic so the
classification is bit-deterministic:

    curr.link_density >  1/3                     → boilerplate
    else if prev.link_density <= 5/9:
        curr.words > 16                          → content
        else next.words > 15                     → content
        else prev.words > 4                      → content
        else                                     → boilerplate
    else:  # high-link predecessor
        curr.words > 40                          → content
        else next.words > 17                     → content
        else                                     → boilerplate
"""

from __future__ import annotations

from .textproc import Block

_ZERO = Block(text="", words=0, link_words=0)


def _link_le(b: Block, num: int, den: int) -> bool:
    """link_density <= num/den, in integers; empty block → density 0."""
    return b.link_words * den <= b.words * num


def classify(blocks: list[Block]) -> list[bool]:
    """→ one bool per block: True = main content, False = boilerplate."""
    out: list[bool] = []
    for i, curr in enumerate(blocks):
        prev = blocks[i - 1] if i > 0 else _ZERO
        nxt = blocks[i + 1] if i + 1 < len(blocks) else _ZERO
        if not _link_le(curr, 1, 3):
            out.append(False)
        elif _link_le(prev, 5, 9):
            if curr.words > 16 or nxt.words > 15 or prev.words > 4:
                out.append(True)
            else:
                out.append(False)
        else:
            out.append(curr.words > 40 or nxt.words > 17)
    return out


def extract_main(html: str) -> str:
    """A5+A6 composed: pseudo-HTML → main-content text (kept blocks
    joined by a single space), already whitespace-normalized by the
    tokenizer. Returns '' when every block is boilerplate."""
    from .textproc import tokenize

    blocks = tokenize(html)
    keep = classify(blocks)
    return " ".join(b.text for b, k in zip(blocks, keep) if k)
