"""Deterministic 5x7 bitmap glyph font (FIXTURES.md §3).

The corpus generator renders table-cell text with these bitmaps and the
extractor (SURVEY §2-A A12) decodes cells by nearest-Hamming template
matching against the same arrays — a deterministic stand-in for the
reference's Tesseract OCR stage (no OCR engine exists in this env,
SURVEY §0 [ENV]).

Decoding contract (must hold; asserted in tests/test_font.py):
  * every pair of glyphs differs in >= MIN_INTERGLYPH_DIST pixels,
  * every glyph has >= MIN_INK pixels (distance to the blank template),
so nearest-Hamming decode is unambiguous for up to
(MIN_INTERGLYPH_DIST - 1) // 2 flipped pixels per 35-px glyph slot —
above the expected salt-and-pepper noise (p=0.02 → ~0.7 flips/slot).
Ties are broken deterministically: BLANK first, then alphabet order.
"""

from __future__ import annotations

import numpy as np

# Font metrics shared by the renderer (corpus.py) and the decoder (ocr.py).
GLYPH_W = 5
GLYPH_H = 7
ADVANCE = 7  # glyph width + 2 blank columns
PAD = 3  # blank margin inside a cell, all four sides
MAX_CHARS = 6  # max glyphs per table cell
CELL_W = 2 * PAD + MAX_CHARS * ADVANCE - 2  # 46
CELL_H = 2 * PAD + GLYPH_H  # 13

ALPHABET = "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789.,-%"

# 7 rows x 5 cols, '#' = ink. Shapes are approximate Latin glyphs but the
# binding requirement is the Hamming-distance contract in the docstring —
# lookalike pairs (O/0, I/1, ./,) are deliberately disambiguated.
_ART = {
    "A": [".###.", "#...#", "#...#", "#####", "#...#", "#...#", "#...#"],
    "B": ["####.", "#...#", "#...#", "####.", "#...#", "#...#", "####."],
    "C": [".####", "#....", "#....", "#....", "#....", "#....", ".####"],
    "D": ["###..", "#..#.", "#...#", "#...#", "#...#", "#..#.", "###.."],
    "E": ["#####", "#....", "#....", "####.", "#....", "#....", "#####"],
    "F": ["#####", "#....", "#....", "####.", "#....", "#....", "#...."],
    "G": [".####", "#....", "#....", "#.###", "#...#", "#...#", ".###."],
    "H": ["#...#", "#...#", "#...#", "#####", "#...#", "#...#", "#...#"],
    "I": ["#####", "..#..", "..#..", "..#..", "..#..", "..#..", "#####"],
    "J": ["..###", "...#.", "...#.", "...#.", "...#.", "#..#.", ".##.."],
    "K": ["#...#", "#..#.", "#.#..", "##...", "#.#..", "#..#.", "#...#"],
    "L": ["#....", "#....", "#....", "#....", "#....", "#....", "#####"],
    "M": ["#...#", "##.##", "##.##", "#.#.#", "#.#.#", "#...#", "#...#"],
    "N": ["#...#", "##..#", "##..#", "#.#.#", "#..##", "#..##", "#...#"],
    "O": [".###.", "#...#", "#...#", "#...#", "#...#", "#...#", ".###."],
    "P": ["####.", "#...#", "####.", "#....", "#....", "#....", "#...."],
    "Q": [".###.", "#...#", "#...#", "#...#", "#.##.", "#.##.", ".##.#"],
    "R": ["####.", "#...#", "#...#", "####.", "#.#..", "#..#.", "#...#"],
    "S": [".####", "#....", "#....", ".###.", "....#", "....#", "####."],
    "T": ["#####", "..#..", "..#..", "..#..", "..#..", "..#..", "..#.."],
    "U": ["#...#", "#...#", "#...#", "#...#", "#...#", "#...#", ".###."],
    "V": ["#...#", "#...#", "#...#", "#...#", ".#.#.", ".#.#.", "..#.."],
    "W": ["#...#", "#...#", "#...#", "#.#.#", "#.#.#", "##.##", "#...#"],
    "X": ["#...#", ".#.#.", ".#.#.", "..#..", ".#.#.", ".#.#.", "#...#"],
    "Y": ["#...#", "#...#", ".#.#.", "..#..", "..#..", "..#..", "..#.."],
    "Z": ["#####", "....#", "...#.", "..#..", ".#...", "#....", "#####"],
    "0": [".###.", "#..##", "#..##", "#.#.#", "##..#", "##..#", ".###."],
    "1": ["..#..", ".##..", "..#..", "..#..", "..#..", "..#..", ".###."],
    "2": [".###.", "#...#", "....#", "..##.", ".#...", "#....", "#####"],
    "3": ["####.", "....#", "....#", ".###.", "....#", "....#", "####."],
    "4": ["...#.", "..##.", ".#.#.", "#..#.", "#####", "...#.", "...#."],
    "5": ["#####", "#....", "####.", "....#", "....#", "#...#", ".###."],
    "6": ["..##.", ".#...", "#....", "####.", "#...#", "#...#", ".###."],
    "7": ["#####", "....#", "...#.", "..#..", ".#...", ".#...", ".#..."],
    "8": [".###.", "#...#", ".#.#.", ".###.", ".#.#.", "#...#", ".###."],
    "9": [".###.", "#...#", "#...#", ".####", "....#", "....#", ".###."],
    ".": [".....", ".....", ".....", ".....", ".##..", ".##..", ".##.."],
    ",": [".....", ".....", ".....", ".....", "..##.", "..##.", ".#..."],
    "-": [".....", ".....", ".....", "#####", ".....", ".....", "....."],
    "%": ["##..#", "##..#", "...#.", "..#..", ".#...", "#..##", "#..##"],
}


def _compile() -> np.ndarray:
    """Stack glyph bitmaps into a (len(ALPHABET), 7, 5) uint8 array."""
    out = np.zeros((len(ALPHABET), GLYPH_H, GLYPH_W), dtype=np.uint8)
    for i, ch in enumerate(ALPHABET):
        rows = _ART[ch]
        assert len(rows) == GLYPH_H and all(len(r) == GLYPH_W for r in rows), ch
        for y, row in enumerate(rows):
            for x, px in enumerate(row):
                out[i, y, x] = 1 if px == "#" else 0
    return out


GLYPHS: np.ndarray = _compile()  # (40, 7, 5) uint8, ink=1

# Templates for nearest-Hamming decode: BLANK first (index 0) so that a
# tie between blank and any glyph resolves to blank, then alphabet order.
TEMPLATES: np.ndarray = np.concatenate(
    [np.zeros((1, GLYPH_H, GLYPH_W), dtype=np.uint8), GLYPHS]
)
_FLAT = TEMPLATES.reshape(len(TEMPLATES), -1).astype(np.int16)

MIN_INK = 4
MIN_INTERGLYPH_DIST = 4  # verified exhaustively in tests/test_font.py


def render_text(text: str) -> np.ndarray:
    """Render ``text`` as a (7, 6*len-1...) ink mask (uint8, ink=1).

    Width = len(text)*ADVANCE - 2 (no trailing inter-glyph gap).
    """
    if not text:
        return np.zeros((GLYPH_H, 0), dtype=np.uint8)
    w = len(text) * ADVANCE - (ADVANCE - GLYPH_W)
    out = np.zeros((GLYPH_H, w), dtype=np.uint8)
    for k, ch in enumerate(text):
        out[:, k * ADVANCE : k * ADVANCE + GLYPH_W] = GLYPHS[ALPHABET.index(ch)]
    return out


def match_glyph(slot: np.ndarray) -> str:
    """Nearest-Hamming decode of a 7x5 binary slot → char or '' (blank).

    Deterministic: np.argmin returns the FIRST minimal index and BLANK is
    template 0, so blank wins ties; remaining ties resolve in ALPHABET
    order. Pure integer arithmetic.
    """
    flat = slot.reshape(-1).astype(np.int16)
    dists = np.abs(_FLAT - flat).sum(axis=1)
    idx = int(np.argmin(dists))
    return "" if idx == 0 else ALPHABET[idx - 1]


def match_slots(slots: np.ndarray) -> list[str]:
    """Vectorized decode of an (n, 7, 5) stack of slots → list of chars."""
    if len(slots) == 0:
        return []
    flat = slots.reshape(len(slots), -1).astype(np.int16)
    # (n, T) Hamming distances via broadcasting; argmin → first minimum.
    dists = np.abs(flat[:, None, :] - _FLAT[None, :, :]).sum(axis=2)
    idxs = np.argmin(dists, axis=1)
    return ["" if i == 0 else ALPHABET[i - 1] for i in idxs]
