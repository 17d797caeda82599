"""A12–A14 (SURVEY.md §2-A): cell decode, row-major assembly, text
normalization. Deterministic stand-in for the reference's per-cell
Tesseract stage (no OCR engine in env — SURVEY §0 [ENV]).

A12 decodes each cell by FIXED-ADVANCE SLOT MATCHING: glyphs are
rendered left-aligned at font.PAD with stride font.ADVANCE (shared font
metrics, like real OCR knowing its trained font), so the decoder reads
up to font.MAX_CHARS 7x5 slots per cell and nearest-Hamming-matches each
against the glyph templates plus an all-blank template. This is
noise-robust without fragile blank-column segmentation: a slot decodes
to the char whose bitmap is nearest (ties → blank, then alphabet order;
see font.match_slots).
"""

from __future__ import annotations

import re
import unicodedata

import numpy as np

from . import font, imageproc

_WS = re.compile(r"\s+")


def decode_cell(mask: np.ndarray, y0: int, x0: int, y1: int, x1: int) -> str:
    """A12: decode one cell interior of the ink mask → its text."""
    slots = []
    top = y0 + font.PAD
    left = x0 + font.PAD
    for k in range(font.MAX_CHARS):
        sx = left + k * font.ADVANCE
        if sx + font.GLYPH_W > x1 or top + font.GLYPH_H > y1:
            break
        slots.append(mask[top : top + font.GLYPH_H, sx : sx + font.GLYPH_W])
    if not slots:
        return ""
    chars = font.match_slots(np.stack(slots))
    return "".join(chars)


def extract_table(gray: np.ndarray) -> str:
    """A8→A14 composed: grayscale image → row-major table string.

    Cells joined by '|' within a row, rows by '\\n' — the reference's
    row-major cell-OCR ordering [B:6]. Returns '' if no grid is found.
    """
    mask = imageproc.denoise(imageproc.adaptive_threshold(gray))
    rows, cols = imageproc.detect_rulings(mask)
    if len(rows) < 2 or len(cols) < 2:
        return ""
    cells = imageproc.reconstruct_grid(rows, cols)
    n_cols = len(cols) - 1
    texts = [decode_cell(mask, y0, x0, y1, x1) for (_, _, y0, x0, y1, x1) in cells]
    lines = [
        "|".join(texts[r * n_cols : (r + 1) * n_cols])
        for r in range(len(rows) - 1)
    ]
    return "\n".join(lines)


def normalize_text(s: str) -> str:
    """A14: canonical form for span-sequence equality — NFC, collapse all
    whitespace runs to one space, strip. Applied to TEXT spans only
    (media table strings keep their '|' / '\\n' structure)."""
    return _WS.sub(" ", unicodedata.normalize("NFC", s)).strip()
