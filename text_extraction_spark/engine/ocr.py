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

    All cells decode in ONE vectorized pass: a single fancy-index gather
    pulls every (row, col, slot) 7x5 window, and one integer matmul
    computes all Hamming distances via |s| + |t| − 2·s·t. Identical
    output to per-cell decode_cell (np.argmin keeps the blank-first /
    alphabet-order tie-break) — asserted in tests/test_font.py.
    """
    mask = imageproc.denoise(imageproc.adaptive_threshold(gray))
    rows, cols = imageproc.detect_rulings(mask)
    if len(rows) < 2 or len(cols) < 2:
        return ""
    h, w = mask.shape
    r_arr = np.asarray(rows[:-1], dtype=np.int64)
    c_arr = np.asarray(cols[:-1], dtype=np.int64)
    n_rows, n_cols = len(r_arr), len(c_arr)
    # slot windows must fit inside each cell interior
    cell_h = min(rows[i + 1] - rows[i] - 1 for i in range(n_rows))
    cell_w = min(cols[j + 1] - cols[j] - 1 for j in range(n_cols))
    # same bound as decode_cell's loop: slots while PAD + k·ADVANCE +
    # GLYPH_W <= cell_w, i.e. k_count = (cell_w − PAD − GLYPH_W)//ADVANCE + 1
    if cell_w >= font.PAD + font.GLYPH_W:
        k = min(font.MAX_CHARS, (cell_w - font.PAD - font.GLYPH_W) // font.ADVANCE + 1)
    else:
        k = 0
    if k == 0 or cell_h < font.PAD + font.GLYPH_H:
        # degenerate cells: fall back to the per-cell path
        cells = imageproc.reconstruct_grid(rows, cols)
        texts = [decode_cell(mask, y0, x0, y1, x1) for (_, _, y0, x0, y1, x1) in cells]
    else:
        ys = (r_arr[:, None] + 1 + font.PAD) + np.arange(font.GLYPH_H)[None, :]  # (R,7)
        xs = (
            (c_arr[:, None, None] + 1 + font.PAD)
            + np.arange(k)[None, :, None] * font.ADVANCE
            + np.arange(font.GLYPH_W)[None, None, :]
        )  # (C,K,5)
        slots = mask[
            ys[:, None, None, :, None], xs[None, :, :, None, :]
        ]  # (R,C,K,7,5)
        flat = slots.reshape(-1, font.GLYPH_H * font.GLYPH_W).astype(np.int32)
        t = font._FLAT.astype(np.int32)  # (T,35)
        d = flat.sum(axis=1)[:, None] + t.sum(axis=1)[None, :] - 2 * (flat @ t.T)
        idx = np.argmin(d, axis=1).reshape(n_rows * n_cols, k)
        # byte LUT: template index → ASCII char, NUL for blank, stripped
        lut = np.frombuffer(b"\x00" + font.ALPHABET.encode("ascii"), dtype=np.uint8)
        cell_bytes = lut[idx]  # (cells, k) uint8
        texts = [
            cell_bytes[i].tobytes().replace(b"\x00", b"").decode("ascii")
            for i in range(n_rows * n_cols)
        ]
    lines = [
        "|".join(texts[r * n_cols : (r + 1) * n_cols]) for r in range(n_rows)
    ]
    return "\n".join(lines)


def normalize_text(s: str) -> str:
    """A14: canonical form for span-sequence equality — NFC, collapse all
    whitespace runs to one space, strip. Applied to TEXT spans only
    (media table strings keep their '|' / '\\n' structure)."""
    return _WS.sub(" ", unicodedata.normalize("NFC", s)).strip()
