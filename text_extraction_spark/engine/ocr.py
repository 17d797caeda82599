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

# Hamming distance |s| + |t| - 2·s·t rewritten as s·(1-2t) + |t| so the
# whole slot-vs-template table is ONE float32 sgemm (BLAS) instead of
# numpy's loop-fallback integer matmul — every operand is a small
# integer (<= 70), exactly representable in float32, so the result cast
# back to int32 is bit-identical to the integer expression (asserted by
# the golden-output tests). The ±1 template matrix and per-template ink
# counts are constants, hoisted out of the per-image call.
_T2F = (1.0 - 2.0 * font._FLAT.astype(np.float32))  # (T, 35) of ±1
_TSUMF = font._FLAT.astype(np.float32).sum(axis=1)  # (T,)


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


def extract_table(gray: np.ndarray, detector: str = "auto") -> str:
    """A8→A14 composed: grayscale image → row-major table string.

    Cells joined by '|' within a row, rows by '\\n' — the reference's
    row-major cell-OCR ordering [B:6]. Returns '' if no grid is found.

    detector: 'profile' = projection profiles only (full-extent rulings);
    'auto' (default) falls back to Hough REGION detection when profiles
    find no grid — recovering tables embedded in larger pages, whose
    rulings never reach the profiles' full-extent threshold. The
    fallback only runs on images profiles already failed (previously
    dropped), so clean-table cost and golden outputs are unchanged.

    All cells decode in ONE vectorized pass: a single fancy-index gather
    pulls every (row, col, slot) 7x5 window, and one integer matmul
    computes all Hamming distances via |s| + |t| − 2·s·t. Identical
    output to per-cell decode_cell on ARBITRARY (incl. non-uniform)
    grids: the slot count is computed PER COLUMN from that column's own
    interior width and rows too short for a glyph are masked out —
    exactly decode_cell's per-slot break conditions. Masked slots gather
    clipped (in-bounds, value irrelevant) windows and are overwritten
    with blank before assembly. Asserted in tests/test_font.py against
    uniform AND non-uniform grids.
    """
    mask = imageproc.denoise(imageproc.adaptive_threshold(gray))
    return extract_table_from_mask(mask, detector)


def extract_table_from_mask(mask: np.ndarray, detector: str = "auto") -> str:
    """extract_table past the threshold+denoise stages — the entry the
    batched media path uses after computing masks for a whole stack of
    same-size images in one pass (round 7; see
    imageproc.adaptive_threshold_batch). Byte-identical results."""
    rows, cols = imageproc.detect_rulings(mask)
    if (len(rows) < 2 or len(cols) < 2) and detector == "auto":
        # Skew FIRST: on a tilted table the region detector would accept
        # the vote smear as a (garbage) grid, so the tilt estimate gates
        # which fallback runs. Straight-but-embedded tables estimate ~0°
        # and take the region path; tilted ones get deskewed (fixed-point
        # NN rotation of the MASK), re-detected, and decoded with a
        # global ±2 px offset search absorbing the rotation's jitter.
        # Both fallbacks only ever run on images profiles already missed.
        ang = imageproc.estimate_skew_deg(mask)
        if abs(ang) >= 0.3:
            # Round-3 upgrade: the 0.1°-grid skew estimate is the main
            # residual error source, so refine it by DECODE EVIDENCE —
            # try the estimate ±0.1/±0.2°, decode each, keep the angle
            # with the smallest mean best-template Hamming distance per
            # slot (a confidence score the decoder already computes).
            # Measured on the 30 skew fixtures: cell accuracy 0.78 →
            # 0.97 (oracle upper bound of this 5-angle family: 0.974);
            # runs only on the already-rare skew path. An experiment
            # that deskewed the GRAYSCALE (integer bilinear) and
            # re-thresholded measured WORSE (0.64): re-thresholding the
            # interpolated noise costs more glyph pixels than NN mask
            # rotation, so evidence-selected NN stays.
            # Two-stage cost control: angles are RANKED with the cheap
            # single-offset decode (25× less matmul work) and only the
            # winner gets the full ±2 px offset-search decode — measured
            # accuracy identical to full-decode ranking (0.9707) at ~3×
            # less skew-path cost.
            best = None
            deltas = (0.0, -0.1, 0.1, -0.2, 0.2)
            # all 5 candidate rotations in one batched pass (identical
            # per-angle integers — see rotate_mask_nn_multi)
            rotated = imageproc.rotate_mask_nn_multi(
                mask, [ang + d for d in deltas]
            )
            # profile sums for all 5 rotations in two passes (round 7):
            # both ruling detectors consume only these row/col ink sums,
            # so per-angle mask.sum calls collapse into the stack sums
            row_sums = rotated.sum(axis=2, dtype=np.int64)  # (A, h)
            col_sums = rotated.sum(axis=1, dtype=np.int64)  # (A, w)
            for ai, d_ang in enumerate(deltas):
                mask2 = rotated[ai]
                r2, c2 = imageproc.rulings_from_profiles(
                    row_sums[ai], col_sums[ai], *mask2.shape
                )
                if len(r2) < 2 or len(c2) < 2:
                    r2, c2 = imageproc.region_rulings_from_profiles(
                        row_sums[ai], col_sums[ai]
                    )
                if len(r2) < 2 or len(c2) < 2:
                    continue
                _text, dist, nslots = _decode_grid(
                    mask2, r2, c2, offset_search=False, return_score=True,
                    score_only=True,
                )
                if nslots == 0:
                    # spurious rulings with zero glyph slots decode to
                    # pipe-only empty text with mean 0.0, which would
                    # beat every genuine decode (round-4 ADVICE fix) —
                    # never let such an angle win
                    continue
                mean = dist / nslots
                if best is None or mean < best[0]:
                    best = (mean, mask2, r2, c2)
            if best is not None:
                return _decode_grid(best[1], best[2], best[3], offset_search=True)
        else:
            rows, cols = imageproc.detect_rulings_hough_region(mask)
    if len(rows) < 2 or len(cols) < 2:
        return ""
    return _decode_grid(mask, rows, cols)


# hoisted index vectors for the slot gather (round 7: _decode_grid is
# called once per clean image and was ~55% fixed numpy-call overhead on
# typical 20–40-cell grids; every saved allocation counts)
_AR_GH = np.arange(font.GLYPH_H)
_AR_GW = np.arange(font.GLYPH_W)
_AR_K = np.arange(font.MAX_CHARS)
_LUT = np.frombuffer(b"\x00" + font.ALPHABET.encode("ascii"), dtype=np.uint8)


def _decode_grid(
    mask: np.ndarray,
    rows: list[int],
    cols: list[int],
    offset_search: bool = False,
    return_score: bool = False,
    score_only: bool = False,
):
    """Vectorized grid decode given ruling positions (see extract_table).
    offset_search=True additionally tries every (dy, dx) window shift in
    [-2, 2]² PER CELL and keeps, for each cell, the shift whose summed
    best-template Hamming distance over the cell's slots is smallest
    (ties → centered-first order) — tolerance for the spatially-varying
    ≤2 px jitter a deskew rotation leaves, rigid enough (a whole cell
    shares one shift) not to let single slots overfit noise to a wrong
    template; the (0,0) path is bit-identical to the plain decode.

    Round 7: the common path (no offset search, no score) skips the
    whole offset axis, the int32 recast (the distances are small exact
    integers in float32, so argmin ties resolve identically), the
    distance min/sum reductions, and the per-cell bytes loop — the
    function was ~55% fixed numpy-call overhead per clean image.
    Outputs are bit-identical (pinned by the golden suites)."""
    h, w = mask.shape
    r_all = np.asarray(rows, dtype=np.int64)
    c_all = np.asarray(cols, dtype=np.int64)
    r_arr = r_all[:-1]
    c_arr = c_all[:-1]
    n_rows, n_cols = len(r_arr), len(c_arr)
    cell_h = r_all[1:] - r_arr - 1  # (R,) interior heights
    cell_w = c_all[1:] - c_arr - 1  # (C,) interior widths
    # decode_cell's loop bound, per column j: slot k fits iff
    # PAD + k·ADVANCE + GLYPH_W <= cell_w[j]
    k_per_col = np.where(
        cell_w >= font.PAD + font.GLYPH_W,
        np.minimum(
            font.MAX_CHARS, (cell_w - font.PAD - font.GLYPH_W) // font.ADVANCE + 1
        ),
        0,
    )  # (C,)
    row_ok = cell_h >= font.PAD + font.GLYPH_H  # (R,) glyph row fits at all
    k = int(k_per_col.max(initial=0))
    score = (0, 0)  # (summed best-template distance, n valid slots)
    n_cells = n_rows * n_cols
    if k == 0 or not row_ok.any():
        texts = ["" for _ in range(n_cells)]
    else:
        base_ys = (r_arr[:, None] + 1 + font.PAD) + _AR_GH[None, :]  # (R,7)
        base_xs = (
            (c_arr[:, None, None] + 1 + font.PAD)
            + _AR_K[:k, None] * font.ADVANCE
            + _AR_GW[None, None, :]
        )  # (C,K,5)
        # decode_cell's break conditions as a mask: slot k exists iff it
        # fits the column's width AND the row fits a glyph vertically
        valid = row_ok[:, None, None] & (
            _AR_K[None, None, :k] < k_per_col[None, :, None]
        )  # (R,C,K)
        valid_ck = valid.reshape(n_cells, k)
        if not offset_search:
            # fast path: one gather, one sgemm, one argmin — invalid
            # slots gather clipped windows and are masked to blank below
            ys = np.clip(base_ys, 0, h - 1)  # (R,7)
            xs = np.clip(base_xs, 0, w - 1)  # (C,K,5)
            slots = mask[
                ys[:, None, None, :, None], xs[None, :, :, None, :]
            ]  # (R,C,K,7,5)
            flat = slots.reshape(-1, font.GLYPH_H * font.GLYPH_W).astype(np.float32)
            d = flat @ _T2F.T + _TSUMF[None, :]
            if return_score:
                mind = d.min(axis=1).reshape(n_cells, k).astype(np.int32)
                score = (
                    int(np.where(valid_ck, mind, 0).sum()),
                    int(valid_ck.sum()),
                )
                if score_only:
                    # skew RANKING discards the text (the winning angle
                    # is re-decoded with the offset search) — skip the
                    # argmin/LUT/assembly entirely
                    return ("", score[0], score[1])
            idx = np.where(valid_ck, np.argmin(d, axis=1).reshape(n_cells, k), 0)
        else:
            # centered-first order: argmin's first-wins tie-break then
            # resolves toward the unshifted grid
            offsets = sorted(
                ((dy, dx) for dy in (-2, -1, 0, 1, 2) for dx in (-2, -1, 0, 1, 2)),
                key=lambda p: (abs(p[0]) + abs(p[1]), p),
            )
            n_off = len(offsets)
            offs = np.asarray(offsets, dtype=np.int64)  # (O,2)
            # ALL offsets in one gather + one matmul (a per-offset loop
            # was overhead-bound: 25 tiny matmuls ~3 ms per skewed image)
            ys = np.clip(base_ys[None, :, :] + offs[:, 0][:, None, None], 0, h - 1)
            xs = np.clip(
                base_xs[None, :, :, :] + offs[:, 1][:, None, None, None], 0, w - 1
            )  # (O,C,K,5)
            slots = mask[
                ys[:, :, None, None, :, None], xs[:, None, :, :, None, :]
            ]  # (O,R,C,K,7,5)
            flat = slots.reshape(-1, font.GLYPH_H * font.GLYPH_W).astype(np.float32)
            d = (flat @ _T2F.T + _TSUMF[None, :]).astype(np.int32)
            mind = d.min(axis=1).reshape(n_off, n_cells, k)  # best dist / slot
            idx_all = np.argmin(d, axis=1).reshape(n_off, n_cells, k)
            cell_dist = np.where(valid_ck[None, :, :], mind, 0).sum(axis=2)
            best_off = np.argmin(cell_dist, axis=0)  # first min wins → centered
            score = (
                int(cell_dist[best_off, np.arange(n_cells)].sum()),
                int(valid_ck.sum()),
            )
            idx = np.where(valid_ck, idx_all[best_off, np.arange(n_cells), :], 0)
        # byte LUT: template index → ASCII char, NUL for blank, stripped
        cell_bytes = _LUT[idx]  # (cells, k) uint8
        texts = [
            cell_bytes[i].tobytes().replace(b"\x00", b"").decode("ascii")
            for i in range(n_cells)
        ]
    lines = [
        "|".join(texts[r * n_cols : (r + 1) * n_cols]) for r in range(n_rows)
    ]
    out = "\n".join(lines)
    return (out, score[0], score[1]) if return_score else out


def normalize_text(s: str) -> str:
    """A14: canonical form for span-sequence equality — NFC, collapse all
    whitespace runs to one space, strip. Applied to TEXT spans only
    (media table strings keep their '|' / '\\n' structure)."""
    return _WS.sub(" ", unicodedata.normalize("NFC", s)).strip()
