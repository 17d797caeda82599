"""Image stages A7–A11 (SURVEY.md §2-A): decode, adaptive threshold,
denoise, ruling-line detection, cell-grid reconstruction.

Pure numpy, integer arithmetic only — bit-deterministic by construction
(the golden-equality gate [B:14] requires the single-process oracle and
every Spark partition to agree exactly).

Replaces the reference's OpenCV calls (imread / adaptiveThreshold /
HoughLines / findContours — SURVEY §3.1) with:
  * A7  np.frombuffer (fmt 'raw-u8') / stdlib zlib PNG unfilter
  * A8  Bradley & Roth 2007 integral-image local-mean threshold
  * A9  isolated-pixel removal (no scipy in env)
  * A10 run-length projection profiles (row/col ink sums)
  * A11 consecutive ruling pairs → cell interior boxes
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# Adaptive-threshold parameters (A8). Integer contract:
#   pixel is INK  <=>  pix * area * 100 < window_sum * (100 - T_PCT)
# i.e. pix < local_mean * (1 - T_PCT/100), strict '<' (tie → background).
THRESH_WINDOW = 15  # odd; local window half-extent = 7
T_PCT = 15

# Ruling detection (A10): a row/col is part of a ruling iff its ink count
# is >= RULING_NUM/RULING_DEN of the dimension (strict table rulings span
# the full image; text rows peak below ~0.75 — margin analysis in
# tests/test_imageproc.py).
RULING_NUM = 85
RULING_DEN = 100


def decode_image(data: bytes, width: int, height: int, fmt: str) -> np.ndarray:
    """A7: image bytes → (height, width) uint8 grayscale array.

    fmt 'raw-u8': row-major raw bytes. fmt 'png': minimal grayscale
    8-bit PNG reader (stdlib zlib; filters 0–4) — no cv2/PIL in env.
    """
    if fmt == "raw-u8":
        arr = np.frombuffer(data, dtype=np.uint8, count=width * height)
        return arr.reshape(height, width).copy()
    if fmt == "png":
        return _decode_png_gray8(data, width, height)
    raise ValueError(f"unsupported media fmt: {fmt!r}")


def _decode_png_gray8(data: bytes, width: int, height: int) -> np.ndarray:
    """Minimal PNG decoder for 8-bit grayscale, no interlace."""
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, idat = 8, []
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            w, h, depth, color = struct.unpack(">IIBB", chunk[:10])
            if (w, h, depth, color) != (width, height, 8, 0):
                raise ValueError("only 8-bit grayscale PNG supported")
        elif ctype == b"IDAT":
            idat.append(chunk)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    raw = zlib.decompress(b"".join(idat))
    stride = width + 1
    out = np.zeros((height, width), dtype=np.uint8)
    prev = np.zeros(width, dtype=np.int32)
    for y in range(height):
        line = raw[y * stride : (y + 1) * stride]
        ftype, row = line[0], np.frombuffer(line[1:], dtype=np.uint8).astype(np.int32)
        if ftype == 0:
            cur = row
        elif ftype == 2:  # Up
            cur = (row + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need a scan
            cur = np.zeros(width, dtype=np.int32)
            a = 0
            for x in range(width):
                b, c = int(prev[x]), int(prev[x - 1]) if x else 0
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                cur[x] = (int(row[x]) + pred) & 0xFF
                a = int(cur[x])
        else:
            raise ValueError(f"bad PNG filter {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out


def encode_png_gray8(img: np.ndarray) -> bytes:
    """Minimal 8-bit grayscale PNG writer (filter 0) — fixture generation
    and the fmt='png' round-trip test."""
    h, w = img.shape

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + ctype
            + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def integral_image(img: np.ndarray) -> np.ndarray:
    """Zero-padded integral image, int32 (exact: 255·H·W stays far below
    2^31 for the table-image sizes this engine handles; int32 halves the
    memory traffic of the hottest stage — the decode UDF is DRAM-bound
    when 32 workers run concurrently)."""
    ii = np.zeros((img.shape[0] + 1, img.shape[1] + 1), dtype=np.int32)
    np.cumsum(np.cumsum(img, axis=0, dtype=np.int32), axis=1, out=ii[1:, 1:])
    return ii


def adaptive_threshold(gray: np.ndarray) -> np.ndarray:
    """A8: Bradley–Roth local-mean binarization → uint8 ink mask (1=ink).

    Mirror-reflected padding makes every window full-size (constant area),
    so the window sum is a pure 4-slice expression over one integral
    image — no fancy-indexing gathers. All-integer comparison: ink iff
        pix * W² * 100 < window_sum * (100 - T_PCT),
    strict '<' (tie → background). Bit-deterministic.
    """
    half = THRESH_WINDOW // 2
    w_sq = THRESH_WINDOW * THRESH_WINDOW
    # 'reflect' (mirror about the border pixel) — edge replication would
    # stack a dark border RULING 7× into its own window and erode it
    p = np.pad(gray, half, mode="reflect")
    ii = integral_image(p)
    k = THRESH_WINDOW
    s = ii[k:, k:] - ii[:-k, k:] - ii[k:, :-k] + ii[:-k, :-k]
    return (gray.astype(np.int32) * (w_sq * 100) < s * (100 - T_PCT)).astype(np.uint8)


def denoise(mask: np.ndarray) -> np.ndarray:
    """A9: single-pass speck removal (no scipy in env):
      * ink pixel with zero ink 8-neighbors → background (kills salt);
      * background pixel with all 8 neighbors ink → ink (fills holes).
    Preserves 1-px strokes and rulings exactly (every stroke pixel has
    >= 1 ink neighbor)."""
    p = np.zeros((mask.shape[0] + 2, mask.shape[1] + 2), dtype=np.uint8)
    p[1:-1, 1:-1] = mask
    nb = (
        p[:-2, :-2] + p[:-2, 1:-1] + p[:-2, 2:]
        + p[1:-1, :-2] + p[1:-1, 2:]
        + p[2:, :-2] + p[2:, 1:-1] + p[2:, 2:]
    )
    out = mask.copy()
    out[(mask == 1) & (nb == 0)] = 0
    out[(mask == 0) & (nb == 8)] = 1
    return out


def _ruling_positions(profile: np.ndarray, extent: int) -> list[int]:
    """Collapse consecutive above-threshold indices to one position each
    (rulings are 1 px in fixtures, but tolerate thicker runs: take the
    run's first index — deterministic)."""
    hits = np.flatnonzero(profile.astype(np.int64) * RULING_DEN >= RULING_NUM * extent)
    out: list[int] = []
    for idx in hits.tolist():
        if not out or idx > out[-1] + 1:
            out.append(idx)
        # else: continuation of the previous ruling run — skip
    return out


def detect_rulings(mask: np.ndarray) -> tuple[list[int], list[int]]:
    """A10: projection-profile ruling detection → (row_lines, col_lines).

    A row (col) is a ruling iff >= 85% of its pixels are ink. The noisy
    fixtures keep ruling rows ≥ 97% ink after thresholding while the
    densest text row stays ≤ 75% (margin asserted in tests).
    """
    h, w = mask.shape
    rows = _ruling_positions(mask.sum(axis=1, dtype=np.int32), w)
    cols = _ruling_positions(mask.sum(axis=0, dtype=np.int32), h)
    return rows, cols


def reconstruct_grid(
    rows: list[int], cols: list[int]
) -> list[tuple[int, int, int, int, int, int]]:
    """A11: ruling positions → cell interior boxes.

    Returns [(r, c, y0, x0, y1, x1)] in row-major order; the interior is
    the open region strictly between consecutive rulings
    (y0 = row[i]+1, y1 = row[i+1], exclusive)."""
    cells = []
    for r in range(len(rows) - 1):
        for c in range(len(cols) - 1):
            cells.append(
                (r, c, rows[r] + 1, cols[c] + 1, rows[r + 1], cols[c + 1])
            )
    return cells


def hough_accumulator(
    mask: np.ndarray, n_theta: int = 180, rho_res: int = 1
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """A10 (alternative): Duda & Hart 1972 Hough accumulator for line
    detection, pure numpy. Returns (acc[theta_idx, rho_idx], thetas,
    rhos). The projection-profile detector is the default (exact for
    axis-aligned rulings); this variant exists for skewed scans and is
    vote-count deterministic (integer accumulator, fixed binning)."""
    h, w = mask.shape
    ys, xs = np.nonzero(mask)
    thetas = np.linspace(0.0, np.pi, n_theta, endpoint=False)
    diag = int(np.ceil(np.hypot(h, w)))
    n_rho = 2 * diag // rho_res + 1
    acc = np.zeros((n_theta, n_rho), dtype=np.int32)
    cos_t, sin_t = np.cos(thetas), np.sin(thetas)
    for ti in range(n_theta):
        rho = xs * cos_t[ti] + ys * sin_t[ti]
        bins = np.floor((rho + diag) / rho_res + 0.5).astype(np.int64)
        acc[ti] += np.bincount(bins, minlength=n_rho).astype(np.int32)
    rhos = np.arange(n_rho) * rho_res - diag
    return acc, thetas, rhos


def detect_rulings_hough(mask: np.ndarray) -> tuple[list[int], list[int]]:
    """Ruling positions via the Hough accumulator: peaks at theta=90deg
    (horizontal lines, rho=y) and theta=0 (vertical lines, rho=x) with
    the same >= 85% vote threshold as the projection profiles. For
    axis-aligned tables this is exactly equivalent to detect_rulings
    (asserted in tests); kept for skewed inputs."""
    h, w = mask.shape
    acc, thetas, rhos = hough_accumulator(mask, n_theta=180)
    v_idx = 0  # theta = 0 → vertical lines (rho = x)
    h_idx = 90  # theta = pi/2 → horizontal lines (rho = y)
    cols_votes = np.zeros(w, dtype=np.int64)
    rows_votes = np.zeros(h, dtype=np.int64)
    for rho_i, votes in enumerate(acc[v_idx]):
        x = int(rhos[rho_i])
        if 0 <= x < w:
            cols_votes[x] += int(votes)
    for rho_i, votes in enumerate(acc[h_idx]):
        y = int(rhos[rho_i])
        if 0 <= y < h:
            rows_votes[y] += int(votes)
    rows = _ruling_positions(rows_votes, w)
    cols = _ruling_positions(cols_votes, h)
    return rows, cols
