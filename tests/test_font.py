"""Font contract tests (FIXTURES.md §3)."""

import numpy as np

from text_extraction_spark.engine import font


def _flat():
    return font.GLYPHS.reshape(len(font.GLYPHS), -1).astype(np.int16)


def test_glyph_shapes():
    assert font.GLYPHS.shape == (len(font.ALPHABET), font.GLYPH_H, font.GLYPH_W)
    assert set(np.unique(font.GLYPHS)) <= {0, 1}


def test_min_interglyph_distance():
    f = _flat()
    d = np.abs(f[:, None, :] - f[None, :, :]).sum(axis=2)
    np.fill_diagonal(d, 10_000)
    assert d.min() >= font.MIN_INTERGLYPH_DIST


def test_min_ink_vs_blank():
    assert _flat().sum(axis=1).min() >= font.MIN_INK


def test_clean_decode_every_glyph():
    for ch in font.ALPHABET:
        assert font.match_glyph(font.GLYPHS[font.ALPHABET.index(ch)]) == ch
    assert font.match_glyph(np.zeros((7, 5), dtype=np.uint8)) == ""


def test_exhaustive_single_flip_decode():
    """MIN_INTERGLYPH_DIST >= 4 and MIN_INK >= 3 imply any 1-px corruption
    still decodes to the original glyph — checked exhaustively."""
    for gi, ch in enumerate(font.ALPHABET):
        base = font.GLYPHS[gi].reshape(-1)
        for p in range(base.size):
            noisy = base.copy()
            noisy[p] ^= 1
            assert font.match_glyph(noisy.reshape(7, 5)) == ch, (ch, p)


def test_render_text_geometry_and_decode():
    text = "AB-9,%"
    img = font.render_text(text)
    assert img.shape == (font.GLYPH_H, len(text) * font.ADVANCE - 2)
    slots = np.stack(
        [img[:, k * font.ADVANCE : k * font.ADVANCE + font.GLYPH_W] for k in range(len(text))]
    )
    assert "".join(font.match_slots(slots)) == text


def test_match_slots_matches_match_glyph():
    rng = np.random.Generator(np.random.PCG64(7))
    slots = (rng.random((20, 7, 5)) < 0.3).astype(np.uint8)
    assert font.match_slots(slots) == [font.match_glyph(s) for s in slots]


def test_vectorized_table_decode_equals_per_cell():
    """extract_table's one-pass gather+matmul decode must be bit-identical
    to the per-cell decode_cell path (same distances, same tie-breaks)."""
    from text_extraction_spark import corpus
    from text_extraction_spark.engine import imageproc, ocr

    checked = 0
    i = -1
    while checked < 60:
        i += 1
        m = corpus.gen_media(f"veq-{i}")
        if m.fmt == "pdf":  # A20 media take the pdfproc path, not OCR
            continue
        if corpus.is_skewed_media(f"veq-{i}"):
            continue  # deskew path decodes a rotated mask — test_skew.py
        checked += 1
        gray = imageproc.decode_image(m.data, m.width, m.height, m.fmt)
        mask = imageproc.denoise(imageproc.adaptive_threshold(gray))
        rows, cols = imageproc.detect_rulings(mask)
        if len(rows) < 2 or len(cols) < 2:  # embedded media (round 2):
            # same region fallback extract_table's auto detector uses
            rows, cols = imageproc.detect_rulings_hough_region(mask)
        cells = imageproc.reconstruct_grid(rows, cols)
        n_cols = len(cols) - 1
        texts = [ocr.decode_cell(mask, y0, x0, y1, x1) for (_, _, y0, x0, y1, x1) in cells]
        per_cell = "\n".join(
            "|".join(texts[r * n_cols : (r + 1) * n_cols]) for r in range(len(rows) - 1)
        )
        assert ocr.extract_table(gray) == per_cell


def test_vectorized_decode_equals_per_cell_on_nonuniform_grid():
    """Regression (round-2 ADVICE): the vectorized path used the
    grid-wide MIN cell width, truncating wider columns on ragged grids.
    Slot counts are now per-column and short rows are masked — identical
    to decode_cell on a grid mixing 6/3/1/0-glyph columns and a
    too-short row."""
    from text_extraction_spark.engine import imageproc, ocr

    cw = [font.CELL_W, 2 * font.PAD + 3 * font.ADVANCE - 2,
          2 * font.PAD + font.GLYPH_W, 5]
    rh = [font.CELL_H, font.PAD + font.GLYPH_H - 1, font.CELL_H + 4]
    texts = [["ABCDEF", "XYZ", "Q", ""], ["AA", "BB", "C", ""],
             ["0.5%", "-12", "Z", ""]]
    cols = [0]
    for w_ in cw:
        cols.append(cols[-1] + w_ + 1)
    rows = [0]
    for h_ in rh:
        rows.append(rows[-1] + h_ + 1)
    ink = np.zeros((rows[-1] + 1, cols[-1] + 1), np.uint8)
    for r in rows:
        ink[r, :] = 1
    for c in cols:
        ink[:, c] = 1
    for i in range(len(rh)):
        for j in range(len(cw)):
            if not texts[i][j]:
                continue
            y, x = rows[i] + 1 + font.PAD, cols[j] + 1 + font.PAD
            bmp = font.render_text(texts[i][j])
            if y + font.GLYPH_H <= rows[i + 1] and x + bmp.shape[1] <= cols[j + 1]:
                ink[y : y + font.GLYPH_H, x : x + bmp.shape[1]] = bmp
    gray = (255 - ink * 200).astype(np.uint8)
    mask = imageproc.denoise(imageproc.adaptive_threshold(gray))
    r2, c2 = imageproc.detect_rulings(mask)
    assert (r2, c2) == (rows, cols)
    cells = imageproc.reconstruct_grid(r2, c2)
    ref = [ocr.decode_cell(mask, y0, x0, y1, x1) for (_, _, y0, x0, y1, x1) in cells]
    ref_str = "\n".join(
        "|".join(ref[r * len(cw) : (r + 1) * len(cw)]) for r in range(len(rh))
    )
    assert ocr.extract_table(gray) == ref_str
    # the truncation bug would have decoded the 6-glyph cell as 1 char
    assert ref_str.startswith("ABCDEF|XYZ|Q|")
