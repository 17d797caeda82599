"""Deterministic interleaved-corpus generator (FIXTURES.md §2).

Everything is a pure function of (seed=42, id): documents of
`doc_id, spans:array<struct<kind,text,media_ref,offset>>` (the exact
input_hint shape [B:15]), a `media` image store of rendered noisy table
images, and generation-time EXPECTED outputs used by sanity tests.
The *golden* table consumed by the equality gate is produced separately
by reference_impl.extract_doc (SURVEY §0) — never by this generator.

No external data; no use of Python's salted ``hash()`` (PYTHONHASHSEED
would break determinism) — ids are hashed with sha256.
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass, field

import numpy as np

from .engine import font
from .engine.imageproc import encode_png_gray8

SEED = 42
P_MEDIA = 0.2
P_MEDIA_HEAVY_DOC = 0.05
NOISE_P = 0.02  # salt-and-pepper probability per pixel
PNG_FRACTION = 0.1  # fraction of IMAGE media stored as real PNG (rest raw-u8)
PDF_FRACTION = 0.25  # fraction of media spans that are PDF documents (A20)
RGB_FRACTION = 0.15  # fraction of image media stored as 3-channel color
EMBED_FRACTION = 0.15  # fraction of tables embedded in a larger page
# (margins around the table → projection profiles fail, the Hough REGION
# detector recovers the grid — imageproc.detect_rulings_hough_region)
SKEW_FRACTION = 0.1  # fraction of tables scanned at a 0.8–4° tilt
# (straight detectors all fail → fine-theta skew estimate + fixed-point
# NN deskew + offset-search decode; best-effort text, exact golden by
# construction — the oracle shares the extractor)

# Illumination gradient: background 120..255 along x+y, ink = bg - 100.
# Ink max (155) overlaps background min (120), so *global* thresholding
# cannot separate them — the adaptive stage (A8) is genuinely exercised.
ILLUM_BASE = 120
ILLUM_SPAN = 135
INK_DROP = 100

CONTENT_WORDS = (
    "the quick brown fox jumps over a lazy dog while seventeen green "
    "bottles stand on the wall and every morning the river carries "
    "small boats toward the harbor where merchants trade grain salt "
    "copper cloth and stories about distant mountains that nobody has "
    "climbed since the old bridge collapsed during the great storm of "
    "the previous century leaving only careful records in the town "
    "archive which historians still consult when they argue about the "
    "true price of wheat and the number of ships lost at sea"
).split()

NAV_WORDS = (
    "home about contact login register privacy terms sitemap search "
    "menu next previous subscribe share follow copyright careers help "
    "faq blog news settings profile cart checkout"
).split()


def stable_hash(*parts: object) -> int:
    """64-bit stable hash of the parts — rng seeding, never Python hash()."""
    h = hashlib.sha256(":".join(str(p) for p in parts).encode()).digest()
    return int.from_bytes(h[:8], "little")


def _rng(*parts: object) -> np.random.Generator:
    return np.random.Generator(np.random.PCG64(stable_hash(SEED, *parts)))


# ---------------------------------------------------------------- text spans


def gen_text_span(doc_id: str, span_idx: int) -> tuple[str, str]:
    """→ (pseudo_html, expected_main_text).

    Content blocks: 17–60 plain words (always > 16 words, zero link
    density → the Kohlschütter tree keeps them unconditionally).
    Boilerplate blocks: even 2–8 words, exactly half wrapped in
    <a href>…</a> → link density 1/2 ∈ (1/3, 5/9], so they classify
    boilerplate unconditionally AND as `prev` stay on the low-link
    branch. This makes the expected answer knowable at generation time
    (FIXTURES §2.1) while exercising both classifier paths.
    """
    rng = _rng("text", doc_id, span_idx)
    n_blocks = int(rng.integers(1, 6))
    parts: list[str] = []
    expected: list[str] = []
    for b in range(n_blocks):
        if rng.random() < 0.6:  # content block
            n = int(rng.integers(17, 61))
            words = [CONTENT_WORDS[int(i)] for i in rng.integers(0, len(CONTENT_WORDS), n)]
            tag = ("p", "div", "h2")[int(rng.integers(0, 3))]
            sep = "\n  " if rng.random() < 0.3 else " "
            parts.append(f"<{tag}>{sep.join(words)}</{tag}>")
            expected.append(" ".join(words))
        else:  # boilerplate block
            n = int(rng.integers(1, 5)) * 2  # even: 2,4,6,8
            words = [NAV_WORDS[int(i)] for i in rng.integers(0, len(NAV_WORDS), n)]
            linked = " ".join(f'<a href="#{w}">{w}</a>' for w in words[: n // 2])
            parts.append(f"<div>{linked} {' '.join(words[n // 2 :])}</div>")
    return "".join(parts), " ".join(expected)


# --------------------------------------------------------------- media spans


def gen_table_content(media_ref: str) -> tuple[list[list[str]], str]:
    """→ (cell text grid, expected row-major string) for a media_ref."""
    rng = _rng("table", media_ref)
    n_rows = int(rng.integers(2, 6))
    n_cols = int(rng.integers(2, 5))
    grid: list[list[str]] = []
    for _ in range(n_rows):
        row = []
        for _ in range(n_cols):
            n = int(rng.integers(1, font.MAX_CHARS + 1))
            row.append(
                "".join(font.ALPHABET[int(i)] for i in rng.integers(0, len(font.ALPHABET), n))
            )
        grid.append(row)
    expected = "\n".join("|".join(r) for r in grid)
    return grid, expected


def render_table(grid: list[list[str]]) -> np.ndarray:
    """Render the cell grid → clean ink mask (uint8, ink=1).

    Geometry shared with the extractor via font metrics: 1-px rulings,
    cell interior CELL_W x CELL_H, glyphs left-aligned at PAD with
    stride ADVANCE."""
    n_rows, n_cols = len(grid), len(grid[0])
    h = n_rows * (font.CELL_H + 1) + 1
    w = n_cols * (font.CELL_W + 1) + 1
    ink = np.zeros((h, w), dtype=np.uint8)
    for r in range(n_rows + 1):
        ink[r * (font.CELL_H + 1), :] = 1
    for c in range(n_cols + 1):
        ink[:, c * (font.CELL_W + 1)] = 1
    for r in range(n_rows):
        for c in range(n_cols):
            y = r * (font.CELL_H + 1) + 1 + font.PAD
            x = c * (font.CELL_W + 1) + 1 + font.PAD
            bitmap = font.render_text(grid[r][c])
            ink[y : y + font.GLYPH_H, x : x + bitmap.shape[1]] = bitmap
    return ink


def render_noisy_image(media_ref: str, ink: np.ndarray) -> np.ndarray:
    """Ink mask → noisy grayscale: illumination gradient + salt-pepper."""
    h, w = ink.shape
    ys, xs = np.mgrid[0:h, 0:w]
    illum = ILLUM_BASE + (ILLUM_SPAN * (xs + ys)) // (w + h - 2)
    gray = (illum - INK_DROP * ink.astype(np.int64)).astype(np.uint8)
    rng = _rng("noise", media_ref)
    noise = rng.random(ink.shape) < NOISE_P
    saltpepper = (rng.random(ink.shape) < 0.5).astype(np.uint8) * 255
    gray = np.where(noise, saltpepper, gray).astype(np.uint8)
    return gray


@dataclass
class Media:
    media_ref: str
    width: int
    height: int
    fmt: str
    data: bytes
    expected_text: str  # generation-time truth; sanity tests only


def gen_pdf_media(media_ref: str) -> Media:
    """PDF media span (A20): 1–2 pages of word lines, operator mix and
    compression chosen per-ref so the whole reader surface (Td/TD/T*/Tm
    positioning, Tj vs kerned TJ, split /Contents, Flate on/off) is a
    live corpus condition. expected = the layout-ordered text."""
    from .engine.pdfproc import encode_pdf

    rng = _rng("pdf", media_ref)
    n_pages = 1 if rng.random() < 0.7 else 2
    pages: list[list[str]] = []
    for _ in range(n_pages):
        n_lines = int(rng.integers(2, 7))
        pages.append(
            [
                " ".join(
                    CONTENT_WORDS[int(i)]
                    for i in rng.integers(0, len(CONTENT_WORDS), int(rng.integers(3, 9)))
                )
                for _ in range(n_lines)
            ]
        )
    variant = ("td", "tstar", "tm", "tj_kerned", "quote")[int(rng.integers(0, 5))]
    data = encode_pdf(
        pages,
        compress=rng.random() < 0.7,
        variant=variant,
        split_content=rng.random() < 0.2,
    )
    expected = "\n".join("\n".join(p) for p in pages)
    return Media(media_ref, 612, 792, "pdf", data, expected)


# Media composition profile: the fraction knobs gen_media draws against.
# CONTROL_PROFILE regenerates the ROUND-1-comparable mix (gray raw/png
# images only — no PDF, color, embedded or skewed media) so bench.py can
# report one throughput number whose cross-round deltas are never
# confounded by corpus-mix changes (VERDICT r2 wrong #5).
CONTROL_PROFILE = {"pdf": 0.0, "png": PNG_FRACTION, "rgb": 0.0, "embed": 0.0, "skew": 0.0}
_DEFAULT_PROFILE = {
    "pdf": PDF_FRACTION,
    "png": PNG_FRACTION,
    "rgb": RGB_FRACTION,
    "embed": EMBED_FRACTION,
    "skew": SKEW_FRACTION,
}


def is_skewed_media(media_ref: str, profile: dict | None = None) -> bool:
    """Whether this (image) media_ref renders at a tilt — exposed so
    tests can hold skewed media to their own (best-effort) accuracy
    floor; the GOLDEN contract stays exact for every media kind."""
    p = profile or _DEFAULT_PROFILE
    return _rng("skew", media_ref).random() < p["skew"]


def gen_media(media_ref: str, profile: dict | None = None) -> Media:
    p = {**_DEFAULT_PROFILE, **(profile or {})}
    if _rng("mediakind", media_ref).random() < p["pdf"]:
        return gen_pdf_media(media_ref)
    grid, expected = gen_table_content(media_ref)
    ink = render_table(grid)
    erng = _rng("embed", media_ref)
    if erng.random() < p["embed"]:
        th, tw = ink.shape
        top, left = int(erng.integers(8, 40)), int(erng.integers(8, 40))
        bot, right = int(erng.integers(8, 40)), int(erng.integers(8, 40))
        page = np.zeros((th + top + bot, tw + left + right), np.uint8)
        page[top : top + th, left : left + tw] = ink
        ink = page
    elif is_skewed_media(media_ref, p):
        from .engine.imageproc import rotate_mask_nn

        srng = _rng("skewang", media_ref)
        th, tw = ink.shape
        page = np.zeros((th + 40, tw + 40), np.uint8)
        page[20 : 20 + th, 20 : 20 + tw] = ink
        ang = float(srng.uniform(0.8, 4.0)) * (1 if srng.random() < 0.5 else -1)
        ink = rotate_mask_nn(page, ang)
    gray = render_noisy_image(media_ref, ink)
    h, w = gray.shape
    rng = _rng("fmt", media_ref)
    use_png = rng.random() < p["png"]
    use_rgb = rng.random() < p["rgb"]
    if use_rgb:
        # color media: channel-replicated gray (integer luma with weights
        # summing to 256 maps R=G=B=v back to exactly v, so the color
        # path shares the SAME golden truth as the gray path)
        rgb = np.repeat(gray[:, :, None], 3, axis=2)
        if use_png:
            from .engine.imageproc import encode_png_rgb8

            return Media(media_ref, w, h, "png", encode_png_rgb8(rgb), expected)
        return Media(media_ref, w, h, "raw-rgb8", rgb.tobytes(), expected)
    if use_png:
        return Media(media_ref, w, h, "png", encode_png_gray8(gray), expected)
    return Media(media_ref, w, h, "raw-u8", gray.tobytes(), expected)


# ----------------------------------------------------------------- documents


@dataclass
class Doc:
    doc_id: str
    # spans as dicts matching the input_hint struct fields exactly
    spans: list[dict] = field(default_factory=list)
    expected_texts: list[tuple[int, str]] = field(default_factory=list)  # (offset, main text)


def gen_doc(doc_index: int) -> Doc:
    """One document: interleaved text/media spans, offsets with gaps AND
    occasional duplicates (gap 0) — input_hint doesn't promise unique
    offsets, so the tie-break path of the order assignment is a real
    fixture condition, not an untested branch."""
    doc_id = f"doc-{doc_index:08d}"
    rng = _rng("doc", doc_id)
    heavy = rng.random() < P_MEDIA_HEAVY_DOC
    if heavy:
        n_media = int(rng.integers(6, 13))
        n_text = int(rng.integers(1, 4))
        kinds = ["media"] * n_media + ["text"] * n_text
        rng.shuffle(kinds)
    else:
        n_spans = int(rng.integers(1, 13))
        kinds = ["media" if rng.random() < P_MEDIA else "text" for _ in range(n_spans)]
    doc = Doc(doc_id=doc_id)
    offset = 0
    media_j = 0
    for i, kind in enumerate(kinds):
        # gaps 1–3 usually; ~15% a 0-gap → duplicate offset (tie-break
        # between the pipeline's sort_array and the oracle is exercised)
        gap = int(rng.integers(1, 4)) if rng.random() >= 0.15 or i == 0 else 0
        offset += gap
        if kind == "text":
            html, expected = gen_text_span(doc_id, i)
            doc.spans.append(
                {"kind": "text", "text": html, "media_ref": None, "offset": offset}
            )
            doc.expected_texts.append((offset, expected))
        else:
            ref = f"img-{doc_index:08d}-{media_j}"
            media_j += 1
            doc.spans.append(
                {"kind": "media", "text": None, "media_ref": ref, "offset": offset}
            )
    return doc


def _gen_doc_chunk(args: tuple[int, int]) -> list[Doc]:
    lo, hi = args
    return [gen_doc(i) for i in range(lo, hi)]


def _gen_media_chunk(args: tuple[list[str], dict | None]) -> list[Media]:
    refs, profile = args
    return [gen_media(r, profile) for r in refs]


def gen_corpus(
    n_docs: int, workers: int | None = None, profile: dict | None = None
) -> tuple[list[Doc], list[Media]]:
    """Generate the corpus, optionally in parallel: every doc/media is a
    pure function of its id, so chunks generate independently and are
    reassembled IN ORDER — output is byte-identical at any worker count
    (asserted in tests). Parallelism matters operationally: a cold
    fixture cache regenerates the 60k-doc bench corpus inside the
    driver's bench run, and ~6 single-threaded minutes there would look
    like a hang."""
    if workers is None:
        workers = min(16, os.cpu_count() or 1) if n_docs >= 5000 else 1
    if workers <= 1:
        docs = [gen_doc(i) for i in range(n_docs)]
        media = [
            gen_media(s["media_ref"], profile)
            for d in docs
            for s in d.spans
            if s["kind"] == "media"
        ]
        return docs, media
    from concurrent.futures import ProcessPoolExecutor

    step = max(1, -(-n_docs // (workers * 4)))  # 4 chunks per worker
    doc_chunks = [(lo, min(lo + step, n_docs)) for lo in range(0, n_docs, step)]
    with ProcessPoolExecutor(max_workers=workers) as ex:
        docs = [d for chunk in ex.map(_gen_doc_chunk, doc_chunks) for d in chunk]
        refs = [s["media_ref"] for d in docs for s in d.spans if s["kind"] == "media"]
        rstep = max(1, -(-len(refs) // (workers * 4)))
        # profile rides the chunk payload: correct under fork AND spawn
        ref_chunks = [
            (refs[i : i + rstep], profile) for i in range(0, len(refs), rstep)
        ]
        media = [m for chunk in ex.map(_gen_media_chunk, ref_chunks) for m in chunk]
    return docs, media


# ------------------------------------------------------------- parquet output


def write_corpus_parquet(
    out_dir: str,
    n_docs: int,
    with_golden: bool = True,
    profile: dict | None = None,
) -> dict:
    """Materialize documents/media(/golden) parquet under out_dir.

    golden.parquet is produced by reference_impl.extract_doc — the
    single-process oracle (SURVEY §0) — NOT by generation-time
    expectations."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from .reference_impl import extract_doc

    os.makedirs(out_dir, exist_ok=True)
    docs, media = gen_corpus(n_docs, profile=profile)

    span_t = pa.struct(
        [("kind", pa.string()), ("text", pa.string()),
         ("media_ref", pa.string()), ("offset", pa.int32())]
    )
    doc_tbl = pa.table(
        {
            "doc_id": pa.array([d.doc_id for d in docs], pa.string()),
            "spans": pa.array([d.spans for d in docs], pa.list_(span_t)),
        }
    )
    # Realistic row-group sizes: Spark assigns a scan split only the row
    # groups whose midpoint falls inside it — a single giant row group
    # would serialize the whole scan (and the decode UDF that runs at
    # scan partitioning) onto one task.
    pq.write_table(
        doc_tbl, os.path.join(out_dir, "documents.parquet"), row_group_size=2000
    )

    media_tbl = pa.table(
        {
            "media_ref": pa.array([m.media_ref for m in media], pa.string()),
            "width": pa.array([m.width for m in media], pa.int32()),
            "height": pa.array([m.height for m in media], pa.int32()),
            "fmt": pa.array([m.fmt for m in media], pa.string()),
            "data": pa.array([m.data for m in media], pa.binary()),
        }
    )
    # Small row groups: the decode UDF runs at scan partitioning, and a
    # row group is the minimum split unit — 256 rows ≈ 3 MB keeps scan
    # splits fine-grained enough to balance decode cost across cores.
    pq.write_table(
        media_tbl, os.path.join(out_dir, "media.parquet"), row_group_size=256
    )

    stats = {"n_docs": len(docs), "n_media": len(media)}
    if with_golden:
        # Per-media single-process oracle outputs (media_ref → extracted
        # text, NULL = dropped): lets the driver VALUE-check the
        # standalone media query (x06) against the same oracle the
        # pipeline gate uses — DuckDB reads this parquet while Spark
        # re-extracts from the raw bytes.
        from .reference_impl import extract_span

        lookup_all = {m.media_ref: m for m in media}
        rows = []
        for m in media:
            out = extract_span("media", None, m.media_ref, lookup_all)
            rows.append(out["text"] if out is not None else None)
        pq.write_table(
            pa.table(
                {
                    "media_ref": pa.array([m.media_ref for m in media], pa.string()),
                    "table_text": pa.array(rows, pa.string()),
                }
            ),
            os.path.join(out_dir, "media_golden.parquet"),
        )
    # PDF generation-time truth (A20): PDF parsing is lossless (unlike
    # the noisy-image OCR path), so expected_text doubles as a value
    # ORACLE — the driver's DuckDB side reads this parquet while Spark
    # re-extracts from the raw bytes (extraction_queries.x08).
    pdfs = [m for m in media if m.fmt == "pdf"]
    if pdfs:
        pq.write_table(
            pa.table(
                {
                    "media_ref": pa.array([m.media_ref for m in pdfs], pa.string()),
                    "expected_text": pa.array([m.expected_text for m in pdfs], pa.string()),
                }
            ),
            os.path.join(out_dir, "pdf_expected.parquet"),
        )
        stats["n_pdf"] = len(pdfs)
    if with_golden:
        lookup = {m.media_ref: m for m in media}
        out_span_t = pa.struct(
            [("kind", pa.string()), ("text", pa.string()),
             ("media_ref", pa.string()), ("order", pa.int32())]
        )
        golden_rows = [extract_doc(d.spans, lookup) for d in docs]
        golden_tbl = pa.table(
            {
                "doc_id": pa.array([d.doc_id for d in docs], pa.string()),
                "spans": pa.array(golden_rows, pa.list_(out_span_t)),
            }
        )
        pq.write_table(golden_tbl, os.path.join(out_dir, "golden.parquet"))
        stats["n_golden_spans"] = sum(len(r) for r in golden_rows)
    return stats
