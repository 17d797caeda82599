"""Corpus-generator + single-process-oracle tests (SURVEY §5.1–5.2).

The binding contract for the Spark pipeline is equality with
reference_impl (golden). These tests pin the oracle itself: determinism,
dense-order semantics, drop rules, and measured extraction accuracy vs
generation-time expected text.
"""

import numpy as np

from text_extraction_spark import corpus
from text_extraction_spark.engine.imageproc import decode_image
from text_extraction_spark.engine.ocr import extract_table, normalize_text
from text_extraction_spark.engine.boilerplate import extract_main
from text_extraction_spark.reference_impl import extract_doc

N_ACC = 300


def test_corpus_is_deterministic():
    d1, m1 = corpus.gen_corpus(20)
    d2, m2 = corpus.gen_corpus(20)
    assert [d.spans for d in d1] == [d.spans for d in d2]
    assert [(m.media_ref, m.data) for m in m1] == [(m.media_ref, m.data) for m in m2]


def test_doc_shape_invariants():
    docs, media = corpus.gen_corpus(50)
    refs = {m.media_ref for m in media}
    dup_offsets = 0
    sparse_docs = 0
    for d in docs:
        offsets = [s["offset"] for s in d.spans]
        assert offsets == sorted(offsets)
        dup_offsets += len(offsets) - len(set(offsets))
        sparse_docs += any(b - a > 1 for a, b in zip(offsets, offsets[1:]))
        for s in d.spans:
            if s["kind"] == "text":
                assert s["text"] is not None and s["media_ref"] is None
            else:
                assert s["text"] is None and s["media_ref"] in refs
    # input_hint doesn't promise unique offsets — the generator must
    # produce SOME duplicates so the order tie-break is a tested path —
    # while most docs keep sparse (gap > 1) offsets (SURVEY §7 hazard 2)
    assert dup_offsets > 0
    assert sparse_docs >= len(docs) // 2


def test_media_heavy_docs_exist():
    docs, _ = corpus.gen_corpus(300)
    heavy = [d for d in docs if sum(s["kind"] == "media" for s in d.spans) >= 6]
    assert len(heavy) >= 3  # ~5% of docs exercise the skew path (A3/A4)


def test_text_extraction_matches_expected_exactly():
    for i in range(200):
        html, expected = corpus.gen_text_span(f"t-{i}", 0)
        assert normalize_text(extract_main(html)) == expected


def test_media_extraction_accuracy():
    """OCR under fixture noise: >= 98% image-exact, and the misreads are
    deterministic (same result on re-run) — the oracle, not perfection,
    defines golden truth."""
    bad = []
    n_img = 0
    i = -1
    while n_img < N_ACC:
        i += 1
        m = corpus.gen_media(f"acc-{i}")
        if m.fmt == "pdf":  # A20 media are lossless-parsed, tested in test_pdf
            continue
        if corpus.is_skewed_media(f"acc-{i}"):
            continue  # best-effort path, own floor in test_skew.py
        n_img += 1
        got = extract_table(decode_image(m.data, m.width, m.height, m.fmt))
        if got != m.expected_text:
            bad.append((m.media_ref, got))
    assert len(bad) <= N_ACC * 0.02, bad[:5]
    for ref, got in bad:  # determinism of the misreads
        m = corpus.gen_media(ref)
        assert extract_table(decode_image(m.data, m.width, m.height, m.fmt)) == got


def test_png_and_raw_fmt_agree():
    i = 0
    m = corpus.gen_media("fmt-check-1")
    while m.fmt == "pdf":
        i += 1
        m = corpus.gen_media(f"fmt-check-{i + 1}")
    gray = decode_image(m.data, m.width, m.height, m.fmt)
    from text_extraction_spark.engine.imageproc import encode_png_gray8

    png = encode_png_gray8(gray)
    assert np.array_equal(decode_image(png, m.width, m.height, "png"), gray)


def test_extract_doc_dense_order_and_drops():
    docs, media = corpus.gen_corpus(80)
    lookup = {m.media_ref: m for m in media}
    dropped_any = False
    for d in docs:
        out = extract_doc(d.spans, lookup)
        assert [s["order"] for s in out] == list(range(len(out)))
        if len(out) < len(d.spans):
            dropped_any = True
        for s in out:
            assert s["kind"] in ("text", "media")
            assert s["text"]  # survivors always carry text
            if s["kind"] == "text":
                assert s["media_ref"] is None
    assert dropped_any  # all-boilerplate text spans exist and are dropped


def test_extract_doc_missing_media_dropped():
    spans = [
        {"kind": "media", "text": None, "media_ref": "nope", "offset": 1},
        {"kind": "text", "text": "<p>" + " ".join(["w"] * 20) + "</p>", "media_ref": None, "offset": 5},
    ]
    out = extract_doc(spans, {})
    assert len(out) == 1 and out[0]["kind"] == "text" and out[0]["order"] == 0


def test_extract_doc_orders_by_offset_not_input_order():
    spans = [
        {"kind": "text", "text": "<p>" + " ".join(["b"] * 20) + "</p>", "media_ref": None, "offset": 9},
        {"kind": "text", "text": "<p>" + " ".join(["a"] * 20) + "</p>", "media_ref": None, "offset": 2},
    ]
    out = extract_doc(spans, {})
    assert [s["text"].split()[0] for s in out] == ["a", "b"]


def test_parallel_generation_identical_to_serial():
    """gen_corpus must be byte-identical at any worker count (every
    doc/media is a pure function of its id; chunks reassemble in
    order) — the parallel path exists so a cold 60k-doc bench-corpus
    regeneration doesn't look like a driver hang."""
    d1, m1 = corpus.gen_corpus(60, workers=1)
    d2, m2 = corpus.gen_corpus(60, workers=4)
    assert [d.spans for d in d1] == [d.spans for d in d2]
    assert [(m.media_ref, m.fmt, m.data) for m in m1] == [
        (m.media_ref, m.fmt, m.data) for m in m2
    ]
