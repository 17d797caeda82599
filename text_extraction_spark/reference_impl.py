"""Single-process per-document extraction oracle (SURVEY.md §0, §5.2).

/root/reference is empty in this sandbox (SURVEY §0), so THIS module is
the golden reference the distributed pipeline must match exactly under
span-sequence equality (kind, text, media_ref, order) per doc_id
[B:14, B:15]. It composes the same pure engine stages the Spark UDFs
use, straight-line and single-threaded — mirroring the reference repo's
one-image-at-a-time script shape (SURVEY §3.1) — so any divergence in
the Spark pipeline (ordering, partitioning, Arrow round-trip, salting)
shows up as a golden mismatch.

Semantics:
  * text span  → Kohlschütter main-content extraction (A5+A6); spans
    whose every block is boilerplate are DROPPED (consume no `order`).
  * media span → resolve media_ref; fmt 'pdf' → PDF/layout text parse
    (A20); image fmts → decode (A7) + table extraction (A8–A13);
    unresolvable refs, corrupt payloads, grid-less images and empty
    PDFs are DROPPED.
  * survivors get `order` = 0-based dense rank by input `offset`
    (offsets may be sparse — SURVEY §7 hazard 2).
"""

from __future__ import annotations

from typing import Mapping

from .engine.boilerplate import extract_main
from .engine.imageproc import decode_image
from .engine.ocr import extract_table, normalize_text
from .engine.pdfproc import extract_pdf_text


def extract_span(kind: str, text: str | None, media_ref: str | None,
                 media_lookup: Mapping[str, object]) -> dict | None:
    """Extract one span → output dict (without `order`) or None if dropped."""
    if kind == "text":
        main = normalize_text(extract_main(text or ""))
        if not main:
            return None
        return {"kind": "text", "text": main, "media_ref": None}
    if kind == "media":
        m = media_lookup.get(media_ref)
        if m is None:
            return None
        try:
            if m.fmt == "pdf":
                table = extract_pdf_text(m.data)  # A20 PDF/layout parse
            else:
                gray = decode_image(m.data, m.width, m.height, m.fmt)
                table = extract_table(gray)
        except Exception:
            # corrupt payload — dropped, mirroring the pipeline UDF's
            # error handling (counted as media_err there)
            return None
        if not table:
            return None
        return {"kind": "media", "text": table, "media_ref": media_ref}
    return None


def extract_doc(spans: list[dict], media_lookup: Mapping[str, object]) -> list[dict]:
    """Per-document oracle: input spans (kind,text,media_ref,offset) →
    output spans (kind,text,media_ref,order), order dense by offset.

    Ties (duplicate offsets — input_hint does not forbid them) break by
    the SAME total order the pipeline's sort_array applies to its output
    structs: (offset, kind, extracted_text, media_ref). Within one
    (offset, kind) the nullable fields are never null-vs-non-null mixed
    (text spans: text set / media_ref None; media spans: the reverse),
    so ''-for-None keeps the comparison identical to Spark's
    nulls-first struct ordering."""
    survivors = []
    for s in sorted(spans, key=lambda s: s["offset"]):
        out = extract_span(s["kind"], s.get("text"), s.get("media_ref"), media_lookup)
        if out is not None:
            survivors.append((s["offset"], out))
    survivors.sort(
        key=lambda p: (p[0], p[1]["kind"], p[1]["text"] or "", p[1]["media_ref"] or "")
    )
    out_spans = [p[1] for p in survivors]
    for i, s in enumerate(out_spans):
        s["order"] = i
    return out_spans
