"""A20 (SURVEY §2-A, round 2): PDF text/layout extraction — the last
north_rule clause ("HTML boilerplate strip, PDF/layout parse, DOM
heuristics", BASELINE.json north_rule).

From-scratch implementation of the PUBLIC ISO 32000-1 subset a text
extractor needs — stdlib zlib only (no pdfminer/pypdf in env):

  reader  extract_pdf_text(data) -> str
    * object scanner: `N 0 obj … endobj`, dict + optional stream body
      (offset-table-free: xref corruption tolerated, objects are found
      by scanning, the page tree orders them when present)
    * FlateDecode stream decompression (zlib)
    * page discovery via /Type /Page + /Contents (single ref or array),
      page ORDER from the /Pages /Kids array when present
    * content-stream tokenizer: numbers, literal strings with the full
      escape set (\\n \\r \\t \\b \\f \\( \\) \\\\ \\ooo, line
      continuations), hex strings, names, arrays, operators
    * text state machine: BT/ET, Tf (size), TL, Td, TD, T*, Tm, Tj, TJ
      (kerning-aware: adjustment ≤ WORD_GAP_MILLI emits a space — the
      standard word-break inference, made bit-deterministic by a fixed
      integer threshold), ' and "
    * LAYOUT assembly: runs carry their (x, y) text-space origin; lines
      group on exact y, order top→bottom (y desc), runs within a line
      left→right (x asc, stable), pages joined by '\\n'

  writer  encode_pdf(pages, …) -> bytes
    fixture generator: valid xref + trailer, FlateDecode optional,
    operator-mix variants so the reader's whole surface is exercised
    (Td/TD/T*/Tm positioning, Tj vs kerned TJ, split /Contents arrays).

Everything is a pure function of the input bytes — bit-deterministic,
as the golden-equality gate requires. No float formatting enters the
extracted text (coordinates only order runs).
"""

from __future__ import annotations

import re
import zlib

# TJ adjustments are in thousandths of an em, negative = move right
# (spec 9.4.3). A gap of 180/1000 em (~2.2 px at 12pt) or more reads as
# a word space; intra-word kerning is an order of magnitude smaller.
WORD_GAP_MILLI = -180

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b", re.S)
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R\b")
_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


# ------------------------------------------------------------------ reader


def _scan_objects(data: bytes) -> dict[int, tuple[bytes, bytes | None]]:
    """→ {obj_num: (dict_bytes, stream_bytes|None)}. Scanning, not xref:
    robust to truncated/absent cross-reference tables."""
    out: dict[int, tuple[bytes, bytes | None]] = {}
    for m in _OBJ_RE.finditer(data):
        num = int(m.group(1))
        body_start = m.end()
        end = data.find(b"endobj", body_start)
        if end == -1:
            continue
        body = data[body_start:end]
        sm = re.search(rb"stream(\r\n|\n|\r)", body)
        if sm:
            head = body[: sm.start()]
            rest = body[sm.end() :]
            # A direct /Length is authoritative — the EOL-before-endstream
            # heuristic would eat a real byte whenever the (binary) stream
            # itself happens to end in \n or \r. An INDIRECT length
            # (`/Length 12 0 R`, common in real-world writers) must NOT be
            # read as a literal 12 (round-3 fix): the negative lookahead
            # rejects it and we fall back to the endstream scan.
            lm = re.search(rb"/Length\s+(\d+)(?!\s+\d+\s+R)\b", head)
            if lm:
                stream = rest[: int(lm.group(1))]
            else:
                se = rest.rfind(b"endstream")
                stream = rest[:se] if se != -1 else rest
                if stream.endswith(b"\r\n"):
                    stream = stream[:-2]
                elif stream.endswith(b"\n") or stream.endswith(b"\r"):
                    stream = stream[:-1]
            out[num] = (head, stream)
        else:
            out[num] = (body, None)
    return out


# PDF's whitespace is exactly these six bytes (ISO 32000-1 §7.2.3,
# Table 1) — chr(c).isspace() would additionally strip 0x0B and, worse,
# treat bytes like 0xA0 (U+00A0 NBSP) as whitespace (round-4 ADVICE fix)
_PDF_WS = frozenset(b"\x00\t\n\x0c\r ")


def _ascii_hex_decode(data: bytes) -> bytes:
    """ASCIIHexDecode (ISO 32000-1 §7.4.2): hex pairs, whitespace
    ignored, '>' EOD, odd final digit padded with 0. Malformed input
    returns unchanged — the same passthrough contract as unknown
    filters (a wrong passthrough parses to garbage, never a crash)."""
    body = data.split(b">")[0]
    hexdigits = bytes(c for c in body if c not in _PDF_WS)
    if len(hexdigits) % 2:
        hexdigits += b"0"
    try:
        return bytes.fromhex(hexdigits.decode("ascii"))
    except (ValueError, UnicodeDecodeError):
        return data


def _ascii85_decode(data: bytes) -> bytes:
    """ASCII85Decode (ISO 32000-1 §7.4.3): base-85 groups, 'z' = four
    zero bytes, '~>' EOD, partial final group. stdlib a85decode
    implements exactly this once whitespace/EOD are normalized.
    Malformed input returns unchanged (passthrough contract)."""
    import base64

    body = data.split(b"~>")[0]
    body = bytes(c for c in body if c not in _PDF_WS)
    if body.startswith(b"<~"):
        body = body[2:]
    try:
        return base64.a85decode(body)
    except ValueError:
        return data


def _decode_stream(head: bytes, stream: bytes) -> bytes:
    """Apply the stream's /Filter chain (round-3: name OR array form,
    cascades like [/ASCII85Decode /FlateDecode] applied in order per
    ISO 32000-1 §7.4.1; previously only a bare FlateDecode was
    recognized). Unknown filters pass through untouched — a wrong
    passthrough parses to garbage text, never a crash, matching the
    corruption-fuzz contract."""
    fm = re.search(rb"/Filter\s*(\[[^\]]*\]|/[A-Za-z0-9]+)", head)
    if not fm:
        return stream
    names = re.findall(rb"/([A-Za-z0-9]+)", fm.group(1))
    out = stream
    for name in names:
        if name == b"FlateDecode":
            out = zlib.decompress(out)
        elif name == b"ASCIIHexDecode":
            out = _ascii_hex_decode(out)
        elif name == b"ASCII85Decode":
            out = _ascii85_decode(out)
        # else: unsupported (DCT, LZW, ...) — pass through
    return out


def _dict_value_refs(head: bytes, key: bytes) -> list[int]:
    """Refs of /key: single `N 0 R` or array `[N 0 R M 0 R …]`."""
    km = re.search(re.escape(key) + rb"\s*", head)
    if not km:
        return []
    rest = head[km.end() :]
    if rest.startswith(b"["):
        close = rest.find(b"]")
        return [int(r.group(1)) for r in _REF_RE.finditer(rest[: close + 1])]
    m = _REF_RE.match(rest)
    return [int(m.group(1))] if m else []


def _page_content_streams(data: bytes) -> list[bytes]:
    """Page content streams, page order from /Pages /Kids when present."""
    objs = _scan_objects(data)
    pages: list[int] = []
    kids_order: list[int] = []
    for num, (head, _s) in objs.items():
        if re.search(rb"/Type\s*/Pages\b", head):
            kids_order.extend(_dict_value_refs(head, b"/Kids"))
        elif re.search(rb"/Type\s*/Page\b", head):
            pages.append(num)
    if kids_order:
        ordered = [n for n in kids_order if n in objs] + [
            n for n in sorted(pages) if n not in kids_order
        ]
    else:
        ordered = sorted(pages)
    streams: list[bytes] = []
    for pnum in ordered:
        head, _ = objs[pnum]
        crefs = _dict_value_refs(head, b"/Contents")
        # ISO 32000-1 §7.8.2: a split /Contents array forms ONE logical
        # content stream — tokens and text state (Tf/TL/Td) may span the
        # stream boundary, so decode each part and join with a whitespace
        # byte before tokenizing (round-3 fix: per-stream tokenization
        # broke conforming PDFs split mid-text-object).
        parts = [
            _decode_stream(*objs[cref])
            for cref in crefs
            if cref in objs and objs[cref][1] is not None
        ]
        streams.append(b"\n".join(parts))
    if not ordered:
        # damaged page tree: fall back to every stream that contains a
        # text block (deterministic object-number order)
        for num in sorted(objs):
            head, stream = objs[num]
            if stream is None:
                continue
            try:
                dec = _decode_stream(head, stream)
            except zlib.error:
                continue
            if b"BT" in dec:
                streams.append(dec)
    return streams


_ESC = {
    ord("n"): b"\n", ord("r"): b"\r", ord("t"): b"\t",
    ord("b"): b"\x08", ord("f"): b"\x0c",
    ord("("): b"(", ord(")"): b")", ord("\\"): b"\\",
}


def _parse_literal_string(s: bytes, i: int) -> tuple[bytes, int]:
    """s[i] == '(' → (decoded bytes, index past the closing ')')."""
    # fast path (round 7): a segment with no escape and no nested '('
    # before the first ')' needs no per-byte scan — the overwhelmingly
    # common case for generated text operands
    j = s.find(b")", i + 1)
    if j != -1:
        seg = s[i + 1 : j]
        if b"\\" not in seg and b"(" not in seg:
            return seg, j + 1
    out = bytearray()
    depth = 1
    i += 1
    while i < len(s):
        c = s[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= len(s):
                break
            e = s[i]
            if e in _ESC:
                out += _ESC[e]
                i += 1
            elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                o = 0
                for _ in range(3):
                    if i < len(s) and 0x30 <= s[i] <= 0x37:
                        o = o * 8 + (s[i] - 0x30)
                        i += 1
                    else:
                        break
                out.append(o & 0xFF)
            elif e in (0x0A, 0x0D):  # line continuation
                i += 1
                if e == 0x0D and i < len(s) and s[i] == 0x0A:
                    i += 1
            else:  # unknown escape: spec says drop the backslash
                out.append(e)
                i += 1
        elif c == 0x28:  # nested (
            depth += 1
            out.append(c)
            i += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth == 0:
                return bytes(out), i + 1
            out.append(c)
            i += 1
        else:
            out.append(c)
            i += 1
    return bytes(out), i


def _parse_hex_string(s: bytes, i: int) -> tuple[bytes, int]:
    """s[i] == '<' (not '<<') → (decoded bytes, index past '>')."""
    j = s.find(b">", i)
    if j == -1:
        j = len(s)
    hx = bytes(c for c in s[i + 1 : j] if c not in _WS)
    if len(hx) % 2:
        hx += b"0"  # spec: odd final digit → append 0
    return bytes.fromhex(hx.decode("ascii", "replace")), j + 1


_NUM_RE = re.compile(rb"[+-]?(\d+\.?\d*|\.\d+)")
_OP_RE = re.compile(rb"[A-Za-z'\"*]+")


def _tokenize(s: bytes):
    """Content-stream token generator: ('num', f) ('str', b) ('name', s)
    ('op', s) ('arr_open'/'arr_close', None)."""
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c in _WS:
            i += 1
        elif c == 0x25:  # % comment to EOL
            j = s.find(b"\n", i)
            i = n if j == -1 else j + 1
        elif c == 0x28:  # (
            lit, i = _parse_literal_string(s, i)
            yield ("str", lit)
        elif c == 0x3C:  # < — hex string or dict
            if i + 1 < n and s[i + 1] == 0x3C:
                i += 2
                yield ("op", "<<")
            else:
                hx, i = _parse_hex_string(s, i)
                yield ("str", hx)
        elif c == 0x3E and i + 1 < n and s[i + 1] == 0x3E:
            i += 2
            yield ("op", ">>")
        elif c == 0x2F:  # /name
            j = i + 1
            while j < n and s[j] not in _WS and s[j] not in _DELIM:
                j += 1
            yield ("name", s[i + 1 : j].decode("latin-1"))
            i = j
        elif c == 0x5B:
            i += 1
            yield ("arr_open", None)
        elif c == 0x5D:
            i += 1
            yield ("arr_close", None)
        else:
            m = _NUM_RE.match(s, i)
            if m and m.start() == i:
                yield ("num", float(m.group(0)))
                i = m.end()
                continue
            m = _OP_RE.match(s, i)
            if m and m.start() == i:
                yield ("op", m.group(0).decode("latin-1"))
                i = m.end()
            else:
                i += 1  # stray delimiter ({ } etc.) — skip


def _extract_runs(stream: bytes) -> list[tuple[float, float, str]]:
    """One content stream → [(y, x, text)] runs in emission order."""
    runs: list[tuple[float, float, str]] = []
    stack: list = []  # operand stack (nums / strs / arrays)
    arrays: list[list] = []
    size = 12.0  # Tf text size
    leading = 0.0  # TL
    lx = ly = 0.0  # text line origin (line matrix e, f)
    cx = 0.0  # x advance within the current line (ordering only)
    in_text = False

    def emit(parts: list) -> None:
        nonlocal cx
        buf: list[str] = []
        for p in parts:
            if isinstance(p, (bytes, bytearray)):
                buf.append(p.decode("latin-1"))
            elif isinstance(p, float) and p <= WORD_GAP_MILLI:
                buf.append(" ")  # kerning gap wide enough to be a space
        text = "".join(buf)
        if text:
            runs.append((ly, lx + cx, text))
            # naive advance: enough to keep same-line runs ordered by
            # emission position (never enters the extracted text)
            cx += sum(len(p) for p in parts if isinstance(p, (bytes, bytearray))) * size * 0.5

    for kind, val in _tokenize(stream):
        if kind == "arr_open":
            arrays.append([])
        elif kind == "arr_close":
            arr = arrays.pop() if arrays else []
            (arrays[-1] if arrays else stack).append(arr)
        elif kind in ("num", "str", "name"):
            (arrays[-1] if arrays else stack).append(val)
        elif kind == "op":
            op = val
            if op == "BT":
                in_text = True
                lx = ly = cx = 0.0
            elif op == "ET":
                in_text = False
            elif op == "Tf" and len(stack) >= 1:
                size = float(stack[-1]) if isinstance(stack[-1], float) else size
            elif op == "TL" and stack:
                leading = float(stack[-1])
            elif op == "Td" and len(stack) >= 2:
                lx += float(stack[-2]); ly += float(stack[-1]); cx = 0.0
            elif op == "TD" and len(stack) >= 2:
                leading = -float(stack[-1])
                lx += float(stack[-2]); ly += float(stack[-1]); cx = 0.0
            elif op == "Tm" and len(stack) >= 6:
                lx, ly = float(stack[-2]), float(stack[-1]); cx = 0.0
            elif op == "T*":
                ly -= leading; cx = 0.0
            elif op == "Tj" and in_text and stack and isinstance(stack[-1], (bytes, bytearray)):
                emit([stack[-1]])
            elif op == "'" and in_text and stack and isinstance(stack[-1], (bytes, bytearray)):
                ly -= leading; cx = 0.0
                emit([stack[-1]])
            elif op == '"' and in_text and stack and isinstance(stack[-1], (bytes, bytearray)):
                ly -= leading; cx = 0.0
                emit([stack[-1]])
            elif op == "TJ" and in_text and stack and isinstance(stack[-1], list):
                emit(stack[-1])
            stack.clear()
    return runs


def extract_pdf_text(data: bytes) -> str:
    """PDF bytes → layout-ordered text: lines top→bottom (y desc), runs
    within a line left→right (x asc, emission-stable), runs concatenated
    (writers carry inter-run spaces in the strings / TJ gaps), lines
    joined by '\\n', pages joined by '\\n'. Raises on non-PDF bytes."""
    if not data.startswith(b"%PDF-"):
        raise ValueError("not a PDF")
    page_lines: list[str] = []
    for stream in _page_content_streams(data):
        runs = _extract_runs(stream)
        # group on exact y (fixtures position lines exactly; ordering —
        # never arithmetic — is the only use of coordinates)
        lines: dict[float, list[tuple[float, int, str]]] = {}
        for seq, (y, x, text) in enumerate(runs):
            lines.setdefault(y, []).append((x, seq, text))
        for y in sorted(lines, reverse=True):
            parts = [t for _x, _seq, t in sorted(lines[y], key=lambda r: (r[0], r[1]))]
            page_lines.append("".join(parts))
    return "\n".join(page_lines).strip("\n")


# ------------------------------------------------------------------ writer


def _esc_literal(s: str) -> bytes:
    b = s.encode("latin-1", "replace")
    return b.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")


def _content_stream(lines: list[str], variant: str, start_line: int = 0) -> bytes:
    """Render lines top-down starting at (72, 720 − start_line·14), 14pt
    leading, operator mix `variant` ∈ {td, tstar, tm, tj_kerned, quote}.
    `start_line` lets a page's /Contents array continue where the
    previous stream stopped."""
    out = [b"BT", b"/F1 12 Tf"]
    y0, lead = 720 - start_line * 14, 14
    if variant == "tstar":
        out.append(b"14 TL")
        out.append(b"72 %d Td" % y0)
        for i, ln in enumerate(lines):
            if i:
                out.append(b"T*")
            out.append(b"(" + _esc_literal(ln) + b") Tj")
    elif variant == "quote":
        out.append(b"14 TL")
        out.append(b"72 %d Td" % (y0 + lead))  # ' moves down BEFORE showing
        for ln in lines:
            out.append(b"(" + _esc_literal(ln) + b") '")
    elif variant == "tm":
        for i, ln in enumerate(lines):
            out.append(b"1 0 0 1 72 %d Tm" % (y0 - i * lead))
            out.append(b"(" + _esc_literal(ln) + b") Tj")
    elif variant == "tj_kerned":
        # words as separate TJ chunks, word gaps as kerning adjustments
        out.append(b"72 %d Td" % y0)
        for i, ln in enumerate(lines):
            if i:
                out.append(b"0 -%d Td" % lead)
            chunks = []
            for j, wrd in enumerate(ln.split(" ")):
                if j:
                    chunks.append(b"-250")
                half = max(len(wrd) // 2, 1)
                if len(wrd) > 2:  # intra-word kern: must NOT become a space
                    chunks.append(b"(" + _esc_literal(wrd[:half]) + b") -20 ("
                                  + _esc_literal(wrd[half:]) + b")")
                else:
                    chunks.append(b"(" + _esc_literal(wrd) + b")")
            out.append(b"[" + b" ".join(chunks) + b"] TJ")
    else:  # 'td'
        out.append(b"72 %d Td" % y0)
        for i, ln in enumerate(lines):
            if i:
                out.append(b"0 -%d TD" % lead)
            out.append(b"(" + _esc_literal(ln) + b") Tj")
    out.append(b"ET")
    return b"\n".join(out)


def encode_pdf(
    pages: list[list[str]],
    *,
    compress: bool = True,
    variant: str = "td",
    split_content: bool = False,
) -> bytes:
    """Minimal valid PDF: catalog → pages → page(s) → content stream(s)
    (+ a Type1 font stub). `split_content` puts each page's lines into
    TWO content streams referenced as /Contents [a b] (readers must
    handle the array form)."""
    objs: list[bytes] = []  # 1-indexed bodies, object N = index N-1

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    font_n = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    page_nums: list[int] = []
    content_of_page: list[list[int]] = []
    for lines in pages:
        if split_content and len(lines) > 1:
            mid = len(lines) // 2
            groups = [lines[:mid], lines[mid:]]
        else:
            groups = [lines]
        crefs = []
        offset = 0
        for g in groups:
            raw = _content_stream(g, variant, start_line=offset)
            offset += len(g)
            body = zlib.compress(raw, 6) if compress else raw
            filt = b" /Filter /FlateDecode" if compress else b""
            crefs.append(
                add(b"<< /Length %d%s >>\nstream\n" % (len(body), filt)
                    + body + b"\nendstream")
            )
        content_of_page.append(crefs)
        page_nums.append(0)  # placeholder, filled after pages obj exists

    pages_n = add(b"PLACEHOLDER-PAGES")
    for i, crefs in enumerate(content_of_page):
        if len(crefs) == 1:
            contents = b"%d 0 R" % crefs[0]
        else:
            contents = b"[" + b" ".join(b"%d 0 R" % c for c in crefs) + b"]"
        page_nums[i] = add(
            b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 %d 0 R >> >> /Contents %s >>"
            % (pages_n, font_n, contents)
        )
    kids = b" ".join(b"%d 0 R" % p for p in page_nums)
    objs[pages_n - 1] = (
        b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, len(page_nums))
    )
    catalog_n = add(b"<< /Type /Catalog /Pages %d 0 R >>" % pages_n)

    buf = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0] * (len(objs) + 1)
    for n, body in enumerate(objs, start=1):
        offsets[n] = len(buf)
        buf += b"%d 0 obj\n" % n + body + b"\nendobj\n"
    xref_at = len(buf)
    buf += b"xref\n0 %d\n" % (len(objs) + 1)
    buf += b"0000000000 65535 f \n"
    for n in range(1, len(objs) + 1):
        buf += b"%010d 00000 n \n" % offsets[n]
    buf += (
        b"trailer\n<< /Size %d /Root %d 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, catalog_n, xref_at)
    )
    return bytes(buf)
