"""Byte-stream PDF tokenization — the north star's "xref/object parsing,
content-stream decompression" stage, pure stdlib (zlib) + the PDF 1.4 spec.

Two halves, both from scratch (reference repo delegates this layer to
PyMuPDF/pdf_oxide — ``/root/reference/pymupdf_parser.py:56-57`` reads the
finished text layer; here the byte-level work itself is rebuilt):

* ``build_pdf(spans)`` — deterministic writer: real object graph
  (catalog → pages → page + FlateDecode content stream + font + image
  XObjects), literal-string escaping, a correct 20-byte-entry xref table
  and trailer.  One PDF per document, text spans as ``Tj``/``TJ``/``Tm``
  operators on descending baselines, media spans as ``/Im{i} Do``
  invocations positioned with ``cm`` — the exact latent structure SURVEY
  §1.2 documents for the reference's source PDFs.
* ``tokenize_pdf_bytes(data)`` — parser: ``startxref`` → xref table →
  object offsets; recursive object parser (dicts, arrays, names, strings
  with escape/octal decode, indirect refs, streams with direct or
  indirect ``/Length``); page tree walk in ``/Kids`` order; per-page
  content-stream ``zlib.decompress`` when ``/Filter /FlateDecode``;
  operator interpreter tracking ``Td``/``TD``/``Tm`` text positioning and
  ``q``/``cm``/``Q`` for XObject placement; spans sorted into reading
  order (page, y descending, x ascending) — the O4 latent sort — and
  emitted as (kind, text, media_ref, offset) rows matching
  ``model.SPAN_TYPE``.

The writer/parser pair is differentially pinned against the span-table
fixtures: ``tokenize_pdf_bytes(build_pdf(make_document(i)["spans"]))``
must reproduce the span sequence EXACTLY (kind, text, media_ref, order)
— the north rule's per-row invariant, proven at the byte level.
"""

from __future__ import annotations

import re
import zlib
from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa

from ..stages.layout import MIN_COLUMN_GAP, reading_order_flat

PAGE_HEIGHT = 792
PAGE_TOP_Y = 750
LINE_DY = 15
MIN_Y = 50
TEXT_X = 72
MEDIA_X = 60

# ---------------------------------------------------------------------------
# Writer
# ---------------------------------------------------------------------------


def _esc(s: str) -> bytes:
    """PDF literal-string escaping: backslash, parens (spec 3.2.3), plus
    CR (an unescaped 0x0D inside a literal is read back as LF per the
    spec's EOL normalization — escape it to survive round trip).  Text
    bytes are UTF-8 (the Identity-encoding convention; the tokenizer
    decodes UTF-8 with a latin-1 fallback for octal-escape byte salads)."""
    out = (
        s.replace("\\", "\\\\")
        .replace("(", "\\(")
        .replace(")", "\\)")
        .replace("\r", "\\r")
    )
    return out.encode("utf-8")


IMG_SIZE = 8


def image_pixels(ref: str) -> "np.ndarray":
    """The deterministic pixel pattern embedded for a media ref — same ref
    ⇒ same asset bytes in every document (the shared-asset premise behind
    ``media_ref_fanout``'s dedupe-before-decode plan)."""
    from ..stages.media import _seed_bytes

    return _seed_bytes(f"pdfimg:{ref}", IMG_SIZE * IMG_SIZE).reshape(
        IMG_SIZE, IMG_SIZE
    )


def _image_xobject_stream(ref: str) -> bytes:
    """Image XObject payload: PNG-predictor-filtered scanlines (PDF spec
    /Predictor 15 = per-row adaptive; rows cycle through all five filter
    types) then FlateDecode — real decode work for the asset extractor,
    sharing the scanline codecs with ``stages/media.py``."""
    from ..stages.media import _png_filter_row

    px = image_pixels(ref)
    prior = np.zeros(IMG_SIZE, dtype=np.uint8)
    out = bytearray()
    for r in range(IMG_SIZE):
        ftype = r % 5
        out.append(ftype)
        out += _png_filter_row(px[r], prior, 1, ftype).tobytes()
        prior = px[r]
    return zlib.compress(bytes(out))


def _png_up_encode(rows: List[bytes]) -> bytes:
    """PNG Up-predictor encode (filter type 2) — the encoding PDF 1.5
    cross-reference streams conventionally use (/Predictor 12)."""
    out = bytearray()
    prev = bytes(len(rows[0])) if rows else b""
    for row in rows:
        out.append(2)
        out += bytes((row[i] - prev[i]) & 0xFF for i in range(len(row)))
        prev = row
    return bytes(out)


def _png_undo(data: bytes, columns: int) -> bytes:
    """Undo PNG row predictors (None/Sub/Up) over ``columns``-byte rows."""
    row_len = columns + 1
    out = bytearray()
    prev = bytearray(columns)
    for r in range(0, len(data), row_len):
        ft = data[r]
        row = bytearray(data[r + 1 : r + row_len])
        if ft == 2:  # Up
            for i in range(columns):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 1:  # Sub
            for i in range(1, columns):
                row[i] = (row[i] + row[i - 1]) & 0xFF
        elif ft != 0:
            raise ValueError(f"unsupported PNG filter {ft}")
        out += row
        prev = row
    return bytes(out)


def build_pdf(
    spans: List[Dict[str, object]],
    compress: bool = True,
    pdf15: bool = False,
    two_column: bool = False,
) -> bytes:
    """Serialize a span sequence as one real PDF file.

    Spans must be in offset order.  Each span gets its own descending
    baseline so the reading-order sort reproduces the input order; pages
    break when the baseline runs out.  Operator variety is deterministic
    by in-page index: every 5th text span positions with ``Tm`` instead of
    ``Td``, every 7th splits its string across a kerned ``TJ`` array.

    ``pdf15=True`` emits PDF 1.5 structure instead of the classic tail:
    all non-stream objects packed into ONE object stream (/Type /ObjStm)
    and a cross-reference STREAM (/Type /XRef, /W [1 4 2], FlateDecode +
    PNG Up predictor) replacing the xref table + trailer.

    ``two_column=True`` typesets each page in TWO columns (left column
    fills top-down first, then the right column — newspaper order): a
    naive y-then-x sort of such a page interleaves the columns, so only
    column-aware reading order (``stages/layout.py``) recovers the span
    sequence.
    """
    pages: List[List[Dict[str, object]]] = [[]]
    y = PAGE_TOP_Y
    col = 0
    for sp in spans:
        if y < MIN_Y:
            if two_column and col == 0:
                col = 1
            else:
                pages.append([])
                col = 0
            y = PAGE_TOP_Y
        pages[-1].append({**sp, "y": y, "x": TEXT_X + 278 * col})
        y -= LINE_DY

    media_refs: List[str] = []
    for sp in spans:
        if sp["kind"] == "media" and sp["media_ref"] not in media_refs:
            media_refs.append(str(sp["media_ref"]))

    # object numbering: 1 catalog, 2 pages, 3 font, 4.. images, then per
    # page (page obj, content obj)
    font_num = 3
    img_nums = {ref: 4 + i for i, ref in enumerate(media_refs)}
    first_page_num = 4 + len(media_refs)
    page_nums = [first_page_num + 2 * i for i in range(len(pages))]

    objs: Dict[int, bytes] = {}
    kids = b" ".join(b"%d 0 R" % n for n in page_nums)
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = b"<< /Type /Pages /Kids [ %s ] /Count %d >>" % (kids, len(pages))
    objs[font_num] = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
    for ref, num in img_nums.items():
        data = _image_xobject_stream(ref)
        head = (
            b"<< /Type /XObject /Subtype /Image /Width %d /Height %d "
            b"/ColorSpace /DeviceGray /BitsPerComponent 8 "
            b"/Filter /FlateDecode /DecodeParms << /Predictor 15 "
            b"/Colors 1 /BitsPerComponent 8 /Columns %d >> /Length %d >>"
            % (IMG_SIZE, IMG_SIZE, IMG_SIZE, len(data))
        )
        objs[num] = head + b"\nstream\n" + data + b"\nendstream"

    xobj_entries = b" ".join(
        b"/%s %d 0 R" % (ref.encode(), num) for ref, num in img_nums.items()
    )
    resources = (
        b"<< /Font << /F1 %d 0 R >> /XObject << %s >> >>"
        % (font_num, xobj_entries)
        if media_refs
        else b"<< /Font << /F1 %d 0 R >> >>" % font_num
    )

    for pi, page in enumerate(pages):
        ops: List[bytes] = []
        for si, sp in enumerate(page):
            yy, xx = sp["y"], sp["x"]
            if sp["kind"] == "media":
                ops.append(
                    b"q 20 0 0 20 %d %d cm /%s Do Q"
                    % (xx - 12, yy, str(sp["media_ref"]).encode())
                )
                continue
            text = str(sp["text"])
            if si % 7 == 3 and len(text) > 2:
                cut = len(text) // 2
                body = b"[ (%s) -250 (%s) ] TJ" % (
                    _esc(text[:cut]),
                    _esc(text[cut:]),
                )
            else:
                body = b"(%s) Tj" % _esc(text)
            if si % 5 == 2:
                pos = b"1 0 0 1 %d %d Tm" % (xx, yy)
            else:
                pos = b"%d %d Td" % (xx, yy)
            ops.append(b"BT /F1 10 Tf %s %s ET" % (pos, body))
        content = b"\n".join(ops)
        if compress:
            data = zlib.compress(content)
            stream_dict = b"<< /Length %d /Filter /FlateDecode >>" % len(data)
        else:
            data = content
            stream_dict = b"<< /Length %d >>" % len(data)
        page_num = page_nums[pi]
        objs[page_num] = (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 612 %d ] "
            b"/Resources %s /Contents %d 0 R >>"
            % (PAGE_HEIGHT, resources, page_num + 1)
        )
        objs[page_num + 1] = stream_dict + b"\nstream\n" + data + b"\nendstream"

    if not pdf15:
        out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
        offsets: Dict[int, int] = {}
        for num in sorted(objs):
            offsets[num] = len(out)
            out += b"%d 0 obj\n" % num + objs[num] + b"\nendobj\n"
        xref_pos = len(out)
        n_objs = max(objs) + 1
        out += b"xref\n0 %d\n" % n_objs
        out += b"0000000000 65535 f \n"
        for num in range(1, n_objs):
            out += b"%010d %05d n \n" % (offsets[num], 0)
        out += (
            b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (n_objs, xref_pos)
        )
        return bytes(out)

    # --- PDF 1.5 tail: object stream + cross-reference stream ---
    stream_nums = set(img_nums.values()) | {pn + 1 for pn in page_nums}
    packed = [n for n in sorted(objs) if n not in stream_nums]
    objstm_num = max(objs) + 1
    xref_num = objstm_num + 1

    body = bytearray()
    header_parts = []
    for num in packed:
        header_parts.append(b"%d %d" % (num, len(body)))
        body += objs[num] + b" "
    header = b" ".join(header_parts) + b"\n"
    objstm_plain = bytes(header) + bytes(body)
    objstm_data = zlib.compress(objstm_plain)
    objs[objstm_num] = (
        b"<< /Type /ObjStm /N %d /First %d /Length %d /Filter /FlateDecode >>"
        b"\nstream\n%s\nendstream"
        % (len(packed), len(header), len(objstm_data), objstm_data)
    )

    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    for num in sorted(n for n in objs if n not in packed):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + objs[num] + b"\nendobj\n"
    xref_pos = len(out)

    size = xref_num + 1
    rows: List[bytes] = []
    packed_index = {num: i for i, num in enumerate(packed)}
    for num in range(size):
        if num == 0:
            t, f2, f3 = 0, 0, 65535
        elif num in packed_index:
            t, f2, f3 = 2, objstm_num, packed_index[num]
        elif num == xref_num:
            t, f2, f3 = 1, xref_pos, 0
        else:
            t, f2, f3 = 1, offsets[num], 0
        rows.append(bytes([t]) + f2.to_bytes(4, "big") + f3.to_bytes(2, "big"))
    xref_data = zlib.compress(_png_up_encode(rows))
    out += (
        b"%d 0 obj\n<< /Type /XRef /Size %d /Root 1 0 R /W [ 1 4 2 ] "
        b"/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 7 >> "
        b"/Length %d >>\nstream\n%s\nendstream\nendobj\n"
        % (xref_num, size, len(xref_data), xref_data)
    )
    out += b"startxref\n%d\n%%%%EOF\n" % xref_pos
    return bytes(out)


# ---------------------------------------------------------------------------
# Parser — lexer for PDF object syntax
# ---------------------------------------------------------------------------

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"

# one-regex-per-token lexer fast path: leading whitespace/comments then one
# alternative; per-token scanning runs in C instead of a per-char Python
# loop (the profiled hot spot — next_token was 80% of tokenize time)
_TOK_RE = re.compile(
    rb"(?:[\x00\t\n\x0c\r ]+|%[^\r\n]*)*"
    rb"(?:(?P<name>/[^\x00\t\n\x0c\r ()<>\[\]{}/%]*)"
    rb"|(?P<dopen><<)|(?P<dclose>>>)"
    rb"|(?P<hex><[0-9A-Fa-f\x00\t\n\x0c\r ]*>)"
    rb"|(?P<aopen>\[)|(?P<aclose>\])"
    rb"|(?P<num>[+-]?(?:\d+\.\d*|\.\d+|\d+))"
    rb"|(?P<lstr>\((?:[^()\\]|\\.)*\))"
    rb"|(?P<kw>[^\x00\t\n\x0c\r ()<>\[\]{}/%]+))"
)
_ESC_PAIR_RE = re.compile(rb"\\.", re.S)
_ESC_RE = re.compile(rb"\\([0-7]{1,3}|\r\n?|\n|.)", re.S)
_ESC_MAP = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\x08", b"f": b"\x0c"}


def _decode_text(raw: bytes) -> str:
    """String-byte decode: UTF-8 (the writer's convention) with latin-1
    fallback for arbitrary octal-escape byte sequences."""
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        return raw.decode("latin-1")


def _unescape(inner: bytes) -> str:
    if b"\\" not in inner:  # no escapes (the common case): C scan, no regex
        return _decode_text(inner)

    def sub(m: "re.Match[bytes]") -> bytes:
        g = m.group(1)
        if g[:1] in b"01234567":
            return bytes([int(g, 8) & 0xFF])
        if g in (b"\n", b"\r", b"\r\n"):
            return b""  # line continuation
        return _ESC_MAP.get(g, g)

    return _decode_text(_ESC_RE.sub(sub, inner))


class _Lexer:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def _skip_ws(self):
        d, n = self.data, len(self.data)
        while self.pos < n:
            c = d[self.pos]
            if c in _WS:
                self.pos += 1
            elif c == 0x25:  # '%' comment to EOL
                while self.pos < n and d[self.pos] not in b"\r\n":
                    self.pos += 1
            else:
                return

    def next_token(self) -> Tuple[str, object]:
        """Returns (kind, value): kind ∈ num, name, str, dict_open,
        dict_close, arr_open, arr_close, kw."""
        m = _TOK_RE.match(self.data, self.pos)
        if m is None or m.lastgroup is None:
            self._skip_ws()
            if self.pos >= len(self.data):
                return ("eof", None)
            if self.data[self.pos] == 0x28:  # nested '(' the regex rejected
                return ("str", self._lit_string())
            return self._next_token_slow()
        g = m.lastgroup
        # dispatch ordered by measured object-layer frequency: num 44%,
        # name 38%, dict delimiters 12%, kw 4% (strings are content-layer)
        if g == "num":
            self.pos = m.end()
            tok = m.group("num")
            return ("num", float(tok) if b"." in tok else int(tok))
        if g == "name":
            self.pos = m.end()
            return ("name", m.group("name")[1:].decode("latin-1"))
        if g == "lstr":
            inner = m.group("lstr")[1:-1]
            # a '(' surviving escape-pair removal means the string nests
            # unescaped parens and the regex closed it early — slow path
            if b"(" in _ESC_PAIR_RE.sub(b"", inner):
                self.pos = m.start("lstr")
                return ("str", self._lit_string())
            self.pos = m.end()
            return ("str", _unescape(inner))
        self.pos = m.end()
        if g == "kw":
            return ("kw", m.group("kw").decode("latin-1"))
        if g == "dopen":
            return ("dict_open", None)
        if g == "dclose":
            return ("dict_close", None)
        if g == "aopen":
            return ("arr_open", None)
        if g == "aclose":
            return ("arr_close", None)
        # hex string
        hx = re.sub(rb"[^0-9A-Fa-f]", b"", m.group("hex")[1:-1])
        if len(hx) % 2:
            hx += b"0"
        return ("str", bytes.fromhex(hx.decode()).decode("latin-1"))

    def _next_token_slow(self) -> Tuple[str, object]:
        """Original per-char tokenizer — fallback for inputs the fast
        regex declines (kept for spec corners; behavior-identical)."""
        self._skip_ws()
        d = self.data
        if self.pos >= len(d):
            return ("eof", None)
        c = d[self.pos]
        if c == 0x2F:  # /Name
            self.pos += 1
            start = self.pos
            while self.pos < len(d) and d[self.pos] not in _WS + _DELIM:
                self.pos += 1
            return ("name", d[start : self.pos].decode("latin-1"))
        if d.startswith(b"<<", self.pos):
            self.pos += 2
            return ("dict_open", None)
        if d.startswith(b">>", self.pos):
            self.pos += 2
            return ("dict_close", None)
        if c == 0x5B:
            self.pos += 1
            return ("arr_open", None)
        if c == 0x5D:
            self.pos += 1
            return ("arr_close", None)
        if c == 0x28:  # ( literal string
            return ("str", self._lit_string())
        if c == 0x3C:  # < hex string
            end = d.index(b">", self.pos)
            hx = re.sub(rb"[^0-9A-Fa-f]", b"", d[self.pos + 1 : end])
            if len(hx) % 2:
                hx += b"0"
            self.pos = end + 1
            return ("str", bytes.fromhex(hx.decode()).decode("latin-1"))
        if c in b"+-.0123456789":
            start = self.pos
            self.pos += 1
            while self.pos < len(d) and d[self.pos] in b"+-.0123456789":
                self.pos += 1
            tok = d[start : self.pos]
            return ("num", float(tok) if b"." in tok else int(tok))
        # keyword (obj, endobj, stream, R, true, false, null, operators)
        start = self.pos
        while self.pos < len(d) and d[self.pos] not in _WS + _DELIM:
            self.pos += 1
        return ("kw", d[start : self.pos].decode("latin-1"))

    def _lit_string(self) -> str:
        """Literal string with escape + octal decode (spec 3.2.3)."""
        d = self.data
        assert d[self.pos] == 0x28
        self.pos += 1
        depth = 1
        out = bytearray()
        while self.pos < len(d):
            c = d[self.pos]
            if c == 0x5C:  # backslash
                self.pos += 1
                e = d[self.pos]
                if e in b"01234567":
                    oct_digits = bytearray()
                    while len(oct_digits) < 3 and d[self.pos] in b"01234567":
                        oct_digits.append(d[self.pos])
                        self.pos += 1
                    out.append(int(oct_digits.decode(), 8) & 0xFF)
                    continue
                mapped = {
                    0x6E: 0x0A, 0x72: 0x0D, 0x74: 0x09,
                    0x62: 0x08, 0x66: 0x0C,
                }.get(e)
                if mapped is not None:
                    out.append(mapped)
                elif e in b"\r\n":  # line continuation
                    if e == 0x0D and d[self.pos + 1 : self.pos + 2] == b"\n":
                        self.pos += 1
                else:
                    out.append(e)
                self.pos += 1
                continue
            if c == 0x28:
                depth += 1
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    self.pos += 1
                    return _decode_text(bytes(out))
            out.append(c)
            self.pos += 1
        raise ValueError("unterminated literal string")


class _Ref:
    __slots__ = ("num",)

    def __init__(self, num: int):
        self.num = num


# "g R" indirect-reference suffix after a number token: one C-regex probe
# replaces two speculative next_token calls + rewinds (the miss case — a
# plain numeric dict value — fails the match in a few bytes).  The
# generation accepts the same numeric shapes as the num token so the
# lookahead decision is bit-identical to the token-path one.
_REF_SUFFIX_RE = re.compile(
    rb"(?:[\x00\t\n\x0c\r ]+|%[^\r\n]*)*[+-]?(?:\d+\.\d*|\.\d+|\d+)"
    rb"(?:[\x00\t\n\x0c\r ]+|%[^\r\n]*)*R(?![^\x00\t\n\x0c\r ()<>\[\]{}/%])"
)


def _parse_value(lx: _Lexer, first: Optional[Tuple[str, object]] = None):
    kind, val = first if first is not None else lx.next_token()
    if kind == "num":
        m = _REF_SUFFIX_RE.match(lx.data, lx.pos)
        if m is not None:
            lx.pos = m.end()
            return _Ref(int(val))
        return val
    if kind in ("name", "str"):
        return (kind, val) if kind == "name" else val
    if kind == "dict_open":
        d = {}
        while True:
            k, v = lx.next_token()
            if k == "dict_close":
                return d
            if k != "name":
                raise ValueError(f"bad dict key token {k} {v!r}")
            d[v] = _parse_value(lx)
    if kind == "arr_open":
        arr = []
        while True:
            k, v = lx.next_token()
            if k == "arr_close":
                return arr
            arr.append(_parse_value(lx, (k, v)))
    if kind == "kw" and val in ("true", "false", "null"):
        return {"true": True, "false": False, "null": None}[val]
    raise ValueError(f"unexpected token {kind} {val!r}")


# ---------------------------------------------------------------------------
# Parser — document structure
# ---------------------------------------------------------------------------


class PdfDocument:
    """Minimal spec-faithful reader for the subset a text/media tokenizer
    needs: single xref section (with /Prev chains), uncompressed or
    FlateDecode streams, direct or indirect /Length."""

    def __init__(self, data: bytes):
        self.data = data
        self.offsets: Dict[int, int] = {}
        self.compressed: Dict[int, Tuple[int, int]] = {}  # num → (objstm, idx)
        self.trailer: Dict[str, object] = {}
        self._cache: Dict[int, object] = {}
        self._load_xref()

    def _load_xref(self):
        # the LAST startxref wins: an incrementally-updated file carries one
        # per revision and several can fall inside the search window
        tail = self.data[-2048:]
        idx = tail.rfind(b"startxref")
        if idx < 0:
            raise ValueError("startxref not found")
        m = re.match(rb"startxref\s+(\d+)\s*%%EOF", tail[idx:])
        if not m:
            raise ValueError("malformed startxref tail")
        pos = int(m.group(1))
        while pos is not None:
            pos = self._read_xref_section(pos)

    def _read_xref_section(self, pos: int) -> Optional[int]:
        d = self.data
        if not d.startswith(b"xref", pos):
            return self._read_xref_stream(pos)  # PDF 1.5 cross-reference stream
        lx = _Lexer(d, pos + 4)
        while True:
            save = lx.pos
            k, v = lx.next_token()
            if k == "kw" and v == "trailer":
                trailer = _parse_value(lx)
                for key, val in trailer.items():
                    self.trailer.setdefault(key, val)
                prev = trailer.get("Prev")
                return int(prev) if prev is not None else None
            if k != "num":
                raise ValueError(f"bad xref subsection header at {save}")
            k2, count = lx.next_token()
            first = int(v)
            lx._skip_ws()
            # fixed 20-byte entries
            for i in range(int(count)):
                entry = d[lx.pos : lx.pos + 20]
                off, gen, typ = entry[:10], entry[11:16], entry[17:18]
                if typ == b"n":
                    self.offsets.setdefault(first + i, int(off))
                lx.pos += 20

    def _read_xref_stream(self, pos: int) -> Optional[int]:
        """PDF 1.5 cross-reference stream: /Type /XRef object whose stream
        holds /W-packed big-endian entry triples, usually FlateDecode +
        PNG-predictor encoded; trailer keys live in the stream dict."""
        lx = _Lexer(self.data, pos)
        k, v = lx.next_token()
        if k != "num":
            raise ValueError(f"no xref table or stream at offset {pos}")
        lx.next_token()  # generation
        k, kw = lx.next_token()
        assert k == "kw" and kw == "obj", (k, kw)
        sdict = _parse_value(lx)
        k, kw = lx.next_token()
        assert k == "kw" and kw == "stream", "xref stream object has no stream"
        p = lx.pos
        if self.data[p : p + 2] == b"\r\n":
            p += 2
        elif self.data[p : p + 1] == b"\n":
            p += 1
        length = sdict.get("Length")
        if isinstance(length, _Ref):
            raise ValueError("indirect /Length in xref stream unsupported")
        raw = self.data[p : p + int(length)]
        if sdict.get("Filter") == ("name", "FlateDecode"):
            raw = zlib.decompress(raw)
        parms = sdict.get("DecodeParms")
        if isinstance(parms, dict) and int(parms.get("Predictor", 1)) >= 10:
            raw = _png_undo(raw, int(parms["Columns"]))
        w = [int(x) for x in sdict["W"]]
        entry_len = sum(w)
        size = int(sdict["Size"])
        index = sdict.get("Index") or [0, size]
        ep = 0
        for ri in range(0, len(index), 2):
            first, count = int(index[ri]), int(index[ri + 1])
            for i in range(count):
                fields = []
                for wi in w:
                    fields.append(
                        int.from_bytes(raw[ep : ep + wi], "big") if wi else None
                    )
                    ep += wi
                typ = fields[0] if w[0] else 1  # w[0]=0 → type defaults to 1
                num = first + i
                if typ == 1 and num not in self.offsets:
                    self.offsets.setdefault(num, fields[1])
                elif typ == 2 and num not in self.compressed:
                    self.compressed[num] = (fields[1], fields[2])
        for key in ("Root", "Size", "Info"):
            if key in sdict:
                self.trailer.setdefault(key, sdict[key])
        prev = sdict.get("Prev")
        return int(prev) if prev is not None else None

    def _obj_from_stream(self, num: int):
        """Resolve a type-2 (compressed) object out of its /Type /ObjStm
        container: inflate, read the N (num, offset) header pairs, parse
        the object at /First + offset."""
        objstm_num, idx = self.compressed[num]
        container = self.obj(objstm_num)
        sdict = container[1]
        data = self.stream_data(container)
        n = int(self.resolve(sdict["N"]))
        first = int(self.resolve(sdict["First"]))
        hdr = _Lexer(data, 0)
        pairs = []
        for _ in range(n):
            _, onum = hdr.next_token()
            _, ooff = hdr.next_token()
            pairs.append((int(onum), int(ooff)))
        onum, ooff = pairs[idx]
        assert onum == num, f"ObjStm header pair mismatch: {onum} != {num}"
        return _parse_value(_Lexer(data, first + ooff))

    def obj(self, num: int):
        if num in self._cache:
            return self._cache[num]
        if num not in self.offsets and num in self.compressed:
            value = self._obj_from_stream(num)
            self._cache[num] = value
            return value
        pos = self.offsets[num]
        lx = _Lexer(self.data, pos)
        k, v = lx.next_token()
        assert k == "num" and int(v) == num, f"object {num} not at {pos}"
        lx.next_token()  # generation
        k, v = lx.next_token()
        assert k == "kw" and v == "obj"
        value = _parse_value(lx)
        # stream?
        save = lx.pos
        k, v = lx.next_token()
        if k == "kw" and v == "stream":
            # EOL after 'stream' keyword: CRLF or LF
            p = lx.pos
            if self.data[p : p + 2] == b"\r\n":
                p += 2
            elif self.data[p : p + 1] == b"\n":
                p += 1
            length = self.resolve(value.get("Length"))
            raw = self.data[p : p + int(length)]
            value = ("stream", value, raw)
        else:
            lx.pos = save
        self._cache[num] = value
        return value

    def resolve(self, v):
        while isinstance(v, _Ref):
            v = self.obj(v.num)
        return v

    def stream_data(self, obj) -> bytes:
        assert isinstance(obj, tuple) and obj[0] == "stream"
        _, sdict, raw = obj
        filt = self.resolve(sdict.get("Filter"))
        if filt is None:
            return raw
        if filt == ("name", "FlateDecode"):
            return zlib.decompress(raw)
        raise ValueError(f"unsupported filter {filt!r}")

    def pages(self) -> List[Dict[str, object]]:
        root = self.resolve(self.trailer["Root"])
        out: List[Dict[str, object]] = []

        def walk(node):
            node = self.resolve(node)
            ntype = node.get("Type")
            if ntype == ("name", "Pages"):
                for kid in self.resolve(node["Kids"]):
                    walk(kid)
            else:
                out.append(node)

        walk(root["Pages"])
        return out


# ---------------------------------------------------------------------------
# Content-stream interpreter
# ---------------------------------------------------------------------------


# One whole-statement match per C-regex step.  PDF producers emit content
# as self-contained single-statement lines (``BT … Tf x y Td (s) Tj ET``,
# ``1 0 0 1 x y Tm`` absolute positioning, two-string kerned TJ arrays,
# ``q sx 0 0 sy x y cm /Im Do Q`` image placements) — because every
# statement opens with BT (resetting the text matrix) or q…Q (balancing the
# CTM), no operator state survives between statements and each match maps
# directly to one span.  The statement shapes below cover that idiom; any
# stream byte NOT tiled by these shapes (cumulative Td runs inside one BT
# block, general Tm matrices, nested unescaped parens, hex strings, …)
# falls back to the per-token interpreter, which is behavior-identical
# (equivalence fuzz-pinned in tests/test_pdfbytes.py).
_FP_N = rb"-?\d+(?:\.\d+)?"
_FP_STR = rb"(?:[^()\\]|\\.)*"
_FAST_STMT_RE = re.compile(
    rb"BT /\w+ " + _FP_N + rb" Tf "
    rb"(?:(?P<tdx>" + _FP_N + rb") (?P<tdy>" + _FP_N + rb") Td"
    rb"|1 0 0 1 (?P<tmx>" + _FP_N + rb") (?P<tmy>" + _FP_N + rb") Tm) "
    rb"(?:\((?P<tj>" + _FP_STR + rb")\) Tj"
    rb"|\[ (?P<tja>(?:\(" + _FP_STR + rb"\)|" + _FP_N + rb"| )+) \] TJ) ET"
    rb"|q (?P<isx>" + _FP_N + rb") 0 0 (?P<isy>" + _FP_N + rb") "
    rb"(?P<icx>" + _FP_N + rb") (?P<icy>" + _FP_N + rb") cm "
    rb"/(?P<img>\w+) Do Q"
)
_FP_ARR_STR_RE = re.compile(rb"\((" + _FP_STR + rb")\)")


def _interpret_content(content: bytes) -> List[Tuple[float, float, str, str]]:
    """Statement-level fast path over the content stream.

    Walks ``_FAST_STMT_RE`` matches and checks they TILE the stream (only
    whitespace between consecutive matches) — any non-whitespace gap means
    an operator outside the self-contained statement shapes could carry
    state across statements, so the whole stream re-runs through the
    general per-token interpreter.  ~6× fewer Python-loop iterations than
    token dispatch on conforming streams (one per statement vs one per
    token)."""
    spans: List[Tuple[float, float, str, str]] = []
    pos = 0
    for m in _FAST_STMT_RE.finditer(content):
        if content[pos:m.start()].strip():
            return _interpret_content_tokens(content)
        pos = m.end()
        g = m.group
        if m.lastgroup == "img":
            spans.append(
                (float(g("icy")), float(g("icx")), "media",
                 g("img").decode("latin-1"))
            )
            continue
        tx = g("tdx") or g("tmx")
        ty = g("tdy") or g("tmy")
        tj = g("tj")
        if tj is not None:
            text = _unescape(tj)
        else:
            text = "".join(
                _unescape(p) for p in _FP_ARR_STR_RE.findall(g("tja"))
            )
        spans.append((float(ty), float(tx), "text", text))
    if content[pos:].strip():
        return _interpret_content_tokens(content)
    return spans


def _interpret_content_tokens(
    content: bytes,
) -> List[Tuple[float, float, str, str]]:
    """Run the text/XObject subset of the content-stream operator set.

    Returns (y, x, kind, payload) tuples — payload is the decoded text for
    text-showing operators, the XObject resource name for ``Do``.
    Tracks ``Td``/``TD`` (translate line matrix), ``Tm`` (set absolute),
    ``BT`` (reset), and ``q``/``cm``/``Q`` (CTM translation for images).

    Single ``finditer`` pass over the stream (one C-regex match per token,
    no lexer object dispatch — content tokens dominate tokenize time); a
    string with unescaped nested parens falls back to the generic
    lexer-driven interpreter below.
    """
    spans: List[Tuple[float, float, str, str]] = []
    stack: List[object] = []
    arr: Optional[List[object]] = None
    tx = ty = 0.0
    ctm_stack: List[Tuple[float, float]] = []
    cx = cy = 0.0
    pos = 0
    for m in _TOK_RE.finditer(content):
        # tiling check: finditer silently skips bytes no token group can
        # match (e.g. the '(' opening a nested-paren string), which would
        # desync the operand stack — any gap sends the whole stream to the
        # lexer-driven interpreter (whose _lit_string handles nesting)
        if m.start() != pos:
            return _interpret_content_slow(content)
        pos = m.end()
        g = m.lastgroup
        if g == "num":
            tok = m.group("num")
            (arr if arr is not None else stack).append(
                float(tok) if b"." in tok else int(tok)
            )
        elif g == "lstr":
            inner = m.group("lstr")[1:-1]
            if b"(" in _ESC_PAIR_RE.sub(b"", inner):
                return _interpret_content_slow(content)
            (arr if arr is not None else stack).append(_unescape(inner))
        elif g == "kw":
            op = m.group("kw")
            if op == b"Tj":
                spans.append((ty, tx, "text", str(stack[-1])))
                stack.clear()
            elif op == b"TJ":
                parts = [p for p in stack[-1] if isinstance(p, str)]
                spans.append((ty, tx, "text", "".join(parts)))
                stack.clear()
            elif op in (b"Td", b"TD"):
                tx += float(stack[-2])
                ty += float(stack[-1])
                stack.clear()
            elif op == b"Tm":
                tx, ty = float(stack[-2]), float(stack[-1])
                stack.clear()
            elif op == b"BT":
                tx = ty = 0.0
                stack.clear()
            elif op == b"q":
                ctm_stack.append((cx, cy))
                stack.clear()
            elif op == b"Q":
                if ctm_stack:
                    cx, cy = ctm_stack.pop()
                stack.clear()
            elif op == b"cm":
                cx += float(stack[-2])
                cy += float(stack[-1])
                stack.clear()
            elif op == b"Do":
                spans.append((cy, cx, "media", stack[-1][1]))
                stack.clear()
            else:
                stack.clear()
        elif g == "name":
            (arr if arr is not None else stack).append(
                ("name", m.group("name")[1:].decode("latin-1"))
            )
        elif g == "aopen":
            arr = []
        elif g == "aclose":
            stack.append(arr)
            arr = None
        elif g == "hex":
            hx = re.sub(rb"[^0-9A-Fa-f]", b"", m.group("hex")[1:-1])
            if len(hx) % 2:
                hx += b"0"
            (arr if arr is not None else stack).append(
                bytes.fromhex(hx.decode()).decode("latin-1")
            )
        else:  # dict tokens inside content (e.g. BDC property lists)
            stack.clear()
    if content[pos:].strip():  # untokenizable tail (same tiling rule)
        return _interpret_content_slow(content)
    return spans


def _interpret_content_slow(
    content: bytes,
) -> List[Tuple[float, float, str, str]]:
    """Generic lexer-driven interpreter — behavior-identical fallback."""
    lx = _Lexer(content)
    spans: List[Tuple[float, float, str, str]] = []
    stack: List[object] = []
    tx = ty = 0.0
    ctm_stack: List[Tuple[float, float]] = []
    cx = cy = 0.0
    while True:
        k, v = lx.next_token()
        if k == "eof":
            break
        if k in ("num", "str", "name"):
            stack.append(v if k != "name" else ("name", v))
            continue
        if k == "arr_open":
            arr = []
            while True:
                k2, v2 = lx.next_token()
                if k2 == "arr_close":
                    break
                arr.append(v2)
            stack.append(arr)
            continue
        if k != "kw":
            stack.clear()
            continue
        op = v
        if op == "BT":
            tx = ty = 0.0
            stack.clear()
        elif op in ("Td", "TD"):
            tx += float(stack[-2])
            ty += float(stack[-1])
            stack.clear()
        elif op == "Tm":
            tx, ty = float(stack[-2]), float(stack[-1])
            stack.clear()
        elif op == "Tj":
            spans.append((ty, tx, "text", str(stack[-1])))
            stack.clear()
        elif op == "TJ":
            parts = [p for p in stack[-1] if isinstance(p, str)]
            spans.append((ty, tx, "text", "".join(parts)))
            stack.clear()
        elif op == "q":
            ctm_stack.append((cx, cy))
            stack.clear()
        elif op == "Q":
            if ctm_stack:
                cx, cy = ctm_stack.pop()
            stack.clear()
        elif op == "cm":
            cx += float(stack[-2])
            cy += float(stack[-1])
            stack.clear()
        elif op == "Do":
            name = stack[-1]
            spans.append((cy, cx, "media", name[1]))
            stack.clear()
        else:  # Tf, ET, and anything else consume their operands
            stack.clear()
    return spans


def tokenize_pdf_positions(
    data: Optional[bytes] = None, *, doc: Optional[PdfDocument] = None
) -> List[Tuple[int, float, float, str, str]]:
    """Positioned-span tokenization: xref → page tree → content streams →
    raw (page, x, y, kind, payload) tuples with coordinates normalized to
    the page MediaBox, in content-stream emission order — the
    pre-linearization shape a layout stage consumes.  Pass ``doc=`` to
    reuse an already-parsed ``PdfDocument`` (one structural parse serves
    tokenization AND asset extraction)."""
    if doc is None:
        doc = PdfDocument(data)
    out: List[Tuple[int, float, float, str, str]] = []
    for pi, page in enumerate(doc.pages()):
        raw = doc.stream_data(doc.resolve(page["Contents"]))
        mb = doc.resolve(page.get("MediaBox")) or [0, 0, 612, PAGE_HEIGHT]
        w = float(mb[2]) - float(mb[0]) or 1.0
        h = float(mb[3]) - float(mb[1]) or 1.0
        for y, x, kind, payload in _interpret_content(raw):
            out.append((pi, (x - float(mb[0])) / w, (y - float(mb[1])) / h,
                        kind, payload))
    return out


def tokenize_pdf_bytes(
    data: Optional[bytes] = None,
    min_gap: float = MIN_COLUMN_GAP,
    *,
    doc: Optional[PdfDocument] = None,
) -> List[Dict[str, object]]:
    """Full byte-stream tokenization: xref → page tree → content streams →
    LAYOUT-AWARE reading-order span sequence (kind, text, media_ref,
    offset).

    Linearization is the north star's "column detection, reading-order
    sort via y/x coordinate clustering" (``stages/layout.py``), applied
    per page in one vectorized call (page index as the grouping key): a
    single-column page reduces to the classic y-desc/x-asc sort, a
    multi-column page reads each column top-down, left-to-right — where a
    naive y-sort would interleave the columns."""
    pos = tokenize_pdf_positions(data, doc=doc)
    if not pos:
        return []
    page_arr = np.fromiter((p[0] for p in pos), np.int64, len(pos))
    xs = np.fromiter((p[1] for p in pos), np.float64, len(pos))
    ys = np.fromiter((p[2] for p in pos), np.float64, len(pos))
    _, rank, _ = reading_order_flat(page_arr, xs, ys, min_gap)
    order = np.lexsort((rank, page_arr))
    out: List[Dict[str, object]] = []
    for offset, i in enumerate(order):
        _, _, _, kind, payload = pos[i]
        if kind == "text":
            out.append(
                {"kind": "text", "text": payload, "media_ref": "",
                 "offset": offset}
            )
        else:
            out.append(
                {"kind": "media", "text": "", "media_ref": payload,
                 "offset": offset}
            )
    return out


def extract_media_assets(
    data: Optional[bytes] = None, *, doc: Optional[PdfDocument] = None
) -> Dict[str, "np.ndarray"]:
    """Decode every embedded image XObject: resource name → (H, W) uint8
    pixel array.  Walks page ``/Resources /XObject`` maps, inflates the
    stream, and inverts the PNG row predictors (/Predictor ≥ 10) with the
    full five-filter scanline decoder shared with ``stages/media.py`` —
    the interleaved corpus's media payloads decoded from real bytes.
    Pass ``doc=`` to reuse an already-parsed ``PdfDocument``."""
    from ..stages.media import _png_unfilter_row

    if doc is None:
        doc = PdfDocument(data)
    out: Dict[str, np.ndarray] = {}
    for page in doc.pages():
        res = doc.resolve(page.get("Resources")) or {}
        xobjs = doc.resolve(res.get("XObject")) or {}
        for name, ref in xobjs.items():
            if name in out:
                continue
            obj = doc.resolve(ref)
            if not (isinstance(obj, tuple) and obj[0] == "stream"):
                continue
            sdict = obj[1]
            if sdict.get("Subtype") != ("name", "Image"):
                continue
            raw = doc.stream_data(obj)
            w = int(doc.resolve(sdict["Width"]))
            h = int(doc.resolve(sdict["Height"]))
            parms = doc.resolve(sdict.get("DecodeParms")) or {}
            if int(parms.get("Predictor", 1)) >= 10:
                cols = int(parms.get("Columns", w))
                bpp = max(
                    1,
                    int(parms.get("Colors", 1))
                    * int(parms.get("BitsPerComponent", 8))
                    // 8,
                )
                row_len = cols * bpp
                px = np.empty((h, row_len), dtype=np.uint8)
                prior = np.zeros(row_len, dtype=np.uint8)
                for r in range(h):
                    start = r * (row_len + 1)
                    ftype = raw[start]
                    row = np.frombuffer(
                        raw[start + 1 : start + 1 + row_len], dtype=np.uint8
                    )
                    px[r] = _png_unfilter_row(row, prior, bpp, ftype)
                    prior = px[r]
                out[name] = px[:, :w]
            else:
                out[name] = np.frombuffer(raw[: h * w], dtype=np.uint8).reshape(
                    h, w
                )
    return out


# ---------------------------------------------------------------------------
# Ray stage
# ---------------------------------------------------------------------------


def tokenize_batch(batch) -> "pa.Table":
    """``read_binary_files(include_paths=True)`` batch → canonical
    documents(doc_id, spans) rows.  The per-file byte walk is inherently
    sequential per document (object graph + inflate) but documents are
    independent, so the stage is embarrassingly parallel ``map_batches``;
    task mode by doctrine (no expensive per-actor state — zlib and the
    lexer are stateless; CLAUDE.md perf facts)."""
    import os

    import pyarrow as pa

    from ..model import SPAN_TYPE

    paths = batch.column("path").to_pylist()
    blobs = batch.column("bytes").to_pylist()
    doc_ids = [os.path.splitext(os.path.basename(p))[0] for p in paths]
    spans = [tokenize_pdf_bytes(b) for b in blobs]
    return pa.Table.from_arrays(
        [
            pa.array(doc_ids, type=pa.string()),
            pa.array(spans, type=pa.list_(SPAN_TYPE)),
        ],
        names=["doc_id", "spans"],
    )


def _tokenize_paths(batch) -> "pa.Table":
    """Path-list batch → documents rows: open + tokenize inside the task.
    Plain ``open()`` per file skips the per-file datasource machinery that
    dominates wall time on many-small-file corpora (measured 10×: Ray's
    ``read_binary_files`` spent ~6 ms/file before any byte was parsed)."""
    import os

    import pyarrow as pa

    from ..model import SPAN_TYPE

    paths = batch.column("path").to_pylist()
    doc_ids, spans = [], []
    for p in paths:
        with open(p, "rb") as f:
            data = f.read()
        doc_ids.append(os.path.splitext(os.path.basename(p))[0])
        spans.append(tokenize_pdf_bytes(data))
    return pa.Table.from_arrays(
        [
            pa.array(doc_ids, type=pa.string()),
            pa.array(spans, type=pa.list_(SPAN_TYPE)),
        ],
        names=["doc_id", "spans"],
    )


def media_features_batch(batch) -> "pa.Table":
    """Path-list batch → per-(doc, media_ref) decoded-asset feature rows
    (width, height, pixel mean/std as e4 ints for exact aggregation) —
    the per-document half of the dedupe-before-decode plan; the caller
    reduces per ref."""
    import os

    paths = batch.column("path").to_pylist()
    doc_ids, refs, ws, hs, means, stds = [], [], [], [], [], []
    for p in paths:
        with open(p, "rb") as f:
            data = f.read()
        doc_id = os.path.splitext(os.path.basename(p))[0]
        for ref, px in sorted(extract_media_assets(data).items()):
            doc_ids.append(doc_id)
            refs.append(ref)
            hs.append(px.shape[0])
            ws.append(px.shape[1])
            means.append(int(round(float(px.mean()) * 10_000)))
            stds.append(int(round(float(px.std()) * 10_000)))
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, type=pa.string()),
            "media_ref": pa.array(refs, type=pa.string()),
            "width": pa.array(ws, type=pa.int64()),
            "height": pa.array(hs, type=pa.int64()),
            "px_mean_e4": pa.array(means, type=pa.int64()),
            "px_std_e4": pa.array(stds, type=pa.int64()),
        }
    )


def pdf_batch_size(path_or_count) -> int:
    """Files-per-task for the PDF byte pipeline, balancing fixed task
    overhead against fan-out: ``clamp(n_files / (cpus × 8), 16, 64)``
    (≥ ~8 waves of tasks per CPU for stripe balance, ≤ 64 because the
    per-task overhead is fully amortized by then).  Measured on the
    10k-file scaling corpus: 16 files/task = 664 / 2,006 docs/s at
    4 / 16 CPUs (eff 0.76 — overhead-bound after the statement-level
    interpreter sped the kernel 2×); 64 files/task = 1,001 / 3,470
    (eff 0.87) and 5,121 docs/s at 32 CPUs; 128 is flat-to-worse.
    Small corpora stay at 16 so the stage still fans out (2,000 files
    at 64 would leave 32 CPUs starved at 31 tasks)."""
    import os

    import ray

    if isinstance(path_or_count, int):
        n_files = path_or_count
    else:
        n_files = sum(
            1 for f in os.listdir(path_or_count) if f.endswith(".pdf")
        ) if os.path.isdir(path_or_count) else 1
    cpus = 8
    if ray.is_initialized():
        cpus = int(ray.cluster_resources().get("CPU", 8))
    return max(16, min(64, n_files // max(1, cpus * 8)))


def read_pdf_documents(path: str, batch_size: Optional[int] = None):
    """Streaming source: directory of PDF files → documents(doc_id, spans)
    Dataset via byte-stream tokenization.

    Local inputs take the many-small-files fast path: the driver lists
    paths (names only — no bytes), the path LIST becomes the Dataset, and
    each task opens + tokenizes its own files (``batch_size`` files per
    task — default ``pdf_batch_size(path)``, sized to keep every CPU fed
    in ~8 task waves without per-file task overhead; a PDF is not
    splittable mid-xref, so the file is the natural unit).  Non-local
    URIs fall back to ``read_binary_files``.  Heavyweight-PDF skew is
    handled downstream by the flagship's size-bucketed repartition.

    Granularity caveat: a downstream ``map_batches`` that FUSES with this
    stage inherits the larger batch size — chaining the default-256
    extractor coalesced 2000 files into 8 tasks (5.5 s vs 1.4 s wall,
    measured at 32 CPUs).  Pass the same ``batch_size`` to the downstream
    stage (``extract_documents(ds, batch_size=pdf_batch_size(path))``) to
    keep the fan-out."""
    import os

    import ray.data

    if batch_size is None:
        batch_size = pdf_batch_size(path)
    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f) for f in os.listdir(path) if f.endswith(".pdf")
        )
        # heavyweight-PDF skew control at the source: snake-stripe the path
        # list by file size (driver-side stat — names and sizes only, no
        # bytes) so every task's file group carries a balanced byte total;
        # a naive name-ordered split can hand one task a run of 500-txn
        # heavy documents and make it the straggler that bounds the wall
        n_blocks = max(1, min(len(files), (len(files) + batch_size - 1) // batch_size))
        by_size = sorted(files, key=os.path.getsize, reverse=True)
        bins: List[List[str]] = [[] for _ in range(n_blocks)]
        for i, f in enumerate(by_size):
            lap, pos = divmod(i, n_blocks)
            bins[pos if lap % 2 == 0 else n_blocks - 1 - pos].append(f)
        striped = [f for b in bins for f in b]
        ds = ray.data.from_arrow(
            pa.table({"path": pa.array(striped, type=pa.string())})
        )
        # from_arrow yields ONE block = one task; split the path list so
        # the tokenize stage actually fans out (~batch_size files/task);
        # repartition splits contiguous equal-count ranges, which the
        # flattened bins were built to match
        return ds.repartition(n_blocks).map_batches(
            _tokenize_paths, batch_format="pyarrow", batch_size=batch_size
        )
    if os.path.isfile(path):
        ds = ray.data.from_arrow(pa.table({"path": pa.array([path])}))
        return ds.map_batches(
            _tokenize_paths, batch_format="pyarrow", batch_size=batch_size
        )
    ds = ray.data.read_binary_files(
        path, include_paths=True, file_extensions=["pdf"]
    )
    return ds.map_batches(tokenize_batch, batch_format="pyarrow")


def _write_one_pdf(args: Tuple[str, int, int]) -> None:
    path, i, seed = args
    import os

    from ..fixtures import make_document

    doc = make_document(i, seed)
    with open(os.path.join(path, f"{doc['doc_id']}.pdf"), "wb") as f:
        f.write(build_pdf(doc["spans"], pdf15=(i % 3 == 2)))


def write_pdf_corpus_parallel(
    path: str, num_docs: int, seed: int = 42, workers: int = 16
) -> None:
    """`write_pdf_corpus` fanned out over a process pool (document
    generation is seeded per index, so parallel generation is
    order-independent and byte-identical to the serial writer) — 10k
    files in under a minute instead of ~7."""
    import os
    from concurrent.futures import ProcessPoolExecutor

    os.makedirs(path, exist_ok=True)
    with ProcessPoolExecutor(max_workers=workers) as pool:
        list(pool.map(
            _write_one_pdf,
            ((path, i, seed) for i in range(num_docs)),
            chunksize=100,
        ))


def convert_pdf_corpus(in_dir: str, out_dir: str, docs_per_shard: int = 2000):
    """Tokenize-once materialization: directory of PDFs → canonical span
    parquet shards (the layout every downstream query/pipeline consumes —
    parse the bytes once, query the table many times).  Output is
    fragment-per-shard (``ceil(files / docs_per_shard)`` blocks), the same
    resumable unit the flagship uses.  Returns the row count written."""
    ds = read_pdf_documents(in_dir)
    import os

    n_files = sum(1 for f in os.listdir(in_dir) if f.endswith(".pdf"))
    n_shards = max(1, (n_files + docs_per_shard - 1) // docs_per_shard)
    ds = ds.repartition(n_shards)
    ds.write_parquet(out_dir, compression="none")
    return n_files


# ---------------------------------------------------------------------------
# Fixture corpus writer (deterministic PDFs from the span fixtures)
# ---------------------------------------------------------------------------


def write_pdf_corpus(
    path: str, num_docs: int, seed: int = 42, start: int = 0
) -> List[str]:
    """One real PDF file per fixture document (same content as the span
    corpus at the same seed/index — ``fixtures.make_document``), named
    ``{doc_id}.pdf``.  Every 3rd file uses PDF 1.5 structure (object
    stream + cross-reference stream) so a corpus read exercises both
    structural forms.  Returns the sorted file list."""
    import os

    from ..fixtures import make_document

    os.makedirs(path, exist_ok=True)
    files = []
    for i in range(start, start + num_docs):
        doc = make_document(i, seed)
        p = os.path.join(path, f"{doc['doc_id']}.pdf")
        with open(p, "wb") as f:
            f.write(build_pdf(doc["spans"], pdf15=(i % 3 == 2)))
        files.append(p)
    return sorted(files)
