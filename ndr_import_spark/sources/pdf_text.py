"""PDF content-stream text extraction — pure stdlib, on top of the
`pdf_graph` object-graph parser.

Closes the reference's per-page text surface (lib/ndr_import/file/pdf.rb:10-37
uses the pdf-reader gem's ``page.text``; expected line shapes pinned in
test/file/pdf_test.rb:13-21 and the README flow test/readme_test.rb:28-50)
without needing an injected PDF library.

What it implements from the public PDF 1.7 spec (ISO 32000-1):

* page-tree walk (/Pages /Kids recursion, inheritable /Resources /MediaBox);
* a content-stream interpreter: graphics-state stack (q/Q/cm), text state
  (BT/ET/Tf/Td/TD/Tm/T*/TL/Tc/Tw/Tz), show-text operators (Tj/TJ/'/");
* font decoding: /ToUnicode CMaps (bfchar + bfrange, 1- and 2-byte codes),
  WinAnsi/MacRoman encodings, /Differences glyph-name maps, Type0/CID
  2-byte code handling, and /Widths-driven glyph advances;
* a text-grid layout in the style of the pdf-reader gem's PageLayout
  (runs positioned by (x, y), y-rows sized by the mean font size, x-columns
  by the mean glyph width) so columnar source documents keep their visual
  alignment — the shape the reference's non-tabular mappings match against.

Layout is a clean-room reimplementation of the publicly documented
run-to-grid approach; no pdf-reader code is used.
"""

from __future__ import annotations

import re
import zlib

from ndr_import_spark.sources.pdf_graph import (
    Name,
    PdfError,
    PdfGraph,
    Ref,
    _Lexer,
)

# ---------------------------------------------------------------------------
# matrices: [a b c d e f] row-major ~ ((a, b, 0), (c, d, 0), (e, f, 1))
# ---------------------------------------------------------------------------

IDENTITY = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)


def _mmul(m: tuple, n: tuple) -> tuple:
    """m × n (apply m first, then n) — PDF convention Tm' = A · Tm."""
    a1, b1, c1, d1, e1, f1 = m
    a2, b2, c2, d2, e2, f2 = n
    return (
        a1 * a2 + b1 * c2,
        a1 * b2 + b1 * d2,
        c1 * a2 + d1 * c2,
        c1 * b2 + d1 * d2,
        e1 * a2 + f1 * c2 + e2,
        e1 * b2 + f1 * d2 + f2,
    )


def _translate(tx: float, ty: float) -> tuple:
    return (1.0, 0.0, 0.0, 1.0, tx, ty)


# ---------------------------------------------------------------------------
# fonts
# ---------------------------------------------------------------------------

# The WinAnsi/MacRoman byte → text mappings are Python's cp1252 / mac_roman
# codecs; /Differences glyph names resolve through this (deliberately small)
# Adobe-Glyph-List subset covering the names western office tools emit.
_GLYPH_NAMES = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "asciicircum": "^",
    "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
    "braceright": "}", "asciitilde": "~",
    "quoteleft": "‘", "quoteright": "’",
    "quotedblleft": "“", "quotedblright": "”",
    "endash": "–", "emdash": "—", "bullet": "•",
    "ellipsis": "…", "fi": "ﬁ", "fl": "ﬂ",
    "dagger": "†", "daggerdbl": "‡", "sterling": "£",
    "copyright": "©", "registered": "®", "trademark": "™",
    "degree": "°", "plusminus": "±", "mu": "µ",
    "eacute": "é", "egrave": "è", "agrave": "à",
    "ccedilla": "ç", "adieresis": "ä", "odieresis": "ö",
    "udieresis": "ü", "ntilde": "ñ", "oslash": "ø",
    "aring": "å", "ae": "æ", "germandbls": "ß",
    "Euro": "€", "currency": "¤", "cent": "¢",
    "yen": "¥", "section": "§", "paragraph": "¶",
}
for _i in range(26):
    _GLYPH_NAMES[chr(65 + _i)] = chr(65 + _i)
    _GLYPH_NAMES[chr(97 + _i)] = chr(97 + _i)
for _i in range(10):
    _GLYPH_NAMES["zero one two three four five six seven eight nine".split()[_i]] = str(_i)


def _parse_tounicode(data: bytes) -> dict[int, str]:
    """bfchar/bfrange sections of a ToUnicode CMap → {code: text}."""
    out: dict[int, str] = {}

    def utf16(hexs: bytes) -> str:
        try:
            return bytes.fromhex(hexs.decode("ascii")).decode("utf-16-be", "replace")
        except ValueError:
            return ""

    for m in re.finditer(rb"beginbfchar(.*?)endbfchar", data, flags=re.S):
        for src, dst in re.findall(rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>", m.group(1)):
            out[int(src, 16)] = utf16(dst)
    for m in re.finditer(rb"beginbfrange(.*?)endbfrange", data, flags=re.S):
        body = m.group(1)
        # <lo> <hi> <dstStart>
        for lo, hi, dst in re.findall(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>", body
        ):
            lo_i, hi_i, d = int(lo, 16), int(hi, 16), int(dst, 16)
            width = max(len(dst), 4)
            for c in range(lo_i, min(hi_i, lo_i + 0xFFFF) + 1):
                out[c] = utf16(b"%0*x" % (width, d + (c - lo_i)))
        # <lo> <hi> [<d1> <d2> ...]
        for lo, _hi, arr in re.findall(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*\[(.*?)\]", body, flags=re.S
        ):
            for i, dst in enumerate(re.findall(rb"<([0-9A-Fa-f]+)>", arr)):
                out[int(lo, 16) + i] = utf16(dst)
    return out


class Font:
    """Decoding + metrics for one /Font resource."""

    def __init__(self, graph: PdfGraph, fdict: dict):
        g = graph
        self.subtype = str(g.deref(fdict.get("Subtype")) or "")
        self.two_byte = self.subtype == "Type0"
        self.to_unicode: dict[int, str] = {}
        # fetch via obj(), NOT deref(): deref unwraps a (dict, stream)
        # stream object to its dict, which silently discarded every
        # ToUnicode CMap reached through a Ref (caught by the CID-widths
        # fixture — two-byte text decoded as replacement chars)
        tu = fdict.get("ToUnicode")
        if isinstance(tu, Ref):
            tu = g.obj(tu.num)
        if isinstance(tu, tuple):  # (dict, stream)
            self.to_unicode = _parse_tounicode(g._decode_stream(*tu))

        self.encoding_map: dict[int, str] = {}
        self.base_codec = "cp1252"
        enc = g.deref(fdict.get("Encoding"))
        if isinstance(enc, Name) or isinstance(enc, str):
            if str(enc) == "MacRomanEncoding":
                self.base_codec = "mac_roman"
        elif isinstance(enc, dict):
            base = str(g.deref(enc.get("BaseEncoding")) or "")
            if base == "MacRomanEncoding":
                self.base_codec = "mac_roman"
            diffs = g.deref(enc.get("Differences")) or []
            code = 0
            for item in diffs:
                if isinstance(item, (int, float)):
                    code = int(item)
                else:
                    self.encoding_map[code] = _GLYPH_NAMES.get(str(item), "�")
                    code += 1

        # -- widths (glyph space, /1000) --
        self.widths: dict[int, float] = {}
        self.default_width = 500.0
        if self.two_byte:
            self.default_width = 1000.0
            desc_fonts = g.deref(fdict.get("DescendantFonts")) or []
            if desc_fonts:
                df = g.deref(desc_fonts[0])
                self.default_width = float(g.deref(df.get("DW")) or 1000)
                w = g.deref(df.get("W")) or []
                i = 0
                while i < len(w):
                    c = int(g.deref(w[i]))
                    nxt = g.deref(w[i + 1]) if i + 1 < len(w) else None
                    if isinstance(nxt, list):
                        for j, wid in enumerate(nxt):
                            self.widths[c + j] = float(g.deref(wid))
                        i += 2
                    else:
                        c2 = int(nxt)
                        wid = float(g.deref(w[i + 2]))
                        for cc in range(c, c2 + 1):
                            self.widths[cc] = wid
                        i += 3
        else:
            first = g.deref(fdict.get("FirstChar"))
            widths = g.deref(fdict.get("Widths"))
            if first is not None and widths:
                for i, wid in enumerate(widths):
                    wv = float(g.deref(wid))
                    if wv:
                        self.widths[int(first) + i] = wv
            fd = g.deref(fdict.get("FontDescriptor"))
            if isinstance(fd, dict) and fd.get("MissingWidth"):
                self.default_width = float(g.deref(fd["MissingWidth"]))

    def codes(self, raw: bytes):
        """Iterate (code, text, width/1000) over a show-string."""
        if self.two_byte:
            for i in range(0, len(raw) - 1, 2):
                c = (raw[i] << 8) | raw[i + 1]
                yield c, self._text(c, None), self.widths.get(c, self.default_width)
        else:
            for b in raw:
                yield b, self._text(b, b), self.widths.get(b, self.default_width)

    def _text(self, code: int, byte: int | None) -> str:
        if code in self.to_unicode:
            return self.to_unicode[code]
        if byte is not None:
            if byte in self.encoding_map:
                return self.encoding_map[byte]
            return bytes([byte]).decode(self.base_codec, "replace")
        return "�"


# ---------------------------------------------------------------------------
# content-stream interpreter
# ---------------------------------------------------------------------------

class TextRun:
    __slots__ = ("x", "y", "width", "font_size", "text")

    def __init__(self, x: float, y: float, width: float, font_size: float, text: str):
        self.x = x
        self.y = y
        self.width = width
        self.font_size = font_size
        self.text = text

    @property
    def endx(self) -> float:
        return self.x + self.width

    @property
    def mean_character_width(self) -> float:
        return self.width / max(len(self.text), 1)


_OPERATOR_RE = re.compile(rb"[A-Za-z'\"][A-Za-z0-9*'\"]*")


def _tokens(data: bytes):
    """Yield operands and operator strings from a content stream."""
    lex = _Lexer(data)
    n = len(data)
    while True:
        lex._skip_ws()
        if lex.pos >= n:
            return
        c = data[lex.pos:lex.pos + 1]
        if c in b"<([/+-.0123456789" or data[lex.pos:lex.pos + 4] in (b"null", b"true") \
                or data[lex.pos:lex.pos + 5] == b"false":
            try:
                yield ("operand", lex.parse())
                continue
            except PdfError:
                pass  # fall through: treat as operator-ish junk
        m = _OPERATOR_RE.match(data, lex.pos)
        if m:
            lex.pos = m.end()
            yield ("op", m.group(0).decode("latin-1"))
            if m.group(0) == b"ID":
                # inline-image payload (ISO 32000-1 §8.9.7): raw binary
                # follows one whitespace byte after ID and runs to the EI
                # sentinel — it must be SKIPPED at the byte level, never
                # lexed (arbitrary bytes break tokenisation, and a stray
                # "EI" inside the payload must not terminate early unless
                # it sits at a token boundary)
                p = lex.pos
                if p < n and data[p] in b" \t\r\n\x00\x0c":
                    p += 1
                while True:
                    idx = data.find(b"EI", p)
                    if idx < 0:
                        lex.pos = n
                        break
                    before_ok = idx == 0 or data[idx - 1] in b" \t\r\n\x00\x0c"
                    nxt = data[idx + 2 : idx + 3]
                    after_ok = nxt == b"" or nxt in (
                        b" ", b"\t", b"\r", b"\n", b"\x00", b"\x0c",
                        b"/", b"[", b"]", b"<", b">", b"(",
                    )
                    if before_ok and after_ok:
                        lex.pos = idx + 2
                        yield ("op", "EI")
                        break
                    p = idx + 2
        else:
            lex.pos += 1  # skip unparseable byte


class _Interp:
    """Minimal text-extraction interpreter over one page's content."""

    def __init__(self, graph: PdfGraph, fonts: dict[str, Font]):
        self.g = graph
        self.fonts = fonts
        self.runs: list[TextRun] = []
        self.ctm = IDENTITY
        self.stack: list[tuple] = []
        self.font: Font | None = None
        self.tfs = 0.0
        self.tc = 0.0
        self.tw = 0.0
        self.th = 1.0  # horizontal scale (Tz/100)
        self.tl = 0.0
        self.tm = IDENTITY
        self.tlm = IDENTITY

    def run(self, data: bytes) -> None:
        operands: list = []
        tok = _tokens(data)
        for kind, value in tok:
            if kind == "operand":
                operands.append(value)
                continue
            op = value
            try:
                self._apply(op, operands, tok)
            except (PdfError, TypeError, ValueError, IndexError, ZeroDivisionError):
                pass  # tolerate malformed operators: extraction is best-effort
            operands = []

    def _apply(self, op: str, o: list, tok) -> None:
        if op == "q":
            self.stack.append(self.ctm)
        elif op == "Q":
            if self.stack:
                self.ctm = self.stack.pop()
        elif op == "cm":
            self.ctm = _mmul(tuple(float(v) for v in o[-6:]), self.ctm)
        elif op == "BT":
            self.tm = self.tlm = IDENTITY
        elif op == "Tf":
            self.font = self.fonts.get(str(o[-2]))
            self.tfs = float(o[-1])
        elif op == "Td":
            self.tlm = _mmul(_translate(float(o[-2]), float(o[-1])), self.tlm)
            self.tm = self.tlm
        elif op == "TD":
            self.tl = -float(o[-1])
            self.tlm = _mmul(_translate(float(o[-2]), float(o[-1])), self.tlm)
            self.tm = self.tlm
        elif op == "Tm":
            self.tm = self.tlm = tuple(float(v) for v in o[-6:])
        elif op == "T*":
            self.tlm = _mmul(_translate(0.0, -self.tl), self.tlm)
            self.tm = self.tlm
        elif op == "TL":
            self.tl = float(o[-1])
        elif op == "Tc":
            self.tc = float(o[-1])
        elif op == "Tw":
            self.tw = float(o[-1])
        elif op == "Tz":
            self.th = float(o[-1]) / 100.0
        elif op == "Tj":
            self._show(o[-1])
        elif op == "'":
            self._apply("T*", [], tok)
            self._show(o[-1])
        elif op == '"':
            self.tw = float(o[-3])
            self.tc = float(o[-2])
            self._apply("T*", [], tok)
            self._show(o[-1])
        elif op == "TJ":
            for item in o[-1]:
                if isinstance(item, bytes):
                    self._show(item)
                else:  # kerning: thousandths of text space
                    dx = -float(item) / 1000.0 * self.tfs * self.th
                    self.tm = _mmul(_translate(dx, 0.0), self.tm)
        elif op == "BI":
            # inline image: consume the parameter-dict tokens; the
            # tokenizer byte-skips the binary payload after ID and emits
            # the closing EI itself
            for k, v in tok:
                if k == "op" and v == "EI":
                    break

    def _show(self, raw) -> None:
        if not isinstance(raw, bytes) or self.font is None:
            return
        trm = _mmul(self.tm, self.ctm)
        a, b, c_, d, e, f = trm
        sx = (a * a + b * b) ** 0.5
        sy = (c_ * c_ + d * d) ** 0.5
        font_size = self.tfs * sy
        chars: list[str] = []
        advance = 0.0  # text-space
        for code, text, w1000 in self.font.codes(raw):
            chars.append(text)
            tx = (w1000 / 1000.0 * self.tfs + self.tc) * self.th
            if code == 32 and not self.font.two_byte:
                tx += self.tw * self.th
            advance += tx
        text = "".join(chars)
        if text:
            self.runs.append(TextRun(e, f, advance * sx, font_size, text))
        self.tm = _mmul(_translate(advance, 0.0), self.tm)


# ---------------------------------------------------------------------------
# page walk + layout
# ---------------------------------------------------------------------------

_INHERITABLE = ("Resources", "MediaBox", "Rotate")


def _walk_pages(graph: PdfGraph, tree: dict, out: list) -> None:
    """Iterative page-tree walk: a malformed PDF with a /Kids cycle or
    pathological nesting must degrade to the fallback scrape, not blow
    the recursion limit (RecursionError escapes the reader's catch set
    and would fail the whole scan task). Cycles are cut by node identity;
    depth is bounded by the explicit stack."""
    stack: list[tuple[dict, dict]] = [(tree, {})]
    seen: set[int] = set()
    while stack and len(out) < 10_000:
        node, inherited = stack.pop()
        if id(node) in seen:
            continue  # /Kids cycle — drop the repeated subtree
        seen.add(id(node))
        merged = dict(inherited)
        for key in _INHERITABLE:
            if key in node:
                merged[key] = node[key]
        ntype = str(graph.deref(node.get("Type")) or "")
        if ntype == "Page" or ("Kids" not in node and "Contents" in node):
            page = dict(node)
            for key in _INHERITABLE:
                page.setdefault(key, merged.get(key))
            out.append(page)
            continue
        kids = graph.deref(node.get("Kids")) or []
        # reversed so pop() preserves document order
        for kid in reversed(list(kids)):
            child = graph.deref(kid)
            if isinstance(child, dict):
                stack.append((child, merged))


def pdf_pages(graph: PdfGraph) -> list[dict]:
    root = graph.root()
    tree = graph.deref(root.get("Pages"))
    if not isinstance(tree, dict):
        raise PdfError("PDF has no /Pages tree")
    out: list[dict] = []
    _walk_pages(graph, tree, out)
    return out


def _page_content(graph: PdfGraph, page: dict) -> bytes:
    contents = page.get("Contents")
    refs = contents if isinstance(contents, list) else [contents]
    parts: list[bytes] = []
    for ref in refs:
        got = graph.obj(ref.num) if isinstance(ref, Ref) else None
        if isinstance(got, tuple):
            try:
                parts.append(graph._decode_stream(*got))
            except (PdfError, zlib.error):
                continue
    return b"\n".join(parts)


def _page_fonts(graph: PdfGraph, page: dict) -> dict[str, Font]:
    res = graph.deref(page.get("Resources")) or {}
    fonts = graph.deref(res.get("Font")) or {}
    out = {}
    for name, ref in fonts.items():
        fdict = graph.deref(ref)
        if isinstance(fdict, dict):
            try:
                out[name] = Font(graph, fdict)
            except (PdfError, TypeError, ValueError):
                continue
    return out


def page_runs(graph: PdfGraph, page: dict) -> list[TextRun]:
    interp = _Interp(graph, _page_fonts(graph, page))
    interp.run(_page_content(graph, page))
    return interp.runs


def _merge_runs(runs: list[TextRun]) -> list[TextRun]:
    """Concatenate runs that abut on the same baseline (sub-word shows,
    kerned TJ segments) so column layout sees whole words."""
    rows: dict[int, list[TextRun]] = {}
    for r in runs:
        rows.setdefault(round(r.y), []).append(r)
    out: list[TextRun] = []
    for y in sorted(rows, reverse=True):
        row = sorted(rows[y], key=lambda r: r.x)
        cur = row[0]
        for r in row[1:]:
            gap = r.x - cur.endx
            tol = max(cur.mean_character_width, r.mean_character_width, 0.1)
            if gap < tol * 0.5:
                cur = TextRun(
                    cur.x, cur.y, (r.endx - cur.x), max(cur.font_size, r.font_size),
                    cur.text + r.text,
                )
            else:
                out.append(cur)
                cur = r
        out.append(cur)
    return out


def _mean(vals: list[float]) -> float:
    return sum(vals) / len(vals) if vals else 0.0


def layout_text(runs: list[TextRun], media_box: list[float]) -> str:
    """Runs → fixed-grid page text (pdf-reader PageLayout-style): rows are
    mean-font-size tall, columns mean-glyph-width wide; runs are inserted
    at their rounded (row, col); trailing spaces and leading/trailing
    blank rows are stripped."""
    runs = [r for r in runs if r.text.strip()]
    if not runs:
        return ""
    x0, y0, x1, y1 = (float(v) for v in media_box or [0, 0, 612, 792])
    page_w = abs(x1 - x0) or 612.0
    page_h = abs(y1 - y0) or 792.0
    # grid metrics come from the UNMERGED non-whitespace runs: merging
    # absorbs kerned sub-word segments and trailing spaces and shifts the
    # means — measured against the reference's pdf-reader-generated
    # fixture, the pre-merge means reproduce its column grid exactly
    mean_fs = _mean([r.font_size for r in runs]) or 12.0
    mean_gw = _mean([r.mean_character_width for r in runs]) or (mean_fs * 0.5)
    runs = _merge_runs(runs)
    runs = [r for r in runs if r.text.strip()]
    if not runs:
        return ""
    n_rows = max(int(page_h / mean_fs), 1)
    n_cols = max(int(page_w / mean_gw * 1.05), 1)
    row_h = page_h / n_rows
    col_w = page_w / n_cols
    x_off = min(r.x for r in runs)
    y_min = min(r.y for r in runs)
    y_off = y_min if y_min < 0 else 0.0
    grid: list[list[str]] = [[] for _ in range(n_rows + 1)]
    for r in runs:
        row = n_rows - round((r.y - y_off) / row_h)
        col = round((r.x - x_off) / col_w)
        if 0 <= row <= n_rows and 0 <= col <= n_cols:
            grid[row].append((col, r.text))
    lines: list[str] = []
    for cells in grid:
        if not cells:
            lines.append("")
            continue
        buf: list[str] = []
        for col, text in sorted(cells):
            if col > len(buf):
                buf.extend(" " * (col - len(buf)))
            # later runs overwrite: splice text in at its column
            for i, ch in enumerate(text):
                pos = col + i
                if pos < len(buf):
                    buf[pos] = ch
                else:
                    buf.append(ch)
        lines.append("".join(buf).rstrip())
    # strip leading/trailing blank rows (interesting-rows behaviour)
    while lines and not lines[0]:
        lines.pop(0)
    while lines and not lines[-1]:
        lines.pop()
    return "\n".join(lines)


def extract_text_pages(blob: bytes) -> list[str]:
    """Per-page text of a PDF binary (the pdf-reader ``page.text`` shape
    the reference iterates: pdf.rb:18-22)."""
    graph = PdfGraph(blob)
    return [
        layout_text(page_runs(graph, page), graph.deref(page.get("MediaBox")))
        for page in pdf_pages(graph)
    ]
