"""Generate born-digital TEXT-PDF fixtures + independent expected lines for
graft.media.PdfText.

Each PDF is built in pure Python (no PDF library): classic xref, /Kids page
tree, Helvetica font resource, and content streams exercising the full
supported text-operator set — Td/TD/Tm/T*/TL positioning, Tj / ' / " / TJ
shows, kerned TJ arrays (kern <= -180 thousandths inserts one space; milder
kerns do not), literal strings with every escape class (nested parens,
octal, \\n, backslash-newline continuation), hex strings, multiple BT
blocks landing runs on one shared baseline (joined with one space, x
order), out-of-order baseline emission (extraction must sort lines
top-down), comments, inline dicts and ignored graphics state. One content
stream is FlateDecode-compressed.

The expected rows are computed by a pure-Python interpreter in this file
implementing the SAME documented line-model rules (group shows by rounded
baseline, lines top-down, runs joined left-to-right with one space) —
rule drift between the twins fails PdfTextSpec / the q_pdf_text oracle.

Outputs: src/test/resources/media/textpdf/text_*.pdf
         src/test/resources/expected/pdf_text.parquet
"""
import re
import zlib

OUTDIR = 'src/test/resources/media/textpdf'
EXPECTED = 'src/test/resources/expected/pdf_text.parquet'
KERN_SPACE = -180.0


def build_pdf(page_contents, compress_mask, cmap=None):
    # cmap: optional /ToUnicode CMap text; when given, every page's resources
    # also expose /F2, a Type0 font whose show strings decode through it
    objs = {}
    n = len(page_contents)
    page_nums = list(range(3, 3 + n))
    content_nums = list(range(3 + n, 3 + 2 * n))
    font_num = 3 + 2 * n
    f2_num, tounicode_num = font_num + 1, font_num + 2
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    kids = " ".join(f"{p} 0 R" for p in page_nums)
    objs[2] = f"<< /Type /Pages /Kids [{kids}] /Count {n} >>".encode()
    font_res = f"/F1 {font_num} 0 R"
    if cmap is not None:
        font_res += f" /F2 {f2_num} 0 R"
    for i, content in enumerate(page_contents):
        objs[page_nums[i]] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << {font_res} >> >> "
            f"/Contents {content_nums[i]} 0 R >>").encode()
        data = content.encode('latin-1')
        if compress_mask[i]:
            data = zlib.compress(data, 9)
            objs[content_nums[i]] = (
                f"<< /Length {len(data)} /Filter /FlateDecode >>\nstream\n".encode()
                + data + b"\nendstream")
        else:
            objs[content_nums[i]] = (
                f"<< /Length {len(data)} >>\nstream\n".encode() + data + b"\nendstream")
    objs[font_num] = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    if cmap is not None:
        objs[f2_num] = (
            f"<< /Type /Font /Subtype /Type0 /BaseFont /Synth-CID "
            f"/Encoding /Identity-H /ToUnicode {tounicode_num} 0 R >>").encode()
        cdata = cmap.encode('latin-1')
        objs[tounicode_num] = (
            f"<< /Length {len(cdata)} >>\nstream\n".encode() + cdata + b"\nendstream")
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objs[num] + b"\nendobj\n"
    xref_at = len(out)
    maxnum = max(objs)
    out += f"xref\n0 {maxnum + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for num in range(1, maxnum + 1):
        out += (f"{offsets.get(num, 0):010d} 00000 n \n").encode()
    out += (f"trailer\n<< /Size {maxnum + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n").encode()
    return bytes(out)


# ---- /ToUnicode CMap twin ---------------------------------------------------

def cmap_decoder(cmap_text):
    """Parse a /ToUnicode CMap and return decode(raw_latin1_str) -> unicode.
    Same subset and same LOUD failure contract as the Scala side: codespace
    ranges fix the code width, bfchar/bfrange (incrementing and array forms)
    map codes to UTF-16BE destinations, anything unmapped raises."""
    def hexclean(h):
        return re.sub(r'\s', '', h)

    def units(h):
        h = hexclean(h)
        assert h and len(h) % 4 == 0, f'CMap destination <{h}> not whole UTF-16BE units'
        return [int(h[k:k + 4], 16) for k in range(0, len(h), 4)]

    def units_str(us):
        bs = b''.join(u.to_bytes(2, 'big') for u in us)
        return bs.decode('utf-16-be')  # combines surrogate pairs like the JVM

    spaces, chars, rinc, rarr = [], {}, [], []
    for m in re.finditer(r'begincodespacerange(.*?)endcodespacerange', cmap_text, re.S):
        toks = [hexclean(t) for t in re.findall(r'<([0-9A-Fa-f\s]*)>', m.group(1))]
        for lo, hi in zip(toks[::2], toks[1::2]):
            assert len(lo) == len(hi) and len(lo) % 2 == 0 and int(lo, 16) <= int(hi, 16)
            spaces.append((len(lo) // 2, int(lo, 16), int(hi, 16)))
    assert spaces, 'CMap has no codespacerange'
    for m in re.finditer(r'beginbfchar(.*?)endbfchar', cmap_text, re.S):
        toks = re.findall(r'<([0-9A-Fa-f\s]*)>', m.group(1))
        for src, dst in zip(toks[::2], toks[1::2]):
            src = hexclean(src)
            chars[(len(src) // 2, int(src, 16))] = units_str(units(dst))
    for m in re.finditer(r'beginbfrange(.*?)endbfrange', cmap_text, re.S):
        toks = re.findall(r'<[0-9A-Fa-f\s]*>|\[|\]', m.group(1))
        i = 0
        while i < len(toks):
            lo, hi = hexclean(toks[i].strip('<>')), hexclean(toks[i + 1].strip('<>'))
            nb = len(lo) // 2
            assert len(lo) == len(hi) and int(lo, 16) <= int(hi, 16)
            if toks[i + 2] == '[':
                close = toks.index(']', i + 3)
                dsts = [units_str(units(t.strip('<>'))) for t in toks[i + 3:close]]
                assert len(dsts) == int(hi, 16) - int(lo, 16) + 1
                rarr.append((nb, int(lo, 16), int(hi, 16), dsts))
                i = close + 1
            else:
                rinc.append((nb, int(lo, 16), int(hi, 16), units(toks[i + 2].strip('<>'))))
                i += 3

    def lookup(nb, code):
        if (nb, code) in chars:
            return chars[(nb, code)]
        for (n2, lo, hi, base) in rinc:
            if n2 == nb and lo <= code <= hi:
                us = base[:-1] + [base[-1] + (code - lo)]
                assert 0 <= us[-1] <= 0xFFFF
                return b''.join(u.to_bytes(2, 'big') for u in us).decode('utf-16-be')
        for (n2, lo, hi, dsts) in rarr:
            if n2 == nb and lo <= code <= hi:
                return dsts[code - lo]
        raise AssertionError(f'CMap: code 0x{code:04X} ({nb}-byte) unmapped')

    def decode(raw):
        out, i = [], 0
        while i < len(raw):
            for (nb, lo, hi) in spaces:
                if i + nb <= len(raw):
                    code = 0
                    for j in range(nb):
                        code = (code << 8) | ord(raw[i + j])
                    if lo <= code <= hi:
                        out.append(lookup(nb, code))
                        i += nb
                        break
            else:
                raise AssertionError(
                    f'CMap: byte 0x{ord(raw[i]):02X} at {i} outside every codespace range')
        return ''.join(out)

    return decode


# ---- independent interpreter (the documented extraction rules) -------------

def _tokens(s):
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c in ' \n\r\t\f\x00':
            i += 1
        elif c == '%':
            while i < n and s[i] not in '\n\r':
                i += 1
        elif c == '(':
            out, depth, i = [], 1, i + 1
            while depth:
                ch = s[i]
                if ch == '\\':
                    nx = s[i + 1]
                    mapped = {'n': '\n', 'r': '\r', 't': '\t', 'b': '\b', 'f': '\f',
                              '(': '(', ')': ')', '\\': '\\'}
                    if nx in mapped:
                        out.append(mapped[nx]); i += 2
                    elif nx in '\r\n':
                        i += 2
                        if nx == '\r' and i < n and s[i] == '\n':
                            i += 1
                    elif nx.isdigit() and nx in '01234567':
                        v, k, i = 0, 0, i + 1
                        while k < 3 and i < n and s[i] in '01234567':
                            v = v * 8 + int(s[i]); i += 1; k += 1
                        out.append(chr(v & 0xFF))
                    else:
                        out.append(nx); i += 2
                elif ch == '(':
                    depth += 1; out.append('('); i += 1
                elif ch == ')':
                    depth -= 1
                    if depth:
                        out.append(')')
                    i += 1
                else:
                    out.append(ch); i += 1
            yield ('str', ''.join(out))
        elif s.startswith('<<', i):
            depth, i = 1, i + 2
            while depth:
                if s.startswith('<<', i):
                    depth += 1; i += 2
                elif s.startswith('>>', i):
                    depth -= 1; i += 2
                else:
                    i += 1
        elif c == '<':
            end = s.index('>', i)
            h = re.sub(r'\s', '', s[i + 1:end])
            if len(h) % 2:
                h += '0'
            yield ('str', ''.join(chr(int(h[k:k + 2], 16)) for k in range(0, len(h), 2)))
            i = end + 1
        elif c == '[':
            yield ('arr_open', None); i += 1
        elif c == ']':
            yield ('arr_close', None); i += 1
        elif c == '/':
            j = i + 1
            while j < n and s[j] not in ' \n\r\t\f\x00()<>[]{}/%':
                j += 1
            yield ('name', s[i + 1:j]); i = j
        elif c in '+-.0123456789':
            j = i + 1
            while j < n and s[j] in '+-.0123456789':
                j += 1
            yield ('num', float(s[i:j])); i = j
        else:
            j = i
            while j < n and s[j] not in ' \n\r\t\f\x00()<>[]{}/%':
                j += 1
            yield ('op', s[i:j]); i = j


def interpret(content, fonts=None):
    # mirrors the Scala interpreter's validity contract too (rotated Tm,
    # shows outside BT, nested arrays all rejected) so a fixture the JVM
    # side would refuse fails HERE, at generation time
    shows = []
    lx = ly = leading = 0.0
    sx = sy = 1.0  # active Tm scale; Td/TD/TL are unscaled text units
    seq = 0
    in_text = False
    cur_decoder = None  # active font's CMap decoder, if any
    operands, arr, arr_done = [], None, None

    def dec(raw):
        # per-font decoding: CMap codes for /ToUnicode fonts; else Latin-1
        # with the UTF-16BE BOM (FE FF) text-string rule
        if cur_decoder is not None:
            return cur_decoder(raw)
        if len(raw) >= 2 and raw[0] == '\xfe' and raw[1] == '\xff':
            bs = bytes(ord(c) for c in raw[2:])
            assert len(bs) % 2 == 0, 'UTF-16BE string with a partial code unit'
            return bs.decode('utf-16-be')
        return raw
    for kind, val in _tokens(content):
        if kind == 'arr_open':
            assert arr is None, 'nested array in content stream'
            assert arr_done is None, "unconsumed content-stream array before '['"
            arr = []
        elif kind == 'arr_close':
            arr_done, arr = arr, None
            operands.append(('arr', None))
        elif arr is not None:
            arr.append((kind, val))
        elif kind == 'op':
            if val == 'BT':
                in_text = True
                lx = ly = 0.0
                sx = sy = 1.0  # BT resets Tm to identity
            elif val == 'Td':
                lx += operands[-2][1] * sx; ly += operands[-1][1] * sy
            elif val == 'ET':
                in_text = False
            elif val == 'TD':
                leading = -operands[-1][1]
                lx += operands[-2][1] * sx; ly += operands[-1][1] * sy
            elif val == 'Tm':
                a, b, c, d = (operands[-6][1], operands[-5][1],
                              operands[-4][1], operands[-3][1])
                assert b == 0.0 and c == 0.0 and a > 0.0 and d > 0.0, \
                    f'rotated/skewed/mirrored text matrix unsupported (a={a} b={b} c={c} d={d})'
                sx, sy = a, d
                lx, ly = operands[-2][1], operands[-1][1]
            elif val == 'T*':
                ly -= leading * sy
            elif val == 'TL':
                leading = operands[-1][1]
            elif val == 'Tf':
                assert operands[-2][0] == 'name', 'Tf needs /Name size'
                cur_decoder = (fonts or {}).get(operands[-2][1])
            elif val in ('Tj', "'", '"'):
                assert in_text, 'text-show operator outside BT/ET'
                if val in ("'", '"'):
                    ly -= leading * sy
                text = dec(operands[-1][1])
                if text:
                    shows.append((ly, lx, seq, text)); seq += 1
            elif val == 'TJ':
                assert in_text, 'text-show operator outside BT/ET'
                # decode each segment SEPARATELY (a kern space must not land
                # inside a CMap byte-code sequence)
                buf = []
                for k, v in arr_done:
                    if k == 'str':
                        buf.append(dec(v))
                    elif k == 'num' and v <= KERN_SPACE:
                        buf.append(' ')
                arr_done = None
                text = ''.join(buf)
                if text:
                    shows.append((ly, lx, seq, text)); seq += 1
            operands = []
        else:
            operands.append((kind, val))
    by_line = {}
    for (y, x, q, t) in shows:
        by_line.setdefault(round(y * 10) / 10.0, []).append((x, q, t))
    out = []
    for li, y in enumerate(sorted(by_line, reverse=True)):
        runs = sorted(by_line[y])
        out.append((li, y, ' '.join(t for (_, _, t) in runs)))
    return out


def main():
    import os
    os.makedirs(OUTDIR, exist_ok=True)
    # page 1: Td/TD/T* lines, same-baseline second BT block, escapes, octal
    p1 = (
        "BT /F1 12 Tf 72 720 Td (Hello, world!) Tj ET "
        "BT /F1 12 Tf 300 720 Td (same line) Tj ET "          # joins line 1
        "BT /F1 12 Tf 72 700 TD (Second \\(line\\) with \\\\escapes) Tj "
        "0 -20 Td (Oct\\141l and tab\\there) Tj ET "           # \141 = 'a'
        "% a comment to ignore\n"
        "BT /F1 10 Tf 72 640 Td 14 TL (Leading one) Tj T* (Leading two) ' ET")
    # page 2: Tm positioning, TJ kerning, hex strings, out-of-order baselines,
    # quote/doublequote, inline dict (marked content), Flate-compressed
    p2 = (
        "BT /F1 12 Tf 1 0 0 1 72 500 Tm "
        "[ (ker) -250 (ned) ] TJ ET "                          # -> 'ker ned'
        "BT /F1 12 Tf 1 0 0 1 72 700 Tm "
        "[ (no) -50 (gap) ] TJ ET "                            # -> 'nogap'
        "/Span << /ActualText (ignored) >> BDC "
        "BT /F1 12 Tf 72 600 Td <48656C6C6F> Tj ET EMC "      # hex 'Hello'
        "BT /F1 12 Tf 72 560 Td 16 TL (q1) Tj 2 3 (q2) \" ET "  # \" pops aw ac string
        "BT /F1 12 Tf 72 450 Td (line con\\\ntinued) Tj ET")   # backslash-newline
    pages = [p1, p2]
    pdf = build_pdf(pages, compress_mask=[False, True])
    name = 'text_00.pdf'
    with open(f'{OUTDIR}/{name}', 'wb') as f:
        f.write(pdf)
    rows = []
    for pi, content in enumerate(pages):
        for (li, y, text) in interpret(content):
            rows.append(dict(name=name, page_index=pi, line_index=li, y=y, text=text))

    # text_01.pdf: multi-byte encodings — a Type0 font with a /ToUnicode CMap
    # (1- and 2-byte codespaces, bfchar incl. ligature + surrogate-pair
    # destinations, incrementing and array bfranges) plus the UTF-16BE BOM
    # text-string rule for the plain font
    cmap = (
        "/CIDInit /ProcSet findresource begin\n"
        "12 dict begin begincmap\n"
        "/CMapName /Synth-CID-UCS2 def /CMapType 2 def\n"
        "2 begincodespacerange\n<00> <7F>\n<8000> <FFFF>\nendcodespacerange\n"
        "4 beginbfchar\n"
        "<41> <0048>\n"            # 0x41 -> 'H'
        "<42> <0065>\n"            # 0x42 -> 'e'
        "<8001> <006600660069>\n"  # ligature: one code -> 'ffi'
        "<8002> <D834DD1E>\n"      # surrogate pair -> U+1D11E
        "endbfchar\n"
        "2 beginbfrange\n"
        "<50> <59> <0061>\n"       # 0x50..0x59 -> 'a'..'j' (incrementing)
        "<8010> <8012> [<0058> <0059> <005A>]\n"  # array form -> X Y Z
        "endbfrange\n"
        "endcmap CMapName currentdict /CMap defineresource pop end end\n")
    c1 = (
        "BT /F2 12 Tf 72 700 Td <4142> Tj ET "              # hex codes -> 'He'
        "BT /F2 12 Tf 72 680 Td (AB) Tj ET "                # literal bytes are CODES too -> 'He'
        "BT /F2 12 Tf 72 660 Td <50515253> Tj ET "          # bfrange inc -> 'abcd'
        "BT /F2 12 Tf 72 640 Td <80 01> Tj ET "             # ligature -> 'ffi'
        "BT /F2 12 Tf 72 620 Td <8002> Tj ET "              # astral char
        "BT /F2 12 Tf 72 600 Td <801080118012> Tj ET "      # array bfrange -> 'XYZ'
        "BT /F2 12 Tf 72 580 Td [ <41> -250 <42> ] TJ ET "  # kern BETWEEN codes -> 'H e'
        "BT /F2 12 Tf 72 560 Td <42800141> Tj ET "          # mixed widths -> 'effiH'
        # font switch back to the simple font mid-page: Latin-1 again
        "BT /F1 12 Tf 72 540 Td (plain again) Tj ET")
    c2 = (
        "BT /F1 12 Tf 72 700 Td <FEFF00480069> Tj ET "      # BOM hex -> 'Hi'
        "BT /F1 12 Tf 72 680 Td (\\376\\377\\000Y\\000o) Tj ET "  # BOM literal -> 'Yo'
        "BT /F1 12 Tf 72 660 Td (latin) Tj ET")
    cpages = [c1, c2]
    cpdf = build_pdf(cpages, compress_mask=[True, False], cmap=cmap)
    cname = 'text_01.pdf'
    with open(f'{OUTDIR}/{cname}', 'wb') as f:
        f.write(cpdf)
    fonts = {'F2': cmap_decoder(cmap)}
    for pi, content in enumerate(cpages):
        for (li, y, text) in interpret(content, fonts):
            rows.append(dict(name=cname, page_index=pi, line_index=li, y=y, text=text))
    # text_02.pdf: scaled text matrices ("S 0 0 S x y Tm" with a size-1
    # font — size via the matrix): Td/TD/TL/T* displacements are unscaled
    # text units and must multiply through the active scale; BT resets it
    s1 = (
        "BT /F1 1 Tf 14 0 0 14 72 700 Tm (Scaled heading) Tj "
        "0 -1.5 Td (second at 14x) Tj "                        # dy = -21
        "1.2 TL T* (third via T star) Tj ET "                  # dy = -16.8
        # fresh BT: scale resets to identity — plain 12pt block below
        "BT /F1 12 Tf 72 600 Td (unscaled after reset) Tj ET "
        # anisotropic scale: x advances at 6/unit, y at 10/unit
        "BT /F1 1 Tf 6 0 0 10 72 560 Tm (aniso) Tj 20 0 Td (right) Tj "
        "0 -2 TD (below) Tj T* (again) Tj ET")
    s2 = (
        # TD sets leading in TEXT units; a later Tm rescales how far T*
        # moves — leading survives the matrix change unscaled
        "BT /F1 1 Tf 10 0 0 10 72 700 Tm 0 -2 TD (lead at 10x) Tj "
        "5 0 0 5 72 500 Tm T* (same lead at 5x) Tj ET "        # dy = -10
        "BT /F1 12 Tf 72 400 Td (' under scale:) Tj ET "
        "BT /F1 1 Tf 8 0 0 8 200 400 Tm 3 TL (q one) ' (q two) ' ET")
    spages = [s1, s2]
    spdf = build_pdf(spages, compress_mask=[False, True])
    sname = 'text_02.pdf'
    with open(f'{OUTDIR}/{sname}', 'wb') as f:
        f.write(spdf)
    for pi, content in enumerate(spages):
        for (li, y, text) in interpret(content):
            rows.append(dict(name=sname, page_index=pi, line_index=li, y=y, text=text))

    import duckdb
    import pandas as pd
    df = pd.DataFrame(rows)
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT name, CAST(page_index AS INT) page_index, "
                "CAST(line_index AS INT) line_index, y, text FROM df")
    con.execute(f"COPY t TO '{EXPECTED}' (FORMAT PARQUET)")
    for r in rows:
        print(r)
    print(f"wrote {name} + {len(rows)} expected lines to {EXPECTED}")


if __name__ == '__main__':
    main()
