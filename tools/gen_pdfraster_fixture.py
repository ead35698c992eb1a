"""Generate vector/text PDF fixtures + independent expected raster pixels for
graft.media.PdfRaster (the subset rasterizer: re/m/l/c/v/y/h path
construction, nonzero f / even-odd f* fills, butt-cap quad strokes S/s/B
with w line width and RG/G stroke color, rg/g fill color, q/Q state,
translation-only cm, GlyphFont text).

Each PDF is built in pure Python (classic xref, /Kids tree, custom MediaBox)
and rendered HERE with an independent implementation of the documented pixel
rules — scale s = dpi/72, W×H = round(mb·s) white canvas, all user→device
rounding via Python round() (half-even = the JVM's math.rint), y flipped
device-down, rects covering [round(x·s), round((x+w)·s)) ×
[H−round((y+h)·s), H−round(y·s)), glyph runs at
(round(tx·s), H−round(ty·s)−7·iscale) with iscale = max(1, round(size·s/7)).
Polygon fills and strokes use the pixel-center scanline rules (Béziers
flattened to 16 chords at t=i/16, half-open edge rule ymin<=Y<ymax at
Y=row+0.5, crossings at x0+(Y−y0)(x1−x0)/(y1−y0) sorted by x, spans
painting columns [ceil(xa−0.5), ceil(xb−0.5)), stroke quads offset by
(−dy/len·hw, dx/len·hw) with len=sqrt(dx²+dy²), hw=w·s/2) — every formula
written in the identical order as the Scala side so IEEE doubles agree
bit-for-bit. The glyph table is a
deliberate duplicate of GlyphFont's (token alphabet + the round-5 full
uppercase/digit/punctuation extension): any transcription drift between the
twins fails PdfRasterSpec / the q_pdf_raster oracle.

Outputs: src/test/resources/media/rasterpdf/raster_00.pdf
         src/test/resources/expected/pdf_raster.parquet
         src/test/resources/goldens/pdfraster_goldens.json

Run from the repo root with PYTHONPATH=tools (imports the pdftext twin's
tokenizer + CMap decoder).
"""
import hashlib
import json
import math as _m
import zlib

from gen_pdftext_fixture import _tokens, cmap_decoder

OUTDIR = 'src/test/resources/media/rasterpdf'
EXPECTED = 'src/test/resources/expected/pdf_raster.parquet'
EXPECTED_SEG = 'src/test/resources/expected/page_segment.parquet'
EXPECTED_OCR = 'src/test/resources/expected/page_ocr.parquet'
GOLDENS = 'src/test/resources/goldens/pdfraster_goldens.json'
KERN_SPACE = -180.0
GLYPH_W, GLYPH_H, SPACING = 5, 7, 1

FONT = {
    '[': [0x0E, 0x08, 0x08, 0x08, 0x08, 0x08, 0x0E],
    ']': [0x0E, 0x02, 0x02, 0x02, 0x02, 0x02, 0x0E],
    'A': [0x0E, 0x11, 0x11, 0x1F, 0x11, 0x11, 0x11],
    'C': [0x0E, 0x11, 0x10, 0x10, 0x10, 0x11, 0x0E],
    'D': [0x1E, 0x11, 0x11, 0x11, 0x11, 0x11, 0x1E],
    'G': [0x0E, 0x11, 0x10, 0x17, 0x11, 0x11, 0x0F],
    'H': [0x11, 0x11, 0x11, 0x1F, 0x11, 0x11, 0x11],
    'K': [0x11, 0x12, 0x14, 0x18, 0x14, 0x12, 0x11],
    'T': [0x1F, 0x04, 0x04, 0x04, 0x04, 0x04, 0x04],
    'W': [0x11, 0x11, 0x11, 0x15, 0x15, 0x15, 0x0A],
    'X': [0x11, 0x11, 0x0A, 0x04, 0x0A, 0x11, 0x11],
    'Y': [0x11, 0x11, 0x0A, 0x04, 0x04, 0x04, 0x04],
    'Z': [0x1F, 0x01, 0x02, 0x04, 0x08, 0x10, 0x1F],
    '2': [0x0E, 0x11, 0x01, 0x02, 0x04, 0x08, 0x1F],
    '3': [0x1F, 0x02, 0x04, 0x02, 0x01, 0x11, 0x0E],
    '4': [0x02, 0x06, 0x0A, 0x12, 0x1F, 0x02, 0x02],
    '5': [0x1F, 0x10, 0x1E, 0x01, 0x01, 0x11, 0x0E],
    '6': [0x06, 0x08, 0x10, 0x1E, 0x11, 0x11, 0x0E],
    '7': [0x1F, 0x01, 0x02, 0x04, 0x08, 0x08, 0x08],
    '8': [0x0E, 0x11, 0x11, 0x0E, 0x11, 0x11, 0x0E],
    'B': [0x1E, 0x11, 0x11, 0x1E, 0x11, 0x11, 0x1E],
    'E': [0x1F, 0x10, 0x10, 0x1E, 0x10, 0x10, 0x1F],
    'F': [0x1F, 0x10, 0x10, 0x1E, 0x10, 0x10, 0x10],
    'I': [0x0E, 0x04, 0x04, 0x04, 0x04, 0x04, 0x0E],
    'J': [0x07, 0x02, 0x02, 0x02, 0x02, 0x12, 0x0C],
    'L': [0x10, 0x10, 0x10, 0x10, 0x10, 0x10, 0x1F],
    'M': [0x11, 0x1B, 0x15, 0x15, 0x11, 0x11, 0x11],
    'N': [0x11, 0x11, 0x19, 0x15, 0x13, 0x11, 0x11],
    'O': [0x0E, 0x11, 0x11, 0x11, 0x11, 0x11, 0x0E],
    'P': [0x1E, 0x11, 0x11, 0x1E, 0x10, 0x10, 0x10],
    'Q': [0x0E, 0x11, 0x11, 0x11, 0x15, 0x12, 0x0D],
    'R': [0x1E, 0x11, 0x11, 0x1E, 0x14, 0x12, 0x11],
    'S': [0x0F, 0x10, 0x10, 0x0E, 0x01, 0x01, 0x1E],
    'U': [0x11, 0x11, 0x11, 0x11, 0x11, 0x11, 0x0E],
    'V': [0x11, 0x11, 0x11, 0x11, 0x11, 0x0A, 0x04],
    '0': [0x0E, 0x11, 0x13, 0x15, 0x19, 0x11, 0x0E],
    '1': [0x04, 0x0C, 0x04, 0x04, 0x04, 0x04, 0x0E],
    '9': [0x0E, 0x11, 0x11, 0x0F, 0x01, 0x02, 0x0C],
    '.': [0x00, 0x00, 0x00, 0x00, 0x00, 0x0C, 0x0C],
    ',': [0x00, 0x00, 0x00, 0x00, 0x0C, 0x04, 0x08],
    '-': [0x00, 0x00, 0x00, 0x1F, 0x00, 0x00, 0x00],
    ':': [0x00, 0x0C, 0x0C, 0x00, 0x0C, 0x0C, 0x00],
    '!': [0x04, 0x04, 0x04, 0x04, 0x04, 0x00, 0x04],
}

IGNORED = {'J', 'j', 'M', 'ri', 'i',
           'Tc', 'Tw', 'Tz', 'Ts', 'BMC', 'BDC', 'EMC', 'MP', 'DP'}
BEZIER_CHORDS = 16


def build_pdf(pages, cmap=None, images=None, shadings=None, forms=None):
    """pages: list of (content, mbw, mbh, compress). Fonts: /F1 plain; /F2
    (Type0 + /ToUnicode) when cmap is given. images: {name: (w, h, rgb
    bytes)} — FlateDecode /DeviceRGB image XObjects shared by every page's
    /Resources (the Do composition leg). shadings: {name: (x0, y0, x1, y1,
    c0, c1, n, e0, e1)} — axial /ShadingType 2 dicts with a type-2
    exponential /Function object each, for the sh leg. forms: {name:
    (content, (bx0, by0, bx1, by1), matrix6_or_None, xobj_names)} —
    /Subtype /Form streams whose own /Resources /XObject exposes the
    listed image/form names (nested forms allowed)."""
    objs = {}
    n = len(pages)
    page_nums = list(range(3, 3 + n))
    content_nums = list(range(3 + n, 3 + 2 * n))
    font_num = 3 + 2 * n
    f2_num, tounicode_num = font_num + 1, font_num + 2
    img_names = sorted(images) if images else []
    img_base = (tounicode_num if cmap is not None else font_num) + 1
    img_nums = {nm: img_base + i for i, nm in enumerate(img_names)}
    sh_names = sorted(shadings) if shadings else []
    sh_base = img_base + len(img_names)
    # each shading takes TWO objects: the dict and its /Function
    sh_nums = {nm: sh_base + 2 * i for i, nm in enumerate(sh_names)}
    form_names = sorted(forms) if forms else []
    form_base = sh_base + 2 * len(sh_names)
    form_nums = {nm: form_base + i for i, nm in enumerate(form_names)}
    xobj_nums = {**img_nums, **form_nums}
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    kids = " ".join(f"{p} 0 R" for p in page_nums)
    objs[2] = f"<< /Type /Pages /Kids [{kids}] /Count {n} >>".encode()
    font_res = f"/F1 {font_num} 0 R"
    if cmap is not None:
        font_res += f" /F2 {f2_num} 0 R"
    xobj_res = ""
    if img_names or form_names:
        entries = " ".join(f"/{nm} {xobj_nums[nm]} 0 R"
                           for nm in img_names + form_names)
        xobj_res = f"/XObject << {entries} >> "
    sh_res = ""
    if sh_names:
        entries = " ".join(f"/{nm} {sh_nums[nm]} 0 R" for nm in sh_names)
        sh_res = f"/Shading << {entries} >> "
    for i, (content, mbw, mbh, compress) in enumerate(pages):
        objs[page_nums[i]] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {mbw} {mbh}] "
            f"/Resources << /Font << {font_res} >> {xobj_res}{sh_res}>> "
            f"/Contents {content_nums[i]} 0 R >>").encode()
        data = content.encode('latin-1')
        if compress:
            data = zlib.compress(data, 9)
            objs[content_nums[i]] = (
                f"<< /Length {len(data)} /Filter /FlateDecode >>\nstream\n".encode()
                + data + b"\nendstream")
        else:
            objs[content_nums[i]] = (
                f"<< /Length {len(data)} >>\nstream\n".encode() + data + b"\nendstream")
    objs[font_num] = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    for nm in img_names:
        iw, ih, rgbb = images[nm]
        assert len(rgbb) == iw * ih * 3
        idata = zlib.compress(bytes(rgbb), 9)
        objs[img_nums[nm]] = (
            f"<< /Type /XObject /Subtype /Image /Width {iw} /Height {ih} "
            f"/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /FlateDecode "
            f"/Length {len(idata)} >>\nstream\n".encode() + idata + b"\nendstream")
    for nm in form_names:
        fcontent, (bx0, by0, bx1, by1), mtx, xnames = forms[nm]
        mtx_s = ""
        if mtx is not None:
            mtx_s = "/Matrix [" + " ".join(str(v) for v in mtx) + "] "
        res_s = ""
        if xnames:
            entries = " ".join(f"/{xn} {xobj_nums[xn]} 0 R" for xn in xnames)
            res_s = f"/Resources << /XObject << {entries} >> >> "
        fdata = fcontent.encode('latin-1')
        objs[form_nums[nm]] = (
            f"<< /Type /XObject /Subtype /Form /BBox [{bx0} {by0} {bx1} {by1}] "
            f"{mtx_s}{res_s}/Length {len(fdata)} >>\nstream\n".encode()
            + fdata + b"\nendstream")
    for nm in sh_names:
        sh = shadings[nm]
        if len(sh) == 9:  # axial
            x0, y0, x1, y1, c0, c1, expn, e0, e1 = sh
            stype, coords = 2, f"[{x0} {y0} {x1} {y1}]"
        else:  # radial
            x0, y0, r0, x1, y1, r1, c0, c1, expn, e0, e1 = sh
            stype, coords = 3, f"[{x0} {y0} {r0} {x1} {y1} {r1}]"
        fnum = sh_nums[nm] + 1
        ext = f"[{'true' if e0 else 'false'} {'true' if e1 else 'false'}]"
        objs[sh_nums[nm]] = (
            f"<< /ShadingType {stype} /ColorSpace /DeviceRGB "
            f"/Coords {coords} /Function {fnum} 0 R "
            f"/Extend {ext} >>").encode()
        objs[fnum] = (
            f"<< /FunctionType 2 /Domain [0 1] "
            f"/C0 [{c0[0]} {c0[1]} {c0[2]}] /C1 [{c1[0]} {c1[1]} {c1[2]}] "
            f"/N {expn} >>").encode()
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


def render(content, fonts, mbw, mbh, dpi, images=None, gstates=None,
           shadings=None):
    # gstates: name -> (line-width override or None if no /LW,
    # solid-dash flag: True when the dict carries /D [[] 0]); every
    # reachable ExtGState was pre-validated to carry only benign keys
    gstates = gstates or {}
    s = dpi / 72.0
    W, H = int(round(mbw * s)), int(round(mbh * s))
    assert W > 0 and H > 0
    rgb = bytearray(b'\xff' * (W * H * 3))

    def px(u):
        return int(round(u * s))

    def fill_rect(x, y, w, h, c):
        cx0, cx1 = max(clip[0], px(x)), min(clip[2], px(x + w))
        ry0, ry1 = max(clip[1], H - px(y + h)), min(clip[3], H - px(y))
        for yy in range(ry0, ry1):
            for xx in range(cx0, cx1):
                if clip_mask is None or clip_mask[yy * W + xx]:
                    o = (yy * W + xx) * 3
                    rgb[o:o + 3] = bytes(c)

    import math as _math
    HD = float(H)

    def device_ring(pts):
        return [(ux * s, HD - uy * s) for (ux, uy) in pts]

    def scan_spans(rings, even_odd):
        # Shared scanline walker (fills, strokes AND general clip-path
        # rasterization): yields each inside span as (row, xa, xb) already
        # clamped to the live clip BOX — every formula in the Scala
        # scanSpans order. rings: device-space point lists, implicitly
        # closed.
        edges = []
        y_min, y_max = float('inf'), float('-inf')
        for ring in rings:
            n = len(ring)
            if n >= 2:
                for i in range(n):
                    x0, y0 = ring[i]
                    x1, y1 = ring[(i + 1) % n]
                    if y0 != y1:
                        edges.append((x0, y0, x1, y1))
                    y_min = min(y_min, y0, y1)
                    y_max = max(y_max, y0, y1)
        if not edges:
            return
        row_lo = max(clip[1], _math.floor(y_min - 0.5))
        row_hi = min(clip[3], _math.ceil(y_max + 0.5))
        for row in range(row_lo, row_hi):
            yc = row + 0.5
            xs = []
            for (x0, y0, x1, y1) in edges:
                # half-open: include lower-y endpoint, exclude upper
                if y0 < y1:
                    if y0 <= yc < y1:
                        xs.append((x0 + (yc - y0) * (x1 - x0) / (y1 - y0), 1))
                elif y1 <= yc < y0:
                    xs.append((x0 + (yc - y0) * (x1 - x0) / (y1 - y0), -1))
            if not xs:
                continue
            xs.sort(key=lambda e: e[0])
            acc = 0
            for i in range(len(xs) - 1):
                acc += xs[i][1]
                inside = (i % 2 == 0) if even_odd else acc != 0
                if inside:
                    xa = max(clip[0], _math.ceil(xs[i][0] - 0.5))
                    xb = min(clip[2], _math.ceil(xs[i + 1][0] - 0.5))
                    yield row, xa, xb

    def scan_fill(rings, even_odd, c):
        for row, xa, xb in scan_spans(rings, even_odd):
            for x in range(xa, xb):
                if clip_mask is None or clip_mask[row * W + x]:
                    o = (row * W + x) * 3
                    rgb[o:o + 3] = bytes(c)

    def stroke_subs(sub_list, lw_dev, c, dash_dev, phase_dev):
        assert lw_dev > 0, f'non-positive stroke width {lw_dev}'
        hw = lw_dev / 2.0
        for (pts, closed) in sub_list:
            ring = device_ring(pts)
            n = len(ring)
            if n < 2:
                continue
            # dash walker continues across the subpath's segments (Scala
            # order); phase resolved at subpath start
            d_idx, d_on, d_rem = 0, True, 0.0
            if dash_dev:
                # odd-length arrays have a TWO-pass on/off cycle ([4] =
                # on4/off4, period 8) — mod by the parity-true cycle
                total_d = sum(dash_dev)
                cycle = total_d if len(dash_dev) % 2 == 0 else total_d * 2.0
                pos = phase_dev % cycle
                while pos >= dash_dev[d_idx]:
                    pos -= dash_dev[d_idx]
                    d_idx = (d_idx + 1) % len(dash_dev)
                    d_on = not d_on
                d_rem = dash_dev[d_idx] - pos
            segs = n if closed else n - 1
            for i in range(segs):
                x0, y0 = ring[i]
                x1, y1 = ring[(i + 1) % n]
                if x0 == x1 and y0 == y1:
                    continue
                dx = x1 - x0
                dy = y1 - y0
                ln = _math.sqrt(dx * dx + dy * dy)
                nx = -dy / ln * hw
                ny = dx / ln * hw
                if not dash_dev:
                    scan_fill([[(x0 + nx, y0 + ny), (x1 + nx, y1 + ny),
                                (x1 - nx, y1 - ny), (x0 - nx, y0 - ny)]], False, c)
                    continue
                t = 0.0
                while t < ln:
                    step = d_rem if d_rem < ln - t else ln - t
                    if d_on and step > 0.0:
                        s0, s1 = t / ln, (t + step) / ln
                        ax, ay = x0 + s0 * dx, y0 + s0 * dy
                        bx, by = x0 + s1 * dx, y0 + s1 * dy
                        scan_fill([[(ax + nx, ay + ny), (bx + nx, by + ny),
                                    (bx - nx, by - ny), (ax - nx, ay - ny)]], False, c)
                    t += step
                    d_rem -= step
                    if d_rem <= 0.0:
                        d_idx = (d_idx + 1) % len(dash_dev)
                        d_on = not d_on
                        d_rem = dash_dev[d_idx]

    def append_cubic(pts, x1, y1, x2, y2, x3, y3):
        x0, y0 = pts[-1]
        for i in range(1, BEZIER_CHORDS + 1):
            t = i / float(BEZIER_CHORDS)
            mt = 1.0 - t
            pts.append((mt * mt * mt * x0 + 3.0 * mt * mt * t * x1 + 3.0 * mt * t * t * x2 + t * t * t * x3,
                        mt * mt * mt * y0 + 3.0 * mt * mt * t * y1 + 3.0 * mt * t * t * y2 + t * t * t * y3))

    def rect_sub(r):
        x, y, w2, h2 = r
        return ([(x, y), (x + w2, y), (x + w2, y + h2), (x, y + h2)], True)

    def draw_cells(text, x_px, top_px, isc, c):
        pen = 0
        for ch in text:
            up = ch.upper() if 'a' <= ch <= 'z' else ch
            if up != ' ':
                glyph = FONT[up]  # KeyError = generation-time loud failure
                for r in range(GLYPH_H):
                    bits = glyph[r]
                    for gc in range(GLYPH_W):
                        if bits & (1 << (GLYPH_W - 1 - gc)):
                            for by in range(isc):
                                yy = top_px + r * isc + by
                                if clip[1] <= yy < clip[3]:
                                    for bx in range(isc):
                                        xx = x_px + pen + gc * isc + bx
                                        if (clip[0] <= xx < clip[2] and
                                                (clip_mask is None or
                                                 clip_mask[yy * W + xx])):
                                            o = (yy * W + xx) * 3
                                            rgb[o:o + 3] = bytes(c)
            pen += (GLYPH_W + SPACING) * isc
        return pen

    def blit_image(img):
        # nearest-neighbor under the axis-preserving CTM — formulas in the
        # Scala order; transposed indices for quarter turns, reversed axes
        # for negative coefficients. Anything else (arbitrary rotation,
        # skew) inverse-maps each device pixel center in the transformed
        # corners' ceil/floor bbox back to the half-open [0,1)^2 unit
        # square and samples texel (floor(u*iw), floor((1-v)*ih)).
        iw, ih, irgb = img
        if not ((mb == 0.0 and mc == 0.0) or (ma == 0.0 and md == 0.0)):
            det = ma * md - mb * mc
            dxs = [x * s for x in (tx, ma + tx, mc + tx, ma + mc + tx)]
            dys = [HD - y * s for y in (ty, mb + ty, md + ty, mb + md + ty)]
            bx0 = max(clip[0], _math.floor(min(dxs)))
            bx1 = min(clip[2], _math.ceil(max(dxs)))
            by0 = max(clip[1], _math.floor(min(dys)))
            by1 = min(clip[3], _math.ceil(max(dys)))
            for y in range(by0, by1):
                uy = (HD - (y + 0.5)) / s
                for x in range(bx0, bx1):
                    if clip_mask is not None and not clip_mask[y * W + x]:
                        continue
                    ux = (x + 0.5) / s
                    rx, ry = ux - tx, uy - ty
                    u = (rx * md - ry * mc) / det
                    v = (ry * ma - rx * mb) / det
                    if 0.0 <= u < 1.0 and 0.0 <= v < 1.0:
                        scol = min(iw - 1, int(u * iw))
                        srow = min(ih - 1, int((1.0 - v) * ih))
                        so = (srow * iw + scol) * 3
                        o = (y * W + x) * 3
                        rgb[o:o + 3] = irgb[so:so + 3]
            return
        diag = mb == 0.0 and mc == 0.0
        xlo, xhi = tx + min(0.0, ma + mc), tx + max(0.0, ma + mc)
        ylo, yhi = ty + min(0.0, mb + md), ty + max(0.0, mb + md)
        bx0, bx1 = px(xlo), px(xhi)
        by0, by1 = H - px(yhi), H - px(ylo)
        assert bx1 > bx0 and by1 > by0, 'degenerate image box'
        box_w, box_h = float(bx1 - bx0), float(by1 - by0)
        kx = iw if diag else ih
        ky = ih if diag else iw
        for y in range(max(clip[1], by0), min(clip[3], by1)):
            iy = min(ky - 1, int((y - by0 + 0.5) * ky / box_h))
            for x in range(max(clip[0], bx0), min(clip[2], bx1)):
                if clip_mask is not None and not clip_mask[y * W + x]:
                    continue
                ix = min(kx - 1, int((x - bx0 + 0.5) * kx / box_w))
                if diag:
                    scol = ix if ma > 0 else iw - 1 - ix
                    srow = iy if md > 0 else ih - 1 - iy
                else:
                    scol = iw - 1 - iy if mb > 0 else iy
                    srow = ih - 1 - ix if mc > 0 else ix
                so = (srow * iw + scol) * 3
                o = (y * W + x) * 3
                rgb[o:o + 3] = irgb[so:so + 3]

    def _shade_pixel(x, y, t, c0, c1, expn):
        tn = 1.0
        for _ in range(expn):
            tn *= t
        o = (y * W + x) * 3
        rgb[o] = int(round((c0[0] + tn * (c1[0] - c0[0])) * 255))
        rgb[o + 1] = int(round((c0[1] + tn * (c1[1] - c0[1])) * 255))
        rgb[o + 2] = int(round((c0[2] + tn * (c1[2] - c0[2])) * 255))

    def paint_shading(sh):
        # gradient across the WHOLE clip region (box AND mask); t outside
        # [0,1] paints only where /Extend allows (clamped); color =
        # rint(255*(c0 + t^n*(c1-c0))) with t^n by repeated multiplication
        # — formulas in the Scala order. 9-tuple = axial (pixel centers
        # project onto the axis); 11-tuple = radial (largest circle-family
        # parameter whose circle passes through the pixel, r(v) >= 0 —
        # quadratic roots tried in descending order, linear fallback).
        if len(sh) == 9:
            x0, y0, x1, y1, c0, c1, expn, e0, e1 = sh
            dx, dy = x1 - x0, y1 - y0
            len2 = dx * dx + dy * dy
            for y in range(clip[1], clip[3]):
                uy = (HD - (y + 0.5)) / s - ty
                for x in range(clip[0], clip[2]):
                    if clip_mask is not None and not clip_mask[y * W + x]:
                        continue
                    ux = (x + 0.5) / s - tx
                    t_raw = ((ux - x0) * dx + (uy - y0) * dy) / len2
                    if (t_raw >= 0.0 or e0) and (t_raw <= 1.0 or e1):
                        t = 0.0 if t_raw < 0.0 else (1.0 if t_raw > 1.0 else t_raw)
                        _shade_pixel(x, y, t, c0, c1, expn)
            return
        x0, y0, r0, x1, y1, r1, c0, c1, expn, e0, e1 = sh
        dcx, dcy, dr = x1 - x0, y1 - y0, r1 - r0
        qa = dcx * dcx + dcy * dcy - dr * dr
        for y in range(clip[1], clip[3]):
            uy = (HD - (y + 0.5)) / s - ty
            for x in range(clip[0], clip[2]):
                if clip_mask is not None and not clip_mask[y * W + x]:
                    continue
                ux = (x + 0.5) / s - tx
                pcx, pcy = ux - x0, uy - y0
                qb = pcx * dcx + pcy * dcy + r0 * dr
                qc = pcx * pcx + pcy * pcy - r0 * r0
                cands = []
                if qa != 0.0:
                    disc = qb * qb - qa * qc
                    if disc >= 0.0:
                        sd = _math.sqrt(disc)
                        ra, rb = (qb + sd) / qa, (qb - sd) / qa
                        cands = [ra, rb] if ra >= rb else [rb, ra]
                elif qb != 0.0:
                    cands = [qc / (2.0 * qb)]
                for v in cands:
                    if (r0 + v * dr >= 0.0 and (v >= 0.0 or e0)
                            and (v <= 1.0 or e1)):
                        t = 0.0 if v < 0.0 else (1.0 if v > 1.0 else v)
                        _shade_pixel(x, y, t, c0, c1, expn)
                        break

    fill = (0, 0, 0)
    stroke = (0, 0, 0)
    line_w = 1.0
    tx = ty = 0.0
    ma, mb, mc, md = 1.0, 0.0, 0.0, 1.0
    trmode = 0
    clip = (0, 0, W, H)
    clip_mask = None  # bytearray(W*H) once a GENERAL clip path is active
    dash = ([], 0.0)  # user-space dash (array, phase) — graphics state
    pending_clip = False
    pending_clip_eo = False
    stack = []
    rects = []
    subs = []  # [pts:list[(x,y)], closed:bool] — mutated in place
    in_text = False
    lx = ly = leading = 0.0
    font_size = 0.0
    pen_px = 0
    pen_isc = 0  # glyph scale pen_px was accumulated at (0 = no run)
    cur_dec = None
    operands, arr, arr_done = [], None, None

    def color_byte(v):
        assert 0.0 <= v <= 1.0
        return int(round(v * 255))

    def dec(raw):
        if cur_dec is not None:
            return cur_dec(raw)
        if len(raw) >= 2 and raw[0] == '\xfe' and raw[1] == '\xff':
            return bytes(ord(c) for c in raw[2:]).decode('utf-16-be')
        return raw

    def iscale():
        assert font_size > 0
        return max(1, int(round(font_size * text_scale() * s / GLYPH_H)))

    def show(text):
        nonlocal pen_px, pen_isc
        assert in_text, 'text-show operator outside BT/ET'
        if text:
            isc = iscale()  # also enforces the diagonal-CTM text gate
            # a glyph-scale change mid-run has no placement model here --
            # mirrors PdfRaster's loud reject, never misplaces
            assert pen_px == 0 or pen_isc == isc, \
                'glyph scale changed mid-run between shows sharing a pen position'
            pen_isc = isc
            if trmode == 3:
                # invisible OCR-overlay text: no pixels, no glyph-coverage
                # requirement, pen still advances one cell per character
                pen_px += len(text) * (GLYPH_W + SPACING) * isc
            else:
                dx, dy = tp(lx, ly)
                top_px = H - px(dy) - GLYPH_H * isc
                pen_px += draw_cells(text, px(dx) + pen_px, top_px, isc, fill)

    def unit_scale(op):
        assert (ma, mb, mc, md) == (1.0, 0.0, 0.0, 1.0), \
            f"'{op}' under a non-identity cm"

    def unit_ctm():
        return (ma, mb, mc, md) == (1.0, 0.0, 0.0, 1.0)

    def tp(x, y):
        # full-CTM point map (user -> translated-user; device_ring applies
        # the dpi scale + y-flip) -- mirrors PdfRaster.tp; path geometry is
        # exact under any affine (flattening commutes, winding rules are
        # orientation-insensitive)
        return (ma * x + mc * y + tx, mb * x + md * y + ty)

    def stroke_scale():
        # similarity gate (a*c + b*d = 0, a^2+b^2 = c^2+d^2): a round pen
        # stays round, radius scaled by sqrt(a^2+b^2); shear/non-uniform
        # scale rejects -- mirrors PdfRaster.strokeAll
        assert ma * mc + mb * md == 0.0 and \
            ma * ma + mb * mb == mc * mc + md * md, \
            'stroke under a non-similarity cm'
        return _m.sqrt(ma * ma + mb * mb)

    def text_scale():
        # text accepts the positive-uniform-diagonal family only: the scale
        # folds into the effective font size -- mirrors PdfRaster.textScale
        assert mb == 0.0 and mc == 0.0 and ma == md and ma > 0.0, \
            'text under a non-uniform-diagonal cm'
        return ma

    def apply_clip_mask(rings, even_odd):
        # the W/W* per-pixel mask machinery, shared with the form-BBox clip
        # under a non-unit CTM -- mirrors PdfRaster.applyClipMask
        nonlocal clip, clip_mask
        bits = bytearray(W * H)
        prev = clip_mask
        nx0, ny0, nx1, ny1 = W, H, 0, 0
        for row, xa, xb in scan_spans(rings, even_odd):
            for x in range(xa, xb):
                if prev is None or prev[row * W + x]:
                    bits[row * W + x] = 1
                    nx0 = min(nx0, x)
                    nx1 = max(nx1, x + 1)
                    ny0 = min(ny0, row)
                    ny1 = max(ny1, row + 1)
        clip_mask = bits
        clip = (0, 0, 0, 0) if nx1 <= nx0 else (nx0, ny0, nx1, ny1)

    # one call per content stream: the page's, and recursively each form
    # XObject's (the Scala exec twin — shared graphics state + canvas,
    # per-stream parse/text/path state)
    form_depth = [0]

    def run_stream(content_r, fonts_r, images_r, gstates_r, shadings_r):
        nonlocal fill, stroke, line_w, tx, ty, ma, mb, mc, md, trmode, \
            clip, clip_mask, dash, pending_clip, pending_clip_eo, stack, \
            rects, subs, in_text, lx, ly, leading, font_size, pen_px, \
            cur_dec, operands, arr, arr_done
        for kind, val in _tokens(content_r):
            if kind == 'arr_open':
                assert arr is None
                # mirror PdfRaster: a second array before TJ/d consumed the
                # first would silently drop text — reject loudly
                assert arr_done is None, "unconsumed content-stream array before '['"
                arr = []
            elif kind == 'arr_close':
                arr_done, arr = arr, None
                operands.append(('arr', None))
            elif arr is not None:
                arr.append((kind, val))
            elif kind == 'op':
                assert not pending_clip or val == 'n', f"W followed by '{val}'"
                if val == 'q':
                    # text state (Tf size+font, TL leading) is PART of graphics
                    # state (PDF 8.4.2) — Q must restore it, mirroring PdfRaster
                    stack.append((fill, stroke, line_w, tx, ty, ma, mb, mc, md,
                                  trmode, clip, clip_mask, dash, font_size,
                                  leading, cur_dec))
                elif val == 'Q':
                    (fill, stroke, line_w, tx, ty, ma, mb, mc, md, trmode, clip,
                     clip_mask, dash, font_size, leading, cur_dec) = stack.pop()
                elif val == 'cm':
                    a, b, c, d = (operands[-6][1], operands[-5][1],
                                  operands[-4][1], operands[-3][1])
                    assert a * d - b * c != 0.0, \
                        f'singular cm (a={a} b={b} c={c} d={d}) has no pixel model'
                    e, f2 = operands[-2][1], operands[-1][1]
                    # premultiplied row-vector composition (Scala order)
                    ma, mb, mc, md, tx, ty = (
                        a * ma + b * mc, a * mb + b * md,
                        c * ma + d * mc, c * mb + d * md,
                        e * ma + f2 * mc + tx, e * mb + f2 * md + ty)
                elif val == 'Do':
                    assert operands[-1][0] == 'name'
                    xo = (images_r or {})[operands[-1][1]]
                    if isinstance(xo, dict):
                        # FORM XObject: implicit q/Q around the nested stream,
                        # /Matrix composed onto the CTM (translation-only after
                        # composition), /BBox clipped like `re W n`; per-stream
                        # parse/text/path state saved, reset, restored — mirrors
                        # PdfRaster's recursive exec with exec-local state
                        assert not in_text, 'form XObject Do inside BT/ET'
                        assert form_depth[0] < 8
                        saved_gs = (fill, stroke, line_w, tx, ty, ma, mb, mc, md,
                                    trmode, clip, clip_mask, font_size, leading,
                                    cur_dec)
                        saved_ps = (pending_clip, pending_clip_eo, stack, rects,
                                    subs, in_text, lx, ly, pen_px, operands, arr,
                                    arr_done)
                        a, b, c, d, e, f2 = xo['matrix']
                        ma, mb, mc, md, tx, ty = (
                            a * ma + b * mc, a * mb + b * md,
                            c * ma + d * mc, c * mb + d * md,
                            e * ma + f2 * mc + tx, e * mb + f2 * md + ty)
                        assert ma * md - mb * mc != 0.0, \
                            'form composes to a singular CTM'
                        fx0, fy0, fx1, fy1 = xo['bbox']
                        if unit_ctm():
                            clip = (max(clip[0], px(fx0 + tx)),
                                    max(clip[1], H - px(fy1 + ty)),
                                    min(clip[2], px(fx1 + tx)),
                                    min(clip[3], H - px(fy0 + ty)))
                        else:
                            # transformed /BBox is a parallelogram: clip by
                            # the same per-pixel mask machinery as W n
                            apply_clip_mask([device_ring(
                                [tp(fx0, fy0), tp(fx1, fy0),
                                 tp(fx1, fy1), tp(fx0, fy1)])], False)
                        pending_clip = pending_clip_eo = False
                        stack, rects, subs = [], [], []
                        in_text = False
                        lx = ly = 0.0
                        pen_px = 0
                        operands, arr, arr_done = [], None, None
                        form_depth[0] += 1
                        run_stream(xo['content'], xo.get('fonts', fonts_r),
                                   xo.get('xobjects', {}),
                                   xo.get('gstates', gstates_r),
                                   xo.get('shadings', shadings_r))
                        form_depth[0] -= 1
                        (fill, stroke, line_w, tx, ty, ma, mb, mc, md, trmode,
                         clip, clip_mask, font_size, leading, cur_dec) = saved_gs
                        (pending_clip, pending_clip_eo, stack, rects, subs,
                         in_text, lx, ly, pen_px, operands, arr,
                         arr_done) = saved_ps
                    else:
                        blit_image(xo)
                elif val == 'sh':
                    unit_scale('sh')
                    assert operands[-1][0] == 'name'
                    paint_shading((shadings_r or {})[operands[-1][1]])
                elif val == 'Tr':
                    trmode = int(operands[-1][1])
                    assert trmode in (0, 3), f'text render mode {trmode}'
                elif val == 'rg':
                    fill = (color_byte(operands[-3][1]), color_byte(operands[-2][1]),
                            color_byte(operands[-1][1]))
                elif val == 'g':
                    v = color_byte(operands[-1][1])
                    fill = (v, v, v)
                elif val == 'RG':
                    stroke = (color_byte(operands[-3][1]), color_byte(operands[-2][1]),
                              color_byte(operands[-1][1]))
                elif val == 'G':
                    v = color_byte(operands[-1][1])
                    stroke = (v, v, v)
                elif val in ('k', 'K'):
                    # DeviceCMYK via the PDF additive conversion (Scala order)
                    cc, mm, yy, kk = (operands[-4][1], operands[-3][1],
                                      operands[-2][1], operands[-1][1])
                    for v0 in (cc, mm, yy, kk):
                        assert 0.0 <= v0 <= 1.0
                    rgbv = (color_byte(1.0 - min(1.0, cc + kk)),
                            color_byte(1.0 - min(1.0, mm + kk)),
                            color_byte(1.0 - min(1.0, yy + kk)))
                    if val == 'k':
                        fill = rgbv
                    else:
                        stroke = rgbv
                elif val == 'w':
                    # 0 w is a legal hairline; validated at stroke time only
                    line_w = operands[-1][1]
                elif val == 'd':
                    assert arr_done is not None, 'd without a dash array'
                    dash_arr = [v for (k2, v) in arr_done]
                    assert all(k2 == 'num' for (k2, _) in arr_done)
                    arr_done = None
                    phase = operands[-1][1]
                    assert all(v >= 0.0 for v in dash_arr)
                    # round-6 ADVICE fix (mirrors PdfRaster): nonzero dash
                    # elements below a sane epsilon make no float progress
                    # in the phase/segment walkers -> reject loudly
                    assert all(v == 0.0 or v >= 1e-6 for v in dash_arr)
                    assert not dash_arr or sum(dash_arr) > 0.0
                    assert phase >= 0.0
                    dash = (dash_arr, phase)
                elif val == 're':
                    x, y, w2, h2 = (operands[-4][1], operands[-3][1],
                                    operands[-2][1], operands[-1][1])
                    assert w2 > 0 and h2 > 0
                    if unit_ctm():
                        rects.append((x + tx, y + ty, w2, h2))
                    else:
                        # a parallelogram under the CTM: joins the polygon
                        # subpaths (rint-box fast paths stay unit-scale-only)
                        subs.append(([tp(x, y), tp(x + w2, y),
                                      tp(x + w2, y + h2), tp(x, y + h2)], True))
                elif val == 'm':
                    subs.append(([tp(operands[-2][1], operands[-1][1])], False))
                elif val == 'l':
                    assert subs and not subs[-1][1], 'l without a current point'
                    subs[-1][0].append(tp(operands[-2][1], operands[-1][1]))
                elif val == 'c':
                    assert subs and not subs[-1][1], 'c without a current point'
                    append_cubic(subs[-1][0],
                                 *tp(operands[-6][1], operands[-5][1]),
                                 *tp(operands[-4][1], operands[-3][1]),
                                 *tp(operands[-2][1], operands[-1][1]))
                elif val == 'v':
                    assert subs and not subs[-1][1], 'v without a current point'
                    x0c, y0c = subs[-1][0][-1]
                    append_cubic(subs[-1][0], x0c, y0c,
                                 *tp(operands[-4][1], operands[-3][1]),
                                 *tp(operands[-2][1], operands[-1][1]))
                elif val == 'y':
                    assert subs and not subs[-1][1], 'y without a current point'
                    append_cubic(subs[-1][0],
                                 *tp(operands[-4][1], operands[-3][1]),
                                 *tp(operands[-2][1], operands[-1][1]),
                                 *tp(operands[-2][1], operands[-1][1]))
                elif val == 'h':
                    assert subs, 'h without a subpath'
                    subs[-1] = (subs[-1][0], True)
                elif val in ('f', 'F'):
                    # rect-only: rint box rule; mixed rect+polygon: one nonzero
                    # winding sum (opposite-wound rect in a polygon is a hole)
                    if not subs:
                        for (x, y, w2, h2) in rects:
                            fill_rect(x, y, w2, h2, fill)
                    else:
                        scan_fill([device_ring(p) for (p, _) in
                                   [rect_sub(r) for r in rects] + subs], False, fill)
                    rects, subs = [], []
                elif val == 'f*':
                    scan_fill([device_ring(p) for (p, _) in
                               [rect_sub(r) for r in rects] + subs], True, fill)
                    rects, subs = [], []
                elif val == 'S':
                    k2 = stroke_scale() * s  # pen + dash scale by sqrt(a^2+b^2)
                    stroke_subs([rect_sub(r) for r in rects] + subs, line_w * k2, stroke,
                                [v * k2 for v in dash[0]], dash[1] * k2)
                    rects, subs = [], []
                elif val == 's':
                    k2 = stroke_scale() * s
                    assert subs, 's without a subpath'
                    subs[-1] = (subs[-1][0], True)
                    stroke_subs([rect_sub(r) for r in rects] + subs, line_w * k2, stroke,
                                [v * k2 for v in dash[0]], dash[1] * k2)
                    rects, subs = [], []
                elif val in ('B', 'B*', 'b', 'b*'):
                    # fill-then-stroke family (Scala order): B nonzero,
                    # B* even-odd; b variants close the subpath first
                    k2 = stroke_scale() * s
                    if val in ('b', 'b*'):
                        assert rects or subs, f'{val} without a current path'
                        if subs:
                            subs[-1] = (subs[-1][0], True)
                    eo = val in ('B*', 'b*')
                    if not subs and not eo:
                        for (x, y, w2, h2) in rects:
                            fill_rect(x, y, w2, h2, fill)
                    else:
                        scan_fill([device_ring(p) for (p, _) in
                                   [rect_sub(r) for r in rects] + subs], eo, fill)
                    stroke_subs([rect_sub(r) for r in rects] + subs, line_w * k2, stroke,
                                [v * k2 for v in dash[0]], dash[1] * k2)
                    rects, subs = [], []
                elif val in ('W', 'W*'):
                    assert rects or subs, f'{val} with no current path to clip by'
                    pending_clip = True
                    pending_clip_eo = val == 'W*'
                elif val == 'n':
                    if pending_clip:
                        if not pending_clip_eo and not subs and len(rects) == 1:
                            # the digest-stable single-rect `re W n` idiom
                            x, y, w2, h2 = rects[0]
                            clip = (max(clip[0], px(x)), max(clip[1], H - px(y + h2)),
                                    min(clip[2], px(x + w2)), min(clip[3], H - px(y)))
                        else:
                            # GENERAL clip path: rasterize the region into a
                            # per-pixel mask under the SAME scanline rules as
                            # fills (spans already box-clamped), AND'd with the
                            # mask in force; the clip box tightens to the set
                            # bounding box (empty region -> empty box)
                            apply_clip_mask([device_ring(p) for (p, _) in
                                             [rect_sub(r) for r in rects] + subs],
                                            pending_clip_eo)
                        pending_clip = False
                    rects, subs = [], []
                elif val == 'BT':
                    in_text = True
                    lx = ly = 0.0
                    pen_px = 0
                elif val == 'ET':
                    in_text = False
                elif val == 'Tf':
                    assert operands[-2][0] == 'name'
                    cur_dec = (fonts_r or {}).get(operands[-2][1])
                    font_size = operands[-1][1]
                    assert font_size > 0
                elif val == 'Td':
                    lx += operands[-2][1]; ly += operands[-1][1]
                    pen_px = 0
                elif val == 'TD':
                    leading = -operands[-1][1]
                    lx += operands[-2][1]; ly += operands[-1][1]
                    pen_px = 0
                elif val == 'Tm':
                    a, b, c, d = (operands[-6][1], operands[-5][1],
                                  operands[-4][1], operands[-3][1])
                    assert b == 0.0 and c == 0.0 and a == 1.0 and d == 1.0
                    lx, ly = operands[-2][1], operands[-1][1]
                    pen_px = 0
                elif val == 'T*':
                    ly -= leading
                    pen_px = 0
                elif val == 'TL':
                    leading = operands[-1][1]
                elif val in ('Tj', "'", '"'):
                    if val in ("'", '"'):
                        ly -= leading
                        pen_px = 0
                    show(dec(operands[-1][1]))
                elif val == 'TJ':
                    buf = []
                    for k, v in arr_done:
                        if k == 'str':
                            buf.append(dec(v))
                        elif k == 'num' and v <= KERN_SPACE:
                            buf.append(' ')
                    arr_done = None
                    show(''.join(buf))
                elif val == 'gs':
                    # value: (lw_or_None, solid_d) — solid /D resets any
                    # active inline dash, mirroring PdfRaster
                    name = operands[-1][1]
                    assert name in gstates_r, f'gs of unknown ExtGState /{name}'
                    lw_v, solid_d = gstates_r[name]
                    if lw_v is not None:
                        line_w = lw_v
                    if solid_d:
                        dash = ([], 0.0)
                elif val in IGNORED:
                    pass
                else:
                    raise AssertionError(f"operator '{val}' outside the raster subset")
                operands = []
            else:
                operands.append((kind, val))
        assert arr is None and not rects and not subs

    run_stream(content, fonts, images, gstates, shadings)
    return W, H, bytes(rgb)


MIN_GAP_X, MIN_GAP_Y, STRAIGHT_RUN = 24, 16, 3


def _ink_of(W, H, rgb):
    ink = bytearray(W * H)
    for i in range(W * H):
        o = i * 3
        if (299 * rgb[o] + 587 * rgb[o + 1] + 114 * rgb[o + 2]) // 1000 < 128:
            ink[i] = 1
    return ink


def _row_has(ink, W, b, y):
    x0, y0, x1, y1 = b
    base = y * W
    return any(ink[base + x] for x in range(x0, x1))


def _col_has(ink, W, b, x):
    x0, y0, x1, y1 = b
    return any(ink[y * W + x] for y in range(y0, y1))


def _trim(ink, W, b):
    x0, y0, x1, y1 = b
    while y0 < y1 and not _row_has(ink, W, b, y0):
        y0 += 1
    if y0 == y1:
        return None
    while not _row_has(ink, W, b, y1 - 1):
        y1 -= 1
    vb = (x0, y0, x1, y1)
    while not _col_has(ink, W, vb, x0):
        x0 += 1
    while not _col_has(ink, W, vb, x1 - 1):
        x1 -= 1
    return (x0, y0, x1, y1)


def _largest_gap(blank, lo, hi):
    best = (0, 0)
    i = lo
    while i < hi:
        if blank(i):
            start = i
            while i < hi and blank(i):
                i += 1
            if i - start > best[1] - best[0]:
                best = (start, i)
        else:
            i += 1
    return best


def _xycut(ink, W, region):
    b = _trim(ink, W, region)
    if b is None:
        return []
    x0, y0, x1, y1 = b
    ry0, ry1 = _largest_gap(lambda y: not _row_has(ink, W, b, y), y0, y1)
    cx0, cx1 = _largest_gap(lambda x: not _col_has(ink, W, b, x), x0, x1)
    row_gap = ry1 - ry0 if ry1 - ry0 >= MIN_GAP_Y else 0
    col_gap = cx1 - cx0 if cx1 - cx0 >= MIN_GAP_X else 0
    if row_gap == 0 and col_gap == 0:
        return [b]
    # A valid row cut beats a wider column cut whose two sides are
    # vertically DISJOINT: left-before-right is only reading order for
    # sides that vertically interleave; and when NO valid row cut exists,
    # a column cut whose RIGHT side lies entirely above its left side
    # emits the upper (right) side first (mirrors PageSegment.xyCut).
    lt = rt = None
    if col_gap > 0:
        lt = _trim(ink, W, (x0, y0, cx0, y1))
        rt = _trim(ink, W, (cx1, y0, x1, y1))
    use_row = row_gap >= col_gap
    if not use_row and row_gap > 0:
        if lt is None or rt is None or lt[3] <= rt[1] or rt[3] <= lt[1]:
            use_row = True
    if use_row:
        return _xycut(ink, W, (x0, y0, x1, ry0)) + _xycut(ink, W, (x0, ry1, x1, y1))
    left = _xycut(ink, W, (x0, y0, cx0, y1))
    right = _xycut(ink, W, (cx1, y0, x1, y1))
    if lt is not None and rt is not None and rt[3] <= lt[1]:
        return right + left
    return left + right


def _line_boxes(ink, W, b):
    x0b, y0b, x1b, y1b = b
    out = []
    y = y0b
    while y < y1b:
        if _row_has(ink, W, b, y):
            start = y
            while y < y1b and _row_has(ink, W, b, y):
                y += 1
            band = (x0b, start, x1b, y)
            x0, x1 = x0b, x1b
            while not _col_has(ink, W, band, x0):
                x0 += 1
            while not _col_has(ink, W, band, x1 - 1):
                x1 -= 1
            out.append((x0, start, x1, y))
        else:
            y += 1
    return out


def segment(W, H, rgb):
    """Independent twin of graft.layout.PageSegment: ink by integer luma,
    recursive XY-cut (largest eligible gap, tie prefers the row cut, a
    valid row cut beats a column cut with vertically-disjoint sides, DFS
    reading order), per-block projection-profile line count, 8-connected
    components (BFS flood fill vs Scala's union-find), and stroke-run
    regularity."""
    ink = _ink_of(W, H, rgb)

    def line_count(b):
        return len(_line_boxes(ink, W, b))

    def comp_count(b):
        x0, y0, x1, y1 = b
        seen = set()
        n = 0
        for y in range(y0, y1):
            for x in range(x0, x1):
                if ink[y * W + x] and (x, y) not in seen:
                    n += 1
                    stack = [(x, y)]
                    seen.add((x, y))
                    while stack:
                        cx, cy = stack.pop()
                        for dy in (-1, 0, 1):
                            for dx in (-1, 0, 1):
                                nx, ny = cx + dx, cy + dy
                                if (x0 <= nx < x1 and y0 <= ny < y1
                                        and ink[ny * W + nx]
                                        and (nx, ny) not in seen):
                                    seen.add((nx, ny))
                                    stack.append((nx, ny))
        return n

    def stroke_stats(b):
        x0, y0, x1, y1 = b
        ink_n = 0
        straight = set()
        for y in range(y0, y1):
            x = x0
            while x < x1:
                if ink[y * W + x]:
                    ink_n += 1
                    e = x
                    while e < x1 and ink[y * W + e]:
                        e += 1
                    # count the rest of the run's ink now, advance past it
                    ink_n += e - x - 1
                    if e - x >= STRAIGHT_RUN:
                        straight.update((k, y) for k in range(x, e))
                    x = e
                else:
                    x += 1
        for x in range(x0, x1):
            y = y0
            while y < y1:
                if ink[y * W + x]:
                    e = y
                    while e < y1 and ink[e * W + x]:
                        e += 1
                    if e - y >= STRAIGHT_RUN:
                        straight.update((x, k) for k in range(y, e))
                    y = e
                else:
                    y += 1
        return ink_n, len(straight)

    rows = []
    for i, b in enumerate(_xycut(ink, W, (0, 0, W, H))):
        ink_n, straight_n = stroke_stats(b)
        rows.append((i, b[0], b[1], b[2], b[3], line_count(b), comp_count(b),
                     ink_n, straight_n,
                     'printed' if 2 * straight_n >= ink_n else 'handwritten'))
    return rows


def _recognize_line(ink, W, line):
    """Twin of graft.layout.GlyphOcr.recognizeLine: phase search with the
    pixel-exact re-render acceptance test."""
    inv = {tuple(v): k for k, v in FONT.items()}
    x0, y0, x1, y1 = line
    h = y1 - y0
    # exact pre-gate (mirrors GlyphOcr): accepted phases re-render as
    # disjoint isc x isc blocks, so ink % isc**2 == 0 is necessary
    ink_count = sum(1 for y in range(y0, y1) for x in range(x0, x1)
                    if ink[y * W + x])
    # candidate scales (mirrors GlyphOcr): h is exactly isc*k for the
    # k in [1, GLYPH_H] bit-rows the ink spans, so every divisor of h
    # down to h/GLYPH_H is legal — short-glyph-only lines span k < GLYPH_H
    lo = max(1, (h + GLYPH_H - 1) // GLYPH_H)
    cands = [d for d in range(lo, h + 1)
             if h % d == 0 and ink_count % (d * d) == 0]
    for isc in cands:
        cellw = (GLYPH_W + SPACING) * isc
        for q in range(GLYPH_H * isc):
            grid_top = y0 - q
            for p in range(cellw):
                grid_left = x0 - p
                n_cells = (x1 - grid_left + cellw - 1) // cellw
                chars = []
                lit = []
                bad = False
                for c in range(n_cells):
                    cx = grid_left + c * cellw
                    pat = [0] * GLYPH_H
                    for r in range(GLYPH_H):
                        for g in range(GLYPH_W):
                            x = cx + g * isc
                            y = grid_top + r * isc
                            if x0 <= x < x1 and y0 <= y < y1 and ink[y * W + x]:
                                pat[r] |= 1 << (GLYPH_W - 1 - g)
                                lit.append((x, y))
                    if all(v == 0 for v in pat):
                        chars.append(' ')
                    else:
                        ch = inv.get(tuple(pat))
                        if ch is None:
                            bad = True
                            break
                        chars.append(ch)
                if bad:
                    continue
                text = ''.join(chars)
                if not text.strip():
                    continue
                rendered = set()
                for (bx, by) in lit:
                    for dy in range(isc):
                        for dx in range(isc):
                            rendered.add((bx + dx, by + dy))
                ok = all((x0 <= x < x1 and y0 <= y < y1) for (x, y) in rendered)
                if ok:
                    for y in range(y0, y1):
                        for x in range(x0, x1):
                            if bool(ink[y * W + x]) != ((x, y) in rendered):
                                ok = False
                                break
                        if not ok:
                            break
                if ok:
                    return text.strip(), isc
    return None


def ocr_rows(W, H, rgb):
    """Twin of graft.layout.GlyphOcr.recognizePage."""
    ink = _ink_of(W, H, rgb)
    rows = []
    for bi, blk in enumerate(_xycut(ink, W, (0, 0, W, H))):
        for li, ln in enumerate(_line_boxes(ink, W, blk)):
            got = _recognize_line(ink, W, ln)
            if got is None:
                rows.append((bi, li, ln[0], ln[1], ln[2], ln[3], -1,
                             'unrecognized', ''))
            else:
                rows.append((bi, li, ln[0], ln[1], ln[2], ln[3], got[1],
                             'text', got[0]))
    return rows


def main():
    import os
    os.makedirs(OUTDIR, exist_ok=True)
    dpi = 144
    cmap = (
        "1 begincodespacerange\n<00> <7F>\nendcodespacerange\n"
        "2 beginbfchar\n<41> <0048>\n<42> <0045>\nendbfchar\n")  # A->H, B->E
    # page 1: rectangle scene — overlap order, q/Q color restore, translated
    # frame, multi-rect path, gray fill, constructed-but-unpainted path via n
    p1 = (
        "1 0 0 rg 10 10 60 30 re f "
        "0 0.5 0 rg 40 25 90 50 re f "
        "q 0.25 0.25 0.8 rg 1 0 0 1 120 40 cm 0 0 30 30 re f Q "
        "0 0 0 rg 5 100 12 8 re 180 100 15 10 re f "
        "0.5 g 60 5 20 6 re f "
        "150 5 10 5 re n")
    # page 2: text scene — sizes/iscale, colors, Tm/TL/T*, TJ kern, pen
    # advance over consecutive Tj, lowercase upcasing, CMap font codes
    p2 = (
        "0 0 0 rg BT /F1 12 Tf 10 90 Td (HELLO 42!) Tj ET "
        "1 0 0 rg BT /F1 8 Tf 1 0 0 1 10 60 Tm 12 TL (RED: A-B.) Tj T* (NEXT, LINE) Tj ET "
        "0 0 0.8 rg BT /F1 10 Tf 10 20 Td [ (AB) -250 (CD) ] TJ ET "
        "0 g BT /F1 6 Tf 120 90 Td (small) Tj (more) Tj ET "
        "0 0 0 rg BT /F2 10 Tf 120 20 Td <4142> Tj ET")
    pages = [(p1, 200.0, 120.0, False), (p2, 200.0, 120.0, True)]

    # raster_01.pdf: a DOCUMENT page for the segmentation operator — title,
    # two text columns, a jittered "handwritten" scrawl band (320 one-pixel
    # rects, deterministic jitter), and a footer. Block gaps ≥ the XY-cut
    # thresholds; line gaps (10 px at size 8 / TL 12) below them.
    lines_l = ['THE QUICK BROWN', 'FOX JUMPS OVER', 'THE LAZY DOG AT',
               'DAWN WHILE ALL', 'THE TOWN SLEEPS', 'QUIET AND STILL',
               'A COLD WIND CUT', 'THROUGH THE OAK', 'LEAVES OUTSIDE',
               'THE OLD LIBRARY']
    lines_r = ['COLUMN TWO HOLDS', 'THE LEDGER NOTES', 'FROM MARCH 1925:',
               'GRAIN 14 SACKS,', 'WOOL 9 BALES AND', 'TALLOW 3 CASKS.',
               'PRICES HELD FIRM', 'DESPITE THE RAIN', 'ON MARKET DAY IN',
               'THE OLD SQUARE.']
    hand = ' '.join(
        f"{60 + j * 3 + k * 0.5:g} {130 + ((j * 7 + k * k * 3) % 9) * 0.5:g} 0.5 0.5 re"
        for j in range(40) for k in range(8)) + ' f '
    p3 = ("0 0 0 rg BT /F1 12 Tf 40 460 Td (ANNUAL REPORT 1925) Tj ET "
          + "BT /F1 8 Tf 40 420 Td 12 TL "
          + ' '.join(f"({l}) Tj T*" for l in lines_l) + " ET "
          + "BT /F1 8 Tf 220 420 Td 12 TL "
          + ' '.join(f"({l}) Tj T*" for l in lines_r) + " ET "
          + hand
          + "BT /F1 8 Tf 40 40 Td (PAGE 1 OF 1) Tj ET")
    pages1 = [(p3, 400.0, 500.0, True)]

    # raster_02.pdf: the round-5 path/curve/stroke extension. Page 1 is the
    # fill differential — triangle, the SAME self-intersecting star painted
    # nonzero (solid) and even-odd (pentagon hole), a winding donut (outer
    # CCW + inner CW subpath), a cubic blob, and a v/y-op shape. Page 2 is
    # the stroke scene — zigzag polyline, close-and-stroke triangle, thick
    # diagonal, curve stroke, fill+stroke pentagon via B, stroked rect,
    # explicit solid dash "[] 0 d", plus a caption line for the OCR leg.
    star = ('{sx} {sy} m {p2x} {p2y} l {p4x} {p4y} l {p1x} {p1y} l '
            '{p3x} {p3y} l h').format(
        sx=0.0, sy=30.0, p2x=-17.63, p2y=-24.27, p4x=28.53, p4y=9.27,
        p1x=-28.53, p1y=9.27, p3x=17.63, p3y=-24.27)
    p4 = (
        "1 0 0 rg 10 10 m 70 10 l 40 60 l h f "
        f"0 0 0 rg q 1 0 0 1 120 40 cm {star} f Q "
        f"0.3 0.3 0.3 rg q 1 0 0 1 60 110 cm {star} f* Q "
        "0 0.5 0 rg 150 90 m 210 90 l 210 150 l 150 150 l h "
        "165 105 m 165 135 l 195 135 l 195 105 l h f "
        "0 0 0.8 rg 20 90 m 20 130 70 130 70 90 c h f "
        "0.6 0 0.6 rg 120 5 m 140 45 160 5 y 150 0 130 0 v h f")
    p5 = (
        "0 0 0 RG 2 w 10 10 m 50 40 l 90 10 l 130 40 l S "
        "1 0 0 RG 3 w 10 60 m 60 60 l 35 100 l s "
        "0 0 1 RG 6 w 100 60 m 160 120 l S "
        "0 0.5 0 RG 2 w 100 10 m 120 50 160 50 180 10 c S "
        "0.9 0.9 0 rg 0 0 0 RG 2 w 170 60 m 210 75 l 205 115 l 175 120 l 155 90 l h B "
        "0.5 G 1 w 10 130 40 20 re S "
        "[] 0 d 0 G 1 w 60 140 m 90 140 l S "
        "0 0 0 rg BT /F1 8 Tf 100 135 Td (VECTOR PAGE) Tj ET")
    pages2 = [(p4, 220.0, 160.0, True), (p5, 220.0, 160.0, False)]

    # raster_03.pdf: the scanned+OCR'd historical-page class — a Flate
    # DeviceRGB image XObject (deterministic "parchment + ink lines" scan,
    # 80×100 px) composited by `q 180 0 0 225 10 27 cm /Im0 Do Q`
    # (nearest-neighbor 4.5× upsample), a stroked border OVER the image
    # (compositing order), an INVISIBLE Tr 3 OCR text layer whose characters
    # are deliberately outside the glyph font (recognizer output rides along
    # without pixel effect), and a visible Tr 0 caption below.
    def scan_pixels(iw, ih):
        out = bytearray()
        for y in range(ih):
            for x in range(iw):
                if y % 10 in (3, 4) and 8 <= x < iw - 8 and (x // 6) % 4 != 3:
                    out += bytes((40 + (x * 7) % 30, 30 + (y * 5) % 25, 35))
                else:
                    v = 205 + ((x * 13 + y * 7) % 40)
                    out += bytes((v, v - 6, v - 25))
        return bytes(out)
    images3 = {'Im0': (80, 100, scan_pixels(80, 100))}
    p6 = (
        "q 180 0 0 225 10 27 cm /Im0 Do Q "
        "0 0 0 RG 2 w 10 27 180 225 re S "
        "BT 3 Tr /F1 9 Tf 20 200 Td (first ocr line; with #odd chars?) Tj "
        "0 -24 TD (second @line~ under it) Tj "
        "[ (mixed|seg) -250 (tail{brace}) ] TJ ET "
        "BT 0 Tr /F1 8 Tf 24 7 Td (SCAN 3 OF 9) Tj ET")
    pages3 = [(p6, 200.0, 260.0, True)]

    # raster_04.pdf: the clip scenes — `re W n` rectangle clips over every
    # painter class: a polygon fill crossing the clip boundary, a clipped
    # checkerboard image blit, a clipped thick stroke, glyphs sliced by the
    # clip edge, NESTED clips (intersection), and an unclipped fill after Q
    # proving the restore.
    def checker(iw, ih):
        out = bytearray()
        for y in range(ih):
            for x in range(iw):
                out += bytes((60, 40, 40) if (x // 4 + y // 4) % 2 == 0
                             else (220, 210, 190))
        return bytes(out)
    images4 = {'Px': (16, 16, checker(16, 16))}
    p7 = (
        "q 20 60 60 50 re W n 1 0 0 rg 10 50 m 90 50 l 90 130 l 10 130 l h f Q "
        "q 120 70 50 40 re W n q 32 0 0 32 110 60 cm /Px Do Q Q "
        "q 20 20 70 25 re W n 0 0 0.8 RG 4 w 0 20 m 100 45 l S Q "
        "q 100 15 40 14 re W n 0 0 0 rg BT /F1 10 Tf 96 18 Td (CLIP EDGE) Tj ET Q "
        "q 30 95 40 30 re W n 45 100 20 20 re W n 0 0.5 0 rg 0 0 200 140 re f Q "
        "0.6 0.6 0.6 rg 180 5 15 10 re f")
    pages4 = [(p7, 200.0, 140.0, True)]

    # raster_05.pdf: rotated/mirrored scan placements — the landscape and
    # flipped pages of a historical archive. The SAME 80×100 scan image is
    # composited at 90° CCW (anti-diagonal cm, b>0 c<0), 180° (negative
    # diagonal), 270° (anti-diagonal, b<0 c>0), and vertically mirrored
    # (a>0 d<0), plus a caption. Each placement exercises one orientation
    # branch of the index-mapped blit.
    images5 = {'Im0': (80, 100, scan_pixels(80, 100))}
    p8 = (
        "q 0 80 -100 0 110 20 cm /Im0 Do Q "
        "q -80 0 0 -100 280 140 cm /Im0 Do Q "
        "q 0 -80 100 0 120 230 cm /Im0 Do Q "
        "q 80 0 0 -100 10 230 cm /Im0 Do Q "
        "0 0 0 rg BT /F1 8 Tf 150 4 Td (ROTATED SCANS) Tj ET")
    pages5 = [(p8, 300.0, 240.0, True)]

    # raster_06.pdf: the winding-interplay page — nonzero `f` over a MIXED
    # rect+polygon path (outer polygon wound CW, `re` rect CCW inside →
    # the winding sum cancels and the rect is a HOLE, the donut a conforming
    # renderer paints; painting the rect separately was the pre-round-5-fix
    # bug), the same interplay under `B` (fill hole + stroke both outlines),
    # and a fill-only `0 w` (legal hairline set, never stroked — must render,
    # not throw).
    p9 = (
        "0 w "
        "0.5 0 0 rg 20 20 m 20 120 l 140 120 l 140 20 l h "
        "50 50 40 40 re f "
        "0.9 0.9 0 rg 0 0 0 RG 2 w "
        "160 30 m 160 110 l 190 110 l 190 30 l h 168 45 15 20 re B")
    pages6 = [(p9, 200.0, 150.0, False)]

    # raster_07.pdf: the dominance-across-a-gutter page — an upper-RIGHT
    # text block and a lower-LEFT text block whose ink row gap (12 px at
    # dpi 144) is BELOW MIN_GAP_Y, so no valid row cut exists and the
    # column cut (30 px gutter) must emit the upper (right) side first: a
    # left-first column cut would read the page bottom-up (the round-5
    # review finding in PageSegment.xyCut).
    p10 = (
        "0 0 0 rg BT /F1 8 Tf 120 100 Td 12 TL (UPPER RIGHT NOTE) Tj T* "
        "(READS FIRST HERE) Tj ET "
        "BT /F1 8 Tf 10 75 Td 12 TL (LOWER LEFT BLOCK) Tj T* "
        "(READS SECOND NOW) Tj ET")
    pages7 = [(p10, 200.0, 120.0, True)]

    # raster_08.pdf: GENERAL clip paths — the round-5 mask extension. A
    # triangle polygon clip over a full-page fill, the self-intersecting
    # star as an EVEN-ODD (W*) clip whose pentagon hole stays white, a
    # multi-rect single-path clip, a NESTED rect-box-then-polygon clip
    # (box AND mask intersect), a checkerboard image blit through a
    # triangle clip, glyphs sliced by a slanted clip edge, a thick stroke
    # through an even-odd band clip, an entirely off-canvas clip region
    # (empty mask — paints nothing, must not throw), and an unclipped
    # marker after Q proving the mask restores.
    images8 = {'Px': (16, 16, checker(16, 16))}
    p11 = (
        "q 10 90 m 70 90 l 40 140 l h W n 0.8 0 0 rg 0 0 200 150 re f Q "
        f"q 1 0 0 1 120 110 cm {star} W* n 0 0 0.8 rg -40 -40 80 80 re f Q "
        "q 10 10 30 20 re 50 10 30 20 re W n 0 0.5 0 rg 0 0 200 150 re f Q "
        "q 100 10 60 40 re W n 90 15 m 170 15 l 130 60 l h W n "
        "0 0 0 rg 0 0 200 150 re f Q "
        "q 20 40 m 80 40 l 50 85 l h W n q 64 0 0 48 15 38 cm /Px Do Q Q "
        "q 95 95 m 195 95 l 195 115 l 95 108 l h W n "
        "0 0 0 rg BT /F1 10 Tf 96 96 Td (CLIP POLY) Tj ET Q "
        "q 100 60 m 190 60 l 190 80 l 100 80 l h W* n "
        "0 0 1 RG 6 w 95 50 m 200 90 l S Q "
        "q 300 300 m 320 300 l 310 320 l h W n 1 0 0 rg 0 0 200 150 re f Q "
        "0.3 0.3 0.3 rg 180 140 10 6 re f")
    pages8 = [(p11, 200.0, 150.0, True)]

    # raster_09.pdf: ARBITRARY-ANGLE image placements — the deskew-scanned
    # class a real archive produces (pages photographed slightly rotated).
    # The SAME 80×100 scan is composited at 30° (rotation+scale cm), at
    # −12° (a small skew-correction angle), through a rect clip at 45°
    # (clip ∩ rotated footprint), and once SHEARED (a≠0,b≠0,c≠0,d≠0 with
    # no rotation structure) — each exercises the inverse-mapped blit;
    # the caption and border stay on the identity CTM.
    images9 = {'Im0': (80, 100, scan_pixels(80, 100))}
    cos30, sin30 = _m.cos(_m.radians(30.0)), _m.sin(_m.radians(30.0))
    cosm12, sinm12 = _m.cos(_m.radians(-12.0)), _m.sin(_m.radians(-12.0))
    cos45, sin45 = _m.cos(_m.radians(45.0)), _m.sin(_m.radians(45.0))
    r30 = (f"q {96 * cos30} {96 * sin30} {-120 * sin30} {120 * cos30} "
           "30 10 cm /Im0 Do Q ")
    rm12 = (f"q {80 * cosm12} {80 * sinm12} {-100 * sinm12} {100 * cosm12} "
            "170 40 cm /Im0 Do Q ")
    r45clip = ("q 290 60 50 80 re W n "
               f"q {90 * cos45} {90 * sin45} {-110 * sin45} {110 * cos45} "
               "290 30 cm /Im0 Do Q Q ")
    shear = "q 70 18 -25 95 30 170 cm /Im0 Do Q "
    p12 = (r30 + rm12 + r45clip + shear +
           "0 0 0 RG 1 w 5 5 390 270 re S "
           "0 0 0 rg BT /F1 8 Tf 150 274 Td (DESKEW SCANS) Tj ET")
    pages9 = [(p12, 400.0, 290.0, True)]

    # raster_10.pdf: AXIAL SHADING — the gradient class born-digital covers
    # and figures use. A full-width horizontal black→white ramp clipped to
    # a band (extend both: the ramp clamps flat past the axis ends), a
    # red→blue DIAGONAL axis through a triangle clip (clip ∩ gradient), a
    # NON-extended narrow axis inside a wide clip (pixels past either end
    # stay untouched — the white witness), a quadratic-falloff (N=2) gray
    # ramp, and glyphs + a stroked frame on top proving paint order.
    shadings10 = {
        'Sh0': (20.0, 0.0, 180.0, 0.0, (0.0, 0.0, 0.0), (1.0, 1.0, 1.0),
                1, True, True),
        'Sh1': (60.0, 60.0, 140.0, 120.0, (0.9, 0.1, 0.1), (0.1, 0.1, 0.9),
                1, True, True),
        'Sh2': (80.0, 0.0, 120.0, 0.0, (0.0, 0.4, 0.0), (0.9, 0.9, 0.2),
                1, False, False),
        'Sh3': (0.0, 10.0, 0.0, 50.0, (1.0, 1.0, 1.0), (0.2, 0.2, 0.2),
                2, True, True)}
    p13 = (
        "q 10 130 180 25 re W n /Sh0 sh Q "
        "q 60 55 m 140 55 l 100 125 l h W n /Sh1 sh Q "
        "q 20 15 160 30 re W n /Sh2 sh Q "
        "q 5 165 40 40 re W n /Sh3 sh Q "
        "0 0 0 RG 1 w 5 5 190 200 re S "
        "0 0 0 rg BT /F1 7 Tf 60 182 Td (GRADIENT PAGE) Tj ET")
    pages10 = [(p13, 200.0, 215.0, True)]

    # raster_12.pdf: RADIAL shading — the vignette/sphere class. A point-
    # to-circle "ball" (r0=0, extend both: inside stays C0, outside the
    # outer circle clamps C1), a NON-extended annulus (r0>0 ring — pixels
    # inside circle 0 and outside circle 1 stay untouched: white
    # witnesses), an offset-center "cone" through a rect clip, and an N=2
    # falloff ball; frame + caption on top.
    shadings12 = {
        'Rb': (50.0, 150.0, 0.0, 50.0, 150.0, 40.0,
               (0.1, 0.1, 0.1), (0.95, 0.95, 0.95), 1, True, True),
        'Ra': (140.0, 150.0, 12.0, 140.0, 150.0, 40.0,
               (0.9, 0.2, 0.1), (0.1, 0.2, 0.9), 1, False, False),
        'Rc': (60.0, 50.0, 5.0, 90.0, 50.0, 35.0,
               (0.0, 0.5, 0.0), (0.9, 0.9, 0.2), 1, True, True),
        'Rq': (160.0, 50.0, 0.0, 160.0, 50.0, 30.0,
               (1.0, 1.0, 1.0), (0.1, 0.1, 0.4), 2, True, True)}
    p15 = (
        "q 5 105 90 90 re W n /Rb sh Q "
        "q 95 105 95 90 re W n /Ra sh Q "
        "q 20 15 100 70 re W n /Rc sh Q "
        "q 125 15 70 70 re W n /Rq sh Q "
        # DeviceCMYK swatch strip (k fills) + a K stroke: additive-
        # conversion leg — process cyan-tinted, pure magenta+yellow (red),
        # rich black, and a half-black cyan stroke
        "0.6 0 0.3 0.1 k 10 88 30 14 re f "
        "0 1 1 0 k 50 88 30 14 re f "
        "0 0 0 1 k 90 88 30 14 re f "
        "1 0 0 0.5 K 3 w 130 90 m 190 100 l S "
        "0 0 0 RG 1 w 2 2 196 206 re S "
        "0 0 0 rg BT /F1 6 Tf 70 3 Td (RADIAL PAGE) Tj ET")
    pages12 = [(p15, 200.0, 215.0, True)]

    # raster_13.pdf: DASH PATTERNS — table rules and borders. A horizontal
    # [6 4] dashed rule, the same rule phase-shifted by 5 (gaps and dashes
    # swap position), a [2 2] dotted diagonal, a dashed RECTANGLE via
    # `re S` (the walker crosses 4 segment boundaries), a dash crossing a
    # polyline vertex mid-element (continuity across segments), a closed
    # dashed triangle via `s`, a [4] single-element pattern (equal on/off),
    # and a solid control line under `[] 0 d`.
    p16 = (
        "0 0 0 RG 2 w [6 4] 0 d 10 150 m 190 150 l S "
        "1 0 0 RG 2 w [6 4] 5 d 10 140 m 190 140 l S "
        "0 0 1 RG 2 w [2 2] 0 d 10 10 m 120 120 l S "
        "0 0.5 0 RG 2 w [5 3] 0 d 130 60 60 60 re S "
        "0.5 0 0.5 RG 3 w [9 3] 0 d 10 60 m 60 60 l 60 110 l S "
        "0 0 0 RG 2 w [7 4] 2 d 140 10 m 180 10 l 160 45 l s "
        "0.9 0.5 0 RG 2 w [4] 0 d 10 170 m 190 170 l S "
        # odd-length array with phase > sum: the on/off cycle is TWO passes
        # (on4/off4, period 8), so phase 6 starts 2 units into the OFF leg
        "0.3 0.3 0.9 RG 2 w [4] 6 d 10 163 m 190 163 l S "
        "0 0 0 RG 2 w [] 0 d 10 180 m 190 180 l S "
        # fill+stroke family: the self-intersecting star via B* (even-odd
        # fill leaves the pentagon hole + stroked outline), and a b-closed
        # triangle (implicit h, nonzero fill + closing-segment stroke)
        f"0.8 0.8 0.2 rg 0.4 0 0 RG 1 w q 1 0 0 1 100 90 cm {star} B* Q "
        "0.2 0.6 0.9 rg 0 0 0 RG 2 w 148 148 m 186 148 l 167 186 l b "
        "0 0 0 rg BT /F1 6 Tf 70 188 Td (DASH PAGE) Tj ET")
    pages13 = [(p16, 200.0, 200.0, True)]

    # raster_11.pdf: FORM XObjects — the reusable-stamp class (letterheads,
    # headers, watermark boxes). Fm0 is a stamp (filled bar WIDER than its
    # /BBox — the bbox must clip it — a stroked frame and glyph text)
    # placed TWICE by translation cm; Fm1 nests an image Do AND an Fm0
    # reference with a baked-in /Matrix translation (depth 2); page content
    # after the placements proves the implicit Q restored the state.
    fm0 = ("0 0 0.8 rg 5 5 70 12 re f 0 0 0 RG 2 w 2 2 56 36 re S "
           "0 0 0 rg BT /F1 7 Tf 6 24 Td (STAMP) Tj ET")
    fm1 = ("q 40 0 0 40 0 35 cm /Px Do Q "
           "q 1 0 0 1 10 0 cm /Fm0 Do Q")
    forms11 = {
        'Fm0': (fm0, (0.0, 0.0, 60.0, 40.0), None, []),
        'Fm1': (fm1, (0.0, 0.0, 80.0, 80.0), (1, 0, 0, 1, 5, 5), ['Px', 'Fm0'])}
    images11 = {'Px': (16, 16, checker(16, 16))}
    # render-side twins of the form dicts (matrix default identity)
    rf0 = dict(content=fm0, bbox=(0.0, 0.0, 60.0, 40.0),
               matrix=(1.0, 0.0, 0.0, 1.0, 0.0, 0.0), xobjects={})
    rf1 = dict(content=fm1, bbox=(0.0, 0.0, 80.0, 80.0),
               matrix=(1.0, 0.0, 0.0, 1.0, 5.0, 5.0),
               xobjects={'Px': images11['Px'], 'Fm0': rf0})
    xobjects11 = {'Px': images11['Px'], 'Fm0': rf0, 'Fm1': rf1}
    p14 = (
        "q 1 0 0 1 10 150 cm /Fm0 Do Q "
        "q 1 0 0 1 150 150 cm /Fm0 Do Q "
        "q 1 0 0 1 20 20 cm /Fm1 Do Q "
        "0.5 0 0 rg 180 10 20 10 re f "
        "0 0 0 rg BT /F1 7 Tf 120 100 Td (AFTER FORMS) Tj ET")
    pages11 = [(p14, 220.0, 200.0, True)]

    # raster_14.pdf: TRANSFORMED GEOMETRY — the widened-CTM subset. A
    # vector stamp form placed ROTATED 30 degrees (fills + similarity
    # strokes under the rotation; the /BBox clips as a rotated
    # parallelogram through the general mask), a text letterhead form at
    # 2x (the scale folds into the glyph size; the underline stroke
    # scales by the same factor), a SHEARED parallelogram fill (fills
    # accept any affine), a 45-degree dashed stroke (pen + dash lengths
    # scale by sqrt(a^2+b^2)), and a ROTATED `re W n` clip that must go
    # through the per-pixel mask path (the rint-box fast path is
    # unit-scale-only); identity caption on top. Rotation entries are
    # written as decimal text so both renderers parse identical doubles.
    fm2 = ("0 0 0.8 rg 5 5 40 18 re f "
           "0.9 0.6 0.1 rg 10 28 m 40 28 l 25 48 l h f "
           "0 0 0 RG 2 w 2 2 56 50 re S")
    fm3 = ("0 0 0 rg BT /F1 7 Tf 4 10 Td (SCALED LETTERHEAD) Tj ET "
           "0.8 0 0 RG 1 w 4 6 m 96 6 l S")
    forms14 = {
        'Fm2': (fm2, (0.0, 0.0, 60.0, 55.0), None, []),
        'Fm3': (fm3, (0.0, 0.0, 100.0, 20.0), None, [])}
    rf2 = dict(content=fm2, bbox=(0.0, 0.0, 60.0, 55.0),
               matrix=(1.0, 0.0, 0.0, 1.0, 0.0, 0.0), xobjects={})
    rf3 = dict(content=fm3, bbox=(0.0, 0.0, 100.0, 20.0),
               matrix=(1.0, 0.0, 0.0, 1.0, 0.0, 0.0), xobjects={})
    xobjects14 = {'Fm2': rf2, 'Fm3': rf3}
    p17 = (
        "q 0.866 0.5 -0.5 0.866 40 20 cm /Fm2 Do Q "
        "q 2 0 0 2 6 170 cm /Fm3 Do Q "
        "q 1 0.4 0 1 140 20 cm 0.9 0.2 0.2 rg 0 0 50 28 re f Q "
        "q 0.7071 0.7071 -0.7071 0.7071 120 90 cm "
        "0 0.5 0 RG 2 w [5 3] 0 d 0 0 m 70 0 l S Q "
        "q 0.866 0.5 -0.5 0.866 150 95 cm 0 0 36 36 re W n "
        "0.2 0.2 0.9 rg -20 -20 90 90 re f Q "
        "0 0 0 rg BT /F1 6 Tf 60 208 Td (TRANSFORM PAGE) Tj ET")
    pages14 = [(p17, 220.0, 220.0, True)]

    fonts = {'F2': cmap_decoder(cmap)}
    # (name, pages, cmap, build-images, shadings, build-forms,
    #  render-xobjects — form entries become dicts; None = build-images)
    docs = [('raster_00.pdf', pages, cmap, None, None, None, None),
            ('raster_01.pdf', pages1, None, None, None, None, None),
            ('raster_02.pdf', pages2, None, None, None, None, None),
            ('raster_03.pdf', pages3, None, images3, None, None, None),
            ('raster_04.pdf', pages4, None, images4, None, None, None),
            ('raster_05.pdf', pages5, None, images5, None, None, None),
            ('raster_06.pdf', pages6, None, None, None, None, None),
            ('raster_07.pdf', pages7, None, None, None, None, None),
            ('raster_08.pdf', pages8, None, images8, None, None, None),
            ('raster_09.pdf', pages9, None, images9, None, None, None),
            ('raster_10.pdf', pages10, None, None, shadings10, None, None),
            ('raster_11.pdf', pages11, None, images11, None, forms11,
             xobjects11),
            ('raster_12.pdf', pages12, None, None, shadings12, None, None),
            ('raster_13.pdf', pages13, None, None, None, None, None),
            ('raster_14.pdf', pages14, None, None, None, forms14,
             xobjects14)]
    rows = []
    seg_rows = []
    ocr_out = []
    for name, pgs, cm, imgs, shs, frms, rxo in docs:
        with open(f'{OUTDIR}/{name}', 'wb') as f:
            f.write(build_pdf(pgs, cmap=cm, images=imgs, shadings=shs,
                              forms=frms))
        for pi, (content, mbw, mbh, _) in enumerate(pgs):
            W, H, rgb = render(content, fonts, mbw, mbh, dpi,
                               images=rxo if rxo is not None else imgs,
                               shadings=shs)
            rows.append(dict(name=name, page_index=pi, width=W, height=H,
                             pixel_sha=hashlib.sha256(rgb).hexdigest()))
            for (bi, x0, y0, x1, y1, nl, nc, ink_n, st_n, script) in segment(W, H, rgb):
                seg_rows.append(dict(
                    name=name, page_index=pi, block_idx=bi, x0=x0, y0=y0,
                    x1=x1, y1=y1, n_lines=nl, n_cc=nc, ink_px=ink_n,
                    straight_px=st_n, script=script))
            for (bi, li, x0, y0, x1, y1, isc, kind, text) in ocr_rows(W, H, rgb):
                ocr_out.append(dict(
                    name=name, page_index=pi, block_idx=bi, line_idx=li,
                    x0=x0, y0=y0, x1=x1, y1=y1, iscale=isc, kind=kind,
                    text=text))
    import duckdb
    import pandas as pd
    df = pd.DataFrame(rows)
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT name, CAST(page_index AS INT) page_index, "
                "CAST(width AS INT) width, CAST(height AS INT) height, pixel_sha FROM df")
    con.execute(f"COPY t TO '{EXPECTED}' (FORMAT PARQUET)")
    sdf = pd.DataFrame(seg_rows)
    con.execute(
        "CREATE TABLE s AS SELECT name, CAST(page_index AS INT) page_index, "
        "CAST(block_idx AS INT) block_idx, CAST(x0 AS INT) x0, CAST(y0 AS INT) y0, "
        "CAST(x1 AS INT) x1, CAST(y1 AS INT) y1, CAST(n_lines AS INT) n_lines, "
        "CAST(n_cc AS INT) n_cc, CAST(ink_px AS BIGINT) ink_px, "
        "CAST(straight_px AS BIGINT) straight_px, script FROM sdf")
    con.execute(f"COPY s TO '{EXPECTED_SEG}' (FORMAT PARQUET)")
    odf = pd.DataFrame(ocr_out)
    con.execute(
        "CREATE TABLE o AS SELECT name, CAST(page_index AS INT) page_index, "
        "CAST(block_idx AS INT) block_idx, CAST(line_idx AS INT) line_idx, "
        "CAST(x0 AS INT) x0, CAST(y0 AS INT) y0, CAST(x1 AS INT) x1, "
        "CAST(y1 AS INT) y1, CAST(iscale AS INT) iscale, kind, text FROM odf")
    con.execute(f"COPY o TO '{EXPECTED_OCR}' (FORMAT PARQUET)")
    # goldens cover every fixture file (PdfRasterSpec rasterizes each and
    # compares page-for-page, so sbt test carries the full differential
    # without the DuckDB oracle)
    with open(GOLDENS, 'w') as f:
        json.dump(dict(dpi=dpi, pages=rows), f, indent=1)
    for r in rows:
        print(r)
    for r in seg_rows:
        print(r)
    print(f"wrote {len(docs)} pdfs + goldens to {GOLDENS}")


if __name__ == '__main__':
    main()
