"""Independent pure-Python twin of the table-mask token-label step
(avg-color fill + 5x7 bitmap glyph draw): renders each case from the same
deterministic pattern arrays gen_media_fixture.py uses and emits the sha256
of the final RGB bytes — the golden graft.media.GlyphFont is verified
against (GlyphSpec). Duplicates the font table and fit/center/contrast
rules on purpose: any transcription drift between the twins fails the
parity test.

Output: src/test/resources/goldens/glyph_goldens.json
"""
import hashlib
import json

from gen_media_fixture import pattern

OUT = 'src/test/resources/goldens/glyph_goldens.json'

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
}

# (img_w, img_h, seed, mask box (x1, y1, x2, y2), token) — scales 1 and 2,
# the outright-fit fallback, and a too-small skip; tokens cover the alphabet
CASES = [
    (80, 40, 3, (5, 4, 75, 36), '[ACD2]'),     # fill-ratio fit at 1x
    (160, 80, 7, (8, 6, 152, 74), '[GHK3]'),   # 2x scale
    (60, 30, 11, (10, 8, 50, 22), '[TWX4]'),   # 35 <= 40 outright-fit fallback
    (40, 24, 5, (4, 4, 30, 12), '[YZ56]'),     # too narrow: label skipped
    (120, 60, 13, (10, 5, 110, 55), '[8A7C]'), # dark/light contrast varies
]


def average_color(rgb, w, h, box):
    x1, y1, x2, y2 = box
    pad = 2
    mx, my = (x1 + x2) // 2, (y1 + y2) // 2
    pts = [(x1 - pad, y1 - pad), (mx, y1 - pad), (x2 + pad, y1 - pad),
           (x2 + pad, my), (x2 + pad, y2 + pad), (mx, y2 + pad),
           (x1 - pad, y2 + pad), (x1 - pad, my)]
    sums = [0, 0, 0]
    for px, py in pts:
        px = max(0, min(px, w - 1))
        py = max(0, min(py, h - 1))
        i = (py * w + px) * 3
        for c in range(3):
            sums[c] += rgb[i + c]
    return tuple(s // len(pts) for s in sums)


def fill_rect(rgb, w, h, box, color):
    l, t = max(0, box[0]), max(0, box[1])
    r, b = min(w, box[2]), min(h, box[3])
    for y in range(t, b):
        for x in range(l, r):
            i = (y * w + x) * 3
            rgb[i:i + 3] = bytes(color)


def fit_scale(text_len, box_w, box_h, fill_ratio=0.7):
    w1 = text_len * (GLYPH_W + SPACING) - SPACING
    s = int(min(fill_ratio * box_w / w1, fill_ratio * box_h / GLYPH_H))
    if s >= 1:
        return s
    return 1 if (w1 <= box_w and GLYPH_H <= box_h) else 0


def draw_text(rgb, w, h, text, x0, y0, scale, color):
    for ci, ch in enumerate(text):
        glyph = FONT.get(ch)
        if glyph is None:
            continue
        gx = x0 + ci * (GLYPH_W + SPACING) * scale
        for r in range(GLYPH_H):
            for c in range(GLYPH_W):
                if glyph[r] & (1 << (GLYPH_W - 1 - c)):
                    for dy in range(scale):
                        y = y0 + r * scale + dy
                        if not 0 <= y < h:
                            continue
                        for dx in range(scale):
                            x = gx + c * scale + dx
                            if 0 <= x < w:
                                i = (y * w + x) * 3
                                rgb[i:i + 3] = bytes(color)


def main():
    out = []
    for (w, h, seed, box, token) in CASES:
        rgb = bytearray(pattern(w, h, seed))
        avg = average_color(rgb, w, h, box)
        # PIL's draw.rectangle includes the bottom/right edge pixel
        fill_rect(rgb, w, h, (box[0], box[1], box[2] + 1, box[3] + 1), avg)
        box_w, box_h = box[2] - box[0], box[3] - box[1]
        s = fit_scale(len(token), box_w, box_h)
        if s >= 1:
            tw = (len(token) * (GLYPH_W + SPACING) - SPACING) * s
            th = GLYPH_H * s
            lum = 0.299 * avg[0] + 0.587 * avg[1] + 0.114 * avg[2]
            color = (255, 255, 255) if lum < 128 else (0, 0, 0)
            draw_text(rgb, w, h, token,
                      box[0] + (box_w - tw) // 2, box[1] + (box_h - th) // 2, s, color)
        out.append(dict(w=w, h=h, seed=seed, box=list(box), token=token,
                        scale=s, avg=list(avg),
                        sha=hashlib.sha256(bytes(rgb)).hexdigest()))
    with open(OUT, 'w') as f:
        json.dump({'glyph_draw': out}, f, indent=1)
    print(f"wrote {len(out)} glyph cases to {OUT}; scales = {[c['scale'] for c in out]}")


if __name__ == '__main__':
    main()
