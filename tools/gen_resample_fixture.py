"""Independent pure-Python twin of graft.media.PilResample: Pillow's
Resample.c BICUBIC pipeline (Keys a=-0.5, support 2, scale-widened kernel,
PRECISION_BITS=22 fixed point, horizontal-then-vertical, clip8), written
from the published algorithm with the same (int)-truncation semantics.
Pillow itself does not ship in this sandbox, so this twin is the oracle;
any transcription drift between the two implementations fails the
differential test (ResampleSpec).

Output: src/test/resources/goldens/resample_goldens.json
"""
import hashlib
import json

from gen_media_fixture import pattern

OUT = 'src/test/resources/goldens/resample_goldens.json'

PRECISION_BITS = 32 - 8 - 2
SUPPORT = 2.0

# (in_w, in_h, seed, out_w, out_h): downscale, upscale, mixed, extreme,
# 1-pixel, identity-on-one-axis
CASES = [
    (64, 48, 1, 32, 24),
    (16, 12, 2, 48, 40),
    (40, 30, 3, 56, 15),
    (100, 7, 4, 9, 21),
    (5, 5, 5, 1, 1),
    (33, 17, 6, 33, 9),
    (448, 448, 7, 448, 448),  # identity short-circuit
    (30, 20, 8, 448, 448),    # the Qianfan thumbnail shape
]


def kern(x):
    a = -0.5
    x = abs(x)
    if x < 1.0:
        return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0
    if x < 2.0:
        return (((x - 5.0) * x + 8.0) * x - 4.0) * a
    return 0.0


def coeffs(in_size, out_size):
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = SUPPORT * filterscale
    ksize = -(-support // 1)  # ceil
    ksize = int(ksize) * 2 + 1
    ss = 1.0 / filterscale
    bounds, kk = [], []
    for xx in range(out_size):
        center = (xx + 0.5) * scale
        xmin = int(center - support + 0.5)
        xmin = max(xmin, 0)
        xmax = int(center + support + 0.5)
        xmax = min(xmax, in_size) - xmin
        prek = [kern((x + xmin - center + 0.5) * ss) for x in range(xmax)]
        ww = sum(prek)  # left-to-right like the C loop
        row = []
        for w in prek:
            w = w / ww if ww != 0.0 else w
            row.append(int(-0.5 + w * (1 << PRECISION_BITS)) if w < 0
                       else int(0.5 + w * (1 << PRECISION_BITS)))
        row += [0] * (ksize - xmax)
        bounds.append((xmin, xmax))
        kk.append(row)
    return bounds, kk


def clip8(v):
    if v >= (1 << PRECISION_BITS << 8):
        return 255
    if v <= 0:
        return 0
    return v >> PRECISION_BITS


def resize(rgb, in_w, in_h, out_w, out_h):
    if (out_w, out_h) == (in_w, in_h):
        return bytes(rgb)
    if out_w != in_w:
        bounds, kk = coeffs(in_w, out_w)
        out = bytearray(out_w * in_h * 3)
        for y in range(in_h):
            for xx in range(out_w):
                xmin, xmax = bounds[xx]
                for c in range(3):
                    acc = 1 << (PRECISION_BITS - 1)
                    for x in range(xmax):
                        acc += rgb[(y * in_w + x + xmin) * 3 + c] * kk[xx][x]
                    out[(y * out_w + xx) * 3 + c] = clip8(acc)
        rgb = out
    if out_h != in_h:
        bounds, kk = coeffs(in_h, out_h)
        out = bytearray(out_w * out_h * 3)
        for yy in range(out_h):
            ymin, ymax = bounds[yy]
            for x in range(out_w):
                for c in range(3):
                    acc = 1 << (PRECISION_BITS - 1)
                    for y in range(ymax):
                        acc += rgb[((y + ymin) * out_w + x) * 3 + c] * kk[yy][y]
                    out[(yy * out_w + x) * 3 + c] = clip8(acc)
        rgb = out
    return bytes(rgb)


def main():
    out = []
    for (iw, ih, seed, ow, oh) in CASES:
        src = pattern(iw, ih, seed)
        res = resize(bytearray(src), iw, ih, ow, oh)
        # first row as explicit bytes for pinpoint debugging, sha for the rest
        out.append(dict(in_w=iw, in_h=ih, seed=seed, out_w=ow, out_h=oh,
                        first_row=list(res[:min(len(res), 3 * ow)]),
                        sha=hashlib.sha256(res).hexdigest()))
    with open(OUT, 'w') as f:
        json.dump({'bicubic': out}, f, indent=1)
    print(f"wrote {len(out)} resample cases to {OUT}")


if __name__ == '__main__':
    main()
