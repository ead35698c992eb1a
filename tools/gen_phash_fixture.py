"""Generate perceptual-hash fixtures + independent expected values for
graft.media.PHash: six structured scenes written as real PNGs (pure-Python
encoder from gen_media_fixture), hashed HERE with a twin of the documented
pipeline — PilResample-twin 32x32 bicubic (gen_resample_fixture.resize),
integer-luma grayscale, integer-cosine-table 2-D DCT, floor-division mean,
63-bit MSB-first hash — plus each image's nearest neighbour by Hamming
distance. The brightness-shifted and lightly-noised variants of the base
scene must land near it; the moved-rectangle scene must not.

Outputs: src/test/resources/media/phash/ph_*.png
         src/test/resources/expected/image_phash.parquet

Run from the repo root with PYTHONPATH=tools.
"""
import math
import os

from gen_media_fixture import write_png
from gen_resample_fixture import resize

OUTDIR = 'src/test/resources/media/phash'
EXPECTED = 'src/test/resources/expected/image_phash.parquet'
N = 32
TABLE = [[round(math.cos(math.pi * (2 * x + 1) * k / (2 * N)) * (1 << 14))
          for x in range(N)] for k in range(N)]
W, H = 96, 64


def phash(rgb, w, h):
    small = resize(rgb, w, h, N, N)
    g = [(299 * small[i * 3] + 587 * small[i * 3 + 1]
          + 114 * small[i * 3 + 2]) // 1000 for i in range(N * N)]
    rows = [[sum(g[y * N + x] * TABLE[u][x] for x in range(N))
             for u in range(N)] for y in range(N)]
    coefs = [sum(rows[y][u] * TABLE[v][y] for y in range(N))
             for v in range(8) for u in range(8)]
    med = sorted(coefs[1:])[31]  # lower median of the 63 non-DC coefs
    h63 = 0
    for k in range(1, 64):
        h63 = (h63 << 1) | (1 if coefs[k] > med else 0)
    return h63


def base_px(x, y):
    """Smooth gradients + two rectangles — low-frequency structure."""
    r = (x * 255) // (W - 1)
    gch = (y * 255) // (H - 1)
    b = 128
    if 12 <= x < 40 and 10 <= y < 30:
        r, gch, b = 30, 40, 60
    elif 60 <= x < 88 and 34 <= y < 56:
        r, gch, b = 220, 210, 200
    return r, gch, b


def scene(px):
    out = bytearray()
    for y in range(H):
        for x in range(W):
            out += bytes(px(x, y))
    return bytes(out)


def main():
    os.makedirs(OUTDIR, exist_ok=True)

    def bright(x, y):
        return tuple(min(255, v + 6) for v in base_px(x, y))

    def noised(x, y):
        # flip low bits deterministically — visually identical
        return tuple(min(255, v + ((x * 7 + y * 13 + c) % 3))
                     for c, v in enumerate(base_px(x, y)))

    def moved(x, y):
        # the rectangles swap corners — different layout, same palette
        r = (x * 255) // (W - 1)
        gch = (y * 255) // (H - 1)
        b = 128
        if 56 <= x < 84 and 8 <= y < 28:
            r, gch, b = 30, 40, 60
        elif 10 <= x < 38 and 36 <= y < 58:
            r, gch, b = 220, 210, 200
        return r, gch, b

    def vgrad(x, y):
        return ((y * 255) // (H - 1), (y * 255) // (H - 1), (x * 255) // (W - 1))

    def checker(x, y):
        on = ((x // 16) + (y // 16)) % 2 == 1
        return (230, 20, 20) if on else (20, 20, 230)

    scenes = [('ph_base', base_px), ('ph_bright', bright), ('ph_noise', noised),
              ('ph_moved', moved), ('ph_vgrad', vgrad), ('ph_checker', checker)]
    hashes = {}
    for nm, px in scenes:
        rgb = scene(px)
        write_png(f'{OUTDIR}/{nm}.png', W, H, rgb)
        hashes[f'{nm}.png'] = phash(rgb, W, H)

    rows = []
    for nm, h in sorted(hashes.items()):
        best = min(((bin(h ^ o).count('1'), onm)
                    for onm, o in sorted(hashes.items()) if onm != nm))
        rows.append(dict(name=nm, phash=f'{h:016x}',
                         nn_name=best[1], nn_dist=best[0],
                         near_dup=best[0] <= 10))
    import duckdb
    import pandas as pd
    df = pd.DataFrame(rows)
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT name, phash, nn_name, "
                "CAST(nn_dist AS INT) nn_dist, near_dup FROM df")
    con.execute(f"COPY t TO '{EXPECTED}' (FORMAT PARQUET)")
    for r in rows:
        print(r)


if __name__ == '__main__':
    main()
