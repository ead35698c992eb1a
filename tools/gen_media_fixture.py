"""Generate real PNG media fixtures + INDEPENDENT expected values for the
image-decode path: deterministic RGB arrays are synthesized in pure Python,
encoded as real PNGs (pure zlib, no imaging library), and the expected
(width, height, sha256 of raw row-major RGB bytes, sha256 of the base64
data-URI) are computed from the arrays BEFORE encoding — so the Scala
ImageIO decode path is differentially verified against values that never
touched the JVM.

Outputs: src/test/resources/media/img_*.png
         src/test/resources/expected/image_decode.parquet
"""
import base64
import hashlib
import struct
import sys
import zlib

OUTDIR = 'src/test/resources/media'
EXPECTED = 'src/test/resources/expected/image_decode.parquet'


def chunk(tag: bytes, payload: bytes) -> bytes:
    c = struct.pack('>I', len(payload)) + tag + payload
    return c + struct.pack('>I', zlib.crc32(tag + payload) & 0xffffffff)


def write_png(path: str, w: int, h: int, rgb: bytes) -> bytes:
    ihdr = struct.pack('>IIBBBBB', w, h, 8, 2, 0, 0, 0)  # 8-bit truecolor
    raw = b''.join(b'\x00' + rgb[y * w * 3:(y + 1) * w * 3] for y in range(h))
    png = (b'\x89PNG\r\n\x1a\n' + chunk(b'IHDR', ihdr)
           + chunk(b'IDAT', zlib.compress(raw, 9)) + chunk(b'IEND', b''))
    with open(path, 'wb') as f:
        f.write(png)
    return png


def pattern(w: int, h: int, seed: int) -> bytes:
    out = bytearray()
    for y in range(h):
        for x in range(w):
            out.append((x * 7 + y * 13 + seed * 31) % 256)
            out.append((x * 3 + y * 5 + seed * 17) % 256)
            out.append((x * 11 + y * 2 + seed * 53) % 256)
    return bytes(out)


def main():
    import os
    os.makedirs(OUTDIR, exist_ok=True)
    sizes = [(16, 9), (33, 17), (64, 64), (1, 1), (255, 3)]
    rows = []
    for i, (w, h) in enumerate(sizes):
        rgb = pattern(w, h, i)
        name = f'img_{i:02d}.png'
        png = write_png(f'{OUTDIR}/{name}', w, h, rgb)
        uri = 'data:image/png;base64,' + base64.b64encode(png).decode()
        n_px = w * h
        sums = [sum(rgb[c::3]) for c in range(3)]  # exact integer channel sums
        rows.append(dict(
            name=name, width=w, height=h,
            pixel_sha=hashlib.sha256(rgb).hexdigest(),
            uri_sha=hashlib.sha256(uri.encode()).hexdigest(),
            n_bytes=len(png),
            mean_r=sums[0] / n_px, mean_g=sums[1] / n_px, mean_b=sums[2] / n_px))
    import duckdb
    import pandas as pd
    df = pd.DataFrame(rows)
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT name, CAST(width AS INT) width, CAST(height AS INT) height, pixel_sha, uri_sha, CAST(n_bytes AS BIGINT) n_bytes, mean_r, mean_g, mean_b FROM df")
    con.execute(f"COPY t TO '{EXPECTED}' (FORMAT PARQUET)")
    print(f"wrote {len(rows)} PNGs to {OUTDIR} and expected to {EXPECTED}")


if __name__ == '__main__':
    main()
