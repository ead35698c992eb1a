"""Generate real video-container fixtures + INDEPENDENT expected values for
the per-frame decode path (q_video_decode).

Container ("GFV1", an MJPEG-style length-prefixed stream with lossless
frames): magic b'GFV1' | u16be fps | u32be frame_count, then per frame
u32be png_length | png_bytes. Frames are real PNGs from the same pure-zlib
encoder as gen_media_fixture.py (lossless → the decoded RGB digest is
decoder-independent, unlike JPEG whose IDCT varies across decoders), each
frame a distinct deterministic pattern, so a green pixel_sha proves the JVM
actually decoded THAT frame's bytes.

Sampling contract (mirrored by graft.media.VideoFrames):
  duration_ms = frame_count * 1000 // fps
  one sample per 500 ms: ts = k*500 for k in 0..(duration_ms-1)//500
  frame_idx   = ts * fps // 1000
Only sampled frames are decoded on the Scala side (the length-prefix index
lets the reader skip undecoded frames) — the expected rows here are computed
from the raw pattern arrays BEFORE any PNG encoding, so the expectations
never touched the JVM.

Outputs: src/test/resources/media/vid_*.gfv
         src/test/resources/expected/video_decode.parquet
"""
import hashlib
import struct

from gen_media_fixture import pattern, write_png  # same pure-Python encoder

OUTDIR = 'src/test/resources/media'
EXPECTED = 'src/test/resources/expected/video_decode.parquet'

# (fps, frame_count, width, height) — durations 1250/2500/2166 ms exercise
# sub-second, exact-multiple and trailing-partial sampling windows
VIDEOS = [(24, 30, 24, 14), (30, 75, 16, 9), (6, 13, 31, 7)]


def encode_png(w, h, rgb):
    import io
    import os
    import tempfile
    fd, p = tempfile.mkstemp()
    os.close(fd)
    try:
        return write_png(p, w, h, rgb)
    finally:
        os.unlink(p)


def main():
    import os
    os.makedirs(OUTDIR, exist_ok=True)
    rows = []
    for vid, (fps, n_frames, w, h) in enumerate(VIDEOS):
        name = f'vid_{vid:02d}.gfv'
        frames = [pattern(w, h, vid * 1000 + f) for f in range(n_frames)]
        with open(f'{OUTDIR}/{name}', 'wb') as out:
            out.write(b'GFV1' + struct.pack('>HI', fps, n_frames))
            for rgb in frames:
                png = encode_png(w, h, rgb)
                out.write(struct.pack('>I', len(png)) + png)
        duration_ms = n_frames * 1000 // fps
        for k in range((duration_ms - 1) // 500 + 1):
            ts = k * 500
            idx = ts * fps // 1000
            rows.append(dict(name=name, ts_ms=ts, frame_idx=idx, width=w, height=h,
                             pixel_sha=hashlib.sha256(frames[idx]).hexdigest()))
    import duckdb
    import pandas as pd
    df = pd.DataFrame(rows)
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT name, CAST(ts_ms AS BIGINT) ts_ms, "
                "CAST(frame_idx AS BIGINT) frame_idx, CAST(width AS INT) width, "
                "CAST(height AS INT) height, pixel_sha FROM df")
    con.execute(f"COPY t TO '{EXPECTED}' (FORMAT PARQUET)")
    print(f"wrote {len(VIDEOS)} containers to {OUTDIR}, {len(rows)} expected rows to {EXPECTED}")


if __name__ == '__main__':
    main()
