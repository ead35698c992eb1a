"""Generate scanned-document-style PDF fixtures + independent expected
values: each PDF is built in pure Python (no PDF library) with embedded
FlateDecode DeviceRGB image XObjects — the structure of scanned-PDF output,
which is exactly the input class the reference's `rasterize_pdf` consumes in
the CHURRO pipeline. Pages are either one full-page raster or several
horizontal STRIPS (the strip-scanned TIFF→PDF archive format) placed by the
content stream's cm matrices; the expected page image is the top-to-bottom
composite. Pixel SHAs are computed from the raw RGB arrays BEFORE embedding,
so the JVM extraction path is verified against values that never touched the
JVM. Strip draws are emitted BOTTOM-UP in the content stream while the
expected composite is top-down — proving the extractor orders by cm
placement, not by dict or stream order.

Outputs: src/test/resources/media/pdf_*.pdf
         src/test/resources/expected/pdf_pages.parquet
"""
import hashlib
import zlib


def pattern(w, h, seed):
    out = bytearray()
    for y in range(h):
        for x in range(w):
            out.append((x * 5 + y * 11 + seed * 37) % 256)
            out.append((x * 13 + y * 3 + seed * 19) % 256)
            out.append((x * 2 + y * 7 + seed * 41) % 256)
    return bytes(out)


def build_pdf(pages):
    """pages: list of pages; each page is a list of strips (w, h, rgb),
    top-to-bottom. Returns PDF bytes."""
    objs = {}  # num -> bytes (without 'N 0 obj'/'endobj')
    n_pages = len(pages)
    next_num = 3
    page_nums = []
    img_nums = []  # per page: list of image object numbers
    content_nums = []
    for strips in pages:
        page_nums.append(next_num)
        next_num += 1
        nums = list(range(next_num, next_num + len(strips)))
        img_nums.append(nums)
        next_num += len(strips)
        content_nums.append(next_num)
        next_num += 1

    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    kids = " ".join(f"{p} 0 R" for p in page_nums)
    objs[2] = f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    for i, strips in enumerate(pages):
        page_w = strips[0][0]
        page_h = sum(h for (_, h, _) in strips)
        xobj = " ".join(f"/Im{j} {img_nums[i][j]} 0 R" for j in range(len(strips)))
        objs[page_nums[i]] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {page_w} {page_h}] "
            f"/Resources << /XObject << {xobj} >> >> "
            f"/Contents {content_nums[i]} 0 R >>").encode()
        draws = []
        y = page_h
        for j, (w, h, rgb) in enumerate(strips):
            data = zlib.compress(rgb, 9)
            objs[img_nums[i][j]] = (
                f"<< /Type /XObject /Subtype /Image /Width {w} /Height {h} "
                f"/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /FlateDecode "
                f"/Length {len(data)} >>\nstream\n".encode() + data + b"\nendstream")
            y -= h  # strip j occupies [y, y+h) in y-up user space
            draws.append(f"q {w} 0 0 {h} 0 {y} cm /Im{j} Do Q")
        # emit draws bottom-up: extraction order must come from cm placement
        content = " ".join(reversed(draws)).encode()
        objs[content_nums[i]] = (
            f"<< /Length {len(content)} >>\nstream\n".encode() + content + b"\nendstream")

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


def main():
    import duckdb
    import pandas as pd
    specs = [
        ("pdf_00.pdf", [[(24, 16, 0)], [(16, 24, 1)]]),
        ("pdf_01.pdf", [[(32, 32, 2)]]),
        ("pdf_02.pdf", [[(8, 8, 3)], [(40, 10, 4)], [(10, 40, 5)]]),
        # strip-scanned page (3 strips, same width) + a normal page
        ("pdf_03.pdf", [[(20, 6, 6), (20, 10, 7), (20, 4, 8)], [(12, 12, 9)]]),
    ]
    rows = []
    for name, pagespecs in specs:
        pages = [[(w, h, pattern(w, h, s)) for (w, h, s) in strips]
                 for strips in pagespecs]
        pdf = build_pdf(pages)
        with open(f"src/test/resources/media/{name}", "wb") as f:
            f.write(pdf)
        for idx, strips in enumerate(pages):
            composite = b"".join(rgb for (_, _, rgb) in strips)
            rows.append(dict(name=name, page_index=idx, width=strips[0][0],
                             height=sum(h for (_, h, _) in strips),
                             pixel_sha=hashlib.sha256(composite).hexdigest()))
    df = pd.DataFrame(rows)
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT name, CAST(page_index AS INT) page_index, "
                "CAST(width AS INT) width, CAST(height AS INT) height, pixel_sha FROM df")
    con.execute("COPY t TO 'src/test/resources/expected/pdf_pages.parquet' (FORMAT PARQUET)")
    print(f"wrote {len(specs)} PDFs, {len(rows)} expected pages")


if __name__ == '__main__':
    main()
