"""Golden generator for the Qianfan 448-tile dynamic preprocessing
(`/root/reference/src/churro_ocr/providers/hf.py:87-101,157-240`): an
independent Python transcription of the published semantics (closest-aspect
ratio over the module's precomputed ratio set, tile grid fan-out, optional
thumbnail, ImageNet float32 normalization), evaluated over a grid of sizes.
The ratio list is produced by the same set+sorted expression the reference
module evaluates at import, so CPython's tie order is captured faithfully.

Output: src/test/resources/goldens/qianfan_goldens.json
"""
import json

import numpy as np

IMAGE_SIZE = 448
MAX_TILES = 12
RATIOS = sorted(
    {(w, h) for n in range(1, MAX_TILES + 1)
     for w in range(1, n + 1) for h in range(1, n + 1)
     if 1 <= w * h <= MAX_TILES},
    key=lambda r: r[0] * r[1])
MEAN = np.asarray((0.485, 0.456, 0.406), dtype=np.float32)
STD = np.asarray((0.229, 0.224, 0.225), dtype=np.float32)


def find_closest(aspect_ratio, width, height, image_size=IMAGE_SIZE):
    best = (1, 1)
    best_diff = float('inf')
    area = width * height
    for ratio in RATIOS:
        tar = ratio[0] / ratio[1]
        diff = abs(aspect_ratio - tar)
        if diff < best_diff:
            best_diff = diff
            best = ratio
            continue
        if diff == best_diff and area > 0.5 * image_size * image_size * ratio[0] * ratio[1]:
            best = ratio
    return best


def dynamic_tiles(width, height, image_size=IMAGE_SIZE, use_thumbnail=True):
    aspect = width / max(height, 1)
    t = find_closest(aspect, width, height, image_size)
    tw, th = image_size * t[0], image_size * t[1]
    blocks = t[0] * t[1]
    grid_w = tw // image_size
    boxes = []
    for i in range(blocks):
        left = (i % grid_w) * image_size
        top = (i // grid_w) * image_size
        boxes.append([left, top, left + image_size, top + image_size])
    thumb = bool(use_thumbnail and blocks != 1)
    return dict(width=width, height=height, ratio=list(t),
                target_w=tw, target_h=th, blocks=blocks,
                boxes=boxes, thumbnail=thumb,
                n_images=blocks + (1 if thumb else 0))


def normalize_goldens():
    # float32 ImageNet normalization of a few raw RGB bytes, CHW order
    cases = []
    for rgb in [(0, 0, 0), (255, 255, 255), (128, 64, 32), (17, 200, 99)]:
        arr = np.asarray([[list(rgb)]], dtype=np.float32) / 255.0  # 1x1x3
        chw = arr.transpose(2, 0, 1)
        out = (chw - MEAN[:, None, None]) / STD[:, None, None]
        cases.append(dict(rgb=list(rgb), chw=[float(np.float32(v)) for v in out.reshape(3)]))
    return cases


def main():
    sizes = ([(448, 448), (896, 448), (448, 896), (1000, 700), (700, 1000),
              (3000, 500), (500, 3000), (1, 1), (100, 100), (1036, 1036),
              (2500, 1250), (640, 480), (480, 640), (1344, 448), (449, 447),
              (5376, 448), (448, 5376), (123, 457), (2048, 1536), (4032, 3024)])
    out = dict(
        ratios=[list(r) for r in RATIOS],
        tiles=[dynamic_tiles(w, h) for (w, h) in sizes],
        normalize=normalize_goldens())
    path = 'src/test/resources/goldens/qianfan_goldens.json'
    with open(path, 'w') as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}: {len(out['tiles'])} tile cases, {len(out['normalize'])} normalize cases")


if __name__ == '__main__':
    main()
