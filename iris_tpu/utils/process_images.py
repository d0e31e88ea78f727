"""Standalone dataset-image resize tool.

Parity: reference utils/dataset/scannetpp/process.py — downscale every
image in a directory to at most --max_width (aspect preserved) before
training on ScanNet++ DSLR captures. Area-average downsampling (the
closest match to cv2.INTER_AREA the reference relies on for photographs).
"""

from __future__ import annotations

import os
from argparse import ArgumentParser

import numpy as np
from PIL import Image


def resize_max_width(img: np.ndarray, max_width: int,
                     nearest: bool = False) -> np.ndarray:
    """nearest=True for LABEL images (semantic/part masks): area
    averaging would invent fractional label ids at region borders."""
    h, w = img.shape[:2]
    if w <= max_width:
        return img
    w_new = max_width
    h_new = int(max_width / w * h)
    pil = Image.fromarray(img)
    return np.asarray(pil.resize((w_new, h_new),
                                 Image.NEAREST if nearest else Image.BOX))


def main(argv=None):
    parser = ArgumentParser()
    parser.add_argument("--input", type=str, required=True)
    parser.add_argument("--output", type=str, required=True)
    parser.add_argument("--max_width", type=int, default=1024)
    parser.add_argument("--nearest", action="store_true",
                        help="nearest-neighbor resampling (label masks)")
    args = parser.parse_args(argv)

    os.makedirs(args.output, exist_ok=True)
    names = sorted(os.listdir(args.input))
    n = 0
    for name in names:
        src = os.path.join(args.input, name)
        try:
            img = np.asarray(Image.open(src))
        except Exception:
            continue
        out = resize_max_width(img, args.max_width, args.nearest)
        Image.fromarray(out).save(os.path.join(args.output, name))
        n += 1
    print(f"[process_images] wrote {n} images to {args.output}")


if __name__ == "__main__":
    main()
