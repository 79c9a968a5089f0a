"""PNG image I/O.

Mirrors the reference's load_images/save_images (sample/main.rs:296-348):
RGB8 buffers, all inputs must share dimensions, outputs are written as
{output_dir}{i}.png.
"""

from __future__ import annotations

import os
from typing import List, Sequence

import numpy as np
from PIL import Image


def load_images(paths: Sequence[str]) -> np.ndarray:
    """Load PNGs as one [N, H, W, 3] uint8 batch; dims must match."""
    imgs = [np.asarray(Image.open(p).convert("RGB"), dtype=np.uint8) for p in paths]
    if not imgs:
        raise ValueError("no images given")
    shape = imgs[0].shape
    if any(im.shape != shape for im in imgs):
        raise ValueError("images have different dimensions")
    return np.stack(imgs)


def save_images(images: np.ndarray, basepath: str,
                metadata: dict | None = None) -> List[str]:
    """Save [N, H, W, 3] uint8 as {basepath}{i}.png (sample/main.rs:341-348).

    metadata (capability extension): generation parameters embedded as a
    PNG tEXt chunk under the A1111-convention key "parameters" plus one
    chunk per extra key — reproducibility travels with the file."""
    parent = os.path.dirname(basepath)
    if parent:
        os.makedirs(parent, exist_ok=True)
    pnginfo = None
    if metadata:
        from PIL.PngImagePlugin import PngInfo

        pnginfo = PngInfo()
        for k, v in metadata.items():
            pnginfo.add_text(str(k), str(v))
    out = []
    for i, img in enumerate(np.asarray(images)):
        path = f"{basepath}{i}.png"
        Image.fromarray(img, mode="RGB").save(path, pnginfo=pnginfo)
        out.append(path)
    return out
