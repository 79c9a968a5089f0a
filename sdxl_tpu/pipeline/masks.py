"""Latent-space inpainting masks, shared by the SD3 and Flux families
(the SDXL family builds its 4-channel variant in pipeline.py/serve.py).

Two surfaces produce the same [1, H/8, W/8, 1] float mask (1 = generate):
a pixel-space crop WINDOW (reference sample/main.rs:135-197 semantics) or
a mask IMAGE where any >127 pixel inside an 8x8 cell marks the cell
generated."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np


def build_latent_mask(
    height: int,
    width: int,
    mask_image: Optional[np.ndarray] = None,  # [H, W(,C)] u8, >127 = gen
    crop_left: Optional[int] = None,
    crop_right: Optional[int] = None,
    crop_top: Optional[int] = None,
    crop_bottom: Optional[int] = None,
    crop_out: bool = False,
) -> jnp.ndarray:
    lh, lw = height // 8, width // 8
    if mask_image is not None:
        if any(v is not None
               for v in (crop_left, crop_right, crop_top, crop_bottom)):
            raise ValueError("pass either mask_image or a crop window, "
                             "not both")
        m = np.asarray(mask_image)
        if m.shape[:2] != (height, width):
            raise ValueError(f"mask {m.shape[:2]} does not match image "
                             f"{(height, width)}")
        if m.ndim == 3:
            m = m.max(axis=-1)
        cells = (m[: lh * 8, : lw * 8].reshape(lh, 8, lw, 8)
                 .max(axis=(1, 3)) > 127)
        mask = cells[None, :, :, None]
    else:
        crop_left = 0 if crop_left is None else crop_left
        crop_right = width if crop_right is None else crop_right
        crop_top = 0 if crop_top is None else crop_top
        crop_bottom = height if crop_bottom is None else crop_bottom
        if not (crop_right <= width and crop_bottom <= height
                and (crop_left < crop_right or crop_top < crop_bottom)):
            raise ValueError("Invalid crop parameters.")
        l, r = crop_left // 8, crop_right // 8
        t, b = crop_top // 8, crop_bottom // 8
        mask = np.zeros((1, lh, lw, 1), dtype=bool)
        mask[:, t:b, l:r, :] = True
    if crop_out:
        mask = ~mask
    return jnp.asarray(mask, jnp.float32)
