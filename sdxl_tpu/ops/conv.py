"""2D convolution helpers in NHWC (TPU-native layout).

The reference runs NCHW through LibTorch; on TPU, NHWC + HWIO is the layout
XLA tiles best onto the MXU. Weights are transposed once at load time
(io/ * readers), so the hot path is a single lax.conv_general_dilated.

The reference's PaddedConv2d over-pad + slice hack for PyTorch's asymmetric
(0,1,0,1) encoder downsample padding (autoencoder/mod.rs:335-407) is
unnecessary here: XLA supports asymmetric padding natively.
"""

from __future__ import annotations

import jax.lax as lax
import jax.numpy as jnp

_DIMSPEC = ("NHWC", "HWIO", "NHWC")


def conv2d(p, x: jnp.ndarray, stride: int = 1, padding=((1, 1), (1, 1))) -> jnp.ndarray:
    """NHWC conv with HWIO weights; padding is ((top,bottom),(left,right))."""
    y = lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=_DIMSPEC,
    )
    b = p.get("b")
    if b is not None:
        y = y + b.astype(x.dtype)
    return y


def conv1x1(p, x: jnp.ndarray) -> jnp.ndarray:
    """1x1 conv = channel matmul; cheaper as a reshaped dot on the MXU."""
    w = p["w"]
    y = x @ w.reshape(w.shape[2], w.shape[3]).astype(x.dtype)
    b = p.get("b")
    if b is not None:
        y = y + b.astype(x.dtype)
    return y


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x upsample in NHWC (unet/mod.rs:742-749)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)
