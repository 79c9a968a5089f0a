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


# ---------------------------------------------------------------------------
# Fused nearest-2x upsample + 3x3 conv (phase decomposition)
# ---------------------------------------------------------------------------
#
# conv3x3(nearest2x(X)) computes, at output pixel (2i+a, 2j+b):
#     sum_{u,v in 3x3} W[u,v] * X[(2i+a+u-1)//2, (2j+b+v-1)//2]
# For each parity phase (a, b) the floor-div collapses the 3 taps onto 2
# input rows/cols, so the whole op is exactly four 2x2 convolutions over
# the ORIGINAL X with phase-summed weights, interleaved:
#     a=0: rows (i-1, i), row weights [W0, W1+W2]
#     a=1: rows (i, i+1), row weights [W0+W1, W2]
# (same for columns). This is 4 taps/output instead of 9 (2.25x fewer
# MACs) and never materializes the 4x-size upsampled tensor — the two
# post-upsample convs are the UNet's largest single HLOs (xprof r2:
# 1.7 + 1.4 ms/step at 640ch/128^2 and 1280ch/64^2).

def fold_upsample_conv(p: dict) -> dict:
    """Precompute the 4 phase kernels for an upsample conv param dict
    {'w': [3,3,I,O], 'b': ...} -> {'w4': [2,2,2,2,I,O] ((a,b,r,c) axes),
    'b': ...}; the original 'w' is dropped (superseded).
    Weight sums are done in f32 and cast back. Idempotent."""
    if "w4" in p or p.get("w") is None or p["w"].shape[0] != 3:
        return p
    w = p["w"].astype(jnp.float32)
    row_taps = {0: {0: w[0], 1: w[1] + w[2]},       # a=0: rows (i-1, i)
                1: {0: w[0] + w[1], 1: w[2]}}       # a=1: rows (i, i+1)
    # row_taps[a][r] has shape [3(v), I, O]; apply the same collapse to v
    def col(tap, b_, c_):
        if b_ == 0:
            return tap[0] if c_ == 0 else tap[1] + tap[2]
        return tap[0] + tap[1] if c_ == 0 else tap[2]

    w4 = jnp.stack([
        jnp.stack([
            jnp.stack([
                jnp.stack([col(row_taps[a][r], b_, c_) for c_ in (0, 1)])
                for r in (0, 1)
            ])
            for b_ in (0, 1)
        ])
        for a in (0, 1)
    ])  # [2(a),2(b),2(r),2(c),I,O]
    out = dict(p)
    out["w4"] = w4.astype(p["w"].dtype)
    # the 3x3 kernel is fully superseded by the phase kernels; dropping it
    # keeps the prepped base+refiner tree inside the v5e HBM budget (the
    # two-stage config already sits at ~13.4 GB resident)
    del out["w"]
    return out


def unfold_upsample_conv(p: dict) -> dict:
    """Exact inverse of fold_upsample_conv: reconstruct the 3x3 'w' from
    the 'w4' phase kernels (the fold is a linear bijection on the taps).

    Used by exporters (io/burn_mpk_write.py) so a prepped tree can still be
    written in the reference's 3x3 layout. Sums/differences in f32."""
    if "w" in p or "w4" not in p:
        return p
    w4 = jnp.asarray(p["w4"], jnp.float32)
    # undo the column collapse per (a, r): v0 = (b=0,c=0), v2 = (b=1,c=1),
    # v1 = (b=0,c=1) - v2
    def rowtap(a, r):
        v0 = w4[a, 0, r, 0]
        v2 = w4[a, 1, r, 1]
        v1 = w4[a, 0, r, 1] - v2
        return jnp.stack([v0, v1, v2])  # [3(v), I, O]

    # undo the row collapse: w0 = (a=0,r=0), w2 = (a=1,r=1),
    # w1 = (a=0,r=1) - w2
    w0 = rowtap(0, 0)
    w2 = rowtap(1, 1)
    w1 = rowtap(0, 1) - w2
    out = dict(p)
    out["w"] = jnp.stack([w0, w1, w2]).astype(p["w4"].dtype)
    del out["w4"]
    return out


def upsample2x_conv(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    """conv3x3(nearest2x(x)) — phase-decomposed when 'w4' is present
    (see fold_upsample_conv), reference path otherwise."""
    if "w4" not in p:
        return conv2d(p, upsample_nearest_2x(x))
    w4 = p["w4"].astype(x.dtype)
    b, h, w, c = x.shape
    c_out = w4.shape[-1]
    phases = []
    for a in (0, 1):
        row_pad = (1, 0) if a == 0 else (0, 1)
        for b_ in (0, 1):
            col_pad = (1, 0) if b_ == 0 else (0, 1)
            phases.append(lax.conv_general_dilated(
                x, w4[a, b_], window_strides=(1, 1),
                padding=(row_pad, col_pad), dimension_numbers=_DIMSPEC,
            ))
    ph = jnp.stack(phases).reshape(2, 2, b, h, w, c_out)
    # Y[2i+a, 2j+b] = ph[a, b, :, i, j]
    y = ph.transpose(2, 3, 0, 4, 1, 5).reshape(b, 2 * h, 2 * w, c_out)
    bias = p.get("b")
    if bias is not None:
        y = y + bias.astype(x.dtype)
    return y
