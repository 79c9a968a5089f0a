"""Normalization ops, numerically matched to the reference.

The reference shares one `layernorm` helper between LayerNorm and GroupNorm
(/root/reference/src/model/layernorm/mod.rs:42-49):

    u = x - mean(x, -1)
    y = u / sqrt(mean(u*u, -1) + eps)

i.e. *biased* variance with eps added inside the sqrt — identical to the
PyTorch LayerNorm/GroupNorm formulation, so parity holds at 1e-2.

Norm statistics are always computed in float32 regardless of the activation
dtype (bf16 UNet): reductions in bf16 lose too much precision and the cast
is free on TPU (fused into the surrounding elementwise ops by XLA).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def layernorm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Unscaled layernorm over the last axis (layernorm/mod.rs:42-49)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    u = xf - mean
    y = u * jax.lax.rsqrt(jnp.mean(u * u, axis=-1, keepdims=True) + eps)
    return y.astype(x.dtype)


def layernorm_affine(x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray,
                     eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm::forward (layernorm/mod.rs:35-39)."""
    return layernorm(x, eps) * gamma + beta


def groupnorm_nhwc(x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray,
                   n_group: int = 32, eps: float = 1e-5) -> jnp.ndarray:
    """GroupNorm over an NHWC tensor (groupnorm/mod.rs:53-73).

    The reference reshapes NCHW to [B, G, C/G*H*W] and normalizes the last
    axis; per (batch, group) statistics cover the group's channels and all
    spatial positions. We keep NHWC (the TPU-friendly conv layout) and
    compute the same statistics by grouping the channel axis.
    """
    b = x.shape[0]
    c = x.shape[-1]
    spatial = x.shape[1:-1]
    assert c % n_group == 0

    xf = x.astype(jnp.float32).reshape(b, -1, n_group, c // n_group)
    # statistics over (spatial, channels-in-group) per (batch, group)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    u = xf - mean
    var = jnp.mean(u * u, axis=(1, 3), keepdims=True)
    y = u / jnp.sqrt(var + eps)
    y = y.reshape(b, *spatial, c).astype(x.dtype)
    return y * gamma + beta
