"""Sinusoidal timestep / micro-conditioning embeddings.

Reimplements timestep_embedding and conditioning_embedding
(/root/reference/src/model/unet/mod.rs:21-57). Ordering matters for weight
parity: the reference concatenates **cos first, then sin** (unet/mod.rs:38),
unlike the usual sin-first convention.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def timestep_embedding(
    timesteps: jnp.ndarray, dim: int, max_period: int = 10000
) -> jnp.ndarray:
    """[N] int/float timesteps -> [N, dim] cos-first sinusoid embedding."""
    half = dim // 2
    freqs = jnp.exp(
        jnp.arange(half, dtype=jnp.float32) * (-math.log(max_period) / half)
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=1)


def conditioning_embedding(
    pooled_text_enc: jnp.ndarray,
    dim: int,
    size: jnp.ndarray,
    crop: jnp.ndarray,
    ar: jnp.ndarray,
) -> jnp.ndarray:
    """SDXL micro-conditioning channel embedding (unet/mod.rs:41-57).

    cat(size, crop, ar) over the feature axis, embed each int with a
    ``dim``-wide sinusoid, flatten, and prepend the pooled text embedding:
    base = 1280 pooled + 6*256 = 2816; refiner replaces ar with the
    aesthetic score (5 ints -> 2560).
    """
    n_batch = pooled_text_enc.shape[0]
    cat = jnp.concatenate([size, crop, ar], axis=1)
    w = cat.shape[1]
    embed = timestep_embedding(cat.reshape(n_batch * w), dim, 10000)
    embed = embed.reshape(n_batch, w * dim)
    return jnp.concatenate(
        [pooled_text_enc, embed.astype(pooled_text_enc.dtype)], axis=1
    )
