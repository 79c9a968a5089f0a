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


def guidance_scale_embedding(w, dim: int) -> jnp.ndarray:
    """LCM guidance embedding (arXiv:2310.04378 §4.1; diffusers
    LatentConsistencyModelPipeline.get_guidance_scale_embedding).

    ``w`` is guidance_scale - 1, scaled by 1000 and embedded with a
    **sin-first** sinusoid (unlike the UNet timestep embedding above,
    which is cos-first per the reference) using ``exp(-log(10000) *
    arange(half) / (half - 1))`` frequencies — both quirks are the
    public implementation's, preserved for checkpoint compatibility
    (distilled LCM UNets were trained against exactly this embedding).
    Returns [N, dim] float32; odd dims are zero-padded on the right.
    """
    w = jnp.asarray(w, jnp.float32).reshape(-1) * 1000.0
    half = dim // 2
    # f32 op order mirrors the public torch code; exact agreement is
    # still bounded by f32 phase quantization (the sin argument reaches
    # w*1000 ~ 6.5e3, where one ulp is ~8e-4 of phase)
    log_scale = jnp.log(jnp.float32(10000.0)) / (half - 1)
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -log_scale)
    args = w[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


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
