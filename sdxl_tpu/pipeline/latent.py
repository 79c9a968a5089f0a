"""Latent <-> image conversion around the VAE.

Reimplements LatentDecoder (/root/reference/src/model/stablediffusion/mod.rs:170-267):
  - decode = VAE(latent / scale_factor), scale_factor = 0.13025
  - encode = VAE(image) * scale_factor (posterior mean, no sampling)
  - u8 <-> [-1, 1] conversion with clamping; output dims = latent * 8

Images are NHWC uint8 end to end (the reference converts NCHW<->NHWC on the
host; here NHWC is already the device layout so quantization happens
on-chip and only u8 bytes cross PCIe).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..configs import AutoencoderConfig
from ..models.vae import decode_latent as vae_decode
from ..models.vae import encode_image as vae_encode


@functools.partial(jax.jit, static_argnames=("cfg", "compute_dtype"))
def decode_latent_to_images(
    vae_params, cfg: AutoencoderConfig, latent: jnp.ndarray,
    scale_factor: float = 0.13025, compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """[B,h,w,4] latent -> [B,8h,8w,3] uint8 RGB (mod.rs:200-237, 263-267).

    compute_dtype=bfloat16 runs the decoder on the MXU half-precision path:
    1.16x faster (146 -> 126 ms at 1024^2 on v5e) at a measured quality cost
    of ~1 u8 level mean / 10 max pixel delta — opt-in (--vae-bf16); the
    reference decodes in f32 (sample/main.rs:269) and f32 stays the default.
    """
    if compute_dtype != jnp.float32:
        vae_params = jax.tree.map(
            lambda x: x.astype(compute_dtype)
            if isinstance(x, jnp.ndarray) and x.dtype == jnp.float32 else x,
            vae_params,
        )
    img = vae_decode(
        vae_params, cfg, latent.astype(compute_dtype) / scale_factor
    ).astype(jnp.float32)
    img = (img + 1.0) * (255.0 / 2.0)
    return jnp.clip(jnp.round(img), 0.0, 255.0).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("cfg",))
def encode_images_to_latent(
    vae_params, cfg: AutoencoderConfig, images_u8: jnp.ndarray,
    scale_factor: float = 0.13025,
) -> jnp.ndarray:
    """[B,H,W,3] uint8 RGB -> [B,H/8,W/8,4] latent (mod.rs:239-261)."""
    x = images_u8.astype(jnp.float32) / 255.0 * 2.0 - 1.0
    return vae_encode(vae_params, cfg, x) * scale_factor
