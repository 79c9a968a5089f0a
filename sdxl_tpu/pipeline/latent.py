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
from typing import Optional

import jax
import jax.numpy as jnp

from ..configs import AutoencoderConfig
from ..models.vae import decode_latent as vae_decode
from ..models.vae import encode_image as vae_encode


@functools.partial(jax.jit, static_argnames=("cfg", "compute_dtype"))
def _decode_latent_f32(
    vae_params, cfg: AutoencoderConfig, latent: jnp.ndarray,
    scale_factor: float = 0.13025, compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Decode to the un-quantized [0, 255] float image (tiling blends
    these before the single final round/clip)."""
    if compute_dtype != jnp.float32:
        vae_params = jax.tree.map(
            lambda x: x.astype(compute_dtype)
            if isinstance(x, jnp.ndarray) and x.dtype == jnp.float32 else x,
            vae_params,
        )
    img = vae_decode(
        vae_params, cfg, latent.astype(compute_dtype) / scale_factor
    ).astype(jnp.float32)
    return (img + 1.0) * (255.0 / 2.0)


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


def decode_latent_tiled(
    vae_params, cfg: AutoencoderConfig, latent: jnp.ndarray,
    scale_factor: float = 0.13025, compute_dtype=jnp.float32,
    tile: int = 96, overlap: Optional[int] = None,
) -> jnp.ndarray:
    """Tiled VAE decode (capability extension): decode overlapping latent
    tiles independently and blend with linear ramps — the standard "tiled
    VAE" technique for resolutions whose full decode would not fit HBM
    (>=4096^2 pixels on 16 GB). Per-tile GroupNorm statistics are the
    usual approximation; `overlap` latent pixels (128 image px at the
    default 16) hide the seams.

    tile/overlap are in LATENT pixels; every tile has the same shape, so
    all tiles share one compiled decode executable.
    """
    if overlap is None:  # adapt to small tiles
        overlap = min(16, max(tile // 4, 1))
    b, h, w, c = latent.shape
    if h <= tile and w <= tile:
        return decode_latent_to_images(vae_params, cfg, latent,
                                       scale_factor, compute_dtype)
    if overlap >= tile:
        raise ValueError("overlap must be < tile")
    stride = tile - overlap

    def starts(dim):
        if dim <= tile:
            return [0]
        s = list(range(0, dim - tile, stride))
        s.append(dim - tile)  # last tile aligned to the edge (same shape)
        return s

    ys, xs = starts(h), starts(w)
    f = 2 ** (len(cfg.decoder_channels) - 1)  # VAE upsampling factor
    out = jnp.zeros((b, h * f, w * f, 3), jnp.float32)
    wsum = jnp.zeros((1, h * f, w * f, 1), jnp.float32)

    # linear blend ramp over the overlap region, flat in the interior
    ramp1d = jnp.minimum(
        jnp.arange(1, tile * f + 1, dtype=jnp.float32),
        jnp.arange(tile * f, 0, -1, dtype=jnp.float32),
    )
    ramp1d = jnp.minimum(ramp1d / max(overlap * f, 1), 1.0)
    tile_w = (ramp1d[:, None] * ramp1d[None, :])[None, :, :, None]

    for y0 in ys:
        for x0 in xs:
            part = jax.lax.dynamic_slice(
                latent, (0, y0, x0, 0), (b, min(tile, h), min(tile, w), c)
            )
            rgb = _decode_latent_f32(
                vae_params, cfg, part, scale_factor, compute_dtype
            )
            th, tw = rgb.shape[1], rgb.shape[2]
            wt = tile_w[:, :th, :tw]
            out = jax.lax.dynamic_update_slice(
                out,
                jax.lax.dynamic_slice(out, (0, y0 * f, x0 * f, 0),
                                      (b, th, tw, 3)) + rgb * wt,
                (0, y0 * f, x0 * f, 0),
            )
            wsum = jax.lax.dynamic_update_slice(
                wsum,
                jax.lax.dynamic_slice(wsum, (0, y0 * f, x0 * f, 0),
                                      (1, th, tw, 1)) + wt,
                (0, y0 * f, x0 * f, 0),
            )

    img = out / jnp.maximum(wsum, 1e-8)
    return jnp.clip(jnp.round(img), 0.0, 255.0).astype(jnp.uint8)


def encode_images_tiled(
    vae_params, cfg: AutoencoderConfig, images_u8: jnp.ndarray,
    scale_factor: float = 0.13025, tile: int = 96,
    overlap: Optional[int] = None,
) -> jnp.ndarray:
    """Tiled VAE encode (capability extension) — the encoder-side twin of
    decode_latent_tiled: encode overlapping IMAGE tiles independently and
    blend the latents with linear ramps, bounding encoder memory for
    >=4096^2 img2img / inpainting / inversion inputs. Per-tile GroupNorm
    statistics are the usual approximation; `tile`/`overlap` are in
    LATENT pixels (x8 image pixels — the same units the decode side
    uses, so one --vae-tile flag drives both directions). Inputs small
    enough for one tile take the exact untiled path.
    """
    f = 2 ** (len(cfg.encoder_channels) - 1)  # VAE downsampling factor
    if overlap is None:
        overlap = min(16, max(tile // 4, 1))
    b, H, W, c = images_u8.shape
    h, w = H // f, W // f
    if h <= tile and w <= tile:
        return encode_images_to_latent(vae_params, cfg, images_u8,
                                       scale_factor)
    if overlap >= tile:
        raise ValueError("overlap must be < tile")
    stride = (tile - overlap) * f
    tpx = tile * f

    def starts(dim_px):
        if dim_px <= tpx:
            return [0]
        s = list(range(0, dim_px - tpx, stride))
        s.append(dim_px - tpx)  # last tile aligned to the edge
        return s

    ys, xs = starts(H), starts(W)
    out = jnp.zeros((b, h, w, 4), jnp.float32)
    wsum = jnp.zeros((1, h, w, 1), jnp.float32)

    ramp1d = jnp.minimum(
        jnp.arange(1, tile + 1, dtype=jnp.float32),
        jnp.arange(tile, 0, -1, dtype=jnp.float32),
    )
    ramp1d = jnp.minimum(ramp1d / max(overlap, 1), 1.0)
    tile_w = (ramp1d[:, None] * ramp1d[None, :])[None, :, :, None]

    for y0 in ys:
        for x0 in xs:
            part = jax.lax.dynamic_slice(
                images_u8, (0, y0, x0, 0),
                (b, min(tpx, H), min(tpx, W), c),
            )
            lat = encode_images_to_latent(vae_params, cfg, part,
                                          scale_factor)
            th, tw = lat.shape[1], lat.shape[2]
            wt = tile_w[:, :th, :tw]
            ly, lx = y0 // f, x0 // f
            out = jax.lax.dynamic_update_slice(
                out,
                jax.lax.dynamic_slice(out, (0, ly, lx, 0),
                                      (b, th, tw, 4)) + lat * wt,
                (0, ly, lx, 0),
            )
            wsum = jax.lax.dynamic_update_slice(
                wsum,
                jax.lax.dynamic_slice(wsum, (0, ly, lx, 0),
                                      (1, th, tw, 1)) + wt,
                (0, ly, lx, 0),
            )
    return out / jnp.maximum(wsum, 1e-8)
