"""SDXL VAE (autoencoder) in NHWC.

Reimplements /root/reference/src/model/autoencoder/mod.rs:

  - Encoder: conv_in -> 4 blocks (2 ResnetBlocks + stride-2 downsample with
    asymmetric (0,1,0,1) padding, except last) -> Mid -> GN/SiLU/conv_out
    to 8 quant channels (autoencoder/mod.rs:80-144)
  - encode_image keeps the first 4 quant channels = the posterior mean; no
    sampling (autoencoder/mod.rs:59-65)
  - Decoder: conv_in 4->512 -> Mid -> 4 blocks (3 ResnetBlocks + nearest-2x
    upsample conv, except last) -> conv_out to 3 (autoencoder/mod.rs:152-216)
  - Mid = ResnetBlock, single-head spatial self-attention with 1x1-conv
    q/k/v over HW tokens, ResnetBlock (autoencoder/mod.rs:417-450,518-586)

All activations NHWC; the reference's PaddedConv2d hack is replaced by
native asymmetric padding (see ops/conv.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..configs import AutoencoderConfig
from ..ops.attention import qkv_attention
from ..ops.conv import conv1x1, conv2d, upsample_nearest_2x
from ..ops.norms import groupnorm_nhwc

SAME1 = ((1, 1), (1, 1))
ASYM = ((0, 1), (0, 1))  # PyTorch's (0,1,0,1) encoder downsample padding


def silu(x):
    return x * jax.nn.sigmoid(x)


def _resnet_block(p, x, n_group=32):
    """GN -> SiLU -> conv3x3, twice, + (1x1) skip (autoencoder/mod.rs:500-516)."""
    h = conv2d(p["conv1"], silu(groupnorm_nhwc(x, **p["norm1"], n_group=n_group)))
    h = conv2d(p["conv2"], silu(groupnorm_nhwc(h, **p["norm2"], n_group=n_group)))
    if "nin_shortcut" in p:
        x = conv1x1(p["nin_shortcut"], x)
    return x + h


def _attn_block(p, x, n_group=32):
    """Single-head spatial self-attention (autoencoder/mod.rs:550-586)."""
    b, hgt, wid, c = x.shape
    h = groupnorm_nhwc(x, **p["norm"], n_group=n_group)
    q = conv1x1(p["q"], h).reshape(b, hgt * wid, c)
    k = conv1x1(p["k"], h).reshape(b, hgt * wid, c)
    v = conv1x1(p["v"], h).reshape(b, hgt * wid, c)
    o = qkv_attention(q, k, v, None, 1).reshape(b, hgt, wid, c)
    return x + conv1x1(p["proj_out"], o)


def _mid(p, x, n_group=32):
    x = _resnet_block(p["block_1"], x, n_group)
    x = _attn_block(p["attn"], x, n_group)
    return _resnet_block(p["block_2"], x, n_group)


def encoder_forward(p, cfg: AutoencoderConfig, x: jnp.ndarray) -> jnp.ndarray:
    """RGB [B,H,W,3] in [-1,1] -> quant activations [B,H/8,W/8,8]."""
    x = conv2d(p["conv_in"], x)
    for i, bp in enumerate(p["blocks"]):
        x = _resnet_block(bp["res1"], x, cfg.n_group)
        x = _resnet_block(bp["res2"], x, cfg.n_group)
        if "downsampler" in bp:
            x = conv2d(bp["downsampler"], x, stride=2, padding=ASYM)
    x = _mid(p["mid"], x, cfg.n_group)
    x = silu(groupnorm_nhwc(x, **p["norm_out"], n_group=cfg.n_group))
    return conv2d(p["conv_out"], x)


def decoder_forward(p, cfg: AutoencoderConfig, x: jnp.ndarray) -> jnp.ndarray:
    """Latent [B,h,w,4] (post post_quant_conv) -> RGB [B,8h,8w,3]."""
    x = conv2d(p["conv_in"], x)
    x = _mid(p["mid"], x, cfg.n_group)
    for bp in p["blocks"]:
        x = _resnet_block(bp["res1"], x, cfg.n_group)
        x = _resnet_block(bp["res2"], x, cfg.n_group)
        x = _resnet_block(bp["res3"], x, cfg.n_group)
        if "upsampler" in bp:
            # NOTE: the phase-decomposed upsample conv (ops/conv.py) was
            # measured SLOWER here (177 vs 153 ms decode, /tmp A/B on v5e):
            # the f32 decoder's direct conv already runs ~88% MFU and the
            # 4-phase interleave adds large-layout copies at 512-1024px.
            # The UNet (bf16, smaller spatial) keeps the fused form.
            x = conv2d(bp["upsampler"], upsample_nearest_2x(x))
    x = silu(groupnorm_nhwc(x, **p["norm_out"], n_group=cfg.n_group))
    return conv2d(p["conv_out"], x)


def encode_image(params, cfg: AutoencoderConfig, x: jnp.ndarray) -> jnp.ndarray:
    """Image -> posterior mean latent (first 4 of 8 quant channels).

    Mirrors Autoencoder::encode_image (autoencoder/mod.rs:59-65).
    """
    h = encoder_forward(params["encoder"], cfg, x)
    if "quant_conv" in params:  # Flux VAEs ship without the quant convs
        h = conv1x1(params["quant_conv"], h)
    return h[..., : cfg.latent_channels]


def decode_latent(params, cfg: AutoencoderConfig, latent: jnp.ndarray) -> jnp.ndarray:
    """Latent -> RGB in [-1,1] (autoencoder/mod.rs:67-70)."""
    h = (conv1x1(params["post_quant_conv"], latent)
         if "post_quant_conv" in params else latent)
    return decoder_forward(params["decoder"], cfg, h)


# ---------------------------------------------------------------------------
# Initialization (tests / bring-up without real weights)
# ---------------------------------------------------------------------------

def _init_conv(key, kh, kw, cin, cout, dtype, scale=0.05):
    return {
        "w": jax.random.normal(key, (kh, kw, cin, cout), dtype) * scale,
        "b": jnp.zeros((cout,), dtype),
    }


def _init_gn(c, dtype):
    return {"gamma": jnp.ones((c,), dtype), "beta": jnp.zeros((c,), dtype)}


def _init_resnet(key, cin, cout, dtype):
    ks = jax.random.split(key, 3)
    p = {
        "norm1": _init_gn(cin, dtype),
        "conv1": _init_conv(ks[0], 3, 3, cin, cout, dtype),
        "norm2": _init_gn(cout, dtype),
        "conv2": _init_conv(ks[1], 3, 3, cout, cout, dtype),
    }
    if cin != cout:
        p["nin_shortcut"] = _init_conv(ks[2], 1, 1, cin, cout, dtype)
    return p


def _init_mid(key, c, dtype):
    ks = jax.random.split(key, 6)
    return {
        "block_1": _init_resnet(ks[0], c, c, dtype),
        "attn": {
            "norm": _init_gn(c, dtype),
            "q": _init_conv(ks[1], 1, 1, c, c, dtype),
            "k": _init_conv(ks[2], 1, 1, c, c, dtype),
            "v": _init_conv(ks[3], 1, 1, c, c, dtype),
            "proj_out": _init_conv(ks[4], 1, 1, c, c, dtype),
        },
        "block_2": _init_resnet(ks[5], c, c, dtype),
    }


def init_autoencoder(key, cfg: AutoencoderConfig, dtype=jnp.float32):
    keys = jax.random.split(key, 16)
    ki = iter(keys)

    enc_first = cfg.encoder_channels[0][1]
    # reference reads channels.last().0 (autoencoder/mod.rs:87) — identical to
    # .1 for the SDXL plan (512,512); the data flow requires the OUT channels.
    enc_last = cfg.encoder_channels[-1][1]
    enc_blocks = []
    for i, (cin, cout) in enumerate(cfg.encoder_channels):
        ks = jax.random.split(next(ki), 3)
        bp = {
            "res1": _init_resnet(ks[0], cin, cout, dtype),
            "res2": _init_resnet(ks[1], cout, cout, dtype),
        }
        if i != len(cfg.encoder_channels) - 1:
            bp["downsampler"] = _init_conv(ks[2], 3, 3, cout, cout, dtype)
        enc_blocks.append(bp)

    dec_first = cfg.decoder_channels[0][0]
    dec_last = cfg.decoder_channels[-1][1]
    dec_blocks = []
    for i, (cin, cout) in enumerate(cfg.decoder_channels):
        ks = jax.random.split(next(ki), 4)
        bp = {
            "res1": _init_resnet(ks[0], cin, cout, dtype),
            "res2": _init_resnet(ks[1], cout, cout, dtype),
            "res3": _init_resnet(ks[2], cout, cout, dtype),
        }
        if i != len(cfg.decoder_channels) - 1:
            bp["upsampler"] = _init_conv(ks[3], 3, 3, cout, cout, dtype)
        dec_blocks.append(bp)

    return {
        "encoder": {
            "conv_in": _init_conv(next(ki), 3, 3, 3, enc_first, dtype),
            "blocks": enc_blocks,
            "mid": _init_mid(next(ki), enc_last, dtype),
            "norm_out": _init_gn(enc_last, dtype),
            "conv_out": _init_conv(next(ki), 3, 3, enc_last, cfg.n_channels_out, dtype),
        },
        "decoder": {
            "conv_in": _init_conv(next(ki), 3, 3, cfg.latent_channels, dec_first, dtype),
            "mid": _init_mid(next(ki), dec_first, dtype),
            "blocks": dec_blocks,
            "norm_out": _init_gn(dec_last, dtype),
            "conv_out": _init_conv(next(ki), 3, 3, dec_last, 3, dtype),
        },
        "quant_conv": _init_conv(
            next(ki), 1, 1, cfg.n_channels_out, cfg.n_channels_out, dtype
        ),
        "post_quant_conv": _init_conv(
            next(ki), 1, 1, cfg.latent_channels, cfg.latent_channels, dtype
        ),
    }
