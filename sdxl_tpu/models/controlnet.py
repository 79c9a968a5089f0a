"""ControlNet (Zhang et al. 2023, arXiv:2302.05543) for the SDXL/SD UNets.

Capability extension — the reference has no ControlNet. The architecture is
the public one (diffusers `ControlNetModel` semantics, which is itself the
original lllyasviel/ControlNet design):

  - a trainable copy of the UNet's input blocks + middle block (the
    "control trunk"), reusing this framework's config-driven block plan
    (models/unet.py::unet_block_plan — the same generator that builds the
    base UNet, so any family the UNet config can express is supported);
  - a small conv stack (`cond_embed`) that embeds the full-resolution
    conditioning image (canny edges, depth, pose, ...) down to latent
    resolution and is ADDED to the trunk's conv_in output;
  - one zero-initialized 1x1 "zero conv" per input block plus one for the
    middle block; their outputs are the residuals the main UNet adds to
    its skip connections (down residuals) and to its middle-block output
    (mid residual).

With freshly initialized (zero) zero-convs the residuals are exactly zero
and the guided UNet output equals the unguided one — asserted in
tests/test_controlnet.py.

TPU notes: everything is NHWC like the UNet; the trunk runs in the same
compute dtype (bf16) inside the sampling scan; the conditioning-image
embedding and the cross-attention K/V projections are loop-invariant and
hoisted out of the scan by the sampler.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..configs import UNetConfig
from ..ops.conv import conv1x1, conv2d
from ..ops.embeddings import timestep_embedding
from ..ops.linear import linear
from .unet import (
    _apply_block,
    _init_block,
    _init_res,
    _init_spatial_transformer,
    _res_block,
    _spatial_transformer,
    silu,
    unet_block_plan,
)

# diffusers ControlNetConditioningEmbedding channel plan
COND_EMBED_CHANNELS = (16, 32, 96, 256)


def control_cond_embed(params, image: jnp.ndarray) -> jnp.ndarray:
    """Embed the conditioning image to latent resolution.

    image: [B, H, W, 3] in [0, 1] (the diffusers convention for control
    images — NOT the [-1, 1] of VAE inputs). Three stride-2 convs bring
    H,W down by 8 to the latent grid; conv_out is one of the zero convs
    (zero at init). Mirrors diffusers' ControlNetConditioningEmbedding.
    """
    x = silu(conv2d(params["conv_in"], image))
    for blk in params["blocks"]:
        x = silu(conv2d(blk["conv1"], x))
        x = silu(conv2d(blk["conv2"], x, stride=2))
    return conv2d(params["conv_out"], x)


def controlnet_forward(
    params,
    cfg: UNetConfig,
    x: jnp.ndarray,
    timesteps: jnp.ndarray,
    context: jnp.ndarray,
    label: Optional[jnp.ndarray],
    cond_emb: jnp.ndarray,
    cross_kv=None,
) -> Tuple[List[jnp.ndarray], jnp.ndarray]:
    """Run the control trunk; return (down_residuals, mid_residual).

    x/timesteps/context/label: exactly the main UNet's inputs (already
    CFG-pair-batched by the sampler). cond_emb: control_cond_embed()
    output, [B, h, w, model_channels] at latent resolution (loop-invariant,
    computed once outside the sampling scan). cross_kv: optional
    precompute_control_cross_kv() output.

    down_residuals has one entry per input block (len == len(in_plan)),
    aligned with the main UNet's `saved` skip list; mid_residual matches
    the middle-block output shape.
    """
    dtype = x.dtype
    t_emb = timestep_embedding(timesteps, cfg.model_channels).astype(dtype)
    t_emb = linear(params["time_embed"]["lin2"],
                   silu(linear(params["time_embed"]["lin1"], t_emb)))
    if cfg.adm_in_channels:
        label_emb = linear(
            params["label_embed"]["lin2"],
            silu(linear(params["label_embed"]["lin1"], label.astype(dtype))),
        )
        emb = t_emb + label_emb
    else:
        emb = t_emb

    in_plan, mid_spec, _ = unet_block_plan(cfg)
    ckv = cross_kv or {}

    down = []
    for i, (spec, p, zc) in enumerate(
        zip(in_plan, params["input_blocks"], params["zero_convs"])
    ):
        x = _apply_block(spec, p, x, emb, context,
                         ckv.get("input_blocks", {}).get(i))
        if i == 0:
            # conv_in output + conditioning-image embedding (the injection
            # point of the original architecture)
            x = x + cond_emb.astype(x.dtype)
        down.append(conv1x1(zc, x))

    mp = params["middle_block"]
    x = _res_block(mp["res1"], x, emb)
    x = _spatial_transformer(mp["transformer"], x, context, mid_spec.n_head,
                             ckv.get("middle_block"))
    x = _res_block(mp["res2"], x, emb)
    mid = conv1x1(params["zero_conv_mid"], x)
    return down, mid


def precompute_control_cross_kv(params, cfg: UNetConfig, context: jnp.ndarray):
    """Loop-invariant cross-attention K/V for the control trunk (input
    blocks + middle only — ControlNet has no output blocks). Same layout
    as models/unet.py::precompute_cross_kv."""
    from .unet import precompute_cross_kv

    shim = {
        "input_blocks": params["input_blocks"],
        "middle_block": params["middle_block"],
        "output_blocks": [],
    }
    out = precompute_cross_kv(shim, cfg, context)
    out["output_blocks"] = {}
    return out


# ---------------------------------------------------------------------------
# Initialization (tests / bring-up without real weights)
# ---------------------------------------------------------------------------

def _zero_conv1x1(c_in, c_out, dtype):
    return {
        "w": jnp.zeros((1, 1, c_in, c_out), dtype),
        "b": jnp.zeros((c_out,), dtype),
    }


def init_cond_embed(key, model_channels: int, dtype=jnp.bfloat16,
                    cond_channels: int = 3):
    chans = COND_EMBED_CHANNELS
    ks = jax.random.split(key, 2 * len(chans))
    ki = iter(ks)

    def _c(k, kh, cin, cout, scale=0.05):
        return {
            "w": jax.random.normal(k, (kh, kh, cin, cout), dtype) * scale,
            "b": jnp.zeros((cout,), dtype),
        }

    blocks = []
    for i in range(len(chans) - 1):
        blocks.append({
            "conv1": _c(next(ki), 3, chans[i], chans[i]),
            "conv2": _c(next(ki), 3, chans[i], chans[i + 1]),
        })
    return {
        "conv_in": _c(next(ki), 3, cond_channels, chans[0]),
        "blocks": blocks,
        # zero conv: exact no-op at init
        "conv_out": {
            "w": jnp.zeros((3, 3, chans[-1], model_channels), dtype),
            "b": jnp.zeros((model_channels,), dtype),
        },
    }


def init_controlnet(key, cfg: UNetConfig, dtype=jnp.bfloat16):
    """Random trunk + zero zero-convs: residuals are exactly zero, so a
    freshly initialized ControlNet leaves the UNet output unchanged."""
    from .unet import _dense

    in_plan, mid_spec, _ = unet_block_plan(cfg)
    keys = jax.random.split(key, len(in_plan) + 8)
    ki = iter(keys)
    emb_dim = cfg.time_embed_dim
    mc = cfg.model_channels

    params = {
        "time_embed": {
            "lin1": _dense(next(ki), mc, emb_dim, dtype),
            "lin2": _dense(next(ki), emb_dim, emb_dim, dtype),
        },
        "cond_embed": init_cond_embed(next(ki), mc, dtype),
        "input_blocks": [
            _init_block(next(ki), spec, cfg, dtype) for spec in in_plan
        ],
        "zero_convs": [
            _zero_conv1x1(spec.ch_out, spec.ch_out, dtype) for spec in in_plan
        ],
        "middle_block": {
            "res1": _init_res(next(ki), mid_spec.ch_in, mid_spec.ch_out,
                              emb_dim, dtype),
            "transformer": _init_spatial_transformer(
                next(ki), mid_spec.ch_out, cfg.context_dim, mid_spec.depth,
                dtype),
            "res2": _init_res(next(ki), mid_spec.ch_in, mid_spec.ch_out,
                              emb_dim, dtype),
        },
        "zero_conv_mid": _zero_conv1x1(mid_spec.ch_out, mid_spec.ch_out,
                                       dtype),
    }
    if cfg.adm_in_channels:
        params["label_embed"] = {
            "lin1": _dense(next(ki), cfg.adm_in_channels, emb_dim, dtype),
            "lin2": _dense(next(ki), emb_dim, emb_dim, dtype),
        }
    return params
