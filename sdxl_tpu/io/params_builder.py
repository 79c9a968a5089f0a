"""Build sdxl_tpu parameter pytrees from a reference checkpoint RecordSource.

The record field names follow the reference's Rust modules (identical for
.npy trees and .mpk records — the dump scripts mirror the struct fields):
  - CLIP:   clip/load.rs:79-115 (query/key/value/out, fc1/fc2, blocks/{i})
  - UNet:   unet/load.rs:17-401 (type-tagged block list, norm_in/conv_in/
            lin_embed/..., transformer blocks norm1/attn1/...)
  - VAE:    autoencoder/load.rs:17-201 (res1/res2(/res3), downsampler.conv,
            upsampler, mid.block_1/attn/block_2, quant/post_quant convs)

Layout conversions applied here, once, at load time:
  - conv weights OIHW -> HWIO (NHWC compute)
  - linear weights are already [d_in, d_out] in the dumps (save.py:23)
  - norm scales: npy "weight"/"bias" vs mpk "gamma"/"beta"
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..configs import AutoencoderConfig, CLIPConfig, UNetConfig
from ..models.unet import unet_block_plan
from .record_source import RecordSource

_NPY_TYPE_TO_KIND = {
    "conv": "conv",
    "resnet": "res",
    "downsample": "down",
    "resnet_transformer": "res_t",
    "resnet_transformer_upsample": "res_t_up",
    "resnet_upsample": "res_up",
}


def _as(dtype):
    return lambda a: jnp.asarray(np.ascontiguousarray(a), dtype=dtype)


def _linear(src: RecordSource, cast):
    p = {"w": cast(src.tensor("weight", 2))}
    b = src.opt_tensor("bias", 1)
    if b is not None:
        p["b"] = cast(b)
    return p


def _conv(src: RecordSource, cast):
    w = src.tensor("weight", 4)  # OIHW
    p = {"w": cast(np.transpose(w, (2, 3, 1, 0)))}  # -> HWIO
    b = src.opt_tensor("bias", 1)
    if b is not None:
        p["b"] = cast(b)
    return p


def _norm(src: RecordSource, cast, n_channel=None):
    gamma = None
    beta = None
    try:
        gamma = src.tensor_any(["gamma", "weight"], 1)
    except KeyError:
        pass
    try:
        beta = src.tensor_any(["beta", "bias"], 1)
    except KeyError:
        pass
    # groupnorm loader tolerates missing affine (groupnorm/load.rs:21-28)
    if gamma is None:
        assert n_channel is not None, "affine-less norm needs channel count"
        gamma = np.ones((n_channel,), np.float32)
    if beta is None:
        beta = np.zeros_like(gamma)
    return {"gamma": cast(gamma), "beta": cast(beta)}


def _enum_inner(entry):
    """mpk block entries are externally-tagged enums; npy dirs are flat."""
    inner = getattr(entry, "enum_inner", None)
    if inner is not None and getattr(entry, "enum_variant", lambda: None)() is not None:
        return entry.enum_inner()
    return entry


# ---------------------------------------------------------------------------
# CLIP
# ---------------------------------------------------------------------------

def build_clip(src: RecordSource, cfg: CLIPConfig, dtype=jnp.float32):
    cast = _as(dtype)

    def mha(s):
        return {
            "q": _linear(s.child("query"), cast),
            "k": _linear(s.child("key"), cast),
            "v": _linear(s.child("value"), cast),
            "out": _linear(s.child("out"), cast),
        }

    blocks = []
    for b in src.seq("blocks"):
        blocks.append(
            {
                "attn": mha(b.child("attn")),
                "attn_ln": _norm(b.child("attn_ln"), cast),
                "mlp": {
                    "fc1": _linear(b.child("mlp").child("fc1"), cast),
                    "fc2": _linear(b.child("mlp").child("fc2"), cast),
                },
                "mlp_ln": _norm(b.child("mlp_ln"), cast),
            }
        )

    # position_embedding: bare Param in mpk, {dir}/weight.npy in the dump
    pos = src.opt_tensor("position_embedding", 2)
    if pos is None:
        pos = src.child("position_embedding").tensor("weight", 2)

    params = {
        "token_embedding": cast(src.child("token_embedding").tensor("weight", 2)),
        "position_embedding": cast(pos),
        "blocks": blocks,
        "layer_norm": _norm(src.child("layer_norm"), cast),
    }
    tp = src.opt_tensor("text_projection", 2)
    params["text_projection"] = cast(tp) if tp is not None else None
    return params


# ---------------------------------------------------------------------------
# UNet
# ---------------------------------------------------------------------------

def _res_block(src: RecordSource, cast):
    p = {
        "norm_in": _norm(src.child("norm_in"), cast),
        "conv_in": _conv(src.child("conv_in"), cast),
        "lin_embed": _linear(src.child("lin_embed"), cast),
        "norm_out": _norm(src.child("norm_out"), cast),
        "conv_out": _conv(src.child("conv_out"), cast),
    }
    skip = src.opt_child("skip_connection")
    if skip is not None:
        try:
            p["skip"] = _conv(skip, cast)
        except (KeyError, FileNotFoundError):
            pass
    return p


def _mha_nobias(src: RecordSource, cast):
    return {
        "q": _linear(src.child("query"), cast),
        "k": _linear(src.child("key"), cast),
        "v": _linear(src.child("value"), cast),
        "out": _linear(src.child("out"), cast),
    }


def _transformer_block(src: RecordSource, cast):
    return {
        "norm1": _norm(src.child("norm1"), cast),
        "attn1": _mha_nobias(src.child("attn1"), cast),
        "norm2": _norm(src.child("norm2"), cast),
        "attn2": _mha_nobias(src.child("attn2"), cast),
        "norm3": _norm(src.child("norm3"), cast),
        "mlp": {
            "proj": _linear(src.child("mlp").child("geglu").child("proj"), cast),
            "lin": _linear(src.child("mlp").child("lin"), cast),
        },
    }


def _spatial_transformer(src: RecordSource, cast):
    return {
        "norm": _norm(src.child("norm"), cast),
        "proj_in": _linear(src.child("proj_in"), cast),
        "blocks": [
            _transformer_block(b, cast)
            for b in src.seq("blocks", alias="transformer")
        ],
        "proj_out": _linear(src.child("proj_out"), cast),
    }


def _unet_block(kind: str, entry: RecordSource, cast):
    inner = _enum_inner(entry)
    if kind == "conv" or kind == "down":
        return {"conv": _conv(inner, cast)}
    if kind == "res":
        return {"res": _res_block(inner, cast)}
    p = {"res": _res_block(inner.child("res"), cast)}
    if kind in ("res_t", "res_t_up"):
        p["transformer"] = _spatial_transformer(inner.child("transformer"), cast)
    if kind in ("res_up", "res_t_up"):
        p["upsample"] = _conv(inner.child("upsample").child("conv"), cast)
    return p


def build_unet(src: RecordSource, cfg: UNetConfig, dtype=jnp.bfloat16):
    cast = _as(dtype)
    in_plan, _, out_plan = unet_block_plan(cfg)

    def blocks(name, plan):
        entries = src.seq(name)
        if len(entries) != len(plan):
            raise ValueError(
                f"{name}: checkpoint has {len(entries)} blocks, config expects "
                f"{len(plan)} — wrong config for these weights?"
            )
        out = []
        for spec, entry in zip(plan, entries):
            kind = _NPY_TYPE_TO_KIND[entry.block_type()]
            if kind != spec.kind:
                raise ValueError(
                    f"{name}: block kind mismatch {kind} != {spec.kind}"
                )
            out.append(_unet_block(kind, entry, cast))
        return out

    mid = src.child("middle_block")
    return {
        "time_embed": {
            "lin1": _linear(src.child("lin1_time_embed"), cast),
            "lin2": _linear(src.child("lin2_time_embed"), cast),
        },
        "label_embed": {
            "lin1": _linear(src.child("lin1_label_embed"), cast),
            "lin2": _linear(src.child("lin2_label_embed"), cast),
        },
        "input_blocks": blocks("input_blocks", in_plan),
        "middle_block": {
            "res1": _res_block(mid.child("res1"), cast),
            "transformer": _spatial_transformer(mid.child("transformer"), cast),
            "res2": _res_block(mid.child("res2"), cast),
        },
        "output_blocks": blocks("output_blocks", out_plan),
        "norm_out": _norm(src.child("norm_out"), cast, cfg.model_channels),
        "conv_out": _conv(src.child("conv_out"), cast),
    }


# ---------------------------------------------------------------------------
# VAE
# ---------------------------------------------------------------------------

def _vae_resnet(src: RecordSource, cast):
    p = {
        "norm1": _norm(src.child("norm1"), cast),
        "conv1": _conv(src.child("conv1"), cast),
        "norm2": _norm(src.child("norm2"), cast),
        "conv2": _conv(src.child("conv2"), cast),
    }
    nin = src.opt_child("nin_shortcut")
    if nin is not None:
        try:
            p["nin_shortcut"] = _conv(nin, cast)
        except (KeyError, FileNotFoundError):
            pass
    return p


def _vae_mid(src: RecordSource, cast):
    attn = src.child("attn")
    return {
        "block_1": _vae_resnet(src.child("block_1"), cast),
        "attn": {
            "norm": _norm(attn.child("norm"), cast),
            "q": _conv(attn.child("q"), cast),
            "k": _conv(attn.child("k"), cast),
            "v": _conv(attn.child("v"), cast),
            "proj_out": _conv(attn.child("proj_out"), cast),
        },
        "block_2": _vae_resnet(src.child("block_2"), cast),
    }


def build_autoencoder(src: RecordSource, cfg: AutoencoderConfig, dtype=jnp.float32):
    cast = _as(dtype)

    enc = src.child("encoder")
    enc_blocks = []
    for b in enc.seq("blocks"):
        bp = {
            "res1": _vae_resnet(b.child("res1"), cast),
            "res2": _vae_resnet(b.child("res2"), cast),
        }
        down = b.opt_child("downsampler")
        if down is not None:
            try:
                bp["downsampler"] = _conv(down.child("conv"), cast)
            except (KeyError, FileNotFoundError):
                pass
        enc_blocks.append(bp)

    dec = src.child("decoder")
    dec_blocks = []
    for b in dec.seq("blocks"):
        bp = {
            "res1": _vae_resnet(b.child("res1"), cast),
            "res2": _vae_resnet(b.child("res2"), cast),
            "res3": _vae_resnet(b.child("res3"), cast),
        }
        up = b.opt_child("upsampler")
        if up is not None:
            try:
                bp["upsampler"] = _conv(up, cast)
            except (KeyError, FileNotFoundError):
                pass
        dec_blocks.append(bp)

    return {
        "encoder": {
            "conv_in": _conv(enc.child("conv_in"), cast),
            "blocks": enc_blocks,
            "mid": _vae_mid(enc.child("mid"), cast),
            "norm_out": _norm(enc.child("norm_out"), cast),
            "conv_out": _conv(enc.child("conv_out"), cast),
        },
        "decoder": {
            "conv_in": _conv(dec.child("conv_in"), cast),
            "mid": _vae_mid(dec.child("mid"), cast),
            "blocks": dec_blocks,
            "norm_out": _norm(dec.child("norm_out"), cast),
            "conv_out": _conv(dec.child("conv_out"), cast),
        },
        "quant_conv": _conv(src.child("quant_conv"), cast),
        "post_quant_conv": _conv(src.child("post_quant_conv"), cast),
    }
