"""Writer for burn NamedMpkFileRecorder checkpoints (.mpk).

Completes the interop loop with the reference: the reader (burn_mpk.py)
consumes the reference's converted checkpoints; this writer produces the
same layout (convert/main.rs:65-70 output, read back at sample/main.rs:28-51)
from sdxl_tpu parameter pytrees, so models imported from HF/diffusers/native
checkpoints can be exported for the reference's `sample` binary.

Layout written (the strictest variant of the fuzz matrix the reader pins):
  BurnRecord {item, metadata}; ParamSerde {id, param} around each tensor;
  DataSerialize {value: [u16 f16 bits], shape} leaves (HalfPrecisionSettings:
  half::f16 serializes as its bit pattern — convert/main.rs:69); module
  field names per the reference structs (clip/load.rs, unet/load.rs,
  autoencoder/load.rs); UNet block Vec entries externally enum-tagged
  ({"Res": {...}}, unet/mod.rs:508-529); conv weights transposed back
  HWIO -> OIHW; the DDPM table under `alpha_cumulative_products`
  (stablediffusion/load.rs:56-57).
"""

from __future__ import annotations

import itertools

import msgpack
import numpy as np

from ..configs import UNetConfig
from ..models.unet import unet_block_plan

_KIND_TO_ENUM = {
    "conv": "Conv",
    "res": "Res",
    "down": "Down",
    "res_t": "ResT",
    "res_t_up": "ResTU",
    "res_up": "ResU",
}

_ids = itertools.count()


def _tensor(arr, f16: bool = True):
    a = np.asarray(arr, np.float32)
    if f16:
        value = a.astype(np.float16).view(np.uint16).reshape(-1).tolist()
    else:
        value = a.reshape(-1).tolist()
    return {
        "id": f"param-{next(_ids)}",
        "param": {"value": value, "shape": list(a.shape)},
    }


def _linear(p, f16=True):
    d = {"weight": _tensor(p["w"], f16)}
    d["bias"] = _tensor(p["b"], f16) if "b" in p else None
    return d


def _unfuse_attn(p):
    """Writer-side inverse of fuse_unet_qkv (split the [C,3C] qkv)."""
    if "qkv" not in p:
        return p
    w = np.asarray(p["qkv"]["w"], np.float32)
    qw, kw, vw = np.split(w, 3, axis=-1)
    return {"q": {"w": qw}, "k": {"w": kw}, "v": {"w": vw}, "out": p["out"]}


def _conv(p, f16=True):
    if "w" not in p and "w4" in p:  # prepped upsample conv (fold_upsample_conv)
        from ..ops.conv import unfold_upsample_conv

        p = unfold_upsample_conv(p)
    d = {"weight": _tensor(np.transpose(np.asarray(p["w"], np.float32), (3, 2, 0, 1)), f16)}
    d["bias"] = _tensor(p["b"], f16) if "b" in p else None
    return d


def _norm(p, f16=True):
    return {"gamma": _tensor(p["gamma"], f16), "beta": _tensor(p["beta"], f16)}


def _mha(p, f16=True):
    p = _unfuse_attn(p)
    return {
        "query": _linear(p["q"], f16),
        "key": _linear(p["k"], f16),
        "value": _linear(p["v"], f16),
        "out": _linear(p["out"], f16),
    }


def clip_record(params, f16=True):
    return {
        "token_embedding": {"weight": _tensor(params["token_embedding"], f16)},
        "position_embedding": _tensor(params["position_embedding"], f16),
        "blocks": [
            {
                "attn": _mha(b["attn"], f16),
                "attn_ln": _norm(b["attn_ln"], f16),
                "mlp": {
                    "fc1": _linear(b["mlp"]["fc1"], f16),
                    "fc2": _linear(b["mlp"]["fc2"], f16),
                },
                "mlp_ln": _norm(b["mlp_ln"], f16),
            }
            for b in params["blocks"]
        ],
        "layer_norm": _norm(params["layer_norm"], f16),
        "text_projection": (
            _tensor(params["text_projection"], f16)
            if params.get("text_projection") is not None
            else None
        ),
    }


def _res(p, f16=True):
    d = {
        "norm_in": _norm(p["norm_in"], f16),
        "conv_in": _conv(p["conv_in"], f16),
        "lin_embed": _linear(p["lin_embed"], f16),
        "norm_out": _norm(p["norm_out"], f16),
        "conv_out": _conv(p["conv_out"], f16),
    }
    d["skip_connection"] = _conv(p["skip"], f16) if "skip" in p else None
    return d


def _unstack(node):
    """Writer-side inverse of stack_unet_transformers: a stacked blocks
    pytree (leading depth axis) back to a per-block list."""
    if isinstance(node, dict):
        leaves = []

        def depth_of(d):
            for v in d.values():
                if isinstance(v, dict):
                    r = depth_of(v)
                    if r is not None:
                        return r
                elif v is not None:
                    return np.asarray(v).shape[0]
            return None

        n = depth_of(node)

        def take(d, i):
            return {
                k: (take(v, i) if isinstance(v, dict)
                    else (None if v is None else np.asarray(v)[i]))
                for k, v in d.items()
            }

        return [take(node, i) for i in range(n)]
    return node


def _tblock(p, f16=True):
    return {
        "norm1": _norm(p["norm1"], f16),
        "attn1": _mha(p["attn1"], f16),
        "norm2": _norm(p["norm2"], f16),
        "attn2": _mha(p["attn2"], f16),
        "norm3": _norm(p["norm3"], f16),
        "mlp": {
            "geglu": {"proj": _linear(p["mlp"]["proj"], f16)},
            "lin": _linear(p["mlp"]["lin"], f16),
        },
    }


def _spatial(p, f16=True):
    blocks = p["blocks"]
    if isinstance(blocks, dict):
        blocks = _unstack(blocks)
    return {
        "norm": _norm(p["norm"], f16),
        "proj_in": _linear(p["proj_in"], f16),
        "blocks": [_tblock(b, f16) for b in blocks],
        "proj_out": _linear(p["proj_out"], f16),
    }


def _unet_block(kind, p, f16=True):
    # field placement mirrors the reader (params_builder._unet_block):
    # conv/down and bare res carry their fields directly on the enum inner;
    # transformer/upsample variants nest under res/transformer/upsample.conv
    if kind in ("conv", "down"):
        inner = _conv(p["conv"], f16)
    elif kind == "res":
        inner = _res(p["res"], f16)
    else:
        inner = {"res": _res(p["res"], f16)}
        if kind in ("res_t", "res_t_up"):
            inner["transformer"] = _spatial(p["transformer"], f16)
        if kind in ("res_up", "res_t_up"):
            inner["upsample"] = {"conv": _conv(p["upsample"], f16)}
    return {_KIND_TO_ENUM[kind]: inner}


def unet_record(cfg: UNetConfig, params, f16=True):
    if "label_embed" not in params:
        raise ValueError(
            "burn .mpk export covers the reference's SDXL models only "
            "(SD 1.x/2.x UNets have no label embedding and no burn "
            "counterpart to read them)"
        )
    in_plan, _, out_plan = unet_block_plan(cfg)
    return {
        "lin1_time_embed": _linear(params["time_embed"]["lin1"], f16),
        "lin2_time_embed": _linear(params["time_embed"]["lin2"], f16),
        "lin1_label_embed": _linear(params["label_embed"]["lin1"], f16),
        "lin2_label_embed": _linear(params["label_embed"]["lin2"], f16),
        "input_blocks": [
            _unet_block(spec.kind, p, f16)
            for spec, p in zip(in_plan, params["input_blocks"])
        ],
        "middle_block": {
            "res1": _res(params["middle_block"]["res1"], f16),
            "transformer": _spatial(params["middle_block"]["transformer"], f16),
            "res2": _res(params["middle_block"]["res2"], f16),
        },
        "output_blocks": [
            _unet_block(spec.kind, p, f16)
            for spec, p in zip(out_plan, params["output_blocks"])
        ],
        "norm_out": _norm(params["norm_out"], f16),
        "conv_out": _conv(params["conv_out"], f16),
    }


def _vae_res(p, f16=True):
    d = {
        "norm1": _norm(p["norm1"], f16),
        "conv1": _conv(p["conv1"], f16),
        "norm2": _norm(p["norm2"], f16),
        "conv2": _conv(p["conv2"], f16),
    }
    d["nin_shortcut"] = (
        _conv(p["nin_shortcut"], f16) if "nin_shortcut" in p else None
    )
    return d


def _vae_mid(p, f16=True):
    return {
        "block_1": _vae_res(p["block_1"], f16),
        "attn": {
            "norm": _norm(p["attn"]["norm"], f16),
            "q": _conv(p["attn"]["q"], f16),
            "k": _conv(p["attn"]["k"], f16),
            "v": _conv(p["attn"]["v"], f16),
            "proj_out": _conv(p["attn"]["proj_out"], f16),
        },
        "block_2": _vae_res(p["block_2"], f16),
    }


def autoencoder_record(params, f16=True):
    enc, dec = params["encoder"], params["decoder"]
    return {
        "encoder": {
            "conv_in": _conv(enc["conv_in"], f16),
            "blocks": [
                {
                    "res1": _vae_res(b["res1"], f16),
                    "res2": _vae_res(b["res2"], f16),
                    "downsampler": (
                        {"conv": _conv(b["downsampler"], f16)}
                        if "downsampler" in b else None
                    ),
                }
                for b in enc["blocks"]
            ],
            "mid": _vae_mid(enc["mid"], f16),
            "norm_out": _norm(enc["norm_out"], f16),
            "conv_out": _conv(enc["conv_out"], f16),
        },
        "decoder": {
            "conv_in": _conv(dec["conv_in"], f16),
            "mid": _vae_mid(dec["mid"], f16),
            "blocks": [
                {
                    "res1": _vae_res(b["res1"], f16),
                    "res2": _vae_res(b["res2"], f16),
                    "res3": _vae_res(b["res3"], f16),
                    "upsampler": (
                        _conv(b["upsampler"], f16) if "upsampler" in b else None
                    ),
                }
                for b in dec["blocks"]
            ],
            "norm_out": _norm(dec["norm_out"], f16),
            "conv_out": _conv(dec["conv_out"], f16),
        },
        "quant_conv": _conv(params["quant_conv"], f16),
        "post_quant_conv": _conv(params["post_quant_conv"], f16),
    }


def _write(path: str, item) -> None:
    record = {
        "item": item,
        "metadata": {
            "float": "f16",
            "int": "i32",
            "format": "NamedMpkFileRecorder",
            "version": "0.13.0",
            "settings": "HalfPrecisionSettings",
        },
    }
    with open(path, "wb") as f:
        f.write(msgpack.packb(record, use_single_float=True))


def write_embedder_mpk(path: str, embedder_params, f16=True) -> None:
    _write(path, {
        "clip": clip_record(embedder_params["clip"], f16),
        "open_clip": clip_record(embedder_params["open_clip"], f16),
    })


def write_diffuser_mpk(
    path: str, cfg: UNetConfig, unet_params, alphas_cumprod, f16=True
) -> None:
    _write(path, {
        "diffusion": unet_record(cfg, unet_params, f16),
        # the DDPM table rides with the weights, always f32
        # (stablediffusion/load.rs:56-57)
        "alpha_cumulative_products": _tensor(alphas_cumprod, f16=False),
    })


def write_latent_decoder_mpk(path: str, vae_params, f16=True) -> None:
    _write(path, {"autoencoder": autoencoder_record(vae_params, f16)})
