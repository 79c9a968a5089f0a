"""Export a UNet pytree to the diffusers checkpoint layout.

The exact inverse of io/diffusers_sdxl.py's build_unet_from_diffusers:
walks the same config-driven block plan and emits the diffusers key set
(`down_blocks.{L}.resnets.{j}...`), undoing the import transforms
(linear w.T, conv HWIO->OIHW, norm gamma/beta -> weight/bias). The
round-trip write -> build_unet_from_diffusers == original tree is
asserted in tests/test_diffusers_write.py, which makes the mapping
self-verifying against the loader the rest of the ecosystem relies on.

Primary consumer: full-parameter fine-tuning (cli/train.py --full) —
a trained UNet drops back into any diffusers checkpoint directory as
its `unet/` subfolder (the dreambooth convention: only the trained
tower is replaced; VAE/text encoders stay the base files). Capability
extension: the reference's weight surface is import-only.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np

from ..configs import UNetConfig
from ..models.unet import unet_block_plan


def _arr(x) -> np.ndarray:
    # ascontiguousarray, not asarray: safetensors serializes the raw
    # buffer, so a transposed VIEW would silently save wrong (the same
    # pitfall train/lora.py's exporter handles)
    return np.ascontiguousarray(np.asarray(x))


def _inv_linear(out: Dict[str, np.ndarray], key: str, p: dict) -> None:
    if "w" not in p:
        raise ValueError(
            f"{key}: quantized or LoRA-carrying linear cannot export to "
            f"diffusers; dequantize/merge first")
    out[f"{key}.weight"] = np.ascontiguousarray(_arr(p["w"]).T)
    if p.get("b") is not None:
        out[f"{key}.bias"] = _arr(p["b"])


def _inv_conv(out: Dict[str, np.ndarray], key: str, p: dict) -> None:
    if "w4" in p:
        raise ValueError(
            f"{key}: phase-decomposed upsample kernel; run "
            f"models.unet.unfold_unet_upsample on the tree first")
    out[f"{key}.weight"] = np.ascontiguousarray(
        np.transpose(_arr(p["w"]), (3, 2, 0, 1)))
    if p.get("b") is not None:
        out[f"{key}.bias"] = _arr(p["b"])


def _inv_norm(out: Dict[str, np.ndarray], key: str, p: dict) -> None:
    out[f"{key}.weight"] = _arr(p["gamma"])
    out[f"{key}.bias"] = _arr(p["beta"])


def _inv_res(out, key: str, p: dict) -> None:
    _inv_norm(out, f"{key}.norm1", p["norm_in"])
    _inv_conv(out, f"{key}.conv1", p["conv_in"])
    _inv_linear(out, f"{key}.time_emb_proj", p["lin_embed"])
    _inv_norm(out, f"{key}.norm2", p["norm_out"])
    _inv_conv(out, f"{key}.conv2", p["conv_out"])
    if "skip" in p:
        _inv_conv(out, f"{key}.conv_shortcut", p["skip"])


def _inv_attn(out, key: str, p: dict) -> None:
    if "qkv" in p or "q" not in p:
        raise ValueError(
            f"{key}: fused-qkv attention cannot export; run "
            f"models.unet.unfuse_unet_qkv first (cli/train.py loads "
            f"training towers unfused)")
    _inv_linear(out, f"{key}.to_q", p["q"])
    _inv_linear(out, f"{key}.to_k", p["k"])
    _inv_linear(out, f"{key}.to_v", p["v"])
    _inv_linear(out, f"{key}.to_out.0", p["out"])


def _inv_spatial(out, key: str, p: dict) -> None:
    _inv_norm(out, f"{key}.norm", p["norm"])
    _inv_linear(out, f"{key}.proj_in", p["proj_in"])
    blocks = p["blocks"]
    if not isinstance(blocks, (list, tuple)):
        raise ValueError(
            f"{key}: stacked (lax.scan) transformer blocks cannot export; "
            f"load with stack_transformers=False")
    for i, b in enumerate(blocks):
        t = f"{key}.transformer_blocks.{i}"
        _inv_norm(out, f"{t}.norm1", b["norm1"])
        _inv_attn(out, f"{t}.attn1", b["attn1"])
        _inv_norm(out, f"{t}.norm2", b["norm2"])
        _inv_attn(out, f"{t}.attn2", b["attn2"])
        _inv_norm(out, f"{t}.norm3", b["norm3"])
        _inv_linear(out, f"{t}.ff.net.0.proj", b["mlp"]["proj"])
        _inv_linear(out, f"{t}.ff.net.2", b["mlp"]["lin"])
    _inv_linear(out, f"{key}.proj_out", p["proj_out"])


def unet_to_diffusers(params: dict, cfg: UNetConfig) -> Dict[str, np.ndarray]:
    """Flat {diffusers key: numpy array} for a (unfused, unstacked) UNet
    pytree — the tensor inverse of build_unet_from_diffusers."""
    out: Dict[str, np.ndarray] = {}
    in_plan, _, out_plan = unet_block_plan(cfg)
    n_levels = len(cfg.channel_mults)
    input_blocks = params["input_blocks"]
    output_blocks = params["output_blocks"]
    if len(input_blocks) != len(in_plan) or len(output_blocks) != len(out_plan):
        raise ValueError(
            f"block count mismatch: {len(input_blocks)}/{len(output_blocks)} "
            f"vs plan {len(in_plan)}/{len(out_plan)}")

    _inv_linear(out, "time_embedding.linear_1", params["time_embed"]["lin1"])
    _inv_linear(out, "time_embedding.linear_2", params["time_embed"]["lin2"])
    if "cond_proj" in params["time_embed"]:
        _inv_linear(out, "time_embedding.cond_proj",
                    params["time_embed"]["cond_proj"])
    if params.get("label_embed"):
        _inv_linear(out, "add_embedding.linear_1",
                    params["label_embed"]["lin1"])
        _inv_linear(out, "add_embedding.linear_2",
                    params["label_embed"]["lin2"])

    _inv_conv(out, "conv_in", input_blocks[0]["conv"])
    i = 1
    for level in range(n_levels):
        d = f"down_blocks.{level}"
        for j in range(2):
            p = input_blocks[i]
            _inv_res(out, f"{d}.resnets.{j}", p["res"])
            if "transformer" in p:
                _inv_spatial(out, f"{d}.attentions.{j}", p["transformer"])
            i += 1
        if i < len(input_blocks) and "conv" in input_blocks[i]:
            _inv_conv(out, f"{d}.downsamplers.0.conv",
                      input_blocks[i]["conv"])
            i += 1

    mid = params["middle_block"]
    _inv_res(out, "mid_block.resnets.0", mid["res1"])
    _inv_spatial(out, "mid_block.attentions.0", mid["transformer"])
    _inv_res(out, "mid_block.resnets.1", mid["res2"])

    for k, p in enumerate(output_blocks):
        u, j = divmod(k, 3)
        _inv_res(out, f"up_blocks.{u}.resnets.{j}", p["res"])
        if "transformer" in p:
            _inv_spatial(out, f"up_blocks.{u}.attentions.{j}",
                         p["transformer"])
        if "upsample" in p:
            _inv_conv(out, f"up_blocks.{u}.upsamplers.0.conv",
                      p["upsample"])

    _inv_norm(out, "conv_norm_out", params["norm_out"])
    _inv_conv(out, "conv_out", params["conv_out"])
    return out


def controlnet_to_diffusers(params: dict, cfg: UNetConfig
                            ) -> Dict[str, np.ndarray]:
    """Flat {diffusers key: numpy array} for a models/controlnet.py tree —
    the tensor inverse of build_controlnet_from_diffusers: the UNet-copy
    trunk reuses unet_to_diffusers' input-side mapping, plus
    controlnet_cond_embedding.* and the controlnet_{down,mid}_block{s}
    zero convs."""
    out: Dict[str, np.ndarray] = {}
    in_plan, _, _ = unet_block_plan(cfg)
    n_levels = len(cfg.channel_mults)
    input_blocks = params["input_blocks"]
    if len(input_blocks) != len(in_plan):
        raise ValueError(
            f"controlnet block count mismatch: {len(input_blocks)} vs "
            f"plan {len(in_plan)}")

    _inv_linear(out, "time_embedding.linear_1", params["time_embed"]["lin1"])
    _inv_linear(out, "time_embedding.linear_2", params["time_embed"]["lin2"])
    if params.get("label_embed"):
        _inv_linear(out, "add_embedding.linear_1",
                    params["label_embed"]["lin1"])
        _inv_linear(out, "add_embedding.linear_2",
                    params["label_embed"]["lin2"])

    _inv_conv(out, "conv_in", input_blocks[0]["conv"])
    i = 1
    for level in range(n_levels):
        d = f"down_blocks.{level}"
        for j in range(2):
            p = input_blocks[i]
            _inv_res(out, f"{d}.resnets.{j}", p["res"])
            if "transformer" in p:
                _inv_spatial(out, f"{d}.attentions.{j}", p["transformer"])
            i += 1
        if i < len(input_blocks) and "conv" in input_blocks[i]:
            _inv_conv(out, f"{d}.downsamplers.0.conv",
                      input_blocks[i]["conv"])
            i += 1

    mid = params["middle_block"]
    _inv_res(out, "mid_block.resnets.0", mid["res1"])
    _inv_spatial(out, "mid_block.attentions.0", mid["transformer"])
    _inv_res(out, "mid_block.resnets.1", mid["res2"])

    ce = params["cond_embed"]
    _inv_conv(out, "controlnet_cond_embedding.conv_in", ce["conv_in"])
    for k, blk in enumerate(ce["blocks"]):
        _inv_conv(out, f"controlnet_cond_embedding.blocks.{2 * k}",
                  blk["conv1"])
        _inv_conv(out, f"controlnet_cond_embedding.blocks.{2 * k + 1}",
                  blk["conv2"])
    _inv_conv(out, "controlnet_cond_embedding.conv_out", ce["conv_out"])

    for k, zc in enumerate(params["zero_convs"]):
        _inv_conv(out, f"controlnet_down_blocks.{k}", zc)
    _inv_conv(out, "controlnet_mid_block", params["zero_conv_mid"])
    return out


def write_diffusers_controlnet_dir(
    out_dir: str,
    params: dict,
    cfg: UNetConfig,
    config_json_src: Optional[str] = None,
    dtype: Optional[np.dtype] = None,
) -> str:
    """Write `{out_dir}/{diffusion_pytorch_model.safetensors,config.json}`
    — a diffusers `ControlNetModel` directory (controlnet dirs are flat
    model dirs, unlike the unet/ subfolder convention). Loads back via
    io/diffusers_sdxl.py::load_controlnet_dir and the `--controlnet`
    CLI/server flag."""
    from safetensors.numpy import save_file

    os.makedirs(out_dir, exist_ok=True)
    flat = controlnet_to_diffusers(params, cfg)
    if dtype is not None:
        flat = {k: v.astype(dtype) for k, v in flat.items()}
    save_file(flat,
              os.path.join(out_dir, "diffusion_pytorch_model.safetensors"))

    src = (os.path.join(config_json_src, "config.json")
           if config_json_src else None)
    if src and os.path.isfile(src):
        with open(src) as f:
            meta = json.load(f)
    else:
        from ..models.controlnet import COND_EMBED_CHANNELS

        n = len(cfg.channel_mults)
        down = [("CrossAttnDownBlock2D" if lvl in cfg.transformer_levels
                 else "DownBlock2D") for lvl in range(n)]
        meta = {
            "_class_name": "ControlNetModel",
            "in_channels": cfg.in_channels,
            "conditioning_channels": 3,
            "conditioning_embedding_out_channels":
                list(COND_EMBED_CHANNELS),
            "block_out_channels": [cfg.model_channels * m
                                   for m in cfg.channel_mults],
            "down_block_types": down,
            "layers_per_block": 2,
            "transformer_layers_per_block": list(cfg.transformer_depths),
            "cross_attention_dim": cfg.context_dim,
            "attention_head_dim": cfg.n_head_channels,
            "addition_embed_type": ("text_time" if cfg.adm_in_channels
                                    else None),
            "projection_class_embeddings_input_dim":
                cfg.adm_in_channels or None,
        }
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(meta, f, indent=2)
    return out_dir


def write_diffusers_unet_dir(
    out_dir: str,
    params: dict,
    cfg: UNetConfig,
    config_json_src: Optional[str] = None,
    dtype: Optional[np.dtype] = None,
) -> str:
    """Write `{out_dir}/unet/{diffusion_pytorch_model.safetensors,
    config.json}`. config.json is copied from the source checkpoint's
    unet/config.json when available (the authoritative metadata);
    otherwise a minimal one is synthesized from cfg so diffusers can
    still instantiate the class."""
    from safetensors.numpy import save_file

    unet_dir = os.path.join(out_dir, "unet")
    os.makedirs(unet_dir, exist_ok=True)
    flat = unet_to_diffusers(params, cfg)
    if dtype is not None:
        flat = {k: v.astype(dtype) for k, v in flat.items()}
    save_file(flat, os.path.join(unet_dir, "diffusion_pytorch_model.safetensors"))

    cfg_path = os.path.join(unet_dir, "config.json")
    src = (os.path.join(config_json_src, "unet", "config.json")
           if config_json_src else None)
    if src and os.path.isfile(src):
        with open(src) as f:
            meta = json.load(f)
    else:
        n = len(cfg.channel_mults)
        down, up = [], []
        for lvl in range(n):
            attn = lvl in cfg.transformer_levels
            down.append("CrossAttnDownBlock2D" if attn else "DownBlock2D")
        for lvl in reversed(range(n)):
            attn = lvl in cfg.transformer_levels
            up.append("CrossAttnUpBlock2D" if attn else "UpBlock2D")
        meta = {
            "_class_name": "UNet2DConditionModel",
            "in_channels": cfg.in_channels,
            "out_channels": cfg.out_channels,
            "block_out_channels": [cfg.model_channels * m
                                   for m in cfg.channel_mults],
            "down_block_types": down,
            "up_block_types": up,
            "layers_per_block": 2,
            "transformer_layers_per_block": list(cfg.transformer_depths),
            "cross_attention_dim": cfg.context_dim,
            "attention_head_dim": cfg.n_head_channels,
            "addition_embed_type": ("text_time" if cfg.adm_in_channels
                                    else None),
            "projection_class_embeddings_input_dim":
                cfg.adm_in_channels or None,
        }
    with open(cfg_path, "w") as f:
        json.dump(meta, f, indent=2)
    return unet_dir
