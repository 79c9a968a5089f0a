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


def _head_dim_field(cfg: UNetConfig):
    """diffusers' `attention_head_dim` historically holds the HEAD COUNT
    (the famous naming quirk UNet2DConditionModel preserves:
    num_attention_heads defaults to attention_head_dim) — real SDXL
    configs ship [5, 10, 20] (= channels/64 per level) and SD1.5 ships 8
    (fixed heads). Emit the same quirk-compatible form so diffusers
    instantiates the right head counts."""
    if cfg.n_heads:
        return cfg.n_heads
    return [cfg.model_channels * m // cfg.n_head_channels
            for m in cfg.channel_mults]


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
            "attention_head_dim": _head_dim_field(cfg),
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
            "attention_head_dim": _head_dim_field(cfg),
            "addition_embed_type": ("text_time" if cfg.adm_in_channels
                                    else None),
            "projection_class_embeddings_input_dim":
                cfg.adm_in_channels or None,
        }
    with open(cfg_path, "w") as f:
        json.dump(meta, f, indent=2)
    return unet_dir


# ---------------------------------------------------------------------------
# text towers / VAE / full pipeline (the tensor inverses of
# io/hf_sdxl.build_clip_from_hf and io/diffusers_sdxl.build_vae_from_diffusers)
# ---------------------------------------------------------------------------


def clip_to_hf(params: dict, with_projection: bool = False
               ) -> Dict[str, np.ndarray]:
    """Flat HF-transformers CLIPTextModel tensors for a models/clip.py
    tree — the exact inverse of io/hf_sdxl.build_clip_from_hf (linears
    transposed back to torch [out, in]; text_projection, when present,
    emitted at the TOP level like HF CLIPTextModelWithProjection —
    the loader re-prefixes it)."""
    out: Dict[str, np.ndarray] = {}
    pre = "text_model"
    out[f"{pre}.embeddings.token_embedding.weight"] = _arr(
        params["token_embedding"])
    out[f"{pre}.embeddings.position_embedding.weight"] = _arr(
        params["position_embedding"])
    for i, blk in enumerate(params["blocks"]):
        s = f"{pre}.encoder.layers.{i}"
        _inv_linear(out, f"{s}.self_attn.q_proj", blk["attn"]["q"])
        _inv_linear(out, f"{s}.self_attn.k_proj", blk["attn"]["k"])
        _inv_linear(out, f"{s}.self_attn.v_proj", blk["attn"]["v"])
        _inv_linear(out, f"{s}.self_attn.out_proj", blk["attn"]["out"])
        _inv_norm(out, f"{s}.layer_norm1", blk["attn_ln"])
        _inv_linear(out, f"{s}.mlp.fc1", blk["mlp"]["fc1"])
        _inv_linear(out, f"{s}.mlp.fc2", blk["mlp"]["fc2"])
        _inv_norm(out, f"{s}.layer_norm2", blk["mlp_ln"])
    _inv_norm(out, f"{pre}.final_layer_norm", params["layer_norm"])
    if with_projection:
        proj = params.get("text_projection")
        if proj is None:
            raise ValueError("with_projection=True but the tower has no "
                             "text_projection (not a bigG/pooled tower?)")
        out["text_projection.weight"] = np.ascontiguousarray(_arr(proj).T)
    return out


def _inv_vae_attn_linear(out, key: str, p: dict) -> None:
    # ours: 1x1 conv [1,1,in,out] (ldm layout); diffusers: Linear [out,in]
    w = _arr(p["w"])[0, 0]  # [in, out]
    out[f"{key}.weight"] = np.ascontiguousarray(w.T)
    if p.get("b") is not None:
        out[f"{key}.bias"] = _arr(p["b"])


def _inv_vae_res(out, key: str, p: dict) -> None:
    _inv_norm(out, f"{key}.norm1", p["norm1"])
    _inv_conv(out, f"{key}.conv1", p["conv1"])
    _inv_norm(out, f"{key}.norm2", p["norm2"])
    _inv_conv(out, f"{key}.conv2", p["conv2"])
    if "nin_shortcut" in p:
        _inv_conv(out, f"{key}.conv_shortcut", p["nin_shortcut"])


def _inv_vae_mid(out, key: str, p: dict) -> None:
    _inv_vae_res(out, f"{key}.resnets.0", p["block_1"])
    a = p["attn"]
    _inv_norm(out, f"{key}.attentions.0.group_norm", a["norm"])
    _inv_vae_attn_linear(out, f"{key}.attentions.0.to_q", a["q"])
    _inv_vae_attn_linear(out, f"{key}.attentions.0.to_k", a["k"])
    _inv_vae_attn_linear(out, f"{key}.attentions.0.to_v", a["v"])
    _inv_vae_attn_linear(out, f"{key}.attentions.0.to_out.0",
                         a["proj_out"])
    _inv_vae_res(out, f"{key}.resnets.1", p["block_2"])


def vae_to_diffusers(params: dict) -> Dict[str, np.ndarray]:
    """Flat diffusers AutoencoderKL tensors for a models/vae.py tree —
    the tensor inverse of io/diffusers_sdxl.build_vae_from_diffusers."""
    out: Dict[str, np.ndarray] = {}
    enc = params["encoder"]
    _inv_conv(out, "encoder.conv_in", enc["conv_in"])
    for i, bp in enumerate(enc["blocks"]):
        s = f"encoder.down_blocks.{i}"
        _inv_vae_res(out, f"{s}.resnets.0", bp["res1"])
        _inv_vae_res(out, f"{s}.resnets.1", bp["res2"])
        if "downsampler" in bp:
            _inv_conv(out, f"{s}.downsamplers.0.conv", bp["downsampler"])
    _inv_vae_mid(out, "encoder.mid_block", enc["mid"])
    _inv_norm(out, "encoder.conv_norm_out", enc["norm_out"])
    _inv_conv(out, "encoder.conv_out", enc["conv_out"])

    dec = params["decoder"]
    _inv_conv(out, "decoder.conv_in", dec["conv_in"])
    _inv_vae_mid(out, "decoder.mid_block", dec["mid"])
    for i, bp in enumerate(dec["blocks"]):
        s = f"decoder.up_blocks.{i}"
        _inv_vae_res(out, f"{s}.resnets.0", bp["res1"])
        _inv_vae_res(out, f"{s}.resnets.1", bp["res2"])
        _inv_vae_res(out, f"{s}.resnets.2", bp["res3"])
        if "upsampler" in bp:
            _inv_conv(out, f"{s}.upsamplers.0.conv", bp["upsampler"])
    _inv_norm(out, "decoder.conv_norm_out", dec["norm_out"])
    _inv_conv(out, "decoder.conv_out", dec["conv_out"])
    if params.get("quant_conv") is not None:
        _inv_conv(out, "quant_conv", params["quant_conv"])
    if params.get("post_quant_conv") is not None:
        _inv_conv(out, "post_quant_conv", params["post_quant_conv"])
    return out


def _write_tokenizer_dir(path: str, tokenizer, pad_token: str) -> None:
    """vocab.json + merges.txt (+ the HF sidecar configs) from the
    package's own BPE tables — the OpenAI merges.txt format diffusers'
    CLIPTokenizer reads."""
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "vocab.json"), "w") as f:
        json.dump(tokenizer.encoder, f, ensure_ascii=False)
    merges = sorted(tokenizer.bpe_ranks.items(), key=lambda kv: kv[1])
    with open(os.path.join(path, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")
        for (a, b), _ in merges:
            f.write(f"{a} {b}\n")
    with open(os.path.join(path, "special_tokens_map.json"), "w") as f:
        json.dump({
            "bos_token": "<|startoftext|>",
            "eos_token": "<|endoftext|>",
            "pad_token": pad_token,
            "unk_token": "<|endoftext|>",
        }, f)
    with open(os.path.join(path, "tokenizer_config.json"), "w") as f:
        json.dump({
            "add_prefix_space": False,
            "do_lower_case": True,
            "model_max_length": 77,
            "tokenizer_class": "CLIPTokenizer",
        }, f)


def _write_vae_dir(out_dir: str, vae_params, vae_cfg, scale: float,
                   dtype, sample_size: int) -> None:
    """vae/ subdir: tensors + AutoencoderKL config. vae/config.json
    carries only block_out_channels; diffusers derives the decoder from
    its REVERSE (AutoencoderKL's up_blocks loop), so a decoder plan that
    isn't that derivation cannot be represented — refuse rather than
    write a config that silently mismatches the exported tensors."""
    from safetensors.numpy import save_file

    vae_dir = os.path.join(out_dir, "vae")
    os.makedirs(vae_dir, exist_ok=True)
    flat = vae_to_diffusers(vae_params)
    if dtype is not None:
        flat = {k: v.astype(dtype) for k, v in flat.items()}
    save_file(flat,
              os.path.join(vae_dir, "diffusion_pytorch_model.safetensors"))
    v = vae_cfg
    boc = [c[1] for c in v.encoder_channels]
    rev = list(reversed(boc))
    canonical = tuple((rev[j - 1] if j else rev[0], rev[j])
                      for j in range(len(rev)))
    if tuple(v.decoder_channels) != canonical:
        raise ValueError(
            f"decoder_channels {tuple(v.decoder_channels)} is not the "
            f"diffusers-canonical derivation {canonical} of "
            f"block_out_channels {boc}; this VAE cannot export to the "
            f"AutoencoderKL config layout")
    with open(os.path.join(vae_dir, "config.json"), "w") as f:
        json.dump({
            "_class_name": "AutoencoderKL",
            "in_channels": 3,
            "out_channels": 3,
            "latent_channels": v.latent_channels,
            "block_out_channels": boc,
            "down_block_types": ["DownEncoderBlock2D"]
            * len(v.encoder_channels),
            "up_block_types": ["UpDecoderBlock2D"]
            * len(v.decoder_channels),
            "layers_per_block": 2,
            "norm_num_groups": v.n_group,
            "sample_size": sample_size,
            "scaling_factor": scale,
        }, f, indent=2)


def write_diffusers_pipeline_dir(
    out_dir: str,
    pipe,
    dtype: Optional[np.dtype] = None,
) -> str:
    """Export a whole SDXL pipeline to the diffusers checkpoint layout:
    unet/ vae/ text_encoder/ text_encoder_2/ tokenizer/ tokenizer_2/
    scheduler/ + model_index.json — loadable by BOTH this package
    (load_pipeline format detection) and the diffusers ecosystem. The
    interop inverse of io/diffusers_sdxl.load_sdxl_diffusers_dir: merged
    or fine-tuned checkpoints (cli/merge, --full training) become
    standard ecosystem artifacts.

    The UNet must be in inference-ready but UNSTACKED/UNFOLDED form;
    stacked transformer scans and phase-decomposed upsample kernels are
    reverted by the caller (cli/convert does this). Quantized trees
    cannot export (dequantize first — _inv_linear raises)."""
    from safetensors.numpy import save_file

    from ..models.unet import unfold_unet_upsample, unfuse_unet_qkv

    os.makedirs(out_dir, exist_ok=True)
    ucfg = pipe.diffuser_cfg.unet_config()
    unet = unfold_unet_upsample(unfuse_unet_qkv(pipe.unet_params))
    write_diffusers_unet_dir(out_dir, unet, ucfg, dtype=dtype)

    _write_vae_dir(out_dir, pipe.vae_params, pipe.vae_cfg,
                   float(pipe.scale_factor), dtype, sample_size=1024)

    e_cfg = pipe.embedder_cfg
    for sub, tower, cfgc, proj in (
        ("text_encoder", "clip", e_cfg.clip_config, False),
        ("text_encoder_2", "open_clip", e_cfg.open_clip_config, True),
    ):
        d = os.path.join(out_dir, sub)
        os.makedirs(d, exist_ok=True)
        flat = clip_to_hf(pipe.embedder_params[tower], with_projection=proj)
        if dtype is not None:
            flat = {k: v.astype(dtype) for k, v in flat.items()}
        save_file(flat, os.path.join(d, "model.safetensors"))
        with open(os.path.join(d, "config.json"), "w") as f:
            json.dump({
                "architectures": ["CLIPTextModelWithProjection" if proj
                                  else "CLIPTextModel"],
                "model_type": "clip_text_model",
                "hidden_size": cfgc.n_state,
                "intermediate_size": cfgc.n_state * 4,
                "num_attention_heads": cfgc.n_head,
                "num_hidden_layers": cfgc.n_layer,
                "max_position_embeddings": cfgc.n_ctx,
                "vocab_size": cfgc.n_vocab,
                "projection_dim": cfgc.embed_dim,
                "hidden_act": ("quick_gelu" if cfgc.quick_gelu
                               else "gelu"),
            }, f, indent=2)

    # tokenizer data from the package's own BPE tables (CLIP pads with
    # EOT, OpenCLIP with id 0 — the "!" token, matching the HF repos)
    _write_tokenizer_dir(os.path.join(out_dir, "tokenizer"),
                         pipe.clip_tokenizer, "<|endoftext|>")
    _write_tokenizer_dir(os.path.join(out_dir, "tokenizer_2"),
                         pipe.open_clip_tokenizer, "!")

    sched_dir = os.path.join(out_dir, "scheduler")
    os.makedirs(sched_dir, exist_ok=True)
    with open(os.path.join(sched_dir, "scheduler_config.json"), "w") as f:
        json.dump({
            "_class_name": "EulerDiscreteScheduler",
            "beta_schedule": "scaled_linear",
            "beta_start": 0.00085,
            "beta_end": 0.012,
            "num_train_timesteps": int(pipe.alphas_cumprod.shape[0]),
            "prediction_type": pipe.diffuser_cfg.prediction_type
            if pipe.diffuser_cfg.prediction_type != "eps" else "epsilon",
            "steps_offset": 1,
            "timestep_spacing": "leading",
        }, f, indent=2)

    with open(os.path.join(out_dir, "model_index.json"), "w") as f:
        json.dump({
            "_class_name": "StableDiffusionXLPipeline",
            "force_zeros_for_empty_prompt": False,
            "scheduler": ["diffusers", "EulerDiscreteScheduler"],
            "text_encoder": ["transformers", "CLIPTextModel"],
            "text_encoder_2": ["transformers",
                               "CLIPTextModelWithProjection"],
            "tokenizer": ["transformers", "CLIPTokenizer"],
            "tokenizer_2": ["transformers", "CLIPTokenizer"],
            "unet": ["diffusers", "UNet2DConditionModel"],
            "vae": ["diffusers", "AutoencoderKL"],
        }, f, indent=2)
    return out_dir


def write_sd1_diffusers_pipeline_dir(
    out_dir: str,
    diffuser_cfg,
    unet_params: dict,
    clip_cfg,
    clip_params: dict,
    vae_params: dict,
    tokenizer,
    vae_cfg=None,
    scale_factor: float = 0.18215,
    sd2: bool = False,
    dtype: Optional[np.dtype] = None,
) -> str:
    """Export an SD 1.x/2.x pipeline to the diffusers
    StableDiffusionPipeline layout (unet/ vae/ text_encoder/ tokenizer/
    scheduler/ + model_index.json) — the single-tower sibling of
    write_diffusers_pipeline_dir, completing the legacy
    .ckpt -> diffusers conversion flow (cli/convert --single-file
    --family sd1). The UNet must be unfused/unstacked (the single-file
    loaders produce exactly that). sd2=True marks the v-prediction +
    penultimate-hidden family: the tokenizer pads with "!" (id 0, the
    stabilityai/stable-diffusion-2 convention) and the scheduler writes
    prediction_type from diffuser_cfg."""
    from safetensors.numpy import save_file

    from ..configs import AutoencoderConfig

    os.makedirs(out_dir, exist_ok=True)
    write_diffusers_unet_dir(out_dir, unet_params,
                             diffuser_cfg.unet_config(), dtype=dtype)
    _write_vae_dir(out_dir, vae_params, vae_cfg or AutoencoderConfig(),
                   float(scale_factor), dtype,
                   sample_size=768 if sd2 else 512)

    d = os.path.join(out_dir, "text_encoder")
    os.makedirs(d, exist_ok=True)
    flat = clip_to_hf(clip_params, with_projection=False)
    if dtype is not None:
        flat = {k: v.astype(dtype) for k, v in flat.items()}
    save_file(flat, os.path.join(d, "model.safetensors"))
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump({
            "architectures": ["CLIPTextModel"],
            "model_type": "clip_text_model",
            "hidden_size": clip_cfg.n_state,
            "intermediate_size": clip_cfg.n_state * 4,
            "num_attention_heads": clip_cfg.n_head,
            "num_hidden_layers": clip_cfg.n_layer,
            "max_position_embeddings": clip_cfg.n_ctx,
            "vocab_size": clip_cfg.n_vocab,
            "projection_dim": clip_cfg.embed_dim,
            "hidden_act": ("quick_gelu" if clip_cfg.quick_gelu else "gelu"),
        }, f, indent=2)

    _write_tokenizer_dir(os.path.join(out_dir, "tokenizer"), tokenizer,
                         "!" if sd2 else "<|endoftext|>")

    sched_dir = os.path.join(out_dir, "scheduler")
    os.makedirs(sched_dir, exist_ok=True)
    with open(os.path.join(sched_dir, "scheduler_config.json"), "w") as f:
        json.dump({
            "_class_name": "EulerDiscreteScheduler",
            "beta_schedule": "scaled_linear",
            "beta_start": 0.00085,
            "beta_end": 0.012,
            "num_train_timesteps": diffuser_cfg.n_steps,
            "prediction_type": ("v_prediction"
                                if diffuser_cfg.prediction_type == "v"
                                else "epsilon"),
            "steps_offset": 1,
            "timestep_spacing": "leading",
        }, f, indent=2)

    with open(os.path.join(out_dir, "model_index.json"), "w") as f:
        json.dump({
            "_class_name": "StableDiffusionPipeline",
            "feature_extractor": [None, None],
            "requires_safety_checker": False,
            "safety_checker": [None, None],
            "scheduler": ["diffusers", "EulerDiscreteScheduler"],
            "text_encoder": ["transformers", "CLIPTextModel"],
            "tokenizer": ["transformers", "CLIPTokenizer"],
            "unet": ["diffusers", "UNet2DConditionModel"],
            "vae": ["diffusers", "AutoencoderKL"],
        }, f, indent=2)
    return out_dir
