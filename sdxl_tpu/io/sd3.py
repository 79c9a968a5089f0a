"""Import SD3 weights from a diffusers model directory.

Capability extension beyond the reference. Loads the
`stabilityai/stable-diffusion-3-medium-diffusers` repository layout:

    {dir}/transformer/diffusion_pytorch_model*.safetensors  (MMDiT)
    {dir}/transformer/config.json                           (hyperparams)
    {dir}/vae/diffusion_pytorch_model*.safetensors          (16-ch VAE)
    {dir}/text_encoder/    (CLIP-L WithProjection, HF layout)
    {dir}/text_encoder_2/  (CLIP-G WithProjection)
    {dir}/text_encoder_3/  (T5-XXL encoder; optional — drop-T5 mode)
    {dir}/tokenizer_3/     (T5 SentencePiece; loaded via transformers)
    {dir}/scheduler/scheduler_config.json                   (flow shift)

MMDiT key map (diffusers SD3Transformer2DModel -> models/mmdit.py):
    pos_embed.proj (conv k=p s=p)       -> pos_embed.proj (p*p*C linear)
    time_text_embed.timestep_embedder.* -> time_text_embed.timestep_lin*
    time_text_embed.text_embedder.*     -> time_text_embed.text_lin*
    context_embedder                    -> context_embedder
    transformer_blocks.{i}.norm1.linear -> blocks[i].norm1.mod
    ...norm1_context.linear             -> blocks[i].norm1_context.mod
    ...attn.{to_q,to_k,to_v,to_out.0,add_{q,k,v}_proj,to_add_out}
    ...attn.norm_{q,k} / norm_added_{q,k}  (SD3.5 rms qk-norm)
    ...ff.net.0.proj / ff.net.2         -> blocks[i].mlp.in / .out
    ...ff_context.net.{0.proj,2}        -> blocks[i].mlp_context.*
    norm_out.linear / proj_out
The precomputed pos_embed.pos_embed buffer is ignored — the grid is
recomputed (models/mmdit.cropped_pos_embed) for any resolution.
"""

from __future__ import annotations

import dataclasses
import glob
import json
import os
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..configs import CLIPConfig, MMDiTConfig, T5Config
from .diffusers_sdxl import _load_safetensors_dir, build_vae_from_diffusers
from .hf_sdxl import _KeyStore, _as, build_clip_from_hf


def _read_json(path: str) -> dict:
    with open(path, "r", encoding="utf-8") as f:
        return json.load(f)


def mmdit_config_from_dir(tdir: str, tensors: Dict[str, np.ndarray]
                          ) -> MMDiTConfig:
    """MMDiTConfig from transformer/config.json, with shape-inferred
    fallbacks so a bare safetensors file still loads."""
    cfgj = {}
    cpath = os.path.join(tdir, "config.json")
    if os.path.isfile(cpath):
        cfgj = _read_json(cpath)
    w = tensors["pos_embed.proj.weight"]  # [hidden, C, p, p]
    hidden, cin, p, _ = w.shape
    n_layers = 0
    while f"transformer_blocks.{n_layers}.norm1.linear.weight" in tensors:
        n_layers += 1
    head_dim = int(cfgj.get("attention_head_dim", 64))
    return MMDiTConfig(
        patch_size=int(cfgj.get("patch_size", p)),
        in_channels=int(cfgj.get("in_channels", cin)),
        out_channels=int(cfgj.get("out_channels", cin)),
        num_layers=int(cfgj.get("num_layers", n_layers)),
        n_heads=int(cfgj.get("num_attention_heads", hidden // head_dim)),
        head_dim=head_dim,
        joint_attention_dim=int(
            cfgj.get("joint_attention_dim",
                     tensors["context_embedder.weight"].shape[1])
        ),
        pooled_projection_dim=int(
            cfgj.get(
                "pooled_projection_dim",
                tensors["time_text_embed.text_embedder.linear_1.weight"]
                .shape[1],
            )
        ),
        pos_embed_max_size=int(cfgj.get("pos_embed_max_size", 192)),
        qk_norm=("rms"
                 if "transformer_blocks.0.attn.norm_q.weight" in tensors
                 else ""),
        # sinusoid width = the timestep MLP's input width (256 for the
        # public checkpoints; shape-inferred so tiny fixtures load too)
        time_sinusoid_dim=int(
            tensors["time_text_embed.timestep_embedder.linear_1.weight"]
            .shape[1]
        ),
        # SD3.5-medium: blocks with an extra latent-stream self-attention
        dual_attention_layers=tuple(
            cfgj.get(
                "dual_attention_layers",
                [i for i in range(n_layers)
                 if f"transformer_blocks.{i}.attn2.to_q.weight" in tensors],
            )
        ),
    )


def build_mmdit_from_diffusers(
    tensors: Dict[str, np.ndarray], cfg: MMDiTConfig, dtype=jnp.bfloat16,
    host: bool = False,
):
    cast = _as(dtype, host)
    ks = _KeyStore(tensors)
    p = cfg.patch_size

    # conv(k=p, s=p) -> linear over (ph, pw, c)-ordered patch vectors
    w = ks.get("pos_embed.proj.weight")  # [hidden, C, p, p]
    w_lin = np.transpose(w, (2, 3, 1, 0)).reshape(
        p * p * cfg.in_channels, cfg.hidden
    )
    params = {
        "pos_embed": {
            "proj": {"w": cast(w_lin),
                     "b": cast(ks.get("pos_embed.proj.bias"))}
        },
        "time_text_embed": {
            "timestep_lin1": ks.linear(
                "time_text_embed.timestep_embedder.linear_1", cast),
            "timestep_lin2": ks.linear(
                "time_text_embed.timestep_embedder.linear_2", cast),
            "text_lin1": ks.linear(
                "time_text_embed.text_embedder.linear_1", cast),
            "text_lin2": ks.linear(
                "time_text_embed.text_embedder.linear_2", cast),
        },
        "context_embedder": ks.linear("context_embedder", cast),
        "norm_out": {"mod": ks.linear("norm_out.linear", cast)},
        "proj_out": ks.linear("proj_out", cast),
        "blocks": [],
    }
    for i in range(cfg.num_layers):
        b = ks.sub(f"transformer_blocks.{i}")
        pre_only = not b.has("attn.to_add_out.weight")
        attn = {
            "to_q": b.linear("attn.to_q", cast),
            "to_k": b.linear("attn.to_k", cast),
            "to_v": b.linear("attn.to_v", cast),
            "add_q_proj": b.linear("attn.add_q_proj", cast),
            "add_k_proj": b.linear("attn.add_k_proj", cast),
            "add_v_proj": b.linear("attn.add_v_proj", cast),
            "to_out": b.linear("attn.to_out.0", cast),
        }
        if not pre_only:
            attn["to_add_out"] = b.linear("attn.to_add_out", cast)
        if cfg.qk_norm == "rms":
            for nm in ("norm_q", "norm_k", "norm_added_q", "norm_added_k"):
                attn[nm] = {"w": cast(b.get(f"attn.{nm}.weight"))}
        blk = {
            "norm1": {"mod": b.linear("norm1.linear", cast)},
            "norm1_context": {"mod": b.linear("norm1_context.linear", cast)},
            "attn": attn,
            "mlp": {
                "in": b.linear("ff.net.0.proj", cast),
                "out": b.linear("ff.net.2", cast),
            },
        }
        if i in cfg.dual_attention_layers:
            attn2 = {
                "to_q": b.linear("attn2.to_q", cast),
                "to_k": b.linear("attn2.to_k", cast),
                "to_v": b.linear("attn2.to_v", cast),
                "to_out": b.linear("attn2.to_out.0", cast),
            }
            if cfg.qk_norm == "rms":
                for nm in ("norm_q", "norm_k"):
                    attn2[nm] = {"w": cast(b.get(f"attn2.{nm}.weight"))}
            blk["attn2"] = attn2
        if not pre_only:
            blk["mlp_context"] = {
                "in": b.linear("ff_context.net.0.proj", cast),
                "out": b.linear("ff_context.net.2", cast),
            }
        else:
            if i != cfg.num_layers - 1:
                raise ValueError(
                    f"context_pre_only block at layer {i} (expected only "
                    f"the last, {cfg.num_layers - 1})"
                )
        params["blocks"].append(blk)
    return params


def t5_config_from_dir(tdir: str, tensors: Dict[str, np.ndarray]) -> T5Config:
    cfgj = {}
    cpath = os.path.join(tdir, "config.json")
    if os.path.isfile(cpath):
        cfgj = _read_json(cpath)
    vocab, d_model = tensors["shared.weight"].shape
    n_layers = 0
    while (f"encoder.block.{n_layers}.layer.0.SelfAttention.q.weight"
           in tensors):
        n_layers += 1
    return T5Config(
        vocab_size=int(cfgj.get("vocab_size", vocab)),
        d_model=int(cfgj.get("d_model", d_model)),
        d_kv=int(cfgj.get("d_kv", 64)),
        d_ff=int(cfgj.get("d_ff",
                          tensors["encoder.block.0.layer.1.DenseReluDense"
                                  ".wi_0.weight"].shape[0])),
        n_heads=int(cfgj.get("num_heads", 64)),
        n_layers=int(cfgj.get("num_layers", n_layers)),
        relative_buckets=int(cfgj.get("relative_attention_num_buckets", 32)),
        relative_max_distance=int(
            cfgj.get("relative_attention_max_distance", 128)),
    )


def build_t5_from_hf(tensors: Dict[str, np.ndarray], cfg: T5Config,
                     dtype=jnp.bfloat16, host: bool = False):
    cast = _as(dtype, host)
    ks = _KeyStore(tensors)
    blocks = []
    for i in range(cfg.n_layers):
        b = ks.sub(f"encoder.block.{i}")
        blocks.append({
            "ln1": cast(b.get("layer.0.layer_norm.weight")),
            "attn": {
                nm: {"w": cast(b.get(
                    f"layer.0.SelfAttention.{nm}.weight").T)}
                for nm in ("q", "k", "v", "o")
            },
            "ln2": cast(b.get("layer.1.layer_norm.weight")),
            "ffn": {
                nm: {"w": cast(b.get(
                    f"layer.1.DenseReluDense.{nm}.weight").T)}
                for nm in ("wi_0", "wi_1", "wo")
            },
        })
    return {
        "embed": cast(ks.get("shared.weight")),
        "relative_attention_bias": cast(
            ks.get("encoder.block.0.layer.0.SelfAttention"
                   ".relative_attention_bias.weight")),
        "blocks": blocks,
        "final_ln": cast(ks.get("encoder.final_layer_norm.weight")),
    }


def vae_config_from_dir(vdir: str, tensors: Dict[str, np.ndarray]):
    """AutoencoderConfig from the checkpoint itself: channel pairs from
    the resnet conv1 shapes, latent width from post_quant_conv,
    norm_num_groups from vae/config.json (group count is not recoverable
    from weights; 32 — the diffusers default — when absent)."""
    from ..configs import AutoencoderConfig

    def pairs(prefix):
        out, i = [], 0
        while f"{prefix}.{i}.resnets.0.conv1.weight" in tensors:
            w = tensors[f"{prefix}.{i}.resnets.0.conv1.weight"]
            out.append((int(w.shape[1]), int(w.shape[0])))
            i += 1
        return tuple(out)

    cfgj = {}
    cpath = os.path.join(vdir, "config.json")
    if os.path.isfile(cpath):
        cfgj = _read_json(cpath)
    # Flux VAEs have no quant convs: fall back to the coder conv shapes
    if "post_quant_conv.weight" in tensors:
        latent = int(tensors["post_quant_conv.weight"].shape[1])
        n_out = int(tensors["quant_conv.weight"].shape[0])
    else:
        latent = int(tensors["decoder.conv_in.weight"].shape[1])
        n_out = int(tensors["encoder.conv_out.weight"].shape[0])
    return AutoencoderConfig(
        encoder_channels=pairs("encoder.down_blocks"),
        decoder_channels=pairs("decoder.up_blocks"),
        n_group=int(cfgj.get("norm_num_groups", 32)),
        n_channels_out=n_out,
        latent_channels=int(cfgj.get("latent_channels", latent)),
    )


def load_sd3_diffusers_dir(
    model_dir: str,
    mmdit_dtype=jnp.bfloat16,
    load_t5: bool = True,
    host: bool = False,
):
    """Returns (mmdit_cfg, mmdit_params, clip_l_cfg, clip_l, clip_g_cfg,
    clip_g, vae_params, t5_cfg | None, t5_params | None,
    t5_tokenize | None, flow_shift)."""
    tdir = os.path.join(model_dir, "transformer")
    tensors = _load_safetensors_dir(tdir)
    mmdit_cfg = mmdit_config_from_dir(tdir, tensors)
    mmdit = build_mmdit_from_diffusers(tensors, mmdit_cfg, mmdit_dtype,
                                       host=host)

    def clip_cfg_from(tdir2, default_layers):
        cj = {}
        cpath = os.path.join(tdir2, "config.json")
        if os.path.isfile(cpath):
            cj = _read_json(cpath)
        return CLIPConfig(
            n_vocab=int(cj.get("vocab_size", 49408)),
            n_state=int(cj.get("hidden_size", 768)),
            embed_dim=int(cj.get("projection_dim", cj.get("hidden_size",
                                                          768))),
            n_head=int(cj.get("num_attention_heads", 12)),
            n_ctx=int(cj.get("max_position_embeddings", 77)),
            n_layer=int(cj.get("num_hidden_layers", default_layers)),
            quick_gelu=cj.get("hidden_act", "quick_gelu") == "quick_gelu",
        )

    def load_clip(sub, default_layers):
        d = os.path.join(model_dir, sub)
        cfg = clip_cfg_from(d, default_layers)
        tens = {
            (k if k.startswith("text_model") else f"text_model.{k}"): v
            for k, v in _load_safetensors_dir(d).items()
        }
        return cfg, build_clip_from_hf(tens, cfg, prefix="text_model")

    clip_l_cfg, clip_l = load_clip("text_encoder", 12)
    clip_g_cfg, clip_g = load_clip("text_encoder_2", 32)

    vdir = os.path.join(model_dir, "vae")
    vae_tensors = _load_safetensors_dir(vdir)
    vae_cfg = vae_config_from_dir(vdir, vae_tensors)
    vae = build_vae_from_diffusers(vae_tensors, vae_cfg)

    t5_cfg = t5_params = t5_tok = None
    t5_dir = os.path.join(model_dir, "text_encoder_3")
    if load_t5 and os.path.isdir(t5_dir) and glob.glob(
        os.path.join(t5_dir, "*.safetensors")
    ):
        t5_tensors = _load_safetensors_dir(t5_dir)
        t5_cfg = t5_config_from_dir(t5_dir, t5_tensors)
        t5_params = build_t5_from_hf(t5_tensors, t5_cfg, mmdit_dtype,
                                     host=host)
        tok_dir = os.path.join(model_dir, "tokenizer_3")
        if os.path.isdir(tok_dir):
            from transformers import AutoTokenizer

            hf_tok = AutoTokenizer.from_pretrained(tok_dir)

            def t5_tok(texts, _tok=hf_tok):
                out = _tok(texts, padding="max_length", max_length=256,
                           truncation=True, return_tensors="np")
                return out["input_ids"].astype(np.int32)

    flow_shift = 3.0
    spath = os.path.join(model_dir, "scheduler", "scheduler_config.json")
    if os.path.isfile(spath):
        flow_shift = float(_read_json(spath).get("shift", 3.0))

    return (mmdit_cfg, mmdit, clip_l_cfg, clip_l, clip_g_cfg, clip_g,
            vae_cfg, vae, t5_cfg, t5_params, t5_tok, flow_shift)
