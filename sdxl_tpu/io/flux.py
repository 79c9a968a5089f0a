"""Import FLUX.1 weights from a diffusers model directory.

Capability extension beyond the reference. Loads the
`black-forest-labs/FLUX.1-dev` / `FLUX.1-schnell` repository layout:

    {dir}/transformer/diffusion_pytorch_model*.safetensors  (FluxTransformer)
    {dir}/transformer/config.json                           (hyperparams)
    {dir}/vae/diffusion_pytorch_model*.safetensors  (16-ch, no quant convs)
    {dir}/text_encoder/    (CLIPTextModel — CLIP-L, NO projection head)
    {dir}/text_encoder_2/  (T5-XXL encoder)
    {dir}/tokenizer_2/     (T5 SentencePiece; loaded via transformers)
    {dir}/scheduler/scheduler_config.json  (base/max shift, dynamic flag)

NOTE the tower order differs from SD3: text_encoder is CLIP-L and
text_encoder_2 is T5 (SD3 keeps T5 in text_encoder_3).

Transformer key map (diffusers FluxTransformer2DModel -> models/flux.py):
    x_embedder / context_embedder
    time_text_embed.{timestep,guidance,text}_embedder.linear_{1,2}
    transformer_blocks.{i}.norm1.linear          -> blocks[i].norm1.mod
    ...norm1_context.linear                      -> norm1_context.mod
    ...attn.{to_q,to_k,to_v,to_out.0,add_{q,k,v}_proj,to_add_out}
    ...attn.norm_{q,k} / norm_added_{q,k}        (rms, weight only)
    ...ff.net.0.proj / ff.net.2                  -> mlp.in / mlp.out
    ...ff_context.net.{0.proj,2}                 -> mlp_context.*
    single_transformer_blocks.{i}.norm.linear    -> single_blocks[i].norm.mod
    ...attn.{to_q,to_k,to_v,norm_q,norm_k} / proj_mlp / proj_out
    norm_out.linear / proj_out
"""

from __future__ import annotations

import glob
import json
import os
from typing import Dict

import jax.numpy as jnp
import numpy as np

from ..configs import CLIPConfig, FluxConfig
from .diffusers_sdxl import _load_safetensors_dir, build_vae_from_diffusers
from .hf_sdxl import _KeyStore, _as, build_clip_from_hf
from .sd3 import (
    _read_json,
    build_t5_from_hf,
    t5_config_from_dir,
    vae_config_from_dir,
)


def flux_config_from_dir(tdir: str, tensors: Dict[str, np.ndarray]
                         ) -> FluxConfig:
    """FluxConfig from transformer/config.json, with shape-inferred
    fallbacks so a bare safetensors file still loads."""
    cfgj = {}
    cpath = os.path.join(tdir, "config.json")
    if os.path.isfile(cpath):
        cfgj = _read_json(cpath)
    hidden, cin = tensors["x_embedder.weight"].shape
    n_layers = 0
    while f"transformer_blocks.{n_layers}.norm1.linear.weight" in tensors:
        n_layers += 1
    n_single = 0
    while (f"single_transformer_blocks.{n_single}.norm.linear.weight"
           in tensors):
        n_single += 1
    # head_dim is recoverable from the per-head rms norm weight
    head_dim = int(cfgj.get(
        "attention_head_dim",
        tensors["transformer_blocks.0.attn.norm_q.weight"].shape[0]))
    axes = tuple(cfgj.get("axes_dims_rope", (16, 56, 56)))
    if sum(axes) != head_dim:  # tiny fixtures without a config.json
        q = head_dim // 4
        axes = (head_dim - 2 * q, q, q)
    return FluxConfig(
        in_channels=int(cfgj.get("in_channels", cin)),
        num_layers=int(cfgj.get("num_layers", n_layers)),
        num_single_layers=int(cfgj.get("num_single_layers", n_single)),
        n_heads=int(cfgj.get("num_attention_heads", hidden // head_dim)),
        head_dim=head_dim,
        joint_attention_dim=int(
            cfgj.get("joint_attention_dim",
                     tensors["context_embedder.weight"].shape[1])),
        pooled_projection_dim=int(
            cfgj.get("pooled_projection_dim",
                     tensors["time_text_embed.text_embedder.linear_1"
                             ".weight"].shape[1])),
        guidance_embeds="time_text_embed.guidance_embedder.linear_1.weight"
                        in tensors,
        axes_dims=axes,
        time_sinusoid_dim=int(
            tensors["time_text_embed.timestep_embedder.linear_1.weight"]
            .shape[1]),
    )


def build_flux_from_diffusers(
    tensors: Dict[str, np.ndarray], cfg: FluxConfig, dtype=jnp.bfloat16,
    host: bool = False,
):
    cast = _as(dtype, host)
    ks = _KeyStore(tensors)
    te = {
        "timestep_lin1": ks.linear(
            "time_text_embed.timestep_embedder.linear_1", cast),
        "timestep_lin2": ks.linear(
            "time_text_embed.timestep_embedder.linear_2", cast),
        "text_lin1": ks.linear(
            "time_text_embed.text_embedder.linear_1", cast),
        "text_lin2": ks.linear(
            "time_text_embed.text_embedder.linear_2", cast),
    }
    if cfg.guidance_embeds:
        te["guidance_lin1"] = ks.linear(
            "time_text_embed.guidance_embedder.linear_1", cast)
        te["guidance_lin2"] = ks.linear(
            "time_text_embed.guidance_embedder.linear_2", cast)
    params = {
        "x_embedder": ks.linear("x_embedder", cast),
        "context_embedder": ks.linear("context_embedder", cast),
        "time_text_embed": te,
        "norm_out": {"mod": ks.linear("norm_out.linear", cast)},
        "proj_out": ks.linear("proj_out", cast),
        "blocks": [],
        "single_blocks": [],
    }
    for i in range(cfg.num_layers):
        b = ks.sub(f"transformer_blocks.{i}")
        attn = {nm: b.linear(f"attn.{nm}", cast)
                for nm in ("to_q", "to_k", "to_v", "add_q_proj",
                           "add_k_proj", "add_v_proj", "to_add_out")}
        attn["to_out"] = b.linear("attn.to_out.0", cast)
        for nm in ("norm_q", "norm_k", "norm_added_q", "norm_added_k"):
            attn[nm] = {"w": cast(b.get(f"attn.{nm}.weight"))}
        params["blocks"].append({
            "norm1": {"mod": b.linear("norm1.linear", cast)},
            "norm1_context": {"mod": b.linear("norm1_context.linear",
                                              cast)},
            "attn": attn,
            "mlp": {"in": b.linear("ff.net.0.proj", cast),
                    "out": b.linear("ff.net.2", cast)},
            "mlp_context": {"in": b.linear("ff_context.net.0.proj", cast),
                            "out": b.linear("ff_context.net.2", cast)},
        })
    for i in range(cfg.num_single_layers):
        b = ks.sub(f"single_transformer_blocks.{i}")
        attn = {nm: b.linear(f"attn.{nm}", cast)
                for nm in ("to_q", "to_k", "to_v")}
        for nm in ("norm_q", "norm_k"):
            attn[nm] = {"w": cast(b.get(f"attn.{nm}.weight"))}
        params["single_blocks"].append({
            "norm": {"mod": b.linear("norm.linear", cast)},
            "attn": attn,
            "proj_mlp": b.linear("proj_mlp", cast),
            "proj_out": b.linear("proj_out", cast),
        })
    return params


def load_flux_diffusers_dir(model_dir: str, dtype=jnp.bfloat16,
                            t5_tokenize=None, host: bool = False):
    """Returns (flux_cfg, flux_params, clip_cfg, clip_params, t5_cfg,
    t5_params, t5_tokenize, vae_cfg, vae_params, scheduler_config).

    t5_tokenize overrides the tokenizer_2/ requirement (a callable
    list[str] -> [B, n] int32 ids) — tests and embedded deployments."""
    tdir = os.path.join(model_dir, "transformer")
    tensors = _load_safetensors_dir(tdir)
    flux_cfg = flux_config_from_dir(tdir, tensors)
    flux_params = build_flux_from_diffusers(tensors, flux_cfg, dtype,
                                            host=host)

    cdir = os.path.join(model_dir, "text_encoder")
    cj = {}
    cpath = os.path.join(cdir, "config.json")
    if os.path.isfile(cpath):
        cj = _read_json(cpath)
    clip_cfg = CLIPConfig(
        n_vocab=int(cj.get("vocab_size", 49408)),
        n_state=int(cj.get("hidden_size", 768)),
        embed_dim=int(cj.get("projection_dim", cj.get("hidden_size",
                                                      768))),
        n_head=int(cj.get("num_attention_heads", 12)),
        n_ctx=int(cj.get("max_position_embeddings", 77)),
        n_layer=int(cj.get("num_hidden_layers", 12)),
        quick_gelu=cj.get("hidden_act", "quick_gelu") == "quick_gelu",
    )
    ctens = {
        (k if k.startswith("text_model") else f"text_model.{k}"): v
        for k, v in _load_safetensors_dir(cdir).items()
    }
    clip_params = build_clip_from_hf(ctens, clip_cfg, prefix="text_model")

    t5_dir = os.path.join(model_dir, "text_encoder_2")
    if not (os.path.isdir(t5_dir)
            and glob.glob(os.path.join(t5_dir, "*.safetensors"))):
        raise FileNotFoundError(
            f"{model_dir}: text_encoder_2/ (T5) is required for the Flux "
            "family (it is the ONLY token stream — there is no drop-T5 "
            "mode like SD3's)")
    t5_tensors = _load_safetensors_dir(t5_dir)
    t5_cfg = t5_config_from_dir(t5_dir, t5_tensors)
    t5_params = build_t5_from_hf(t5_tensors, t5_cfg, dtype, host=host)
    if t5_tokenize is not None:
        t5_tok = t5_tokenize
    else:
        tok_dir = os.path.join(model_dir, "tokenizer_2")
        if not os.path.isdir(tok_dir):
            raise ValueError(
                f"{model_dir}: text_encoder_2/ (T5) weights loaded but "
                "tokenizer_2/ is missing — add the tokenizer directory "
                "or pass t5_tokenize=")
        from transformers import AutoTokenizer

        hf_tok = AutoTokenizer.from_pretrained(tok_dir)
        n_tokens = 512 if flux_cfg.guidance_embeds else 256

        def t5_tok(texts, _tok=hf_tok, _n=n_tokens):
            out = _tok(texts, padding="max_length", max_length=_n,
                       truncation=True, return_tensors="np")
            return out["input_ids"].astype(np.int32)

    vdir = os.path.join(model_dir, "vae")
    vae_tensors = _load_safetensors_dir(vdir)
    vae_cfg = vae_config_from_dir(vdir, vae_tensors)
    vae_params = build_vae_from_diffusers(vae_tensors, vae_cfg)

    sched = {}
    spath = os.path.join(model_dir, "scheduler", "scheduler_config.json")
    if os.path.isfile(spath):
        sched = _read_json(spath)
    return (flux_cfg, flux_params, clip_cfg, clip_params, t5_cfg,
            t5_params, t5_tok, vae_cfg, vae_params, sched)
