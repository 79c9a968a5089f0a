"""Import SDXL weights from the official single-file safetensors checkpoint.

Capability extension over the reference: the reference requires running its
python/dump.py inside Stability's generative-models checkout and then its
`convert` binary. Here the standard `sd_xl_base_1.0.safetensors` /
`sd_xl_refiner_1.0.safetensors` (sgm/ldm key layout) load directly.

Key layouts handled (names as in the public sgm checkpoints):
  - model.diffusion_model.*      UNet (ldm layout)
  - first_stage_model.*          VAE (ldm layout)
  - conditioner.embedders.0.transformer.text_model.*   CLIP ViT-L (HF)
  - conditioner.embedders.1.model.*                    OpenCLIP bigG

Conversions: torch linear [out,in] -> [in,out]; conv OIHW -> HWIO;
OpenCLIP's fused in_proj split into q/k/v (same operation as the
reference's dump, python/clip.py:50-79).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..configs import AutoencoderConfig, CLIPConfig, DiffuserConfig, UNetConfig
from ..models.unet import unet_block_plan


def _as(dtype, host: bool = False):
    """Tensor cast for the builders. host=True keeps weights as numpy
    (ml_dtypes handles bf16) so a quantized load (io/quantize.py) never
    materializes the full-precision model in HBM — FLUX.1's 23.8 GB bf16
    transformer cannot even be STAGED on a 16 GB chip."""
    if host:
        return lambda a: np.ascontiguousarray(a).astype(np.dtype(dtype))
    return lambda a: jnp.asarray(np.ascontiguousarray(a), dtype=dtype)


class _KeyStore:
    def __init__(self, tensors: Dict[str, np.ndarray], prefix: str = ""):
        self.t = tensors
        self.prefix = prefix
        self.used = set()

    def sub(self, prefix: str) -> "_KeyStore":
        s = _KeyStore(self.t, f"{self.prefix}{prefix}.")
        s.used = self.used
        return s

    def get(self, key: str) -> np.ndarray:
        full = f"{self.prefix}{key}"
        self.used.add(full)
        return np.asarray(self.t[full])

    def has(self, key: str) -> bool:
        return f"{self.prefix}{key}" in self.t

    def linear(self, key: str, cast):
        p = {"w": cast(self.get(f"{key}.weight").T)}
        if self.has(f"{key}.bias"):
            p["b"] = cast(self.get(f"{key}.bias"))
        return p

    def conv(self, key: str, cast):
        w = self.get(f"{key}.weight")
        p = {"w": cast(np.transpose(w, (2, 3, 1, 0)))}
        if self.has(f"{key}.bias"):
            p["b"] = cast(self.get(f"{key}.bias"))
        return p

    def norm(self, key: str, cast):
        return {
            "gamma": cast(self.get(f"{key}.weight")),
            "beta": cast(self.get(f"{key}.bias")),
        }


# ---------------------------------------------------------------------------
# UNet (ldm layout)
# ---------------------------------------------------------------------------

def _ldm_res(ks: _KeyStore, key: str, cast):
    s = ks.sub(key)
    p = {
        "norm_in": s.norm("in_layers.0", cast),
        "conv_in": s.conv("in_layers.2", cast),
        "lin_embed": s.linear("emb_layers.1", cast),
        "norm_out": s.norm("out_layers.0", cast),
        "conv_out": s.conv("out_layers.3", cast),
    }
    if s.has("skip_connection.weight"):
        p["skip"] = s.conv("skip_connection", cast)
    return p


def _ldm_attn(ks: _KeyStore, key: str, cast):
    s = ks.sub(key)
    return {
        "q": s.linear("to_q", cast),
        "k": s.linear("to_k", cast),
        "v": s.linear("to_v", cast),
        "out": s.linear("to_out.0", cast),
    }


def _ldm_spatial(ks: _KeyStore, key: str, cast):
    s = ks.sub(key)
    blocks = []
    i = 0
    while s.has(f"transformer_blocks.{i}.norm1.weight"):
        b = s.sub(f"transformer_blocks.{i}")
        blocks.append(
            {
                "norm1": b.norm("norm1", cast),
                "attn1": _ldm_attn(b, "attn1", cast),
                "norm2": b.norm("norm2", cast),
                "attn2": _ldm_attn(b, "attn2", cast),
                "norm3": b.norm("norm3", cast),
                "mlp": {
                    "proj": b.linear("ff.net.0.proj", cast),
                    "lin": b.linear("ff.net.2", cast),
                },
            }
        )
        i += 1
    # SDXL uses use_linear_in_transformer=True: proj_in/out are linear
    if s.get("proj_in.weight").ndim == 2:
        proj_in = s.linear("proj_in", cast)
        proj_out = s.linear("proj_out", cast)
    else:  # 1x1 convs (SD1.x-style) — squeeze to linear
        w = s.get("proj_in.weight")[:, :, 0, 0]
        proj_in = {"w": cast(w.T), "b": cast(s.get("proj_in.bias"))}
        w = s.get("proj_out.weight")[:, :, 0, 0]
        proj_out = {"w": cast(w.T), "b": cast(s.get("proj_out.bias"))}
    return {
        "norm": s.norm("norm", cast),
        "proj_in": proj_in,
        "blocks": blocks,
        "proj_out": proj_out,
    }


def build_unet_from_ldm(
    tensors: Dict[str, np.ndarray],
    cfg: UNetConfig,
    dtype=jnp.bfloat16,
    prefix: str = "model.diffusion_model",
):
    cast = _as(dtype)
    ks = _KeyStore(tensors).sub(prefix)
    in_plan, mid_spec, out_plan = unet_block_plan(cfg)

    def in_block(i: int, spec):
        b = f"input_blocks.{i}"
        if spec.kind == "conv":
            return {"conv": ks.conv(f"{b}.0", cast)}
        if spec.kind == "down":
            return {"conv": ks.conv(f"{b}.0.op", cast)}
        p = {"res": _ldm_res(ks, f"{b}.0", cast)}
        if spec.kind == "res_t":
            p["transformer"] = _ldm_spatial(ks, f"{b}.1", cast)
        return p

    def out_block(i: int, spec):
        b = f"output_blocks.{i}"
        p = {"res": _ldm_res(ks, f"{b}.0", cast)}
        if spec.kind in ("res_t", "res_t_up"):
            p["transformer"] = _ldm_spatial(ks, f"{b}.1", cast)
        if spec.kind == "res_t_up":
            p["upsample"] = ks.conv(f"{b}.2.conv", cast)
        elif spec.kind == "res_up":
            p["upsample"] = ks.conv(f"{b}.1.conv", cast)
        return p

    out = {
        "time_embed": {
            "lin1": ks.linear("time_embed.0", cast),
            "lin2": ks.linear("time_embed.2", cast),
        },
        "input_blocks": [in_block(i, s) for i, s in enumerate(in_plan)],
        "middle_block": {
            "res1": _ldm_res(ks, "middle_block.0", cast),
            "transformer": _ldm_spatial(ks, "middle_block.1", cast),
            "res2": _ldm_res(ks, "middle_block.2", cast),
        },
        "output_blocks": [out_block(i, s) for i, s in enumerate(out_plan)],
        "norm_out": ks.norm("out.0", cast),
        "conv_out": ks.conv("out.2", cast),
    }
    # SD 1.x/2.x UNets carry no label embedding (adm_in_channels == 0;
    # the key is omitted, matching the diffusers builders' convention)
    if ks.has("label_emb.0.0.weight"):
        out["label_embed"] = {
            "lin1": ks.linear("label_emb.0.0", cast),
            "lin2": ks.linear("label_emb.0.2", cast),
        }
    return out


# ---------------------------------------------------------------------------
# VAE (ldm layout)
# ---------------------------------------------------------------------------

def _ldm_vae_res(ks: _KeyStore, key: str, cast):
    s = ks.sub(key)
    p = {
        "norm1": s.norm("norm1", cast),
        "conv1": s.conv("conv1", cast),
        "norm2": s.norm("norm2", cast),
        "conv2": s.conv("conv2", cast),
    }
    if s.has("nin_shortcut.weight"):
        p["nin_shortcut"] = s.conv("nin_shortcut", cast)
    return p


def _ldm_vae_mid(ks: _KeyStore, key: str, cast):
    s = ks.sub(key)
    a = s.sub("attn_1")
    return {
        "block_1": _ldm_vae_res(s, "block_1", cast),
        "attn": {
            "norm": a.norm("norm", cast),
            "q": a.conv("q", cast),
            "k": a.conv("k", cast),
            "v": a.conv("v", cast),
            "proj_out": a.conv("proj_out", cast),
        },
        "block_2": _ldm_vae_res(s, "block_2", cast),
    }


def build_vae_from_ldm(
    tensors: Dict[str, np.ndarray],
    cfg: Optional[AutoencoderConfig] = None,
    dtype=jnp.float32,
    prefix: str = "first_stage_model",
):
    cfg = cfg or AutoencoderConfig()
    cast = _as(dtype)
    ks = _KeyStore(tensors).sub(prefix)
    n_levels = len(cfg.encoder_channels)

    enc_blocks = []
    for i in range(n_levels):
        s = ks.sub(f"encoder.down.{i}")
        bp = {
            "res1": _ldm_vae_res(s, "block.0", cast),
            "res2": _ldm_vae_res(s, "block.1", cast),
        }
        if s.has("downsample.conv.weight"):
            bp["downsampler"] = s.conv("downsample.conv", cast)
        enc_blocks.append(bp)

    # ldm decoder up.{i} is indexed shallow->deep; execution order is
    # deep->shallow, so reverse (the reference dump does the same,
    # python/autoencoder.py:56-60)
    dec_blocks = []
    for i in reversed(range(n_levels)):
        s = ks.sub(f"decoder.up.{i}")
        bp = {
            "res1": _ldm_vae_res(s, "block.0", cast),
            "res2": _ldm_vae_res(s, "block.1", cast),
            "res3": _ldm_vae_res(s, "block.2", cast),
        }
        if s.has("upsample.conv.weight"):
            bp["upsampler"] = s.conv("upsample.conv", cast)
        dec_blocks.append(bp)

    return {
        "encoder": {
            "conv_in": ks.conv("encoder.conv_in", cast),
            "blocks": enc_blocks,
            "mid": _ldm_vae_mid(ks, "encoder.mid", cast),
            "norm_out": ks.norm("encoder.norm_out", cast),
            "conv_out": ks.conv("encoder.conv_out", cast),
        },
        "decoder": {
            "conv_in": ks.conv("decoder.conv_in", cast),
            "mid": _ldm_vae_mid(ks, "decoder.mid", cast),
            "blocks": dec_blocks,
            "norm_out": ks.norm("decoder.norm_out", cast),
            "conv_out": ks.conv("decoder.conv_out", cast),
        },
        "quant_conv": ks.conv("quant_conv", cast),
        "post_quant_conv": ks.conv("post_quant_conv", cast),
    }


# ---------------------------------------------------------------------------
# CLIP towers
# ---------------------------------------------------------------------------

def build_clip_from_hf(
    tensors: Dict[str, np.ndarray],
    cfg: CLIPConfig,
    dtype=jnp.float32,
    prefix: str = "conditioner.embedders.0.transformer.text_model",
):
    """HF transformers CLIPTextModel layout (CLIP ViT-L tower)."""
    cast = _as(dtype)
    ks = _KeyStore(tensors).sub(prefix)
    blocks = []
    for i in range(cfg.n_layer):
        s = ks.sub(f"encoder.layers.{i}")
        blocks.append(
            {
                "attn": {
                    "q": s.linear("self_attn.q_proj", cast),
                    "k": s.linear("self_attn.k_proj", cast),
                    "v": s.linear("self_attn.v_proj", cast),
                    "out": s.linear("self_attn.out_proj", cast),
                },
                "attn_ln": s.norm("layer_norm1", cast),
                "mlp": {
                    "fc1": s.linear("mlp.fc1", cast),
                    "fc2": s.linear("mlp.fc2", cast),
                },
                "mlp_ln": s.norm("layer_norm2", cast),
            }
        )
    params = {
        "token_embedding": cast(ks.get("embeddings.token_embedding.weight")),
        "position_embedding": cast(ks.get("embeddings.position_embedding.weight")),
        "blocks": blocks,
        "layer_norm": ks.norm("final_layer_norm", cast),
        "text_projection": None,
    }
    # The ViT-L tower only contributes hidden states in SDXL; a projection
    # is present in some exports
    if ks.has("text_projection.weight"):
        params["text_projection"] = cast(ks.get("text_projection.weight").T)
    return params


def build_clip_from_open_clip(
    tensors: Dict[str, np.ndarray],
    cfg: CLIPConfig,
    dtype=jnp.float32,
    prefix: str = "conditioner.embedders.1.model",
):
    """open_clip TextTransformer layout (bigG tower): fused in_proj is split
    into q/k/v exactly as the reference dump does (python/clip.py:50-79)."""
    cast = _as(dtype)
    ks = _KeyStore(tensors).sub(prefix)
    d = cfg.n_state
    blocks = []
    for i in range(cfg.n_layer):
        s = ks.sub(f"transformer.resblocks.{i}")
        w = s.get("attn.in_proj_weight")  # [3d, d] torch layout
        bvec = s.get("attn.in_proj_bias")  # [3d]
        qw, kw, vw = w[:d], w[d : 2 * d], w[2 * d :]
        qb, kb, vb = bvec[:d], bvec[d : 2 * d], bvec[2 * d :]
        blocks.append(
            {
                "attn": {
                    "q": {"w": cast(qw.T), "b": cast(qb)},
                    "k": {"w": cast(kw.T), "b": cast(kb)},
                    "v": {"w": cast(vw.T), "b": cast(vb)},
                    "out": s.linear("attn.out_proj", cast),
                },
                "attn_ln": s.norm("ln_1", cast),
                "mlp": {
                    "fc1": s.linear("mlp.c_fc", cast),
                    "fc2": s.linear("mlp.c_proj", cast),
                },
                "mlp_ln": s.norm("ln_2", cast),
            }
        )
    return {
        "token_embedding": cast(ks.get("token_embedding.weight")),
        "position_embedding": cast(ks.get("positional_embedding")),
        "blocks": blocks,
        "layer_norm": ks.norm("ln_final", cast),
        # open_clip stores text_projection as [d, embed_dim] already
        "text_projection": cast(ks.get("text_projection")),
    }


# ---------------------------------------------------------------------------
# top-level
# ---------------------------------------------------------------------------

def _load_single_file_tensors(path: str):
    """Tensors of a single-file checkpoint: `.safetensors`/`.sft`, or the
    legacy torch-pickle `.ckpt`/`.pt`/`.pth` (the A1111-era format):
    torch.load(weights_only=True — no arbitrary unpickling), unwrap the
    usual {"state_dict": ...} nesting, drop non-tensor bookkeeping
    entries (step counters etc.), bf16 -> f32 (numpy has no bf16)."""
    if path.endswith((".safetensors", ".sft")):
        from safetensors.numpy import load_file

        return load_file(path)
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    out = {}
    for k, v in sd.items():
        if not isinstance(v, torch.Tensor):
            continue
        if v.dtype == torch.bfloat16:
            v = v.float()
        out[k] = v.numpy()
    return out


def load_sdxl_safetensors(
    path: str,
    diffuser_cfg: DiffuserConfig,
    embedder_cfg=None,
    unet_dtype=jnp.bfloat16,
):
    """Load a single-file sgm checkpoint (sd_xl_base/refiner_1.0
    .safetensors, or the equivalent legacy .ckpt torch pickle).

    Returns (embedder_params | None, unet_params, vae_params). The refiner
    checkpoint carries only the bigG tower; its embedder slot is None here
    (base conditioning is reused, matching the reference pipeline).
    """
    tensors = _load_single_file_tensors(path)

    unet = build_unet_from_ldm(tensors, diffuser_cfg.unet_config(), unet_dtype)
    vae = build_vae_from_ldm(tensors)

    embedder = None
    if embedder_cfg is not None and any(
        k.startswith("conditioner.embedders.0.") for k in tensors
    ):
        embedder = {
            "clip": build_clip_from_hf(tensors, embedder_cfg.clip_config),
            "open_clip": build_clip_from_open_clip(
                tensors, embedder_cfg.open_clip_config
            ),
        }
    return embedder, unet, vae


def load_sd1_single_file(
    path: str,
    diffuser_cfg: DiffuserConfig,
    clip_cfg: CLIPConfig,
    unet_dtype=jnp.bfloat16,
    vae_cfg=None,
):
    """Load a single-file SD 1.x/2.x checkpoint in the ldm layout
    (v1-5-pruned.{ckpt,safetensors}, v2-1_768-ema-pruned, ...): UNet at
    model.diffusion_model.*, VAE at first_stage_model.*, text tower at
    cond_stage_model.transformer.* (SD1, HF CLIPTextModel layout) or
    cond_stage_model.model.* (SD2, open_clip TextTransformer with fused
    in_proj — auto-detected). Returns (clip_params, unet_params,
    vae_params, diffuser_cfg) with in_channels corrected from conv_in
    (9 for the runwayml inpainting checkpoints)."""
    import dataclasses

    tensors = _load_single_file_tensors(path)
    cin = int(
        tensors["model.diffusion_model.input_blocks.0.0.weight"].shape[1])
    if cin != diffuser_cfg.in_channels:
        diffuser_cfg = dataclasses.replace(diffuser_cfg, in_channels=cin)
    unet = build_unet_from_ldm(tensors, diffuser_cfg.unet_config(),
                               unet_dtype)
    vae = build_vae_from_ldm(tensors, vae_cfg)
    if any(k.startswith("cond_stage_model.model.") for k in tensors):
        clip = build_clip_from_open_clip(tensors, clip_cfg,
                                         prefix="cond_stage_model.model")
    else:
        clip = build_clip_from_hf(
            tensors, clip_cfg,
            prefix="cond_stage_model.transformer.text_model")
    return clip, unet, vae, diffuser_cfg
