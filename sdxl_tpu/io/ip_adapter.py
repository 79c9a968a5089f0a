"""IP-Adapter + CLIP vision encoder checkpoint loading.

Two artifact kinds (capability extension; the reference has neither):

  - a transformers `CLIPVisionModelWithProjection` directory
    (config.json + *.safetensors) -> models/clip_vision.py pytree;
  - an official IP-Adapter safetensors file (tencent-ailab/IP-Adapter,
    the same layout diffusers' load_ip_adapter consumes):
    image_proj.{proj,norm}.* and ip_adapter.{i}.to_{k,v}_ip.weight.

All torch Linear weights are [out, in] and transposed to this
framework's [in, out]; the patch conv is OIHW -> HWIO.
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from ..configs import UNetConfig
from ..models.clip_vision import CLIPVisionConfig
from ..models.ip_adapter import IPAdapterConfig, organize_ip_layers


def _load_safetensors(path: str) -> Dict[str, np.ndarray]:
    from safetensors.numpy import load_file

    return load_file(path)


def load_clip_vision_dir(model_dir: str, dtype=jnp.float32
                         ) -> Tuple[dict, CLIPVisionConfig]:
    """Load a transformers CLIPVisionModelWithProjection directory."""
    with open(os.path.join(model_dir, "config.json"), encoding="utf-8") as f:
        raw = json.load(f)
    # CLIPVisionModelWithProjection stores the vision fields at top level;
    # a full CLIPModel config nests them under "vision_config"
    vc = raw.get("vision_config", raw)
    cfg = CLIPVisionConfig(
        image_size=vc.get("image_size", 224),
        patch_size=vc.get("patch_size", 14),
        n_state=vc.get("hidden_size", 1280),
        n_head=vc.get("num_attention_heads", 16),
        n_layer=vc.get("num_hidden_layers", 32),
        embed_dim=raw.get("projection_dim", vc.get("projection_dim", 1024)),
        quick_gelu=vc.get("hidden_act", "gelu") == "quick_gelu",
    )

    from .diffusers_sdxl import _load_safetensors_dir

    return build_clip_vision_from_tensors(
        _load_safetensors_dir(model_dir), cfg, dtype
    ), cfg


def build_clip_vision_from_tensors(t: Dict[str, np.ndarray],
                                   cfg: CLIPVisionConfig,
                                   dtype=jnp.float32) -> dict:
    """transformers CLIPVisionModelWithProjection state-dict tensors ->
    models/clip_vision.py pytree."""
    def cast(a):
        return jnp.asarray(np.asarray(a), dtype)

    def lin(prefix):
        p = {"w": cast(t[f"{prefix}.weight"].T)}
        if f"{prefix}.bias" in t:
            p["b"] = cast(t[f"{prefix}.bias"])
        return p

    def ln(prefix):
        return {"gamma": cast(t[f"{prefix}.weight"]),
                "beta": cast(t[f"{prefix}.bias"])}

    vm = "vision_model"
    blocks = []
    for i in range(cfg.n_layer):
        b = f"{vm}.encoder.layers.{i}"
        blocks.append({
            "attn": {
                "q": lin(f"{b}.self_attn.q_proj"),
                "k": lin(f"{b}.self_attn.k_proj"),
                "v": lin(f"{b}.self_attn.v_proj"),
                "out": lin(f"{b}.self_attn.out_proj"),
            },
            "attn_ln": ln(f"{b}.layer_norm1"),
            "mlp": {"fc1": lin(f"{b}.mlp.fc1"), "fc2": lin(f"{b}.mlp.fc2")},
            "mlp_ln": ln(f"{b}.layer_norm2"),
        })
    params = {
        "class_embedding": cast(t[f"{vm}.embeddings.class_embedding"]),
        # OIHW -> HWIO
        "patch_embedding": {
            "w": cast(t[f"{vm}.embeddings.patch_embedding.weight"]
                      .transpose(2, 3, 1, 0))
        },
        "position_embedding": cast(
            t[f"{vm}.embeddings.position_embedding.weight"]),
        # transformers ships the "pre_layrnorm" typo verbatim
        "pre_ln": ln(f"{vm}.pre_layrnorm"),
        "post_ln": ln(f"{vm}.post_layernorm"),
        "blocks": blocks,
        "visual_projection": cast(t["visual_projection.weight"].T),
    }
    return params


_IP_LAYER_RE = re.compile(r"^ip_adapter\.(\d+)\.to_([kv])_ip\.weight$")


def load_ip_adapter_file(path: str, unet_cfg: UNetConfig,
                         dtype=jnp.float32) -> Tuple[dict, IPAdapterConfig]:
    """Load an official ip-adapter*.safetensors -> ({"image_proj",
    "layers": organized tree}, IPAdapterConfig). The flat ip_adapter.{i}
    entries are sorted numerically and assigned to cross-attention sites
    in checkpoint order (models/ip_adapter.py::organize_ip_layers)."""
    t = _load_safetensors(path)

    def cast(a):
        return jnp.asarray(np.asarray(a), dtype)

    if "image_proj.latents" in t:
        image_proj, cfg = _load_resampler(t, cast)
    elif "image_proj.proj.weight" in t:
        proj_w = t["image_proj.proj.weight"]  # [n_tokens*ctx, clip_dim]
        norm_g = t["image_proj.norm.weight"]
        context_dim = int(norm_g.shape[0])
        clip_dim = int(proj_w.shape[1])
        n_tokens = int(proj_w.shape[0]) // context_dim
        cfg = IPAdapterConfig(clip_embed_dim=clip_dim,
                              context_dim=context_dim, n_tokens=n_tokens)
        image_proj = {
            "proj": {"w": cast(proj_w.T),
                     "b": cast(t["image_proj.proj.bias"])},
            "norm": {"gamma": cast(norm_g),
                     "beta": cast(t["image_proj.norm.bias"])},
        }
    else:
        present = sorted({k.split(".")[0] for k in t})
        raise ValueError(
            f"{path}: not an IP-Adapter checkpoint — neither "
            f"image_proj.proj.weight (ImageProjModel) nor "
            f"image_proj.latents (Resampler/'plus') found "
            f"(top-level keys: {present})"
        )
    if cfg.context_dim != unet_cfg.context_dim:
        raise ValueError(
            f"{path}: adapter context dim {cfg.context_dim} != UNet context "
            f"dim {unet_cfg.context_dim} — wrong model family?"
        )

    by_idx: Dict[int, dict] = {}
    for key, val in t.items():
        m = _IP_LAYER_RE.match(key)
        if not m:
            continue
        idx, which = int(m.group(1)), m.group(2)
        by_idx.setdefault(idx, {})[which] = {"w": cast(val.T)}
    flat = [by_idx[i] for i in sorted(by_idx)]
    for i, layer in zip(sorted(by_idx), flat):
        if "k" not in layer or "v" not in layer:
            raise ValueError(f"{path}: ip_adapter.{i} missing to_k_ip or "
                             "to_v_ip")
    params = {
        "image_proj": image_proj,
        "layers": organize_ip_layers(flat, unet_cfg),
    }
    return params, cfg


def _load_resampler(t: Dict[str, np.ndarray], cast):
    """Official "plus" Resampler weights -> (params, IPAdapterConfig).

    Key layout (official resampler.py module tree): image_proj.latents,
    proj_in, proj_out, norm_out, layers.{i}.0.{norm1,norm2,to_q,to_kv,
    to_out} (PerceiverAttention) and layers.{i}.1.{0,1,3} (FeedForward =
    Sequential[LayerNorm, Linear, GELU, Linear], no biases on the
    Linears). dim_head is 64 in every shipped adapter, so heads =
    inner_dim / 64."""
    latents = t["image_proj.latents"]  # [1, n_queries, dim]
    _, n_queries, dim = latents.shape
    embedding_dim = int(t["image_proj.proj_in.weight"].shape[1])
    output_dim = int(t["image_proj.proj_out.weight"].shape[0])
    inner = int(t["image_proj.layers.0.0.to_q.weight"].shape[0])
    depth = 0
    while f"image_proj.layers.{depth}.0.to_q.weight" in t:
        depth += 1

    def lin(prefix, bias=True):
        p = {"w": cast(t[f"{prefix}.weight"].T)}
        if bias and f"{prefix}.bias" in t:
            p["b"] = cast(t[f"{prefix}.bias"])
        return p

    def ln(prefix):
        return {"gamma": cast(t[f"{prefix}.weight"]),
                "beta": cast(t[f"{prefix}.bias"])}

    layers = []
    for i in range(depth):
        a = f"image_proj.layers.{i}.0"
        f = f"image_proj.layers.{i}.1"
        layers.append({
            "attn": {
                "norm1": ln(f"{a}.norm1"),
                "norm2": ln(f"{a}.norm2"),
                "q": lin(f"{a}.to_q", bias=False),
                "kv": lin(f"{a}.to_kv", bias=False),
                "out": lin(f"{a}.to_out", bias=False),
            },
            "ff": {
                "norm": ln(f"{f}.0"),
                "fc1": lin(f"{f}.1", bias=False),
                "fc2": lin(f"{f}.3", bias=False),
            },
        })
    params = {
        "latents": cast(latents),
        "proj_in": lin("image_proj.proj_in"),
        "proj_out": lin("image_proj.proj_out"),
        "norm_out": ln("image_proj.norm_out"),
        "layers": layers,
    }
    cfg = IPAdapterConfig(
        clip_embed_dim=embedding_dim, context_dim=output_dim,
        n_tokens=int(n_queries), variant="resampler", dim=int(dim),
        depth=depth, heads=inner // 64,
    )
    return params, cfg
