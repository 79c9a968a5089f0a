"""IP-Adapter (Ye et al. 2023, arXiv:2308.06721) — image-prompt
conditioning via decoupled cross-attention.

Capability extension — the reference is text-only. Semantics follow the
official tencent-ailab/IP-Adapter implementation (the one diffusers
loads):

  - a CLIP vision tower (models/clip_vision.py) embeds the prompt image
    to its projected `image_embeds`;
  - `ImageProjModel` maps that embedding to `n_tokens` (4) extra context
    tokens: Linear -> reshape -> LayerNorm. The unconditional branch runs
    a ZERO image embedding through the same projection (official
    get_image_embeds semantics), so CFG contrasts image-vs-no-image;
  - every cross-attention layer gets an extra K/V pair (`to_k_ip`,
    `to_v_ip`, no bias) over the image tokens; the layer output becomes
    attn(q, k_text, v_text) + scale * attn(q, k_ip, v_ip), summed BEFORE
    the output projection (official IPAttnProcessor). Attention is linear
    in V, so `scale` is folded into v_ip at precompute time and the scan
    body just adds the two attention results.

TPU notes: the image tokens are loop-invariant, so — like the text K/V —
every ip K/V projection is hoisted out of the sampling scan
(merge_ip_kv extends precompute_cross_kv's tree); the per-step cost is
one extra tiny-KV attention per cross-attn layer.

Checkpoint layout (official ip-adapter*.safetensors):
  image_proj.proj.{weight,bias}, image_proj.norm.{weight,bias},
  ip_adapter.{i}.to_{k,v}_ip.weight with i = 1, 3, 5, ... enumerating
  the UNet's attention processors in diffusers registration order —
  down blocks, then UP blocks, then MID block (the up-before-mid order
  is a diffusers module-registration quirk that the checkpoint numbering
  inherits; diffusers' own _load_ip_adapter_weights walks the same
  order, key_id starting at 1 stepping by 2).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..configs import UNetConfig
from ..ops.linear import linear, linear_nobias
from ..ops.norms import layernorm_affine
from .unet import unet_block_plan


@dataclass(frozen=True)
class IPAdapterConfig:
    clip_embed_dim: int = 1024   # vision tower projection_dim (ViT-H)
    context_dim: int = 2048      # UNet cross-attention dim
    n_tokens: int = 4            # extra context tokens
    # "proj" = ImageProjModel over the projected image embedding (the
    # non-plus adapters); "resampler" = perceiver Resampler over the
    # vision tower's PENULTIMATE hidden states (the "plus" adapters)
    variant: str = "proj"
    # resampler geometry (variant="resampler"): official Resampler args
    dim: int = 0                 # latent width
    depth: int = 0               # attn+ff layer pairs
    heads: int = 0               # dim_head is 64 in every shipped adapter


def ip_image_tokens(params, cfg: IPAdapterConfig,
                    image_embeds: jnp.ndarray) -> jnp.ndarray:
    """ImageProjModel: [B, clip_embed_dim] -> [B, n_tokens, context_dim]
    (Linear -> reshape -> LayerNorm), official ImageProjModel.forward."""
    x = linear(params["proj"], image_embeds)
    x = x.reshape(x.shape[0], cfg.n_tokens, cfg.context_dim)
    return layernorm_affine(x, **params["norm"])


def _perceiver_attention(p, x, lat, heads: int):
    """Official PerceiverAttention: latents query a concat of (input
    tokens, latents); no-bias projections, f32 softmax (the official
    (q*s)@(k*s) double-sqrt scaling equals the standard d^-0.5)."""
    from ..ops.attention import qkv_attention

    xn = layernorm_affine(x, **p["norm1"])
    ln = layernorm_affine(lat, **p["norm2"])
    q = linear_nobias(p["q"], ln)
    kv = linear_nobias(p["kv"], jnp.concatenate([xn, ln], axis=1))
    k, v = jnp.split(kv, 2, axis=-1)
    return linear_nobias(p["out"], qkv_attention(q, k, v, None, heads))


def resampler_tokens(params, cfg: IPAdapterConfig,
                     hidden: jnp.ndarray) -> jnp.ndarray:
    """Official Resampler.forward: [B, T, embedding_dim] penultimate
    vision hidden states -> [B, n_tokens, context_dim].

    latents (learned, [1, n_tokens, dim]) attend to proj_in(hidden) ++
    latents through `depth` (PerceiverAttention, FeedForward) residual
    pairs; proj_out + LayerNorm close it out. FeedForward is
    LayerNorm -> Linear(no bias) -> GELU -> Linear(no bias)."""
    x = linear(params["proj_in"], hidden)
    lat = jnp.broadcast_to(
        params["latents"], (x.shape[0],) + params["latents"].shape[1:]
    )
    for layer in params["layers"]:
        lat = _perceiver_attention(layer["attn"], x, lat, cfg.heads) + lat
        ff = layer["ff"]
        h = layernorm_affine(lat, **ff["norm"])
        h = linear_nobias(ff["fc2"],
                          jax.nn.gelu(linear_nobias(ff["fc1"], h),
                                      approximate=False))
        lat = h + lat
    out = linear(params["proj_out"], lat)
    return layernorm_affine(out, **params["norm_out"])


def organize_ip_layers(flat_layers, cfg: UNetConfig):
    """Flat checkpoint-order list of {k: {w}, v: {w}} -> the
    precompute_cross_kv tree layout ({"input_blocks": {i: [per-depth]},
    "middle_block": [...], "output_blocks": {i: [...]}}).

    Checkpoint order (see module docstring): input blocks ascending,
    OUTPUT blocks ascending, middle block last."""
    in_plan, mid_spec, out_plan = unet_block_plan(cfg)
    it = iter(flat_layers)
    out = {"input_blocks": {}, "output_blocks": {}}
    try:
        for i, spec in enumerate(in_plan):
            if spec.kind in ("res_t", "res_t_up"):
                out["input_blocks"][i] = [next(it) for _ in range(spec.depth)]
        for i, spec in enumerate(out_plan):
            if spec.kind in ("res_t", "res_t_up"):
                out["output_blocks"][i] = [
                    next(it) for _ in range(spec.depth)
                ]
        out["middle_block"] = [next(it) for _ in range(mid_spec.depth)]
    except StopIteration:
        raise ValueError(
            f"IP-Adapter layer count mismatch: checkpoint has "
            f"{len(flat_layers)} cross-attention layers, the UNet config "
            "expects more — wrong model family?"
        ) from None
    leftover = sum(1 for _ in it)
    if leftover:
        raise ValueError(
            f"IP-Adapter layer count mismatch: {leftover} unconsumed "
            f"checkpoint layers for this UNet config — wrong model family?"
        )
    return out


def merge_ip_kv(cross_kv, ip_layers_tree, ip_tokens2: jnp.ndarray,
                scale) -> dict:
    """Extend a precompute_cross_kv tree with ip_k/ip_v entries.

    ip_tokens2: [B', n_tokens, context_dim] image tokens matching the
    context batch the UNet sees (CFG-doubled [uncond | cond] when the
    sampler pair-batches). `scale` is folded into v_ip (attention output
    is linear in V), so the attention body needs no extra scalar.

    Handles both per-depth lists and stacked (lax.scan) transformer
    blocks — for stacks the per-depth ip projections are vmapped so the
    resulting K/V carry the same leading depth axis as the stacked text
    K/V."""
    def block_ip(lp):
        return {
            "ip_k": linear_nobias(lp["k"], ip_tokens2),
            "ip_v": linear_nobias(lp["v"], ip_tokens2) * scale,
        }

    def merge_site(kv_site, ip_site):
        if isinstance(kv_site, dict):  # stacked: leading depth axis
            stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *ip_site)
            ip = jax.vmap(block_ip)(stacked)
            return {**kv_site, **ip}
        return [{**kv, **block_ip(lp)} for kv, lp in zip(kv_site, ip_site)]

    out = {
        "input_blocks": {
            i: merge_site(kv, ip_layers_tree["input_blocks"][i])
            for i, kv in cross_kv["input_blocks"].items()
        },
        "middle_block": merge_site(
            cross_kv["middle_block"], ip_layers_tree["middle_block"]
        ),
        "output_blocks": {
            i: merge_site(kv, ip_layers_tree["output_blocks"][i])
            for i, kv in cross_kv["output_blocks"].items()
        },
    }
    return out


# ---------------------------------------------------------------------------
# Initialization (tests / bring-up without real weights)
# ---------------------------------------------------------------------------

def init_ip_adapter(key, unet_cfg: UNetConfig, cfg: IPAdapterConfig,
                    dtype=jnp.float32, scale: float = 0.02):
    """Random ImageProjModel + per-cross-attn to_k_ip/to_v_ip weights
    (flat checkpoint order)."""
    in_plan, mid_spec, out_plan = unet_block_plan(unet_cfg)
    sites = (
        [s for s in in_plan if s.kind in ("res_t", "res_t_up")]
        + [s for s in out_plan if s.kind in ("res_t", "res_t_up")]
        + [mid_spec]
    )
    ks = jax.random.split(key, 2)
    layers = []
    n = 0
    for spec in sites:
        inner = spec.ch_out
        for _ in range(spec.depth):
            k1, k2 = jax.random.split(jax.random.fold_in(ks[0], n), 2)
            layers.append({
                "k": {"w": jax.random.normal(
                    k1, (cfg.context_dim, inner), dtype) * scale},
                "v": {"w": jax.random.normal(
                    k2, (cfg.context_dim, inner), dtype) * scale},
            })
            n += 1
    k3, k4 = jax.random.split(ks[1])
    proj = {
        "proj": {
            "w": jax.random.normal(
                k3, (cfg.clip_embed_dim, cfg.n_tokens * cfg.context_dim),
                dtype) * scale,
            "b": jnp.zeros((cfg.n_tokens * cfg.context_dim,), dtype),
        },
        "norm": {"gamma": jnp.ones((cfg.context_dim,), dtype),
                 "beta": jnp.zeros((cfg.context_dim,), dtype)},
    }
    return {"image_proj": proj, "layers": layers}
