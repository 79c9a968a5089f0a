"""CLIP vision transformer (IP-Adapter image encoder).

Capability extension — the reference is text-only. Semantics match
transformers' `CLIPVisionModelWithProjection` (the encoder the official
IP-Adapter checkpoints pair with): patch conv -> [CLS] + learned position
embeddings -> pre-LN -> bidirectional pre-LN residual blocks (the same
block math as the text towers, models/clip.py, without the causal mask)
-> post-LN on the CLS token -> visual projection. Parity vs the torch
model is asserted in tests/test_ip_adapter.py.

Param pytree:
  class_embedding: [n_state]
  patch_embedding: {w: [P, P, 3, n_state]}        (HWIO conv, no bias)
  position_embedding: [n_patches + 1, n_state]
  pre_ln / post_ln: {gamma, beta}
  blocks: as models/clip.py (attn/attn_ln/mlp/mlp_ln)
  visual_projection: [n_state, embed_dim] (no bias)
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import CLIPConfig
from ..ops.conv import conv2d
from ..ops.norms import layernorm_affine
from .clip import _block, init_clip

# CLIP preprocessing constants (OpenAI CLIP normalize; transformers
# CLIPImageProcessor defaults)
CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    n_state: int = 1280       # ViT-H/14 (the ip-adapter_sdxl_vit-h encoder)
    n_head: int = 16
    n_layer: int = 32
    embed_dim: int = 1024     # projection_dim
    quick_gelu: bool = False  # OpenAI ViT-L uses quick_gelu; laion gelu

    @property
    def n_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    def text_cfg(self) -> CLIPConfig:
        """Shim: the residual blocks reuse the text-tower block fn, which
        only reads n_head/quick_gelu from its config."""
        return CLIPConfig(
            n_state=self.n_state, embed_dim=self.embed_dim,
            n_head=self.n_head, n_layer=self.n_layer,
            quick_gelu=self.quick_gelu,
        )


def preprocess_image(images: np.ndarray, cfg: CLIPVisionConfig) -> jnp.ndarray:
    """[B, H, W, 3] (uint8 or float in [0, 1]) -> normalized
    [B, S, S, 3] f32 at the tower's input size (bicubic resize, CLIP
    mean/std) — transformers CLIPImageProcessor semantics."""
    x = jnp.asarray(images)
    if x.ndim == 3:
        x = x[None]
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.float32) / 255.0
    x = x.astype(jnp.float32)
    s = cfg.image_size
    if x.shape[1:3] != (s, s):
        x = jax.image.resize(x, (x.shape[0], s, s, 3), method="bicubic")
        x = jnp.clip(x, 0.0, 1.0)
    mean = jnp.asarray(CLIP_IMAGE_MEAN, jnp.float32)
    std = jnp.asarray(CLIP_IMAGE_STD, jnp.float32)
    return (x - mean) / std


def clip_vision_tokens(params, cfg: CLIPVisionConfig,
                       pixels: jnp.ndarray) -> jnp.ndarray:
    """Patch + CLS + position embeddings -> [B, 1 + n_patches, n_state]."""
    b = pixels.shape[0]
    patches = conv2d(params["patch_embedding"], pixels,
                     stride=cfg.patch_size, padding=((0, 0), (0, 0)))
    patches = patches.reshape(b, -1, cfg.n_state)
    cls = jnp.broadcast_to(params["class_embedding"][None, None, :],
                           (b, 1, cfg.n_state))
    x = jnp.concatenate([cls, patches], axis=1)
    return x + params["position_embedding"][None, : x.shape[1], :]


def clip_vision_hidden(params, cfg: CLIPVisionConfig, pixels: jnp.ndarray,
                       n_blocks: int | None = None) -> jnp.ndarray:
    """Hidden state after `n_blocks` blocks (default: all), no post-LN.
    n_blocks = n_layer - 1 gives the penultimate hidden the IP-Adapter
    "plus" Resampler consumes (transformers hidden_states[-2])."""
    tcfg = cfg.text_cfg()
    x = layernorm_affine(clip_vision_tokens(params, cfg, pixels),
                         **params["pre_ln"])
    blocks = params["blocks"]
    if n_blocks is not None:
        blocks = blocks[:n_blocks]
    for p in blocks:
        x = _block(p, x, None, tcfg)
    return x


def clip_vision_embed(params, cfg: CLIPVisionConfig,
                      pixels: jnp.ndarray) -> jnp.ndarray:
    """Projected image embedding [B, embed_dim] — transformers'
    `image_embeds` (post-LN on the CLS token, then visual_projection)."""
    x = clip_vision_hidden(params, cfg, pixels)
    pooled = layernorm_affine(x[:, 0, :], **params["post_ln"])
    return pooled @ params["visual_projection"]


clip_vision_embed_jit = jax.jit(clip_vision_embed, static_argnums=(1,))


@functools.partial(jax.jit, static_argnums=(1,))
def clip_vision_penultimate_jit(params, cfg: CLIPVisionConfig, pixels):
    """Penultimate hidden states (IP-Adapter plus Resampler input)."""
    return clip_vision_hidden(params, cfg, pixels, n_blocks=cfg.n_layer - 1)


# ---------------------------------------------------------------------------
# Initialization (tests / bring-up without real weights)
# ---------------------------------------------------------------------------

def init_clip_vision(key, cfg: CLIPVisionConfig, dtype=jnp.float32,
                     scale: float = 0.02):
    ks = jax.random.split(key, 5)
    text = init_clip(ks[0], cfg.text_cfg(), dtype, scale)

    def ln(d):
        return {"gamma": jnp.ones((d,), dtype), "beta": jnp.zeros((d,), dtype)}

    p = cfg.patch_size
    return {
        "class_embedding": jax.random.normal(ks[1], (cfg.n_state,), dtype)
        * scale,
        "patch_embedding": {
            "w": jax.random.normal(ks[2], (p, p, 3, cfg.n_state), dtype)
            * scale
        },
        "position_embedding": jax.random.normal(
            ks[3], (cfg.n_patches + 1, cfg.n_state), dtype) * scale,
        "pre_ln": ln(cfg.n_state),
        "post_ln": ln(cfg.n_state),
        "blocks": text["blocks"],
        "visual_projection": jax.random.normal(
            ks[4], (cfg.n_state, cfg.embed_dim), dtype) * scale,
    }
