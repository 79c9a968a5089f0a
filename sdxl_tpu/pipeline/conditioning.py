"""Dual-CLIP conditioning for SDXL.

Reimplements Embedder::text_to_conditioning
(/root/reference/src/model/stablediffusion/mod.rs:626-801):

  - CLIP ViT-L hidden at the penultimate layer (11 of 12)   (:759-770)
  - OpenCLIP bigG hidden at penultimate (31 of 32) + pooled  (:772-783)
  - context_full = cat(clip 768, openclip 1280) = 2048       (:745)
  - channel context = pooled ++ sinusoid(size, crop, ar)     = 2816
  - refiner channel context replaces ar with aesthetic score 6 = 2560
    (:709-711, 740-742)
  - the unconditional branch runs the same machinery on ""   (:698-726)

The two towers + all eight conditioning tensors compile into ONE jitted
program; tokenization happens host-side.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import EmbedderConfig
from ..models.clip import clip_hidden, clip_hidden_pooled
from ..ops.embeddings import conditioning_embedding
from ..tokenizer import tokenize_text

AESTHETIC_SCORE = 6  # stablediffusion/mod.rs:709 (refiner micro-conditioning)


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=(
        "unconditional_context_full",
        "unconditional_context_open_clip",
        "context_full",
        "context_open_clip",
        "unconditional_channel_context",
        "unconditional_channel_context_refiner",
        "channel_context",
        "channel_context_refiner",
    ),
    meta_fields=("resolution",),
)
@dataclass
class Conditioning:
    """The 8 conditioning tensors + target resolution
    (stablediffusion/mod.rs:544-555). Unconditional tensors carry batch 1
    and are broadcast at CFG time."""

    unconditional_context_full: jnp.ndarray          # [1, 77, 2048]
    unconditional_context_open_clip: jnp.ndarray     # [1, 77, 1280]
    context_full: jnp.ndarray                        # [B, 77, 2048]
    context_open_clip: jnp.ndarray                   # [B, 77, 1280]
    unconditional_channel_context: jnp.ndarray       # [1, 2816]
    unconditional_channel_context_refiner: jnp.ndarray  # [1, 2560]
    channel_context: jnp.ndarray                     # [B, 2816]
    channel_context_refiner: jnp.ndarray             # [B, 2560]
    resolution: Tuple[int, int]                      # (height, width)

    @property
    def batch(self) -> int:
        return self.context_full.shape[0]

    def astype(self, dtype) -> "Conditioning":
        """Precision restaging (replaces the reference's host-round-trip
        BackendConverter, backend_converter.rs:25-40 — on TPU this is a
        device-side cast fused into the consumer)."""
        return jax.tree.map(lambda a: a.astype(dtype), self)


def _embed_one(embedder_params, cfg: EmbedderConfig, clip_tokens, open_clip_tokens,
               size, crop, ar, aesthetic):
    clip_ctx = clip_hidden(
        embedder_params["clip"], cfg.clip_config, clip_tokens,
        cfg.clip_config.n_layer - 1,
    )
    open_ctx, pooled = clip_hidden_pooled(
        embedder_params["open_clip"], cfg.open_clip_config, open_clip_tokens,
        cfg.open_clip_config.n_layer - 1,
    )
    context_full = jnp.concatenate([clip_ctx, open_ctx], axis=-1)
    channel = conditioning_embedding(pooled, 256, size, crop, ar)
    channel_refiner = conditioning_embedding(pooled, 256, size, crop, aesthetic)
    return context_full, open_ctx, channel, channel_refiner


@functools.partial(jax.jit, static_argnames=("cfg",))
def _conditioning_program(embedder_params, cfg: EmbedderConfig,
                          cond_tokens_clip, cond_tokens_open_clip,
                          uncond_tokens_clip, uncond_tokens_open_clip,
                          size, crop, ar):
    n_batch = cond_tokens_clip.shape[0]
    aesthetic = jnp.full((n_batch, 1), AESTHETIC_SCORE, dtype=size.dtype)

    ctx_full, ctx_oc, ch, ch_ref = _embed_one(
        embedder_params, cfg, cond_tokens_clip, cond_tokens_open_clip,
        size, crop, ar, aesthetic,
    )
    u_full, u_oc, u_ch, u_ch_ref = _embed_one(
        embedder_params, cfg, uncond_tokens_clip, uncond_tokens_open_clip,
        size[:1], crop[:1], ar[:1], aesthetic[:1],
    )
    return ctx_full, ctx_oc, ch, ch_ref, u_full, u_oc, u_ch, u_ch_ref


def text_to_conditioning(
    embedder_params,
    cfg: EmbedderConfig,
    clip_tokenizer,
    open_clip_tokenizer,
    prompts,
    resolution: Tuple[int, int] = (1024, 1024),
    crop: Tuple[int, int] = (0, 0),
    negative_prompt: str = "",
) -> Conditioning:
    """Prompts -> Conditioning. `negative_prompt` generalizes the
    reference's hardcoded "" unconditional branch."""
    if isinstance(prompts, str):
        prompts = [prompts]
    n = len(prompts)
    h, w = resolution

    clip_ids = np.array(
        [tokenize_text(p, clip_tokenizer, cfg.clip_config.n_ctx) for p in prompts],
        dtype=np.int32,
    )
    oc_ids = np.array(
        [tokenize_text(p, open_clip_tokenizer, cfg.open_clip_config.n_ctx) for p in prompts],
        dtype=np.int32,
    )
    u_clip_ids = np.array(
        [tokenize_text(negative_prompt, clip_tokenizer, cfg.clip_config.n_ctx)],
        dtype=np.int32,
    )
    u_oc_ids = np.array(
        [tokenize_text(negative_prompt, open_clip_tokenizer, cfg.open_clip_config.n_ctx)],
        dtype=np.int32,
    )

    size = jnp.broadcast_to(jnp.array([[h, w]], jnp.int32), (n, 2))
    crop_a = jnp.broadcast_to(jnp.array([list(crop)], jnp.int32), (n, 2))
    ar = jnp.broadcast_to(jnp.array([[h, w]], jnp.int32), (n, 2))

    ctx_full, ctx_oc, ch, ch_ref, u_full, u_oc, u_ch, u_ch_ref = _conditioning_program(
        embedder_params, cfg, jnp.asarray(clip_ids), jnp.asarray(oc_ids),
        jnp.asarray(u_clip_ids), jnp.asarray(u_oc_ids), size, crop_a, ar,
    )

    return Conditioning(
        unconditional_context_full=u_full,
        unconditional_context_open_clip=u_oc,
        context_full=ctx_full,
        context_open_clip=ctx_oc,
        unconditional_channel_context=u_ch,
        unconditional_channel_context_refiner=u_ch_ref,
        channel_context=ch,
        channel_context_refiner=ch_ref,
        resolution=(h, w),
    )
