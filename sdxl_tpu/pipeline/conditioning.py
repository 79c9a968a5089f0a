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
               size, crop, ar, aesthetic, clip_w=None, oc_w=None,
               clip_skip: int = 0):
    """clip_tokens/open_clip_tokens: [B, k, 77] chunked ids (k=1 is the
    reference's single-window case); optional [B, k, 77] prompt weights
    (pipeline/prompt.py). Chunks run through the towers batched and are
    re-concatenated along the token axis; the pooled embedding comes from
    chunk 0 (standard long-prompt convention)."""
    b, k, n_ctx = clip_tokens.shape

    clip_ctx = clip_hidden(
        embedder_params["clip"], cfg.clip_config,
        clip_tokens.reshape(b * k, n_ctx),
        cfg.clip_config.n_layer - 1 - clip_skip,
    )
    clip_ctx = clip_ctx.reshape(b, k * n_ctx, -1)
    open_ctx, pooled = clip_hidden_pooled(
        embedder_params["open_clip"], cfg.open_clip_config,
        open_clip_tokens.reshape(b * k, n_ctx),
        cfg.open_clip_config.n_layer - 1 - clip_skip,
    )
    open_ctx = open_ctx.reshape(b, k * n_ctx, -1)
    pooled = pooled.reshape(b, k, -1)[:, 0]

    if clip_w is not None:
        from .prompt import apply_prompt_weights

        clip_ctx = apply_prompt_weights(clip_ctx, clip_w.reshape(b, k * n_ctx))
        open_ctx = apply_prompt_weights(open_ctx, oc_w.reshape(b, k * n_ctx))

    context_full = jnp.concatenate([clip_ctx, open_ctx], axis=-1)
    channel = conditioning_embedding(pooled, 256, size, crop, ar)
    channel_refiner = conditioning_embedding(pooled, 256, size, crop, aesthetic)
    return context_full, open_ctx, channel, channel_refiner


@functools.partial(jax.jit, static_argnames=("cfg", "weighted", "clip_skip"))
def _conditioning_half_program(embedder_params, cfg: EmbedderConfig,
                               tokens_clip, tokens_open_clip,
                               size, crop, ar, weighted=False,
                               w_clip=None, w_oc=None, clip_skip: int = 0):
    """One branch (conditional OR unconditional) of the conditioning
    computation. Split so the unconditional half — which for the default
    "" negative prompt depends only on (resolution, crop, clip_skip), not
    on the request's prompts — can be cached across requests
    (the reference recomputes uncond per request; uncond is always "",
    stablediffusion/mod.rs:698-726)."""
    n_batch = tokens_clip.shape[0]
    aesthetic = jnp.full((n_batch, 1), AESTHETIC_SCORE, dtype=size.dtype)
    return _embed_one(
        embedder_params, cfg, tokens_clip, tokens_open_clip,
        size, crop, ar, aesthetic,
        clip_w=w_clip if weighted else None,
        oc_w=w_oc if weighted else None,
        clip_skip=clip_skip,
    )


def text_to_conditioning(
    embedder_params,
    cfg: EmbedderConfig,
    clip_tokenizer,
    open_clip_tokenizer,
    prompts,
    resolution: Tuple[int, int] = (1024, 1024),
    crop: Tuple[int, int] = (0, 0),
    negative_prompt: str = "",
    parse_attention: bool = True,
    max_chunks: int = 4,
    clip_skip: int = 0,
    uncond_cache: dict | None = None,
) -> Conditioning:
    """Prompts -> Conditioning. `negative_prompt` generalizes the
    reference's hardcoded "" unconditional branch.

    Prompt-emphasis markup ((word:1.3), [word]) and >75-content-token
    prompts (chunked, up to max_chunks x 77 context tokens) are handled by
    pipeline/prompt.py; plain short prompts take the exact reference path
    (single chunk, no weighting applied).

    uncond_cache: optional mutable dict; the unconditional half depends
    only on (negative_prompt, resolution, crop, clip_skip, chunk count,
    weighting) — NOT on the prompts — so it is memoized there across
    requests. The caller owns invalidation (must clear when the embedder
    params change, e.g. textual inversions)."""
    from .prompt import batch_weighted_tokens

    if isinstance(prompts, str):
        prompts = [prompts]
    n = len(prompts)
    h, w = resolution

    clip_ids, w_clip, u_clip_ids, uw_clip, weighted_c, k1 = batch_weighted_tokens(
        prompts, negative_prompt, clip_tokenizer, cfg.clip_config.n_ctx,
        max_chunks, parse_attention,
    )
    oc_ids, w_oc, u_oc_ids, uw_oc, weighted_o, k2 = batch_weighted_tokens(
        prompts, negative_prompt, open_clip_tokenizer,
        cfg.open_clip_config.n_ctx, max_chunks, parse_attention,
    )
    # the two tokenizers can disagree on chunk count near a boundary; pad
    # the shorter to the common k so the concatenated contexts align
    if k1 != k2:
        from .prompt import pad_chunks as _pc

        k = max(k1, k2)
        if k1 < k:
            padded = [_pc(clip_ids[i], w_clip[i], k, clip_tokenizer,
                          cfg.clip_config.n_ctx) for i in range(n)]
            clip_ids = np.stack([p[0] for p in padded])
            w_clip = np.stack([p[1] for p in padded])
            u_clip_ids0, uw_clip0 = _pc(u_clip_ids[0], uw_clip[0], k,
                                        clip_tokenizer, cfg.clip_config.n_ctx)
            u_clip_ids, uw_clip = u_clip_ids0[None], uw_clip0[None]
        if k2 < k:
            padded = [_pc(oc_ids[i], w_oc[i], k, open_clip_tokenizer,
                          cfg.open_clip_config.n_ctx) for i in range(n)]
            oc_ids = np.stack([p[0] for p in padded])
            w_oc = np.stack([p[1] for p in padded])
            u_oc_ids0, uw_oc0 = _pc(u_oc_ids[0], uw_oc[0], k,
                                    open_clip_tokenizer,
                                    cfg.open_clip_config.n_ctx)
            u_oc_ids, uw_oc = u_oc_ids0[None], uw_oc0[None]
    weighted = bool(weighted_c or weighted_o)

    size = jnp.broadcast_to(jnp.array([[h, w]], jnp.int32), (n, 2))
    crop_a = jnp.broadcast_to(jnp.array([list(crop)], jnp.int32), (n, 2))
    ar = jnp.broadcast_to(jnp.array([[h, w]], jnp.int32), (n, 2))

    ctx_full, ctx_oc, ch, ch_ref = _conditioning_half_program(
        embedder_params, cfg, jnp.asarray(clip_ids), jnp.asarray(oc_ids),
        size, crop_a, ar, weighted=weighted,
        w_clip=jnp.asarray(w_clip), w_oc=jnp.asarray(w_oc),
        clip_skip=clip_skip,
    )

    cache_key = None
    if uncond_cache is not None:
        cache_key = (negative_prompt, (h, w), tuple(crop), clip_skip,
                     int(clip_ids.shape[1]), weighted)
    if cache_key is not None and cache_key in uncond_cache:
        u_full, u_oc, u_ch, u_ch_ref = uncond_cache[cache_key]
    else:
        u_full, u_oc, u_ch, u_ch_ref = _conditioning_half_program(
            embedder_params, cfg, jnp.asarray(u_clip_ids),
            jnp.asarray(u_oc_ids), size[:1], crop_a[:1], ar[:1],
            weighted=weighted,
            w_clip=jnp.asarray(uw_clip), w_oc=jnp.asarray(uw_oc),
            clip_skip=clip_skip,
        )
        if cache_key is not None:
            uncond_cache[cache_key] = (u_full, u_oc, u_ch, u_ch_ref)

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
