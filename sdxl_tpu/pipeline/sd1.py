"""SD 1.x / 2.x pipeline (capability extension).

The reference covers SDXL only; the same config-driven UNet generator,
samplers and VAE serve the earlier Stable Diffusion family with different
knobs (configs.SD15_DIFFUSER / SD2_DIFFUSER):

  - single text tower: CLIP ViT-L (SD 1.x, quick_gelu) or OpenCLIP ViT-H
    (SD 2.x), conditioning = final hidden state after the last LayerNorm
    (SD 1.x) or the penultimate hidden (SD 2.x)
  - no pooled/micro-conditioning channel embedding (adm_in_channels = 0)
  - 4-level UNet, transformers at levels 0-2 depth 1; SD 1.x fixes 8 heads
    at every width
  - VAE: same architecture, scale_factor 0.18215

Everything downstream (DDIM/Euler/DPM++ scan, CFG pair-batching, inpaint,
img2img, chunked decode, dp x tp sharding) is shared with the SDXL
pipeline; the conditioning tensors simply carry channel_context = None.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import (
    AutoencoderConfig,
    CLIPConfig,
    CLIP_VIT_L_CONFIG,
    DiffuserConfig,
    SD15_DIFFUSER,
    SD15_VAE_SCALE,
)
from ..models.clip import clip_final_hidden, clip_hidden
from ..tokenizer import ClipTokenizer
from ..utils import log
from .conditioning import Conditioning
from .pipeline import SDXLPipeline
from .sampler import scaled_linear_alphas_cumprod


@functools.partial(jax.jit, static_argnames=("cfg", "penultimate", "weighted",
                                             "clip_skip"))
def _sd1_conditioning_program(clip_params, cfg: CLIPConfig, cond_tokens,
                              uncond_tokens, penultimate: bool,
                              weighted: bool = False, w=None, uw=None,
                              clip_skip: int = 0):
    from ..ops.norms import layernorm_affine

    def embed(tokens, wts):
        b, k, n_ctx = tokens.shape
        if penultimate:  # SD 2.x convention: one block early, no final LN
            h = clip_hidden(clip_params, cfg, tokens.reshape(b * k, n_ctx),
                            cfg.n_layer - 1 - clip_skip)
        elif clip_skip:
            # diffusers clip_skip semantics: earlier hidden, final LN kept
            h = layernorm_affine(
                clip_hidden(clip_params, cfg, tokens.reshape(b * k, n_ctx),
                            cfg.n_layer - clip_skip),
                **clip_params["layer_norm"],
            )
        else:
            h = clip_final_hidden(clip_params, cfg,
                                  tokens.reshape(b * k, n_ctx))
        h = h.reshape(b, k * n_ctx, -1)
        if weighted:
            from .prompt import apply_prompt_weights

            h = apply_prompt_weights(h, wts.reshape(b, k * n_ctx))
        return h

    return embed(cond_tokens, w), embed(uncond_tokens, uw)


def text_to_conditioning_sd1(
    clip_params,
    cfg: CLIPConfig,
    tokenizer,
    prompts,
    resolution: Tuple[int, int],
    negative_prompt: str = "",
    penultimate: bool = False,
    parse_attention: bool = True,
    max_chunks: int = 4,
    clip_skip: int = 0,
) -> Conditioning:
    from .prompt import batch_weighted_tokens

    if isinstance(prompts, str):
        prompts = [prompts]
    ids, w, u_ids, uw, weighted, _ = batch_weighted_tokens(
        prompts, negative_prompt, tokenizer, cfg.n_ctx, max_chunks,
        parse_attention,
    )
    ctx, uctx = _sd1_conditioning_program(
        clip_params, cfg, jnp.asarray(ids), jnp.asarray(u_ids), penultimate,
        weighted=weighted, w=jnp.asarray(w), uw=jnp.asarray(uw),
        clip_skip=clip_skip,
    )
    return Conditioning(
        unconditional_context_full=uctx,
        unconditional_context_open_clip=None,
        context_full=ctx,
        context_open_clip=None,
        unconditional_channel_context=None,
        unconditional_channel_context_refiner=None,
        channel_context=None,
        channel_context_refiner=None,
        resolution=resolution,
    )


@dataclass
class SD1Pipeline(SDXLPipeline):
    """SDXLPipeline with single-tower conditioning; embedder_cfg is a
    CLIPConfig, embedder_params is the bare CLIP pytree."""

    # SD 2.x taps the penultimate hidden; SD 1.x the final LN output
    penultimate_hidden: bool = False

    # published AYS table for the SD1.x/2.x family (arXiv:2404.14507)
    _ays_variant = "ays_sd15"

    def __post_init__(self):
        if self.preview_factors is None:
            from .sampler import SD1_LATENT_RGB

            self.preview_factors = SD1_LATENT_RGB

    def add_textual_inversions(self, specs) -> None:
        """Single-tower variant: the bare CLIP pytree is wrapped/unwrapped
        around the shared merge (io/textual_inversion.py)."""
        from ..io.textual_inversion import apply_textual_inversions

        wrapped = apply_textual_inversions(
            list(specs),
            tokenizers=[self.clip_tokenizer],
            embedder_params={"clip": self.embedder_params},
            tower_keys=["clip"],
            tower_widths=[self.embedder_cfg.n_state],
        )
        self.embedder_params = wrapped["clip"]

    def conditioning(self, prompts, resolution, crop=(0, 0),
                     negative_prompt: str = "", profile_stages: bool = True):
        from ..utils import fence

        with self.timer.stage("embedder"):
            cond = text_to_conditioning_sd1(
                self.embedder_params,
                self.embedder_cfg,
                self.clip_tokenizer,
                prompts,
                resolution,
                negative_prompt,
                self.penultimate_hidden,
                clip_skip=self.clip_skip,
            )
            if profile_stages:
                fence(cond.context_full)
        return cond


def load_sd1_pipeline(
    model_dir: str,
    clip_cfg: CLIPConfig = CLIP_VIT_L_CONFIG,
    diffuser_cfg: DiffuserConfig = SD15_DIFFUSER,
    compute_dtype=jnp.bfloat16,
    tokenizer_dir: Optional[str] = None,
    penultimate_hidden: bool = False,
    loras=None,
    quantize: Optional[str] = None,
) -> SD1Pipeline:
    """Load an SD 1.x/2.x checkpoint: a diffusers-layout directory
    (runwayml/stable-diffusion-v1-5 style: unet/ vae/ text_encoder/
    scheduler/) or a SINGLE FILE in the ldm layout —
    v1-5-pruned.{safetensors,ckpt}, v2-1_768-ema-pruned, ... (the
    legacy torch-pickle .ckpt loads via weights_only; the SD2 OpenCLIP
    tower is auto-detected from its cond_stage_model.model.* keys).
    loras: list of (path, scale) LoRA files merged at load time;
    quantize="int8"|"int4" stores the UNet block linears weight-quantized
    (io/quantize.py), merged after LoRAs."""
    import os

    from ..models.unet import fuse_unet_qkv

    if os.path.isfile(model_dir):
        from ..io.hf_sdxl import load_sd1_single_file

        log(f"loading SD1.x single-file checkpoint from {model_dir}")
        clip, unet, vae, diffuser_cfg = load_sd1_single_file(
            model_dir, diffuser_cfg, clip_cfg, compute_dtype
        )
        alphas, scale = None, None
    else:
        from ..io.diffusers_sdxl import load_sd1_diffusers_dir

        log(f"loading SD1.x diffusers checkpoint from {model_dir}")
        clip, unet, vae, alphas, scale, diffuser_cfg = load_sd1_diffusers_dir(
            model_dir, diffuser_cfg, clip_cfg, compute_dtype
        )
    if clip is None:
        raise FileNotFoundError(f"text_encoder missing under {model_dir}")
    if loras:
        from ..io.lora import apply_lora_files

        apply_lora_files(loras, unet=unet, te1=clip)
    unet = fuse_unet_qkv(unet)
    if quantize is not None:
        from ..io.quantize import (
            UNET_KEEP8, UNET_WITHIN, parse_quantize_spec, quantize_tree,
        )

        unet = quantize_tree(unet, parse_quantize_spec(quantize),
                             within=UNET_WITHIN, keep8=UNET_KEEP8)
    return SD1Pipeline(
        embedder_cfg=clip_cfg,
        embedder_params=clip,
        diffuser_cfg=diffuser_cfg,
        unet_params=unet,
        alphas_cumprod=jnp.asarray(
            alphas
            if alphas is not None
            else scaled_linear_alphas_cumprod(diffuser_cfg.n_steps)
        ),
        vae_cfg=AutoencoderConfig(),
        vae_params=vae,
        scale_factor=scale or SD15_VAE_SCALE,
        clip_tokenizer=ClipTokenizer(tokenizer_dir),
        open_clip_tokenizer=None,
        compute_dtype=compute_dtype,
        strict_resolutions=False,  # SD 1.x has no SDXL bucket constraint
        penultimate_hidden=penultimate_hidden,
    )


def random_sd1_pipeline(
    seed: int = 0,
    clip_cfg: CLIPConfig = CLIP_VIT_L_CONFIG,
    diffuser_cfg: DiffuserConfig = SD15_DIFFUSER,
    vae_cfg: AutoencoderConfig = AutoencoderConfig(),
    compute_dtype=jnp.bfloat16,
    param_dtype_unet=jnp.bfloat16,
    tokenizer_dir: Optional[str] = None,
    penultimate_hidden: bool = False,
) -> SD1Pipeline:
    """SD 1.x/2.x pipeline with random weights (bring-up / tests / bench)."""
    from ..models.clip import init_clip
    from ..models.unet import fuse_unet_qkv, init_unet
    from ..models.vae import init_autoencoder

    j_clip = jax.jit(init_clip, static_argnums=(1, 2))
    j_unet = jax.jit(init_unet, static_argnums=(1, 2))
    j_vae = jax.jit(init_autoencoder, static_argnums=(1,))

    keys = jax.random.split(jax.random.PRNGKey(seed), 3)
    log("initializing random SD1.x weights (no checkpoint)")
    clip_params = j_clip(keys[0], clip_cfg, jnp.float32)
    unet_params = jax.jit(fuse_unet_qkv)(
        j_unet(keys[1], diffuser_cfg.unet_config(), param_dtype_unet)
    )
    vae_params = j_vae(keys[2], vae_cfg)

    return SD1Pipeline(
        embedder_cfg=clip_cfg,
        embedder_params=clip_params,
        diffuser_cfg=diffuser_cfg,
        unet_params=unet_params,
        alphas_cumprod=jnp.asarray(
            scaled_linear_alphas_cumprod(diffuser_cfg.n_steps)
        ),
        vae_cfg=vae_cfg,
        vae_params=vae_params,
        scale_factor=SD15_VAE_SCALE,
        clip_tokenizer=ClipTokenizer(tokenizer_dir),
        open_clip_tokenizer=None,
        compute_dtype=compute_dtype,
        strict_resolutions=False,  # SD 1.x has no SDXL bucket constraint
        penultimate_hidden=penultimate_hidden,
    )
