"""Assemble an SDXLPipeline from a checkpoint directory.

Accepted layouts (auto-detected):
  1. reference model dir:  {dir}/{embedder,diffuser,refiner,latent_decoder}.{mpk,cfg}
     (sample/main.rs:28-51)
  2. reference npy dump:   {dir}/{embedder,diffuser,latent_decoder}/... tree
     (convert/main.rs:72-121)
  3. native:               {dir}/{embedder,diffuser,refiner,latent_decoder}.safetensors
     + .cfg JSON (io/checkpoint.py save_native)
"""

from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp

from ..configs import (
    AutoencoderConfig,
    DiffuserConfig,
    EmbedderConfig,
    LatentDecoderConfig,
    SDXL_BASE_DIFFUSER,
    SDXL_EMBEDDER,
    SDXL_REFINER_DIFFUSER,
    load_cfg,
)
from ..io import checkpoint as ckpt
from ..tokenizer import ClipTokenizer, OpenClipTokenizer
from ..utils import log
from .pipeline import SDXLPipeline
from .sampler import scaled_linear_alphas_cumprod


def detect_format(model_dir: str) -> str:
    if os.path.isfile(os.path.join(model_dir, "embedder.safetensors")):
        return "native"
    if os.path.isfile(os.path.join(model_dir, "embedder.mpk")):
        return "mpk"
    if os.path.isdir(os.path.join(model_dir, "embedder")):
        return "npy"
    raise FileNotFoundError(f"no known checkpoint layout in {model_dir}")


def load_pipeline(
    model_dir: str,
    use_refiner: bool = False,
    compute_dtype=jnp.bfloat16,
    tokenizer_dir: Optional[str] = None,
) -> SDXLPipeline:
    fmt = detect_format(model_dir)
    log(f"loading checkpoint ({fmt}) from {model_dir}")

    if fmt == "mpk":
        e_cfg, e_params = ckpt.load_embedder_mpk(model_dir)
        d_cfg, unet, alphas = ckpt.load_diffuser_mpk(model_dir, "diffuser", compute_dtype)
        r_cfg = r_params = r_alphas = None
        if use_refiner:
            r_cfg, r_params, r_alphas = ckpt.load_diffuser_mpk(
                model_dir, "refiner", compute_dtype
            )
        l_cfg, vae = ckpt.load_latent_decoder_mpk(model_dir)
        scale = l_cfg.scale_factor
    elif fmt == "npy":
        e_cfg = SDXL_EMBEDDER
        e_params = ckpt.load_embedder_npy(model_dir, e_cfg)
        d_cfg = SDXL_BASE_DIFFUSER
        unet, alphas = ckpt.load_diffuser_npy(model_dir, d_cfg, False, compute_dtype)
        r_cfg = r_params = r_alphas = None
        if use_refiner:
            r_cfg = SDXL_REFINER_DIFFUSER
            r_params, r_alphas = ckpt.load_diffuser_npy(
                model_dir, r_cfg, True, compute_dtype
            )
        vae, scale = ckpt.load_latent_decoder_npy(model_dir)
    else:  # native
        e_cfg = load_cfg(os.path.join(model_dir, "embedder.cfg"), EmbedderConfig)
        e_params = ckpt.load_native(os.path.join(model_dir, "embedder.safetensors"))
        d_cfg = load_cfg(os.path.join(model_dir, "diffuser.cfg"), DiffuserConfig)
        unet = ckpt.load_native(
            os.path.join(model_dir, "diffuser.safetensors"), compute_dtype
        )
        alphas = jnp.asarray(scaled_linear_alphas_cumprod())
        a_path = os.path.join(model_dir, "alphas_cumprod.safetensors")
        if os.path.isfile(a_path):
            alphas = ckpt.load_native(a_path)["alphas_cumprod"]
        r_cfg = r_params = r_alphas = None
        if use_refiner:
            r_cfg = load_cfg(os.path.join(model_dir, "refiner.cfg"), DiffuserConfig)
            r_params = ckpt.load_native(
                os.path.join(model_dir, "refiner.safetensors"), compute_dtype
            )
            r_alphas = alphas
        l_cfg = load_cfg(
            os.path.join(model_dir, "latent_decoder.cfg"), LatentDecoderConfig
        )
        vae = ckpt.load_native(os.path.join(model_dir, "latent_decoder.safetensors"))
        scale = l_cfg.scale_factor

    return SDXLPipeline(
        embedder_cfg=e_cfg,
        embedder_params=e_params,
        diffuser_cfg=d_cfg,
        unet_params=unet,
        alphas_cumprod=alphas,
        vae_cfg=AutoencoderConfig(),
        vae_params=vae,
        scale_factor=scale,
        refiner_cfg=r_cfg,
        refiner_params=r_params,
        refiner_alphas=r_alphas,
        clip_tokenizer=ClipTokenizer(tokenizer_dir),
        open_clip_tokenizer=OpenClipTokenizer(tokenizer_dir),
        compute_dtype=compute_dtype,
    )
