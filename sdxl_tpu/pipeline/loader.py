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
from ..models.unet import stack_unet_transformers
from .pipeline import SDXLPipeline
from .sampler import scaled_linear_alphas_cumprod


def _refiner_load_ctx(base_cfg, unet, e_params, vae=None):
    """Context for loading refiner weights: when base + refiner params +
    scan workspace would exceed the HBM budget, load onto the HOST instead
    (jax.default_device cpu) — the pipeline's auto stage-scoping
    (plan_refiner_mode) swaps them in for the refiner stage. Mirrors the
    reference's per-stage VRAM scoping (sample/main.rs:217-278) without
    paying a per-request disk load when everything fits."""
    import contextlib

    import jax

    from ..utils.memory import (
        hbm_budget_bytes,
        param_bytes,
        unet_scan_workspace_bytes,
    )

    have = param_bytes(unet) + param_bytes(e_params) + param_bytes(vae)
    est_refiner = int(param_bytes(unet) * 0.9)  # 2.3B vs 2.6B params
    work = unet_scan_workspace_bytes(base_cfg, 1, (128, 128), jnp.bfloat16)
    budget = hbm_budget_bytes()
    if have + est_refiner + work > budget:
        try:
            cpu = jax.devices("cpu")[0]
            gb = 1 << 30
            log(
                f"refiner: parking weights on host — params "
                f"{(have + est_refiner) / gb:.1f} + workspace "
                f"{work / gb:.1f} GiB exceed budget {budget / gb:.1f} GiB"
            )
            return jax.default_device(cpu)
        except Exception:
            pass
    return contextlib.nullcontext()


def _maybe_stack(params, flag: bool, quantize_bits=None):
    """Run-time UNet param prep: fuse self-attn qkv (math-identical, one
    [C,3C] MXU dot instead of three), optionally quantize the block
    linears (int8/int4 weight-only, io/quantize.py — dequant happens at
    the linear() use site inside the sampling scan), and optionally stack
    deep transformer lists for lax.scan compilation.

    Order matters: quantize AFTER the qkv fuse (the fuse concatenates
    full-precision "w" columns) and BEFORE stacking (stacking tree-maps
    jnp.stack over the block dicts, which stacks the int8 qw/qs leaves —
    the scan body then slices them back to the 2-D layout dequant
    expects)."""
    if params is None:
        return params
    from ..models.unet import fuse_unet_qkv

    params = fuse_unet_qkv(params)
    if quantize_bits is not None:
        from ..io.quantize import UNET_KEEP8, UNET_WITHIN, quantize_tree

        params = quantize_tree(params, quantize_bits, within=UNET_WITHIN,
                               keep8=UNET_KEEP8)
    if not flag:
        return params
    return stack_unet_transformers(params)


def _prep_refiner(r_params, stack: bool, quantize_bits=None):
    """_maybe_stack for the refiner, keeping host-parked weights on the
    host: commit the tree to the cpu device first so the fuse/stack ops
    run (and their results stay) there instead of migrating 4+ GB to the
    accelerator the parking was meant to protect."""
    if r_params is None:
        return None
    import jax

    from ..utils.memory import tree_is_on_host

    if jax.default_backend() != "cpu" and tree_is_on_host(r_params):
        cpu = jax.devices("cpu")[0]
        r_params = jax.tree.map(
            lambda a: jax.device_put(a, cpu) if a is not None else None,
            r_params, is_leaf=lambda x: x is None,
        )
        with jax.default_device(cpu):
            return _maybe_stack(r_params, stack, quantize_bits)
    return _maybe_stack(r_params, stack, quantize_bits)


def _apply_loras(loras, unet, e_params) -> None:
    """Merge LoRA adapter files into the just-loaded raw param trees (must
    run before fuse_unet_qkv/stacking — adapters address unfused names)."""
    if not loras:
        return
    from ..io.lora import apply_lora_files

    apply_lora_files(
        loras,
        unet=unet,
        te1=(e_params or {}).get("clip"),
        te2=(e_params or {}).get("open_clip"),
    )


def detect_format(model_dir: str) -> str:
    if os.path.isfile(model_dir) and model_dir.endswith(
            (".safetensors", ".sft", ".ckpt", ".pt", ".pth")):
        # single-file checkpoint: sgm safetensors or the legacy torch
        # pickle (.ckpt) the A1111 era shipped
        return "sgm_single_file"
    if os.path.isfile(os.path.join(model_dir, "embedder.safetensors")):
        return "native"
    if os.path.isfile(os.path.join(model_dir, "embedder.mpk")):
        return "mpk"
    if os.path.isdir(os.path.join(model_dir, "embedder")):
        return "npy"
    if os.path.isdir(os.path.join(model_dir, "unet")) and (
        os.path.isfile(os.path.join(model_dir, "model_index.json"))
        or os.path.isdir(os.path.join(model_dir, "vae"))
    ):
        return "diffusers"
    import glob as _glob

    single = (_glob.glob(os.path.join(model_dir, "sd_xl_*.safetensors"))
              + _glob.glob(os.path.join(model_dir, "sd_xl_*.ckpt")))
    if single:
        return "sgm_single_file"
    raise FileNotFoundError(f"no known checkpoint layout in {model_dir}")


def load_pipeline(
    model_dir: str,
    use_refiner: bool = False,
    compute_dtype=jnp.bfloat16,
    tokenizer_dir: Optional[str] = None,
    stack_transformers: bool = True,
    loras=None,
    quantize: Optional[str] = None,
) -> SDXLPipeline:
    """stack_transformers scans the deep transformer stacks instead of
    unrolling them (~9x faster UNet compile, ~3% slower steps) — the right
    default for interactive use. loras is a list of (path, scale) LoRA
    safetensors files merged into the UNet + text towers at load time
    (io/lora.py). quantize="int8"|"int4" stores the UNet block linears
    weight-quantized (io/quantize.py, ~2.0B of the base UNet's 2.6B
    params) — a memory lever (base+refiner resident, larger serving
    fusion batches), merged AFTER LoRAs so adapters see full precision."""
    fmt = detect_format(model_dir)
    log(f"loading checkpoint ({fmt}) from {model_dir}")
    from ..io.quantize import parse_quantize_spec

    qbits = parse_quantize_spec(quantize)

    if fmt == "diffusers":
        from ..io.diffusers_sdxl import (
            infer_sdxl_configs_from_diffusers_dir,
            load_sdxl_diffusers_dir,
        )

        # hyperparameters come from the dir's own config.json files
        # (stabilityai checkpoints resolve to exactly the SDXL presets;
        # fine-tuned/down-scaled exports resolve to their true dims)
        e_cfg, d_cfg, v_cfg = infer_sdxl_configs_from_diffusers_dir(model_dir)
        e_params, unet, vae, alphas_np, scale, d_cfg = load_sdxl_diffusers_dir(
            model_dir, d_cfg, e_cfg, compute_dtype, vae_cfg=v_cfg
        )
        if e_params is None:
            raise FileNotFoundError(f"text encoders missing under {model_dir}")
        alphas = jnp.asarray(
            alphas_np if alphas_np is not None else scaled_linear_alphas_cumprod()
        )
        if use_refiner:
            raise ValueError(
                "refiner weights live in a separate diffusers repo; load them "
                "via a second pipeline or the single-file sgm checkpoint"
            )
        _apply_loras(loras, unet, e_params)
        return SDXLPipeline(
            embedder_cfg=e_cfg,
            embedder_params=e_params,
            diffuser_cfg=d_cfg,
            unet_params=_maybe_stack(unet, stack_transformers, qbits),
            alphas_cumprod=alphas,
            vae_cfg=v_cfg,
            vae_params=vae,
            scale_factor=scale or 0.13025,
            clip_tokenizer=ClipTokenizer(tokenizer_dir),
            open_clip_tokenizer=OpenClipTokenizer(tokenizer_dir),
            compute_dtype=compute_dtype,
        )

    if fmt == "sgm_single_file":
        import glob as _glob

        from ..io.hf_sdxl import load_sdxl_safetensors

        if os.path.isfile(model_dir):
            base_path = model_dir
            refiner_path = None
        else:
            paths = sorted(
                _glob.glob(os.path.join(model_dir, "sd_xl_*.safetensors"))
                + _glob.glob(os.path.join(model_dir, "sd_xl_*.ckpt")))
            base_path = next((p for p in paths if "refiner" not in p), paths[0])
            refiner_path = next((p for p in paths if "refiner" in p), None)

        e_cfg = SDXL_EMBEDDER
        d_cfg = SDXL_BASE_DIFFUSER
        e_params, unet, vae = load_sdxl_safetensors(
            base_path, d_cfg, e_cfg, compute_dtype
        )
        if e_params is None:
            raise FileNotFoundError(f"conditioner weights missing in {base_path}")
        r_cfg = r_params = None
        if use_refiner:
            if refiner_path is None:
                raise FileNotFoundError("no sd_xl_refiner_*.safetensors found")
            r_cfg = SDXL_REFINER_DIFFUSER
            with _refiner_load_ctx(d_cfg, unet, e_params, vae):
                _, r_params, _ = load_sdxl_safetensors(
                    refiner_path, r_cfg, None, compute_dtype
                )
        alphas = jnp.asarray(scaled_linear_alphas_cumprod())
        _apply_loras(loras, unet, e_params)
        return SDXLPipeline(
            embedder_cfg=e_cfg,
            embedder_params=e_params,
            diffuser_cfg=d_cfg,
            unet_params=_maybe_stack(unet, stack_transformers, qbits),
            alphas_cumprod=alphas,
            vae_cfg=AutoencoderConfig(),
            vae_params=vae,
            refiner_cfg=r_cfg,
            refiner_params=_prep_refiner(r_params, stack_transformers, qbits),
            refiner_alphas=alphas if r_params is not None else None,
            clip_tokenizer=ClipTokenizer(tokenizer_dir),
            open_clip_tokenizer=OpenClipTokenizer(tokenizer_dir),
            compute_dtype=compute_dtype,
        )

    v_cfg = AutoencoderConfig()
    if fmt == "mpk":
        e_cfg, e_params = ckpt.load_embedder_mpk(model_dir)
        d_cfg, unet, alphas = ckpt.load_diffuser_mpk(model_dir, "diffuser", compute_dtype)
        r_cfg = r_params = r_alphas = None
        if use_refiner:
            with _refiner_load_ctx(d_cfg, unet, e_params):
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
            with _refiner_load_ctx(d_cfg, unet, e_params):
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
            with _refiner_load_ctx(d_cfg, unet, e_params):
                r_params = ckpt.load_native(
                    os.path.join(model_dir, "refiner.safetensors"), compute_dtype
                )
            r_alphas = alphas
        l_cfg = load_cfg(
            os.path.join(model_dir, "latent_decoder.cfg"), LatentDecoderConfig
        )
        vae = ckpt.load_native(os.path.join(model_dir, "latent_decoder.safetensors"))
        scale = l_cfg.scale_factor
        a_cfg_path = os.path.join(model_dir, "autoencoder.cfg")
        if os.path.isfile(a_cfg_path):
            v_cfg = load_cfg(a_cfg_path, AutoencoderConfig)

    _apply_loras(loras, unet, e_params)
    return SDXLPipeline(
        embedder_cfg=e_cfg,
        embedder_params=e_params,
        diffuser_cfg=d_cfg,
        unet_params=_maybe_stack(unet, stack_transformers, qbits),
        alphas_cumprod=alphas,
        vae_cfg=v_cfg,
        vae_params=vae,
        scale_factor=scale,
        refiner_cfg=r_cfg,
        refiner_params=_prep_refiner(r_params, stack_transformers, qbits),
        refiner_alphas=r_alphas,
        clip_tokenizer=ClipTokenizer(tokenizer_dir),
        open_clip_tokenizer=OpenClipTokenizer(tokenizer_dir),
        compute_dtype=compute_dtype,
    )
