"""Checkpoint loading: reference-compatible model dirs and npy dumps.

Reference model dir layout (sample/main.rs:28-51, 217-278):
    {model_dir}/embedder.mpk        + embedder.cfg
    {model_dir}/diffuser.mpk        + diffuser.cfg
    {model_dir}/refiner.mpk         + refiner.cfg        (optional)
    {model_dir}/latent_decoder.mpk  + latent_decoder.cfg

Also accepted: the intermediate .npy dump tree consumed by the reference's
`convert` binary (convert/main.rs:72-121):
    {dump_dir}/embedder/{clip,open_clip}
    {dump_dir}/diffuser/{alphas_cumprod.npy, diffuser_base}
    {dump_dir}/diffuser/diffuser_refiner
    {dump_dir}/latent_decoder/{autoencoder, scale_factor.npy}

Plus this framework's native format (save_native/load_native): one
safetensors file per stage + the same .cfg JSON — fast mmap loads, no
Python-object parsing on the hot path.
"""

from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..configs import (
    AutoencoderConfig,
    DiffuserConfig,
    EmbedderConfig,
    LatentDecoderConfig,
    load_cfg,
)
from .burn_mpk import parse_mpk_file
from .npy_tree import NpyTreeSource
from .params_builder import build_autoencoder, build_clip, build_unet


# ---------------------------------------------------------------------------
# Reference formats
# ---------------------------------------------------------------------------

def load_embedder_mpk(model_dir: str, dtype=jnp.float32):
    cfg = load_cfg(os.path.join(model_dir, "embedder.cfg"), EmbedderConfig)
    src = parse_mpk_file(os.path.join(model_dir, "embedder.mpk"))
    params = {
        "clip": build_clip(src.child("clip"), cfg.clip_config, dtype),
        "open_clip": build_clip(src.child("open_clip"), cfg.open_clip_config, dtype),
    }
    return cfg, params


def load_diffuser_mpk(model_dir: str, name: str = "diffuser", dtype=jnp.bfloat16):
    cfg = load_cfg(os.path.join(model_dir, f"{name}.cfg"), DiffuserConfig)
    src = parse_mpk_file(os.path.join(model_dir, f"{name}.mpk"))
    unet = build_unet(src.child("diffusion"), cfg.unet_config(), dtype)
    alphas = jnp.asarray(
        src.tensor("alpha_cumulative_products", 1), dtype=jnp.float32
    )
    return cfg, unet, alphas


def load_latent_decoder_mpk(model_dir: str, dtype=jnp.float32):
    cfg = load_cfg(
        os.path.join(model_dir, "latent_decoder.cfg"), LatentDecoderConfig
    )
    src = parse_mpk_file(os.path.join(model_dir, "latent_decoder.mpk"))
    vae = build_autoencoder(src.child("autoencoder"), AutoencoderConfig(), dtype)
    return cfg, vae


def load_embedder_npy(dump_dir: str, cfg: EmbedderConfig, dtype=jnp.float32):
    root = NpyTreeSource(os.path.join(dump_dir, "embedder"))
    return {
        "clip": build_clip(root.child("clip"), cfg.clip_config, dtype),
        "open_clip": build_clip(root.child("open_clip"), cfg.open_clip_config, dtype),
    }


def load_diffuser_npy(
    dump_dir: str, cfg: DiffuserConfig, is_refiner: bool = False, dtype=jnp.bfloat16
):
    root = NpyTreeSource(os.path.join(dump_dir, "diffuser"))
    name = "diffuser_refiner" if is_refiner else "diffuser_base"
    unet = build_unet(root.child(name), cfg.unet_config(), dtype)
    alphas = jnp.asarray(root.tensor("alphas_cumprod", 1), dtype=jnp.float32)
    return unet, alphas


def load_latent_decoder_npy(dump_dir: str, dtype=jnp.float32):
    root = NpyTreeSource(os.path.join(dump_dir, "latent_decoder"))
    vae = build_autoencoder(
        root.child("autoencoder"), AutoencoderConfig(), dtype
    )
    scale = root.scalar("scale_factor") or 0.13025
    return vae, scale


# ---------------------------------------------------------------------------
# Native format: flat safetensors + cfg JSON
# ---------------------------------------------------------------------------

def flatten_pytree(tree, prefix=""):
    flat = {}

    def rec(node, path):
        if node is None:
            return
        if isinstance(node, dict):
            for k, v in node.items():
                rec(v, f"{path}.{k}" if path else k)
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                rec(v, f"{path}.{i}" if path else str(i))
        else:
            flat[path] = np.asarray(node)

    rec(tree, prefix)
    return flat


def unflatten_pytree(flat):
    root: dict = {}
    for path, arr in flat.items():
        keys = path.split(".")
        node = root
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = arr

    def listify(node):
        if isinstance(node, dict):
            if node and all(k.isdigit() for k in node):
                return [listify(node[str(i)]) for i in range(len(node))]
            return {k: listify(v) for k, v in node.items()}
        return node

    return listify(root)


def save_native(path: str, tree, metadata: Optional[dict] = None) -> None:
    from safetensors.numpy import save_file

    flat = flatten_pytree(tree)
    meta = {k: str(v) for k, v in (metadata or {}).items()}
    save_file(flat, path, metadata=meta)


def load_native(path: str, dtype=None):
    from safetensors.numpy import load_file

    import jax

    tree = unflatten_pytree(load_file(path))
    return jax.tree.map(
        lambda a: jnp.asarray(a, dtype=dtype) if dtype is not None else jnp.asarray(a),
        tree,
    )


def save_native_pipeline(out_dir: str, pipe, dtype=None) -> str:
    """Write a loaded SDXL pipeline back out as a native checkpoint dir —
    the same {embedder,diffuser,latent_decoder}.safetensors + .cfg +
    alphas_cumprod.safetensors layout load_pipeline() detects (primary
    consumer: cli/merge.py). The UNet must be UNSTACKED
    (load with stack_transformers=False); refiner params, LoRA-merged or
    quantized towers are the caller's concern (quantized trees refuse to
    flatten into plain safetensors by construction)."""
    import os

    import numpy as np

    from ..configs import LatentDecoderConfig, save_cfg

    os.makedirs(out_dir, exist_ok=True)

    def cast(tree):
        if dtype is None:
            return tree
        import jax

        return jax.tree.map(lambda a: jnp.asarray(a, dtype), tree)

    save_native(os.path.join(out_dir, "embedder.safetensors"),
                cast(pipe.embedder_params))
    save_cfg(os.path.join(out_dir, "embedder.cfg"), pipe.embedder_cfg)
    save_native(os.path.join(out_dir, "diffuser.safetensors"),
                cast(pipe.unet_params))
    save_cfg(os.path.join(out_dir, "diffuser.cfg"), pipe.diffuser_cfg)
    save_native(os.path.join(out_dir, "alphas_cumprod.safetensors"),
                {"alphas_cumprod": np.asarray(pipe.alphas_cumprod,
                                              np.float32)})
    save_native(os.path.join(out_dir, "latent_decoder.safetensors"),
                cast(pipe.vae_params))
    save_cfg(os.path.join(out_dir, "latent_decoder.cfg"),
             LatentDecoderConfig(scale_factor=float(pipe.scale_factor)))
    # the reference's .cfg set has no autoencoder config (its VAE is
    # always full-size); persist ours so non-default channel plans
    # (tests, distilled VAEs) reload exactly
    save_cfg(os.path.join(out_dir, "autoencoder.cfg"), pipe.vae_cfg)
    if pipe.refiner_params is not None:
        save_native(os.path.join(out_dir, "refiner.safetensors"),
                    cast(pipe.refiner_params))
        save_cfg(os.path.join(out_dir, "refiner.cfg"), pipe.refiner_cfg)
    return out_dir
