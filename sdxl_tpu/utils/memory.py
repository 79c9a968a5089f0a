"""Analytic HBM budget accounting for stage planning.

The reference bounds VRAM by loading each pipeline stage inside a scope
and dropping it before the next (sample/main.rs:217-278). The TPU-native
equivalent keeps everything resident when it fits (no per-request load
cost) and falls back to stage-scoped execution — refiner weights parked
on host, swapped in for the refiner scan — when base + refiner + scan
workspace would exceed the chip's HBM. These estimators are deliberately
coarse (±30%): they only need to pick the right side of a ~1.5x margin.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from . import log

# default assumed HBM when the runtime reports nothing (v5e = 16 GiB);
# override with SDXL_TPU_HBM_GB
_DEFAULT_HBM_GB = 16.0

# fraction of HBM usable by us (XLA reserves some; co-tenants may too)
_USABLE_FRACTION = 0.9


def param_bytes(tree) -> int:
    """Total parameter bytes of a pytree (None leaves skipped)."""
    total = 0
    for leaf in jax.tree_util.tree_leaves(tree):
        if leaf is not None and hasattr(leaf, "size"):
            total += int(leaf.size) * np.dtype(leaf.dtype).itemsize
    return total


def hbm_budget_bytes() -> int:
    """Usable accelerator memory: env override > runtime report > v5e
    default. (memory_stats() is unavailable through the axon tunnel, so
    the default matters in practice.)"""
    env = os.environ.get("SDXL_TPU_HBM_GB")
    if env:
        return int(float(env) * (1 << 30) * _USABLE_FRACTION)
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats and "bytes_limit" in stats:
            return int(stats["bytes_limit"] * _USABLE_FRACTION)
    except Exception:
        pass
    return int(_DEFAULT_HBM_GB * (1 << 30) * _USABLE_FRACTION)


def unet_scan_workspace_bytes(cfg, batch: int, latent_hw, compute_dtype,
                              use_cfg: bool = True) -> int:
    """Peak activation workspace of the jitted denoise scan (one step's
    live set; XLA reuses it across scan iterations).

    Model: sum over levels of one (tokens_l x channels_l) feature map,
    CFG-doubled, times a resident-buffers factor. The factor bundles the
    skip-cat stack (9+ saved block outputs), double-buffered conv/GN
    intermediates with f32 upcasts, attention workspace and XLA copy
    slack; 150 is calibrated so SDXL-base at 1024^2 (128x128 latent, CFG
    pair, bf16) lands at ~5.4 GB — the measured scan workspace figure
    (docs/ARCHITECTURE.md perf notes / r2 co-tenant OOM debugging)."""
    h, w = latent_hw
    itemsize = np.dtype(compute_dtype).itemsize
    b = batch * (2 if use_cfg and not cfg.is_refiner else 1)
    total = 0
    for lvl, mult in enumerate(cfg.channel_mults):
        ch = cfg.model_channels * mult
        tokens = (h // (2 ** lvl)) * (w // (2 ** lvl))
        total += tokens * ch
    return int(total * b * itemsize * 150)


def vae_decode_workspace_bytes(image_hw, batch: int, vae_dtype) -> int:
    """Decoder peak: full-resolution feature maps at 128 channels (the
    last up block), ~x3 for the conv ping-pong (≈0.5 GB/image f32 at
    1024^2, matching pipeline.py's vae_decode_chunk note)."""
    h, w = image_hw
    itemsize = np.dtype(vae_dtype).itemsize
    return int(h * w * 128 * itemsize * batch)


def plan_refiner_mode(pipe, resolution, batch: int) -> tuple:
    """('resident' | 'scoped', reason): whether base + refiner can stay
    in HBM together for this request, by the analytic budget."""
    h, w = resolution
    budget = hbm_budget_bytes()
    base = param_bytes(pipe.unet_params)
    refiner = param_bytes(pipe.refiner_params)
    other = param_bytes(pipe.embedder_params) + param_bytes(pipe.vae_params)
    work = max(
        unet_scan_workspace_bytes(
            pipe.diffuser_cfg, batch, (h // 8, w // 8), pipe.compute_dtype
        ),
        vae_decode_workspace_bytes((h, w), min(batch, pipe.vae_decode_chunk
                                               or batch), pipe.vae_dtype),
    )
    need = base + refiner + other + work
    gb = 1 << 30
    reason = (
        f"base {base / gb:.1f} + refiner {refiner / gb:.1f} + "
        f"embedder/vae {other / gb:.1f} + workspace {work / gb:.1f} GiB "
        f"vs budget {budget / gb:.1f} GiB"
    )
    if need <= budget:
        return "resident", f"fits resident: {reason}"
    return "scoped", f"exceeds budget, stage-scoping refiner: {reason}"


def tree_is_on_host(tree) -> bool:
    """True if the pytree's first array leaf lives in host memory (numpy,
    or a cpu-device jax array while the default backend is an
    accelerator). On a cpu-only platform nothing counts as 'parked'."""
    for leaf in jax.tree_util.tree_leaves(tree):
        if leaf is not None and hasattr(leaf, "dtype"):
            if isinstance(leaf, np.ndarray):
                return True
            if jax.default_backend() == "cpu":
                return False
            try:
                return leaf.devices() <= set(jax.devices("cpu"))
            except Exception:
                return False
    return False


def tree_to_host(tree):
    """Move a param pytree to host memory (frees its HBM)."""
    return jax.tree.map(
        lambda a: np.asarray(a) if a is not None else None, tree,
        is_leaf=lambda x: x is None,
    )


def tree_to_device(tree, sharding=None):
    """Put a host pytree (back) on the accelerator."""
    return jax.tree.map(
        lambda a: jax.device_put(a) if a is not None else None, tree,
        is_leaf=lambda x: x is None,
    )
