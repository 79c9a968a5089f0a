"""In-training validation sampling: every --sample-every steps, render
the --sample-prompt through the REAL inference pipeline with the current
trainable state applied, and write step-tagged PNGs next to the output
artifact. The training loop stays one jitted step; sampling compiles its
own programs once (first validation) and reuses them (static shapes).

How each mode applies the live state:
  lora        factors inserted as runtime ``lora_down``/``lora_up``
              leaves (ops/linear.py applies them UNMERGED — the exact
              trained math, no merge round-off)
  full        masters folded into a copy of the tower
              (train/full.py merge_trained) for the duration of the call
  controlnet  masters folded into the ControlNet tree; the pipeline
              samples with the FIRST dataset control image
  ti          trained rows concatenated onto the frozen token tables
              (io/textual_inversion.py's exact insertion)

EMA weights are preferred when the run tracks them — validation then
previews the artifact that will actually be exported.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

from ..utils import log
from .finetune import FinetuneConfig, frozen_tower
from .full import merge_trained
from .lora import set_leaves


def _tower_attr(pipe) -> str:
    for attr in ("unet_params", "mmdit_params", "flux_params"):
        if hasattr(pipe, attr):
            return attr
    raise TypeError(f"no trainable tower on {type(pipe).__name__}")


def _state_flat(state):
    return state.ema if getattr(state, "ema", None) is not None \
        else state.params


def _save(pipe, cfg: FinetuneConfig, step: int, out_dir: str, **kw):
    from ..io.images import save_images

    res = cfg.sample_resolution or 512
    imgs = pipe.txt2img(
        cfg.sample_prompt, resolution=(res, res),
        n_steps=cfg.sample_steps, guidance_scale=cfg.sample_guidance,
        seed=cfg.sample_seed, **kw)
    os.makedirs(out_dir, exist_ok=True)
    paths = save_images(
        np.asarray(imgs), os.path.join(out_dir, f"step{step:06d}_"),
        metadata={"parameters": f"{cfg.sample_prompt}\nStep: {step}"})
    log(f"validation sample @ step {step}: {paths[0]}")


def make_validation_sampler(pipe, cfg: FinetuneConfig, mode: str,
                            out_dir: str,
                            dtypes: Optional[dict] = None,
                            control_image: Optional[np.ndarray] = None,
                            control_tree: Optional[dict] = None):
    """val(step, state) for _run_loop, or None when sampling is off.

    dtypes: full/controlnet modes — the master-dtype map from
    full_trainable. control_image: controlnet mode — [H, W, 3] uint8.
    control_tree: controlnet mode — the initial tree the masters fold
    back into (every leaf is trained, so it only donates structure)."""
    if not cfg.sample_every:
        return None
    if not cfg.sample_prompt:
        raise ValueError("--sample-every needs --sample-prompt")
    attr = _tower_attr(pipe) if mode in ("lora", "full") else None

    def val(step: int, state):
        flat = jax.device_get(_state_flat(state))
        if mode == "lora" and any(k.startswith(("clip.", "open_clip."))
                                  for k in flat):
            # --train-text-encoder: composite factors — inject into the
            # UNet AND both towers (runtime, unmerged), render, restore.
            # The cached uncond conditioning was computed by the frozen
            # towers and must be invalidated around the swap.
            frozen, _ = frozen_tower(pipe)
            composite = {"unet": frozen,
                         "clip": pipe.embedder_params["clip"],
                         "open_clip": pipe.embedder_params["open_clip"]}
            injected = set_leaves(composite, flat)
            saved = (getattr(pipe, attr), pipe.embedder_params)
            setattr(pipe, attr, injected["unet"])
            pipe.embedder_params = {"clip": injected["clip"],
                                    "open_clip": injected["open_clip"]}
            pipe._uncond_cache.clear()
            try:
                _save(pipe, cfg, step, out_dir)
            finally:
                setattr(pipe, attr, saved[0])
                pipe.embedder_params = saved[1]
                pipe._uncond_cache.clear()
        elif mode == "lora":
            frozen, _ = frozen_tower(pipe)
            saved = getattr(pipe, attr)
            setattr(pipe, attr, set_leaves(frozen, flat))
            try:
                _save(pipe, cfg, step, out_dir)
            finally:
                setattr(pipe, attr, saved)
        elif mode == "full":
            frozen, _ = frozen_tower(pipe)
            saved = getattr(pipe, attr)
            setattr(pipe, attr, merge_trained(frozen, flat, dtypes))
            try:
                _save(pipe, cfg, step, out_dir)
            finally:
                setattr(pipe, attr, saved)
        elif mode == "controlnet":
            saved = (pipe.controlnet_params, pipe.controlnet_cfg)
            pipe.controlnet_params = merge_trained(
                control_tree, flat, dtypes)
            pipe.controlnet_cfg = pipe.diffuser_cfg.unet_config()
            try:
                _save(pipe, cfg, step, out_dir,
                      control_image=control_image)
            finally:
                pipe.controlnet_params, pipe.controlnet_cfg = saved
        else:
            raise ValueError(mode)

    return val
