"""ControlNet TRAINING (Zhang et al. 2023, arXiv:2302.05543).

Capability extension: the inference side already runs diffusers-layout
ControlNets (models/controlnet.py + io/diffusers_sdxl.py); this module
produces them. The recipe is the paper's (and diffusers
train_controlnet's):

  - the control trunk (input blocks + middle block + time/label embeds)
    is INITIALIZED AS A COPY of the frozen base UNet's weights — the
    "trainable copy" that makes ControlNet converge from a useful prior;
  - the conditioning-image embedder starts random with a ZERO final conv,
    and every zero conv starts at exactly zero, so step 0's model output
    is bitwise the plain UNet's (the paper's no-op start);
  - ONLY the ControlNet tree trains; the UNet, VAE and text towers stay
    frozen. The loss is the same DDPM eps/v MSE as every other trainer
    here (train/losses.py), with the control residuals injected into the
    frozen UNet's skip connections.

TPU-first: the whole step is ONE jitted function — trainable master
leaves (f32) are re-inserted into the ControlNet template at trace time
(train/lora.py set_leaves), both forwards run rematerialized
(jax.checkpoint) in the pipeline's compute dtype, and the optimizer is
the full-parameter stack (train/full.py: Adafactor or AdamW, optional
ZeRO-1 sharding over the data mesh axis).

Export writes the diffusers `ControlNetModel` layout — the exact tensor
inverse of io/diffusers_sdxl.py::build_controlnet_from_diffusers — so a
net trained here loads back through the inference `--controlnet` path
(round-trip tested) and into the wider ecosystem.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import log
from .finetune import EncodedDataset, FinetuneConfig, _run_loop
from .full import (
    adafactor_sched,
    full_trainable,
    merge_trained,
    shard_state_zero1,
    wrap_loss_full,
    zero_shardings,
)
from .lora import set_leaves
from .losses import diffusion_loss
from .step import TrainState, adamw_cosine, make_train_step


def init_controlnet_from_unet(pipe, key=None) -> dict:
    """The paper's init: trunk = copy of the base UNet's encoder weights
    (input blocks, middle block, time/label embeds); cond_embed random
    with a zero conv_out; all zero convs zero. With this tree the guided
    UNet output equals the unguided one exactly (asserted in tests).

    The pipe must hold UNFUSED, UNSTACKED UNet params (the training
    loaders' prep — cli/train.py load_frozen_pipeline); the copy then
    carries ecosystem-shaped attention projections for export."""
    from ..models.controlnet import init_cond_embed
    from ..models.unet import unet_block_plan

    up = pipe.unet_params
    cfg = pipe.diffuser_cfg.unet_config()
    in_plan, mid_spec, _ = unet_block_plan(cfg)
    if key is None:
        key = jax.random.PRNGKey(0)

    def zero_conv(c):
        return {"w": jnp.zeros((1, 1, c, c), jnp.float32),
                "b": jnp.zeros((c,), jnp.float32)}

    # fresh buffers, not references: the trainable masters derive from
    # this tree via a (possibly no-op) astype, while the ORIGINAL UNet
    # leaves stay live as the frozen tower — aliased buffers would trip
    # the train step's donate_argnums (donated + re-passed in one call)
    copy = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda x: jnp.array(x, copy=True), t)

    params = {
        # lin1/lin2 only: a cond_proj (LCM-distilled bases) is not part
        # of the ControlNetModel surface
        "time_embed": {k: copy(up["time_embed"][k])
                       for k in ("lin1", "lin2")},
        "cond_embed": init_cond_embed(key, cfg.model_channels, jnp.float32),
        "input_blocks": copy(up["input_blocks"]),
        "zero_convs": [zero_conv(spec.ch_out) for spec in in_plan],
        "middle_block": copy(up["middle_block"]),
        "zero_conv_mid": zero_conv(mid_spec.ch_out),
    }
    if cfg.adm_in_channels:
        params["label_embed"] = copy(up["label_embed"])
    return params


def controlnet_loss_fn(pipe, cfg: FinetuneConfig):
    """loss(trainable, frozen, batch, key): trainable = flat ControlNet
    master leaves; frozen = {"control": template tree, "unet": the frozen
    base UNet}. batch["control"]: [B, H, W, 3] f32 in [0, 1]."""
    from ..models.controlnet import control_cond_embed, controlnet_forward
    from ..models.unet import unet_forward

    ucfg = pipe.diffuser_cfg.unet_config()
    alphas = jnp.asarray(pipe.alphas_cumprod)
    dt = pipe.compute_dtype
    cn_fwd, un_fwd = controlnet_forward, unet_forward
    if cfg.remat:
        cn_fwd = jax.checkpoint(
            controlnet_forward, static_argnums=(1,),
            policy=jax.checkpoint_policies.nothing_saveable)
        un_fwd = jax.checkpoint(
            unet_forward, static_argnums=(1,),
            policy=jax.checkpoint_policies.nothing_saveable)

    def apply_fn(trainable, x_t, t, batch):
        frozen = apply_fn.frozen
        cn = set_leaves(frozen["control"], trainable)
        ctx = batch["ctx"].astype(dt)
        label = batch.get("label")
        cond_emb = control_cond_embed(
            cn["cond_embed"], batch["control"].astype(dt))
        down, mid = cn_fwd(cn, ucfg, x_t.astype(dt), t, ctx, label,
                           cond_emb)
        return un_fwd(frozen["unet"], ucfg, x_t.astype(dt), t, ctx, label,
                      None, (down, mid))

    def loss_fn(trainable, frozen, batch, key):
        apply_fn.frozen = frozen
        return diffusion_loss(
            apply_fn, trainable, alphas, batch, key,
            prediction_type=cfg.prediction_type,
            snr_gamma=cfg.snr_gamma, noise_offset=cfg.noise_offset,
            multires_iterations=cfg.multires_iterations,
            multires_discount=cfg.multires_discount)

    return loss_fn


def finetune_controlnet(
    pipe, data: EncodedDataset, cfg: FinetuneConfig,
    control: Optional[dict] = None, mesh=None, val_fn=None,
) -> dict:
    """Train a ControlNet against the pipe's frozen UNet; returns the
    trained tree (models/controlnet.py layout, ready for
    io/diffusers_write.py::write_diffusers_controlnet_dir).

    control: an existing tree to continue from (e.g. a loaded diffusers
    ControlNet); default is the paper's UNet-copy init."""
    if data.control is None:
        raise ValueError("ControlNet training needs a control_dir-encoded "
                         "dataset (encode_dataset(control_dir=...))")
    if control is None:
        control = init_controlnet_from_unet(pipe)
        log("controlnet: trunk initialized from the base UNet "
            "(zero convs zero — step 0 is a no-op)")

    m_dtype = jnp.float32 if cfg.master_dtype == "f32" else jnp.bfloat16
    master, dtypes, template = full_trainable(control, m_dtype)
    n_tr = sum(int(np.prod(v.shape)) for v in master.values())
    log(f"controlnet train: {len(master)} leaves, {n_tr/1e6:.1f}M "
        f"trainable params (master {cfg.master_dtype}, {cfg.optimizer})")

    if cfg.optimizer == "adafactor":
        tx = adafactor_sched(
            cfg.lr, cfg.schedule_steps or cfg.steps, warmup=cfg.warmup,
            weight_decay=cfg.weight_decay, grad_clip=cfg.grad_clip)
    else:
        tx = adamw_cosine(
            cfg.lr, cfg.schedule_steps or cfg.steps, warmup=cfg.warmup,
            weight_decay=cfg.weight_decay, grad_clip=cfg.grad_clip)
    state = TrainState.create(master, tx, ema=cfg.ema_decay is not None)
    if mesh is not None:
        state = shard_state_zero1(state, mesh)
    from .finetune import _maybe_resume

    state, start = _maybe_resume(state, cfg)

    loss_fn = wrap_loss_full(controlnet_loss_fn(pipe, cfg), dtypes)
    jit_kwargs = dict(donate_argnums=(0,))
    if mesh is not None:
        jit_kwargs.update(out_shardings=(zero_shardings(state, mesh), None))
    step = jax.jit(make_train_step(
        loss_fn, tx, ema_decay=cfg.ema_decay, accum=cfg.accum),
        **jit_kwargs)

    if val_fn is None and cfg.sample_every:
        from .validate import make_validation_sampler

        val_fn = make_validation_sampler(
            pipe, cfg, "controlnet", out_dir=cfg.sample_dir,
            dtypes=dtypes, control_image=data.control[0],
            control_tree=control)
    frozen = {"control": template, "unet": pipe.unet_params}
    state = _run_loop(step, state, start, frozen, data, cfg,
                      val_fn=val_fn)
    final = state.ema if state.ema is not None else state.params
    return merge_trained(control, jax.device_get(final), dtypes)


def export_controlnet(out_dir: str, params: dict, pipe,
                      config_json_src: Optional[str] = None,
                      dtype=np.float16) -> str:
    """Write the trained tree as a diffusers ControlNetModel directory
    the inference `--controlnet` flag (and diffusers itself) loads."""
    from ..io.diffusers_write import write_diffusers_controlnet_dir

    path = write_diffusers_controlnet_dir(
        out_dir, params, pipe.diffuser_cfg.unet_config(),
        config_json_src=config_json_src, dtype=dtype)
    log(f"wrote diffusers ControlNet: {path}")
    return path
