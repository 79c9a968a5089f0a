"""Pure-functional train step: optax update + grad accumulation + EMA.

TPU-first design notes:
  - the step is ONE jittable function of pytrees — no Python state, no
    host syncs inside; the caller jits it once (optionally under a
    (data, model) Mesh: the batch dp-shards, the frozen tower tp-shards
    with the inference rules, LoRA factors replicate and their grads are
    all-reduced by GSPMD automatically).
  - gradient accumulation is a ``lax.scan`` over a leading microbatch
    axis — one compiled program regardless of the accumulation factor,
    grads averaged in f32.
  - EMA (exponential moving average of the trainable params) rides the
    same step; it is the standard eval-quality knob for diffusion
    fine-tunes.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    params: dict            # trainable pytree (e.g. flat LoRA factors)
    opt_state: optax.OptState
    ema: Optional[dict]     # EMA shadow of params (None if disabled)
    step: jnp.ndarray       # i32 scalar

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation,
               ema: bool = False) -> "TrainState":
        return cls(
            params=params,
            opt_state=tx.init(params),
            # jnp.copy, not identity: EMA leaves must be DISTINCT buffers
            # from params, or donating the state donates each twice
            ema=jax.tree.map(jnp.copy, params) if ema else None,
            step=jnp.zeros((), jnp.int32),
        )


def make_train_step(
    loss_fn: Callable,
    tx: optax.GradientTransformation,
    ema_decay: Optional[float] = None,
    accum: int = 1,
):
    """Build step(state, frozen, batch, key) -> (state, loss).

    loss_fn(trainable, frozen, batch, key) -> scalar loss. With
    accum > 1 the batch must carry a leading microbatch axis
    [accum, per_micro, ...]; grads/losses are averaged across it before
    the single optimizer update (identical update math to one big batch
    for mean-reduced losses)."""
    grad_fn = jax.value_and_grad(loss_fn)

    def one_grad(trainable, frozen, batch, key):
        return grad_fn(trainable, frozen, batch, key)

    def step(state: TrainState, frozen, batch, key):
        if accum == 1:
            loss, grads = one_grad(state.params, frozen, batch, key)
        else:
            keys = jax.random.split(key, accum)

            def body(carry, mb):
                mbatch, k = mb
                loss_i, g_i = one_grad(state.params, frozen, mbatch, k)
                acc_l, acc_g = carry
                return (
                    acc_l + loss_i,
                    jax.tree.map(jnp.add, acc_g, g_i),
                ), None

            zero_g = jax.tree.map(
                lambda a: jnp.zeros(a.shape, jnp.float32), state.params
            )
            (loss, grads), _ = jax.lax.scan(
                body, (jnp.zeros((), jnp.float32), zero_g), (batch, keys)
            )
            loss = loss / accum
            grads = jax.tree.map(lambda g: g / accum, grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema
        if ema is not None:
            d = jnp.float32(ema_decay if ema_decay is not None else 0.999)
            ema = jax.tree.map(
                lambda e, p: d * e + (1.0 - d) * p.astype(e.dtype),
                ema, params,
            )
        return (
            TrainState(params=params, opt_state=opt_state, ema=ema,
                       step=state.step + 1),
            loss,
        )

    return step


def adamw_cosine(
    lr: float,
    steps: int,
    warmup: int = 0,
    weight_decay: float = 0.0,
    b1: float = 0.9,
    b2: float = 0.999,
    grad_clip: Optional[float] = 1.0,
    final_lr_frac: float = 0.0,
) -> optax.GradientTransformation:
    """The standard diffusion fine-tune recipe: AdamW with linear warmup
    and cosine decay, global-norm gradient clipping."""
    if warmup > 0:
        sched = optax.warmup_cosine_decay_schedule(
            0.0, lr, warmup, max(steps, warmup + 1),
            end_value=lr * final_lr_frac,
        )
    else:
        sched = optax.cosine_decay_schedule(
            lr, max(steps, 1), alpha=final_lr_frac
        )
    parts = []
    if grad_clip is not None:
        parts.append(optax.clip_by_global_norm(grad_clip))
    parts.append(
        optax.adamw(sched, b1=b1, b2=b2, weight_decay=weight_decay)
    )
    return optax.chain(*parts)
