"""Train step (train/step.py) + checkpoint/resume (train/checkpoint.py):
gradient-accumulation == big-batch identity, EMA math, the AdamW recipe
on a toy problem, an end-to-end tiny-UNet LoRA fine-tune that actually
reduces the diffusion loss, and the orbax round-trip."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from sdxl_tpu.train.step import TrainState, adamw_cosine, make_train_step


def _quad_loss(trainable, frozen, batch, key):
    # deterministic (key unused): mean((x @ w - y)^2)
    pred = batch["x"] @ trainable["w"]
    return jnp.mean(jnp.square(pred - batch["y"]))


def _toy_batch(key, n=16, d=8):
    kx, kw = jax.random.split(key)
    x = jax.random.normal(kx, (n, d), jnp.float32)
    w_true = jax.random.normal(kw, (d, 3), jnp.float32)
    return {"x": x, "y": x @ w_true}


def test_accum_equals_big_batch():
    """lax.scan microbatch accumulation reproduces the single big-batch
    update for a mean-reduced loss."""
    tx = optax.adam(1e-2)
    params = {"w": jnp.zeros((8, 3), jnp.float32)}
    batch = _toy_batch(jax.random.PRNGKey(0))

    s1 = TrainState.create(params, tx)
    step1 = make_train_step(_quad_loss, tx, accum=1)
    s1, l1 = jax.jit(step1)(s1, None, batch, jax.random.PRNGKey(1))

    s4 = TrainState.create(params, tx)
    step4 = make_train_step(_quad_loss, tx, accum=4)
    micro = jax.tree.map(lambda a: a.reshape((4, 4) + a.shape[1:]), batch)
    s4, l4 = jax.jit(step4)(s4, None, micro, jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(l1), float(l4), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s1.params["w"]), np.asarray(s4.params["w"]), atol=1e-6)
    assert int(s4.step) == 1


def test_ema_update_math():
    tx = optax.sgd(0.1)
    params = {"w": jnp.ones((4, 3), jnp.float32)}
    state = TrainState.create(params, tx, ema=True)
    np.testing.assert_array_equal(
        np.asarray(state.ema["w"]), np.asarray(params["w"]))
    step = make_train_step(_quad_loss, tx, ema_decay=0.9)
    batch = _toy_batch(jax.random.PRNGKey(2), n=8, d=4)
    new, _ = jax.jit(step)(state, None, batch, jax.random.PRNGKey(0))
    expect = 0.9 * np.asarray(params["w"]) + 0.1 * np.asarray(new.params["w"])
    np.testing.assert_allclose(np.asarray(new.ema["w"]), expect, atol=1e-6)


def test_adamw_cosine_converges():
    tx = adamw_cosine(lr=5e-2, steps=60, warmup=5, weight_decay=1e-4)
    params = {"w": jnp.zeros((8, 3), jnp.float32)}
    state = TrainState.create(params, tx)
    step = jax.jit(make_train_step(_quad_loss, tx))
    batch = _toy_batch(jax.random.PRNGKey(3))
    losses = []
    for i in range(60):
        state, loss = step(state, None, batch, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert losses[-1] < 0.05 * losses[0]
    assert np.isfinite(losses).all()


def test_lora_finetune_tiny_unet_reduces_loss():
    """End to end: frozen tiny UNet + runtime LoRA factors + the DDPM
    eps loss — a few AdamW steps on a FIXED batch/key reduce the loss,
    and only the factors change."""
    from sdxl_tpu.configs import UNetConfig
    from sdxl_tpu.models.unet import init_unet, unet_forward
    from sdxl_tpu.pipeline.sampler import scaled_linear_alphas_cumprod
    from sdxl_tpu.train.losses import diffusion_loss
    from sdxl_tpu.train.lora import init_lora, set_leaves

    cfg = UNetConfig(
        adm_in_channels=24, in_channels=4, out_channels=4,
        model_channels=32, channel_mults=(1, 2, 4), n_head_channels=8,
        transformer_depths=(1, 1, 2), context_dim=16,
    )
    frozen = init_unet(jax.random.PRNGKey(0), cfg, jnp.float32)
    flat = init_lora(frozen, rank=4, key=jax.random.PRNGKey(1))
    ab = jnp.asarray(scaled_linear_alphas_cumprod())

    batch = {
        "latents": jax.random.normal(
            jax.random.PRNGKey(2), (2, 16, 16, 4), jnp.float32),
        "ctx": jax.random.normal(
            jax.random.PRNGKey(3), (2, 7, 16), jnp.float32),
        "label": jax.random.normal(
            jax.random.PRNGKey(4), (2, 24), jnp.float32),
    }

    def apply_fn(trainable, x_t, t, b):
        params = set_leaves(apply_fn.frozen, trainable)
        return unet_forward(params, cfg, x_t, t, b["ctx"], b["label"])

    apply_fn.frozen = frozen

    def loss_fn(trainable, frozen_unused, b, key):
        return diffusion_loss(apply_fn, trainable, ab, b, key)

    tx = adamw_cosine(lr=2e-3, steps=6)
    state = TrainState.create(flat, tx)
    step = jax.jit(make_train_step(loss_fn, tx))
    fixed_key = jax.random.PRNGKey(5)  # same draws every step
    first = None
    for _ in range(6):
        state, loss = step(state, None, batch, fixed_key)
        first = float(loss) if first is None else first
    assert float(loss) < first, (first, float(loss))
    # ups were zero at init; training moved them
    up0 = next(k for k in state.params if k.endswith(".lora_up"))
    assert float(jnp.abs(state.params[up0]).max()) > 0


def test_checkpoint_roundtrip(tmp_path):
    from sdxl_tpu.train.checkpoint import (
        latest_step,
        restore_train_state,
        save_train_state,
    )

    tx = adamw_cosine(lr=1e-2, steps=10)
    params = {"a.w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3)}
    state = TrainState.create(params, tx, ema=True)
    step = jax.jit(make_train_step(
        lambda p, f, b, k: jnp.sum(jnp.square(p["a.w"])), tx,
        ema_decay=0.99))
    for _ in range(3):
        state, _ = step(state, None, None, jax.random.PRNGKey(0))

    d = str(tmp_path / "ckpt")
    assert latest_step(d) is None
    assert save_train_state(d, state) == 3
    assert latest_step(d) == 3

    fresh = TrainState.create(params, tx, ema=True)
    restored = restore_train_state(d, fresh)
    assert int(restored.step) == 3
    for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    with pytest.raises(FileNotFoundError):
        restore_train_state(str(tmp_path / "nope"), fresh)
