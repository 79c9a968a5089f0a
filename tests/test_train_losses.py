"""Training losses (train/losses.py): full numpy reproductions of the
key-derived randomness, exact zero-loss identities for perfect
predictors, the min-SNR weighting pinned against a literal torch
transcription of diffusers' compute_snr recipe, and the flow-matching
time shift pinned to the inference-side fm_shift."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdxl_tpu.pipeline.flow_match import fm_shift
from sdxl_tpu.pipeline.sampler import scaled_linear_alphas_cumprod
from sdxl_tpu.train.losses import (
    diffusion_loss,
    flow_matching_loss,
    logit_normal_t,
    min_snr_weight,
    shift_time,
    snr_from_alphas,
)

AB = jnp.asarray(scaled_linear_alphas_cumprod())


def _batch(key, b=4, h=8, w=8, c=4):
    return {"latents": jax.random.normal(key, (b, h, w, c), jnp.float32)}


# ---------------------------------------------------------------------------
# min-SNR weighting vs the diffusers recipe (literal torch transcription)
# ---------------------------------------------------------------------------


def test_min_snr_pinned_to_diffusers_transcription():
    """diffusers training_utils.compute_snr + the train_text_to_image.py
    weighting, transcribed literally in torch."""
    import torch

    alphas_cumprod = torch.tensor(np.asarray(AB), dtype=torch.float64)
    timesteps = torch.tensor([0, 1, 10, 250, 500, 750, 998, 999])

    # --- literal transcription of diffusers.training_utils.compute_snr ---
    sqrt_alphas_cumprod = alphas_cumprod**0.5
    sqrt_one_minus_alphas_cumprod = (1.0 - alphas_cumprod) ** 0.5
    alpha = sqrt_alphas_cumprod[timesteps].float()
    sigma = sqrt_one_minus_alphas_cumprod[timesteps].float()
    snr = (alpha / sigma) ** 2
    # --- the weighting from examples/text_to_image/train_text_to_image.py
    snr_gamma = 5.0
    base = torch.stack(
        [snr, snr_gamma * torch.ones_like(snr)], dim=1
    ).min(dim=1)[0]
    w_eps_ref = (base / snr).numpy()
    w_v_ref = (base / (snr + 1)).numpy()
    # ---------------------------------------------------------------------

    t = jnp.asarray(timesteps.numpy())
    snr_t = snr_from_alphas(AB)[t]
    np.testing.assert_allclose(
        np.asarray(snr_t), snr.numpy(), rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(min_snr_weight(snr_t, snr_gamma, "epsilon")),
        w_eps_ref, rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(min_snr_weight(snr_t, snr_gamma, "v")),
        w_v_ref, rtol=2e-4)


# ---------------------------------------------------------------------------
# diffusion_loss: exact numpy reproduction of the whole computation
# ---------------------------------------------------------------------------


def _reproduce_draws(key, x0, noise_offset=0.0, n_train=1000):
    """The same key-split protocol diffusion_loss uses."""
    b = x0.shape[0]
    k_t, k_n, k_off = jax.random.split(key, 3)
    t = np.asarray(jax.random.randint(k_t, (b,), 0, n_train))
    noise = np.asarray(jax.random.normal(k_n, x0.shape, jnp.float32))
    if noise_offset:
        noise = noise + noise_offset * np.asarray(jax.random.normal(
            k_off, (b,) + (1,) * (x0.ndim - 1), jnp.float32))
    return t, noise


@pytest.mark.parametrize("snr_gamma,noise_offset", [
    (None, 0.0), (5.0, 0.0), (None, 0.1), (5.0, 0.1),
])
def test_diffusion_loss_numpy_reproduction(snr_gamma, noise_offset):
    """eps-prediction loss with a deterministic 'model' reproduces the
    published formula end to end (t/noise draws, x_t construction,
    per-sample MSE, min-SNR weights, mean reduction)."""
    key = jax.random.PRNGKey(42)
    batch = _batch(jax.random.PRNGKey(1))
    x0 = np.asarray(batch["latents"])

    def apply_fn(params, x_t, t, b):
        return params["s"] * x_t  # any deterministic function of x_t

    params = {"s": jnp.float32(0.3)}
    loss = diffusion_loss(
        apply_fn, params, AB, batch, key,
        prediction_type="epsilon", snr_gamma=snr_gamma,
        noise_offset=noise_offset,
    )

    t, noise = _reproduce_draws(key, x0, noise_offset)
    ab_t = np.asarray(AB, np.float64)[t].reshape(-1, 1, 1, 1)
    x_t = np.sqrt(ab_t) * x0 + np.sqrt(1 - ab_t) * noise
    pred = 0.3 * x_t
    per = np.mean((pred - noise) ** 2, axis=(1, 2, 3))
    if snr_gamma is not None:
        snr = ab_t.reshape(-1) / (1 - ab_t.reshape(-1))
        per = per * np.minimum(snr, snr_gamma) / snr
    np.testing.assert_allclose(float(loss), per.mean(), rtol=1e-5)


def test_v_prediction_perfect_model_zero_loss():
    """A model returning the TRUE v (recovered from x_t via the same
    alpha-bar table) drives the v loss to ~0 — the target is the exact
    inverse of the sampler-side v->eps conversion."""
    key = jax.random.PRNGKey(7)
    batch = _batch(jax.random.PRNGKey(2))

    def apply_fn(params, x_t, t, b):
        ab_t = AB[t].reshape(-1, 1, 1, 1)
        sq, sq1 = jnp.sqrt(ab_t), jnp.sqrt(1.0 - ab_t)
        x0 = b["latents"]
        eps = (x_t - sq * x0) / sq1
        return sq * eps - sq1 * x0

    loss = diffusion_loss(apply_fn, {}, AB, batch, key, prediction_type="v")
    assert float(loss) < 1e-8


def test_epsilon_perfect_model_zero_loss():
    key = jax.random.PRNGKey(9)
    batch = _batch(jax.random.PRNGKey(3))

    def apply_fn(params, x_t, t, b):
        ab_t = AB[t].reshape(-1, 1, 1, 1)
        return (x_t - jnp.sqrt(ab_t) * b["latents"]) / jnp.sqrt(1.0 - ab_t)

    loss = diffusion_loss(apply_fn, {}, AB, batch, key)
    assert float(loss) < 1e-8


# ---------------------------------------------------------------------------
# flow_matching_loss
# ---------------------------------------------------------------------------


def test_flow_matching_perfect_velocity_zero_loss():
    """x_t = (1-sig) x0 + sig eps; recovering eps from x_t and returning
    eps - x0 gives ~0 loss; the model sees t = sigma*1000."""
    key = jax.random.PRNGKey(11)
    batch = _batch(jax.random.PRNGKey(4))
    seen_t = []

    def apply_fn(params, x_t, t, b):
        seen_t.append(t)
        sig = (t / 1000.0).reshape(-1, 1, 1, 1)
        eps = (x_t - (1.0 - sig) * b["latents"]) / sig
        return eps - b["latents"]

    loss = flow_matching_loss(apply_fn, {}, batch, key, shift=3.0)
    assert float(loss) < 1e-6
    t = np.asarray(seen_t[0])
    assert t.shape == (4,) and (t > 0).all() and (t < 1000).all()


def test_flow_matching_numpy_reproduction():
    key = jax.random.PRNGKey(13)
    batch = _batch(jax.random.PRNGKey(5))
    x0 = np.asarray(batch["latents"])

    def apply_fn(params, x_t, t, b):
        return 0.5 * x_t

    loss = flow_matching_loss(
        apply_fn, {}, batch, key, shift=3.0,
        time_sampling="uniform",
    )

    k_t, k_n = jax.random.split(key)
    u = np.asarray(jax.random.uniform(k_t, (4,)))
    sigma = 3.0 * u / (1.0 + 2.0 * u)
    noise = np.asarray(jax.random.normal(k_n, x0.shape, jnp.float32))
    sig = sigma.reshape(-1, 1, 1, 1)
    x_t = (1 - sig) * x0 + sig * noise
    per = np.mean((0.5 * x_t - (noise - x0)) ** 2, axis=(1, 2, 3))
    np.testing.assert_allclose(float(loss), per.mean(), rtol=1e-5)


def test_shift_time_matches_inference_fm_shift():
    """The train-side static shift IS the schedule map the SD3/Flux
    inference grids apply (pipeline/flow_match.fm_shift)."""
    u = np.linspace(1e-4, 1.0, 97)
    np.testing.assert_allclose(
        np.asarray(shift_time(jnp.asarray(u), 3.0)),
        fm_shift(u, 3.0), rtol=1e-6)


def test_logit_normal_density_range():
    t = np.asarray(logit_normal_t(jax.random.PRNGKey(0), (4096,)))
    assert (t > 0).all() and (t < 1).all()
    # m=0, s=1: median at sigmoid(0)=0.5, mid-heavy density
    assert abs(np.median(t) - 0.5) < 0.03
    assert ((t > 0.25) & (t < 0.75)).mean() > 0.5
