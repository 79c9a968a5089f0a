"""Stochastic DDIM (ddim_eta > 0) — diffusers DDIMScheduler's eta.

Pins sdxl_tpu's _ddim_update / ddim_sigma against a literal numpy
transcription of DDIMScheduler.step (prediction_type='epsilon',
use_clipped_model_output=False): per step

    variance = (1 - a_prev)/(1 - a_t) * (1 - a_t/a_prev)
    std      = eta * sqrt(variance)
    x_prev   = sqrt(a_prev)*x0 + sqrt(1 - a_prev - std^2)*eps + std*noise

and asserts the full jitted diffuse_latent scan (real tiny UNet) matches
an eager sequential driver with the identical key schedule. eta = 0 must
reproduce the reference's deterministic path bitwise (mod.rs:402,448
hardcodes sigma = 0).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdxl_tpu.models.unet import init_unet
from sdxl_tpu.pipeline.sampler import (
    _cfg_contexts,
    _cfg_eps,
    _ddim_update,
    _scan_fold,
    _scan_normal,
    ddim_sigma,
    ddim_timesteps,
    diffuse_latent,
    scaled_linear_alphas_cumprod,
)
from tests.test_sampler import TINY_BASE, _cond


def _transcribe_step(x, eps, a_t, a_prev, eta, noise):
    """Literal numpy transcription of diffusers DDIMScheduler.step."""
    pred_x0 = (x - np.sqrt(1.0 - a_t) * eps) / np.sqrt(a_t)
    variance = (1.0 - a_prev) / (1.0 - a_t) * (1.0 - a_t / a_prev)
    std = eta * np.sqrt(variance)
    direction = np.sqrt(1.0 - a_prev - std**2) * eps
    return np.sqrt(a_prev) * pred_x0 + direction + std * noise


@pytest.mark.parametrize("eta", [0.25, 1.0])
def test_ddim_update_matches_diffusers_transcription(eta):
    """_ddim_update == the literal DDIMScheduler.step math, driven with
    the same noise arrays, over the real 30-step alpha grid (incl. the
    a_prev = 1 terminal row, where sigma collapses to 0)."""
    alphas = np.asarray(scaled_linear_alphas_cumprod(), np.float64)
    n_train = len(alphas)
    ts = ddim_timesteps(0, 30, n_train)
    step = n_train // 30
    a_t = alphas[ts]
    a_prev = np.where(ts >= step, alphas[np.maximum(ts - step, 0)], 1.0)

    rng = np.random.default_rng(7)
    x = rng.normal(size=(2, 4, 4, 4)).astype(np.float32)
    key = jax.random.PRNGKey(3)
    keys = jax.random.split(key, len(ts))
    x_ours = jnp.asarray(x)
    x_ref = np.asarray(x, np.float64)
    for i in range(len(ts)):
        eps = np.sin(x_ref * 1.7).astype(np.float32)  # synthetic field
        noise = np.asarray(
            _scan_normal(_scan_fold(keys[i], 1), x.shape), np.float64)
        x0 = (jnp.asarray(x_ref, jnp.float32)
              - jnp.asarray(eps) * jnp.sqrt(jnp.float32(1.0 - a_t[i]))
              ) / jnp.sqrt(jnp.float32(a_t[i]))
        x_ours = _ddim_update(
            x0, jnp.asarray(eps), jnp.float32(a_t[i]),
            jnp.float32(a_prev[i]), eta, keys[i], x.shape)
        x_ref = _transcribe_step(x_ref, np.asarray(eps, np.float64),
                                 a_t[i], a_prev[i], eta, noise)
        np.testing.assert_allclose(np.asarray(x_ours), x_ref,
                                   rtol=2e-5, atol=2e-5, err_msg=f"step {i}")
        # chain both sides from the transcription (keeps drift bounded)
        x_ref = np.asarray(x_ref, np.float64)

    # the sigma formula itself at a generic row
    i = 10
    got = float(ddim_sigma(jnp.float32(a_t[i]), jnp.float32(a_prev[i]), eta))
    want = eta * np.sqrt((1 - a_prev[i]) / (1 - a_t[i])
                         * (1 - a_t[i] / a_prev[i]))
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # terminal row: a_prev == 1 -> sigma 0, update degrades to x0
    assert float(ddim_sigma(jnp.float32(a_t[-1]), jnp.float32(1.0), eta)) == 0.0


def test_ddim_eta_scan_matches_sequential_driver():
    """The full jitted diffuse_latent scan (real tiny UNet, eta=1) ==
    the eager per-step driver with the identical key schedule — pins the
    scan's key threading (split(key, n), stream-1 fold) and the update
    placement inside lax.scan."""
    params = init_unet(jax.random.PRNGKey(0), TINY_BASE.unet_config(),
                       jnp.float32)
    alphas = jnp.asarray(scaled_linear_alphas_cumprod())
    cond = _cond()
    gs, n_steps, eta = 7.5, 5, 1.0
    x0 = jax.random.normal(jax.random.PRNGKey(4), (1, 8, 8, 4), jnp.float32)
    key = jax.random.PRNGKey(9)
    got = diffuse_latent(
        params, TINY_BASE, alphas, jnp.array(x0, copy=True), cond, gs,
        0, n_steps, jnp.float32, key=key, ddim_eta=eta,
    )

    n_train = int(alphas.shape[0])
    step = n_train // n_steps
    ts = ddim_timesteps(0, n_steps, n_train)
    a_np = np.asarray(alphas, np.float64)
    keys = jax.random.split(key, len(ts))
    ctx2, ch2 = _cfg_contexts(TINY_BASE, cond, jnp.float32)
    x = x0
    for i, t in enumerate(ts):
        a_t = float(a_np[t])
        a_prev = float(a_np[t - step]) if t >= step else 1.0
        eps = _cfg_eps(params, TINY_BASE, x, jnp.float32(t), ctx2, ch2,
                       gs, jnp.float32, None, jnp.float32(a_t))
        x0p = (x - eps * np.sqrt(1.0 - a_t)) / np.sqrt(a_t)
        x = _ddim_update(x0p, eps, jnp.float32(a_t), jnp.float32(a_prev),
                         eta, keys[i], x.shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(x),
                               rtol=2e-4, atol=2e-4)


def test_ddim_eta_zero_is_reference_path_bitwise():
    """eta=0 goes through the exact historical deterministic expression
    (the eta branch is python-level) — diffuse_latent with and without
    the ddim_eta argument are the same jitted program."""
    params = init_unet(jax.random.PRNGKey(0), TINY_BASE.unet_config(),
                       jnp.float32)
    alphas = jnp.asarray(scaled_linear_alphas_cumprod())
    cond = _cond()
    x0 = jax.random.normal(jax.random.PRNGKey(4), (1, 8, 8, 4), jnp.float32)
    a = diffuse_latent(params, TINY_BASE, alphas, jnp.array(x0, copy=True),
                       cond, 7.5, 0, 4, jnp.float32)
    b = diffuse_latent(params, TINY_BASE, alphas, jnp.array(x0, copy=True),
                       cond, 7.5, 0, 4, jnp.float32, ddim_eta=0.0,
                       key=jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pipeline_ddim_eta_surface(pipe):
    """ddim_eta runs end to end through txt2img; different etas give
    different images; non-ddim samplers reject it."""
    a = pipe.txt2img("a crab", resolution=(64, 64), n_steps=2, seed=3,
                     ddim_eta=1.0)
    assert a.shape == (1, 64, 64, 3) and a.dtype == np.uint8
    b = pipe.txt2img("a crab", resolution=(64, 64), n_steps=2, seed=3)
    assert not np.array_equal(a, b)
    # per-image seeds + eta: image 0 of a fused batch == solo image 0
    solo = pipe.txt2img("a crab", resolution=(64, 64), n_steps=2,
                        seed=[11], ddim_eta=1.0)
    pair = pipe.txt2img(["a crab", "a boat"], resolution=(64, 64),
                        n_steps=2, seed=[11, 12], ddim_eta=1.0)
    np.testing.assert_array_equal(solo[0], pair[0])
    with pytest.raises(ValueError, match="ddim_eta"):
        pipe.txt2img("a crab", resolution=(64, 64), n_steps=2,
                     sampler="euler", ddim_eta=0.5)


from tests.test_pipeline_e2e import pipe  # noqa: F401,E402  (fixture)
