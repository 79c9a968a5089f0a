"""DDIM inversion (sampler.ddim_invert_latent, pipeline.ddim_invert).

The inversion walks the deterministic DDIM chain backward under the
first-order approximation eps(x_t) ~= eps(x_{t+dt}) (the diffusers
DDIMInverseScheduler / null-text-inversion `next_step` recipe,
arXiv:2211.09794). With an epsilon field CONSTANT in x the approximation
is exact, so invert-then-sample must reproduce the input latent to float
precision — the identity these tests exploit (monkeypatching the UNet
forward with a constant field), plus grid conventions, a real-UNet
round-trip sanity bound, and the pipeline surface.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sdxl_tpu.pipeline.sampler as S
from tests.test_sampler import TINY_BASE, _cond


def test_invert_then_sample_is_identity_for_constant_eps(monkeypatch):
    """eps(x, t) = c (constant in x and t): the DDIM update chain is
    exactly invertible, so sample_latent(ddim_invert_latent(x0)) == x0 to
    f32 precision. A wrong grid alignment (evaluating at the source
    instead of the target timestep, or a mis-paired a_src/a_dst) breaks
    this identity badly at the noisiest steps."""
    const = jax.random.normal(jax.random.PRNGKey(3), (1, 6, 10, 4),
                              jnp.float32) * 0.3

    def fake_unet(params, cfg, x, t, ctx, ch, **kw):
        return jnp.broadcast_to(const.astype(x.dtype),
                                x.shape[:1] + const.shape[1:])

    monkeypatch.setattr(S, "unet_forward", fake_unet)
    # the fake ignores params; skip the real K/V hoist over the empty tree
    monkeypatch.setattr(S, "precompute_cross_kv", lambda *a, **k: None)
    alphas = jnp.asarray(S.scaled_linear_alphas_cumprod())
    cond = _cond(batch=1, h=48, w=80)  # unique shape: no jit-cache reuse
    x0 = jax.random.normal(jax.random.PRNGKey(5), (1, 6, 10, 4), jnp.float32)

    params = {}  # the fake ignores them
    inverted = S.ddim_invert_latent(
        params, TINY_BASE, alphas, jnp.array(x0, copy=True), cond,
        1.0, n_steps=5, compute_dtype=jnp.float32, use_cfg=False,
    )
    # forward DDIM from the inverted latent, same grid, no CFG
    recon = S.diffuse_latent(
        params, TINY_BASE, alphas, jnp.array(inverted, copy=True), cond,
        1.0, 0, 5, jnp.float32, use_cfg=False,
    )
    np.testing.assert_allclose(np.asarray(recon), np.asarray(x0),
                               rtol=2e-4, atol=2e-4)
    # and the inverted latent is the analytic terminal point of the
    # constant-field chain: x_999 = sqrt(a_999)*x0 + sqrt(1-a_999)*c
    a999 = float(alphas[999])
    want = np.sqrt(a999) * np.asarray(x0) + np.sqrt(1 - a999) * np.asarray(
        const)
    np.testing.assert_allclose(np.asarray(inverted), want,
                               rtol=2e-4, atol=2e-4)


def test_invert_grid_is_the_sampling_grid_reversed():
    """The inversion must visit exactly the sampling grid ascending:
    ddim_timesteps(0, n)[::-1], stepping alpha(t-step) -> alpha(t)."""
    ts = S.ddim_timesteps(0, 5)
    assert ts[0] == 999 and ts[-1] == 199  # descending sampling grid
    asc = ts[::-1]
    assert asc[0] == 199 and asc[-1] == 999


def test_real_unet_round_trip_reduces_error_with_steps():
    """With a real (random) tiny UNet the inversion is approximate; the
    reconstruction error must be finite, seed-independent, and shrink as
    the step count grows (the first-order error is O(dt))."""
    params = __import__("sdxl_tpu.models.unet", fromlist=["init_unet"]
                        ).init_unet(jax.random.PRNGKey(0),
                                    TINY_BASE.unet_config(), jnp.float32)
    alphas = jnp.asarray(S.scaled_linear_alphas_cumprod())
    cond = _cond(batch=1)
    x0 = 0.5 * jax.random.normal(jax.random.PRNGKey(7), (1, 8, 8, 4),
                                 jnp.float32)

    def rt(n):
        inv = S.ddim_invert_latent(
            params, TINY_BASE, alphas, jnp.array(x0, copy=True), cond,
            1.0, n_steps=n, compute_dtype=jnp.float32, use_cfg=False)
        rec = S.diffuse_latent(
            params, TINY_BASE, alphas, jnp.array(inv, copy=True), cond,
            1.0, 0, n, jnp.float32, use_cfg=False)
        return float(jnp.sqrt(jnp.mean((rec - x0) ** 2)))

    e4, e16 = rt(4), rt(16)
    assert np.isfinite(e4) and np.isfinite(e16)
    assert e16 < e4, (e4, e16)


def test_table_length_mismatch_is_an_error():
    cond = _cond(batch=1)
    bad = dataclasses.replace(TINY_BASE, n_steps=500)
    with pytest.raises(ValueError, match="does not match"):
        S.ddim_invert_latent(
            {}, bad, jnp.asarray(S.scaled_linear_alphas_cumprod()),
            jnp.zeros((1, 8, 8, 4)), cond, 1.0, n_steps=5,
            compute_dtype=jnp.float32)


# ---------------------------------------------------------------------------
# pipeline level


def test_pipeline_invert_and_resample(tokenizer_dir):
    from sdxl_tpu.pipeline.pipeline import random_pipeline
    from tests.test_pipeline_e2e import (
        TINY_DIFFUSER,
        TINY_EMBEDDER,
        TINY_VAE,
    )

    pipe = random_pipeline(
        embedder_cfg=TINY_EMBEDDER, diffuser_cfg=TINY_DIFFUSER,
        vae_cfg=TINY_VAE, compute_dtype=jnp.float32,
        param_dtype_unet=jnp.float32, tokenizer_dir=tokenizer_dir,
    )
    img = np.zeros((64, 64, 3), np.uint8)
    img[16:48, 16:48] = 180
    inv = pipe.ddim_invert("a square", img, n_steps=2)
    assert inv.shape == (1, 8, 8, 4) and np.isfinite(inv).all()
    out = pipe.txt2img("a square", resolution=(64, 64), n_steps=2,
                       initial_latent=inv)
    assert out.shape == (1, 64, 64, 3) and out.dtype == np.uint8
    # determinism: initial_latent fully determines the DDIM chain
    out2 = pipe.txt2img("a square", resolution=(64, 64), n_steps=2,
                        initial_latent=inv, seed=123)
    np.testing.assert_array_equal(out, out2)
    with pytest.raises(ValueError, match="ddim"):
        pipe.txt2img("a square", resolution=(64, 64), n_steps=2,
                     initial_latent=inv, sampler="euler")
    with pytest.raises(ValueError, match="shape"):
        pipe.txt2img("a square", resolution=(96, 64), n_steps=2,
                     initial_latent=inv)
