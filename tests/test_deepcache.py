"""DeepCache (arXiv:2312.00858) tests.

The split-forward pair is pinned by an exact identity: a shallow step
fed the cache captured from a full step at the same (x, t) must
reproduce the full output bit-for-bit (the shallow prefix/suffix rerun
the same blocks on the same inputs). Interval=1 through the pipeline
equals the uncached path; interval>1 runs and stays finite; the
unsupported combinations raise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdxl_tpu.models.unet import (
    init_unet,
    unet_forward,
    unet_forward_cached,
    unet_forward_shallow,
)
from tests.test_sampler import TINY_BASE


def _inputs(ucfg, seed=0, b=1):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((b, 8, 8, 4)), jnp.float32)
    t = jnp.full((b,), 500.0, jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((b, 7, ucfg.context_dim)),
                      jnp.float32)
    label = jnp.asarray(rng.standard_normal((b, ucfg.adm_in_channels)),
                        jnp.float32)
    return x, t, ctx, label


def test_cached_forward_matches_full_and_shallow_identity():
    """unet_forward_cached == unet_forward exactly; a shallow step with
    the same-(x,t) cache reproduces the full output exactly, for every
    legal branch depth."""
    ucfg = TINY_BASE.unet_config()
    params = init_unet(jax.random.PRNGKey(0), ucfg, jnp.float32)
    x, t, ctx, label = _inputs(ucfg)

    ref = unet_forward(params, ucfg, x, t, ctx, label)
    for branch in (1, 3, 5):
        out, cache = unet_forward_cached(params, ucfg, x, t, ctx, label,
                                         branch=branch)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
        shallow = unet_forward_shallow(params, ucfg, x, t, ctx, label,
                                       cache, branch=branch)
        np.testing.assert_allclose(np.asarray(shallow), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)

    with pytest.raises(ValueError, match="branch"):
        unet_forward_cached(params, ucfg, x, t, ctx, label, branch=99)


def test_shallow_step_with_stale_cache_approximates():
    """The actual DeepCache mode: a stale cache (from a different
    timestep) gives a finite approximation that differs from the exact
    output but shares its scale."""
    ucfg = TINY_BASE.unet_config()
    params = init_unet(jax.random.PRNGKey(0), ucfg, jnp.float32)
    x, t, ctx, label = _inputs(ucfg)
    _, cache = unet_forward_cached(params, ucfg, x, t, ctx, label, branch=3)
    x2 = x * 0.9
    t2 = jnp.full_like(t, 470.0)
    exact = unet_forward(params, ucfg, x2, t2, ctx, label)
    approx = unet_forward_shallow(params, ucfg, x2, t2, ctx, label, cache,
                                  branch=3)
    a, e = np.asarray(approx), np.asarray(exact)
    assert np.isfinite(a).all()
    assert not np.array_equal(a, e)
    assert np.abs(a).max() < 10 * max(np.abs(e).max(), 1.0)


def _tiny_pipe():
    from sdxl_tpu.pipeline.pipeline import random_pipeline
    from tests.test_pipeline_e2e import TINY_DIFFUSER, TINY_EMBEDDER, TINY_VAE

    return random_pipeline(
        embedder_cfg=TINY_EMBEDDER, diffuser_cfg=TINY_DIFFUSER,
        vae_cfg=TINY_VAE, compute_dtype=jnp.float32,
        param_dtype_unet=jnp.float32,
    )


def test_pipeline_deepcache_interval_one_equals_off():
    """interval=1: every step takes the full branch of the lax.cond —
    identical math to the uncached scan, for DDIM and a k-sampler."""
    pipe = _tiny_pipe()
    kw = dict(resolution=(64, 64), n_steps=4, seed=5, profile_stages=False)
    for sampler in ("ddim", "dpmpp", "unipc"):
        base = pipe.txt2img("a cat", sampler=sampler, **kw)
        dc1 = pipe.txt2img("a cat", sampler=sampler, deepcache=(1, 3), **kw)
        np.testing.assert_allclose(base.astype(int), dc1.astype(int),
                                   atol=1)


def test_pipeline_deepcache_interval_two_runs():
    pipe = _tiny_pipe()
    kw = dict(resolution=(64, 64), n_steps=4, seed=5, profile_stages=False)
    base = pipe.txt2img("a cat", **kw)
    for sampler in ("ddim", "euler"):
        dc = pipe.txt2img("a cat", sampler=sampler, deepcache=(2, 3), **kw)
        assert dc.shape == base.shape
        assert np.isfinite(dc).all()
    # the approximation must actually change something vs exact DDIM
    dc_d = pipe.txt2img("a cat", deepcache=(2, 3), **kw)
    assert np.abs(dc_d.astype(int) - base.astype(int)).max() > 0
    # img2img path
    ref = (np.random.default_rng(2).random((1, 64, 64, 3)) * 255).astype(
        np.uint8)
    out = pipe.img2img("a dog", ref, strength=0.5, n_steps=4, seed=9,
                       deepcache=(2, 3))
    assert np.isfinite(out).all()


def test_deepcache_rejects_unsupported_combinations():
    from sdxl_tpu.models.controlnet import init_controlnet

    pipe = _tiny_pipe()
    kw = dict(resolution=(64, 64), n_steps=2, seed=5, profile_stages=False)
    with pytest.raises(ValueError, match="preview"):
        pipe.txt2img("x", deepcache=(2, 3), preview_every=1,
                     preview_callback=lambda *a: None, **kw)
    pipe.controlnet_params = init_controlnet(
        jax.random.PRNGKey(0), pipe.diffuser_cfg.unet_config(), jnp.float32
    )
    pipe.controlnet_cfg = pipe.diffuser_cfg.unet_config()
    img = np.zeros((64, 64, 3), np.uint8)
    with pytest.raises(ValueError, match="ControlNet"):
        pipe.txt2img("x", deepcache=(2, 3), control_image=img, **kw)
