"""CFG-free fast path, guidance rescale, and clip-skip
(sampler._cfg_eps / _cfg_contexts, pipeline clip_skip — capability
extensions; reference CFG semantics are mod.rs:494-541)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdxl_tpu.models.unet import fuse_unet_qkv, init_unet
from sdxl_tpu.pipeline.sampler import (
    diffuse_latent,
    euler_sample_latent,
    scaled_linear_alphas_cumprod,
)
from tests.test_sampler import TINY_BASE as TINY
from tests.test_sampler import _cond


def _setup():
    params = fuse_unet_qkv(
        init_unet(jax.random.PRNGKey(0), TINY.unet_config(), jnp.float32)
    )
    alphas = jnp.asarray(scaled_linear_alphas_cumprod())
    cond = _cond()
    latent = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 4), jnp.float32)
    return params, alphas, cond, latent


def test_no_cfg_equals_gs1():
    """Dropping the uncond branch is exact at guidance_scale == 1:
    u + (c-u)*1 == c."""
    params, alphas, cond, latent = _setup()
    full = diffuse_latent(params, TINY, alphas, latent.copy(), cond, 1.0,
                          n_steps=3, compute_dtype=jnp.float32)
    fast = diffuse_latent(params, TINY, alphas, latent.copy(), cond, 1.0,
                          n_steps=3, compute_dtype=jnp.float32, use_cfg=False)
    np.testing.assert_allclose(np.asarray(full), np.asarray(fast),
                               rtol=1e-5, atol=1e-5)


def test_no_cfg_k_sampler_runs():
    params, alphas, cond, _ = _setup()
    out = euler_sample_latent(params, TINY, alphas, cond,
                              jax.random.PRNGKey(5), 0.0, 2, jnp.float32,
                              method="euler", use_cfg=False)
    assert np.isfinite(np.asarray(out)).all()


def test_guidance_rescale_changes_output_and_zero_is_identity():
    params, alphas, cond, latent = _setup()
    base = diffuse_latent(params, TINY, alphas, latent.copy(), cond, 7.5,
                          n_steps=3, compute_dtype=jnp.float32)
    zero = diffuse_latent(params, TINY, alphas, latent.copy(), cond, 7.5,
                          n_steps=3, compute_dtype=jnp.float32,
                          guidance_rescale=0.0)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(zero))
    resc = diffuse_latent(params, TINY, alphas, latent.copy(), cond, 7.5,
                          n_steps=3, compute_dtype=jnp.float32,
                          guidance_rescale=0.7)
    a, b = np.asarray(base), np.asarray(resc)
    assert np.isfinite(b).all()
    assert not np.allclose(a, b)


def test_rescale_std_matching_math():
    """With gr=1 the guided eps std per sample must equal the cond-branch
    std (eq. 15, arXiv:2305.08891) — checked directly on _cfg_eps."""
    from sdxl_tpu.pipeline.sampler import _cfg_contexts, _cfg_eps

    params, alphas, cond, latent = _setup()
    ctx2, ch2 = _cfg_contexts(TINY, cond, jnp.float32)
    t = jnp.asarray(500, jnp.int32)

    eps_plain = _cfg_eps(params, TINY, latent, t, ctx2, ch2, 9.0,
                         jnp.float32, alpha_t=alphas[500])
    eps_resc = _cfg_eps(params, TINY, latent, t, ctx2, ch2, 9.0,
                        jnp.float32, alpha_t=alphas[500],
                        guidance_rescale=1.0)
    # cond-branch eps == _cfg_eps at gs=1 (CFG identity)
    eps_c = _cfg_eps(params, TINY, latent, t, ctx2, ch2, 1.0, jnp.float32,
                     alpha_t=alphas[500])
    np.testing.assert_allclose(
        float(jnp.std(eps_resc)), float(jnp.std(eps_c)), rtol=1e-4
    )
    assert not np.allclose(np.asarray(eps_plain), np.asarray(eps_resc))


def test_pipeline_no_cfg_auto_at_gs1(tokenizer_dir):
    from sdxl_tpu.pipeline.pipeline import random_pipeline
    from tests.test_pipeline_e2e import TINY_DIFFUSER, TINY_EMBEDDER, TINY_VAE

    pipe = random_pipeline(
        embedder_cfg=TINY_EMBEDDER, diffuser_cfg=TINY_DIFFUSER,
        vae_cfg=TINY_VAE, compute_dtype=jnp.float32,
        param_dtype_unet=jnp.float32, tokenizer_dir=tokenizer_dir,
    )
    a = pipe.txt2img("a cat", resolution=(64, 64), n_steps=1, seed=0,
                     guidance_scale=1.0)
    b = pipe.txt2img("a cat", resolution=(64, 64), n_steps=1, seed=0,
                     guidance_scale=1.0, no_cfg=True)
    np.testing.assert_array_equal(a, b)
    # rescale flows through the pipeline too
    c = pipe.txt2img("a cat", resolution=(64, 64), n_steps=1, seed=0,
                     guidance_scale=7.5, guidance_rescale=0.7)
    assert c.shape == (1, 64, 64, 3)


def test_clip_skip_changes_conditioning(tokenizer_dir):
    from sdxl_tpu.pipeline.pipeline import random_pipeline
    from tests.test_pipeline_e2e import TINY_DIFFUSER, TINY_EMBEDDER, TINY_VAE

    pipe = random_pipeline(
        embedder_cfg=TINY_EMBEDDER, diffuser_cfg=TINY_DIFFUSER,
        vae_cfg=TINY_VAE, compute_dtype=jnp.float32,
        param_dtype_unet=jnp.float32, tokenizer_dir=tokenizer_dir,
    )
    c0 = pipe.conditioning(["a cat"], (64, 64))
    pipe.clip_skip = 1
    c1 = pipe.conditioning(["a cat"], (64, 64))
    assert not np.allclose(np.asarray(c0.context_full),
                           np.asarray(c1.context_full))


def test_clip_skip_sd1():
    from tests.test_sd1 import _tiny_sd1_pipeline

    pipe = _tiny_sd1_pipeline()
    c0 = pipe.conditioning(["a cat"], (64, 64))
    pipe.clip_skip = 1
    c1 = pipe.conditioning(["a cat"], (64, 64))
    assert not np.allclose(np.asarray(c0.context_full),
                           np.asarray(c1.context_full))
    assert np.isfinite(np.asarray(c1.context_full)).all()


