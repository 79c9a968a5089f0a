"""Perturbed-Attention Guidance (Ahn et al. 2024, arXiv:2403.17377).

PAG's perturbed branch replaces the MIDDLE block's self-attention maps
with the identity (each token attends only to itself), then guides with
eps + pag_scale * (eps_cond - eps_perturbed) — diffusers' default "mid"
layer set. Tests pin the identity-attention math, the exact no-op at
pag_scale=0, composition with CFG / no-CFG / fused-qkv weights, and the
validation surface.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdxl_tpu.models.unet import (
    _mha,
    _mha_identity,
    fuse_unet_qkv,
    init_unet,
    unet_forward,
)
from sdxl_tpu.pipeline.sampler import (
    diffuse_latent,
    euler_sample_latent,
    sample_latent,
    scaled_linear_alphas_cumprod,
)
from tests.test_sampler import TINY_BASE, TINY_REFINER, _cond


def _attn_params(key, c):
    ks = jax.random.split(key, 4)
    p = {}
    for name, k in zip(("q", "k", "v", "out"), ks):
        p[name] = {"w": jax.random.normal(k, (c, c)) * 0.05}
    p["out"]["b"] = jnp.zeros((c,))
    return p


def test_identity_attention_is_v_projection():
    p = _attn_params(jax.random.PRNGKey(0), 32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 7, 32))
    got = _mha_identity(p, x)
    want = (x @ p["v"]["w"]) @ p["out"]["w"] + p["out"]["b"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_identity_attention_equals_softmax_at_single_token():
    """With T == 1 the softmax map IS the identity, so the perturbed and
    regular self-attention must agree exactly."""
    p = _attn_params(jax.random.PRNGKey(2), 32)
    x = jax.random.normal(jax.random.PRNGKey(3), (3, 1, 32))
    a = _mha(p, x, None, n_head=4)
    b = _mha_identity(p, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-6)


def test_pag_mid_forward_differs_and_fused_qkv_matches():
    cfg = TINY_BASE.unet_config()
    params = init_unet(jax.random.PRNGKey(0), cfg, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 7, 48))
    lbl = jax.random.normal(jax.random.PRNGKey(3), (1, 24))
    t = jnp.asarray([499.0])
    base = unet_forward(params, cfg, x, t, ctx, lbl)
    pert = unet_forward(params, cfg, x, t, ctx, lbl, pag_mid=True)
    assert not np.allclose(np.asarray(base), np.asarray(pert))
    fused = fuse_unet_qkv(params)
    pert_f = unet_forward(fused, cfg, x, t, ctx, lbl, pag_mid=True)
    np.testing.assert_allclose(np.asarray(pert), np.asarray(pert_f),
                               rtol=2e-5, atol=1e-5)


@pytest.fixture(scope="module")
def setup():
    params = init_unet(jax.random.PRNGKey(0), TINY_BASE.unet_config(),
                       jnp.float32)
    alphas = jnp.asarray(scaled_linear_alphas_cumprod())
    latent = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 4),
                               jnp.float32)
    return params, alphas, _cond(), latent


def test_pag_zero_is_bit_exact_noop(setup):
    params, alphas, cond, latent = setup
    base = diffuse_latent(params, TINY_BASE, alphas, latent.copy(), cond,
                          7.5, n_steps=3, compute_dtype=jnp.float32)
    zero = diffuse_latent(params, TINY_BASE, alphas, latent.copy(), cond,
                          7.5, n_steps=3, compute_dtype=jnp.float32,
                          pag_scale=0.0)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(zero))


def test_pag_changes_output_with_and_without_cfg(setup):
    params, alphas, cond, latent = setup
    base = diffuse_latent(params, TINY_BASE, alphas, latent.copy(), cond,
                          7.5, n_steps=3, compute_dtype=jnp.float32)
    pag = diffuse_latent(params, TINY_BASE, alphas, latent.copy(), cond,
                         7.5, n_steps=3, compute_dtype=jnp.float32,
                         pag_scale=3.0)
    assert np.isfinite(np.asarray(pag)).all()
    assert not np.allclose(np.asarray(base), np.asarray(pag))
    # no-CFG composition (PAG alone guides, as in PAG + Turbo configs)
    pag_nc = diffuse_latent(params, TINY_BASE, alphas, latent.copy(), cond,
                            1.0, n_steps=3, compute_dtype=jnp.float32,
                            use_cfg=False, pag_scale=3.0)
    nc = diffuse_latent(params, TINY_BASE, alphas, latent.copy(), cond,
                        1.0, n_steps=3, compute_dtype=jnp.float32,
                        use_cfg=False)
    assert np.isfinite(np.asarray(pag_nc)).all()
    assert not np.allclose(np.asarray(nc), np.asarray(pag_nc))


def test_pag_k_sampler_runs(setup):
    params, alphas, cond, _ = setup
    out = euler_sample_latent(params, TINY_BASE, alphas, cond,
                              jax.random.PRNGKey(5), 5.0, 3, jnp.float32,
                              method="dpmpp", pag_scale=2.0)
    assert np.isfinite(np.asarray(out)).all()
    base = euler_sample_latent(params, TINY_BASE, alphas, cond,
                               jax.random.PRNGKey(5), 5.0, 3, jnp.float32,
                               method="dpmpp")
    assert not np.allclose(np.asarray(out), np.asarray(base))


def test_pag_validations(setup):
    params, alphas, cond, latent = setup
    ref_params = init_unet(jax.random.PRNGKey(1), TINY_REFINER.unet_config(),
                           jnp.float32)
    with pytest.raises(ValueError, match="refiner"):
        diffuse_latent(ref_params, TINY_REFINER, alphas, latent.copy(),
                       cond, 7.5, n_steps=2, compute_dtype=jnp.float32,
                       pag_scale=2.0)
    with pytest.raises(ValueError, match="not combinable"):
        sample_latent(params, TINY_BASE, alphas, cond, jax.random.PRNGKey(0),
                      7.5, 2, jnp.float32, pag_scale=2.0, deepcache=(2, 3))


def test_pipeline_pag_surface(tokenizer_dir):
    from sdxl_tpu.pipeline.pipeline import random_pipeline
    from tests.test_pipeline_e2e import TINY_DIFFUSER, TINY_EMBEDDER, TINY_VAE

    pipe = random_pipeline(
        embedder_cfg=TINY_EMBEDDER, diffuser_cfg=TINY_DIFFUSER,
        vae_cfg=TINY_VAE, compute_dtype=jnp.float32,
        tokenizer_dir=tokenizer_dir,
    )
    img = pipe.txt2img(["a cat"], resolution=(64, 64), n_steps=2,
                       guidance_scale=5.0, pag_scale=3.0, seed=7)
    assert img.shape == (1, 64, 64, 3)
    base = pipe.txt2img(["a cat"], resolution=(64, 64), n_steps=2,
                        guidance_scale=5.0, seed=7)
    assert not np.array_equal(img, base)
    with pytest.raises(ValueError, match="LCM"):
        pipe.txt2img(["a cat"], resolution=(64, 64), n_steps=4,
                     sampler="lcm", pag_scale=2.0)
    with pytest.raises(ValueError, match="previews"):
        pipe.txt2img(["a cat"], resolution=(64, 64), n_steps=4,
                     pag_scale=2.0, preview_every=2,
                     preview_callback=lambda *a: None)
    out = pipe.img2img(["a cat"], base, strength=0.5, n_steps=4,
                       guidance_scale=5.0, sampler="euler", pag_scale=2.0,
                       seed=3)
    assert out.shape == (1, 64, 64, 3)
