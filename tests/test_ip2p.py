"""InstructPix2Pix (Brooks et al. 2023, arXiv:2211.09800).

The edit model is an 8-channel UNet (conv_in sees [noisy latent | edit
latent]) guided by the paper's 3-way CFG (eq. 3), which diffusers'
StableDiffusionInstructPix2PixPipeline applies to its [text, image,
uncond] batch split:

    eps = e(z, 0, 0)
        + s_I * (e(z, c_I, 0) - e(z, 0, 0))
        + s_T * (e(z, c_I, c_T) - e(z, c_I, 0))

Tests pin the batched 3-row combination against three independent UNet
calls, the exact degeneration to the conditional branch at s_T=s_I=1,
the unscaled-latent encoding quirk at the pipeline level, the
determinism/shape contract, and the validation surface.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdxl_tpu.configs import DiffuserConfig
from sdxl_tpu.models.unet import init_unet, unet_forward
from sdxl_tpu.pipeline.sampler import (
    _cfg_contexts,
    _cfg_eps,
    diffuse_latent,
    euler_sample_latent,
    sample_latent,
    scaled_linear_alphas_cumprod,
)
from tests.test_sampler import TINY_BASE, _cond

TINY_EDIT = dataclasses.replace(TINY_BASE, in_channels=8)


@pytest.fixture(scope="module")
def setup():
    cfg = TINY_EDIT.unet_config()
    params = init_unet(jax.random.PRNGKey(0), cfg, jnp.float32)
    cond = _cond(batch=2)
    latent = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    edit = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 4))
    return params, cond, latent, edit


def _single_eps(params, ucfg, latent, t, ctx, ch, cc):
    x_in = jnp.concatenate([latent, cc], axis=-1)
    t_vec = jnp.broadcast_to(t, (latent.shape[0],))
    return unet_forward(params, ucfg, x_in, t_vec, ctx, ch)


def test_three_way_cfg_matches_sequential_calls(setup):
    """The batched 3-row _cfg_eps == three independent UNet calls
    combined with the published formula."""
    params, cond, latent, edit = setup
    dcfg = TINY_EDIT
    ucfg = dcfg.unet_config()
    t = jnp.asarray(499.0)
    s_t, s_i = 7.5, 1.5

    ctx3, ch3 = _cfg_contexts(dcfg, cond, jnp.float32, True, rows3=True)
    cc3 = jnp.concatenate([jnp.zeros_like(edit), edit, edit], axis=0)
    got = _cfg_eps(params, dcfg, latent, t, ctx3, ch3, s_t, jnp.float32,
                   cross_kv=None, concat=cc3, image_scale=s_i)

    uctx = jnp.broadcast_to(cond.unconditional_context_full,
                            cond.context_full.shape)
    uch = jnp.broadcast_to(cond.unconditional_channel_context,
                           cond.channel_context.shape)
    e_u = _single_eps(params, ucfg, latent, t, uctx, uch,
                      jnp.zeros_like(edit))
    e_i = _single_eps(params, ucfg, latent, t, uctx, uch, edit)
    e_t = _single_eps(params, ucfg, latent, t, cond.context_full,
                      cond.channel_context, edit)
    want = e_u + s_i * (e_i - e_u) + s_t * (e_t - e_i)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_both_scales_one_is_the_conditional_branch(setup):
    """s_T = s_I = 1 collapses the formula to e(z, c_I, c_T): the 3-way
    path must match the cond-only (no-CFG) path with the image concat."""
    params, cond, latent, edit = setup
    dcfg = TINY_EDIT
    t = jnp.asarray(250.0)

    ctx3, ch3 = _cfg_contexts(dcfg, cond, jnp.float32, True, rows3=True)
    cc3 = jnp.concatenate([jnp.zeros_like(edit), edit, edit], axis=0)
    three = _cfg_eps(params, dcfg, latent, t, ctx3, ch3, 1.0, jnp.float32,
                     cross_kv=None, concat=cc3, image_scale=1.0)

    ctx1, ch1 = _cfg_contexts(dcfg, cond, jnp.float32, False)
    one = _cfg_eps(params, dcfg, latent, t, ctx1, ch1, 1.0, jnp.float32,
                   cross_kv=None, concat=edit, use_cfg=False)
    np.testing.assert_allclose(np.asarray(three), np.asarray(one),
                               rtol=1e-4, atol=1e-5)


def test_ddim_and_euler_edit_loops_run(setup):
    params, cond, latent, edit = setup
    alphas = scaled_linear_alphas_cumprod()
    key = jax.random.PRNGKey(5)
    for fn in (sample_latent, euler_sample_latent):
        out = fn(params, TINY_EDIT, alphas, cond, key, 7.5, n_steps=2,
                 compute_dtype=jnp.float32, concat_channels=edit,
                 edit=True, image_guidance_scale=1.5)
        assert out.shape == (2, 8, 8, 4)
        assert np.isfinite(np.asarray(out)).all()


def test_edit_requires_eight_channel_unet(setup):
    _, cond, latent, edit = setup
    params4 = init_unet(jax.random.PRNGKey(0), TINY_BASE.unet_config(),
                        jnp.float32)
    alphas = scaled_linear_alphas_cumprod()
    with pytest.raises(ValueError, match="8-channel"):
        sample_latent(params4, TINY_BASE, alphas, cond,
                      jax.random.PRNGKey(0), 7.5, n_steps=2,
                      compute_dtype=jnp.float32, concat_channels=edit,
                      edit=True)


def test_edit_rejects_missing_concat_and_bad_combos(setup):
    params, cond, latent, edit = setup
    alphas = scaled_linear_alphas_cumprod()
    key = jax.random.PRNGKey(0)
    with pytest.raises(ValueError, match="concat_channels"):
        sample_latent(params, TINY_EDIT, alphas, cond, key, 7.5, n_steps=2,
                      compute_dtype=jnp.float32, edit=True)
    with pytest.raises(ValueError, match="DeepCache"):
        sample_latent(params, TINY_EDIT, alphas, cond, key, 7.5, n_steps=2,
                      compute_dtype=jnp.float32, concat_channels=edit,
                      edit=True, deepcache=(2, 1))
    with pytest.raises(ValueError, match="PAG"):
        sample_latent(params, TINY_EDIT, alphas, cond, key, 7.5, n_steps=2,
                      compute_dtype=jnp.float32, concat_channels=edit,
                      edit=True, pag_scale=3.0)
    with pytest.raises(ValueError, match="euler_cfgpp"):
        euler_sample_latent(params, TINY_EDIT, alphas, cond, key, 7.5,
                            n_steps=2, compute_dtype=jnp.float32,
                            method="euler_cfgpp", concat_channels=edit,
                            edit=True)


def test_edit_deterministic_and_scale_sensitive(setup):
    params, cond, latent, edit = setup
    alphas = scaled_linear_alphas_cumprod()
    key = jax.random.PRNGKey(7)
    kw = dict(compute_dtype=jnp.float32, concat_channels=edit, edit=True)
    a = sample_latent(params, TINY_EDIT, alphas, cond, key, 7.5, n_steps=2,
                      image_guidance_scale=1.5, **kw)
    b = sample_latent(params, TINY_EDIT, alphas, cond, key, 7.5, n_steps=2,
                      image_guidance_scale=1.5, **kw)
    c = sample_latent(params, TINY_EDIT, alphas, cond, key, 7.5, n_steps=2,
                      image_guidance_scale=2.5, **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))


# ---------------------------------------------------------------------------
# pipeline level

from tests.test_pipeline_e2e import (  # noqa: E402
    TINY_DIFFUSER,
    TINY_EMBEDDER,
    TINY_VAE,
)

TINY_EDIT_DIFFUSER = dataclasses.replace(TINY_DIFFUSER, in_channels=8)


@pytest.fixture(scope="module")
def edit_pipe(tokenizer_dir):
    from sdxl_tpu.pipeline.pipeline import random_pipeline

    return random_pipeline(
        embedder_cfg=TINY_EMBEDDER,
        diffuser_cfg=TINY_EDIT_DIFFUSER,
        vae_cfg=TINY_VAE,
        compute_dtype=jnp.float32,
        param_dtype_unet=jnp.float32,
        tokenizer_dir=tokenizer_dir,
    )


def _checker(h=64, w=64):
    img = np.zeros((h, w, 3), np.uint8)
    img[: h // 2, : w // 2] = 200
    img[h // 2:, w // 2:] = 80
    return img


def test_pipeline_ip2p_end_to_end(edit_pipe):
    out = edit_pipe.ip2p("make it a watercolor", _checker(), n_steps=2,
                         seed=3)
    assert out.shape == (1, 64, 64, 3) and out.dtype == np.uint8
    again = edit_pipe.ip2p("make it a watercolor", _checker(), n_steps=2,
                           seed=3)
    np.testing.assert_array_equal(out, again)
    # euler path + per-image seeds
    out2 = edit_pipe.ip2p(["a", "b"], _checker(), n_steps=2,
                          seed=[3, 4], sampler="euler")
    assert out2.shape == (2, 64, 64, 3)


def test_pipeline_ip2p_encodes_unscaled_latents(edit_pipe, monkeypatch):
    """The ip2p conditioning quirk: the edit image is VAE-encoded WITHOUT
    the latent scale factor (the original repo conditions on
    encode_first_stage(image).mode() unscaled; diffusers'
    prepare_image_latents matches)."""
    import sdxl_tpu.pipeline.pipeline as pl

    seen = []
    real = pl.encode_images_to_latent

    def spy(params, cfg, images, scale_factor):
        seen.append(scale_factor)
        return real(params, cfg, images, scale_factor)

    monkeypatch.setattr(pl, "encode_images_to_latent", spy)
    edit_pipe.ip2p("edit", _checker(), n_steps=1, seed=0)
    assert seen == [1.0]


def test_pipeline_ip2p_rejects_four_channel_model(edit_pipe, tokenizer_dir):
    from sdxl_tpu.pipeline.pipeline import random_pipeline

    plain = random_pipeline(
        embedder_cfg=TINY_EMBEDDER, diffuser_cfg=TINY_DIFFUSER,
        vae_cfg=TINY_VAE, compute_dtype=jnp.float32,
        param_dtype_unet=jnp.float32, tokenizer_dir=tokenizer_dir,
    )
    with pytest.raises(ValueError, match="in_channels=4"):
        plain.ip2p("edit", _checker(), n_steps=1)
