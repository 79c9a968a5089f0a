"""Ensemble-of-experts base/refiner split (diffusers' denoising_end /
denoising_start): head_steps + tail_from must compose back to the full
run for the memoryless samplers, and the split math must follow
diffusers' discrete_timestep_cutoff filter exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdxl_tpu.configs import DiffuserConfig
from sdxl_tpu.models.unet import init_unet
from sdxl_tpu.pipeline.conditioning import Conditioning
from sdxl_tpu.pipeline.sampler import (
    ddim_timesteps,
    euler_sample_latent,
    expert_cutoff,
    expert_head_steps,
    k_refine_latent,
    k_schedule,
    refine_latent,
    sample_latent,
    scaled_linear_alphas_cumprod,
)

TINY_BASE = DiffuserConfig(
    adm_in_channels=24,
    model_channels=32,
    channel_mults=(1, 2, 4),
    num_head_channels=8,
    transformer_depths=(1, 1, 2),
    context_dim=48,
    is_refiner=False,
)


def _cond(batch=1, h=64, w=64):
    k = jax.random.PRNGKey(9)
    ks = jax.random.split(k, 8)
    return Conditioning(
        unconditional_context_full=jax.random.normal(ks[0], (1, 7, 48)),
        unconditional_context_open_clip=jax.random.normal(ks[1], (1, 7, 32)),
        context_full=jax.random.normal(ks[2], (batch, 7, 48)),
        context_open_clip=jax.random.normal(ks[3], (batch, 7, 32)),
        unconditional_channel_context=jax.random.normal(ks[4], (1, 24)),
        unconditional_channel_context_refiner=jax.random.normal(
            ks[5], (1, 20)),
        channel_context=jax.random.normal(ks[6], (batch, 24)),
        channel_context_refiner=jax.random.normal(ks[7], (batch, 20)),
        resolution=(h, w),
    )


# -- split math ------------------------------------------------------------


def test_expert_cutoff_matches_diffusers_formula():
    # int(round(num_train_timesteps - denoising_end * num_train_timesteps))
    assert expert_cutoff(0.8, 1000) == 200
    assert expert_cutoff(0.75, 1000) == 250
    assert expert_cutoff(0.5, 1000) == 500
    assert expert_cutoff(0.333, 1000) == 667
    for bad in (0.0, 1.0, -0.1, 1.5):
        with pytest.raises(ValueError):
            expert_cutoff(bad, 1000)


def test_expert_head_steps_ddim_grid():
    alphas = jnp.asarray(scaled_linear_alphas_cumprod())
    # DDIM 30-step grid has 31 entries (999 down to 9, step 33)
    head, total = expert_head_steps(alphas, 30, 0.8, "ddim", "linear")
    ts = ddim_timesteps(0, 30, 1000)
    assert total == len(ts) == 31
    assert head == int((ts >= 200).sum())
    # head entries are exactly the >= cutoff prefix, tail the < cutoff rest
    assert ts[head - 1] >= 200 > ts[head]


def test_expert_head_steps_k_grids():
    alphas = jnp.asarray(scaled_linear_alphas_cumprod())
    for schedule in ("linear", "karras", "trailing"):
        head, total = expert_head_steps(alphas, 10, 0.75, "euler", schedule)
        ts, _ = k_schedule(alphas, 0, 10, schedule)
        ts = np.asarray(ts, np.float64)
        assert total == 10
        assert head == int((ts >= 250).sum())
        assert 0 < head < total


def test_expert_head_steps_rejects_degenerate_split():
    alphas = jnp.asarray(scaled_linear_alphas_cumprod())
    with pytest.raises(ValueError, match="no tail"):
        expert_head_steps(alphas, 4, 0.999, "ddim", "linear")
    with pytest.raises(ValueError, match="no head"):
        expert_head_steps(alphas, 4, 0.0001, "euler", "linear")


# -- sampler-level: head + tail == full (memoryless samplers) ---------------


@pytest.fixture(scope="module")
def unet():
    params = init_unet(jax.random.PRNGKey(0), TINY_BASE.unet_config(),
                       jnp.float32)
    alphas = jnp.asarray(scaled_linear_alphas_cumprod())
    return params, alphas


def test_ddim_head_plus_tail_equals_full(unet):
    params, alphas = unet
    cond = _cond()
    k = jax.random.PRNGKey(42)
    n = 6
    full = sample_latent(params, TINY_BASE, alphas, cond, k, 7.5, n,
                         jnp.float32)
    ts = ddim_timesteps(0, n, 1000)
    for h in (1, 3, len(ts) - 1):
        head = sample_latent(params, TINY_BASE, alphas, cond, k, 7.5, n,
                             jnp.float32, head_steps=h)
        tail = refine_latent(
            params, TINY_BASE, alphas, head, cond, jax.random.PRNGKey(99),
            7.5, 0, n, jnp.float32, renoise=False, tail_from=h)
        np.testing.assert_array_equal(np.asarray(tail), np.asarray(full))


@pytest.mark.parametrize("schedule", ["linear", "karras"])
def test_euler_head_plus_tail_equals_full(unet, schedule):
    # Euler is memoryless and the tail is the FULL grid's sigma suffix,
    # so the split composes bitwise even for the karras spacing (which a
    # step_start re-derivation would NOT reproduce)
    params, alphas = unet
    cond = _cond()
    k = jax.random.PRNGKey(7)
    n = 6
    full = euler_sample_latent(params, TINY_BASE, alphas, cond, k, 7.5, n,
                               jnp.float32, method="euler",
                               schedule=schedule)
    h = 3
    head = euler_sample_latent(params, TINY_BASE, alphas, cond, k, 7.5, n,
                               jnp.float32, method="euler",
                               schedule=schedule, head_steps=h)
    tail = k_refine_latent(
        params, TINY_BASE, alphas, head, cond, jax.random.PRNGKey(99),
        7.5, 0, n, jnp.float32, method="euler", schedule=schedule,
        renoise=False, tail_from=h)
    np.testing.assert_array_equal(np.asarray(tail), np.asarray(full))


def test_dpmpp_tail_restarts_multistep_warmup(unet):
    # multistep samplers re-warm up at the boundary (diffusers' refiner
    # enters a FRESH scheduler over the sliced timesteps): the split run
    # is finite and close to — but not bitwise — the one-scan run
    params, alphas = unet
    cond = _cond()
    k = jax.random.PRNGKey(5)
    n = 6
    full = euler_sample_latent(params, TINY_BASE, alphas, cond, k, 7.5, n,
                               jnp.float32, method="dpmpp")
    h = 3
    head = euler_sample_latent(params, TINY_BASE, alphas, cond, k, 7.5, n,
                               jnp.float32, method="dpmpp", head_steps=h)
    tail = k_refine_latent(
        params, TINY_BASE, alphas, head, cond, jax.random.PRNGKey(99),
        7.5, 0, n, jnp.float32, method="dpmpp", renoise=False, tail_from=h)
    assert np.isfinite(np.asarray(tail)).all()
    # same target: the re-warmed tail stays in the full run's neighborhood
    f, t = np.asarray(full), np.asarray(tail)
    assert np.abs(f - t).max() < 0.5 * np.abs(f).max()


def test_head_tail_validation(unet):
    from sdxl_tpu.pipeline.sampler import k_diffuse_latent

    params, alphas = unet
    cond = _cond()
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
    with pytest.raises(ValueError, match="mutually exclusive"):
        k_diffuse_latent(params, TINY_BASE, alphas, lat, cond, 7.5,
                         "euler", 0, 4, jnp.float32, head_steps=1,
                         tail_from=1)
    for bad in (4, 7):
        with pytest.raises(ValueError, match="each side"):
            k_diffuse_latent(params, TINY_BASE, alphas, lat, cond, 7.5,
                             "euler", 0, 4, jnp.float32, head_steps=bad)
        with pytest.raises(ValueError, match="each side"):
            k_diffuse_latent(params, TINY_BASE, alphas, lat, cond, 7.5,
                             "euler", 0, 4, jnp.float32, tail_from=bad)


# -- pipeline-level --------------------------------------------------------


@pytest.fixture(scope="module")
def tiny_pipe_with_refiner(tokenizer_dir):
    from sdxl_tpu.configs import (
        AutoencoderConfig,
        CLIPConfig,
        EmbedderConfig,
    )
    from sdxl_tpu.pipeline.pipeline import random_pipeline

    embedder = EmbedderConfig(
        clip_config=CLIPConfig(
            n_vocab=49408, n_state=32, embed_dim=32, n_head=4, n_ctx=77,
            n_layer=2, quick_gelu=True,
        ),
        open_clip_config=CLIPConfig(
            n_vocab=49408, n_state=32, embed_dim=32, n_head=4, n_ctx=77,
            n_layer=3, quick_gelu=False,
        ),
    )
    diffuser = DiffuserConfig(
        adm_in_channels=32 + 6 * 256,
        model_channels=32,
        channel_mults=(1, 2, 4),
        num_head_channels=8,
        transformer_depths=(1, 1, 2),
        context_dim=64,
        is_refiner=False,
    )
    refiner = DiffuserConfig(
        adm_in_channels=32 + 5 * 256,
        model_channels=32,
        channel_mults=(1, 2, 4, 4),
        num_head_channels=8,
        transformer_depths=(1, 1, 1, 1),
        context_dim=32,
        is_refiner=True,
    )
    vae = AutoencoderConfig(
        encoder_channels=((16, 16), (16, 32), (32, 32), (32, 32)),
        decoder_channels=((32, 32), (32, 32), (32, 16), (16, 16)),
        n_group=4,
    )
    return random_pipeline(
        embedder_cfg=embedder, diffuser_cfg=diffuser, refiner_cfg=refiner,
        vae_cfg=vae, compute_dtype=jnp.float32, param_dtype_unet=jnp.float32,
        tokenizer_dir=tokenizer_dir,
    )


def test_pipeline_denoising_end(tiny_pipe_with_refiner):
    pipe = tiny_pipe_with_refiner
    img = pipe.txt2img("a cat", resolution=(64, 64), n_steps=4, seed=3,
                       use_refiner=True, denoising_end=0.6, sampler="euler")
    assert img.shape == (1, 64, 64, 3)
    assert img.std() > 0
    # deterministic
    img2 = pipe.txt2img("a cat", resolution=(64, 64), n_steps=4, seed=3,
                        use_refiner=True, denoising_end=0.6, sampler="euler")
    np.testing.assert_array_equal(img, img2)
    # the split changes the output vs the re-noise-at-t refiner mode
    img3 = pipe.txt2img("a cat", resolution=(64, 64), n_steps=4, seed=3,
                        use_refiner=True, sampler="euler")
    assert not np.array_equal(img, img3)


def test_pipeline_denoising_end_identity_when_refiner_is_base(
        tiny_pipe_with_refiner):
    # with the refiner literally sharing the base weights/config, the
    # expert split must reproduce the plain single-stage run bitwise
    # (euler is memoryless; the tail continues the same schedule)
    pipe = tiny_pipe_with_refiner
    saved = (pipe.refiner_params, pipe.refiner_cfg, pipe.refiner_alphas)
    try:
        pipe.refiner_params = pipe.unet_params
        pipe.refiner_cfg = pipe.diffuser_cfg
        pipe.refiner_alphas = None
        split = pipe.txt2img("a cat", resolution=(64, 64), n_steps=4, seed=9,
                             use_refiner=True, denoising_end=0.5,
                             sampler="euler")
        plain = pipe.txt2img("a cat", resolution=(64, 64), n_steps=4, seed=9,
                             sampler="euler")
        np.testing.assert_array_equal(split, plain)
    finally:
        (pipe.refiner_params, pipe.refiner_cfg, pipe.refiner_alphas) = saved


def test_pipeline_denoising_end_validation(tiny_pipe_with_refiner):
    pipe = tiny_pipe_with_refiner
    with pytest.raises(ValueError, match="use_refiner"):
        pipe.txt2img("a cat", resolution=(64, 64), n_steps=4,
                     denoising_end=0.8)
    with pytest.raises(ValueError, match="previews|LCM"):
        pipe.txt2img("a cat", resolution=(64, 64), n_steps=4,
                     use_refiner=True, denoising_end=0.8, preview_every=2,
                     preview_callback=lambda *a: None)
