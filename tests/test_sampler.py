"""DDIM sampler semantics tests (tiny UNet)."""

import jax
import jax.numpy as jnp
import numpy as np

from sdxl_tpu.configs import DiffuserConfig
from sdxl_tpu.models.unet import init_unet
from sdxl_tpu.pipeline.conditioning import Conditioning
from sdxl_tpu.pipeline.sampler import (
    ddim_timesteps,
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
    context_dim=48,  # 16 clip + 32 open_clip
    is_refiner=False,
)

TINY_REFINER = DiffuserConfig(
    adm_in_channels=20,
    model_channels=32,
    channel_mults=(1, 2, 4),
    num_head_channels=8,
    transformer_depths=(1, 1, 2),
    context_dim=32,
    is_refiner=True,
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
        unconditional_channel_context_refiner=jax.random.normal(ks[5], (1, 20)),
        channel_context=jax.random.normal(ks[6], (batch, 24)),
        channel_context_refiner=jax.random.normal(ks[7], (batch, 20)),
        resolution=(h, w),
    )


def test_timestep_schedule_matches_reference_iteration():
    # (0..1000).rev().step_by(33) -> 31 iterations, 999 down to 9
    ts = ddim_timesteps(0, 30)
    assert ts[0] == 999 and ts[-1] == 9 and len(ts) == 31
    # refiner window: (0..200).rev().step_by(33) -> 199 down to 1
    ts = ddim_timesteps(800, 30)
    assert ts[0] == 199 and ts[-1] == 1 and len(ts) == 7
    # even divisor: exactly n steps
    assert len(ddim_timesteps(0, 10)) == 10


def test_scaled_linear_schedule_endpoints():
    a = scaled_linear_alphas_cumprod()
    assert a.shape == (1000,)
    np.testing.assert_allclose(a[0], 1.0 - 0.00085, rtol=1e-6)
    assert 0.0 < a[-1] < 0.01  # ᾱ_999 is tiny
    assert np.all(np.diff(a) < 0)


def test_sample_latent_deterministic_and_shaped():
    params = init_unet(jax.random.PRNGKey(0), TINY_BASE.unet_config(), jnp.float32)
    alphas = jnp.asarray(scaled_linear_alphas_cumprod())
    cond = _cond()
    k = jax.random.PRNGKey(42)
    lat1 = sample_latent(params, TINY_BASE, alphas, cond, k, 7.5, 4, jnp.float32)
    lat2 = sample_latent(params, TINY_BASE, alphas, cond, k, 7.5, 4, jnp.float32)
    assert lat1.shape == (1, 8, 8, 4)
    np.testing.assert_array_equal(np.asarray(lat1), np.asarray(lat2))
    lat3 = sample_latent(
        params, TINY_BASE, alphas, cond, jax.random.PRNGKey(43), 7.5, 4, jnp.float32
    )
    assert not np.allclose(np.asarray(lat1), np.asarray(lat3))


def test_guidance_scale_changes_output():
    params = init_unet(jax.random.PRNGKey(0), TINY_BASE.unet_config(), jnp.float32)
    alphas = jnp.asarray(scaled_linear_alphas_cumprod())
    cond = _cond()
    k = jax.random.PRNGKey(1)
    a = sample_latent(params, TINY_BASE, alphas, cond, k, 1.0, 2, jnp.float32)
    b = sample_latent(params, TINY_BASE, alphas, cond, k, 7.5, 2, jnp.float32)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_refiner_runs_without_uncond():
    params = init_unet(jax.random.PRNGKey(2), TINY_REFINER.unet_config(), jnp.float32)
    alphas = jnp.asarray(scaled_linear_alphas_cumprod())
    cond = _cond()
    latent = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 4))
    out = refine_latent(
        params, TINY_REFINER, alphas, latent, cond, jax.random.PRNGKey(4),
        7.5, 800, 4, jnp.float32,
    )
    assert out.shape == latent.shape
    assert np.isfinite(np.asarray(out)).all()


def test_inpainting_pins_unmasked_region():
    """mask=False region must track the reference latent, not free-run."""
    params = init_unet(jax.random.PRNGKey(0), TINY_BASE.unet_config(), jnp.float32)
    alphas = jnp.asarray(scaled_linear_alphas_cumprod())
    cond = _cond()
    ref = jax.random.normal(jax.random.PRNGKey(5), (1, 8, 8, 4)) * 0.1

    mask = jnp.zeros((1, 8, 8, 4), bool).at[:, :, :4, :].set(True)
    k = jax.random.PRNGKey(6)
    with_mask = sample_latent(
        params, TINY_BASE, alphas, cond, k, 7.5, 4, jnp.float32,
        reference=ref, mask=mask,
    )
    free = sample_latent(params, TINY_BASE, alphas, cond, k, 7.5, 4, jnp.float32)
    assert with_mask.shape == free.shape
    # inpainted result differs from the free-running sample
    assert not np.allclose(np.asarray(with_mask), np.asarray(free))
    assert np.isfinite(np.asarray(with_mask)).all()


def test_batched_prompts():
    params = init_unet(jax.random.PRNGKey(0), TINY_BASE.unet_config(), jnp.float32)
    alphas = jnp.asarray(scaled_linear_alphas_cumprod())
    cond = _cond(batch=3)
    out = sample_latent(
        params, TINY_BASE, alphas, cond, jax.random.PRNGKey(0), 7.5, 2, jnp.float32
    )
    assert out.shape == (3, 8, 8, 4)


def test_config_n_steps_honored():
    """DiffuserConfig.n_steps must govern the DDPM table length: a .cfg with
    a 500-entry table runs, a mismatched table is a clear error."""
    import pytest

    cfg500 = DiffuserConfig(
        adm_in_channels=24, model_channels=32, channel_mults=(1, 2, 4),
        num_head_channels=8, transformer_depths=(1, 1, 2), context_dim=48,
        is_refiner=False, n_steps=500,
    )
    params = init_unet(jax.random.PRNGKey(0), cfg500.unet_config(), jnp.float32)
    cond = _cond()
    alphas500 = jnp.asarray(scaled_linear_alphas_cumprod(500))
    lat = sample_latent(
        params, cfg500, alphas500, cond, jax.random.PRNGKey(1), 7.5, 4,
        jnp.float32,
    )
    assert lat.shape == (1, 8, 8, 4)
    # schedule derived from the 500-table: 499, 374, 249, 124 (125 divides
    # 500 exactly, so no 31-iterations quirk here)
    ts = ddim_timesteps(0, 4, 500)
    assert list(ts) == [499, 374, 249, 124]

    alphas1000 = jnp.asarray(scaled_linear_alphas_cumprod(1000))
    with pytest.raises(ValueError, match="does not match"):
        sample_latent(
            params, cfg500, alphas1000, cond, jax.random.PRNGKey(1), 7.5, 4,
            jnp.float32,
        )
