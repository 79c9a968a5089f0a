"""Align-Your-Steps schedule (arXiv:2404.14507).

The 10-step sigma tables are the paper's published constants (they ARE
the data, like the Karras formula or the RESOLUTIONS buckets); these
tests pin the tables, the log-linear retargeting, the schedule plumbing
(fractional timesteps, init-noise scale, img2img windowing), and an
end-to-end tiny run.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdxl_tpu.models.unet import init_unet
from sdxl_tpu.pipeline.sampler import (
    AYS_SIGMAS_SD15,
    AYS_SIGMAS_SDXL,
    ays_sigmas,
    euler_sample_latent,
    k_refine_latent,
    k_schedule,
    k_sigma_max,
    scaled_linear_alphas_cumprod,
)
from tests.test_sampler import TINY_BASE, _cond


def test_ays_10_is_the_published_table():
    np.testing.assert_allclose(ays_sigmas(10, "sdxl"), AYS_SIGMAS_SDXL,
                               rtol=1e-6)
    np.testing.assert_allclose(ays_sigmas(10, "sd15"), AYS_SIGMAS_SD15,
                               rtol=1e-6)
    # both start at the SD sigma_max the families share
    assert abs(AYS_SIGMAS_SDXL[0] - 14.615) < 1e-6
    assert AYS_SIGMAS_SDXL[0] == AYS_SIGMAS_SD15[0]


def test_ays_retarget_loglinear():
    for n in (5, 14, 20):
        s = ays_sigmas(n, "sdxl")
        assert s.shape == (n,)
        assert np.all(np.diff(s) < 0)  # strictly descending
        # endpoints preserved exactly by the unit-ramp interpolation
        np.testing.assert_allclose(s[0], AYS_SIGMAS_SDXL[0], rtol=1e-6)
        np.testing.assert_allclose(s[-1], AYS_SIGMAS_SDXL[-1], rtol=1e-6)
    # n=19 hits the 10 original knots at every other point (unit ramp):
    s19 = ays_sigmas(19, "sdxl")
    np.testing.assert_allclose(s19[::2], AYS_SIGMAS_SDXL, rtol=1e-5)


def test_ays_schedule_plumbing():
    alphas = jnp.asarray(scaled_linear_alphas_cumprod())
    ts, sigmas = k_schedule(alphas, 0, 10, "ays")
    np.testing.assert_allclose(np.asarray(sigmas[:-1]), AYS_SIGMAS_SDXL,
                               rtol=1e-6)
    assert float(sigmas[-1]) == 0.0
    t = np.asarray(ts)
    assert t.shape == (10,) and np.all(np.diff(t) < 0)
    assert 0.0 <= t[-1] and t[0] <= 999.0
    # init-noise scale must equal the scan's first sigma (the AYS top
    # value 14.615, NOT the table's sigma(999) = 14.6146)
    np.testing.assert_allclose(float(k_sigma_max(alphas, 10, "ays")),
                               14.615, rtol=1e-6)
    # sd15 variant differs in the interior
    _, s2 = k_schedule(alphas, 0, 10, "ays_sd15")
    assert not np.allclose(np.asarray(s2[:-1]), AYS_SIGMAS_SDXL)


def test_ays_img2img_window():
    """step_start windows the AYS schedule to sigmas at or below the
    handoff noise level, like k_timesteps slices the linear grid."""
    alphas = jnp.asarray(scaled_linear_alphas_cumprod())
    # strength 0.3 -> step_start 700 -> t_hi 299
    a = np.asarray(alphas, dtype=np.float64)
    bound = np.sqrt((1 - a[299]) / a[299])
    ts, sigmas = k_schedule(alphas, 700, 10, "ays")
    sig = np.asarray(sigmas[:-1])
    assert np.all(sig <= bound + 1e-6)
    assert len(sig) >= 1
    expected = np.asarray(ays_sigmas(10, "sdxl"))
    expected = expected[expected <= bound]
    np.testing.assert_allclose(sig, expected, rtol=1e-6)
    # degenerate window still yields one step
    _, s1 = k_schedule(alphas, 999, 10, "ays")
    assert s1.shape[0] == 2


def test_ays_e2e_tiny():
    params = init_unet(jax.random.PRNGKey(0), TINY_BASE.unet_config(),
                       jnp.float32)
    alphas = jnp.asarray(scaled_linear_alphas_cumprod())
    cond = _cond()
    k = jax.random.PRNGKey(1)
    lat_ays = euler_sample_latent(params, TINY_BASE, alphas, cond, k, 5.0,
                                  10, jnp.float32, method="dpmpp",
                                  schedule="ays")
    assert np.isfinite(np.asarray(lat_ays)).all()
    lat_lin = euler_sample_latent(params, TINY_BASE, alphas, cond, k, 5.0,
                                  10, jnp.float32, method="dpmpp",
                                  schedule="linear")
    assert not np.allclose(np.asarray(lat_ays), np.asarray(lat_lin))
    # refine path (img2img tail) runs and stays finite
    out = k_refine_latent(params, TINY_BASE, alphas, lat_ays, cond,
                          jax.random.PRNGKey(2), 5.0, step_start=700,
                          n_steps=10, compute_dtype=jnp.float32,
                          method="euler", schedule="ays")
    assert np.isfinite(np.asarray(out)).all()


def test_ays_rejected_for_ddim_and_lcm(tokenizer_dir):
    from sdxl_tpu.pipeline.pipeline import random_pipeline
    from tests.test_pipeline_e2e import TINY_DIFFUSER, TINY_EMBEDDER, TINY_VAE

    pipe = random_pipeline(
        embedder_cfg=TINY_EMBEDDER, diffuser_cfg=TINY_DIFFUSER,
        vae_cfg=TINY_VAE, compute_dtype=jnp.float32,
        tokenizer_dir=tokenizer_dir,
    )
    with pytest.raises(ValueError, match="schedule"):
        pipe.txt2img(["x"], resolution=(64, 64), n_steps=2,
                     sampler="ddim", schedule="ays")
    img = pipe.txt2img(["x"], resolution=(64, 64), n_steps=4,
                       sampler="euler", schedule="ays", seed=1)
    assert img.shape == (1, 64, 64, 3)


def test_sd1_pipeline_maps_ays_to_family_table():
    from sdxl_tpu.pipeline.pipeline import SDXLPipeline
    from sdxl_tpu.pipeline.sd1 import SD1Pipeline

    assert SDXLPipeline._ays_variant == "ays"
    assert SD1Pipeline._ays_variant == "ays_sd15"
    assert SDXLPipeline._resolve_schedule(SDXLPipeline, "karras") == "karras"
    assert SD1Pipeline._resolve_schedule(SD1Pipeline, "ays") == "ays_sd15"
