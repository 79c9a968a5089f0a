"""SD3 family: flow-matching scheduler goldens + MMDiT sampling loop.

Schedule/step/noising math is pinned against a literal torch
transcription of diffusers' FlowMatchEulerDiscreteScheduler
(scripts/gen_fm_goldens.py -> goldens/k_samplers/fm_goldens.npz).
"""

import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdxl_tpu.models.mmdit import init_mmdit
from sdxl_tpu.pipeline.flow_match import (
    fm_add_noise,
    fm_diffuse_latent,
    fm_schedule,
    fm_window,
)
from tests.test_mmdit import TINY

GOLDENS = (
    pathlib.Path(__file__).resolve().parent.parent
    / "goldens"
    / "k_samplers"
    / "fm_goldens.npz"
)


@pytest.fixture(scope="module")
def g():
    return np.load(GOLDENS)


def synth_model(x, t):
    # must match scripts/gen_fm_goldens.py::synth_model
    return np.cos(x * 1.3) * 0.7 - 0.2 * x * t / 1000.0


def test_fm_schedule_matches_transcription(g):
    ts, sig = fm_schedule(8, shift=3.0)
    np.testing.assert_allclose(ts, g["ts8"], rtol=1e-6)
    np.testing.assert_allclose(sig, g["sig8"], rtol=1e-6, atol=1e-8)
    ts5, sig5 = fm_schedule(4, shift=5.0)
    np.testing.assert_allclose(ts5, g["ts4_s5"], rtol=1e-6)
    np.testing.assert_allclose(sig5, g["sig4_s5"], rtol=1e-6, atol=1e-8)
    # sigma_max = 1 is a fixed point of the shift: pure noise at the start
    assert sig[0] == 1.0 and sig[-1] == 0.0


def test_fm_trajectory_matches_transcription(g):
    ts, sig = fm_schedule(8, shift=3.0)
    x = g["x0"].copy()
    traj = [x.copy()]
    for i in range(8):
        v = synth_model(x, float(ts[i]))
        x = x + (sig[i + 1] - sig[i]) * v
        traj.append(x.copy())
    np.testing.assert_allclose(np.stack(traj), g["traj"], rtol=2e-5,
                               atol=1e-6)
    np.testing.assert_allclose(x, g["final"], rtol=2e-5, atol=1e-6)


def test_fm_add_noise_matches_transcription(g):
    out = fm_add_noise(jnp.asarray(g["clean"]), jnp.asarray(g["nz"]),
                       float(g["noised_sigma"]))
    np.testing.assert_allclose(np.asarray(out), g["noised"], rtol=1e-6,
                               atol=1e-7)


def test_fm_window():
    assert fm_window(28, 1.0) == 0
    assert fm_window(28, 0.5) == 14
    assert fm_window(10, 0.34) == 7
    assert fm_window(10, 0.0) == 10  # degenerate: zero steps run


def test_fm_diffuse_latent_e2e():
    params = init_mmdit(jax.random.PRNGKey(0), TINY, jnp.float32)
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 16))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 11, 48))  # [u | c]
    pooled = jax.random.normal(jax.random.PRNGKey(3), (2, 40))
    out = fm_diffuse_latent(params, TINY, lat.copy(), ctx, pooled, 5.0,
                            n_steps=4, compute_dtype=jnp.float32)
    assert out.shape == (1, 8, 8, 16)
    assert np.isfinite(np.asarray(out)).all()
    out2 = fm_diffuse_latent(params, TINY, lat.copy(), ctx, pooled, 5.0,
                             n_steps=4, compute_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))

    # gs=1 CFG == cond-only path (u + (c-u)*1 == c), up to f32 rounding
    cond_only = fm_diffuse_latent(params, TINY, lat.copy(), ctx[1:],
                                  pooled[1:], 1.0, n_steps=4,
                                  compute_dtype=jnp.float32, use_cfg=False)
    cfg1 = fm_diffuse_latent(params, TINY, lat.copy(), ctx, pooled, 1.0,
                             n_steps=4, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(cfg1), np.asarray(cond_only),
                               rtol=1e-4, atol=1e-5)

    # img2img window: start_index > 0 runs the schedule tail
    tail = fm_diffuse_latent(params, TINY, lat.copy(), ctx, pooled, 5.0,
                             n_steps=4, compute_dtype=jnp.float32,
                             start_index=2)
    assert np.isfinite(np.asarray(tail)).all()
    assert not np.allclose(np.asarray(tail), np.asarray(out))


def test_fm_pin_blending_identities():
    """The SD3 inpaint pin (diffusers SD3InpaintPipeline blending):
    mask=0 returns the reference EXACTLY (the final step's sigma'=0 makes
    proper == x0), mask=1 is arithmetically the unpinned run, and a
    partial mask pins exactly inside its zero region."""
    params = init_mmdit(jax.random.PRNGKey(0), TINY, jnp.float32)
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 16))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 11, 48))
    pooled = jax.random.normal(jax.random.PRNGKey(3), (2, 40))
    ref = jax.random.normal(jax.random.PRNGKey(4), (1, 8, 8, 16))
    noise = jax.random.normal(jax.random.PRNGKey(5), (1, 8, 8, 16))
    kw = dict(n_steps=4, compute_dtype=jnp.float32)

    plain = np.asarray(fm_diffuse_latent(params, TINY, lat.copy(), ctx,
                                         pooled, 5.0, **kw))

    m0 = jnp.zeros((1, 8, 8, 1), jnp.float32)
    out0 = fm_diffuse_latent(params, TINY, lat.copy(), ctx, pooled, 5.0,
                             pin_reference=ref, pin_mask=m0,
                             pin_noise=noise, **kw)
    np.testing.assert_array_equal(np.asarray(out0), np.asarray(ref))

    m1 = jnp.ones((1, 8, 8, 1), jnp.float32)
    out1 = fm_diffuse_latent(params, TINY, lat.copy(), ctx, pooled, 5.0,
                             pin_reference=ref, pin_mask=m1,
                             pin_noise=noise, **kw)
    np.testing.assert_allclose(np.asarray(out1), plain, rtol=1e-5,
                               atol=1e-6)

    mh = jnp.zeros((1, 8, 8, 1), jnp.float32).at[:, :4].set(1.0)
    outh = np.asarray(fm_diffuse_latent(params, TINY, lat.copy(), ctx,
                                        pooled, 5.0, pin_reference=ref,
                                        pin_mask=mh, pin_noise=noise, **kw))
    np.testing.assert_array_equal(outh[:, 4:], np.asarray(ref)[:, 4:])
    assert not np.allclose(outh[:, :4], np.asarray(ref)[:, :4])


def test_slg_identities_and_transcription():
    """Skip-layer guidance: slg_scale=0 with a layer set is bit-exact to
    the plain run (v + 0*(vc - v_skip) == v); empty slg_layers builds no
    perturbed branch; and the scan matches a literal per-step Python
    transcription of the diffusers gate (i > n*start and i < n*stop,
    cond-only context, skip_layers forward)."""
    from sdxl_tpu.models.mmdit import mmdit_forward

    params = init_mmdit(jax.random.PRNGKey(0), TINY, jnp.float32)
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 16))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 11, 48))
    pooled = jax.random.normal(jax.random.PRNGKey(3), (2, 40))
    kw = dict(n_steps=4, compute_dtype=jnp.float32)
    gs, slg = 5.0, 2.8

    plain = np.asarray(fm_diffuse_latent(params, TINY, lat.copy(), ctx,
                                         pooled, gs, **kw))
    # model level: skipping a block changes the output; none skipped == id
    v_all = mmdit_forward(params, TINY, lat, jnp.zeros((1,)), ctx[1:],
                          pooled[1:])
    v_same = mmdit_forward(params, TINY, lat, jnp.zeros((1,)), ctx[1:],
                           pooled[1:], skip_layers=())
    np.testing.assert_array_equal(np.asarray(v_all), np.asarray(v_same))
    v_skip = mmdit_forward(params, TINY, lat, jnp.zeros((1,)), ctx[1:],
                           pooled[1:], skip_layers=(1,))
    assert not np.allclose(np.asarray(v_skip), np.asarray(v_all))

    zero = fm_diffuse_latent(params, TINY, lat.copy(), ctx, pooled, gs,
                             slg_scale=0.0, slg_layers=(1,), slg_start=0.0,
                             slg_stop=1.0, **kw)
    np.testing.assert_array_equal(np.asarray(zero), plain)
    noop = fm_diffuse_latent(params, TINY, lat.copy(), ctx, pooled, gs,
                             slg_scale=slg, slg_layers=(), **kw)
    np.testing.assert_array_equal(np.asarray(noop), plain)

    out = np.asarray(fm_diffuse_latent(
        params, TINY, lat.copy(), ctx, pooled, gs, slg_scale=slg,
        slg_layers=(1,), slg_start=0.0, slg_stop=1.0, **kw))

    # literal transcription of the public loop
    n = 4
    ts, sigmas = fm_schedule(n, 3.0)
    x = np.asarray(lat, np.float32)
    for i in range(n):
        t_vec = jnp.full((2,), float(ts[i]), jnp.float32)
        v2 = np.asarray(mmdit_forward(
            params, TINY, jnp.concatenate([x, x], 0), t_vec, ctx, pooled))
        vu, vc = v2[:1], v2[1:]
        v = vu + (vc - vu) * gs
        if i > n * 0.0 and i < n * 1.0:
            vs = np.asarray(mmdit_forward(
                params, TINY, jnp.asarray(x), t_vec[:1], ctx[1:],
                pooled[1:], skip_layers=(1,)))
            v = v + (vc - vs) * slg
        x = x + (sigmas[i + 1] - sigmas[i]) * v
    np.testing.assert_allclose(out, x, rtol=1e-4, atol=1e-5)
    assert not np.allclose(out, plain)

    with pytest.raises(ValueError, match="CFG"):
        fm_diffuse_latent(params, TINY, lat.copy(), ctx[1:], pooled[1:],
                          gs, use_cfg=False, slg_scale=slg,
                          slg_layers=(1,), **kw)
