"""FreeU (arXiv:2309.11497) decoder rebalancing.

The fourier filter is pinned against a literal torch transcription of the
official implementation (github.com/ChenyangSi/FreeU, the same code
diffusers ships as fourier_filter); the UNet wiring is checked by
identity ((1,1,1,1) == off) and effect (defaults != off) tests.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from sdxl_tpu.configs import FREEU_DEFAULTS, parse_freeu_spec
from sdxl_tpu.models.unet import freeu_fourier_filter, init_unet, unet_forward
from tests.test_sampler import TINY_BASE


def _torch_fourier_filter(x_nchw, threshold, scale):
    """Literal transcription of the official FreeU fourier_filter."""
    import torch

    x = torch.as_tensor(x_nchw)
    x_freq = torch.fft.fftn(x, dim=(-2, -1))
    x_freq = torch.fft.fftshift(x_freq, dim=(-2, -1))
    B, C, H, W = x_freq.shape
    mask = torch.ones((B, C, H, W), dtype=x.dtype)
    crow, ccol = H // 2, W // 2
    mask[
        ...,
        crow - threshold : crow + threshold,
        ccol - threshold : ccol + threshold,
    ] = scale
    x_freq = x_freq * mask
    x_freq = torch.fft.ifftshift(x_freq, dim=(-2, -1))
    return torch.fft.ifftn(x_freq, dim=(-2, -1)).real.numpy()


def test_fourier_filter_matches_official_transcription():
    rng = np.random.default_rng(0)
    # even and odd spatial dims pin the fftshift index conventions
    for h, w in ((8, 8), (7, 5), (6, 10)):
        x = rng.standard_normal((2, h, w, 3)).astype(np.float32)
        ours = freeu_fourier_filter(jnp.asarray(x), 1, 0.2)
        ref = _torch_fourier_filter(
            np.transpose(x, (0, 3, 1, 2)), 1, 0.2
        ).transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5,
                                   atol=1e-5)


def test_fourier_filter_scale_one_is_identity():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
    out = freeu_fourier_filter(jnp.asarray(x), 1, 1.0)
    np.testing.assert_allclose(np.asarray(out), x, rtol=1e-5, atol=1e-5)


def _tiny_forward(freeu):
    cfg = dataclasses.replace(TINY_BASE, freeu=freeu).unet_config()
    params = init_unet(jax.random.PRNGKey(0), cfg, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4), jnp.float32)
    t = jnp.full((1,), 500.0, jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 7, 48), jnp.float32)
    label = jax.random.normal(jax.random.PRNGKey(3), (1, 24), jnp.float32)
    return np.asarray(unet_forward(params, cfg, x, t, ctx, label))


def test_unit_freeu_params_match_off():
    """(b=1, s=1) must reproduce the untouched decoder (up to FFT
    round-trip noise) — pins that the filter and the half-channel boost
    are wired multiplicatively and nowhere else."""
    off = _tiny_forward(None)
    unit = _tiny_forward((1.0, 1.0, 1.0, 1.0))
    np.testing.assert_allclose(unit, off, rtol=1e-4, atol=1e-5)


def test_freeu_defaults_change_output():
    off = _tiny_forward(None)
    on = _tiny_forward(FREEU_DEFAULTS["sdxl"])
    assert np.isfinite(on).all()
    assert not np.allclose(on, off)


def test_freeu_cfg_roundtrip(tmp_path):
    from sdxl_tpu.configs import DiffuserConfig, load_cfg, save_cfg

    cfg = dataclasses.replace(TINY_BASE, freeu=(1.3, 1.4, 0.9, 0.2))
    path = str(tmp_path / "d.cfg")
    save_cfg(path, cfg)
    back = load_cfg(path, DiffuserConfig)
    assert back.freeu == (1.3, 1.4, 0.9, 0.2)
    assert back == cfg
    # reference .cfg files (no freeu key) load with freeu=None
    save_cfg(path, TINY_BASE)
    assert load_cfg(path, DiffuserConfig).freeu is None


def test_parse_freeu_spec():
    import pytest

    assert parse_freeu_spec("auto", "sdxl") == FREEU_DEFAULTS["sdxl"]
    assert parse_freeu_spec("1,2,0.5,0.1", "sd1") == (1.0, 2.0, 0.5, 0.1)
    with pytest.raises(ValueError):
        parse_freeu_spec("1,2,3", "sdxl")
