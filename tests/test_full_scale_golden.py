"""Re-verify the committed full-scale golden tensors (opt-in: slow).

The goldens are produced by scripts/full_scale_parity.py, which diffs the
JAX models against functional-PyTorch re-executions at REAL SDXL scale
(32-layer bigG CLIP, 320-channel UNet at 128x128 latent, 512-channel VAE at
1024x1024). This test recomputes only the JAX side and compares against the
committed tensors, catching numeric drift in our stack without re-running
the torch mirror.

Gated behind SDXL_TPU_FULL_SCALE=1 (minutes of CPU per part); the committed
goldens/full_scale/report.json is always validated for recorded parity.
"""

import json
import os

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(
    os.path.dirname(__file__), "..", "goldens", "full_scale"
)

FULL = os.environ.get("SDXL_TPU_FULL_SCALE") == "1"


def _golden(name):
    path = os.path.join(GOLDEN_DIR, name)
    if not os.path.exists(path):
        pytest.skip(f"golden {name} not generated yet")
    return np.load(path)


def test_recorded_parity_report_is_green():
    path = os.path.join(GOLDEN_DIR, "report.json")
    if not os.path.exists(path):
        pytest.skip("full-scale parity report not generated yet")
    with open(path) as f:
        report = json.load(f)
    assert report, "empty parity report"
    for part, rec in report.items():
        assert rec["ok"], f"{part}: max_abs_diff {rec['max_abs_diff']} " \
                          f">= tolerance {rec['tolerance']}"
        assert rec["max_abs_diff"] < rec["tolerance"]


@pytest.mark.skipif(not FULL, reason="set SDXL_TPU_FULL_SCALE=1 (slow)")
def test_clip_golden_reproduces():
    import jax.numpy as jnp
    import jax

    from sdxl_tpu.configs import OPEN_CLIP_BIGG_CONFIG
    from sdxl_tpu.models.clip import clip_hidden_pooled, init_clip

    g = _golden("clip.npz")
    cfg = OPEN_CLIP_BIGG_CONFIG
    params = init_clip(jax.random.PRNGKey(0), cfg)
    hidden, pooled = clip_hidden_pooled(
        params, cfg, jnp.asarray(g["tokens"]), cfg.n_layer - 1
    )
    np.testing.assert_allclose(np.asarray(hidden), g["hidden"], atol=1e-5)
    np.testing.assert_allclose(np.asarray(pooled), g["pooled"], atol=1e-5)


@pytest.mark.skipif(not FULL, reason="set SDXL_TPU_FULL_SCALE=1 (slow)")
def test_unet_golden_reproduces():
    import jax
    import jax.numpy as jnp

    from sdxl_tpu.configs import SDXL_BASE_DIFFUSER
    from sdxl_tpu.models.unet import init_unet, unet_forward

    g = _golden("unet.npz")
    cfg = SDXL_BASE_DIFFUSER.unet_config()
    params = init_unet(jax.random.PRNGKey(1), cfg, jnp.float32)
    ks = jax.random.split(jax.random.PRNGKey(17), 3)
    x = jnp.asarray(g["x"])
    t = jnp.asarray(g["t"])
    ctx = jax.random.normal(ks[1], (1, 77, 2048), jnp.float32) * 0.5
    np.testing.assert_allclose(
        np.asarray(ctx[:, :, :8]), g["ctx_fingerprint"], atol=0
    )
    label = jax.random.normal(ks[2], (1, 2816), jnp.float32) * 0.5
    eps = unet_forward(params, cfg, x, t, ctx, label)
    np.testing.assert_allclose(np.asarray(eps), g["eps"], atol=1e-4)


@pytest.mark.skipif(not FULL, reason="set SDXL_TPU_FULL_SCALE=1 (slow)")
def test_vae_decode_golden_reproduces():
    import jax
    import jax.numpy as jnp

    from sdxl_tpu.configs import AutoencoderConfig
    from sdxl_tpu.models.vae import decode_latent, init_autoencoder

    g = _golden("vae_decode.npz")
    cfg = AutoencoderConfig()
    params = init_autoencoder(jax.random.PRNGKey(2), cfg)
    img = np.asarray(decode_latent(params, cfg, jnp.asarray(g["latent"])))
    np.testing.assert_allclose(
        img[:, 384:640, 384:640, :], g["image_crop"], atol=1e-4
    )
    assert abs(img.mean() - float(g["image_mean"])) < 1e-4
    assert abs(img.std() - float(g["image_std"])) < 1e-4


@pytest.mark.skipif(not FULL, reason="set SDXL_TPU_FULL_SCALE=1 (slow)")
def test_sd2_clip_golden_reproduces():
    import jax
    import jax.numpy as jnp

    from sdxl_tpu.configs import OPEN_CLIP_VITH_CONFIG
    from sdxl_tpu.models.clip import clip_hidden, init_clip

    g = _golden("sd2_clip.npz")
    cfg = OPEN_CLIP_VITH_CONFIG
    params = init_clip(jax.random.PRNGKey(4), cfg)
    hidden = clip_hidden(params, cfg, jnp.asarray(g["tokens"]), cfg.n_layer - 1)
    np.testing.assert_allclose(np.asarray(hidden), g["hidden"], atol=1e-5)


@pytest.mark.skipif(not FULL, reason="set SDXL_TPU_FULL_SCALE=1 (slow)")
def test_sd1_unet_golden_reproduces():
    import jax
    import jax.numpy as jnp

    from sdxl_tpu.configs import SD15_DIFFUSER
    from sdxl_tpu.models.unet import init_unet, unet_forward

    g = _golden("sd1_unet.npz")
    cfg = SD15_DIFFUSER.unet_config()
    params = init_unet(jax.random.PRNGKey(5), cfg, jnp.float32)
    ks = jax.random.split(jax.random.PRNGKey(19), 2)
    ctx = jax.random.normal(ks[1], (1, 77, 768), jnp.float32) * 0.5
    np.testing.assert_allclose(
        np.asarray(ctx[:, :, :8]), g["ctx_fingerprint"], atol=0
    )
    raw = unet_forward(
        params, cfg, jnp.asarray(g["x"]), jnp.asarray(g["t"]), ctx, None
    )
    np.testing.assert_allclose(np.asarray(raw), g["raw"], atol=1e-4)


def test_sd1_v_prediction_golden_identity():
    """The committed v->eps conversion golden must satisfy the closed form
    eps = sqrt(a)*v + sqrt(1-a)*x exactly (fast; not env-gated)."""
    g = _golden("sd1_unet.npz")
    a = float(g["alpha_t"])
    want = np.sqrt(a) * g["raw"] + np.sqrt(1.0 - a) * g["x"]
    np.testing.assert_allclose(g["v_eps"], want, atol=1e-6)
