"""HBM budget accounting + auto refiner stage-scoping (VERDICT r2 #8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdxl_tpu.configs import SDXL_BASE_DIFFUSER
from sdxl_tpu.utils.memory import (
    hbm_budget_bytes,
    param_bytes,
    plan_refiner_mode,
    tree_is_on_host,
    tree_to_device,
    tree_to_host,
    unet_scan_workspace_bytes,
    vae_decode_workspace_bytes,
)

GB = 1 << 30


def test_param_bytes_exact():
    tree = {"a": jnp.zeros((4, 8), jnp.float32),
            "b": [jnp.zeros((3,), jnp.bfloat16), None]}
    assert param_bytes(tree) == 4 * 8 * 4 + 3 * 2
    assert param_bytes(None) == 0


def test_unet_workspace_estimate_calibration():
    """SDXL-base at 1024^2 (128x128 latent), CFG pair, bf16: the measured
    scan workspace is ~5-6 GB (docs/ARCHITECTURE.md perf notes); the
    estimator must land within the planning margin."""
    est = unet_scan_workspace_bytes(
        SDXL_BASE_DIFFUSER, 1, (128, 128), jnp.bfloat16
    )
    assert 3 * GB < est < 9 * GB, est / GB
    # refiner configs skip the CFG doubling
    from sdxl_tpu.configs import SDXL_REFINER_DIFFUSER

    est_r = unet_scan_workspace_bytes(
        SDXL_REFINER_DIFFUSER, 1, (128, 128), jnp.bfloat16
    )
    assert est_r < est


def test_vae_workspace_estimate():
    # ~0.5 GB/image f32 at 1024^2 (pipeline.vae_decode_chunk comment)
    est = vae_decode_workspace_bytes((1024, 1024), 1, jnp.float32)
    assert 0.3 * GB < est < 1.0 * GB


def test_hbm_budget_env_override(monkeypatch):
    monkeypatch.setenv("SDXL_TPU_HBM_GB", "10")
    assert abs(hbm_budget_bytes() - int(10 * GB * 0.9)) < GB // 100
    monkeypatch.delenv("SDXL_TPU_HBM_GB")
    assert hbm_budget_bytes() > 0


def test_tree_host_device_roundtrip():
    tree = {"w": jnp.arange(12, dtype=jnp.float32).reshape(3, 4)}
    host = tree_to_host(tree)
    assert isinstance(host["w"], np.ndarray)
    assert tree_is_on_host(host)
    back = tree_to_device(host)
    np.testing.assert_array_equal(np.asarray(back["w"]), host["w"])


@pytest.fixture(scope="module")
def refiner_pipe():
    from sdxl_tpu.pipeline.pipeline import random_pipeline
    from tests.test_pipeline_e2e import (
        TINY_DIFFUSER,
        TINY_EMBEDDER,
        TINY_REFINER,
        TINY_VAE,
    )

    return random_pipeline(
        embedder_cfg=TINY_EMBEDDER, diffuser_cfg=TINY_DIFFUSER,
        refiner_cfg=TINY_REFINER, vae_cfg=TINY_VAE,
        compute_dtype=jnp.float32, param_dtype_unet=jnp.float32,
        tokenizer_dir=None,
    )


def test_plan_refiner_mode_budget_decides(refiner_pipe, monkeypatch):
    monkeypatch.setenv("SDXL_TPU_HBM_GB", "1000")
    mode, reason = plan_refiner_mode(refiner_pipe, (64, 64), 1)
    assert mode == "resident" and "fits" in reason
    monkeypatch.setenv("SDXL_TPU_HBM_GB", "0.0001")
    mode, reason = plan_refiner_mode(refiner_pipe, (64, 64), 1)
    assert mode == "scoped" and "exceeds" in reason


def test_scoped_two_stage_matches_resident(refiner_pipe, monkeypatch):
    """Auto stage-scoping must not change the image: a scoped run (host
    round-trip of both UNets) equals the resident run bit for bit."""
    kw = dict(resolution=(64, 64), n_steps=2, seed=7, use_refiner=True,
              refiner_step_start=500)
    monkeypatch.setenv("SDXL_TPU_HBM_GB", "1000")
    resident = refiner_pipe.txt2img(["a crab"], **kw)
    assert not tree_is_on_host(refiner_pipe.unet_params)

    monkeypatch.setenv("SDXL_TPU_HBM_GB", "0.0001")
    scoped = refiner_pipe.txt2img(["a crab"], **kw)
    # after the scoped run the base UNet is restored to the device path
    # and the refiner parked on host
    assert tree_is_on_host(refiner_pipe.refiner_params)
    np.testing.assert_array_equal(scoped, resident)

    # next resident-mode request promotes the refiner back automatically
    monkeypatch.setenv("SDXL_TPU_HBM_GB", "1000")
    again = refiner_pipe.txt2img(["a crab"], **kw)
    np.testing.assert_array_equal(again, resident)
