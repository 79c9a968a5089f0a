"""Fixed-seed end-to-end regression fingerprint.

Guards the full prompt->image path against accidental numeric drift: a
tiny pipeline with fixed seeds must keep producing (statistically) the
same image on the CPU test backend. Tolerances absorb cross-version
float noise; a real regression (wrong schedule, broken wiring, flipped
mask) moves these numbers by far more.
"""

import numpy as np
import pytest

from tests.test_pipeline_e2e import (
    TINY_DIFFUSER,
    TINY_EMBEDDER,
    TINY_VAE,
)


@pytest.fixture(scope="module")
def pipe(tokenizer_dir):
    import jax.numpy as jnp

    from sdxl_tpu.pipeline.pipeline import random_pipeline

    return random_pipeline(
        embedder_cfg=TINY_EMBEDDER,
        diffuser_cfg=TINY_DIFFUSER,
        vae_cfg=TINY_VAE,
        compute_dtype=jnp.float32,
        param_dtype_unet=jnp.float32,
        tokenizer_dir=tokenizer_dir,
    )


def test_fingerprint(pipe):
    imgs = pipe.txt2img(
        "a photo of a cat", resolution=(64, 64), n_steps=4, seed=1234
    )
    a = imgs.astype(np.float64)
    fp = {
        "mean": a.mean(),
        "std": a.std(),
        "px_0_0": a[0, 0, 0].tolist(),
        "px_32_32": a[0, 32, 32].tolist(),
    }
    print("fingerprint:", fp)
    # Pinned golden values, recorded 2026-08-16 on jax 0.9.0 cpu. Tolerances
    # absorb float noise from compiler/version drift (fused-multiply orders
    # move u8 pixels by at most ±1-2); a real numeric regression (schedule,
    # wiring, mask, normalization) moves mean/std by far more. If the stack
    # moves legitimately, regenerate CONSCIOUSLY and record why.
    GOLDEN = {
        "mean": 125.331299,
        "std": 43.2493,
        "px_0_0": [121.0, 121.0, 139.0],
        "px_32_32": [148.0, 63.0, 124.0],
    }
    assert abs(fp["mean"] - GOLDEN["mean"]) < 0.5, fp
    assert abs(fp["std"] - GOLDEN["std"]) < 0.5, fp
    np.testing.assert_allclose(fp["px_0_0"], GOLDEN["px_0_0"], atol=2.0)
    np.testing.assert_allclose(fp["px_32_32"], GOLDEN["px_32_32"], atol=2.0)
    # determinism within a session is exact
    imgs2 = pipe.txt2img(
        "a photo of a cat", resolution=(64, 64), n_steps=4, seed=1234
    )
    np.testing.assert_array_equal(imgs, imgs2)
    # different prompt must change the image (conditioning actually wired)
    imgs3 = pipe.txt2img(
        "a painting of a dog", resolution=(64, 64), n_steps=4, seed=1234
    )
    assert not np.array_equal(imgs, imgs3)
    # different seed must change the image
    imgs4 = pipe.txt2img(
        "a photo of a cat", resolution=(64, 64), n_steps=4, seed=999
    )
    assert not np.array_equal(imgs, imgs4)


def test_k_sampler_fingerprints(pipe):
    """Pinned fixed-seed fingerprints for the Euler and DPM++ 2M paths —
    numeric drift in the k-diffusion schedule/update rules fails here.
    Recorded 2026-08-16 on jax 0.9.0 cpu; regenerate consciously."""
    GOLDEN = {
        "euler": {"mean": 125.349447, "std": 43.227149,
                  "px_32_32": [147.0, 62.0, 125.0]},
        "dpmpp": {"mean": 125.336589, "std": 43.269423,
                  "px_32_32": [148.0, 63.0, 124.0]},
    }
    for sampler, g in GOLDEN.items():
        imgs = pipe.txt2img(
            "a photo of a cat", resolution=(64, 64), n_steps=4, seed=1234,
            sampler=sampler,
        )
        a = imgs.astype(np.float64)
        assert abs(a.mean() - g["mean"]) < 0.5, (sampler, a.mean())
        assert abs(a.std() - g["std"]) < 0.5, (sampler, a.std())
        np.testing.assert_allclose(
            a[0, 32, 32], g["px_32_32"], atol=2.0, err_msg=sampler
        )


def test_weighted_karras_fingerprint(pipe):
    """Pinned fixed-seed fingerprint for this round's new conditioning +
    schedule paths: emphasis-weighted prompt through the mean-norm
    correction, DPM++ 2M on the Karras sigma spacing. Guards prompt.py /
    apply_prompt_weights / karras interpolation against silent drift."""
    imgs = pipe.txt2img(
        "a (photo:1.3) of a [small] cat", resolution=(64, 64), n_steps=4,
        seed=77, sampler="dpmpp", schedule="karras",
    )
    a = imgs.astype(np.float64)
    fp = {"mean": a.mean(), "std": a.std(), "px_16_48": a[0, 16, 48].tolist()}
    print("weighted-karras fingerprint:", fp)
    # pinned 2026-08-17, jax 0.9.0 cpu (same tolerance rationale as
    # test_fingerprint)
    GOLDEN = {"mean": 127.977458, "std": 43.031831,
              "px_16_48": [130.0, 136.0, 111.0]}
    assert abs(fp["mean"] - GOLDEN["mean"]) < 0.5, fp
    assert abs(fp["std"] - GOLDEN["std"]) < 0.5, fp
    np.testing.assert_allclose(fp["px_16_48"], GOLDEN["px_16_48"], atol=2.0)
    # weighting is live: removing the emphasis changes the image
    plain = pipe.txt2img(
        "a photo of a small cat", resolution=(64, 64), n_steps=4,
        seed=77, sampler="dpmpp", schedule="karras",
    )
    assert not np.array_equal(imgs, plain)
