"""img2img (strength-based) tests."""

import numpy as np
import pytest

from tests.test_pipeline_e2e import pipe  # noqa: F401  (fixture reuse)


def _ref(batch=1):
    return np.random.default_rng(1).integers(
        0, 255, (batch, 64, 64, 3)
    ).astype(np.uint8)


def test_img2img_shapes(pipe):  # noqa: F811
    out = pipe.img2img("a cat", _ref(), strength=0.5, n_steps=2, seed=1)
    assert out.shape == (1, 64, 64, 3)
    assert out.dtype == np.uint8


def test_img2img_low_strength_tracks_reference(pipe):  # noqa: F811
    """Weak strength must stay closer to the reference than strong."""
    ref = _ref()
    weak = pipe.img2img("a cat", ref, strength=0.1, n_steps=2, seed=1)
    strong = pipe.img2img("a cat", ref, strength=1.0, n_steps=2, seed=1)
    d_weak = np.mean(np.abs(weak.astype(float) - ref.astype(float)))
    d_strong = np.mean(np.abs(strong.astype(float) - ref.astype(float)))
    assert d_weak < d_strong


def test_img2img_rejects_bad_strength(pipe):  # noqa: F811
    with pytest.raises(ValueError):
        pipe.img2img("a cat", _ref(), strength=0.0)
    with pytest.raises(ValueError):
        pipe.img2img("a cat", _ref(), strength=1.5)
