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


def test_outpaint_extends_canvas(pipe):
    """outpaint = edge-padded canvas + crop_out inpainting: the output
    grows by the pad, runs off-bucket (strict validation relaxed for
    this mode only), and the generated border actually differs from the
    edge-replicate seed."""
    import numpy as np
    import pytest

    img = np.zeros((48, 48, 3), np.uint8)
    img[:, :24] = 200
    saved_strict = pipe.strict_resolutions
    pipe.strict_resolutions = True  # exercise the relax-and-restore
    try:
        out = pipe.outpaint("a wide vista", img[None], pad=(8, 8, 8, 8),
                            n_steps=2, seed=3)
        assert out.shape == (1, 64, 64, 3) and out.dtype == np.uint8
        assert pipe.strict_resolutions  # restored after the relaxed call
    finally:
        pipe.strict_resolutions = saved_strict
    with pytest.raises(ValueError, match="positive side"):
        pipe.outpaint("x", img[None], pad=(0, 0, 0, 0), n_steps=1)
    with pytest.raises(ValueError, match="multiple of 8"):
        pipe.outpaint("x", img[None], pad=(4, 0, 0, 0), n_steps=1)
    with pytest.raises(ValueError, match="fill"):
        pipe.outpaint("x", img[None], pad=(8, 8, 0, 0), fill="mirror",
                      n_steps=1)
    # noise fill also runs
    out2 = pipe.outpaint("a vista", img[None], pad=(8, 8, 8, 8),
                         fill="noise", n_steps=2, seed=3)
    assert out2.shape == (1, 64, 64, 3)
