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


# ---------------------------------------------------------------------------
# soft inpainting (mask_blur) + unified mask-image surface
# ---------------------------------------------------------------------------


def test_build_latent_mask_blur_properties():
    """mask_blur returns a CONTINUOUS [0,1] mask: interior of the window
    stays ~1, far outside ~0, and the 8x8-cell boundary carries
    intermediate values; blur=0 keeps the exact legacy hard mask."""
    import numpy as np

    from sdxl_tpu.pipeline.masks import build_latent_mask

    hard = np.asarray(build_latent_mask(64, 64, crop_left=16, crop_right=48,
                                        crop_top=16, crop_bottom=48))
    soft = np.asarray(build_latent_mask(64, 64, crop_left=16, crop_right=48,
                                        crop_top=16, crop_bottom=48,
                                        mask_blur=4.0))
    assert hard.shape == soft.shape == (1, 8, 8, 1)
    assert set(np.unique(hard)) <= {0.0, 1.0}
    assert soft.min() >= 0.0 and soft.max() <= 1.0
    assert soft[0, 4, 4, 0] > 0.9          # window interior
    assert soft[0, 0, 0, 0] < 0.1          # far corner
    assert 0.05 < soft[0, 2, 4, 0] < 0.95  # feathered boundary cell
    # crop_out inverts the soft mask (blur is linear; the kernel's f64
    # normalization + f32 output leave ~1e-5 of non-exactness)
    soft_out = np.asarray(build_latent_mask(
        64, 64, crop_left=16, crop_right=48, crop_top=16, crop_bottom=48,
        crop_out=True, mask_blur=4.0))
    np.testing.assert_allclose(soft_out, 1.0 - soft, atol=5e-5)

    # mask-IMAGE variant blurs identically to the equivalent window
    img = np.zeros((64, 64), np.uint8)
    img[16:48, 16:48] = 255
    soft_img = np.asarray(build_latent_mask(64, 64, mask_image=img,
                                            mask_blur=4.0))
    np.testing.assert_allclose(soft_img, soft, atol=1e-12)


def test_inpaint_pin_bool_vs_binary_float_bitwise():
    """A {0,1}-valued float mask reproduces the bool where-pin bitwise
    (f32 multiplies by exactly 0/1 are exact) — the soft path degrades
    to the reference path on hard masks."""
    import jax.numpy as jnp
    import numpy as np

    from sdxl_tpu.pipeline.sampler import inpaint_pin

    rng = np.random.default_rng(0)
    lat = jnp.asarray(rng.normal(size=(1, 8, 8, 4)), jnp.float32)
    ref = jnp.asarray(rng.normal(size=(1, 8, 8, 4)), jnp.float32)
    m_bool = jnp.asarray(rng.random((1, 8, 8, 4)) > 0.5)
    m_f = m_bool.astype(jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(inpaint_pin(m_bool, lat, ref)),
        np.asarray(inpaint_pin(m_f, lat, ref)))
    # and a genuinely soft mask blends
    m_half = jnp.full_like(m_f, 0.25)
    np.testing.assert_allclose(
        np.asarray(inpaint_pin(m_half, lat, ref)),
        np.asarray(0.25 * lat + 0.75 * ref), rtol=1e-6)


def test_inpaint_mask_image_and_blur_through_pipeline(pipe):  # noqa: F811
    """pipe.inpaint's mask-image surface matches the equivalent crop
    window bitwise (same latent cells), and mask_blur runs end to end
    producing a u8 image."""
    import numpy as np

    img = _ref()
    mask = np.zeros((64, 64), np.uint8)
    mask[16:48, 24:56] = 255
    saved_strict = pipe.strict_resolutions
    pipe.strict_resolutions = False  # 64x64 test canvas is off-bucket
    try:
        a = pipe.inpaint("a crab", img, mask_image=mask, n_steps=2, seed=5)
        b = pipe.inpaint("a crab", img, crop_left=24, crop_right=56,
                         crop_top=16, crop_bottom=48, n_steps=2, seed=5)
        np.testing.assert_array_equal(a, b)

        soft = pipe.inpaint("a crab", img, mask_image=mask, mask_blur=4.0,
                            n_steps=2, seed=5)
    finally:
        pipe.strict_resolutions = saved_strict
    assert soft.shape == (1, 64, 64, 3) and soft.dtype == np.uint8
    assert not np.array_equal(soft, a)  # the feather actually changes it
