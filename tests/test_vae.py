"""VAE parity vs a PyTorch re-execution of the same graph.

Builds a tiny autoencoder, then replays the exact reference architecture
(/root/reference/src/model/autoencoder/mod.rs) in PyTorch functional ops
with the same weights. This pins down conv layout (NHWC/HWIO vs torch
NCHW/OIHW), the asymmetric (0,1,0,1) downsample padding, nearest-2x
upsampling, single-head attention, and GroupNorm semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from sdxl_tpu.configs import AutoencoderConfig
from sdxl_tpu.models.vae import decode_latent, encode_image, init_autoencoder

TINY = AutoencoderConfig(
    encoder_channels=((8, 8), (8, 16)),
    decoder_channels=((16, 16), (16, 8)),
    n_group=4,
    n_channels_out=8,
    latent_channels=4,
)


def t_conv(p, x, stride=1, padding=1):
    w = torch.from_numpy(np.transpose(np.asarray(p["w"], np.float32), (3, 2, 0, 1)))
    b = torch.from_numpy(np.asarray(p["b"], np.float32))
    return F.conv2d(x, w, b, stride=stride, padding=padding)


def t_gn(p, x, groups):
    return F.group_norm(
        x,
        groups,
        torch.from_numpy(np.asarray(p["gamma"], np.float32)),
        torch.from_numpy(np.asarray(p["beta"], np.float32)),
    )


def t_resnet(p, x, groups):
    h = t_conv(p["conv1"], F.silu(t_gn(p["norm1"], x, groups)))
    h = t_conv(p["conv2"], F.silu(t_gn(p["norm2"], h, groups)))
    if "nin_shortcut" in p:
        x = t_conv(p["nin_shortcut"], x, padding=0)
    return x + h


def t_attn(p, x, groups):
    n, c, hh, ww = x.shape
    h = t_gn(p["norm"], x, groups)
    q = t_conv(p["q"], h, padding=0).reshape(n, c, hh * ww).transpose(1, 2)
    k = t_conv(p["k"], h, padding=0).reshape(n, c, hh * ww).transpose(1, 2)
    v = t_conv(p["v"], h, padding=0).reshape(n, c, hh * ww).transpose(1, 2)
    o = F.scaled_dot_product_attention(q, k, v)
    o = o.transpose(1, 2).reshape(n, c, hh, ww)
    return x + t_conv(p["proj_out"], o, padding=0)


def t_mid(p, x, groups):
    x = t_resnet(p["block_1"], x, groups)
    x = t_attn(p["attn"], x, groups)
    return t_resnet(p["block_2"], x, groups)


def t_encode(params, cfg, x):
    p = params["encoder"]
    x = t_conv(p["conv_in"], x)
    for bp in p["blocks"]:
        x = t_resnet(bp["res1"], x, cfg.n_group)
        x = t_resnet(bp["res2"], x, cfg.n_group)
        if "downsampler" in bp:
            x = F.pad(x, (0, 1, 0, 1))  # torch asymmetric (left,right,top,bottom)
            x = t_conv(bp["downsampler"], x, stride=2, padding=0)
    x = t_mid(p["mid"], x, cfg.n_group)
    x = t_conv(p["conv_out"], F.silu(t_gn(p["norm_out"], x, cfg.n_group)))
    x = t_conv(params["quant_conv"], x, padding=0)
    return x[:, : cfg.latent_channels]


def t_decode(params, cfg, x):
    x = t_conv(params["post_quant_conv"], x, padding=0)
    p = params["decoder"]
    x = t_conv(p["conv_in"], x)
    x = t_mid(p["mid"], x, cfg.n_group)
    for bp in p["blocks"]:
        x = t_resnet(bp["res1"], x, cfg.n_group)
        x = t_resnet(bp["res2"], x, cfg.n_group)
        x = t_resnet(bp["res3"], x, cfg.n_group)
        if "upsampler" in bp:
            x = F.interpolate(x, scale_factor=2, mode="nearest")
            x = t_conv(bp["upsampler"], x)
    return t_conv(p["conv_out"], F.silu(t_gn(p["norm_out"], x, cfg.n_group)))


def test_encode_parity_with_torch():
    params = init_autoencoder(jax.random.PRNGKey(1), TINY)
    rng = np.random.default_rng(2)
    img = rng.standard_normal((1, 16, 16, 3)).astype(np.float32)

    ours = np.asarray(encode_image(params, TINY, jnp.asarray(img)))
    theirs = (
        t_encode(params, TINY, torch.from_numpy(np.transpose(img, (0, 3, 1, 2))))
        .detach()
        .numpy()
    )
    # ours NHWC vs theirs NCHW
    assert ours.shape == (1, 8, 8, TINY.latent_channels)
    np.testing.assert_allclose(
        np.transpose(ours, (0, 3, 1, 2)), theirs, atol=1e-4
    )


def test_decode_parity_with_torch():
    params = init_autoencoder(jax.random.PRNGKey(3), TINY)
    rng = np.random.default_rng(4)
    lat = rng.standard_normal((1, 8, 8, 4)).astype(np.float32)

    ours = np.asarray(decode_latent(params, TINY, jnp.asarray(lat)))
    theirs = (
        t_decode(params, TINY, torch.from_numpy(np.transpose(lat, (0, 3, 1, 2))))
        .detach()
        .numpy()
    )
    assert ours.shape == (1, 16, 16, 3)
    np.testing.assert_allclose(
        np.transpose(ours, (0, 3, 1, 2)), theirs, atol=1e-4
    )


def test_encode_decode_shapes_8x_factor():
    params = init_autoencoder(jax.random.PRNGKey(5), TINY)
    img = jnp.zeros((2, 32, 32, 3))
    lat = encode_image(params, TINY, img)
    assert lat.shape == (2, 16, 16, 4)  # tiny cfg has 1 downsample (f=2)


def test_tiled_decode_matches_full_when_single_tile():
    """decode_latent_tiled with tile >= latent size takes the exact
    whole-image path (bit-equal)."""
    import jax

    from sdxl_tpu.pipeline.latent import (
        decode_latent_tiled,
        decode_latent_to_images,
    )

    cfg = TINY
    params = init_autoencoder(jax.random.PRNGKey(2), cfg)
    lat = jax.random.normal(jax.random.PRNGKey(3), (1, 12, 12, 4), jnp.float32)
    full = decode_latent_to_images(params, cfg, lat, 0.13025)
    tiled = decode_latent_tiled(params, cfg, lat, 0.13025, tile=16)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(tiled))


def test_tiled_decode_blends_overlapping_tiles():
    """Real tiling: output is finite/u8, matches the full decode closely in
    the tile interiors (per-tile GroupNorm stats are the standard tiled-VAE
    approximation; overlap blending hides the seams)."""
    import jax

    from sdxl_tpu.pipeline.latent import (
        decode_latent_tiled,
        decode_latent_to_images,
    )

    cfg = TINY
    params = init_autoencoder(jax.random.PRNGKey(2), cfg)
    lat = jax.random.normal(jax.random.PRNGKey(4), (1, 24, 24, 4),
                            jnp.float32) * 0.5
    full = np.asarray(decode_latent_to_images(params, cfg, lat, 0.13025))
    tiled = np.asarray(decode_latent_tiled(params, cfg, lat, 0.13025,
                                           tile=16, overlap=8))
    assert tiled.shape == full.shape and tiled.dtype == np.uint8
    d = np.abs(tiled.astype(int) - full.astype(int))
    # random tiny-VAE GN stats shift per tile; structure must survive
    assert d.mean() < 40.0, d.mean()

    import pytest as _pytest

    with _pytest.raises(ValueError, match="overlap"):
        decode_latent_tiled(params, cfg, lat, tile=8, overlap=8)


def test_tiled_encode_matches_full_when_single_tile():
    """encode_images_tiled with tile >= latent size takes the exact
    whole-image path (bit-equal)."""
    import jax

    from sdxl_tpu.pipeline.latent import (
        encode_images_tiled,
        encode_images_to_latent,
    )

    cfg = TINY
    params = init_autoencoder(jax.random.PRNGKey(2), cfg)
    img = (np.random.default_rng(5).random((1, 24, 24, 3)) * 255).astype(
        np.uint8)
    full = encode_images_to_latent(params, cfg, jnp.asarray(img), 0.13025)
    tiled = encode_images_tiled(params, cfg, jnp.asarray(img), 0.13025,
                                tile=16)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(tiled))


def test_tiled_encode_blends_overlapping_tiles():
    """Real tiling: latent shape/units match the full encode; values track
    it closely (per-tile GroupNorm stats are the standard approximation)."""
    import jax

    from sdxl_tpu.pipeline.latent import (
        encode_images_tiled,
        encode_images_to_latent,
    )

    cfg = TINY  # f = 2: 48px image -> 24px latent
    params = init_autoencoder(jax.random.PRNGKey(2), cfg)
    img = (np.random.default_rng(6).random((1, 48, 48, 3)) * 255).astype(
        np.uint8)
    full = np.asarray(encode_images_to_latent(params, cfg, jnp.asarray(img),
                                              0.13025))
    tiled = np.asarray(encode_images_tiled(params, cfg, jnp.asarray(img),
                                           0.13025, tile=16, overlap=8))
    assert tiled.shape == full.shape
    assert np.isfinite(tiled).all()
    scale = np.abs(full).mean()
    assert np.abs(tiled - full).mean() < 2.0 * scale

    import pytest as _pytest

    with _pytest.raises(ValueError, match="overlap"):
        encode_images_tiled(params, cfg, jnp.asarray(img), tile=8, overlap=8)
