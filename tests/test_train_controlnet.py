"""ControlNet TRAINING (train/controlnet.py): UNet-copy init no-op
identity, control-image dataset plumbing, a real train step moving the
zero convs, and the diffusers-layout export round-trip through the
inference loader (io/diffusers_sdxl.py::load_controlnet_dir)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdxl_tpu.io.diffusers_sdxl import (
    build_controlnet_from_diffusers,
    load_controlnet_dir,
)
from sdxl_tpu.io.diffusers_write import (
    controlnet_to_diffusers,
    write_diffusers_controlnet_dir,
)
from sdxl_tpu.models.controlnet import (
    control_cond_embed,
    controlnet_forward,
    init_controlnet,
)
from sdxl_tpu.models.unet import unet_forward, unfuse_unet_qkv
from sdxl_tpu.train.controlnet import (
    controlnet_loss_fn,
    finetune_controlnet,
    init_controlnet_from_unet,
)
from sdxl_tpu.train.finetune import (
    FinetuneConfig,
    encode_dataset,
    sample_batch,
)


@pytest.fixture()
def tiny_pipe(tokenizer_dir):
    from sdxl_tpu.pipeline.pipeline import random_pipeline
    from tests.test_pipeline_e2e import TINY_DIFFUSER, TINY_EMBEDDER, TINY_VAE

    pipe = random_pipeline(
        embedder_cfg=TINY_EMBEDDER,
        diffuser_cfg=TINY_DIFFUSER,
        vae_cfg=TINY_VAE,
        compute_dtype=jnp.float32,
        param_dtype_unet=jnp.float32,
        tokenizer_dir=tokenizer_dir,
    )
    # the training loaders' prep (cli/train.py load_frozen_pipeline)
    pipe.unet_params = unfuse_unet_qkv(pipe.unet_params)
    return pipe


@pytest.fixture()
def dataset_dirs(tmp_path):
    """(train_dir, control_dir) with matching stems."""
    from PIL import Image

    train = tmp_path / "train"
    control = tmp_path / "control"
    train.mkdir(), control.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(train / f"img{i}.png")
        (train / f"img{i}.txt").write_text(f"a photo {i}")
        # control stored as .jpg on purpose: loader matches by stem
        edge = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        Image.fromarray(edge).save(control / f"img{i}.jpg")
    return str(train), str(control)


def test_init_from_unet_is_copy_and_noop(tiny_pipe):
    cn = init_controlnet_from_unet(tiny_pipe)
    up = tiny_pipe.unet_params
    ucfg = tiny_pipe.diffuser_cfg.unet_config()

    # trunk leaves are the UNet's own (the paper's trainable-copy init)
    np.testing.assert_array_equal(
        np.asarray(cn["input_blocks"][1]["res"]["conv_in"]["w"]),
        np.asarray(up["input_blocks"][1]["res"]["conv_in"]["w"]))
    np.testing.assert_array_equal(
        np.asarray(cn["middle_block"]["res2"]["conv_out"]["w"]),
        np.asarray(up["middle_block"]["res2"]["conv_out"]["w"]))
    # every zero conv is exactly zero
    for zc in cn["zero_convs"] + [cn["zero_conv_mid"]]:
        assert not np.asarray(zc["w"]).any()

    # step-0 identity: guided output == plain UNet output bitwise
    ks = jax.random.split(jax.random.PRNGKey(3), 4)
    x = jax.random.normal(ks[0], (2, 8, 8, 4), jnp.float32)
    t = jnp.array([500, 10])
    ctx = jax.random.normal(ks[1], (2, 7, ucfg.context_dim), jnp.float32)
    label = jax.random.normal(ks[2], (2, ucfg.adm_in_channels), jnp.float32)
    cimg = jax.random.uniform(ks[3], (2, 64, 64, 3), jnp.float32)
    cond_emb = control_cond_embed(cn["cond_embed"], cimg)
    assert not np.asarray(cond_emb).any()   # zero conv_out
    down, mid = controlnet_forward(cn, ucfg, x, t, ctx, label, cond_emb)
    guided = unet_forward(tiny_pipe.unet_params, ucfg, x, t, ctx, label,
                          None, (down, mid))
    plain = unet_forward(tiny_pipe.unet_params, ucfg, x, t, ctx, label)
    np.testing.assert_array_equal(np.asarray(guided), np.asarray(plain))


def test_encode_dataset_control_plumbing(tiny_pipe, dataset_dirs):
    train, control = dataset_dirs
    data = encode_dataset(tiny_pipe, train, 64, chunk=2, control_dir=control)
    assert data.control is not None
    assert data.control.shape == (3, 64, 64, 3)
    assert data.control.dtype == np.uint8
    b = sample_batch(data, 4, np.random.default_rng(0))
    assert b["control"].shape == (4, 64, 64, 3)
    assert b["control"].dtype == np.float32
    assert 0.0 <= b["control"].min() and b["control"].max() <= 1.0

    # a missing conditioning image is a clear error
    os.remove(os.path.join(control, "img1.jpg"))
    with pytest.raises(FileNotFoundError, match="img1"):
        encode_dataset(tiny_pipe, train, 64, chunk=2, control_dir=control)


def test_finetune_controlnet_and_roundtrip(tiny_pipe, dataset_dirs,
                                           tmp_path):
    train, control = dataset_dirs
    data = encode_dataset(tiny_pipe, train, 64, chunk=2, control_dir=control)
    cfg = FinetuneConfig(steps=2, batch_size=2, lr=1e-3, optimizer="adamw",
                         remat=False, log_every=0, seed=0)
    trained = finetune_controlnet(tiny_pipe, data, cfg)

    # training moved the zero convs off zero (gradients reach them) and
    # the trunk off its UNet init
    assert np.asarray(trained["zero_conv_mid"]["w"]).any()
    assert any(np.asarray(zc["w"]).any() for zc in trained["zero_convs"])
    assert not np.array_equal(
        np.asarray(trained["middle_block"]["res1"]["conv_in"]["w"]),
        np.asarray(tiny_pipe.unet_params["middle_block"]["res1"]
                   ["conv_in"]["w"]))
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree.leaves(trained))

    # export -> inference loader round-trip (f32 to keep it exact)
    out = str(tmp_path / "cn")
    write_diffusers_controlnet_dir(
        out, trained, tiny_pipe.diffuser_cfg.unet_config(),
        dtype=np.float32)
    loaded, _ = load_controlnet_dir(out, tiny_pipe.diffuser_cfg,
                                    jnp.float32)
    la, lb = jax.tree.leaves(trained), jax.tree.leaves(loaded)
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32), atol=0)

    # ...and the real inference path consumes it
    tiny_pipe.load_controlnet(out)
    rng = np.random.default_rng(1)
    img = tiny_pipe.txt2img(
        "a photo", resolution=(64, 64), n_steps=2, seed=1,
        control_image=(rng.random((64, 64, 3)) * 255).astype(np.uint8),
        control_scale=0.7, profile_stages=False)
    assert img.shape == (1, 64, 64, 3)
    assert np.isfinite(img.astype(np.float64)).all()


def test_loss_grads_confined_to_controlnet(tiny_pipe, dataset_dirs):
    """The frozen UNet receives no gradient: loss_fn differentiates only
    the flat ControlNet masters."""
    from sdxl_tpu.train.full import full_trainable, wrap_loss_full

    train, control = dataset_dirs
    data = encode_dataset(tiny_pipe, train, 64, chunk=2, control_dir=control)
    cn = init_controlnet_from_unet(tiny_pipe)
    master, dtypes, template = full_trainable(cn, jnp.float32)
    cfg = FinetuneConfig(steps=1, batch_size=1, remat=False)
    loss_fn = wrap_loss_full(controlnet_loss_fn(tiny_pipe, cfg), dtypes)
    frozen = {"control": template, "unet": tiny_pipe.unet_params}
    batch = sample_batch(data, 1, np.random.default_rng(0))
    loss, grads = jax.value_and_grad(loss_fn)(
        master, frozen, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    assert set(grads) == set(master)
    # cond_embed path gets signal even at step 0 (zero convs zero): the
    # mid zero conv's gradient is nonzero because its INPUT (trunk mid
    # output) is nonzero
    g_mid = np.asarray(grads["zero_conv_mid.w"])
    assert np.isfinite(g_mid).all() and g_mid.any()


def test_controlnet_to_diffusers_roundtrip_random():
    """Tensor inverse check on a RANDOM tree (not UNet-derived): write
    keys == loader keys, values bit-identical."""
    from tests.test_pipeline_e2e import TINY_DIFFUSER

    cfg = TINY_DIFFUSER.unet_config()
    cn = init_controlnet(jax.random.PRNGKey(7), cfg, jnp.float32)
    flat = controlnet_to_diffusers(cn, cfg)
    rebuilt = build_controlnet_from_diffusers(flat, cfg, jnp.float32)
    la, lb = jax.tree.leaves(cn), jax.tree.leaves(rebuilt)
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
