"""DreamBooth prior preservation (arXiv:2208.12242; diffusers'
train_dreambooth.py semantics): per-example loss weights in the losses,
instance+class batch composition, class-set generation by the frozen
base pipeline, and the end-to-end fine-tune path."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdxl_tpu.configs import (
    AutoencoderConfig,
    CLIPConfig,
    DiffuserConfig,
    EmbedderConfig,
)
from sdxl_tpu.pipeline.pipeline import random_pipeline
from sdxl_tpu.train.finetune import (
    EncodedDataset,
    FinetuneConfig,
    encode_dataset,
    ensure_class_images,
    finetune_lora,
    sample_batch_prior,
)
from sdxl_tpu.train.losses import diffusion_loss, flow_matching_loss

E_CFG = EmbedderConfig(
    clip_config=CLIPConfig(n_state=32, embed_dim=32, n_head=4, n_layer=2),
    open_clip_config=CLIPConfig(
        n_state=32, embed_dim=32, n_head=4, n_layer=2, quick_gelu=False
    ),
)
D_CFG = DiffuserConfig(
    adm_in_channels=32 + 6 * 256, model_channels=32,
    channel_mults=(1, 2, 4), num_head_channels=8,
    transformer_depths=(1, 1, 1), context_dim=64,
)


# ---------------------------------------------------------------------------
# loss_weight reduction semantics
# ---------------------------------------------------------------------------


def _linear_apply(params, x_t, t, batch):
    # deterministic toy "model": prediction depends on params, x_t and ctx
    return params["w"] * x_t + 0.1 * batch["ctx"][:, None, None, :4]


def _toy_batch(b=4, key=0):
    rng = np.random.default_rng(key)
    return {
        "latents": rng.standard_normal((b, 4, 4, 4)).astype(np.float32),
        "ctx": rng.standard_normal((b, 8)).astype(np.float32),
    }


ALPHAS = jnp.linspace(0.999, 0.01, 100)
PARAMS = {"w": jnp.float32(0.7)}


def test_uniform_weights_equal_plain_mean():
    batch = _toy_batch()
    key = jax.random.PRNGKey(3)
    l0 = diffusion_loss(_linear_apply, PARAMS, ALPHAS, batch, key)
    bw = dict(batch, loss_weight=np.full((4,), 0.25, np.float32))
    l1 = diffusion_loss(_linear_apply, PARAMS, ALPHAS, bw, key)
    assert np.allclose(float(l0), float(l1), rtol=1e-6)


def test_loss_weight_linearity():
    """loss(weights) == sum_i w_i * loss(one_hot_i): the weighted-sum
    reduction is exactly linear in the per-example losses (same key ->
    identical t/noise draws at a fixed batch size)."""
    batch = _toy_batch(b=5, key=1)
    key = jax.random.PRNGKey(9)
    w = np.asarray([0.2, 0.0, 1.3, 0.5, 0.25], np.float32)
    combined = float(diffusion_loss(
        _linear_apply, PARAMS, ALPHAS, dict(batch, loss_weight=w), key))
    parts = []
    for i in range(5):
        oh = np.zeros((5,), np.float32)
        oh[i] = 1.0
        parts.append(float(diffusion_loss(
            _linear_apply, PARAMS, ALPHAS, dict(batch, loss_weight=oh),
            key)))
    assert np.allclose(combined, float(np.dot(w, parts)), rtol=1e-5)


def test_flow_matching_loss_weight():
    batch = _toy_batch()
    key = jax.random.PRNGKey(11)
    l0 = flow_matching_loss(_linear_apply, PARAMS, batch, key)
    bw = dict(batch, loss_weight=np.full((4,), 0.25, np.float32))
    l1 = flow_matching_loss(_linear_apply, PARAMS, bw, key)
    assert np.allclose(float(l0), float(l1), rtol=1e-6)
    half = dict(batch, loss_weight=np.full((4,), 0.125, np.float32))
    l2 = flow_matching_loss(_linear_apply, PARAMS, half, key)
    assert np.allclose(float(l2), 0.5 * float(l0), rtol=1e-5)


# ---------------------------------------------------------------------------
# batch composition
# ---------------------------------------------------------------------------


def _fake_encoded(n, fill, t=6, d=16, with_label=True):
    return EncodedDataset(
        latents=np.full((n, 4, 4, 4), fill, np.float32),
        ctx=np.full((n, t, d), fill, np.float32),
        label=np.full((n, 8), fill, np.float32) if with_label else None,
        uncond_ctx=np.zeros((t, d), np.float32),
        uncond_label=np.zeros((8,), np.float32) if with_label else None,
        captions=["x"] * n,
    )


def test_sample_batch_prior_composition():
    inst, cls = _fake_encoded(3, 1.0), _fake_encoded(5, 2.0)
    rng = np.random.default_rng(0)
    b = sample_batch_prior(inst, cls, 2, 3, rng, prior_weight=0.6)
    assert b["latents"].shape[0] == 5
    assert np.all(b["latents"][:2] == 1.0) and np.all(b["latents"][2:] == 2.0)
    w = b["loss_weight"]
    assert np.allclose(w[:2], 0.5) and np.allclose(w[2:], 0.2)
    # the composed reduction equals mean(inst) + 0.6 * mean(class)
    per = np.arange(5, dtype=np.float32)
    assert np.allclose(np.sum(per * w),
                       per[:2].mean() + 0.6 * per[2:].mean())


def test_caption_dropout_spares_class_rows():
    inst, cls = _fake_encoded(3, 1.0), _fake_encoded(3, 2.0)
    rng = np.random.default_rng(0)
    b = sample_batch_prior(inst, cls, 4, 4, rng, caption_dropout=1.0)
    assert np.all(b["ctx"][:4] == 0.0)       # instance rows dropped to ""
    assert np.all(b["ctx"][4:] == 2.0)       # class rows untouched


def test_mismatched_chunk_counts_are_tiled():
    inst, cls = _fake_encoded(2, 1.0, t=12), _fake_encoded(2, 2.0, t=6)
    rng = np.random.default_rng(0)
    b = sample_batch_prior(inst, cls, 2, 2, rng)
    assert b["ctx"].shape[1] == 12


def test_label_layout_mismatch_raises():
    inst = _fake_encoded(2, 1.0, with_label=True)
    cls = _fake_encoded(2, 2.0, with_label=False)
    with pytest.raises(ValueError):
        sample_batch_prior(inst, cls, 1, 1, np.random.default_rng(0))


# ---------------------------------------------------------------------------
# end to end on a tiny pipeline
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tiny_pipe():
    return random_pipeline(
        seed=0, embedder_cfg=E_CFG, diffuser_cfg=D_CFG,
        vae_cfg=AutoencoderConfig(), compute_dtype=jnp.float32,
        param_dtype_unet=jnp.float32,
    )


def _image_folder(tmp_path_factory, name, captions):
    from PIL import Image

    d = tmp_path_factory.mktemp(name)
    rng = np.random.default_rng(hash(name) % 2**31)
    for i, cap in enumerate(captions):
        img = (rng.random((40, 40, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(d / f"img{i}.png")
        (d / f"img{i}.txt").write_text(cap)
    return str(d)


def test_ensure_class_images_generates_and_is_idempotent(
        tiny_pipe, tmp_path):
    class_dir = str(tmp_path / "class")
    made = ensure_class_images(
        tiny_pipe, class_dir, "a photo of a crab", 2, resolution=32,
        n_steps=2, batch=2, seed=0)
    assert made == 2
    pngs = [n for n in os.listdir(class_dir) if n.endswith(".png")]
    txts = [n for n in os.listdir(class_dir) if n.endswith(".txt")]
    assert len(pngs) == 2 and len(txts) == 2
    with open(os.path.join(class_dir, txts[0])) as f:
        assert f.read() == "a photo of a crab"
    assert ensure_class_images(
        tiny_pipe, class_dir, "a photo of a crab", 2, resolution=32,
        n_steps=2) == 0


def test_dreambooth_finetune_runs(tiny_pipe, tmp_path_factory):
    inst_dir = _image_folder(
        tmp_path_factory, "inst", ["a photo of sks crab"] * 2)
    class_dir = _image_folder(
        tmp_path_factory, "class", ["a photo of a crab"] * 3)
    data = encode_dataset(tiny_pipe, inst_dir, resolution=32, chunk=2)
    prior = encode_dataset(tiny_pipe, class_dir, resolution=32, chunk=2)
    cfg = FinetuneConfig(rank=2, steps=3, batch_size=1, prior_weight=0.8,
                         lr=1e-3, log_every=0, remat=False, seed=0)
    factors, _ = finetune_lora(tiny_pipe, data, cfg, prior_data=prior)
    ups = [v for k, v in factors.items() if k.endswith(".lora_up")]
    assert all(np.isfinite(np.asarray(v)).all() for v in factors.values())
    # training actually moved the up factors off their zero init
    assert any(float(np.abs(np.asarray(u)).max()) > 0 for u in ups)


def test_dreambooth_accum_stacks_microbatches():
    inst, cls = _fake_encoded(4, 1.0), _fake_encoded(4, 2.0)
    from sdxl_tpu.train.finetune import _draw_batch

    cfg = FinetuneConfig(batch_size=2, accum=3, prior_weight=1.0)
    b = _draw_batch(inst, cls, cfg, np.random.default_rng(0))
    assert b["latents"].shape[:2] == (3, 4)       # [accum, bi+bc, ...]
    assert b["loss_weight"].shape == (3, 4)
