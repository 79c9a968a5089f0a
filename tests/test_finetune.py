"""End-to-end LoRA fine-tune path (train/finetune.py + cli/train.py):
dataset folder -> pre-encoded latents/conditioning -> jitted train loop
-> exported adapter that the inference --lora merge loads back."""

import os

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
    export_adapter,
    finetune_lora,
    list_image_folder,
    load_image_rgb,
    sample_batch,
)

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


@pytest.fixture(scope="module")
def tiny_pipe():
    return random_pipeline(
        seed=0, embedder_cfg=E_CFG, diffuser_cfg=D_CFG,
        vae_cfg=AutoencoderConfig(), compute_dtype=jnp.float32,
        param_dtype_unet=jnp.float32,
    )


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("ds")
    rng = np.random.default_rng(0)
    caps = ["a red crab", "a blue crab", "green crab"]
    for i, cap in enumerate(caps):
        img = (rng.random((40, 56, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(d / f"img{i}.png")
        (d / f"img{i}.txt").write_text(cap)
    # one caption-less image: falls back to the stem
    Image.fromarray((rng.random((64, 64, 3)) * 255).astype(np.uint8)).save(
        d / "beach_scene.jpg")
    return str(d)


def test_list_and_load_images(dataset_dir):
    items = list_image_folder(dataset_dir)
    assert len(items) == 4
    caps = dict((os.path.basename(p), c) for p, c in items)
    assert caps["img0.png"] == "a red crab"
    assert caps["beach_scene.jpg"] == "beach scene"  # stem fallback
    img = load_image_rgb(items[0][0], 32)
    assert img.shape == (32, 32, 3) and img.dtype == np.uint8


@pytest.fixture(scope="module")
def encoded(tiny_pipe, dataset_dir):
    return encode_dataset(tiny_pipe, dataset_dir, resolution=32, chunk=2)


def test_encode_dataset_shapes(encoded):
    assert encoded.latents.shape == (4, 4, 4, 4)  # 32px / f8
    assert encoded.ctx.shape[0] == 4 and encoded.ctx.shape[-1] == 64
    assert encoded.label.shape == (4, 32 + 6 * 256)
    assert encoded.uncond_ctx.shape == encoded.ctx.shape[1:]
    assert np.isfinite(encoded.latents).all()


def test_sample_batch_and_caption_dropout(encoded):
    rng = np.random.default_rng(0)
    b = sample_batch(encoded, 8, rng, caption_dropout=0.0)
    assert b["latents"].shape[0] == 8 and b["ctx"].shape[0] == 8
    rng = np.random.default_rng(1)
    b1 = sample_batch(encoded, 64, rng, caption_dropout=1.0)
    # full dropout: every row is the uncond conditioning
    assert np.allclose(b1["ctx"], encoded.uncond_ctx[None])
    assert np.allclose(b1["label"], encoded.uncond_label[None])


def test_finetune_and_roundtrip_through_inference(
        tiny_pipe, encoded, tmp_path):
    """4 steps of the real loop: loss finite and factors move; exported
    adapter loads through the inference --lora merge; EMA exported."""
    from sdxl_tpu.io.lora import apply_lora, load_lora_file

    cfg = FinetuneConfig(
        rank=4, steps=4, batch_size=2, lr=1e-3, seed=0,
        caption_dropout=0.25, snr_gamma=5.0, log_every=0,
        ema_decay=0.9, remat=True)
    factors, ema = finetune_lora(tiny_pipe, encoded, cfg)
    ups = [k for k in factors if k.endswith(".lora_up")]
    assert ups and any(float(np.abs(factors[k]).max()) > 0 for k in ups)
    assert ema is not None and set(ema) == set(factors)

    path = str(tmp_path / "adapter.safetensors")
    export_adapter(path, factors, tiny_pipe, fmt="kohya")
    entries = load_lora_file(path)
    assert len(entries) == len(factors) // 2
    import copy
    import jax

    merged = copy.deepcopy(jax.tree.map(lambda a: a, tiny_pipe.unet_params))
    res = apply_lora(entries, unet=merged)
    assert not res["skipped"] and len(res["applied"]) == len(entries)


def test_finetune_flux_flow_matching(dataset_dir, tmp_path):
    """Transformer-family path: flow-matching LoRA over a tiny Flux
    pipeline — encode_dataset_fm shapes, finite decreasing-capable loss,
    peft export that the inference transformer merge applies."""
    import copy

    import jax

    from sdxl_tpu.io.lora import apply_lora, load_lora_file
    from sdxl_tpu.pipeline.flux import random_flux_pipeline
    from sdxl_tpu.train.finetune import encode_dataset_fm
    from tests.test_flux_loader import (
        TINY_CLIP_L,
        TINY_FLUX_PIPE,
        TINY_FLUX_VAE,
        TINY_T5,
    )

    pipe = random_flux_pipeline(
        flux_cfg=TINY_FLUX_PIPE, clip_cfg=TINY_CLIP_L,
        vae_cfg=TINY_FLUX_VAE, t5_cfg=TINY_T5, t5_tokens=16,
        compute_dtype=jnp.float32)
    data = encode_dataset_fm(pipe, dataset_dir, resolution=32, chunk=2)
    assert data.latents.shape == (4, 4, 4, 4)
    assert data.ctx.shape[0] == 4 and data.label.shape[0] == 4

    cfg = FinetuneConfig(rank=2, steps=3, batch_size=2, lr=1e-3,
                         flow_shift=1.15, log_every=0, seed=0)
    factors, _ = finetune_lora(pipe, data, cfg)
    assert any(k.startswith("single_blocks.") for k in factors)
    assert all(np.isfinite(np.asarray(v)).all() for v in factors.values())

    path = str(tmp_path / "flux_adapter.safetensors")
    export_adapter(path, factors, pipe, fmt="peft")
    entries = load_lora_file(path)
    merged = copy.deepcopy(jax.tree.map(lambda a: a, pipe.flux_params))
    res = apply_lora(entries, transformer=merged)
    assert not res["skipped"] and len(res["applied"]) == len(factors) // 2


def test_finetune_resume_continues_from_checkpoint(
        tiny_pipe, encoded, tmp_path):
    """save_every + resume: a 2-step run checkpointed then resumed for 2
    more reproduces the uninterrupted 4-step run bitwise (same batch rng
    replay, same per-step fold_in keys)."""
    ckpt = str(tmp_path / "state")
    base = dict(rank=2, batch_size=2, lr=1e-3, seed=3, log_every=0)
    full, _ = finetune_lora(
        tiny_pipe, encoded, FinetuneConfig(steps=4, **base))
    # interrupted leg: stops after 2 steps but builds the SAME 4-step
    # lr schedule the full run uses (schedule_steps)
    finetune_lora(
        tiny_pipe, encoded,
        FinetuneConfig(steps=2, schedule_steps=4, ckpt_dir=ckpt,
                       save_every=2, **base))
    resumed, _ = finetune_lora(
        tiny_pipe, encoded,
        FinetuneConfig(steps=4, ckpt_dir=ckpt, resume=True, **base))
    for k in full:
        np.testing.assert_array_equal(
            np.asarray(full[k]), np.asarray(resumed[k]), err_msg=k)
