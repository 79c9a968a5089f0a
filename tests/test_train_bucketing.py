"""Aspect-ratio bucket training (train/finetune.py): bucket table
scaling, aspect assignment, per-bucket encoding shapes + size
conditioning, and a LoRA train run drawing multiple static shapes."""

import jax.numpy as jnp
import numpy as np
import pytest

from sdxl_tpu.train.finetune import (
    BucketedDataset,
    FinetuneConfig,
    _draw_batch,
    assign_bucket,
    encode_dataset_bucketed,
    finetune_lora,
    train_buckets,
)


def test_train_buckets_scaling():
    b1024 = train_buckets(1024)
    from sdxl_tpu.pipeline.resolutions import RESOLUTIONS

    assert b1024 == list(dict.fromkeys(RESOLUTIONS))  # the table itself
    b512 = train_buckets(512)
    assert (512, 512) in b512
    assert all(h % 64 == 0 and w % 64 == 0 for h, w in b512)
    assert all(h >= 64 and w >= 64 for h, w in b512)
    # scaled table keeps the extreme aspects distinct from square
    assert any(w > h for h, w in b512) and any(h > w for h, w in b512)


def test_assign_bucket_by_aspect():
    dims = [(64, 128), (64, 64), (128, 64)]
    assert assign_bucket(200, 100, dims) == 0   # wide image -> wide bucket
    assert assign_bucket(100, 100, dims) == 1
    assert assign_bucket(100, 210, dims) == 2   # tall -> tall bucket


@pytest.fixture()
def tiny_pipe(tokenizer_dir):
    from sdxl_tpu.models.unet import unfuse_unet_qkv
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
    pipe.unet_params = unfuse_unet_qkv(pipe.unet_params)
    return pipe


@pytest.fixture()
def aspect_dataset(tmp_path):
    """3 images: two wide (2:1), one square."""
    from PIL import Image

    d = tmp_path / "data"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i, (h, w) in enumerate([(50, 100), (64, 128), (80, 80)]):
        Image.fromarray((rng.random((h, w, 3)) * 255).astype(
            np.uint8)).save(d / f"img{i}.png")
    return str(d)


def test_encode_bucketed_shapes_and_conditioning(tiny_pipe, aspect_dataset):
    data = encode_dataset_bucketed(tiny_pipe, aspect_dataset, 128, chunk=2)
    assert isinstance(data, BucketedDataset)
    assert data.n == 3 and len(data.buckets) == 2
    by_size = dict(zip(data.sizes, data.buckets))
    assert (128, 128) in by_size
    wide = next(hw for hw in data.sizes if hw[1] > hw[0])
    assert by_size[wide].n == 2
    # latents at each bucket's own latent grid
    assert by_size[(128, 128)].latents.shape[1:] == (16, 16, 4)
    assert by_size[wide].latents.shape[1:] == (wide[0] // 8,
                                               wide[1] // 8, 4)
    # SDXL size conditioning carries the bucket dims: the first two of
    # the 6 sinusoid ints differ between buckets (size_h, size_w)
    assert by_size[wide].label is not None
    assert not np.array_equal(by_size[wide].label[0],
                              by_size[(128, 128)].label[0])


def test_draw_batch_single_bucket_shapes(tiny_pipe, aspect_dataset):
    data = encode_dataset_bucketed(tiny_pipe, aspect_dataset, 128, chunk=2)
    cfg = FinetuneConfig(batch_size=2, accum=2)
    rng = np.random.default_rng(0)
    seen = set()
    for _ in range(8):
        b = _draw_batch(data, None, cfg, rng)
        # accum-stacked batch from ONE bucket: a single static shape
        assert b["latents"].shape[:2] == (2, 2)
        seen.add(b["latents"].shape[2:])
    assert len(seen) == 2  # both buckets get drawn


def test_finetune_lora_bucketed(tiny_pipe, aspect_dataset):
    data = encode_dataset_bucketed(tiny_pipe, aspect_dataset, 64, chunk=2)
    cfg = FinetuneConfig(rank=2, steps=3, batch_size=1, lr=1e-3,
                         remat=False, log_every=0, seed=0)
    factors, _ = finetune_lora(tiny_pipe, data, cfg)
    assert all(np.isfinite(np.asarray(v)).all() for v in factors.values())
