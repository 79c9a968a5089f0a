"""In-training validation sampling (train/validate.py): cadence inside
_run_loop, runtime-LoRA application, tower restoration after each
sample, and PNG output."""

import glob
import os

import jax.numpy as jnp
import numpy as np
import pytest

from sdxl_tpu.train.finetune import (
    FinetuneConfig,
    encode_dataset,
    finetune_lora,
)


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
def dataset_dir(tmp_path):
    from PIL import Image

    d = tmp_path / "data"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        Image.fromarray((rng.random((48, 48, 3)) * 255).astype(
            np.uint8)).save(d / f"img{i}.png")
    return str(d)


def test_lora_validation_sampling(tiny_pipe, dataset_dir, tmp_path):
    val_dir = str(tmp_path / "val")
    data = encode_dataset(tiny_pipe, dataset_dir, 32, chunk=2)
    cfg = FinetuneConfig(
        rank=2, steps=2, batch_size=1, lr=1e-3, remat=False, log_every=0,
        sample_every=1, sample_prompt="a validation crab",
        sample_steps=1, sample_resolution=32, sample_dir=val_dir)
    before = jnp.asarray(tiny_pipe.unet_params["middle_block"]["res1"]
                         ["conv_in"]["w"])
    factors, _ = finetune_lora(tiny_pipe, data, cfg)

    # one PNG per cadence hit, step-tagged
    pngs = sorted(glob.glob(os.path.join(val_dir, "*.png")))
    assert [os.path.basename(p) for p in pngs] == [
        "step000001_0.png", "step000002_0.png"]
    # the pipeline's tower was restored after each sample: no lora leaves
    # left behind, leaves untouched
    assert "lora_down" not in tiny_pipe.unet_params["middle_block"][
        "transformer"]["blocks"][0]["attn1"]["q"]
    np.testing.assert_array_equal(
        np.asarray(tiny_pipe.unet_params["middle_block"]["res1"]
                   ["conv_in"]["w"]), np.asarray(before))


def test_sampler_requires_prompt(tiny_pipe):
    from sdxl_tpu.train.validate import make_validation_sampler

    cfg = FinetuneConfig(sample_every=5, sample_prompt="")
    with pytest.raises(ValueError, match="sample-prompt"):
        make_validation_sampler(tiny_pipe, cfg, "lora", out_dir="x")
    cfg_off = FinetuneConfig(sample_every=0)
    assert make_validation_sampler(tiny_pipe, cfg_off, "lora",
                                   out_dir="x") is None
