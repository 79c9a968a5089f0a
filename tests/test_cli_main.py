"""CLI main() end-to-end on tiny configs (random_pipeline patched)."""

import numpy as np
import pytest

import sdxl_tpu.cli.sample as cli
from tests.test_pipeline_e2e import TINY_DIFFUSER, TINY_EMBEDDER, TINY_VAE


@pytest.fixture()
def tiny_cli(monkeypatch, tokenizer_dir):
    import jax.numpy as jnp

    from sdxl_tpu.pipeline import pipeline as pl

    real = pl.random_pipeline

    def tiny_random_pipeline(**kw):
        return real(
            embedder_cfg=TINY_EMBEDDER,
            diffuser_cfg=TINY_DIFFUSER,
            vae_cfg=TINY_VAE,
            compute_dtype=jnp.float32,
            param_dtype_unet=jnp.float32,
            tokenizer_dir=tokenizer_dir,
        )

    # cli imports random_pipeline inside main(); patch at the source module
    monkeypatch.setattr(pl, "random_pipeline", tiny_random_pipeline)
    return cli


@pytest.mark.parametrize("sampler", ["ddim", "euler", "dpmpp"])
def test_cli_txt2img(tiny_cli, tmp_path, sampler):
    out = str(tmp_path / f"img_{sampler}_")
    rc = tiny_cli.main(
        [
            "--random-weights",
            "--prompt", "a cat",
            "--output-dir", out,
            "--n-diffusion-steps", "1",
            "--height", "64", "--width", "64",
            "--seed", "3",
            "--sampler", sampler,
        ]
    )
    assert rc == 0
    from PIL import Image

    img = np.asarray(Image.open(out + "0.png"))
    assert img.shape == (64, 64, 3)


def test_cli_requires_model_dir_or_random(tiny_cli, tmp_path):
    rc = tiny_cli.main(
        ["--prompt", "a cat", "--output-dir", str(tmp_path / "x_")]
    )
    assert rc == 1


def test_cli_inpaint_crop_out(tiny_cli, tmp_path):
    from PIL import Image

    ref = np.random.default_rng(0).integers(0, 255, (512, 2048, 3)).astype(np.uint8)
    ref_path = str(tmp_path / "ref.png")
    Image.fromarray(ref).save(ref_path)

    out = str(tmp_path / "inp_")
    rc = tiny_cli.main(
        [
            "--random-weights",
            "--prompt", "a cat",
            "--output-dir", out,
            "--reference-img", ref_path,
            "--crop-left", "0", "--crop-right", "128",
            "--crop-top", "0", "--crop-bottom", "128",
            "--crop-out",
            "--n-diffusion-steps", "1",
        ]
    )
    assert rc == 0
    img = np.asarray(Image.open(out + "0.png"))
    assert img.shape == (512, 2048, 3)


def test_cli_clip_skip_and_no_cfg(tiny_cli, tmp_path):
    # out-of-range clip-skip is a clean error (tiny towers are 2/3 layers)
    rc = tiny_cli.main([
        "--random-weights", "--prompt", "x",
        "--output-dir", str(tmp_path / "a_"),
        "--clip-skip", "99", "--height", "64", "--width", "64",
        "--n-diffusion-steps", "1",
    ])
    assert rc == 1
    # valid clip-skip + no-cfg + rescale run end-to-end
    rc = tiny_cli.main([
        "--random-weights", "--prompt", "a cat",
        "--output-dir", str(tmp_path / "b_"),
        "--clip-skip", "0", "--no-cfg", "--guidance-rescale", "0.0",
        "--height", "64", "--width", "64", "--n-diffusion-steps", "1",
    ])
    assert rc == 0


def test_cli_multi_prompt_and_png_metadata(tiny_cli, tmp_path):
    out = str(tmp_path / "multi_")
    rc = tiny_cli.main([
        "--random-weights",
        "--prompt", "a cat", "--prompt", "a dog",
        "--output-dir", out,
        "--n-diffusion-steps", "1", "--height", "64", "--width", "64",
        "--seed", "7",
    ])
    assert rc == 0
    from PIL import Image

    im0, im1 = Image.open(out + "0.png"), Image.open(out + "1.png")
    assert im0.size == (64, 64)
    # distinct prompts produce distinct images in one batch
    assert np.asarray(im0).tolist() != np.asarray(im1).tolist()
    # generation parameters travel in the PNG text chunk
    params = im0.info.get("parameters", "")
    assert "a cat | a dog" in params and "Seed: 7" in params
    # --prompt + --batch together is an error
    rc = tiny_cli.main([
        "--random-weights", "--prompt", "a", "--prompt", "b",
        "--batch", "2", "--output-dir", out,
    ])
    assert rc == 1
