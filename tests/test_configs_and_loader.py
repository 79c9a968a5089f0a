"""Config JSON interop and pipeline-loader format detection tests."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdxl_tpu.configs import (
    CLIPConfig,
    DiffuserConfig,
    EmbedderConfig,
    LatentDecoderConfig,
    SDXL_BASE_DIFFUSER,
    load_cfg,
    save_cfg,
)


def test_diffuser_cfg_roundtrip(tmp_path):
    p = str(tmp_path / "diffuser.cfg")
    save_cfg(p, SDXL_BASE_DIFFUSER)
    loaded = load_cfg(p, DiffuserConfig)
    assert loaded == SDXL_BASE_DIFFUSER


def test_cfg_accepts_burn_field_layout(tmp_path):
    """A .cfg as burn's Config serializer writes it (plain field map,
    sample/main.rs:28-51) must load, including extra/unknown fields."""
    p = str(tmp_path / "diffuser.cfg")
    with open(p, "w") as f:
        json.dump(
            {
                "adm_in_channels": 2816,
                "model_channels": 320,
                "channel_mults": [1, 2, 4],
                "num_head_channels": 64,
                "transformer_depths": [1, 2, 10],
                "context_dim": 2048,
                "is_refiner": False,
                "some_future_field": 42,
            },
            f,
        )
    loaded = load_cfg(p, DiffuserConfig)
    assert loaded.channel_mults == (1, 2, 4)
    assert loaded.unet_config().context_dim == 2048


def test_embedder_cfg_nested(tmp_path):
    p = str(tmp_path / "embedder.cfg")
    with open(p, "w") as f:
        json.dump(
            {
                "clip_config": {
                    "n_vocab": 49408, "n_state": 768, "embed_dim": 768,
                    "n_head": 12, "n_ctx": 77, "n_layer": 12, "quick_gelu": True,
                },
                "open_clip_config": {
                    "n_vocab": 49408, "n_state": 1280, "embed_dim": 1280,
                    "n_head": 20, "n_ctx": 77, "n_layer": 32, "quick_gelu": False,
                },
            },
            f,
        )
    cfg = load_cfg(p, EmbedderConfig)
    assert cfg.clip_config.n_layer == 12
    assert cfg.open_clip_config.n_state == 1280


def test_latent_decoder_cfg(tmp_path):
    p = str(tmp_path / "latent_decoder.cfg")
    with open(p, "w") as f:
        json.dump({"scale_factor": 0.13025}, f)
    cfg = load_cfg(p, LatentDecoderConfig)
    assert abs(cfg.scale_factor - 0.13025) < 1e-9


def test_loader_detects_native(tmp_path):
    from sdxl_tpu.pipeline.loader import detect_format

    with pytest.raises(FileNotFoundError):
        detect_format(str(tmp_path))
    open(tmp_path / "embedder.safetensors", "w").close()
    assert detect_format(str(tmp_path)) == "native"


def test_loader_detects_mpk_and_npy(tmp_path):
    from sdxl_tpu.pipeline.loader import detect_format

    d1 = tmp_path / "a"
    d1.mkdir()
    open(d1 / "embedder.mpk", "w").close()
    assert detect_format(str(d1)) == "mpk"

    d2 = tmp_path / "b"
    (d2 / "embedder").mkdir(parents=True)
    assert detect_format(str(d2)) == "npy"


def test_cli_parser_reference_defaults():
    from sdxl_tpu.cli.sample import build_parser

    args = build_parser().parse_args(
        ["--prompt", "x", "--output-dir", "/tmp/x"]
    )
    # reference defaults (sample/main.rs:106-111, 222-226)
    assert args.unconditional_guidance_scale == 7.5
    assert args.n_diffusion_steps == 30
    assert args.height == 1024 and args.width == 1024
    assert not args.use_refiner and not args.crop_out


def test_native_checkpoint_pipeline_roundtrip(tmp_path, tokenizer_dir):
    """convert-style save -> load_pipeline(native) -> run one tiny step."""
    from sdxl_tpu.configs import AutoencoderConfig
    from sdxl_tpu.io import checkpoint as ckpt
    from sdxl_tpu.models.clip import init_clip
    from sdxl_tpu.models.unet import init_unet
    from sdxl_tpu.models.vae import init_autoencoder
    from sdxl_tpu.pipeline.loader import load_pipeline
    from sdxl_tpu.pipeline.sampler import scaled_linear_alphas_cumprod

    e_cfg = EmbedderConfig(
        clip_config=CLIPConfig(n_state=32, embed_dim=32, n_head=4, n_layer=2),
        open_clip_config=CLIPConfig(
            n_state=32, embed_dim=32, n_head=4, n_layer=2, quick_gelu=False
        ),
    )
    d_cfg = DiffuserConfig(
        adm_in_channels=32 + 6 * 256, model_channels=32,
        channel_mults=(1, 2, 4), num_head_channels=8,
        transformer_depths=(1, 1, 1), context_dim=64,
    )
    # NOTE: loader uses the default AutoencoderConfig; build matching params
    v_cfg = AutoencoderConfig()

    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    out = str(tmp_path)
    ckpt.save_native(
        os.path.join(out, "embedder.safetensors"),
        {
            "clip": init_clip(keys[0], e_cfg.clip_config),
            "open_clip": init_clip(keys[1], e_cfg.open_clip_config),
        },
    )
    save_cfg(os.path.join(out, "embedder.cfg"), e_cfg)
    ckpt.save_native(
        os.path.join(out, "diffuser.safetensors"),
        init_unet(keys[2], d_cfg.unet_config(), jnp.float32),
    )
    save_cfg(os.path.join(out, "diffuser.cfg"), d_cfg)
    ckpt.save_native(
        os.path.join(out, "alphas_cumprod.safetensors"),
        {"alphas_cumprod": scaled_linear_alphas_cumprod()},
    )
    ckpt.save_native(
        os.path.join(out, "latent_decoder.safetensors"),
        init_autoencoder(keys[3], v_cfg),
    )
    save_cfg(os.path.join(out, "latent_decoder.cfg"), LatentDecoderConfig())

    pipe = load_pipeline(out, compute_dtype=jnp.float32,
                         tokenizer_dir=tokenizer_dir)
    imgs = pipe.txt2img("a cat", resolution=(64, 64), n_steps=1, seed=0)
    assert imgs.shape == (1, 64, 64, 3)
