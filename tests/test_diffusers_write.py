"""Diffusers-layout UNet export (io/diffusers_write.py): the writer is
verified as the exact inverse of the importer the ecosystem path uses —
write -> build_unet_from_diffusers == the original pytree bitwise."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdxl_tpu.configs import DiffuserConfig, SD15_DIFFUSER
from sdxl_tpu.io.diffusers_sdxl import build_unet_from_diffusers
from sdxl_tpu.io.diffusers_write import (
    unet_to_diffusers,
    write_diffusers_unet_dir,
)
from sdxl_tpu.models.unet import init_unet

TINY_SDXL = DiffuserConfig(
    adm_in_channels=24, model_channels=32, channel_mults=(1, 2, 4),
    num_head_channels=8, transformer_depths=(1, 1, 2), context_dim=48,
    is_refiner=False,
)


def _tree_equal(a, b):
    fa = jax.tree_util.tree_flatten_with_path(a)[0]
    fb = jax.tree_util.tree_flatten_with_path(b)[0]
    assert len(fa) == len(fb)
    for (pa, la), (pb, lb) in zip(fa, fb):
        assert pa == pb, (pa, pb)
        np.testing.assert_array_equal(
            np.asarray(la, np.float32), np.asarray(lb, np.float32),
            err_msg=str(pa))


@pytest.mark.parametrize("cfg_name", ["tiny_sdxl", "tiny_sd1"])
def test_unet_roundtrip_through_ecosystem_importer(cfg_name):
    if cfg_name == "tiny_sdxl":
        ucfg = TINY_SDXL.unet_config()
    else:
        # SD1-structured: 4 levels, fixed heads, no label embedding,
        # transformers at levels 0-2 (configs.SD15_DIFFUSER shape)
        ucfg = DiffuserConfig(
            adm_in_channels=0, model_channels=32,
            channel_mults=(1, 2, 4, 4), num_head_channels=8, n_heads=4,
            transformer_depths=(1, 1, 1, 0), context_dim=48,
            transformer_levels=(0, 1, 2), is_refiner=False,
        ).unet_config()
    params = init_unet(jax.random.PRNGKey(0), ucfg, jnp.float32)
    flat = unet_to_diffusers(params, ucfg)
    rebuilt = build_unet_from_diffusers(flat, ucfg, jnp.float32)
    _tree_equal(params, rebuilt)


def test_write_dir_and_synthesized_config(tmp_path):
    ucfg = TINY_SDXL.unet_config()
    params = init_unet(jax.random.PRNGKey(1), ucfg, jnp.bfloat16)
    out = write_diffusers_unet_dir(str(tmp_path), params, ucfg)
    assert os.path.isfile(
        os.path.join(out, "diffusion_pytorch_model.safetensors"))
    with open(os.path.join(out, "config.json")) as f:
        meta = json.load(f)
    assert meta["_class_name"] == "UNet2DConditionModel"
    assert meta["block_out_channels"] == [32, 64, 128]
    assert meta["down_block_types"] == [
        "DownBlock2D", "CrossAttnDownBlock2D", "CrossAttnDownBlock2D"]
    assert meta["up_block_types"] == [
        "CrossAttnUpBlock2D", "CrossAttnUpBlock2D", "UpBlock2D"]

    # the written file loads back through the framework's own dir reader
    from sdxl_tpu.io.diffusers_sdxl import _load_safetensors_dir

    tensors = _load_safetensors_dir(out)
    rebuilt = build_unet_from_diffusers(tensors, ucfg, jnp.bfloat16)
    _tree_equal(params, rebuilt)


def test_fused_and_stacked_trees_are_rejected():
    from sdxl_tpu.models.unet import fuse_unet_qkv

    ucfg = TINY_SDXL.unet_config()
    params = init_unet(jax.random.PRNGKey(2), ucfg, jnp.float32)
    fused = fuse_unet_qkv(jax.tree.map(lambda a: a, params))
    with pytest.raises(ValueError, match="fused|unfuse"):
        unet_to_diffusers(fused, ucfg)


def test_unfold_unet_upsample_roundtrip_and_export():
    """fold -> unfold is exact in f32; an unfolded tree (the full-FT
    load path) exports, a folded one errors with guidance."""
    from sdxl_tpu.models.unet import (
        fuse_unet_qkv,
        unfold_unet_upsample,
        unfuse_unet_qkv,
    )

    ucfg = TINY_SDXL.unet_config()
    params = init_unet(jax.random.PRNGKey(3), ucfg, jnp.float32)
    prepped = unfuse_unet_qkv(fuse_unet_qkv(
        jax.tree.map(lambda a: a, params)))
    # the prep folded upsample convs to w4
    up = prepped["output_blocks"][2]["upsample"]
    assert "w4" in up and "w" not in up
    with pytest.raises(ValueError, match="unfold_unet_upsample"):
        unet_to_diffusers(prepped, ucfg)
    unfolded = unfold_unet_upsample(prepped)
    # exact up to f32 addition rounding in the fold/unfold sums
    fa = jax.tree_util.tree_flatten_with_path(params)[0]
    fb = jax.tree_util.tree_flatten_with_path(unfolded)[0]
    assert len(fa) == len(fb)
    for (pa, la), (pb, lb) in zip(fa, fb):
        assert pa == pb
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(lb), atol=1e-7, err_msg=str(pa))
    flat = unet_to_diffusers(unfolded, ucfg)
    rebuilt = build_unet_from_diffusers(flat, ucfg, jnp.float32)
    _tree_equal(unfolded, rebuilt)


# ---------------------------------------------------------------------------
# full pipeline export (write_diffusers_pipeline_dir)
# ---------------------------------------------------------------------------


def test_clip_tower_roundtrip_through_hf_importer():
    """clip_to_hf is the exact tensor inverse of build_clip_from_hf —
    incl. the top-level text_projection placement of the bigG tower
    (the loader's non-text_model prefix wrap)."""
    from sdxl_tpu.configs import CLIPConfig
    from sdxl_tpu.io.diffusers_write import clip_to_hf
    from sdxl_tpu.io.hf_sdxl import build_clip_from_hf
    from sdxl_tpu.models.clip import init_clip

    cfg = CLIPConfig(n_state=32, embed_dim=32, n_head=4, n_layer=2)
    params = init_clip(jax.random.PRNGKey(0), cfg, jnp.float32)
    flat = clip_to_hf(params, with_projection=True)
    assert "text_projection.weight" in flat  # top level, per HF layout
    back = build_clip_from_hf(
        {(k if k.startswith("text_model") else f"text_model.{k}"): v
         for k, v in flat.items()},
        cfg, prefix="text_model")
    _tree_equal(params, back)


def test_vae_roundtrip_through_diffusers_importer():
    from sdxl_tpu.configs import AutoencoderConfig
    from sdxl_tpu.io.diffusers_sdxl import build_vae_from_diffusers
    from sdxl_tpu.io.diffusers_write import vae_to_diffusers
    from sdxl_tpu.models.vae import init_autoencoder

    cfg = AutoencoderConfig(
        encoder_channels=((16, 16), (16, 32), (32, 32), (32, 32)),
        decoder_channels=((32, 32), (32, 32), (32, 16), (16, 16)),
        n_group=4,
    )
    params = init_autoencoder(jax.random.PRNGKey(1), cfg)
    flat = vae_to_diffusers(params)
    back = build_vae_from_diffusers(flat, cfg, jnp.float32)
    _tree_equal(params, back)


def test_full_pipeline_dir_roundtrip(tmp_path, tokenizer_dir):
    """write_diffusers_pipeline_dir -> detect_format == diffusers ->
    load_sdxl_diffusers_dir reproduces every tower bitwise, the scale
    factor, and the scheduler's alpha-bar table; the exported tokenizer
    tables re-load through the package's own BPE machinery and encode
    identically."""
    from sdxl_tpu.configs import AutoencoderConfig
    from sdxl_tpu.io.diffusers_sdxl import load_sdxl_diffusers_dir
    from sdxl_tpu.io.diffusers_write import write_diffusers_pipeline_dir
    from sdxl_tpu.models.unet import unfold_unet_upsample, unfuse_unet_qkv
    from sdxl_tpu.pipeline.loader import detect_format
    from sdxl_tpu.pipeline.pipeline import random_pipeline
    from tests.test_pipeline_e2e import TINY_DIFFUSER, TINY_EMBEDDER

    # diffusers-canonical decoder plan (the exporter validates it: the
    # config layout cannot represent any other decoder derivation)
    tiny_vae = AutoencoderConfig(
        encoder_channels=((16, 16), (16, 32), (32, 32), (32, 32)),
        decoder_channels=((32, 32), (32, 32), (32, 32), (32, 16)),
        n_group=4,
    )
    pipe = random_pipeline(
        embedder_cfg=TINY_EMBEDDER, diffuser_cfg=TINY_DIFFUSER,
        vae_cfg=tiny_vae, compute_dtype=jnp.float32,
        param_dtype_unet=jnp.float32, tokenizer_dir=tokenizer_dir,
    )
    # SDXL's first tower contributes hidden states only (no projection
    # in real CLIPTextModel checkpoints)
    pipe.embedder_params["clip"]["text_projection"] = None

    out = str(tmp_path / "exported")
    write_diffusers_pipeline_dir(out, pipe)
    assert detect_format(out) == "diffusers"
    for sub in ("unet", "vae", "text_encoder", "text_encoder_2",
                "tokenizer", "tokenizer_2", "scheduler"):
        assert os.path.isdir(os.path.join(out, sub)), sub
    assert os.path.isfile(os.path.join(out, "model_index.json"))

    emb, unet, vae, alphas, scale, d_cfg = load_sdxl_diffusers_dir(
        out, TINY_DIFFUSER, TINY_EMBEDDER, jnp.float32)
    want_unet = unfold_unet_upsample(unfuse_unet_qkv(pipe.unet_params))
    _tree_equal(want_unet, unet)
    _tree_equal(pipe.vae_params, vae)
    _tree_equal(pipe.embedder_params["clip"], emb["clip"])
    _tree_equal(pipe.embedder_params["open_clip"], emb["open_clip"])
    assert scale == pytest.approx(float(pipe.scale_factor))
    np.testing.assert_allclose(np.asarray(alphas),
                               np.asarray(pipe.alphas_cumprod),
                               rtol=1e-6, atol=1e-7)

    # tokenizer tables: the exported HF vocab.json/merges.txt rebuild a
    # BPE that encodes identically to the package's own
    from sdxl_tpu.tokenizer.bpe import Tokenizer

    def rebuild(sub, cache_specials):
        with open(os.path.join(out, sub, "merges.txt")) as f:
            lines = f.read().splitlines()
        assert lines[0].startswith("#version")
        merges = [tuple(ln.split(" ")) for ln in lines[1:] if ln]
        with open(os.path.join(out, sub, "vocab.json")) as f:
            v = json.load(f)
        vocab = [w for w, _ in sorted(v.items(), key=lambda kv: kv[1])]
        assert len(vocab) == len(v)  # ids are dense
        return Tokenizer(merges, vocab, cache_specials)

    t1 = rebuild("tokenizer", True)
    t2 = rebuild("tokenizer_2", False)
    for text in ("a photo of a crab", "Hello, WORLD!!"):
        assert t1.encode(text) == pipe.clip_tokenizer.encode(text)
        assert t2.encode(text) == pipe.open_clip_tokenizer.encode(text)


def test_config_inference_resolves_sdxl_presets(tmp_path):
    """An empty dir (no config.json files) and the real stabilityai
    config fields both resolve to the SDXL presets; the diffusers
    attention_head_dim head-count quirk ([5,10,20] = heads per level)
    is decoded to num_head_channels=64."""
    from sdxl_tpu.configs import SDXL_BASE_DIFFUSER, SDXL_EMBEDDER
    from sdxl_tpu.io.diffusers_sdxl import (
        infer_sdxl_configs_from_diffusers_dir,
    )

    e, d, v = infer_sdxl_configs_from_diffusers_dir(str(tmp_path))
    assert e == SDXL_EMBEDDER and d == SDXL_BASE_DIFFUSER

    # the real stabilityai/stable-diffusion-xl-base-1.0 unet config fields
    os.makedirs(tmp_path / "unet")
    with open(tmp_path / "unet" / "config.json", "w") as f:
        json.dump({
            "block_out_channels": [320, 640, 1280],
            "down_block_types": ["DownBlock2D", "CrossAttnDownBlock2D",
                                 "CrossAttnDownBlock2D"],
            "transformer_layers_per_block": [1, 2, 10],
            "attention_head_dim": [5, 10, 20],
            "num_attention_heads": None,
            "cross_attention_dim": 2048,
            "addition_embed_type": "text_time",
            "projection_class_embeddings_input_dim": 2816,
            "in_channels": 4,
        }, f)
    _, d2, _ = infer_sdxl_configs_from_diffusers_dir(str(tmp_path))
    assert d2 == SDXL_BASE_DIFFUSER
    assert d2.num_head_channels == 64 and d2.n_heads == 0


def test_exported_dir_loads_through_load_pipeline(tmp_path, tokenizer_dir):
    """The CLI path: cli/convert --to diffusers output loads back through
    load_pipeline's format detection + config INFERENCE (no caller
    configs) and reproduces the towers bitwise — the failure mode this
    pins was a real one (default SDXL configs applied to a tiny dir)."""
    from sdxl_tpu.configs import AutoencoderConfig
    from sdxl_tpu.io.diffusers_write import write_diffusers_pipeline_dir
    from sdxl_tpu.models.unet import unfold_unet_upsample, unfuse_unet_qkv
    from sdxl_tpu.pipeline.loader import load_pipeline
    from sdxl_tpu.pipeline.pipeline import random_pipeline
    from tests.test_pipeline_e2e import TINY_DIFFUSER, TINY_EMBEDDER

    # diffusers-canonical tiny VAE: the decoder plan follows the
    # AutoencoderKL rule (pairs over reversed block_out_channels) — the
    # only decoder layout vae/config.json can represent
    tiny_vae = AutoencoderConfig(
        encoder_channels=((16, 16), (16, 32), (32, 32), (32, 32)),
        decoder_channels=((32, 32), (32, 32), (32, 32), (32, 16)),
        n_group=4,
    )
    pipe = random_pipeline(
        embedder_cfg=TINY_EMBEDDER, diffuser_cfg=TINY_DIFFUSER,
        vae_cfg=tiny_vae, compute_dtype=jnp.float32,
        param_dtype_unet=jnp.float32, tokenizer_dir=tokenizer_dir,
    )
    pipe.embedder_params["clip"]["text_projection"] = None
    out = str(tmp_path / "exported")
    write_diffusers_pipeline_dir(out, pipe)

    loaded = load_pipeline(out, compute_dtype=jnp.float32,
                           tokenizer_dir=tokenizer_dir,
                           stack_transformers=False)
    assert loaded.embedder_cfg == TINY_EMBEDDER
    assert loaded.diffuser_cfg == TINY_DIFFUSER
    assert loaded.vae_cfg == tiny_vae
    want_unet = unfold_unet_upsample(unfuse_unet_qkv(pipe.unet_params))
    # load_pipeline re-fuses qkv and phase-folds the upsample convs at
    # build; undo both — the fold/unfold round-trip costs ~1 ulp on the
    # upsample kernels, so allclose (not bitwise) there
    got_unet = unfold_unet_upsample(unfuse_unet_qkv(loaded.unet_params))
    fa = jax.tree_util.tree_flatten_with_path(want_unet)[0]
    fb = jax.tree_util.tree_flatten_with_path(got_unet)[0]
    assert len(fa) == len(fb)
    for (pa, la), (pb, lb) in zip(fa, fb):
        assert pa == pb, (pa, pb)
        np.testing.assert_allclose(
            np.asarray(la, np.float32), np.asarray(lb, np.float32),
            rtol=1e-6, atol=1e-7, err_msg=str(pa))
    _tree_equal(pipe.vae_params, loaded.vae_params)
    _tree_equal(pipe.embedder_params["clip"],
                loaded.embedder_params["clip"])
    _tree_equal(pipe.embedder_params["open_clip"],
                loaded.embedder_params["open_clip"])
    np.testing.assert_allclose(np.asarray(loaded.alphas_cumprod),
                               np.asarray(pipe.alphas_cumprod),
                               rtol=1e-6, atol=1e-7)


def test_sd1_pipeline_dir_roundtrip(tmp_path, tokenizer_dir):
    """write_sd1_diffusers_pipeline_dir (the .ckpt -> diffusers flow's
    writer) -> load_sd1_diffusers_dir reproduces the towers bitwise; the
    scheduler carries the family's prediction_type and the model_index
    is a StableDiffusionPipeline."""
    from sdxl_tpu.configs import AutoencoderConfig, CLIPConfig, DiffuserConfig
    from sdxl_tpu.io.diffusers_sdxl import load_sd1_diffusers_dir
    from sdxl_tpu.io.diffusers_write import write_sd1_diffusers_pipeline_dir
    from sdxl_tpu.models.clip import init_clip
    from sdxl_tpu.models.unet import init_unet
    from sdxl_tpu.models.vae import init_autoencoder
    from sdxl_tpu.tokenizer import ClipTokenizer

    d_cfg = DiffuserConfig(
        adm_in_channels=0, model_channels=8, channel_mults=(1, 2, 4, 4),
        num_head_channels=0, transformer_depths=(1, 1, 1, 1),
        context_dim=16, transformer_levels=(0, 1, 2), n_heads=2,
        prediction_type="v",
    )
    clip_cfg = CLIPConfig(n_state=16, embed_dim=16, n_head=2, n_layer=2)
    vae_cfg = AutoencoderConfig(
        encoder_channels=((16, 16), (16, 32), (32, 32), (32, 32)),
        decoder_channels=((32, 32), (32, 32), (32, 32), (32, 16)),
        n_group=4,
    )
    unet = init_unet(jax.random.PRNGKey(0), d_cfg.unet_config(),
                     jnp.float32)
    clip = init_clip(jax.random.PRNGKey(1), clip_cfg, jnp.float32)
    clip["text_projection"] = None  # HF CLIPTextModel has no projection
    vae = init_autoencoder(jax.random.PRNGKey(2), vae_cfg)

    out = str(tmp_path / "sd1_exported")
    write_sd1_diffusers_pipeline_dir(
        out, d_cfg, unet, clip_cfg, clip, vae,
        ClipTokenizer(tokenizer_dir), vae_cfg=vae_cfg, sd2=False)

    for sub in ("unet", "vae", "text_encoder", "tokenizer", "scheduler"):
        assert os.path.isdir(os.path.join(out, sub)), sub
    with open(os.path.join(out, "model_index.json")) as f:
        assert json.load(f)["_class_name"] == "StableDiffusionPipeline"
    with open(os.path.join(out, "scheduler",
                           "scheduler_config.json")) as f:
        assert json.load(f)["prediction_type"] == "v_prediction"

    got_clip, got_unet, got_vae, alphas, scale, got_cfg = (
        load_sd1_diffusers_dir(out, d_cfg, clip_cfg, jnp.float32))
    assert got_cfg == d_cfg
    _tree_equal(unet, got_unet)
    _tree_equal(vae, got_vae)
    _tree_equal(clip, got_clip)
