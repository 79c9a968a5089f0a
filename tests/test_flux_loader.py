"""Flux diffusers-layout importer tests (synthetic inverse-mapped
checkpoints), schedule transcription, and tiny end-to-end pipeline runs."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from sdxl_tpu.configs import AutoencoderConfig, CLIPConfig, FluxConfig, T5Config
from sdxl_tpu.io.flux import build_flux_from_diffusers, flux_config_from_dir
from sdxl_tpu.models.flux import init_flux
from sdxl_tpu.pipeline.flux import flux_schedule
from tests.test_flux import TINY as TINY_FLUX
from tests.test_hf_sdxl import inv_linear
from tests.test_io import assert_trees_close

TINY_CLIP_L = CLIPConfig(n_vocab=49408, n_state=32, embed_dim=32, n_head=4,
                         n_ctx=77, n_layer=2, quick_gelu=True)
# pipeline fixtures condition on the UNPROJECTED CLIP pooler output, so
# pooled_projection_dim must equal the tower's hidden size
TINY_FLUX_PIPE = FluxConfig(**{**TINY_FLUX.__dict__,
                               "pooled_projection_dim": 32})
TINY_T5 = T5Config(vocab_size=128, d_model=TINY_FLUX.joint_attention_dim,
                   d_kv=8, d_ff=64, n_heads=4, n_layers=2,
                   relative_buckets=8, relative_max_distance=16)
# TINY_FLUX.in_channels = 16 -> a 4-channel latent (2x2-packed)
TINY_FLUX_VAE = AutoencoderConfig(
    encoder_channels=((16, 16), (16, 32), (32, 32), (32, 32)),
    decoder_channels=((32, 32), (32, 32), (32, 16), (16, 16)),
    n_group=4, n_channels_out=8, latent_channels=4,
)


def make_diffusers_flux_dict(cfg: FluxConfig, params):
    d = {}
    inv_linear(d, "x_embedder", params["x_embedder"])
    inv_linear(d, "context_embedder", params["context_embedder"])
    te = params["time_text_embed"]
    inv_linear(d, "time_text_embed.timestep_embedder.linear_1",
               te["timestep_lin1"])
    inv_linear(d, "time_text_embed.timestep_embedder.linear_2",
               te["timestep_lin2"])
    inv_linear(d, "time_text_embed.text_embedder.linear_1", te["text_lin1"])
    inv_linear(d, "time_text_embed.text_embedder.linear_2", te["text_lin2"])
    if cfg.guidance_embeds:
        inv_linear(d, "time_text_embed.guidance_embedder.linear_1",
                   te["guidance_lin1"])
        inv_linear(d, "time_text_embed.guidance_embedder.linear_2",
                   te["guidance_lin2"])
    for i, blk in enumerate(params["blocks"]):
        pre = f"transformer_blocks.{i}"
        inv_linear(d, f"{pre}.norm1.linear", blk["norm1"]["mod"])
        inv_linear(d, f"{pre}.norm1_context.linear",
                   blk["norm1_context"]["mod"])
        a = blk["attn"]
        for nm in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj",
                   "add_v_proj", "to_add_out"):
            inv_linear(d, f"{pre}.attn.{nm}", a[nm])
        inv_linear(d, f"{pre}.attn.to_out.0", a["to_out"])
        for nm in ("norm_q", "norm_k", "norm_added_q", "norm_added_k"):
            d[f"{pre}.attn.{nm}.weight"] = np.asarray(a[nm]["w"])
        inv_linear(d, f"{pre}.ff.net.0.proj", blk["mlp"]["in"])
        inv_linear(d, f"{pre}.ff.net.2", blk["mlp"]["out"])
        inv_linear(d, f"{pre}.ff_context.net.0.proj",
                   blk["mlp_context"]["in"])
        inv_linear(d, f"{pre}.ff_context.net.2", blk["mlp_context"]["out"])
    for i, blk in enumerate(params["single_blocks"]):
        pre = f"single_transformer_blocks.{i}"
        inv_linear(d, f"{pre}.norm.linear", blk["norm"]["mod"])
        a = blk["attn"]
        for nm in ("to_q", "to_k", "to_v"):
            inv_linear(d, f"{pre}.attn.{nm}", a[nm])
        for nm in ("norm_q", "norm_k"):
            d[f"{pre}.attn.{nm}.weight"] = np.asarray(a[nm]["w"])
        inv_linear(d, f"{pre}.proj_mlp", blk["proj_mlp"])
        inv_linear(d, f"{pre}.proj_out", blk["proj_out"])
    inv_linear(d, "norm_out.linear", params["norm_out"]["mod"])
    inv_linear(d, "proj_out", params["proj_out"])
    return d


def test_flux_diffusers_roundtrip(tmp_path):
    params = init_flux(jax.random.PRNGKey(0), TINY_FLUX, jnp.float32)
    d = make_diffusers_flux_dict(TINY_FLUX, params)
    with open(tmp_path / "config.json", "w") as f:
        json.dump({"attention_head_dim": TINY_FLUX.head_dim,
                   "num_attention_heads": TINY_FLUX.n_heads,
                   "axes_dims_rope": list(TINY_FLUX.axes_dims)}, f)
    cfg = flux_config_from_dir(str(tmp_path), d)
    assert cfg.num_layers == TINY_FLUX.num_layers
    assert cfg.num_single_layers == TINY_FLUX.num_single_layers
    assert cfg.guidance_embeds and cfg.axes_dims == TINY_FLUX.axes_dims
    assert cfg.in_channels == 16 and cfg.n_heads == 2
    loaded = build_flux_from_diffusers(d, cfg, jnp.float32)
    assert_trees_close(params, loaded)


def test_flux_schnell_config_detected(tmp_path):
    cfg_s = FluxConfig(**{**TINY_FLUX.__dict__, "guidance_embeds": False})
    params = init_flux(jax.random.PRNGKey(1), cfg_s, jnp.float32)
    d = make_diffusers_flux_dict(cfg_s, params)
    detected = flux_config_from_dir(str(tmp_path), d)  # no config.json
    assert not detected.guidance_embeds
    assert detected.axes_dims == (4, 2, 2)  # shape-inferred for head_dim 8
    loaded = build_flux_from_diffusers(
        d, FluxConfig(**{**detected.__dict__, "head_dim": 8, "n_heads": 2}),
        jnp.float32)
    assert_trees_close(params, loaded)


def test_flux_schedule_matches_transcription():
    """Literal transcription of FluxPipeline.calculate_shift +
    FlowMatchEulerDiscreteScheduler.set_timesteps(use_dynamic_shifting)."""
    n, seq_len = 9, 1024

    sigmas_t = torch.linspace(1.0, 1.0 / n, n, dtype=torch.float64)
    m = (1.15 - 0.5) / (4096 - 256)
    b = 0.5 - m * 256
    mu = seq_len * m + b
    shifted = torch.exp(torch.tensor(mu)) / (
        torch.exp(torch.tensor(mu)) + (1.0 / sigmas_t - 1.0))
    ts_ref = (shifted * 1000).float().numpy()
    sig_ref = np.concatenate([shifted.float().numpy(), [0.0]])

    ts, sig = flux_schedule(n, seq_len)
    np.testing.assert_allclose(ts, ts_ref, rtol=1e-6)
    np.testing.assert_allclose(sig, sig_ref, rtol=1e-6)
    # sigma = 1 is a fixed point of the exp shift; strictly descending
    assert sig[0] == 1.0 and np.all(np.diff(sig) < 0)

    # the static shift=1 path (schnell) is the identity spacing
    ts_s, sig_s = flux_schedule(n, seq_len, dynamic=False, shift=1.0)
    np.testing.assert_allclose(
        sig_s[:-1], np.linspace(1.0, 1.0 / n, n), rtol=1e-6)
    # a larger image shifts the whole schedule toward high noise
    _, sig_big = flux_schedule(n, 4096)
    assert np.all(sig_big[:-1] >= sig[:-1])


@pytest.fixture(scope="module")
def tiny_flux_pipe(tokenizer_dir):
    from sdxl_tpu.pipeline.flux import random_flux_pipeline

    return random_flux_pipeline(
        flux_cfg=TINY_FLUX_PIPE, clip_cfg=TINY_CLIP_L,
        vae_cfg=TINY_FLUX_VAE,
        t5_cfg=TINY_T5, t5_tokens=16, compute_dtype=jnp.float32,
        tokenizer_dir=tokenizer_dir,
    )


def test_flux_pipeline_e2e(tiny_flux_pipe):
    pipe = tiny_flux_pipe
    img = pipe.txt2img(["a crab on a beach"], resolution=(64, 64),
                       n_steps=2, guidance_scale=3.5, seed=0)
    assert img.shape == (1, 64, 64, 3) and img.dtype == np.uint8
    img2 = pipe.txt2img(["a crab on a beach"], resolution=(64, 64),
                        n_steps=2, guidance_scale=3.5, seed=0)
    np.testing.assert_array_equal(img, img2)
    # guidance changes the result (the distilled-guidance embedding)
    img3 = pipe.txt2img(["a crab on a beach"], resolution=(64, 64),
                        n_steps=2, guidance_scale=1.0, seed=0)
    assert not np.array_equal(img, img3)
    out = pipe.img2img(["a blue crab"], img, strength=0.5, n_steps=4,
                       guidance_scale=3.5, seed=2)
    assert out.shape == (1, 64, 64, 3)
    with pytest.raises(ValueError, match="multiple of 16"):
        pipe.txt2img(["x"], resolution=(72, 72), n_steps=2)


def test_flux_per_image_seeds(tiny_flux_pipe):
    pipe = tiny_flux_pipe
    batch = pipe.txt2img(["a cat", "a dog"], resolution=(64, 64),
                         n_steps=2, guidance_scale=3.5, seed=[7, 9])
    solo = pipe.txt2img(["a cat"], resolution=(64, 64), n_steps=2,
                        guidance_scale=3.5, seed=[7])
    d = np.abs(batch[0].astype(int) - solo[0].astype(int))
    assert d.max() <= 1 and d.mean() < 0.01, (d.max(), d.mean())


def test_flux_dir_load_and_generate(tmp_path, tokenizer_dir):
    from safetensors.numpy import save_file

    from sdxl_tpu.models.clip import init_clip
    from sdxl_tpu.models.t5 import init_t5
    from sdxl_tpu.models.vae import init_autoencoder
    from sdxl_tpu.pipeline.flux import load_flux_pipeline
    from tests.test_diffusers_sdxl import make_diffusers_vae_dict
    from tests.test_sd3_loader import _make_hf_clip_dict, make_hf_t5_dict

    root = tmp_path / "flux_ckpt"

    def write(sub, d, config=None):
        os.makedirs(root / sub, exist_ok=True)
        save_file({k: np.ascontiguousarray(v) for k, v in d.items()},
                  str(root / sub / "model.safetensors"))
        if config is not None:
            with open(root / sub / "config.json", "w") as f:
                json.dump(config, f)

    flux = init_flux(jax.random.PRNGKey(0), TINY_FLUX_PIPE, jnp.float32)
    write("transformer", make_diffusers_flux_dict(TINY_FLUX_PIPE, flux),
          {"attention_head_dim": TINY_FLUX_PIPE.head_dim,
           "num_attention_heads": TINY_FLUX_PIPE.n_heads,
           "axes_dims_rope": list(TINY_FLUX_PIPE.axes_dims)})
    clip = init_clip(jax.random.PRNGKey(1), TINY_CLIP_L)
    write("text_encoder", _make_hf_clip_dict(TINY_CLIP_L, clip),
          {"hidden_size": 32, "num_attention_heads": 4,
           "num_hidden_layers": 2, "hidden_act": "quick_gelu"})
    t5 = init_t5(jax.random.PRNGKey(2), TINY_T5, jnp.float32)
    write("text_encoder_2", make_hf_t5_dict(TINY_T5, t5),
          {"d_model": TINY_T5.d_model, "d_kv": 8, "d_ff": 64,
           "num_heads": 4, "num_layers": 2, "vocab_size": 128,
           "relative_attention_num_buckets": 8,
           "relative_attention_max_distance": 16})
    vae = init_autoencoder(jax.random.PRNGKey(3), TINY_FLUX_VAE)
    vd = make_diffusers_vae_dict(vae)
    # Flux VAEs ship WITHOUT the quant convs
    vd = {k: v for k, v in vd.items() if "quant_conv" not in k}
    write("vae", vd, {"norm_num_groups": 4, "latent_channels": 4,
                      "scaling_factor": 0.3611, "shift_factor": 0.1159})
    os.makedirs(root / "scheduler", exist_ok=True)
    with open(root / "scheduler" / "scheduler_config.json", "w") as f:
        json.dump({"base_shift": 0.5, "max_shift": 1.15, "shift": 3.0,
                   "use_dynamic_shifting": True}, f)

    # no tokenizer_2/ -> fail fast with a remedy
    with pytest.raises(ValueError, match="tokenizer_2"):
        load_flux_pipeline(str(root), compute_dtype=jnp.float32,
                           tokenizer_dir=tokenizer_dir)

    stub = lambda texts: np.zeros((len(texts), 16), np.int32)
    pipe = load_flux_pipeline(str(root), compute_dtype=jnp.float32,
                              tokenizer_dir=tokenizer_dir,
                              t5_tokenize=stub)
    assert pipe.flux_cfg.guidance_embeds
    assert pipe.vae_cfg.latent_channels == 4
    assert "quant_conv" not in pipe.vae_params
    img = pipe.txt2img(["a crab"], resolution=(64, 64), n_steps=2,
                       guidance_scale=3.5, seed=1)
    assert img.shape == (1, 64, 64, 3)


def test_flux_inpaint_pipeline(tiny_flux_pipe):
    pipe = tiny_flux_pipe
    ref = np.full((1, 64, 64, 3), 128, np.uint8)
    out = pipe.inpaint(["a crab"], ref, crop_left=16, crop_right=48,
                       crop_top=16, crop_bottom=48, n_steps=2,
                       guidance_scale=3.5, seed=3)
    assert out.shape == (1, 64, 64, 3) and out.dtype == np.uint8
    # mask image selecting the same cells -> identical program
    mask = np.zeros((64, 64), np.uint8)
    mask[16:48, 16:48] = 255
    out_m = pipe.inpaint(["a crab"], ref, mask_image=mask, n_steps=2,
                         guidance_scale=3.5, seed=3)
    np.testing.assert_array_equal(out, out_m)
    # full-window inpaint at strength 1.0 degenerates to txt2img
    full = pipe.inpaint(["a crab"], ref, n_steps=2, guidance_scale=3.5,
                        seed=3)
    t2i = pipe.txt2img(["a crab"], resolution=(64, 64), n_steps=2,
                       guidance_scale=3.5, seed=3)
    d = np.abs(full.astype(int) - t2i.astype(int))
    assert d.max() <= 1 and d.mean() < 0.01, (d.max(), d.mean())
    # all-keep mask returns the VAE round trip of the reference exactly:
    # the final step's sigma = 0 pins the un-masked region to the clean
    # encoded latent
    kept = pipe.inpaint(["a crab"], ref, crop_left=16, crop_right=48,
                        crop_top=16, crop_bottom=48, crop_out=True,
                        n_steps=2, guidance_scale=3.5, seed=3)
    assert not np.array_equal(kept, out)
    with pytest.raises(ValueError, match="not both"):
        pipe.inpaint(["x"], ref, mask_image=mask, crop_left=0, n_steps=2)


def test_flux_true_cfg(tiny_flux_pipe):
    """diffusers' true_cfg_scale path: scale<=1 or empty negative is the
    exact plain run; negative == positive makes vu == vc so any scale is
    ~the plain run; a real negative changes the image."""
    pipe = tiny_flux_pipe
    plain = pipe.txt2img(["a crab"], resolution=(64, 64), n_steps=2,
                         guidance_scale=3.5, seed=5)
    same = pipe.txt2img(["a crab"], resolution=(64, 64), n_steps=2,
                        guidance_scale=3.5, seed=5,
                        negative_prompt="ugly", true_cfg_scale=1.0)
    np.testing.assert_array_equal(plain, same)
    # vu == vc (same text both halves): v = vu + (vc-vu)*s == vc exactly
    ident = pipe.txt2img(["a crab"], resolution=(64, 64), n_steps=2,
                         guidance_scale=3.5, seed=5,
                         negative_prompt="a crab", true_cfg_scale=4.0)
    d = np.abs(plain.astype(int) - ident.astype(int))
    assert d.max() <= 1 and d.mean() < 0.01, (d.max(), d.mean())
    neg = pipe.txt2img(["a crab"], resolution=(64, 64), n_steps=2,
                       guidance_scale=3.5, seed=5,
                       negative_prompt="a dog", true_cfg_scale=4.0)
    assert not np.array_equal(plain, neg)
