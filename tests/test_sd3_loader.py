"""SD3 diffusers-layout importer tests (synthetic inverse-mapped
checkpoints) + tiny end-to-end pipeline runs."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdxl_tpu.configs import AutoencoderConfig, CLIPConfig, MMDiTConfig, T5Config
from sdxl_tpu.io.sd3 import (
    build_mmdit_from_diffusers,
    build_t5_from_hf,
    mmdit_config_from_dir,
)
from sdxl_tpu.models.mmdit import init_mmdit
from sdxl_tpu.models.t5 import init_t5
from tests.test_hf_sdxl import inv_linear, inv_norm
from tests.test_io import assert_trees_close
from tests.test_mmdit import TINY as TINY_MMDIT

TINY_CLIP_L = CLIPConfig(n_vocab=49408, n_state=32, embed_dim=32, n_head=4,
                         n_ctx=77, n_layer=2, quick_gelu=True)
TINY_CLIP_G = CLIPConfig(n_vocab=49408, n_state=48, embed_dim=48, n_head=4,
                         n_ctx=77, n_layer=3, quick_gelu=False)
TINY_T5 = T5Config(vocab_size=128, d_model=96, d_kv=8, d_ff=64, n_heads=4,
                   n_layers=2, relative_buckets=8, relative_max_distance=16)
TINY_SD3_MMDIT = MMDiTConfig(
    patch_size=2, in_channels=16, out_channels=16, num_layers=2, n_heads=4,
    head_dim=8, joint_attention_dim=96, pooled_projection_dim=80,
    pos_embed_max_size=16, time_sinusoid_dim=32,
)
TINY_SD3_VAE = AutoencoderConfig(
    encoder_channels=((16, 16), (16, 32), (32, 32), (32, 32)),
    decoder_channels=((32, 32), (32, 32), (32, 16), (16, 16)),
    n_group=4, n_channels_out=32, latent_channels=16,
)


def make_diffusers_mmdit_dict(cfg: MMDiTConfig, params):
    d = {}
    p = cfg.patch_size
    w_lin = np.asarray(params["pos_embed"]["proj"]["w"])
    d["pos_embed.proj.weight"] = w_lin.reshape(
        p, p, cfg.in_channels, cfg.hidden).transpose(3, 2, 0, 1)
    d["pos_embed.proj.bias"] = np.asarray(params["pos_embed"]["proj"]["b"])
    te = params["time_text_embed"]
    inv_linear(d, "time_text_embed.timestep_embedder.linear_1",
               te["timestep_lin1"])
    inv_linear(d, "time_text_embed.timestep_embedder.linear_2",
               te["timestep_lin2"])
    inv_linear(d, "time_text_embed.text_embedder.linear_1", te["text_lin1"])
    inv_linear(d, "time_text_embed.text_embedder.linear_2", te["text_lin2"])
    inv_linear(d, "context_embedder", params["context_embedder"])
    for i, blk in enumerate(params["blocks"]):
        pre = f"transformer_blocks.{i}"
        inv_linear(d, f"{pre}.norm1.linear", blk["norm1"]["mod"])
        inv_linear(d, f"{pre}.norm1_context.linear",
                   blk["norm1_context"]["mod"])
        a = blk["attn"]
        for nm in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj",
                   "add_v_proj"):
            inv_linear(d, f"{pre}.attn.{nm}", a[nm])
        inv_linear(d, f"{pre}.attn.to_out.0", a["to_out"])
        if "to_add_out" in a:
            inv_linear(d, f"{pre}.attn.to_add_out", a["to_add_out"])
        for nm in ("norm_q", "norm_k", "norm_added_q", "norm_added_k"):
            if nm in a:
                d[f"{pre}.attn.{nm}.weight"] = np.asarray(a[nm]["w"])
        if "attn2" in blk:
            a2 = blk["attn2"]
            for nm in ("to_q", "to_k", "to_v"):
                inv_linear(d, f"{pre}.attn2.{nm}", a2[nm])
            inv_linear(d, f"{pre}.attn2.to_out.0", a2["to_out"])
            for nm in ("norm_q", "norm_k"):
                if nm in a2:
                    d[f"{pre}.attn2.{nm}.weight"] = np.asarray(a2[nm]["w"])
        inv_linear(d, f"{pre}.ff.net.0.proj", blk["mlp"]["in"])
        inv_linear(d, f"{pre}.ff.net.2", blk["mlp"]["out"])
        if "mlp_context" in blk:
            inv_linear(d, f"{pre}.ff_context.net.0.proj",
                       blk["mlp_context"]["in"])
            inv_linear(d, f"{pre}.ff_context.net.2",
                       blk["mlp_context"]["out"])
    inv_linear(d, "norm_out.linear", params["norm_out"]["mod"])
    inv_linear(d, "proj_out", params["proj_out"])
    return d


def test_mmdit_diffusers_roundtrip(tmp_path):
    params = init_mmdit(jax.random.PRNGKey(0), TINY_MMDIT, jnp.float32)
    d = make_diffusers_mmdit_dict(TINY_MMDIT, params)
    cfg = mmdit_config_from_dir(str(tmp_path), d)  # shape inference only
    assert cfg.num_layers == TINY_MMDIT.num_layers
    assert cfg.in_channels == 16 and cfg.patch_size == 2
    assert cfg.joint_attention_dim == TINY_MMDIT.joint_attention_dim
    assert cfg.qk_norm == ""
    # head_dim falls back to 64 without config.json; write one
    with open(tmp_path / "config.json", "w") as f:
        json.dump({"attention_head_dim": TINY_MMDIT.head_dim,
                   "num_attention_heads": TINY_MMDIT.n_heads,
                   "pos_embed_max_size": TINY_MMDIT.pos_embed_max_size},
                  f)
    cfg = mmdit_config_from_dir(str(tmp_path), d)
    assert cfg.n_heads == 4 and cfg.head_dim == 8
    assert cfg.pos_embed_max_size == 16
    loaded = build_mmdit_from_diffusers(d, cfg, jnp.float32)
    assert_trees_close(params, loaded)


def test_mmdit_qknorm_roundtrip(tmp_path):
    cfg = MMDiTConfig(**{**TINY_MMDIT.__dict__, "qk_norm": "rms"})
    params = init_mmdit(jax.random.PRNGKey(1), cfg, jnp.float32)
    d = make_diffusers_mmdit_dict(cfg, params)
    detected = mmdit_config_from_dir(str(tmp_path), d)
    assert detected.qk_norm == "rms"
    loaded = build_mmdit_from_diffusers(
        d, MMDiTConfig(**{**detected.__dict__, "head_dim": 8,
                          "n_heads": 4, "pos_embed_max_size": 16}),
        jnp.float32)
    assert_trees_close(params, loaded)


def test_mmdit_dual_attention_roundtrip(tmp_path):
    """SD3.5-medium layout: attn2 + 9-way norm1 detected and loaded."""
    cfg = MMDiTConfig(**{**TINY_MMDIT.__dict__,
                         "dual_attention_layers": (0,)})
    params = init_mmdit(jax.random.PRNGKey(3), cfg, jnp.float32)
    d = make_diffusers_mmdit_dict(cfg, params)
    # attn2 keys use the diffusers to_out.0 name
    assert "transformer_blocks.0.attn2.to_q.weight" in d
    detected = mmdit_config_from_dir(str(tmp_path), d)
    assert detected.dual_attention_layers == (0,)
    loaded = build_mmdit_from_diffusers(
        d, MMDiTConfig(**{**detected.__dict__, "head_dim": 8, "n_heads": 4,
                          "pos_embed_max_size": 16}), jnp.float32)
    assert_trees_close(params, loaded)


def make_hf_t5_dict(cfg: T5Config, params):
    d = {"shared.weight": np.asarray(params["embed"])}
    for i, blk in enumerate(params["blocks"]):
        pre = f"encoder.block.{i}.layer"
        for nm in ("q", "k", "v", "o"):
            d[f"{pre}.0.SelfAttention.{nm}.weight"] = np.asarray(
                blk["attn"][nm]["w"]).T
        d[f"{pre}.0.layer_norm.weight"] = np.asarray(blk["ln1"])
        for nm in ("wi_0", "wi_1", "wo"):
            d[f"{pre}.1.DenseReluDense.{nm}.weight"] = np.asarray(
                blk["ffn"][nm]["w"]).T
        d[f"{pre}.1.layer_norm.weight"] = np.asarray(blk["ln2"])
    d["encoder.block.0.layer.0.SelfAttention.relative_attention_bias"
      ".weight"] = np.asarray(params["relative_attention_bias"])
    d["encoder.final_layer_norm.weight"] = np.asarray(params["final_ln"])
    return d


def test_t5_hf_roundtrip():
    params = init_t5(jax.random.PRNGKey(2), TINY_T5, jnp.float32)
    d = make_hf_t5_dict(TINY_T5, params)
    loaded = build_t5_from_hf(d, TINY_T5, jnp.float32)
    assert_trees_close(params, loaded)


# ---------------------------------------------------------------------------
# full-directory load + e2e
# ---------------------------------------------------------------------------


def _make_hf_clip_dict(cfg, params):
    d = {}
    d["text_model.embeddings.token_embedding.weight"] = np.asarray(
        params["token_embedding"])
    d["text_model.embeddings.position_embedding.weight"] = np.asarray(
        params["position_embedding"])
    for i, b in enumerate(params["blocks"]):
        s = f"text_model.encoder.layers.{i}"
        inv_linear(d, f"{s}.self_attn.q_proj", b["attn"]["q"])
        inv_linear(d, f"{s}.self_attn.k_proj", b["attn"]["k"])
        inv_linear(d, f"{s}.self_attn.v_proj", b["attn"]["v"])
        inv_linear(d, f"{s}.self_attn.out_proj", b["attn"]["out"])
        inv_norm(d, f"{s}.layer_norm1", b["attn_ln"])
        inv_linear(d, f"{s}.mlp.fc1", b["mlp"]["fc1"])
        inv_linear(d, f"{s}.mlp.fc2", b["mlp"]["fc2"])
        inv_norm(d, f"{s}.layer_norm2", b["mlp_ln"])
    inv_norm(d, "text_model.final_layer_norm", params["layer_norm"])
    d["text_projection.weight"] = np.asarray(params["text_projection"]).T
    return d


@pytest.fixture(scope="module")
def sd3_dir(tmp_path_factory, tokenizer_dir):
    """A synthetic diffusers-layout SD3 directory (tiny configs)."""
    from safetensors.numpy import save_file

    from sdxl_tpu.models.clip import init_clip
    from sdxl_tpu.models.vae import init_autoencoder
    from tests.test_diffusers_sdxl import make_diffusers_vae_dict

    root = tmp_path_factory.mktemp("sd3_ckpt")

    def write(sub, d, config=None):
        os.makedirs(root / sub, exist_ok=True)
        save_file({k: np.ascontiguousarray(v) for k, v in d.items()},
                  str(root / sub / "model.safetensors"))
        if config is not None:
            with open(root / sub / "config.json", "w") as f:
                json.dump(config, f)

    mmdit = init_mmdit(jax.random.PRNGKey(0), TINY_SD3_MMDIT, jnp.float32)
    write("transformer", make_diffusers_mmdit_dict(TINY_SD3_MMDIT, mmdit),
          {"attention_head_dim": 8, "num_attention_heads": 4,
           "pos_embed_max_size": 16, "patch_size": 2, "in_channels": 16,
           "out_channels": 16, "num_layers": 2, "joint_attention_dim": 96,
           "pooled_projection_dim": 80})

    clip_l = init_clip(jax.random.PRNGKey(1), TINY_CLIP_L)
    write("text_encoder", _make_hf_clip_dict(TINY_CLIP_L, clip_l),
          {"vocab_size": 49408, "hidden_size": 32, "projection_dim": 32,
           "num_attention_heads": 4, "max_position_embeddings": 77,
           "num_hidden_layers": 2, "hidden_act": "quick_gelu"})
    clip_g = init_clip(jax.random.PRNGKey(2), TINY_CLIP_G)
    write("text_encoder_2", _make_hf_clip_dict(TINY_CLIP_G, clip_g),
          {"vocab_size": 49408, "hidden_size": 48, "projection_dim": 48,
           "num_attention_heads": 4, "max_position_embeddings": 77,
           "num_hidden_layers": 3, "hidden_act": "gelu"})

    t5 = init_t5(jax.random.PRNGKey(3), TINY_T5, jnp.float32)
    write("text_encoder_3", make_hf_t5_dict(TINY_T5, t5),
          {"vocab_size": 128, "d_model": 96, "d_kv": 8, "d_ff": 64,
           "num_heads": 4, "num_layers": 2,
           "relative_attention_num_buckets": 8,
           "relative_attention_max_distance": 16})
    # no tokenizer_3/ -> the pipeline must reject T5 without a tokenizer,
    # or be loaded with load_t5=False

    vae = init_autoencoder(jax.random.PRNGKey(4), TINY_SD3_VAE)
    write("vae", make_diffusers_vae_dict(vae),
          {"norm_num_groups": 4, "latent_channels": 16,
           "scaling_factor": 1.5305, "shift_factor": 0.0609})

    os.makedirs(root / "scheduler", exist_ok=True)
    with open(root / "scheduler" / "scheduler_config.json", "w") as f:
        json.dump({"shift": 3.0, "num_train_timesteps": 1000}, f)
    return str(root)


def test_load_sd3_dir_and_generate(sd3_dir, tokenizer_dir):
    from sdxl_tpu.pipeline.sd3 import load_sd3_pipeline

    pipe = load_sd3_pipeline(sd3_dir, compute_dtype=jnp.float32,
                             tokenizer_dir=tokenizer_dir, load_t5=False)
    assert pipe.mmdit_cfg.num_layers == 2
    assert pipe.mmdit_cfg.n_heads == 4 and pipe.mmdit_cfg.head_dim == 8
    assert pipe.t5_params is None
    img = pipe.txt2img(["a crab"], resolution=(64, 64), n_steps=2,
                       guidance_scale=4.0, seed=1)
    assert img.shape == (1, 64, 64, 3) and img.dtype == np.uint8
    img2 = pipe.txt2img(["a crab"], resolution=(64, 64), n_steps=2,
                        guidance_scale=4.0, seed=1)
    np.testing.assert_array_equal(img, img2)
    out = pipe.img2img(["a blue crab"], img, strength=0.5, n_steps=4,
                       guidance_scale=4.0, seed=2)
    assert out.shape == (1, 64, 64, 3)


def test_load_sd3_with_t5_requires_tokenizer(sd3_dir, tokenizer_dir):
    from sdxl_tpu.pipeline.sd3 import load_sd3_pipeline

    # T5 weights present but no tokenizer_3/: the load fails FAST with a
    # remedy (not on the first request, which would 500 a running server)
    with pytest.raises(ValueError, match="tokenizer_3"):
        load_sd3_pipeline(sd3_dir, compute_dtype=jnp.float32,
                          tokenizer_dir=tokenizer_dir, load_t5=True)
    # wiring a tokenizer stub at load makes the full triple-tower path run
    pipe = load_sd3_pipeline(
        sd3_dir, compute_dtype=jnp.float32, tokenizer_dir=tokenizer_dir,
        load_t5=True,
        t5_tokenize=lambda texts: np.zeros((len(texts), 256), np.int32))
    assert pipe.t5_params is not None
    img = pipe.txt2img(["a crab"], resolution=(64, 64), n_steps=2,
                       guidance_scale=4.0, seed=1)
    assert img.shape == (1, 64, 64, 3)


def test_random_sd3_pipeline_e2e(tokenizer_dir):
    from sdxl_tpu.pipeline.sd3 import random_sd3_pipeline

    pipe = random_sd3_pipeline(
        mmdit_cfg=TINY_SD3_MMDIT, clip_l_cfg=TINY_CLIP_L,
        clip_g_cfg=TINY_CLIP_G, vae_cfg=TINY_SD3_VAE, t5_cfg=TINY_T5,
        compute_dtype=jnp.float32, tokenizer_dir=tokenizer_dir,
    )
    img = pipe.txt2img(["a crab on a beach"], resolution=(64, 64),
                       n_steps=3, guidance_scale=5.0, seed=0)
    assert img.shape == (1, 64, 64, 3)
    # no-CFG path
    img_nc = pipe.txt2img(["a crab on a beach"], resolution=(64, 64),
                          n_steps=3, guidance_scale=1.0, seed=0)
    assert img_nc.shape == (1, 64, 64, 3)
    with pytest.raises(ValueError, match="multiple of 16"):
        pipe.txt2img(["x"], resolution=(72, 72), n_steps=2)


def test_sd3_inpaint_pipeline(tokenizer_dir):
    from sdxl_tpu.pipeline.sd3 import random_sd3_pipeline

    pipe = random_sd3_pipeline(
        mmdit_cfg=TINY_SD3_MMDIT, clip_l_cfg=TINY_CLIP_L,
        clip_g_cfg=TINY_CLIP_G, vae_cfg=TINY_SD3_VAE,
        compute_dtype=jnp.float32, tokenizer_dir=tokenizer_dir,
    )
    ref = np.full((1, 64, 64, 3), 128, np.uint8)

    out = pipe.inpaint(["a crab"], ref, crop_left=16, crop_right=48,
                       crop_top=16, crop_bottom=48, n_steps=2,
                       guidance_scale=4.0, seed=3)
    assert out.shape == (1, 64, 64, 3) and out.dtype == np.uint8

    # the equivalent mask image selects the same latent cells -> identical
    mask = np.zeros((64, 64), np.uint8)
    mask[16:48, 16:48] = 255
    out_m = pipe.inpaint(["a crab"], ref, mask_image=mask, n_steps=2,
                         guidance_scale=4.0, seed=3)
    np.testing.assert_array_equal(out, out_m)

    # full-window inpaint at strength 1.0 degenerates to txt2img: the
    # initial latent is (1-sigma0)*x0 + sigma0*noise with sigma0 == 1,
    # i.e. exactly the txt2img noise from the same PRNGKey(seed)
    full = pipe.inpaint(["a crab"], ref, n_steps=2, guidance_scale=4.0,
                        seed=3)
    t2i = pipe.txt2img(["a crab"], resolution=(64, 64), n_steps=2,
                       guidance_scale=4.0, seed=3)
    d = np.abs(full.astype(int) - t2i.astype(int))
    assert d.max() <= 1 and d.mean() < 0.01, (d.max(), d.mean())

    with pytest.raises(ValueError, match="not both"):
        pipe.inpaint(["x"], ref, mask_image=mask, crop_left=0, n_steps=2)
    with pytest.raises(ValueError, match="strength"):
        pipe.inpaint(["x"], ref, strength=0.0, n_steps=2)


def test_sd3_slg_pipeline(tokenizer_dir):
    from sdxl_tpu.pipeline.sd3 import random_sd3_pipeline

    pipe = random_sd3_pipeline(
        mmdit_cfg=TINY_SD3_MMDIT, clip_l_cfg=TINY_CLIP_L,
        clip_g_cfg=TINY_CLIP_G, vae_cfg=TINY_SD3_VAE,
        compute_dtype=jnp.float32, tokenizer_dir=tokenizer_dir,
    )
    plain = pipe.txt2img(["a crab"], resolution=(64, 64), n_steps=3,
                         guidance_scale=4.0, seed=1)
    # slg_scale=0 takes the exact plain path (no kwargs forwarded)
    same = pipe.txt2img(["a crab"], resolution=(64, 64), n_steps=3,
                        guidance_scale=4.0, seed=1, slg_scale=0.0)
    np.testing.assert_array_equal(plain, same)
    out = pipe.txt2img(["a crab"], resolution=(64, 64), n_steps=3,
                       guidance_scale=4.0, seed=1, slg_scale=2.8,
                       slg_layers=(1,), slg_start=0.0, slg_stop=1.0)
    assert out.shape == (1, 64, 64, 3)
    assert not np.array_equal(out, plain)
    # the default layer set (7,8,9) cannot exist on a 2-block MMDiT
    with pytest.raises(ValueError, match="out of range"):
        pipe.txt2img(["x"], resolution=(64, 64), n_steps=2, slg_scale=2.8)
