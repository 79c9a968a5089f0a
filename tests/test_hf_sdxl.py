"""HF/sgm single-file checkpoint importer tests.

A synthetic checkpoint dict in the public sgm/ldm key layout is generated
from known parameter pytrees (inverse mapping), then imported and compared.
"""

import jax
import jax.numpy as jnp
import numpy as np

from sdxl_tpu.configs import AutoencoderConfig, CLIPConfig, UNetConfig
from sdxl_tpu.io.hf_sdxl import (
    build_clip_from_hf,
    build_clip_from_open_clip,
    build_unet_from_ldm,
    build_vae_from_ldm,
)
from sdxl_tpu.models.clip import init_clip
from sdxl_tpu.models.unet import init_unet, unet_block_plan
from sdxl_tpu.models.vae import init_autoencoder

from tests.test_io import TINY_CLIP, TINY_UNET, TINY_VAE, assert_trees_close


def inv_linear(d, key, p):
    d[f"{key}.weight"] = np.asarray(p["w"]).T
    if "b" in p:
        d[f"{key}.bias"] = np.asarray(p["b"])


def inv_conv(d, key, p):
    d[f"{key}.weight"] = np.transpose(np.asarray(p["w"]), (3, 2, 0, 1))
    if "b" in p:
        d[f"{key}.bias"] = np.asarray(p["b"])


def inv_norm(d, key, p):
    d[f"{key}.weight"] = np.asarray(p["gamma"])
    d[f"{key}.bias"] = np.asarray(p["beta"])


def inv_res(d, key, p):
    inv_norm(d, f"{key}.in_layers.0", p["norm_in"])
    inv_conv(d, f"{key}.in_layers.2", p["conv_in"])
    inv_linear(d, f"{key}.emb_layers.1", p["lin_embed"])
    inv_norm(d, f"{key}.out_layers.0", p["norm_out"])
    inv_conv(d, f"{key}.out_layers.3", p["conv_out"])
    if "skip" in p:
        inv_conv(d, f"{key}.skip_connection", p["skip"])


def inv_spatial(d, key, p):
    inv_norm(d, f"{key}.norm", p["norm"])
    inv_linear(d, f"{key}.proj_in", p["proj_in"])
    inv_linear(d, f"{key}.proj_out", p["proj_out"])
    for j, b in enumerate(p["blocks"]):
        t = f"{key}.transformer_blocks.{j}"
        for n in ("norm1", "norm2", "norm3"):
            inv_norm(d, f"{t}.{n}", b[n])
        for an in ("attn1", "attn2"):
            inv_linear(d, f"{t}.{an}.to_q", b[an]["q"])
            inv_linear(d, f"{t}.{an}.to_k", b[an]["k"])
            inv_linear(d, f"{t}.{an}.to_v", b[an]["v"])
            inv_linear(d, f"{t}.{an}.to_out.0", b[an]["out"])
        inv_linear(d, f"{t}.ff.net.0.proj", b["mlp"]["proj"])
        inv_linear(d, f"{t}.ff.net.2", b["mlp"]["lin"])


def make_ldm_unet_dict(cfg, params, prefix="model.diffusion_model"):
    d = {}
    in_plan, _, out_plan = unet_block_plan(cfg)
    inv_linear(d, f"{prefix}.time_embed.0", params["time_embed"]["lin1"])
    inv_linear(d, f"{prefix}.time_embed.2", params["time_embed"]["lin2"])
    inv_linear(d, f"{prefix}.label_emb.0.0", params["label_embed"]["lin1"])
    inv_linear(d, f"{prefix}.label_emb.0.2", params["label_embed"]["lin2"])
    for i, (spec, p) in enumerate(zip(in_plan, params["input_blocks"])):
        b = f"{prefix}.input_blocks.{i}"
        if spec.kind == "conv":
            inv_conv(d, f"{b}.0", p["conv"])
        elif spec.kind == "down":
            inv_conv(d, f"{b}.0.op", p["conv"])
        else:
            inv_res(d, f"{b}.0", p["res"])
            if spec.kind == "res_t":
                inv_spatial(d, f"{b}.1", p["transformer"])
    inv_res(d, f"{prefix}.middle_block.0", params["middle_block"]["res1"])
    inv_spatial(d, f"{prefix}.middle_block.1", params["middle_block"]["transformer"])
    inv_res(d, f"{prefix}.middle_block.2", params["middle_block"]["res2"])
    for i, (spec, p) in enumerate(zip(out_plan, params["output_blocks"])):
        b = f"{prefix}.output_blocks.{i}"
        inv_res(d, f"{b}.0", p["res"])
        if spec.kind in ("res_t", "res_t_up"):
            inv_spatial(d, f"{b}.1", p["transformer"])
        if spec.kind == "res_t_up":
            inv_conv(d, f"{b}.2.conv", p["upsample"])
        elif spec.kind == "res_up":
            inv_conv(d, f"{b}.1.conv", p["upsample"])
    inv_norm(d, f"{prefix}.out.0", params["norm_out"])
    inv_conv(d, f"{prefix}.out.2", params["conv_out"])
    return d


def test_unet_ldm_roundtrip():
    params = init_unet(jax.random.PRNGKey(0), TINY_UNET, jnp.float32)
    d = make_ldm_unet_dict(TINY_UNET, params)
    loaded = build_unet_from_ldm(d, TINY_UNET, jnp.float32)
    assert_trees_close(params, loaded)


def make_ldm_vae_dict(params, prefix="first_stage_model"):
    d = {}

    def vres(key, p):
        inv_norm(d, f"{key}.norm1", p["norm1"])
        inv_conv(d, f"{key}.conv1", p["conv1"])
        inv_norm(d, f"{key}.norm2", p["norm2"])
        inv_conv(d, f"{key}.conv2", p["conv2"])
        if "nin_shortcut" in p:
            inv_conv(d, f"{key}.nin_shortcut", p["nin_shortcut"])

    def vmid(key, p):
        vres(f"{key}.block_1", p["block_1"])
        inv_norm(d, f"{key}.attn_1.norm", p["attn"]["norm"])
        for n in ("q", "k", "v", "proj_out"):
            inv_conv(d, f"{key}.attn_1.{n}", p["attn"][n])
        vres(f"{key}.block_2", p["block_2"])

    enc = params["encoder"]
    inv_conv(d, f"{prefix}.encoder.conv_in", enc["conv_in"])
    for i, b in enumerate(enc["blocks"]):
        vres(f"{prefix}.encoder.down.{i}.block.0", b["res1"])
        vres(f"{prefix}.encoder.down.{i}.block.1", b["res2"])
        if "downsampler" in b:
            inv_conv(d, f"{prefix}.encoder.down.{i}.downsample.conv", b["downsampler"])
    vmid(f"{prefix}.encoder.mid", enc["mid"])
    inv_norm(d, f"{prefix}.encoder.norm_out", enc["norm_out"])
    inv_conv(d, f"{prefix}.encoder.conv_out", enc["conv_out"])

    dec = params["decoder"]
    inv_conv(d, f"{prefix}.decoder.conv_in", dec["conv_in"])
    n = len(dec["blocks"])
    # our execution order deep->shallow maps to ldm up.{n-1-i}
    for i, b in enumerate(dec["blocks"]):
        up = f"{prefix}.decoder.up.{n - 1 - i}"
        vres(f"{up}.block.0", b["res1"])
        vres(f"{up}.block.1", b["res2"])
        vres(f"{up}.block.2", b["res3"])
        if "upsampler" in b:
            inv_conv(d, f"{up}.upsample.conv", b["upsampler"])
    vmid(f"{prefix}.decoder.mid", dec["mid"])
    inv_norm(d, f"{prefix}.decoder.norm_out", dec["norm_out"])
    inv_conv(d, f"{prefix}.decoder.conv_out", dec["conv_out"])

    inv_conv(d, f"{prefix}.quant_conv", params["quant_conv"])
    inv_conv(d, f"{prefix}.post_quant_conv", params["post_quant_conv"])
    return d


def test_vae_ldm_roundtrip():
    params = init_autoencoder(jax.random.PRNGKey(1), TINY_VAE)
    d = make_ldm_vae_dict(params)
    loaded = build_vae_from_ldm(d, TINY_VAE)
    assert_trees_close(params, loaded)


def test_clip_hf_roundtrip():
    params = init_clip(jax.random.PRNGKey(2), TINY_CLIP)
    prefix = "conditioner.embedders.0.transformer.text_model"
    d = {}
    d[f"{prefix}.embeddings.token_embedding.weight"] = np.asarray(
        params["token_embedding"]
    )
    d[f"{prefix}.embeddings.position_embedding.weight"] = np.asarray(
        params["position_embedding"]
    )
    for i, b in enumerate(params["blocks"]):
        s = f"{prefix}.encoder.layers.{i}"
        inv_linear(d, f"{s}.self_attn.q_proj", b["attn"]["q"])
        inv_linear(d, f"{s}.self_attn.k_proj", b["attn"]["k"])
        inv_linear(d, f"{s}.self_attn.v_proj", b["attn"]["v"])
        inv_linear(d, f"{s}.self_attn.out_proj", b["attn"]["out"])
        inv_norm(d, f"{s}.layer_norm1", b["attn_ln"])
        inv_linear(d, f"{s}.mlp.fc1", b["mlp"]["fc1"])
        inv_linear(d, f"{s}.mlp.fc2", b["mlp"]["fc2"])
        inv_norm(d, f"{s}.layer_norm2", b["mlp_ln"])
    inv_norm(d, f"{prefix}.final_layer_norm", params["layer_norm"])
    d[f"{prefix}.text_projection.weight"] = np.asarray(params["text_projection"]).T

    loaded = build_clip_from_hf(d, TINY_CLIP)
    assert_trees_close(params, loaded)


def test_clip_open_clip_roundtrip():
    params = init_clip(jax.random.PRNGKey(3), TINY_CLIP)
    prefix = "conditioner.embedders.1.model"
    d = {}
    d[f"{prefix}.token_embedding.weight"] = np.asarray(params["token_embedding"])
    d[f"{prefix}.positional_embedding"] = np.asarray(params["position_embedding"])
    for i, b in enumerate(params["blocks"]):
        s = f"{prefix}.transformer.resblocks.{i}"
        # fused in_proj: torch layout [3d, d] rows = q;k;v
        qw = np.asarray(b["attn"]["q"]["w"]).T
        kw = np.asarray(b["attn"]["k"]["w"]).T
        vw = np.asarray(b["attn"]["v"]["w"]).T
        d[f"{s}.attn.in_proj_weight"] = np.concatenate([qw, kw, vw], axis=0)
        d[f"{s}.attn.in_proj_bias"] = np.concatenate(
            [np.asarray(b["attn"][x]["b"]) for x in ("q", "k", "v")]
        )
        inv_linear(d, f"{s}.attn.out_proj", b["attn"]["out"])
        inv_norm(d, f"{s}.ln_1", b["attn_ln"])
        inv_linear(d, f"{s}.mlp.c_fc", b["mlp"]["fc1"])
        inv_linear(d, f"{s}.mlp.c_proj", b["mlp"]["fc2"])
        inv_norm(d, f"{s}.ln_2", b["mlp_ln"])
    inv_norm(d, f"{prefix}.ln_final", params["layer_norm"])
    d[f"{prefix}.text_projection"] = np.asarray(params["text_projection"])

    loaded = build_clip_from_open_clip(d, TINY_CLIP)
    assert_trees_close(params, loaded)


# ---------------------------------------------------------------------------
# legacy torch-pickle (.ckpt) single-file checkpoints
# ---------------------------------------------------------------------------


def test_ckpt_pickle_tensors_equal_safetensors(tmp_path):
    """_load_single_file_tensors reads the legacy A1111-era .ckpt torch
    pickle identically to safetensors: the usual {"state_dict": ...}
    nesting is unwrapped, non-tensor bookkeeping entries dropped, and
    every tensor comes back bitwise equal."""
    import torch
    from safetensors.numpy import save_file

    from sdxl_tpu.io.hf_sdxl import _load_single_file_tensors

    params = init_unet(jax.random.PRNGKey(0), TINY_UNET, jnp.float32)
    d = make_ldm_unet_dict(TINY_UNET, params)
    d.update(make_ldm_vae_dict(init_autoencoder(jax.random.PRNGKey(1),
                                                TINY_VAE)))
    d = {k: np.ascontiguousarray(v) for k, v in d.items()}

    st = str(tmp_path / "m.safetensors")
    save_file(d, st)
    ck = str(tmp_path / "m.ckpt")
    torch.save({"state_dict": {k: torch.from_numpy(v)
                               for k, v in d.items()},
                "global_step": 123, "epoch": 1}, ck)

    a = _load_single_file_tensors(st)
    b = _load_single_file_tensors(ck)
    assert set(a) == set(b) == set(d)
    for k in d:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_load_sd1_single_file_ckpt(tmp_path):
    """load_sd1_single_file: ldm layout without label_emb (SD1-shaped
    4-level UNet, adm_in_channels=0), CLIP at
    cond_stage_model.transformer.*, via a real .ckpt file; conv_in width
    is corrected from the checkpoint (9-channel inpainting models)."""
    import dataclasses

    import torch

    from sdxl_tpu.configs import DiffuserConfig
    from sdxl_tpu.io.hf_sdxl import load_sd1_single_file

    sd1_cfg = DiffuserConfig(
        adm_in_channels=0, model_channels=8, channel_mults=(1, 2, 4, 4),
        num_head_channels=0, transformer_depths=(1, 1, 1, 1),
        context_dim=16, transformer_levels=(0, 1, 2), n_heads=2,
    )
    ucfg = sd1_cfg.unet_config()
    uparams = init_unet(jax.random.PRNGKey(0), ucfg, jnp.float32)
    assert "label_embed" not in uparams
    d = make_ldm_unet_dict_no_label(ucfg, uparams)
    d.update(make_ldm_vae_dict(init_autoencoder(jax.random.PRNGKey(1),
                                                TINY_VAE)))
    clip_params = init_clip(jax.random.PRNGKey(2), TINY_CLIP)
    prefix = "cond_stage_model.transformer.text_model"
    d[f"{prefix}.embeddings.token_embedding.weight"] = np.asarray(
        clip_params["token_embedding"])
    d[f"{prefix}.embeddings.position_embedding.weight"] = np.asarray(
        clip_params["position_embedding"])
    for i, b in enumerate(clip_params["blocks"]):
        s = f"{prefix}.encoder.layers.{i}"
        inv_linear(d, f"{s}.self_attn.q_proj", b["attn"]["q"])
        inv_linear(d, f"{s}.self_attn.k_proj", b["attn"]["k"])
        inv_linear(d, f"{s}.self_attn.v_proj", b["attn"]["v"])
        inv_linear(d, f"{s}.self_attn.out_proj", b["attn"]["out"])
        inv_norm(d, f"{s}.layer_norm1", b["attn_ln"])
        inv_linear(d, f"{s}.mlp.fc1", b["mlp"]["fc1"])
        inv_linear(d, f"{s}.mlp.fc2", b["mlp"]["fc2"])
        inv_norm(d, f"{s}.layer_norm2", b["mlp_ln"])
    inv_norm(d, f"{prefix}.final_layer_norm", clip_params["layer_norm"])
    d[f"{prefix}.text_projection.weight"] = np.asarray(
        clip_params["text_projection"]).T

    ck = str(tmp_path / "v1-5-pruned.ckpt")
    torch.save({"state_dict": {k: torch.from_numpy(np.ascontiguousarray(v))
                               for k, v in d.items()}}, ck)

    clip, unet, vae, out_cfg = load_sd1_single_file(
        ck, sd1_cfg, TINY_CLIP, jnp.float32, vae_cfg=TINY_VAE)
    assert out_cfg == sd1_cfg  # in_channels already matched
    assert_trees_close(uparams, unet)
    assert_trees_close(clip_params, clip)


def make_ldm_unet_dict_no_label(cfg, params, prefix="model.diffusion_model"):
    """make_ldm_unet_dict for SD1-shaped UNets (no label_emb keys)."""
    import copy

    with_label = copy.copy(params)
    with_label["label_embed"] = {
        "lin1": {"w": jnp.zeros((1, 1)), "b": jnp.zeros((1,))},
        "lin2": {"w": jnp.zeros((1, 1)), "b": jnp.zeros((1,))},
    }
    d = make_ldm_unet_dict(cfg, with_label, prefix)
    for k in list(d):
        if ".label_emb." in k:
            del d[k]
    return d
