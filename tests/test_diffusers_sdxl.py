"""diffusers-layout importer tests (synthetic inverse-mapped checkpoints)."""

import jax
import jax.numpy as jnp
import numpy as np

from sdxl_tpu.io.diffusers_sdxl import (
    build_unet_from_diffusers,
    build_vae_from_diffusers,
)
from sdxl_tpu.models.unet import init_unet, unet_block_plan
from sdxl_tpu.models.vae import init_autoencoder

from tests.test_hf_sdxl import inv_conv, inv_linear, inv_norm
from tests.test_io import TINY_UNET, TINY_VAE, assert_trees_close


def inv_dif_res(d, key, p):
    inv_norm(d, f"{key}.norm1", p["norm_in"])
    inv_conv(d, f"{key}.conv1", p["conv_in"])
    inv_linear(d, f"{key}.time_emb_proj", p["lin_embed"])
    inv_norm(d, f"{key}.norm2", p["norm_out"])
    inv_conv(d, f"{key}.conv2", p["conv_out"])
    if "skip" in p:
        inv_conv(d, f"{key}.conv_shortcut", p["skip"])


def inv_dif_spatial(d, key, p):
    inv_norm(d, f"{key}.norm", p["norm"])
    inv_linear(d, f"{key}.proj_in", p["proj_in"])
    inv_linear(d, f"{key}.proj_out", p["proj_out"])
    for j, b in enumerate(p["blocks"]):
        t = f"{key}.transformer_blocks.{j}"
        for n in ("norm1", "norm2", "norm3"):
            inv_norm(d, f"{t}.{n}", b[n])
        for an in ("attn1", "attn2"):
            for dst, src in [("to_q", "q"), ("to_k", "k"), ("to_v", "v"),
                             ("to_out.0", "out")]:
                inv_linear(d, f"{t}.{an}.{dst}", b[an][src])
        inv_linear(d, f"{t}.ff.net.0.proj", b["mlp"]["proj"])
        inv_linear(d, f"{t}.ff.net.2", b["mlp"]["lin"])


def make_diffusers_unet_dict(cfg, params):
    d = {}
    in_plan, _, out_plan = unet_block_plan(cfg)
    inv_linear(d, "time_embedding.linear_1", params["time_embed"]["lin1"])
    inv_linear(d, "time_embedding.linear_2", params["time_embed"]["lin2"])
    if "label_embed" in params:  # absent for SD 1.x/2.x configs
        inv_linear(d, "add_embedding.linear_1", params["label_embed"]["lin1"])
        inv_linear(d, "add_embedding.linear_2", params["label_embed"]["lin2"])
    inv_conv(d, "conv_in", params["input_blocks"][0]["conv"])

    idx = 1
    for level in range(len(cfg.channel_mults)):
        for j in range(2):
            p = params["input_blocks"][idx]
            inv_dif_res(d, f"down_blocks.{level}.resnets.{j}", p["res"])
            if "transformer" in p:
                inv_dif_spatial(
                    d, f"down_blocks.{level}.attentions.{j}", p["transformer"]
                )
            idx += 1
        if idx < len(in_plan) and in_plan[idx].kind == "down":
            inv_conv(
                d, f"down_blocks.{level}.downsamplers.0.conv",
                params["input_blocks"][idx]["conv"],
            )
            idx += 1

    inv_dif_res(d, "mid_block.resnets.0", params["middle_block"]["res1"])
    inv_dif_spatial(d, "mid_block.attentions.0", params["middle_block"]["transformer"])
    inv_dif_res(d, "mid_block.resnets.1", params["middle_block"]["res2"])

    idx = 0
    for i in range(len(cfg.channel_mults)):
        for j in range(3):
            p = params["output_blocks"][idx]
            inv_dif_res(d, f"up_blocks.{i}.resnets.{j}", p["res"])
            if "transformer" in p:
                inv_dif_spatial(d, f"up_blocks.{i}.attentions.{j}", p["transformer"])
            if "upsample" in p:
                inv_conv(d, f"up_blocks.{i}.upsamplers.0.conv", p["upsample"])
            idx += 1

    inv_norm(d, "conv_norm_out", params["norm_out"])
    inv_conv(d, "conv_out", params["conv_out"])
    return d


def test_unet_diffusers_roundtrip():
    params = init_unet(jax.random.PRNGKey(0), TINY_UNET, jnp.float32)
    d = make_diffusers_unet_dict(TINY_UNET, params)
    loaded = build_unet_from_diffusers(d, TINY_UNET, jnp.float32)
    assert_trees_close(params, loaded)


def make_diffusers_vae_dict(params):
    d = {}

    def vres(key, p):
        inv_norm(d, f"{key}.norm1", p["norm1"])
        inv_conv(d, f"{key}.conv1", p["conv1"])
        inv_norm(d, f"{key}.norm2", p["norm2"])
        inv_conv(d, f"{key}.conv2", p["conv2"])
        if "nin_shortcut" in p:
            inv_conv(d, f"{key}.conv_shortcut", p["nin_shortcut"])

    def vmid(key, p):
        vres(f"{key}.resnets.0", p["block_1"])
        a = f"{key}.attentions.0"
        inv_norm(d, f"{a}.group_norm", p["attn"]["norm"])
        for dst, src in [("to_q", "q"), ("to_k", "k"), ("to_v", "v"),
                         ("to_out.0", "proj_out")]:
            # our conv1x1 HWIO [1,1,in,out] -> diffusers linear [out,in]
            w = np.asarray(p["attn"][src]["w"])[0, 0]
            d[f"{a}.{dst}.weight"] = w.T
            d[f"{a}.{dst}.bias"] = np.asarray(p["attn"][src]["b"])
        vres(f"{key}.resnets.1", p["block_2"])

    enc = params["encoder"]
    inv_conv(d, "encoder.conv_in", enc["conv_in"])
    for i, b in enumerate(enc["blocks"]):
        vres(f"encoder.down_blocks.{i}.resnets.0", b["res1"])
        vres(f"encoder.down_blocks.{i}.resnets.1", b["res2"])
        if "downsampler" in b:
            inv_conv(d, f"encoder.down_blocks.{i}.downsamplers.0.conv",
                     b["downsampler"])
    vmid("encoder.mid_block", enc["mid"])
    inv_norm(d, "encoder.conv_norm_out", enc["norm_out"])
    inv_conv(d, "encoder.conv_out", enc["conv_out"])

    dec = params["decoder"]
    inv_conv(d, "decoder.conv_in", dec["conv_in"])
    for i, b in enumerate(dec["blocks"]):  # already deep->shallow
        vres(f"decoder.up_blocks.{i}.resnets.0", b["res1"])
        vres(f"decoder.up_blocks.{i}.resnets.1", b["res2"])
        vres(f"decoder.up_blocks.{i}.resnets.2", b["res3"])
        if "upsampler" in b:
            inv_conv(d, f"decoder.up_blocks.{i}.upsamplers.0.conv", b["upsampler"])
    vmid("decoder.mid_block", dec["mid"])
    inv_norm(d, "decoder.conv_norm_out", dec["norm_out"])
    inv_conv(d, "decoder.conv_out", dec["conv_out"])

    inv_conv(d, "quant_conv", params["quant_conv"])
    inv_conv(d, "post_quant_conv", params["post_quant_conv"])
    return d


def test_vae_diffusers_roundtrip():
    params = init_autoencoder(jax.random.PRNGKey(1), TINY_VAE)
    d = make_diffusers_vae_dict(params)
    loaded = build_vae_from_diffusers(d, TINY_VAE)
    assert_trees_close(params, loaded)


def test_sd1_unet_diffusers_roundtrip():
    """SD1-shaped config (4 levels, transformers at 0-2, fixed heads, no
    add_embedding) round-trips through the diffusers key mapping."""
    from sdxl_tpu.configs import UNetConfig

    cfg = UNetConfig(
        adm_in_channels=0, in_channels=4, out_channels=4, model_channels=16,
        channel_mults=(1, 2, 4, 4), n_head_channels=8,
        transformer_depths=(1, 1, 1, 1), context_dim=24,
        transformer_levels=(0, 1, 2), n_heads=4,
    )
    params = init_unet(jax.random.PRNGKey(6), cfg, jnp.float32)
    assert "label_embed" not in params
    d = make_diffusers_unet_dict(cfg, params)
    assert "add_embedding.linear_1.weight" not in d
    loaded = build_unet_from_diffusers(d, cfg, jnp.float32)
    assert_trees_close(params, loaded)
