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
