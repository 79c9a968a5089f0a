"""Checkpoint merging (cli/merge.py + io/checkpoint.save_native_pipeline):
weighted-sum / add-difference leaf math, native round-trip of the merged
artifact through load_pipeline, config-mismatch rejection."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdxl_tpu.cli.merge import main as merge_main
from sdxl_tpu.io.checkpoint import save_native_pipeline
from sdxl_tpu.pipeline.loader import load_pipeline
from sdxl_tpu.pipeline.pipeline import random_pipeline


def _tiny(seed, tokenizer_dir, diffuser_cfg=None):
    from tests.test_pipeline_e2e import TINY_DIFFUSER, TINY_EMBEDDER, TINY_VAE

    return random_pipeline(
        seed=seed,
        embedder_cfg=TINY_EMBEDDER,
        diffuser_cfg=diffuser_cfg or TINY_DIFFUSER,
        vae_cfg=TINY_VAE,
        compute_dtype=jnp.float32,
        param_dtype_unet=jnp.float32,
        tokenizer_dir=tokenizer_dir,
    )


@pytest.fixture(scope="module")
def ckpt_pair(tmp_path_factory, tokenizer_dir):
    root = tmp_path_factory.mktemp("merge")
    a, b = _tiny(0, tokenizer_dir), _tiny(1, tokenizer_dir)
    da, db = str(root / "a"), str(root / "b")
    save_native_pipeline(da, a)
    save_native_pipeline(db, b)
    return da, db, a, b


def test_weighted_sum(ckpt_pair, tmp_path, tokenizer_dir):
    da, db, a, b = ckpt_pair
    out = str(tmp_path / "merged")
    rc = merge_main(["--model-a", da, "--model-b", db, "--alpha", "0.25",
                     "--output-dir", out, "--merge-vae", "--device"])
    assert rc == 0
    merged = load_pipeline(out, compute_dtype=jnp.float32,
                           tokenizer_dir=tokenizer_dir,
                           stack_transformers=False)

    def leafs(pipe):
        return (jax.tree.leaves(pipe.unet_params)
                + jax.tree.leaves(pipe.embedder_params)
                + jax.tree.leaves(pipe.vae_params))

    la, lb, lm = leafs(a), leafs(b), leafs(merged)
    assert len(la) == len(lm)
    for x, y, m in zip(la, lb, lm):
        np.testing.assert_allclose(
            np.asarray(m), 0.75 * np.asarray(x) + 0.25 * np.asarray(y),
            rtol=1e-6, atol=1e-6)

    # the artifact is a servable checkpoint
    img = merged.txt2img("a cat", resolution=(32, 32), n_steps=1, seed=0,
                         profile_stages=False)
    assert img.shape == (1, 32, 32, 3)


def test_add_difference_with_c_equals_b_is_identity(ckpt_pair, tmp_path,
                                                    tokenizer_dir):
    da, db, a, _ = ckpt_pair
    out = str(tmp_path / "ident")
    rc = merge_main(["--model-a", da, "--model-b", db, "--model-c", db,
                     "--alpha", "0.7", "--output-dir", out, "--device"])
    assert rc == 0
    merged = load_pipeline(out, compute_dtype=jnp.float32,
                           tokenizer_dir=tokenizer_dir,
                           stack_transformers=False)
    for x, m in zip(jax.tree.leaves(a.unet_params),
                    jax.tree.leaves(merged.unet_params)):
        np.testing.assert_allclose(np.asarray(m), np.asarray(x), atol=1e-6)
    # VAE not merged: bit-identical to A's
    for x, m in zip(jax.tree.leaves(a.vae_params),
                    jax.tree.leaves(merged.vae_params)):
        np.testing.assert_array_equal(np.asarray(m), np.asarray(x))


def test_config_mismatch_rejected(ckpt_pair, tmp_path, tokenizer_dir):
    from sdxl_tpu.configs import DiffuserConfig

    da, _, _, _ = ckpt_pair
    other_cfg = DiffuserConfig(
        adm_in_channels=32 + 6 * 256, model_channels=32,
        channel_mults=(1, 2), num_head_channels=8,
        transformer_depths=(1, 1), context_dim=64, is_refiner=False)
    dc = str(tmp_path / "c")
    save_native_pipeline(dc, _tiny(2, tokenizer_dir, diffuser_cfg=other_cfg))
    rc = merge_main(["--model-a", da, "--model-b", dc, "--device",
                     "--output-dir", str(tmp_path / "x")])
    assert rc == 2
    assert not os.path.exists(str(tmp_path / "x"))
